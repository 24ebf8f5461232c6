from pyarrow_ops_spark.operators.filters import filters, compile_predicate
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby, Grouping
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.operators.head import head

__all__ = [
    "filters",
    "compile_predicate",
    "drop_duplicates",
    "groupby",
    "Grouping",
    "join",
    "head",
]

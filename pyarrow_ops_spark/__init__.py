"""pyarrow_ops_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of TomScheffers/pyarrow_ops, re-expressed
Spark-first.

The reference (``/root/reference``, pyarrow_ops v0.0.8) exposes five
relational operators over eager in-memory ``pyarrow.Table``s
(``pyarrow_ops/__init__.py:1-4`` in the reference): ``filters``,
``drop_duplicates``, ``groupby``, ``join``, ``head`` — plus a JSON-string
parser (``jsons.py``) and an ML preprocessing class ``TableCleaner``
(``ml.py``). This package re-expresses those *semantics* over lazy,
distributed ``pyspark.sql.DataFrame``s: every operator builds a Catalyst
logical plan and lets the optimizer pick the physical strategy (predicate
pushdown, broadcast-vs-sort-merge joins, partial aggregation, AQE).

Beyond the reference surface it adds the operators a large-scale
training-data pipeline needs: exact and near-duplicate detection (MinHash-
LSH, SimHash, n-gram Jaccard), embedding similarity search, text analysis,
multimodal (binary) column plumbing, and a Structured Streaming slice.
"""

from pyarrow_ops_spark.session import get_spark, stop_spark
from pyarrow_ops_spark.sources.tables import load_table, load_tables, register_views
from pyarrow_ops_spark.operators.filters import filters, compile_predicate
from pyarrow_ops_spark.operators.dedup import drop_duplicates
from pyarrow_ops_spark.operators.group import groupby, Grouping
from pyarrow_ops_spark.operators.join import join
from pyarrow_ops_spark.operators.head import head
from pyarrow_ops_spark.functions.jsons import str_to_table
from pyarrow_ops_spark.ml.cleaner import TableCleaner

__all__ = [
    "get_spark",
    "stop_spark",
    "load_table",
    "load_tables",
    "register_views",
    "filters",
    "compile_predicate",
    "drop_duplicates",
    "groupby",
    "Grouping",
    "join",
    "head",
    "str_to_table",
    "TableCleaner",
]

__version__ = "0.1.0"

from pyarrow_ops_spark.functions.jsons import str_to_table

__all__ = ["str_to_table"]

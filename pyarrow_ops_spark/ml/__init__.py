from pyarrow_ops_spark.ml.cleaner import TableCleaner

__all__ = ["TableCleaner"]

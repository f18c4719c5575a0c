from wd2sql_spark.sinks.sqlite import export_sqlite  # noqa: F401

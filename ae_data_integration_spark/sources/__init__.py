from ae_data_integration_spark.sources import matrix_io  # noqa: F401

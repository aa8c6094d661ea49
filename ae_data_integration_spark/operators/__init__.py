from ae_data_integration_spark.operators import scale, splits  # noqa: F401

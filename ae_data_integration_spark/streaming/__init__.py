from ae_data_integration_spark.streaming import events  # noqa: F401

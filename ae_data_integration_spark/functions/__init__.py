from ae_data_integration_spark.functions import arrays, hashing, text  # noqa: F401

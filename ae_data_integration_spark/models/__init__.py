from ae_data_integration_spark.models.specs import ARCHITECTURES, build_weights  # noqa: F401

from ae_data_integration_spark.pipelines.omics import run_reference_pipeline  # noqa: F401

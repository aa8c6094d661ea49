from ae_data_integration_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    plan_asserts,
)

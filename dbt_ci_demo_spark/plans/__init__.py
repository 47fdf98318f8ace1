from dbt_ci_demo_spark.plans.model import Model, ModelConfig, model, clear_registry, registered_models  # noqa: F401
from dbt_ci_demo_spark.plans.graph import ModelGraph  # noqa: F401
from dbt_ci_demo_spark.plans.state import StateManifest  # noqa: F401
from dbt_ci_demo_spark.plans.runner import Runner, EnvConfig  # noqa: F401

from traval_spark.plans.ruleset import SparkRuleSet, apply_ruleset  # noqa: F401
from traval_spark.plans.detector import Detector  # noqa: F401
from traval_spark.plans.params import TravalParameters  # noqa: F401

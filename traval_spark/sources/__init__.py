from traval_spark.sources.synth import synth_sequences  # noqa: F401
from traval_spark.sources.tierstore import TierStore  # noqa: F401

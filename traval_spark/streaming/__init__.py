from traval_spark.streaming.rollup_stream import (  # noqa: F401
    stream_rollup_1m,
    run_incremental_rollup,
)

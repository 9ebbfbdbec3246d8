from traval_spark.functions.ts import (  # noqa: F401
    align_interpolate,
    ensure_ntz,
    align_resample_ffill_bfill,
    diff_with_gap_awareness,
    with_unix_micros,
)

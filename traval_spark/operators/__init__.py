from traval_spark.operators import rules  # noqa: F401

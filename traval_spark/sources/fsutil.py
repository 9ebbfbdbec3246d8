"""Hadoop-FS small-file helpers: ONE code path for every manifest /
marker / state file the engine writes next to its datasets.

Builtin ``open()``/``os.path`` only work on the driver's local disk; the
submit wrappers invite ``hdfs://``, ``s3a://``, ... output roots, where a
local write would fail AFTER the expensive parquet job. Everything here
goes through the session's Hadoop FileSystem, so any store the session
can write parquet to can also hold the sidecar files (TierStore
manifests + retention state, pipeline run metrics, curation lineage,
streaming ``_COMMITTED`` markers)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def active_spark(spark: SparkSession | None = None) -> SparkSession:
    spark = spark or SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError(
            "no active SparkSession: filesystem-backed stores need a "
            "session to resolve their Hadoop FileSystem"
        )
    return spark


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty marker file (underscore-prefixed names are ignored
    by Spark's file listing, so markers can live inside dataset dirs)."""
    fs, p = _fs(spark, path)
    fs.create(p, True).close()


def write_text(spark: SparkSession, path: str, text: str) -> None:
    """Write a small text file (parents created implicitly)."""
    fs, p = _fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def read_text(spark: SparkSession, path: str) -> str:
    fs, p = _fs(spark, path)
    stream = fs.open(p)
    try:
        return str(
            spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        )
    finally:
        stream.close()


def list_names(spark: SparkSession, path: str) -> list[str]:
    """Child entry names of a directory ([] if it does not exist)."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def glob(spark: SparkSession, pattern: str) -> list[str]:
    """Paths matching a Hadoop glob pattern (``*``, ``{a,b}``, ``[0-9]``),
    [] when nothing matches. One namenode round-trip, unlike walking the
    tree with repeated ``list_names`` calls."""
    fs, p = _fs(spark, pattern)
    statuses = fs.globStatus(p)
    if statuses is None:
        return []
    return [st.getPath().toString() for st in statuses]


def delete(spark: SparkSession, path: str, recursive: bool = True) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.delete(p, recursive))


def list_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(name, bytes) for the PLAIN FILES directly under a directory
    ([] if it does not exist) — the metadata read behind the small-file
    census. One listStatus round-trip per directory, same cost model as
    :func:`list_names`."""
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [
        (st.getPath().getName(), int(st.getLen()))
        for st in fs.listStatus(p)
        if st.isFile()
    ]

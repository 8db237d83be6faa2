"""Embedded-database sources: load SQLite and DuckDB files as tables.

Reference parity: ``connect("sqlite://<path>")`` is the reference's
DEFAULT storage target and ``connect("duck://<path>")`` its DuckDB
interface (sql_interface.py:962-1023 — SqliteInterface /
DuckInterface).  A reference user's data overwhelmingly lives in these
embedded files, so switching engines means being able to READ them:

- :func:`import_sqlite` — stdlib ``sqlite3``, no dependencies: reflect
  ``sqlite_master``, stream each table in bounded batches through
  ``fetchmany`` into Spark with a schema derived from SQLite's
  declared column types (dynamic typing falls back to string casts).
- :func:`import_duckdb` — the ``duckdb`` package, streamed through
  Arrow record batches (``fetch_record_batch``) so driver memory is
  bounded by one batch; types are preserved end-to-end (an INT64
  column with NULLs stays int64 — it never detours through pandas
  float64).

Scale judgement, stated plainly: an embedded single-file database IS
driver-local data — these importers materialize through the driver by
necessity (exactly as the reference funnels every query through one
in-process connection).  They are the MIGRATION path: read once,
write parquet, and from then on the data scans distributed.  For
continuously-fed operational databases use Spark's JDBC source with
partitioned reads instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: SQLite declared-type affinity -> Spark type (SQLite's own affinity
#: rules, sqlite.org/datatype3.html §3.1, applied to the common names)
_AFFINITY = (
    ("INT", "long"),
    ("CHAR", "string"), ("CLOB", "string"), ("TEXT", "string"),
    ("BLOB", "binary"),
    ("REAL", "double"), ("FLOA", "double"), ("DOUB", "double"),
    ("BOOL", "boolean"),
    ("DATETIME", "timestamp"), ("TIMESTAMP", "timestamp"),
    ("DATE", "date"),
    ("NUMERIC", "double"), ("DECIMAL", "double"),
)


def _spark_type(decl: str | None) -> str:
    d = (decl or "").upper()
    for needle, t in _AFFINITY:
        if needle in d:
            return t
    return "string"  # SQLite dynamic typing: safest lossless fallback


def _spill_dir(spark: SparkSession, kind: str, name: str) -> str:
    """A spill directory for importer temp-parquet, cleaned at exit.

    Location order: ``spark.preql.spill.dir`` (set this to a SHARED
    filesystem — HDFS/NFS/object-store fuse — on a real multi-node
    cluster, where a driver-local path would be invisible to
    executors), else ``spark.local.dir``, else the system tempdir.
    The table name is sanitized so ``weird/name`` can't escape the
    prefix, and the directory is removed at interpreter exit."""
    import atexit
    import re
    import shutil
    import tempfile

    base = spark.conf.get("spark.preql.spill.dir", None)
    if base is None:
        try:
            base = spark.sparkContext.getConf().get("spark.local.dir",
                                                    None)
        except Exception:
            base = None
        if base:
            # spark.local.dir is a comma-separated LIST of scratch
            # dirs — spill under the first one
            base = base.split(",")[0].strip() or None
    if base:
        import os
        os.makedirs(base, exist_ok=True)
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", name)[:64] or "t"
    spill = tempfile.mkdtemp(prefix=f"{kind}_{safe}_", dir=base)
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    return spill


def sqlite_table_df(spark: SparkSession, path: str, table: str,
                    batch_rows: int = 50_000) -> DataFrame:
    """One SQLite table as a DataFrame (typed from declared columns).

    Rows stream through ``fetchmany``; a table bigger than one batch
    SPILLS batch-by-batch to a temp parquet directory and comes back
    as a file-backed distributed scan, so driver memory is bounded by
    one batch (a small table stays a single in-memory frame).  BLOB
    columns stay ``bytes`` end to end (a ``binary`` field in the raw
    schema) — everything else goes through string + ``try_cast`` per
    SQLite's declared-type affinity, because SQLite cells are
    dynamically typed (a declared-INT column can hold text; try_cast
    makes that an explicit NULL where ANSI cast would throw)."""
    import sqlite3

    from pyspark.sql import functions as F
    con = sqlite3.connect(path)
    try:
        cols = con.execute(
            f"PRAGMA table_info({_q(table)})").fetchall()
        if not cols:
            raise ValueError(f"no such table {table!r} in {path!r}")
        names = [c[1] for c in cols]
        types = [_spark_type(c[2]) for c in cols]
        raw_schema = ", ".join(
            f"`{n}` {'binary' if t == 'binary' else 'string'}"
            for n, t in zip(names, types))

        def conv(v, t):
            if v is None:
                return None
            if t == "binary":
                return v if isinstance(v, bytes) else str(v).encode()
            if isinstance(v, bytes):  # bytes in a TEXT-affinity cell
                return v.decode("utf-8", "replace")
            return str(v)

        cur = con.execute(f"SELECT * FROM {_q(table)}")
        first = cur.fetchmany(batch_rows)
        second = cur.fetchmany(batch_rows) if len(first) == batch_rows \
            else []

        def to_df(batch):
            return spark.createDataFrame(
                [tuple(conv(v, t) for v, t in zip(r, types))
                 for r in batch],
                schema=raw_schema)

        if not second:
            # small table: one in-memory frame, no temp files
            raw = to_df(first)
        else:
            # large table: SPILL batches to a temp parquet so driver
            # memory is bounded by one batch (each batch is written
            # and released), and the result is a real file-backed
            # distributed scan instead of a giant LocalRelation
            spill = _spill_dir(spark, "sqlite", table)
            to_df(first).write.mode("append").parquet(spill)
            batch = second
            while batch:
                to_df(batch).write.mode("append").parquet(spill)
                batch = cur.fetchmany(batch_rows)
            raw = spark.read.schema(raw_schema).parquet(spill)
        return raw.select(*[
            (F.col(n) if t == "binary" else F.col(n).try_cast(t))
            .alias(n) for n, t in zip(names, types)])
    finally:
        con.close()


def _q(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def import_sqlite(engine, path: str, tables: list[str] | None = None,
                  prefix: str = "") -> dict:
    """Register every (or the listed) SQLite table on the Engine."""
    import sqlite3
    con = sqlite3.connect(path)
    try:
        found = [r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' "
            "AND name NOT LIKE 'sqlite_%'").fetchall()]
    finally:
        con.close()
    wanted = tables if tables is not None else found
    out = {}
    for t in wanted:
        df = sqlite_table_df(engine.spark, path, t)
        out[prefix + t] = engine.register(prefix + t, df)
    return out


def duckdb_table_df(spark: SparkSession, path: str, table: str,
                    batch_rows: int = 65_536) -> DataFrame:
    """One DuckDB table as a DataFrame, streamed through Arrow.

    ``fetch_record_batch`` yields bounded Arrow batches, so driver
    memory is bounded by one batch regardless of table size.  A table
    that fits one batch becomes an in-memory frame via
    ``createDataFrame(pyarrow.Table)`` (PySpark 4 consumes Arrow
    tables natively — int64+NULL stays int64, Decimal stays Decimal;
    no pandas float64 detour).  A bigger table spills batch-by-batch
    to temp parquet with ``pyarrow.parquet.ParquetWriter`` and comes
    back as a file-backed distributed scan."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect(path, read_only=True)
    try:
        reader = con.execute(
            f"SELECT * FROM {_q(table)}").fetch_record_batch(batch_rows)
        first = []
        n = 0
        spilled = None
        writer = None
        try:
            for batch in reader:
                if spilled is None and n + batch.num_rows <= batch_rows:
                    first.append(batch)
                    n += batch.num_rows
                    continue
                if writer is None:
                    spilled = _spill_dir(spark, "duckdb", table)
                    writer = pq.ParquetWriter(
                        f"{spilled}/part-0.parquet", reader.schema)
                    for b in first:
                        writer.write_batch(b)
                    first = []
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        if spilled is not None:
            return spark.read.parquet(spilled)
        tbl = (pa.Table.from_batches(first) if first
               else reader.schema.empty_table())
        return spark.createDataFrame(tbl)
    finally:
        con.close()


def import_duckdb(engine, path: str, tables: list[str] | None = None,
                  prefix: str = "", batch_rows: int = 65_536) -> dict:
    """Register every (or the listed) DuckDB table on the Engine —
    Arrow record-batch streaming, driver memory bounded by one batch
    (see :func:`duckdb_table_df`)."""
    import duckdb
    con = duckdb.connect(path, read_only=True)
    try:
        found = [r[0] for r in con.execute(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = 'main'").fetchall()]
    finally:
        con.close()
    wanted = tables if tables is not None else found
    out = {}
    for t in wanted:
        df = duckdb_table_df(engine.spark, path, t,
                             batch_rows=batch_rows)
        out[prefix + t] = engine.register(prefix + t, df)
    return out

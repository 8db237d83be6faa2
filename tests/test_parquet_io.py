"""The testdata timestamp contract has exactly one implementation
(preql_spark.parquet_io) and three consumers: Engine.load_dir,
bench_twins._read, and streaming.read_event_stream.  Round 2 shipped
three divergent copies and the stale one crashed the bench — these
tests pin all three to the same helper and the same resulting schema.
"""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

EVENTS = os.path.join(SF_DIR, "events.parquet")


def test_three_paths_same_events_schema(spark, eng):
    """events.parquet must read identically through the engine and the
    bench twins; the streaming reader additionally normalizes ts to
    TIMESTAMP (LTZ) — exactly the normalize_event_ts transform, no
    more."""
    import bench_twins
    from preql_spark.parquet_io import normalize_event_ts
    from preql_spark.streaming.stream import read_event_stream

    eng_schema = dict(eng.t.events.df.dtypes)
    twin_schema = dict(bench_twins._read(spark, SF_DIR, "events").dtypes)
    assert eng_schema == twin_schema

    sdf = read_event_stream(spark, EVENTS)
    stream_schema = dict(sdf.dtypes)
    expected = dict(normalize_event_ts(
        eng.t.events.df, "ts").dtypes)
    assert stream_schema == expected
    assert stream_schema["ts"] == "timestamp"  # watermark-compatible


def test_consumers_import_shared_helper():
    """The three call sites import the one helper (structural pin: a
    fourth copy of the shim can't reappear silently)."""
    import inspect
    import bench_twins
    from preql_spark import engine
    from preql_spark.streaming import stream

    assert "parquet_io" in inspect.getsource(bench_twins._read)
    assert "parquet_io" in inspect.getsource(engine.Engine.load_dir)
    assert "parquet_io" in inspect.getsource(stream.read_event_stream)


def test_nanos_conf_untouched_for_us_testdata(spark):
    """The current testdata is plain timestamp[us]; reading it must not
    mutate the session-global nanosAsLong conf (VERDICT r2 item 7)."""
    from preql_spark.parquet_io import NANOS_CONF, read_parquet
    spark.conf.unset(NANOS_CONF)
    read_parquet(spark, EVENTS).limit(1).collect()
    assert spark.conf.get(NANOS_CONF, None) in (None, "false")


def test_nanos_roundtrip(spark, tmp_path):
    """A genuine TIMESTAMP(NANOS) file still reads correctly (the shim
    that used to be hardcoded, now schema-driven)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    ts = [dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
          dt.datetime(2024, 6, 1, 0, 30, 0)]
    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("ns"))})
    path = str(tmp_path / "nanos.parquet")
    pq.write_table(tbl, path)

    from preql_spark.parquet_io import nanos_timestamp_cols, read_parquet
    assert nanos_timestamp_cols(path) == ["ts"]
    df = read_parquet(spark, path)
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    got = [r.ts for r in df.orderBy("id").collect()]
    assert got == ts


def test_read_event_stream_pins_utc(spark):
    """read_event_stream must pin the session timezone so the NTZ->LTZ
    cast is wall-clock-preserving for any caller session (ADVICE r2)."""
    from preql_spark.streaming.stream import read_event_stream
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
        read_event_stream(spark, EVENTS)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_compact_parquet(spark, tmp_path):
    """Many tiny files in, ceil(bytes/target) files out, rows intact."""
    import os
    from preql_spark.parquet_io import compact_parquet, read_parquet
    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    spark.range(10000).repartition(40).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small == 40
    n = compact_parquet(spark, src, dst, target_mb=128)
    assert n == 1
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_out == 1
    assert read_parquet(spark, dst).count() == 10000


def test_hadoop_fs_helpers(spark, tmp_path):
    """The URI-agnostic sizing/probe helpers agree with os.path on
    local paths (the only scheme in this container) and accept
    explicit file:// URIs."""
    import os
    from preql_spark.parquet_io import (hadoop_dir_has_files,
                                        hadoop_dir_size)
    d = str(tmp_path / "store")
    assert not hadoop_dir_has_files(spark, d)
    spark.range(100).repartition(2).write.parquet(d)
    assert hadoop_dir_has_files(spark, d)
    assert hadoop_dir_has_files(spark, f"file://{d}")
    local = sum(os.path.getsize(os.path.join(d, f))
                for f in os.listdir(d) if not f.startswith("."))
    got = hadoop_dir_size(spark, d)
    # hadoop counts the _SUCCESS marker and .crc files are hidden on
    # RawLocalFileSystem — size must cover at least the parquet bytes
    assert got >= local > 0


def test_hadoop_dir_has_files_partitioned_depth(spark, tmp_path):
    """The non-empty probe on PARTITIONED stores: depth=0 reads a
    col=value layout as empty (files live one level down), depth=1
    finds them — including partition dirs whose names start with
    underscores (e.g. __cid=0: "_"-prefixed but NOT hidden, per
    Spark's own "=" rule) — while _temporary-style work dirs stay
    skipped.  This probe gates the IVF ingest's self-guarding
    anti-join; a false EMPTY silently disables dedup (the r11
    crash-injection bug)."""
    import os
    from preql_spark.parquet_io import hadoop_dir_has_files
    d = str(tmp_path / "store")
    spark.range(10).withColumn("__cid", F.col("id") % 2) \
        .write.partitionBy("__cid").parquet(d)
    assert not hadoop_dir_has_files(spark, d)          # flat probe
    assert hadoop_dir_has_files(spark, d, depth=1)     # sees cells
    # a work dir full of files must NOT count as store content
    w = str(tmp_path / "work")
    os.makedirs(os.path.join(w, "_temporary"))
    with open(os.path.join(w, "_temporary", "x.parquet"), "w") as f:
        f.write("junk")
    assert not hadoop_dir_has_files(spark, w, depth=1)


def test_orc_roundtrip(spark, eng, tmp_path):
    p = str(tmp_path / "nation_orc")
    eng.t.nation.write_orc(p)
    back = eng.import_orc(p)
    assert sorted(r.n_name for r in back.df.collect()) == \
        sorted(r.n_name for r in eng.t.nation.df.collect())
    assert back.df.schema == eng.t.nation.df.schema


def test_csv_sink_and_text_source(spark, eng, tmp_path):
    pc = str(tmp_path / "nation_csv")
    eng.t.nation.project("n_name", "n_nationkey").write_csv(pc)
    back = eng.import_csv(pc)
    assert back.df.count() == eng.t.nation.df.count()
    pt = str(tmp_path / "lines")
    eng.t.nation.project("n_name").df.write.mode("overwrite").text(pt)
    lines = eng.import_text(pt)
    assert lines.df.columns == ["text"]
    assert sorted(r.text for r in lines.df.collect()) == \
        sorted(r.n_name for r in eng.t.nation.df.collect())


def test_import_parquet_schema_evolution(spark, eng, tmp_path):
    """mergeSchema unions per-file schemas; files lacking a column
    read it as NULL."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id: long, old: string") \
        .write.parquet(p)
    spark.createDataFrame([(2, 7.5)], "id: long, new: double") \
        .write.mode("append").parquet(p)
    t = eng.import_parquet(p, merge_schema=True)
    assert set(t.df.columns) == {"id", "old", "new"}
    rows = {r.id: (r.old, r.new) for r in t.df.collect()}
    assert rows == {1: ("a", None), 2: (None, 7.5)}


def test_hadoop_dir_size_glob(spark, tmp_path):
    """Glob-pattern sources size via globStatus (compact_parquet's
    pre-Hadoop-API behavior, preserved)."""
    from preql_spark.parquet_io import hadoop_dir_size
    spark.range(100).write.parquet(str(tmp_path / "run-a"))
    spark.range(100).write.parquet(str(tmp_path / "run-b"))
    both = hadoop_dir_size(spark, str(tmp_path / "run-*"))
    one = hadoop_dir_size(spark, str(tmp_path / "run-a"))
    assert both > one > 0
    assert hadoop_dir_size(spark, str(tmp_path / "nope-*")) == 0


def test_interchange_roundtrip_crafted_edges(spark, eng, tmp_path):
    """The q127/q130/q131 round-trip identities on inputs the fixture
    corpus never contains: emoji/unicode, embedded quotes and
    newlines (LF and CRLF), backslashes, NULLs, empty strings."""
    rows = [
        (1, 'plain text'),
        (2, 'emoji 🙂 and ünïcodé — em-dash'),
        (3, 'embedded "quotes" and \'singles\''),
        (4, 'line1\nline2\nline3'),
        (5, 'crlf\r\nline'),
        (6, 'back\\slash and tab\there'),
        (7, None),
        (8, ''),
        (9, 'json-ish {"k": [1, 2]}'),
    ]
    src = eng.from_df(spark.createDataFrame(
        rows, "doc_id long, text string"))
    want = sorted(rows)

    jl = str(tmp_path / "jl")
    src.write_jsonl(jl)
    got = sorted(tuple(r) for r in
                 eng.import_jsonl(jl, schema=src.df.schema).collect())
    assert got == want

    orc = str(tmp_path / "orc")
    src.write_orc(orc)
    got = sorted(tuple(r) for r in eng.import_orc(orc).collect())
    assert got == want

    db = str(tmp_path / "e.db")
    src.write_sqlite(db, "t")
    from preql_spark.engine import Engine
    back = Engine(spark)
    back.import_sqlite(db)
    got = sorted(tuple(r) for r in back.t.t.df.collect())
    assert got == want


def test_bench_failure_isolation(spark, monkeypatch):
    """bench.main() under the interleaved timing loop: a dead twin
    still yields the ENGINE timing (and records the error), a dead
    engine is isolated without aborting the run, and exactly one
    parseable JSON line is always emitted — the round-2 lesson,
    re-pinned after the r10 interleaving rewrite."""
    import io
    import json
    import sys

    import bench
    import bench_twins
    import __spark_entry__ as entry

    def boom(spark, sf_dir):
        raise RuntimeError("synthetic failure")

    qs = entry.queries()
    qs["q16_casts"] = boom
    monkeypatch.setitem(bench_twins.TWINS, "q40_cosine_topk", boom)
    monkeypatch.setattr(entry, "queries", lambda: qs)
    monkeypatch.setattr(bench, "BENCH_QUERIES",
                        ["q01_pricing_summary", "q16_casts",
                         "q40_cosine_topk"])
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR",
                       "/root/testdata/sf0.001")
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stdout", buf)
    bench.main()
    d = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "q01_pricing_summary" in d["queries"] \
        and "q01_pricing_summary" in d["hand_twin_secs"]
    assert "q40_cosine_topk" in d["queries"]      # engine survives
    assert "q40_cosine_topk" not in d["hand_twin_secs"]
    assert "q16_casts" not in d["queries"]        # dead engine
    assert set(d["errors"]) == {"q16_casts", "q40_cosine_topk"}


def test_csv_multiline_roundtrip(spark, eng, tmp_path):
    """import_csv(multiline=True) restores quoted embedded newlines
    and quotes — full write_csv fidelity (the default stays
    splittable single-line parsing)."""
    rows = [(1, 'a\nb'), (2, 'with "quotes"'), (3, 'plain'),
            (4, None)]
    src = eng.from_df(spark.createDataFrame(
        rows, "doc_id long, text string"))
    path = str(tmp_path / "csv")
    src.write_csv(path)
    got = sorted(tuple(r) for r in
                 eng.import_csv(path, multiline=True).collect())
    assert got == sorted(rows)

"""SQLite / DuckDB file sources (reference connect('sqlite://...') —
its DEFAULT storage target — and connect('duck://...');
sql_interface.py:962-1023)."""

import sqlite3

import pytest
from pyspark.sql import functions as F

from preql_spark.engine import Engine


@pytest.fixture()
def sqlite_db(tmp_path):
    p = str(tmp_path / "ref.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE Country (id INTEGER PRIMARY KEY, "
                "name TEXT, population INT, area REAL, seen DATETIME)")
    con.executemany(
        "INSERT INTO Country VALUES (?,?,?,?,?)",
        [(1, "A", 100, 2.5, "2024-01-01 10:00:00"),
         (2, "B", None, 7.5, None),
         (3, "C", 300, 0.5, "2024-06-01 00:00:00")])
    con.execute("CREATE TABLE misc (x TEXT)")
    con.execute("INSERT INTO misc VALUES ('hi')")
    con.commit()
    con.close()
    return p


def test_sqlite_reflection_and_types(spark, sqlite_db):
    eng = Engine(spark)
    got = eng.import_sqlite(sqlite_db)
    assert set(got) == {"Country", "misc"}
    dt = dict(eng.t.Country.df.dtypes)
    assert dt == {"id": "bigint", "name": "string",
                  "population": "bigint", "area": "double",
                  "seen": "timestamp"}
    rows = {r.name: r for r in eng.t.Country.df.collect()}
    assert rows["A"].population == 100 and rows["B"].population is None
    assert rows["C"].seen.year == 2024


def test_sqlite_flagship_query(spark, sqlite_db):
    """The reference README's flagship density query runs unchanged
    against the imported SQLite data."""
    from preql_spark import connect
    eng = connect(spark, data_dir=f"sqlite://{sqlite_db}")
    out = eng.q('Country[population != null]'
                '{name, density: population / area} order {^density}')
    assert [r.name for r in out.collect()] == ["C", "A"]


def test_sqlite_table_subset_and_missing(spark, sqlite_db):
    eng = Engine(spark)
    got = eng.import_sqlite(sqlite_db, tables=["misc"], prefix="s_")
    assert set(got) == {"s_misc"}
    from preql_spark.sources.sqldb import sqlite_table_df
    with pytest.raises(ValueError, match="no such table"):
        sqlite_table_df(spark, sqlite_db, "nope")


def test_sqlite_dynamic_typing_junk(spark, tmp_path):
    """SQLite's dynamic typing: text in a declared-INT column becomes
    NULL through the explicit cast instead of crashing inference."""
    p = str(tmp_path / "junk.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE j (n INT)")
    con.execute("INSERT INTO j VALUES (1)")
    con.execute("INSERT INTO j VALUES ('not-a-number')")
    con.commit()
    con.close()
    eng = Engine(spark)
    eng.import_sqlite(p)
    vals = sorted((r.n is None, r.n) for r in eng.t.j.df.collect())
    assert vals == [(False, 1), (True, None)]


def test_duckdb_source(spark, tmp_path):
    import duckdb
    p = str(tmp_path / "ref.duckdb")
    con = duckdb.connect(p)
    con.execute("CREATE TABLE things AS "
                "SELECT range AS i, 'v' || range AS s FROM range(5)")
    con.close()
    from preql_spark import connect
    eng = connect(spark, data_dir=f"duckdb://{p}")
    t = eng.t.things
    assert t.df.count() == 5
    assert t.df.filter(F.col("s") == "v3").collect()[0].i == 3


def test_duckdb_streamed_batches_and_types(spark, tmp_path):
    """A table bigger than one Arrow batch spills to temp parquet
    (bounded driver memory) and comes back value-identical; int64
    columns WITH NULLs stay bigint (no pandas float64 detour), and
    integers beyond 2^53 survive exactly."""
    import duckdb
    p = str(tmp_path / "big.duckdb")
    con = duckdb.connect(p)
    con.execute(
        "CREATE TABLE t AS SELECT "
        "CASE WHEN range % 7 = 0 THEN NULL ELSE range END AS id, "
        "9007199254740993 + range AS big, "
        "'r' || range AS s FROM range(5000)")
    con.close()
    from preql_spark.sources.sqldb import duckdb_table_df
    df = duckdb_table_df(spark, p, "t", batch_rows=1000)  # forces spill
    dt = dict(df.dtypes)
    assert dt["id"] == "bigint" and dt["big"] == "bigint"
    assert df.count() == 5000
    assert df.where("id is null").count() == 5000 // 7 + 1
    assert df.agg(F.max("big")).collect()[0][0] == 9007199254740993 + 4999
    # small path: in-memory Arrow table, same types
    small = duckdb_table_df(spark, p, "t", batch_rows=1_000_000)
    assert dict(small.dtypes) == dt
    assert small.count() == 5000


def test_write_sqlite_decimal_date_datetime(spark, eng, tmp_path):
    """Decimal binds as lossless text (NUMERIC affinity reads it back
    numeric), date/datetime as explicit ISO strings — no reliance on
    sqlite3's deprecated default adapters."""
    p = str(tmp_path / "dec.db")
    df = spark.createDataFrame(
        [(1, "12345678901234.5678", "2024-03-31", "2024-03-31 12:34:56")],
        "id long, d string, day string, ts string").selectExpr(
        "id", "cast(d as decimal(20,4)) d", "cast(day as date) day",
        "cast(ts as timestamp) ts")
    n = eng.from_df(df).write_sqlite(p, "t")
    assert n == 1
    con = sqlite3.connect(p)
    d, day, ts = con.execute("SELECT d, day, ts FROM t").fetchone()
    decl = {r[1]: r[2] for r in con.execute("PRAGMA table_info(t)")}
    con.close()
    # TEXT, not NUMERIC: NUMERIC affinity would coerce to lossy REAL
    assert str(d) == "12345678901234.5678" and decl["d"] == "TEXT"
    assert day == "2024-03-31" and ts == "2024-03-31 12:34:56"


def test_sqlite_round_trip(spark, eng, tmp_path):
    """write_sqlite -> import_sqlite round-trips values and types (the
    full migration loop with the reference's storage format)."""
    p = str(tmp_path / "out.db")
    src = eng.t.nation
    n = src.write_sqlite(p, "nation")
    assert n == src.count()
    back = Engine(spark)
    back.import_sqlite(p)
    a = sorted(map(tuple, src.df.collect()))
    b = sorted(map(tuple, back.t.nation.df.collect()))
    assert a == b
    # append doubles, overwrite resets, error raises
    src.write_sqlite(p, "nation", mode="append")
    back2 = Engine(spark); back2.import_sqlite(p, prefix="x_")
    assert back2.t.x_nation.count() == 2 * n
    src.write_sqlite(p, "nation", mode="overwrite")
    back3 = Engine(spark); back3.import_sqlite(p, prefix="y_")
    assert back3.t.y_nation.count() == n
    with pytest.raises(ValueError, match="exists"):
        src.write_sqlite(p, "nation", mode="error")


def test_sqlite_blob_round_trip(spark, tmp_path):
    """BLOB columns must survive as bytes, not the repr-string of the
    Python bytes object."""
    p = str(tmp_path / "blob.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE b (id INT, payload BLOB)")
    con.execute("INSERT INTO b VALUES (1, ?)", (b"\x00\x01\xff",))
    con.execute("INSERT INTO b VALUES (2, NULL)")
    con.commit(); con.close()
    eng = Engine(spark)
    eng.import_sqlite(p)
    rows = {r.id: r.payload for r in eng.t.b.df.collect()}
    assert bytes(rows[1]) == b"\x00\x01\xff" and rows[2] is None
    assert dict(eng.t.b.df.dtypes)["payload"] == "binary"


def test_sqlite_batched_read(spark, tmp_path):
    """Rows stream in bounded fetchmany batches (union of chunks) and
    totals survive a batch size smaller than the table."""
    p = str(tmp_path / "many.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE m (i INT)")
    con.executemany("INSERT INTO m VALUES (?)", [(i,) for i in range(257)])
    con.commit(); con.close()
    from preql_spark.sources.sqldb import sqlite_table_df
    df = sqlite_table_df(spark, p, "m", batch_rows=100)
    assert df.count() == 257
    assert sorted(r.i for r in df.collect()) == list(range(257))


def test_write_sqlite_struct_and_bad_mode(spark, eng, tmp_path):
    p = str(tmp_path / "s.db")
    t = eng.t.nation.project(
        "n_nationkey", s=F.struct("n_name", "n_regionkey"))
    n = t.write_sqlite(p, "t")
    assert n == 25
    con = sqlite3.connect(p)
    cell = con.execute("SELECT s FROM t LIMIT 1").fetchone()[0]
    con.close()
    import json as _json
    assert set(_json.loads(cell)) == {"n_name", "n_regionkey"}
    with pytest.raises(ValueError, match="mode"):
        eng.t.nation.write_sqlite(p, "t", mode="Overwrite")


def test_write_sqlite_nested_and_map(spark, eng, tmp_path):
    """Arrays of structs keep field names (JSON objects, not
    positional arrays) and map keys coerce to strings."""
    import datetime as dt
    import json as _json
    p = str(tmp_path / "nested.db")
    df = spark.createDataFrame(
        [(1, [{"a": 1, "b": "x"}], {dt.date(2024, 1, 1): "v"})],
        "id long, arr array<struct<a:long,b:string>>, "
        "m map<date,string>")
    n = eng.from_df(df).write_sqlite(p, "t")
    assert n == 1
    con = sqlite3.connect(p)
    arr, m = con.execute("SELECT arr, m FROM t").fetchone()
    con.close()
    assert _json.loads(arr) == [{"a": 1, "b": "x"}]
    assert _json.loads(m) == {"2024-01-01": "v"}

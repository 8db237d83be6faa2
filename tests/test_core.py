"""Core relational battery — ports the reference's golden-assert style
(tests/test_basic.py) onto the TPC-H-ish fixtures."""

import pytest
from pyspark.sql import functions as F

from preql_spark import table as tbl
from preql_spark.functions import aggregate as agg
from preql_spark import exprs


def test_project_ellipsis(eng):
    t = eng.t.region
    out = t.project(..., upper_name=F.upper(F.col("r_name")))
    assert out.columns == ["r_regionkey", "r_name", "upper_name"]
    out2 = t.project(tbl.exclude("r_name"))
    assert out2.columns == ["r_regionkey"]
    # named column replaces original position semantics: explicit first
    out3 = t.project("r_name", ...)
    assert out3.columns == ["r_name", "r_regionkey"]


def test_filter_and_order(eng):
    t = eng.t.nation
    rows = t.filter(t.n_regionkey == 0).order("^n_name").collect()
    assert all(r.n_regionkey == 0 for r in rows)
    names = [r.n_name for r in rows]
    assert names == sorted(names, reverse=True)


def test_slice_limit(eng):
    t = eng.t.nation.order("n_nationkey")
    rows = t.slice(2, 5).collect()
    assert [r.n_nationkey for r in rows] == [2, 3, 4]
    assert eng.t.nation.limit(3).count() == 3


def test_group_agg(eng):
    t = eng.t.nation
    out = t.group("n_regionkey", n=agg.count()).order("n_regionkey").collect()
    assert sum(r.n for r in out) == t.count()


def test_group_collect_list(eng):
    out = (eng.t.nation.group("n_regionkey", names=agg.collect("n_name", sort=True))
           .order("n_regionkey").collect())
    assert all(r.names == sorted(r.names) for r in out)


def test_global_agg(eng):
    out = eng.t.customer.agg_scalar(F.sum("c_acctbal")).collect()
    assert len(out) == 1


def test_auto_join_binary(eng):
    n, r = eng.t.nation, eng.t.region
    out = n.join(r)  # via FK registry
    assert out.count() == n.count()


def test_nary_struct_join(eng):
    j = tbl.join(c=eng.t.customer, n=eng.t.nation, r=eng.t.region,
                 broadcast=("n", "r"))
    row = j.df.limit(1).collect()[0]
    assert set(row.asDict()) == {"c", "n", "r"}
    assert row.n.n_regionkey == row.r.r_regionkey


def test_theta_join(eng):
    a = eng.range(0, 5)
    b = eng.range(0, 5)
    out = tbl.join(a=a, b=b, on=F.col("a.item") > F.col("b.item"))
    assert out.count() == 10  # pairs i>j over 0..4


def test_zipjoin(eng):
    a = eng.list_([10, 20, 30])
    b = eng.list_(["x", "y", "z"])
    rows = tbl.zipjoin(a, b).df.orderBy("a.item").collect()
    assert [(r.a.item, r.b.item) for r in rows] == [(10, "x"), (20, "y"), (30, "z")]


def test_set_ops(eng):
    a = eng.list_([1, 2, 2, 3])
    b = eng.list_([2, 3, 4])
    assert (a + b).count() == 7  # union all
    assert sorted(r.item for r in (a | b).collect()) == [1, 2, 3, 4]
    assert sorted(r.item for r in (a & b).collect()) == [2, 3]
    # reference '-' is EXCEPT (distinct): the duplicate 2 is deduped,
    # and 2 is removed because it appears in b (pql_functions.py:393-401)
    assert sorted(r.item for r in (a - b).collect()) == [1]


def test_range_and_enum(eng):
    t = eng.range(3, 7)
    assert [r.item for r in t.order("item").collect()] == [3, 4, 5, 6]
    e = eng.t.region.enum(order_by="r_regionkey")
    rows = e.order("index").collect()
    assert [r["index"] for r in rows] == list(range(5))


def test_one(eng):
    r = eng.t.region.filter(F.col("r_regionkey") == 0).one()
    assert r.r_name == "AFRICA"
    assert eng.t.region.filter(F.col("r_regionkey") == 99).one(nullable=True) is None


def test_null_semantics():
    from pyspark.sql import SparkSession
    s = SparkSession.getActiveSession()
    df = s.createDataFrame([(1, None), (None, None), (2, 2)], "a int, b int")
    out = df.select(exprs.eq(F.col("a"), F.col("b")).alias("e")).collect()
    assert [r.e for r in out] == [False, True, True]


def test_value_and_or():
    from pyspark.sql import SparkSession
    s = SparkSession.getActiveSession()
    df = s.createDataFrame([(0, 5), (3, 7)], "a int, b int")
    out = df.select(exprs.pand(F.col("a"), F.col("b")).alias("x"),
                    exprs.por(F.col("a"), F.col("b")).alias("y")).collect()
    # and: returns b if a truthy else a; or: a if truthy else b
    assert [(r.x, r.y) for r in out] == [(0, 5), (7, 3)]


def test_in_table(eng):
    big = eng.t.customer
    asia_nations = eng.t.nation.filter(F.col("n_regionkey") == 2)
    out = big.in_table(asia_nations, "c_nationkey", "n_nationkey")
    keys = {r.n_nationkey for r in asia_nations.collect()}
    assert all(r.c_nationkey in keys for r in out.collect())


def test_sql_escape_hatch(eng):
    t = eng.sql("SELECT count(*) AS n FROM orders_v", orders_v=eng.t.orders)
    assert t.one().n == eng.t.orders.count()


def test_distinct_describe(eng):
    d = eng.t.customer.project("c_mktsegment").distinct()
    assert d.count() == 5
    s = eng.t.customer.project("c_acctbal").describe()
    assert s.count() == 5


def test_describe_stats(eng):
    rows = {r.col_name: r for r in
            eng.t.customer.describe_stats("c_acctbal", "c_nationkey").collect()}
    assert set(rows) == {"c_acctbal", "c_nationkey"}
    n = eng.t.customer.count()
    assert rows["c_acctbal"].n == n
    assert rows["c_nationkey"].lo == 0.0 and rows["c_nationkey"].hi == 24.0


def test_sample_hash_deterministic(eng):
    a = eng.t.documents.sample_hash("doc_id", 0.3)
    b = eng.t.documents.sample_hash("doc_id", 0.3)
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())
    n = eng.t.documents.count()
    assert 0 < len(ids_a) < n
    # monotone: a smaller ratio yields a subset
    small = {r.doc_id for r in
             eng.t.documents.sample_hash("doc_id", 0.1).collect()}
    assert small <= set(ids_a)


def test_first_last_by(eng):
    from preql_spark.functions import aggregate as agg
    out = {r.c_nationkey: r for r in
           eng.t.customer.group("c_nationkey",
                                first_name=agg.first_by("c_name", "c_custkey"),
                                last_name=agg.last_by("c_name", "c_custkey"))
           .collect()}
    probe = next(iter(out))
    rows = sorted(eng.t.customer.filter(F.col("c_nationkey") == probe).collect(),
                  key=lambda r: r.c_custkey)
    assert out[probe].first_name == rows[0].c_name
    assert out[probe].last_name == rows[-1].c_name


def test_to_int_checked(spark):
    from preql_spark.functions.scalar import to_int_checked
    df = spark.createDataFrame([("12",), (None,), ("7",)], "s: string")
    got = sorted((r.v for r in
                  df.select(to_int_checked(F.col("s")).alias("v")).collect()),
                 key=lambda x: (x is None, x))
    assert got == [7, 12, None]
    import pytest as _pt
    bad = spark.createDataFrame([("12",), ("oops",)], "s: string")
    with _pt.raises(Exception) as ei:
        bad.select(to_int_checked(F.col("s")).alias("v")).collect()
    assert "cannot cast to int" in str(ei.value)


def test_sample_stratified(eng):
    t = eng.t.documents
    out = t.sample_stratified("doc_id", "source",
                              {"src0": 0.3, "src1": 1.0})
    rows = out.collect()
    srcs = {r.source for r in rows}
    assert srcs <= {"src0", "src1"}
    n_keep_all = t.filter(F.col("source") == "src1").count()
    assert sum(1 for r in rows if r.source == "src1") == n_keep_all
    n_down_all = t.filter(F.col("source") == "src0").count()
    n_down = sum(1 for r in rows if r.source == "src0")
    assert 0 < n_down < n_down_all


def test_engine_reflection(eng):
    n = eng.names()
    assert "customer" in n["tables"] and "lineitem" in n["tables"]
    assert "upper" in n["scalar_functions"]
    assert "median" in n["aggregate_functions"]
    cols = eng.columns("nation")
    assert cols["n_name"] == "string"
    assert cols["n_nationkey"] in ("int", "bigint")


def test_explode_roundtrip(eng):
    from preql_spark.functions import aggregate as agg
    back = (eng.t.nation.group("n_regionkey",
                               names=agg.collect("n_name", sort=True))
            .explode("names", alias="n_name"))
    got = sorted((r.n_regionkey, r.n_name) for r in back.collect())
    want = sorted((r.n_regionkey, r.n_name) for r in eng.t.nation.collect())
    assert got == want


def test_unpivot_histogram_corr(eng):
    w = eng.t.customer.project("c_custkey",
                               a=F.col("c_acctbal"),
                               b=F.col("c_acctbal") * 2)
    long = w.unpivot("c_custkey", ["a", "b"])
    assert long.count() == 2 * eng.t.customer.count()
    assert set(long.columns) == {"c_custkey", "variable", "value"}

    h = eng.t.customer.histogram("c_acctbal", -1000, 10000, 11)
    rows = h.collect()
    assert sum(r.n for r in rows) == eng.t.customer.count()
    assert all(0 <= r.bucket <= 10 for r in rows)

    from preql_spark.functions import aggregate as agg
    r = eng.t.customer.group(None, c=agg.corr("c_acctbal", "c_custkey")).one()
    assert -1.0 <= r.c <= 1.0


def test_split_by_hash(eng):
    d = eng.t.documents
    labeled = d.split_by_hash(
        "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              labeled.group("split", n=F.count(F.lit(1))).collect()}
    assert set(counts) <= {"train", "valid", "test"}
    assert sum(counts.values()) == d.count()
    assert counts["train"] > counts.get("valid", 0)
    # deterministic: same assignment on re-evaluation
    again = {r["split"]: r["n"] for r in
             d.split_by_hash("doc_id", {"train": 0.8, "valid": 0.1,
                                        "test": 0.1})
             .group("split", n=F.count(F.lit(1))).collect()}
    assert counts == again
    # group-aware: every doc_id gets exactly one label
    assert labeled.df.select("doc_id", "split").distinct().count() \
        == d.count()
    with pytest.raises(ValueError):
        d.split_by_hash("doc_id", {"train": 0.5})


def test_grouping_sets(eng):
    o = eng.t.orders
    out = o.grouping_sets(
        [["o_orderstatus"], []], n=F.count(F.lit(1))).collect()
    rows = {r.o_orderstatus: r.n for r in out}
    total = o.count()
    assert rows[None] == total           # the () grand-total set
    assert sum(v for k, v in rows.items() if k is not None) == total


def test_map_range(eng):
    spark = eng.spark
    t = eng.from_df(spark.createDataFrame(
        [("a", 0, 3), ("b", 2, 4), ("c", 5, 5)], "k: string, s: int, e: int"))
    rows = sorted((r.k, r["index"]) for r in
                  t.map_range(F.col("s"), F.col("e")).collect())
    # [s, e): c fans out to zero rows
    assert rows == [("a", 0), ("a", 1), ("a", 2), ("b", 2), ("b", 3)]
    const = t.map_range(0, 2).count()
    assert const == 6


def test_sample_weighted(eng):
    t = eng.t.documents
    a = sorted(r.doc_id for r in
               t.sample_weighted("doc_id", F.length("text"), 40).collect())
    b = sorted(r.doc_id for r in
               t.sample_weighted("doc_id", F.length("text"), 40).collect())
    assert a == b and len(a) == 40          # deterministic draw
    # heavier rows overrepresented: the sampled docs' mean length
    # exceeds the corpus mean
    import pyspark.sql.functions as SF
    corpus_mean = t.df.select(SF.avg(SF.length("text"))).collect()[0][0]
    picked = t.df.filter(SF.col("doc_id").isin(a)) \
        .select(SF.avg(SF.length("text"))).collect()[0][0]
    assert picked > corpus_mean
    # plan: top-k lowering, not a global sort
    plan = t.sample_weighted("doc_id", F.length("text"), 40) \
        .df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_temptable(eng):
    """Reference temptable (pql_functions.py:327-348): materialize a
    derived table under a session name; both the Python handle and the
    SQL catalog see it, and metadata (pk/fks) carries over."""
    t = eng.t.nation.filter(F.col("n_regionkey") < 2).temptable("nations_lo")
    assert t.count() == eng.t.nation.filter(F.col("n_regionkey") < 2).count()
    # registered in the engine catalog with carried-over metadata
    assert eng.t.nations_lo.meta.pk == eng.t.nation.meta.pk
    assert eng.t.nations_lo.meta.fks == eng.t.nation.meta.fks
    # visible to SQL as a temp view
    n = eng.spark.sql("SELECT count(*) AS n FROM nations_lo").collect()[0].n
    assert n == t.count()
    # FK auto-join still works through the temp table
    joined = eng.t.nations_lo.join(eng.t.region)
    assert joined.count() == t.count()


def test_setop_semantics(eng):
    """Reference sql_bin_op parity (pql_functions.py:362-417):
    positional matching, left-side names, distinct `-`/`|`/`&`,
    arity/type errors."""
    spark = eng.spark
    a = eng.from_df(spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "x: int"))
    b = eng.from_df(spark.createDataFrame(
        [(1,), (3,), (3,)], "y: int"))       # different column name
    # '-' is EXCEPT (distinct): 1 appears twice in a but once in b → gone
    assert sorted(r.x for r in (a - b).collect()) == [2]
    # '|' is UNION (distinct)
    assert sorted(r.x for r in (a | b).collect()) == [1, 2, 3]
    # '&' is INTERSECT (distinct)
    assert sorted(r.x for r in (a & b).collect()) == [1, 3]
    # '+' is UNION ALL, positional, keeps left names
    plus = a + b
    assert plus.df.columns == ["x"]
    assert sorted(r.x for r in plus.collect()) == [1, 1, 1, 2, 3, 3, 3]
    # arity mismatch raises like the reference
    c2 = eng.from_df(spark.createDataFrame([(1, 2)], "p: int, q: int"))
    import pytest as _pt
    with _pt.raises(TypeError, match="column mismatch"):
        _ = a + c2
    # incompatible types raise; numeric widening is allowed
    s = eng.from_df(spark.createDataFrame([("z",)], "s: string"))
    with _pt.raises(TypeError, match="types don't match"):
        _ = a + s
    wide = eng.from_df(spark.createDataFrame([(9.5,)], "d: double"))
    assert (wide + a).df.schema.fields[0].dataType.simpleString() == "double"


def test_write_jsonl_roundtrip(eng, tmp_path):
    """JSONL shard sink round-trips through spark.read.json."""
    p = str(tmp_path / "shards")
    eng.t.nation.project("n_nationkey", "n_name").write_jsonl(p, n_shards=2)
    back = eng.spark.read.json(p)
    assert back.count() == 25
    assert set(back.columns) == {"n_nationkey", "n_name"}
    import glob
    assert len(glob.glob(p + "/part-*")) == 2


def test_table_pipe(eng):
    """pipe() bridges DataFrame operators into the fluent Table API."""
    from preql_spark.operators.dedup import chunk_dedup
    out = eng.t.documents.pipe(chunk_dedup, chunk=3)
    from preql_spark.table import Table
    assert isinstance(out, Table)
    assert set(out.df.columns) == {"doc_id", "n_kept", "text_dedup"}
    # non-DataFrame results pass through unwrapped
    assert eng.t.documents.pipe(lambda df: df.columns) == \
        ["doc_id", "text", "lang", "source", "n_chars"]


def test_sample_mixture(eng):
    """Per-source keep fractions are deterministic and approximately
    proportional; unlisted sources drop entirely."""
    d = eng.t.documents
    ratios = {"src0": 1.0, "src1": 0.5, "src4": 0.0}
    out = d.sample_mixture("source", ratios, key="doc_id")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    assert set(by_src) <= {"src0", "src1"}
    full = {r.source: r.n for r in
            d.group("source", n=F.count(F.lit(1))).collect()}
    assert by_src["src0"] == full["src0"]          # ratio 1.0 keeps all
    assert 0 < by_src.get("src1", 0) < full["src1"]
    # deterministic: second run identical
    again = {(r.doc_id, r.source)
             for r in d.sample_mixture("source", ratios, key="doc_id")
             .collect()}
    assert again == {(r.doc_id, r.source) for r in rows}


def test_sample_mixture_requires_row_key(eng):
    """Hashing the group column itself would give every row in a
    group the same bucket (keep-all/keep-none, not a fraction) — the
    operator refuses a missing key rather than silently degrading."""
    import pytest
    with pytest.raises(ValueError, match="row-unique"):
        eng.t.documents.sample_mixture("source", {"src0": 0.5}, key=None)
    with pytest.raises(TypeError):
        eng.t.documents.sample_mixture("source", {"src0": 0.5})


def test_shuffle_deterministic(eng):
    """Same (key, seed) -> same permutation; different seed -> a
    different permutation of the same rows."""
    n = eng.t.nation
    a = [r.n_nationkey for r in n.shuffle_deterministic("n_nationkey").collect()]
    b = [r.n_nationkey for r in n.shuffle_deterministic("n_nationkey").collect()]
    c = [r.n_nationkey for r in
         n.shuffle_deterministic("n_nationkey", seed=1).collect()]
    assert a == b
    assert sorted(a) == sorted(c) and a != c

"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` exercises one operator family from
SURVEY.md §2 *through the preql_spark engine API* (not raw Spark), and
``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.  Column names
are aliased identically on both sides; float aggregates are rounded on
both sides to make the value-hash deterministic across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# make preql_spark importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_ENGINES: dict = {}


def _scratch(prefix: str) -> str:
    """A temp dir for round-trip/ingest queries, removed at exit so
    repeated battery runs don't accumulate in /tmp."""
    import atexit
    import shutil
    import tempfile
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _pr4(col):
    """Portable 4-dp rounding: floor(x*1e4+0.5)/1e4 is bit-identical
    IEEE arithmetic on Spark and DuckDB, unlike round() whose
    half-way rule differs between engines."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def _eng(spark: SparkSession, sf_dir: str):
    from preql_spark.engine import Engine
    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        _ENGINES[key] = Engine(spark).load_dir(sf_dir)
    return _ENGINES[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue per nation via the FK auto-join chain
    (lineitem→orders→customer→nation), nation broadcast."""
    return q04_revenue_by_nation(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# §2.4 aggregation
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark, sf_dir) -> DataFrame:
    """TPC-H Q1 shape: grouped aggregate battery on the fact table."""
    l = _eng(spark, sf_dir).t.lineitem
    return (l.filter(l.l_shipdate <= F.lit("2000-01-01").cast("timestamp"))
            .group(["l_returnflag", "l_linestatus"],
                   sum_qty=F.round(F.sum("l_quantity"), 2),
                   sum_base_price=F.round(F.sum("l_extendedprice"), 2),
                   sum_disc_price=F.round(F.sum(
                       F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2),
                   avg_qty=F.round(F.avg("l_quantity"), 4),
                   avg_disc=F.round(F.avg("l_discount"), 4),
                   count_order=F.count(F.lit(1)))
            .df)


def q02_agg_battery(spark, sf_dir) -> DataFrame:
    """Full §2.4 function surface over customer per nation."""
    from preql_spark.functions import aggregate as agg
    c = _eng(spark, sf_dir).t.customer
    return (c.group("c_nationkey",
                    n=agg.count(),
                    n_seg=agg.count_distinct("c_mktsegment"),
                    total=F.round(agg.sum_("c_acctbal"), 2),
                    avg=F.round(agg.mean("c_acctbal"), 4),
                    lo=agg.min_("c_acctbal"),
                    hi=agg.max_("c_acctbal"),
                    sd=F.round(agg.stddev("c_acctbal"), 4),
                    n_rich=agg.count_true(F.col("c_acctbal") > 5000))
            .df)


def q03_global_agg(spark, sf_dir) -> DataFrame:
    """Keyless aggregate ``{ => aggs}`` (global agg, compiler.py:274-275)."""
    o = _eng(spark, sf_dir).t.orders
    return (o.group(None,
                    n=F.count(F.lit(1)),
                    total=F.round(F.sum("o_totalprice"), 2),
                    hi=F.round(F.max("o_totalprice"), 2))
            .df)


def q04_revenue_by_nation(spark, sf_dir) -> DataFrame:
    """N-ary struct-join via FK registry + group + top-k ordering."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    j = tbl.join(l=eng.t.lineitem, o=eng.t.orders, c=eng.t.customer,
                 n=eng.t.nation, broadcast=("n",))
    return (eng.from_df(j.df)
            .project(nation=F.col("n.n_name"),
                     rev=F.col("l.l_extendedprice") * (1 - F.col("l.l_discount")))
            .group("nation", revenue=F.round(F.sum("rev"), 2))
            .order("^revenue", "nation")
            .df)


def q05_region_order_stats(spark, sf_dir) -> DataFrame:
    """4-table FK chain orders→customer→nation→region, dims broadcast."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    j = tbl.join(o=eng.t.orders, c=eng.t.customer, n=eng.t.nation,
                 r=eng.t.region, broadcast=("n", "r"))
    return (eng.from_df(j.df)
            .group({"region": F.col("r.r_name")},
                   n_orders=F.count(F.lit(1)),
                   total=F.round(F.sum(F.col("o.o_totalprice")), 2))
            .df)


def q06_forecast_revenue(spark, sf_dir) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate selection + single scalar agg —
    pure scan+filter, fully pushed down."""
    l = _eng(spark, sf_dir).t.lineitem
    return (l.filter(l.l_discount >= 0.05, l.l_discount <= 0.07, l.l_quantity < 24)
            .group(None, revenue=F.round(F.sum(
                F.col("l_extendedprice") * F.col("l_discount")), 2))
            .df)


def q07_collect_list(spark, sf_dir) -> DataFrame:
    """Bare column in agg position → array (MakeArray parity), sorted
    for determinism.  Serialized with array_join so the driver's
    pandas canonicalizer (which can't hash list cells) can compare it
    value-for-value against the DuckDB oracle."""
    from preql_spark.functions import aggregate as agg
    n = _eng(spark, sf_dir).t.nation
    return (n.group("n_regionkey", names=agg.collect("n_name", sort=True))
            .project(n_regionkey=F.col("n_regionkey"),
                     names=F.array_join(F.col("names"), ","))
            .df)


def q08_median_percentile(spark, sf_dir) -> DataFrame:
    """Exact median (list_median parity) + p90."""
    l = _eng(spark, sf_dir).t.lineitem
    return (l.group("l_returnflag",
                    med_qty=F.round(F.percentile("l_quantity", F.lit(0.5)), 4),
                    p90_price=F.round(F.percentile("l_extendedprice", F.lit(0.9)), 2))
            .df)


def q09_product_agg(spark, sf_dir) -> DataFrame:
    """product() aggregate parity over small per-order groups."""
    from preql_spark.functions import aggregate as agg
    eng = _eng(spark, sf_dir)
    t = eng.from_df(
        eng.t.lineitem.df.select((F.lit(1.0) + F.col("l_discount")).alias("x"),
                                 F.col("l_orderkey")))
    return (t.group("l_orderkey", prod=_pr4(agg.product("x")))
            .df)


# ---------------------------------------------------------------------------
# §2.2 / §2.6 projection, selection, order, slice
# ---------------------------------------------------------------------------

def q10_projection_markup(spark, sf_dir) -> DataFrame:
    """Projection with ellipsis-style compute + desc order + top-k →
    TakeOrderedAndProject."""
    p = _eng(spark, sf_dir).t.part
    return (p.project("p_partkey", "p_name",
                      markup=F.round(F.col("p_retailprice") / F.col("p_size"), 4))
            .order("^markup", "p_partkey")
            .limit(100)
            .df)


def q11_selection(spark, sf_dir) -> DataFrame:
    """ANDed multi-condition selection + projection."""
    c = _eng(spark, sf_dir).t.customer
    return (c.filter(c.c_acctbal >= 1000, c.c_acctbal < 5000,
                     c.c_mktsegment == "HOUSEHOLD")
            .project("c_custkey", "c_name", "c_acctbal")
            .df)


def q12_slice_page(spark, sf_dir) -> DataFrame:
    """OFFSET/LIMIT slice ``t[100..150]`` on a sorted table."""
    c = _eng(spark, sf_dir).t.customer
    return (c.order("c_custkey").slice(100, 150)
            .project("c_custkey", "c_name")
            .df)


def q13_string_funcs(spark, sf_dir) -> DataFrame:
    """§2.8 string battery: upper/lower/length/index/contains/slice/concat."""
    from preql_spark.functions import scalar as s
    p = _eng(spark, sf_dir).t.part
    return (p.project("p_partkey",
                      up=s.upper(p.p_name),
                      lo=s.lower(p.p_brand),
                      ln=s.length(p.p_name),
                      idx=s.str_index("old", p.p_name),
                      has=s.str_contains("cold", p.p_name),
                      sliced=s.str_slice(p.p_name, 0, 4),
                      cat=s.concat(p.p_brand, F.lit(":"), p.p_type))
            .df)


def q14_date_parts(spark, sf_dir) -> DataFrame:
    """§2.8 timestamp properties (hour..week_of_year)."""
    from preql_spark.functions import scalar as s
    o = _eng(spark, sf_dir).t.orders
    return (o.project("o_orderkey",
                      y=s.dt_year(o.o_orderdate),
                      m=s.dt_month(o.o_orderdate),
                      d=s.dt_day(o.o_orderdate),
                      dow=s.dt_day_of_week(o.o_orderdate),
                      woy=s.dt_week_of_year(o.o_orderdate))
            .df)


def q15_case_when(spark, sf_dir) -> DataFrame:
    """if/else expression → CASE; value-semantics or."""
    from preql_spark import exprs
    c = _eng(spark, sf_dir).t.customer
    return (c.project("c_custkey",
                      label=exprs.if_else(c.c_acctbal > 5000, F.lit("rich"),
                                          c.c_mktsegment),
                      seg=exprs.por(F.lit(""), c.c_mktsegment))
            .df)


def q16_casts(spark, sf_dir) -> DataFrame:
    """§2.8 cast matrix (casts.py parity): numeric↔string, floor-div."""
    from preql_spark import exprs
    l = _eng(spark, sf_dir).t.lineitem
    return (l.project("l_orderkey", "l_linenumber",
                      qty_int=F.floor(l.l_quantity).cast("long"),
                      qty_str=F.floor(l.l_quantity).cast("long").cast("string"),
                      back=F.floor(l.l_quantity).cast("long").cast("string").cast("long"),
                      fdiv=_pr4(exprs.fdiv(l.l_extendedprice, l.l_quantity)),
                      idiv=exprs.idiv(F.col("l_orderkey"), 7))
            .df)


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

def q17_leftjoin(spark, sf_dir) -> DataFrame:
    """Left join keeps unmatched left rows (customers with no orders)."""
    eng = _eng(spark, sf_dir)
    c, o = eng.t.customer, eng.t.orders
    j = c.join(o, on=c.c_custkey == o.o_custkey, how="left")
    return (j.group("c_custkey", n_orders=F.count("o_orderkey"))
            .df)


def q18_semi_join(spark, sf_dir) -> DataFrame:
    """Membership ``in`` against a table → left-semi."""
    eng = _eng(spark, sf_dir)
    big = eng.t.orders.filter(F.col("o_totalprice") > 400000)
    return (eng.t.customer.in_table(big, "c_custkey", "o_custkey")
            .project("c_custkey", "c_name")
            .df)


def q19_anti_join(spark, sf_dir) -> DataFrame:
    """``!in`` → left-anti: customers with no orders at all."""
    eng = _eng(spark, sf_dir)
    return (eng.t.customer.in_table(eng.t.orders, "c_custkey", "o_custkey",
                                    negate=True)
            .project("c_custkey")
            .df)


def q20_theta_join(spark, sf_dir) -> DataFrame:
    """$on: arbitrary boolean join — nation pairs within a region."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    a, b = eng.t.nation, eng.t.nation
    j = tbl.join(a=a, b=b,
                 on=(F.col("a.n_regionkey") == F.col("b.n_regionkey"))
                 & (F.col("a.n_name") < F.col("b.n_name")))
    return (eng.from_df(j.df)
            .project(region=F.col("a.n_regionkey"),
                     n1=F.col("a.n_name"), n2=F.col("b.n_name"))
            .df)


def q21_zipjoin(spark, sf_dir) -> DataFrame:
    """Positional zip join over two deterministic orderings."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    z = tbl.zipjoin(eng.t.region.project("r_name"),
                    eng.t.region.project("r_regionkey"),
                    order_a="r_name",
                    order_b=F.col("r_regionkey").desc())
    return z.df.select(F.col("a.r_name").alias("name_asc"),
                       F.col("b.r_regionkey").alias("key_desc"))


def q22_cross_join(spark, sf_dir) -> DataFrame:
    """joinall cartesian product (region × mktsegments)."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    segs = eng.t.customer.project("c_mktsegment").distinct()
    j = tbl.joinall(r=eng.t.region, s=segs)
    return j.df.select(F.col("r.r_name").alias("r_name"),
                       F.col("s.c_mktsegment").alias("seg"))


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------

def q23_set_ops(spark, sf_dir) -> DataFrame:
    """Union-distinct / intersect / except surfaced as tagged rows.
    Inputs deliberately keep duplicate rows (no pre-distinct) and use
    DIFFERENT column names — attesting that `&`/`-`/`|` dedup like the
    reference's INTERSECT/EXCEPT/UNION (pql_functions.py:385-409) and
    that all set ops match columns positionally, keeping the left
    table's names (sql_bin_op, pql_functions.py:362-383)."""
    eng = _eng(spark, sf_dir)
    cn = eng.t.customer.project(key=F.col("c_nationkey").cast("int"))
    sn = eng.t.supplier.project(skey=F.col("s_nationkey").cast("int"))
    both = (cn & sn).project("key", tag=F.lit("both"))
    conly = (cn - sn).project("key", tag=F.lit("cust_only"))
    union = (cn | sn).project("key", tag=F.lit("any"))
    return (both + conly + union).df


def q24_union_all(spark, sf_dir) -> DataFrame:
    """``t1 + t2`` UNION ALL with duplicate preservation."""
    eng = _eng(spark, sf_dir)
    hi = eng.t.orders.filter(F.col("o_totalprice") > 350000).project("o_orderkey")
    urgent = eng.t.orders.filter(F.col("o_orderpriority") == "1-URGENT") \
        .project("o_orderkey")
    return (hi + urgent).df


# ---------------------------------------------------------------------------
# §2.5 windows (reference has only enum; full surface is beyond-parity)
# ---------------------------------------------------------------------------

def q25_window_rank(spark, sf_dir) -> DataFrame:
    """Top-3 customers per nation by balance (row_number window)."""
    c = _eng(spark, sf_dir).t.customer
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (c.project("c_custkey", "c_nationkey", "c_acctbal",
                      rn=F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .df)


def q26_running_sum(spark, sf_dir) -> DataFrame:
    """Running total per customer (frame spec window) + lag delta."""
    o = _eng(spark, sf_dir).t.orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.filter(F.col("o_custkey") < 100)
            .project("o_custkey", "o_orderkey",
                     running=F.round(F.sum("o_totalprice").over(
                         w.rowsBetween(Window.unboundedPreceding, 0)), 2),
                     prev=F.round(F.coalesce(F.lag("o_totalprice", 1).over(w),
                                             F.lit(0.0)), 2))
            .df)


def q27_enum(spark, sf_dir) -> DataFrame:
    """Reference enum(): 0-based index column."""
    n = _eng(spark, sf_dir).t.nation
    return n.enum(order_by="n_name").project("index", "n_name").df


# ---------------------------------------------------------------------------
# §2.9 ranges / fan-out
# ---------------------------------------------------------------------------

def q28_range(spark, sf_dir) -> DataFrame:
    """[a..b] integer series → spark.range (no recursive CTE needed)."""
    eng = _eng(spark, sf_dir)
    t = eng.range(0, 1000)
    return (t.group({"bucket": F.col("item") % 7},
                    n=F.count(F.lit(1)), total=F.sum("item"))
            .df)


def q29_map_range(spark, sf_dir) -> DataFrame:
    """map_range fan-out (__builtins__.pql:592-650) →
    explode(sequence()), per-row end bound."""
    r = _eng(spark, sf_dir).t.region
    return (r.map_range(0, F.col("r_regionkey") + 1, alias="i")
            .project("r_name", "i").df)


# ---------------------------------------------------------------------------
# §2.4 beyond-parity: rollup / cube / pivot
# ---------------------------------------------------------------------------

def q30_rollup(spark, sf_dir) -> DataFrame:
    l = _eng(spark, sf_dir).t.lineitem
    return (l.rollup(["l_returnflag", "l_linestatus"],
                     sum_qty=F.round(F.sum("l_quantity"), 2),
                     n=F.count(F.lit(1)))
            .df)


def q31_pivot(spark, sf_dir) -> DataFrame:
    l = _eng(spark, sf_dir).t.lineitem
    return (l.pivot("l_returnflag", "l_linestatus", ["O", "F"],
                    F.round(F.sum("l_quantity"), 2))
            .df)


# ---------------------------------------------------------------------------
# Training-data pipeline operators (beyond-reference, first-class scope)
# ---------------------------------------------------------------------------

def q32_dedup_exact(spark, sf_dir) -> DataFrame:
    """Exact dedup survivors (min doc_id per normalized fingerprint)."""
    from preql_spark.operators import dedup
    eng = _eng(spark, sf_dir)
    return (dedup.dedup_exact(eng.t.documents.df, "doc_id")
            .select("doc_id", "source"))


def q33_fingerprint(spark, sf_dir) -> DataFrame:
    """Document fingerprinting: md5 + 60-bit portable fold."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    return d.df.select("doc_id",
                       text.fingerprint("text").alias("fp"),
                       text.fingerprint64("text").alias("fp64"))


def q34_token_stats(spark, sf_dir) -> DataFrame:
    """Token counting rolled up per source."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    per_doc = d.df.select("source", text.token_count("text").alias("n_tok"))
    return (per_doc.groupBy("source")
            .agg(F.sum("n_tok").alias("total_tokens"),
                 _pr4(F.avg("n_tok")).alias("avg_tokens"),
                 F.count(F.lit(1)).alias("n_docs")))


def q35_lang_id(spark, sf_dir) -> DataFrame:
    """Stopword-heuristic language ID per document."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    return d.df.select("doc_id", text.lang_id("text").alias("pred"))


def q36_quality(spark, sf_dir) -> DataFrame:
    """Quality scoring: token/punct/stopword/alpha metrics."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    m = text.quality_metrics(d.df)
    return m.select("doc_id", "n_tokens",
                    _pr4(F.col("avg_token_len")).alias("avg_token_len"),
                    _pr4(F.col("stopword_ratio")).alias("stopword_ratio"),
                    _pr4(F.col("alpha_ratio")).alias("alpha_ratio"))


def q37_minhash_signature(spark, sf_dir) -> DataFrame:
    """First 4 MinHash signature components (portable md5 hashing)."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    sig = dedup.minhash_signature(dedup.token_shingles("text", 3), 4)
    return d.df.select("doc_id",
                       sig.getItem(0).alias("h0"), sig.getItem(1).alias("h1"),
                       sig.getItem(2).alias("h2"), sig.getItem(3).alias("h3"))


def q38_neardup_minhash(spark, sf_dir) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates verified by exact
    Jaccard — oracle is the brute-force O(n²) Jaccard (recall check)."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    pairs = dedup.minhash_lsh_pairs(d.df, "doc_id", threshold=0.9)
    return pairs.select("id_a", "id_b", _pr4(F.col("jaccard")).alias("jaccard"))


def q39_simhash_pairs(spark, sf_dir) -> DataFrame:
    """SimHash near-dup pairs (60-bit signatures).  max_distance=3
    with 4 bands gives *guaranteed* recall by pigeonhole (≤3 differing
    bits leave at least one 15-bit band intact), so the banded plan is
    exactly equivalent to the brute-force oracle."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    return dedup.simhash_pairs(d.df, "doc_id", max_distance=3, bands=4)


def q40_cosine_topk(spark, sf_dir) -> DataFrame:
    """Brute-force cosine top-5 for the first 5 query vectors."""
    from preql_spark.operators import similarity
    e = _eng(spark, sf_dir).t.embeddings
    q = e.df.filter(F.col("vec_id") < 5)
    out = similarity.cosine_topk(e.df, q, k=5)
    return out.select("query_id", "neighbor_id", "rank",
                      _pr4(F.col("sim")).alias("sim"))


def q202_ivf_stream_index(spark, sf_dir) -> DataFrame:
    """Streaming ANN index maintenance end-to-end: centroids train
    OFFLINE on the first wave (ivf_build — the production
    retrain-offline / assign-online split), then two availableNow
    waves assign their new vectors with the build's exact hof argmin
    and append (__cid, __id, __v) rows partitioned by cell.  Searching
    the store with nprobe = n_centroids is exhaustive, so the result
    must equal brute-force cosine top-k over the FULL corpus — the
    index-completeness identity (no vector lost, duplicated, or
    mis-kept across waves/replays), graded against q40's brute-force
    DuckDB oracle.  r11: the ingest dedups through the dedicated ids
    SIDECAR (one small compacted file per steady-state batch read,
    never a full-index listing), compacted between the waves so wave
    2's anti-join reads the single-file store."""
    from preql_spark.operators.similarity import (ivf_build,
                                                  ivf_topk_from_store)
    from preql_spark.streaming.stream import (compact_ingest_ids,
                                              incremental_ivf_ingest)
    eng = _eng(spark, sf_dir)
    e = eng.t.embeddings.df.select("vec_id", "embedding")
    tmp = _scratch("q202_")
    src, idx, ck, ids = (os.path.join(tmp, x)
                         for x in ("src", "idx", "ck", "ids"))
    _, cents = ivf_build(e.filter(F.col("vec_id") < 250), dim=64,
                         n_centroids=8)
    e.filter(F.col("vec_id") < 250).write.mode("overwrite").parquet(src)
    incremental_ivf_ingest(spark, src, ck, idx, cents, ids_path=ids)
    compact_ingest_ids(spark, ids)
    e.filter(F.col("vec_id") >= 250).write.mode("append").parquet(src)
    incremental_ivf_ingest(spark, src, ck, idx, cents, ids_path=ids)
    q = e.filter(F.col("vec_id") < 5)
    out = ivf_topk_from_store(spark, idx, cents, q, k=5,
                              nprobe=len(cents))
    return out.select("query_id", "neighbor_id", "rank",
                      _pr4(F.col("sim")).alias("sim"))


def q41_embedding_neardup(spark, sf_dir) -> DataFrame:
    """Embedding near-dup pairs on the LSH SCALE path (graded):
    exactly the pairs with 16-bit hyperplane-signature hamming <= 7
    AND cosine >= 0.45.  Candidate generation is pigeonhole-banded
    (8 bands of 2 bits: <= 7 differing bits leave one band intact),
    so the bucketed plan is exactly equivalent to the brute-force
    oracle, which mirrors the signature computation and hamming gate
    in SQL.  Brute cosine_pairs stays as the tiny-corpus cross-check
    (tests/test_operators.py::test_lsh_exact_vs_brute).

    ``sig_method="hof"``: the graded entry keeps the sequential-fold
    projection so signature bits are bit-identical to the oracle's
    sequential list_dot_product even when a projection lands within
    an ulp of zero; the BLAS matmul default stays the bench path."""
    from preql_spark.operators import similarity
    e = _eng(spark, sf_dir).t.embeddings
    out = similarity.lsh_cosine_pairs_exact(e.df, 0.45, dim=64,
                                            max_hamming=7, n_planes=16,
                                            sig_method="hof")
    return out.select("id_a", "id_b", "hamming",
                      _pr4(F.col("sim")).alias("sim"))


def q42_bfs(spark, sf_dir) -> DataFrame:
    """Iterative BFS reachability over a derived 97-node edge table
    (reference graph.pql bfs — recursive CTE in the oracle)."""
    from preql_spark.operators import graph
    eng = _eng(spark, sf_dir)
    edges = (eng.t.orders.df
             .select((F.col("o_custkey") % 97).alias("src"),
                     (F.col("o_orderkey") % 97).alias("dst"))
             .distinct())
    initial = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return graph.bfs(edges, initial)


def q43_walk_tree(spark, sf_dir) -> DataFrame:
    """Rank-limited walk (graph.pql walk_tree) over a sparse edge set."""
    from preql_spark.operators import graph
    eng = _eng(spark, sf_dir)
    edges = (eng.t.nation.df
             .select(F.col("n_nationkey").cast("long").alias("src"),
                     ((F.col("n_nationkey") * 2 + 1) % 25).cast("long").alias("dst")))
    initial = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    return graph.walk_tree(edges, initial, max_rank=4)


def q44_sessionize(spark, sf_dir) -> DataFrame:
    """Sessionization: 30-min-gap sessions per user over the events
    stream table (batch form; streaming variant in preql_spark.streaming)."""
    e = _eng(spark, sf_dir).t.events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts", 1).over(w))
    newsess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (e.df.withColumn("__new", newsess)
            .withColumn("session_idx",
                        F.sum("__new").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event")))


def q45_tumbling_window(spark, sf_dir) -> DataFrame:
    """Tumbling 1-hour window aggregate over events (batch form of the
    streaming windowed agg)."""
    e = _eng(spark, sf_dir).t.events
    return (e.df.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("bucket"),
        F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total")))


def q46_asof_join(spark, sf_dir) -> DataFrame:
    """As-of join: each view/click event matched to the user's most
    recent error event at or before it."""
    from preql_spark.operators import asof
    e = _eng(spark, sf_dir).t.events
    left = (e.df.filter(F.col("event_type").isin("view", "click"))
            .select("user_id", "ts", "event_id"))
    right = (e.df.filter(F.col("event_type") == "error")
             .select("user_id", "ts", F.col("event_id").alias("error_id")))
    out = asof.asof_join(left, right, "user_id", "ts", "ts", ["error_id"])
    return out.select("event_id", "error_id")


def q47_multimodal_features(spark, sf_dir) -> DataFrame:
    """Multimodal plumbing: synthesized binary payloads → mapInPandas
    feature extraction.  The fake decoder is md5-derived, so the
    Arrow-boundary kernel is value-checked against a pure-SQL oracle
    that recomputes the same features from the digest."""
    from preql_spark.operators import multimodal
    d = _eng(spark, sf_dir).t.documents
    withbin = multimodal.attach_binary_column(d.df)
    return multimodal.extract_image_features(withbin)


def q48_stream_tumbling(spark, sf_dir) -> DataFrame:
    """Structured Streaming tumbling window (availableNow replay of the
    events table) — oracle is the equivalent batch aggregation."""
    import os
    from preql_spark import streaming as st
    _eng(spark, sf_dir)  # ensures nanos conf; stream sets it too
    stream = st.read_event_stream(
        spark, os.path.join(sf_dir, "events.parquet"), watermark="2 hours")
    agg = st.tumbling_agg(stream, "1 hour", keys=["event_type"],
                          n=F.count(F.lit(1)),
                          total=F.round(F.sum("value"), 2))
    out = st.run_to_memory(agg, f"q48_sink_{abs(hash(sf_dir)) % 10**6}")
    return out.select(F.unix_timestamp("window_start").alias("bucket"),
                      "event_type", "n", "total")


def q49_struct_join_access(spark, sf_dir) -> DataFrame:
    """Struct-per-table join output + nested field access (reference
    join result model, pql_functions.py:483)."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    j = tbl.join(n=eng.t.nation, r=eng.t.region, broadcast=("r",))
    return (eng.from_df(j.df)
            .project(nation=F.col("n.n_name"),
                     region=F.col("r.r_name"),
                     key_sum=F.col("n.n_nationkey") + F.col("r.r_regionkey"))
            .df)


def q50_in_list(spark, sf_dir) -> DataFrame:
    """``in`` against a literal list (Contains, sql.py:319-329)."""
    c = _eng(spark, sf_dir).t.customer
    return (c.filter(c.c_mktsegment.isin("BUILDING", "MACHINERY"))
            .project("c_custkey", "c_mktsegment")
            .df)


def q51_char_funcs(spark, sf_dir) -> DataFrame:
    """char / char_ord / char_range / repeat (§2.8)."""
    from preql_spark.functions import scalar as s
    n = _eng(spark, sf_dir).t.nation
    return (n.project("n_nationkey",
                      first_ord=s.char_ord(F.substring("n_name", 1, 1)),
                      chr_back=s.char(s.char_ord(F.substring("n_name", 1, 1))),
                      rep=s.repeat(F.substring("n_name", 1, 2), 3))
            .df)


def q52_window_battery(spark, sf_dir) -> DataFrame:
    """Beyond-parity window surface: rank / dense_rank / lag / lead /
    ntile over a partitioned ordering."""
    o = _eng(spark, sf_dir).t.orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (o.filter(F.col("o_custkey") < 200)
            .project("o_custkey", "o_orderkey",
                     rnk=F.rank().over(w),
                     drnk=F.dense_rank().over(w),
                     prev_key=F.coalesce(F.lag("o_orderkey", 1).over(w), F.lit(-1)),
                     next_key=F.coalesce(F.lead("o_orderkey", 1).over(w), F.lit(-1)),
                     quartile=F.ntile(4).over(w))
            .df)


def q53_cube(spark, sf_dir) -> DataFrame:
    """CUBE grouping sets (beyond-reference, SURVEY §2.4)."""
    l = _eng(spark, sf_dir).t.lineitem
    return (l.cube(["l_returnflag", "l_linestatus"],
                   n=F.count(F.lit(1)),
                   sum_qty=F.round(F.sum("l_quantity"), 2))
            .df)


def q54_fmt_interpolation(spark, sf_dir) -> DataFrame:
    """fmt() string interpolation (pql_functions.py:132-169) → concat."""
    from preql_spark.functions import scalar as s
    c = _eng(spark, sf_dir).t.customer
    return (c.project("c_custkey",
                     msg=s.concat(F.lit("customer "), F.col("c_name"),
                                  F.lit(" in segment "), F.col("c_mktsegment")))
            .df)


def q55_lang_pipeline(spark, sf_dir) -> DataFrame:
    """Preql-syntax front-end: selection → group-by → order, compiled
    by preql_spark.lang (reference language surface, preql.lark)."""
    eng = _eng(spark, sf_dir)
    out = eng.q('customer[c_acctbal > 5000]'
                '{c_mktsegment => n: count(), total: round(sum(c_acctbal), 2)}'
                ' order {^total}')
    return out.df


def q56_lang_join(spark, sf_dir) -> DataFrame:
    """Preql-syntax n-ary join with struct field projection."""
    eng = _eng(spark, sf_dir)
    out = eng.q('join(n: nation, r: region)'
                '{nation: n.n_name, region: r.r_name}')
    return out.df


def q57_describe_stats(spark, sf_dir) -> DataFrame:
    """Reference describe() semantics (__builtins__.pql:656-667):
    count/mean/stddev/min/max per numeric column, one scan."""
    c = _eng(spark, sf_dir).t.customer
    d = c.describe_stats("c_acctbal", "c_nationkey")
    return (d.project("col_name", "n",
                      mean=_pr4(F.col("mean")),
                      sd=_pr4(F.col("sd")),
                      lo=F.col("lo"), hi=F.col("hi"))
            .df)


def q58_sample_hash(spark, sf_dir) -> DataFrame:
    """Deterministic content-hash sampling (reproducible across
    engines/runs — the scale-correct replacement for rand() splits)."""
    d = _eng(spark, sf_dir).t.documents
    return (d.sample_hash("doc_id", 0.25)
            .project("doc_id", "source")
            .df)


def q59_first_last_by(spark, sf_dir) -> DataFrame:
    """Deterministic first/last per group via min_by/max_by
    (reference first() — __builtins__.pql:84-127 — made
    order-stable for distributed groups)."""
    from preql_spark.functions import aggregate as agg
    c = _eng(spark, sf_dir).t.customer
    return (c.group("c_nationkey",
                    first_name=agg.first_by("c_name", "c_custkey"),
                    last_name=agg.last_by("c_name", "c_custkey"))
            .df)


def q60_dml_lifecycle(spark, sf_dir) -> DataFrame:
    """Mutation surface end-to-end (§2.10): CTAS → update → delete →
    bulk insert on a copy-on-write MutableTable; returns final state."""
    from preql_spark.sources.mutable import MutableTable
    root = _scratch("preql_dml_q60_")
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    t = MutableTable.from_expr(spark, "nation_dml", root, nation)
    t.update(F.col("n_regionkey") == 0,
             n_name=F.concat(F.col("n_name"), F.lit("_AF")))
    t.delete(F.col("n_regionkey") == 4)
    t.insert_rows([{"n_nationkey": 900, "n_name": "ATLANTIS",
                    "n_regionkey": 0}])
    t.merge(spark.createDataFrame(
        [(1, "NATION_1_M"), (901, "LEMURIA")],
        "n_nationkey: long, n_name: string"), on="n_nationkey")
    return t.df().select("n_nationkey", "n_name", "n_regionkey")


def q61_lang_user_func(spark, sf_dir) -> DataFrame:
    """User-defined functions in the Preql-syntax front-end, inlined
    at compile time into Column expressions (§2.12; eval_func_call,
    evaluate.py:579-648) — no UDF in the plan."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'func disc_price(p, d) = p * (1 - d);'
        'func cheap(t, lim) = t[l_quantity < lim];'
        'c = cheap(lineitem, 10);'
        'c{l_returnflag => n: count(),'
        '  rev: round(sum(disc_price(l_extendedprice, l_discount)), 2)}')
    return out.df


def q62_json_extract(spark, sf_dir) -> DataFrame:
    """JSON scalar functions (additive — the reference declares T.json
    but ships no get/extract, pql_types.py:284-285)."""
    from preql_spark.functions import scalar as sc
    e = _eng(spark, sf_dir).t.events
    return (e.project("event_id",
                      k=sc.to_int(sc.json_get(F.col("props"), "$.k")))
            .df)


def q63_stream_sliding(spark, sf_dir) -> DataFrame:
    """Structured Streaming sliding window (2h window, 1h slide) —
    every event lands in exactly two windows; oracle replicates via a
    2-way unnest."""
    from preql_spark import streaming as st
    _eng(spark, sf_dir)
    stream = st.read_event_stream(
        spark, os.path.join(sf_dir, "events.parquet"), watermark="4 hours")
    agg = st.sliding_agg(stream, "2 hours", "1 hour", keys=["event_type"],
                         n=F.count(F.lit(1)),
                         total=F.round(F.sum("value"), 2))
    out = st.run_to_memory(agg, f"q63_sink_{abs(hash(sf_dir)) % 10**6}")
    return out.select(F.unix_timestamp("window_start").alias("bucket"),
                      "event_type", "n", "total")


def q64_tfidf_top_terms(spark, sf_dir) -> DataFrame:
    """TF-IDF over the documents table (text-pipeline §beyond): top-3
    terms per document by tfidf with deterministic tie-breaks."""
    from preql_spark.operators.text import tf_idf
    d = _eng(spark, sf_dir).t.documents
    scored = tf_idf(d.df.filter(F.col("doc_id") < 100), "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "token", "rnk",
                    _pr4(F.col("tfidf")).alias("tfidf")))


def q65_sample_stratified(spark, sf_dir) -> DataFrame:
    """Per-stratum deterministic sampling (balanced-dataset primitive:
    downsample a boilerplate source, keep a rare one whole)."""
    d = _eng(spark, sf_dir).t.documents
    return (d.sample_stratified("doc_id", "source",
                                {"src0": 0.3, "src1": 1.0})
            .project("doc_id", "source")
            .df)


def q66_zipjoin_longest(spark, sf_dir) -> DataFrame:
    """zipjoin_longest parity (__builtins__.pql:167-257): positional
    full join of unequal-length sides, nulls pad the short side."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    z = tbl.zipjoin(eng.t.region, eng.t.nation, how="longest",
                    order_a="r_regionkey", order_b="n_nationkey")
    return (eng.from_df(z.df)
            .project(idx=F.coalesce(F.col("b.n_nationkey"),
                                    F.col("a.r_regionkey")),
                     r_name=F.col("a.r_name"),
                     n_name=F.col("b.n_name"))
            .df)


def q67_stream_session(spark, sf_dir) -> DataFrame:
    """Structured Streaming session windows (30-min inactivity gap per
    user) — completes the streaming window trio (tumbling q48,
    sliding q63); oracle is batch gaps-and-islands."""
    from preql_spark import streaming as st
    _eng(spark, sf_dir)
    stream = st.read_event_stream(
        spark, os.path.join(sf_dir, "events.parquet"), watermark="4 hours")
    agg = st.session_agg(stream, "30 minutes", keys=["user_id"],
                         n_events=F.count(F.lit(1)),
                         first_event=F.min("event_id"))
    out = st.run_to_memory(agg, f"q67_sink_{abs(hash(sf_dir)) % 10**6}")
    return out.select(F.unix_timestamp("session_start").alias("start_s"),
                      "user_id", "n_events", "first_event")


def q68_lang_theta_join(spark, sf_dir) -> DataFrame:
    """$on theta-join through the Preql-syntax front-end
    (pql_functions.py:503-507; test_basic.py:1510-1525)."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'join(a: nation, b: nation, on: a.n_nationkey < b.n_nationkey)'
        '{x: a.n_name, y: b.n_name}')
    return out.df


def q69_collect_explode_roundtrip(spark, sf_dir) -> DataFrame:
    """collect_list → explode round-trip: grouping to arrays and
    unnesting back restores the original (key, value) rows."""
    from preql_spark.functions import aggregate as agg
    n = _eng(spark, sf_dir).t.nation
    return (n.group("n_regionkey", names=agg.collect("n_name", sort=True))
            .explode("names", alias="n_name")
            .df)


def q70_unpivot(spark, sf_dir) -> DataFrame:
    """Melt (unpivot) wide quality metrics to long rows — the inverse
    of pivot; metadata-only reshape."""
    l = _eng(spark, sf_dir).t.lineitem
    wide = l.filter(F.col("l_orderkey") < 200).project(
        "l_orderkey", "l_linenumber",
        qty=F.col("l_quantity").cast("double"),
        disc=F.col("l_discount").cast("double"))
    return (wide.unpivot(["l_orderkey", "l_linenumber"], ["qty", "disc"])
            .df)


def q71_histogram(spark, sf_dir) -> DataFrame:
    """Fixed-range histogram of account balances (single-pass
    partial-agg bucketing)."""
    c = _eng(spark, sf_dir).t.customer
    h = c.histogram("c_acctbal", -1000.0, 10000.0, 11)
    return h.project("bucket", "n",
                     lo=_pr4(F.col("lo")), hi=_pr4(F.col("hi"))).df


def q72_corr(spark, sf_dir) -> DataFrame:
    """Correlation/covariance aggregates per return flag."""
    from preql_spark.functions import aggregate as agg
    l = _eng(spark, sf_dir).t.lineitem
    return (l.group("l_returnflag",
                    c=_pr4(agg.corr("l_quantity", "l_extendedprice")),
                    cv=_pr4(agg.covar_samp("l_discount", "l_tax")))
            .df)


def q73_dedup_canonical(spark, sf_dir) -> DataFrame:
    """Full near-dup dedup pipeline: MinHash-LSH pairs → connected
    components (iterative min-label propagation) → keep one canonical
    doc per cluster.  Oracle recomputes the same clusters with a
    DuckDB recursive CTE over brute-force exact-Jaccard pairs."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    pairs = dedup.minhash_lsh_pairs(d.df, "doc_id", threshold=0.9)
    return (dedup.dedup_keep_canonical(d.df, pairs, "doc_id")
            .select("doc_id"))


def q200_leakage_safe_split(spark, sf_dir) -> DataFrame:
    """Near-dup-aware train/valid/test split capstone: MinHash-LSH
    pairs → connected components → every row keyed by
    coalesce(component canonical, own id) → the portable hash-split
    rule — whole duplicate clusters land on one side (no train/eval
    leakage), singletons split independently, assignment
    reproducible cross-engine.  The oracle recomputes the clusters
    with q73's recursive CTE over brute-force exact-Jaccard pairs
    and the split with q74's md5-bucket spelling."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    pairs = dedup.minhash_lsh_pairs(d.df, "doc_id", threshold=0.9)
    return (dedup.leakage_safe_split(
        d.df, pairs, {"train": 0.8, "valid": 0.1, "test": 0.1})
        .select("doc_id", "split"))


def q208_source_concentration(spark, sf_dir) -> DataFrame:
    """Mixture-health datacard metric: per language, how concentrated
    the character mass is across sources — n_keys, total chars, HHI
    (squared shares folded in sorted key order, exact divisions over
    int64 sums), and the dominant source's share.  One (lang, source)
    partial agg then a per-group fold bounded by source cardinality."""
    from preql_spark.operators.text import concentration
    d = _eng(spark, sf_dir).t.documents.df
    return concentration(d, ["lang"], "source", "n_chars") \
        .select("lang", "n_keys", "total",
                _pr4(F.col("hhi")).alias("hhi"),
                _pr4(F.col("top_share")).alias("top_share"))


def q207_rolling_anomalies(spark, sf_dir) -> DataFrame:
    """Rolling z-score anomaly gate: each event scores against the
    mean/sample-stddev of its 50 strictly-preceding same-type events
    (event_id tie-break for deterministic same-timestamp order);
    |z| > 2.5 flags.  z rounds to 4dp on both engines (stddev
    implementations agree to ~1 ulp; rounding absorbs it — the q02
    convention).  Output keeps every row so warm-up NULLs are graded
    too."""
    from preql_spark.operators.events import rolling_anomalies
    e = _eng(spark, sf_dir).t.events.df
    out = rolling_anomalies(e, ["event_type"], "ts", "value",
                            window=50, k=2.5, tie_col="event_id")
    return out.select("event_id", "event_type",
                      _pr4(F.col("z")).alias("z"), "is_anomaly")


def q206_quantile_normalize(spark, sf_dir) -> DataFrame:
    """Within-group empirical-quantile scaling: every event value
    maps to its rank among its event_type's NON-NULL values —
    (rank - n_null - 1)/(n_nonnull - 1), integers through one exact
    division, bit-identical cross-engine.  Every ~97th value is
    NULLed deterministically so the NULL contract is graded: NULLs
    score NULL and neither take a rank nor inflate n.  One group-key
    shuffle + per-group sort window, never global."""
    from preql_spark.operators.events import quantile_normalize
    e = _eng(spark, sf_dir).t.events.df
    cents = e.select(
        "event_id", "event_type",
        F.when(F.col("event_id") % 97 != 0,
               F.floor(F.col("value").cast("double") * 100
                       + F.lit(0.5)).cast("long")).alias("cents"))
    return quantile_normalize(cents, ["event_type"], "cents") \
        .select("event_id", "event_type", "qn")


def q205_k_anonymity(spark, sf_dir) -> DataFrame:
    """k-anonymity suppression over (event_type, value bucket) quasi
    identifiers: drop every row whose combination appears fewer than
    10 times — one count window on the quasi key (no sort, no join),
    filter scan-local.  The oracle replays the identical window."""
    from preql_spark.operators.text import k_anonymity_filter
    e = _eng(spark, sf_dir).t.events.df
    q = e.select("event_id", "event_type",
                 F.expr("CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)"
                        " AS BIGINT) DIV 2000").alias("vb"))
    return k_anonymity_filter(q, ["event_type", "vb"], k=10)


def q204_canonicalize_url(spark, sf_dir) -> DataFrame:
    """URL canonicalization for URL-level dedup: fragment strip,
    tracking-param removal with separator cleanup, authority-only
    lowercase (paths stay case-sensitive), default-port and
    trailing-slash strip — a pure regexp chain, scan-local, spelled
    identically in the RE2 oracle.  URLs are synthesized onto the
    corpus (mixed-case authority, :443, utm params, fragment) so
    every stage fires; the dedup payoff is asserted in-query: the
    canonical count_distinct collapses the utm/fragment variants."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    # two dirty variants of the same logical page per doc
    base = F.concat(F.lit("HTTPS://Example.COM:443/p/"),
                    F.col("doc_id"), F.lit("/"))
    v1 = F.concat(base, F.lit("?utm_source=a&ref=1#top"))
    v2 = F.concat(base, F.lit("?ref=1&utm_campaign=b"))
    return d.df.select(
        "doc_id",
        text.canonicalize_url(v1).alias("c1"),
        text.canonicalize_url(v2).alias("c2"),
        (text.canonicalize_url(v1) == text.canonicalize_url(v2))
        .alias("collapsed"))


def q203_dedup_keep_best(spark, sf_dir) -> DataFrame:
    """Quality-aware canonical selection: keep the LONGEST copy per
    near-dup cluster (desc length, doc_id tie-break) instead of the
    min id — the production dedup rule when crawls repeat.  The
    oracle recomputes q73's recursive-CTE clusters and replays the
    same cluster-partitioned row_number."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    pairs = dedup.minhash_lsh_pairs(d.df, "doc_id", threshold=0.9)
    return (dedup.dedup_keep_best(
        d.df, pairs, "doc_id",
        [F.length("text").desc(), F.col("doc_id")])
        .select("doc_id"))


def q209_curation_pipeline(spark, sf_dir) -> DataFrame:
    """End-to-end curation capstone — the realistic "raw crawl →
    training-ready shards + datacard" path, composing the r10/r11
    operators in their production order and oracled END TO END:

    1. raw crawl: TWO dirty URL variants per logical page (mixed-case
       authority, :80, utm params, fragment vs an already-canonical
       spelling) and per-doc text dirt (case flips / punctuation
       noise keyed by doc_id % 3);
    2. ``canonicalize_url`` + exact URL-dedup (min crawl-seq per
       canonical URL) — 2N crawl rows collapse to N pages;
    3. ``normalize_text`` — the dedup preprocessing contract: the
       case/punct dirt must NOT perturb near-dup structure;
    4. ``minhash_lsh_pairs`` (threshold 0.9) over the NORMALIZED
       text → ``dedup_keep_best`` keeps the longest raw copy per
       near-dup cluster;
    5. ``leakage_safe_split`` 80/10/10 keyed by duplicate cluster —
       whole clusters land on one side;
    6. ``concentration`` datacard: per split, how concentrated the
       kept char mass is across canonical HOSTS (n_keys, total,
       HHI, top_share).

    Any pair/cluster/keep/split/dedup error shifts the per-split
    char masses, so the 3-row value hash grades the WHOLE pipeline.
    The oracle replays every stage: the q204 RE2 canonicalization
    chain, the q201 fold chain (composed from the engine's own
    tables), q73's recursive-CTE clusters over brute-force exact
    Jaccard, the q203 keep-best window, q200's md5-bucket split,
    and the q208 sorted-fold HHI."""
    from preql_spark.operators import dedup, text
    d = _eng(spark, sf_dir).t.documents.df
    doc = F.col("doc_id")
    dirty = (F.when(doc % 3 == 0, F.upper("text"))
             .when(doc % 3 == 1, F.concat(F.col("text"), F.lit(" !!")))
             .otherwise(F.col("text")))
    v1 = F.concat(F.lit("HTTP://H"), doc % 7,
                  F.lit(".Example.COM:80/p/"), doc,
                  F.lit("/?utm_source=x&ref="), doc, F.lit("#f"))
    v2 = F.concat(F.lit("http://h"), doc % 7,
                  F.lit(".example.com/p/"), doc,
                  F.lit("?ref="), doc)
    crawl = (d.select(doc, F.lit(1).alias("seq"), v1.alias("url"),
                      dirty.alias("dirty"))
             .unionByName(
                 d.select(doc, F.lit(2).alias("seq"), v2.alias("url"),
                          dirty.alias("dirty"))))
    canon = crawl.withColumn("curl", text.canonicalize_url("url"))
    w = Window.partitionBy("curl").orderBy("seq")
    # r14 (guide §2.5/§2.6): the URL window's output shuffle is tiny
    # in BYTES, so AQE coalesces it to ~2 partitions — but the rows
    # are regex-EXPENSIVE (host_of + the normalize_text fold chain),
    # which serialized the heaviest per-row work of the pipeline on 2
    # cores (stage-profiled: ~11 s task-time in a 2-task stage).
    # Re-establish parallelism BETWEEN the window and the regex
    # projection (ensure_parallelism: no-op at real scale where the
    # scan already has >= cores files), and persist the finished page
    # frame: it is consumed by BOTH the LSH pass and keep-best, and
    # without the persist the whole canonicalize→window→normalize
    # chain was evaluated twice per run.  Values are unchanged —
    # repartition/persist reorder nothing the window hasn't already
    # decided (winner = min seq per curl, computed before either).
    page = text.ensure_parallelism(
        canon.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "dirty", "curl"))
    page = (page.select("doc_id", "dirty",
                        text.host_of("curl").alias("host"),
                        text.normalize_text("dirty").alias("ntext"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    pairs = dedup.minhash_lsh_pairs(page, "doc_id", text_col="ntext",
                                    threshold=0.9)
    # ONE CC pass shared by keep-best and the split (the components
    # frame is checkpoint-materialized, so the reuse is free)
    comp = dedup.connected_components(pairs)
    kept = dedup.dedup_keep_best(
        page, pairs, "doc_id",
        [F.length("dirty").desc(), F.col("doc_id")],
        components=comp)
    split = dedup.leakage_safe_split(
        kept, pairs, {"train": 0.8, "valid": 0.1, "test": 0.1},
        components=comp)
    out = text.concentration(split, ["split"], "host",
                             "length(dirty)")
    return out.select("split", "n_keys", "total",
                      _pr4(F.col("hhi")).alias("hhi"),
                      _pr4(F.col("top_share")).alias("top_share"))


def q74_split_by_hash(spark, sf_dir) -> DataFrame:
    """Deterministic group-aware train/valid/test split counts by
    source: the label is a pure function of the key hash, so the
    split is reproducible across engines (oracle recomputes it)."""
    d = _eng(spark, sf_dir).t.documents
    return (d.split_by_hash("doc_id",
                            {"train": 0.8, "valid": 0.1, "test": 0.1})
            .group(["source", "split"], n=F.count(F.lit(1)))
            .df)


def q75_pack_sequences(spark, sf_dir) -> DataFrame:
    """Token-budget sequence packing (context-window batch
    construction): bucketed concat-then-chunk, one shuffle, windows
    partitioned per bucket — no global sort at scale."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    return text.pack_sequences(d.df, "doc_id", "text",
                               budget=512, n_buckets=16)


def q76_chunk_tokens(spark, sf_dir) -> DataFrame:
    """Overlapping token chunking (RAG / context prep): pure per-row
    explode, zero shuffles."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    return text.chunk_tokens(d.df, chunk=64, overlap=16)


def q77_quantile_filter(spark, sf_dir) -> DataFrame:
    """Corpus-relative quality gate: keep docs at/above their source's
    25th-percentile token count (exact interpolated percentile,
    broadcast thresholds — fact table is never re-shuffled)."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    base = d.df.select("doc_id", "source",
                       text.token_count("text").alias("n_tokens"))
    return text.quantile_filter(base, "n_tokens", 0.25, by="source")


def q78_interval_join(spark, sf_dir) -> DataFrame:
    """Range join lowered to an equi-join on time buckets (the raw
    theta predicate would run as a nested-loop join): count events in
    each of 15 deterministic 6-hour maintenance windows."""
    from preql_spark.operators.rangejoin import interval_join
    eng = _eng(spark, sf_dir)
    iv = (spark.range(15)
          .select(F.col("id").alias("window_id"),
                  (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                   + F.make_interval(days=F.col("id") * 2)).alias("start"))
          .withColumn("end", F.col("start") + F.expr("INTERVAL 6 HOURS")))
    ev = eng.t.events.df.select("event_id", "ts")
    out = interval_join(ev, iv, bucket_s=6 * 3600)
    return out.groupBy("window_id").agg(
        F.count(F.lit(1)).alias("n_events"))


def q79_stream_stream_join(spark, sf_dir) -> DataFrame:
    """Stream-stream self-join on user within an event-time range
    (the 'within' constraint bounds join state under the watermark);
    oracle is the equivalent batch range self-join."""
    import os as _os
    from preql_spark import streaming as st
    _eng(spark, sf_dir)
    p = _os.path.join(sf_dir, "events.parquet")
    l = st.read_event_stream(spark, p, watermark="1 hour") \
        .select("user_id", "event_id", "ts")
    r = st.read_event_stream(spark, p, watermark="1 hour") \
        .select("user_id", F.col("event_id").alias("r_event_id"), "ts")
    j = st.stream_join(l, r, ["user_id"], within="2 minutes")
    out = st.run_to_memory(j, f"q79_sink_{abs(hash(sf_dir)) % 10**6}",
                           output_mode="append")
    return out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


def q80_centroid_agg(spark, sf_dir) -> DataFrame:
    """Per-group mean embedding via explode + (group, position)
    partial agg — scalar rows through the shuffle, not arrays.
    Result flattened to (grp, dim, val) scalar rows so the driver's
    pandas canonicalizer (which can't hash list cells) can compare
    it value-for-value against the DuckDB oracle."""
    from preql_spark.operators.similarity import centroid_agg
    e = _eng(spark, sf_dir).t.embeddings
    g = e.df.withColumn("grp", F.col("vec_id") % 8)
    out = centroid_agg(g, "grp")
    return (out.select("grp", F.posexplode("centroid").alias("dim", "val"))
            .select("grp", "dim", _pr4(F.col("val")).alias("val")))


def q81_grouping_sets(spark, sf_dir) -> DataFrame:
    """Explicit GROUPING SETS — one shuffle for several groupings."""
    o = _eng(spark, sf_dir).t.orders
    return (o.grouping_sets(
        [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
        n=F.count(F.lit(1)),
        total=F.round(F.sum("o_totalprice"), 2)).df)


def q82_redact_pii(spark, sf_dir) -> DataFrame:
    """PII scrubbing (email/phone/IPv4 → placeholders) as a pure
    regexp chain — scan-local, no shuffle.  PII synthesized onto the
    corpus so the redaction paths actually fire."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    dirty = F.concat(F.col("text"),
                     F.lit(" contact u"), F.col("doc_id"),
                     F.lit("@example.com or +1 (555) 010-"),
                     F.col("doc_id"), F.lit(" at 10.0.0."),
                     (F.col("doc_id") % 255))
    return d.df.select("doc_id",
                       text.redact_pii(dirty).alias("clean"))


def q214_pii_counts(spark, sf_dir) -> DataFrame:
    """PII exposure datacard (the audit sibling of q82's redaction):
    per (source, kind), docs-with-a-match and total matches, over
    the q82 synthesized dirt (every doc gains one email, one phone,
    one IPv4) ON TOP of whatever the raw text already matches — the
    oracle runs the IDENTICAL RE2-compatible patterns, composed from
    the engine's own PII_PATTERNS table so the spellings cannot
    drift.  Scan-local match counts, one grouped agg."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    dirty = F.concat(F.col("text"),
                     F.lit(" contact u"), F.col("doc_id"),
                     F.lit("@example.com or +1 (555) 010-"),
                     F.col("doc_id"), F.lit(" at 10.0.0."),
                     (F.col("doc_id") % 255))
    return (text.pii_counts(
        d.df.select("source", dirty.alias("s")), ["source"], "s")
        .select("source", "kind", "n_matches", "n_docs"))


def q201_normalize_text(spark, sf_dir) -> DataFrame:
    """Deterministic text normalization (lowercase → fixed Latin
    accent fold → punctuation strip → whitespace collapse), the
    preprocessing contract in front of fingerprint/dedup — pure
    built-in string chain, scan-local, codegen, no UDF.  Case,
    accents (incl. the multi-char æ/œ/ß/ĳ/þ folds and Latin
    Extended-A), punctuation, and ragged spacing are synthesized onto
    the corpus so every stage actually fires; the oracle spells the
    identical lower/replace/translate/regexp_replace chain in DuckDB,
    composed from the engine's own fold tables."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    dirty = F.concat(F.upper(F.substring(F.col("text"), 1, 24)),
                     F.lit(_Q201_DIRT),
                     F.col("text"))
    return d.df.select("doc_id",
                       text.normalize_text(dirty).alias("norm"))


def q211_strip_repeated_units(spark, sf_dir) -> DataFrame:
    """Intra-document self-repetition removal (the Gopher repetition
    rule at line granularity): repeated units synthesized onto every
    doc (text + its 30-char head twice + the full text again) must
    collapse to the first occurrences in order — one scan-local
    array_distinct expression, zero shuffles.  The oracle replays it
    as min-ordinal-per-unit, the order-explicit spelling."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df
    head = F.substring(F.col("text"), 1, 30)
    dirty = F.concat_ws("\n", F.col("text"), head, head, F.col("text"))
    clean = text.strip_repeated_units(dirty)
    return d.select("doc_id",
                    F.size(F.split(dirty, "\n")).alias("n_units"),
                    F.size(F.split(clean, "\n")).alias("n_kept"),
                    clean.alias("clean"))


def q224_ccnet_buckets(spark, sf_dir) -> DataFrame:
    """The CCNet bucketing step (Wenzek et al. 2020): per-document
    bigram-LM perplexity (q99's self-trained model, add-0.4
    smoothing) cut into head/middle/tail by EXACT terciles —
    `quantile_bucketize`'s one-pass percentile + scan-local strict->
    assignment, never a global ntile sort.  Documents too short for
    a bigram score (NULL ppl) get a NULL bucket on both sides.  The
    oracle replays the q99 model arithmetic unrounded and buckets
    with quantile_cont + the same strict comparisons.  Runs over the
    FULL documents table (r13 verdict watch-item: a fixed doc_id
    slice graded a constant workload at every sf — the tri-scale
    battery and the SCALE row must exercise the percentile pass at
    growing n)."""
    from preql_spark.operators.text import (lm_perplexity,
                                            quantile_bucketize)
    d = _eng(spark, sf_dir).t.documents.df
    ppl = lm_perplexity(d)
    out = quantile_bucketize(ppl, "ppl", 3, out_col="bucket")
    return out.select("doc_id",
                      _pr4(F.col("ppl")).alias("ppl"), "bucket")


def q223_quality_funnel(spark, sf_dir) -> DataFrame:
    """The two-stage quality funnel every public curation pipeline
    runs (rules, THEN model): the Gopher rule battery (q217's
    thresholds) composed with the classifier gate (q221's fake
    scorer at 0.5) in ONE pass — the rule gate is a scan-local
    Project, the classifier one Arrow mapInPandas, and the funnel
    report one groups-bounded agg: per source (n_raw, n_rule_keep,
    n_final, final_rate) where final = rule AND classifier.  The
    oracle replays both stages' arithmetic (q217's word/line rules +
    q221's md5 threshold) and folds the same funnel."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df \
        .select("doc_id", "source", "text")
    gated = text.gopher_quality_gate(
        d, min_words=40, min_stop_words=1) \
        .select("doc_id", "source", "text",
                F.col("keep").alias("rule_keep"))
    scored = text.classifier_gate(gated, threshold=0.5)
    return (scored.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_raw"),
                 F.sum(F.col("rule_keep").cast("long"))
                 .alias("n_rule_keep"),
                 F.sum((F.col("rule_keep") & F.col("keep"))
                       .cast("long")).alias("n_final"))
            .withColumn("final_rate",
                        _pr4(F.col("n_final")
                             / F.col("n_raw").cast("double"))))


def q225_embed_text(spark, sf_dir) -> DataFrame:
    """Text→embedding hook (the SemDeDup/dense-retrieval model
    stage) on its graded FAKE-embedder path: one Arrow
    ``mapInPandas`` pass derives an 8-dim md5-hash vector per
    document — the identical plumbing a real encoder rides
    (``preql_spark.operators.text.embed_text``).  Graded per
    COMPONENT via posexplode: ``comp_u32`` recovers the embedder's
    exact 32-bit integer from the double (component = u32/2^31 - 1
    is float64-exact, so (comp+1)*2^31 is lossless), making the
    oracle comparison integer-exact; the component itself rounds
    4dp.  NULL-text docs embed NULL and explode to no rows, both
    sides."""
    from preql_spark.operators.text import embed_text
    d = _eng(spark, sf_dir).t.documents.df.select("doc_id", "text")
    out = embed_text(d, dim=8)
    ex = out.select("doc_id",
                    F.posexplode("embedding").alias("j", "comp"))
    return ex.select(
        "doc_id", F.col("j").cast("long").alias("j"),
        F.floor((F.col("comp") + 1) * F.lit(2147483648.0))
        .cast("long").alias("comp_u32"),
        _pr4(F.col("comp")).alias("comp"))


def q226_embed_semdedup(spark, sf_dir) -> DataFrame:
    """The end-to-end semantic-dedup pipeline FROM RAW TEXT — the
    composition the fixtures used to short-circuit (pre-embedded
    vectors): documents → ``embed_text`` (16-dim fake embedder, one
    Arrow pass) → ``semdedup`` (k-means k=8 two Lloyd iterations,
    then drop lower-id cluster-mates at cosine >= 0.9).  Synthesized
    EXACT-copy docs (first 30 texts re-ingested under new ids) are
    the near-duplicates: content-addressed hash embeddings make
    copies cosine-1.0 cluster-mates of their originals, while
    distinct texts land near-orthogonal — so the survivors are
    exactly the originals.  The oracle replays the whole chain:
    md5-derived components (bit-exact doubles), both centroid
    updates, final assignment, and the min-id cosine drop."""
    from preql_spark.operators.cluster import semdedup
    from preql_spark.operators.text import embed_text
    d = _eng(spark, sf_dir).t.documents.df.select("doc_id", "text") \
        .filter(F.col("text").isNotNull())
    dup = d.filter(F.col("doc_id") < 30) \
        .select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    emb = embed_text(d.unionByName(dup), dim=16) \
        .select("doc_id", "embedding")
    return semdedup(emb, tau=0.9, k=8, iters=2, id_col="doc_id")


def q221_classifier_gate(spark, sf_dir) -> DataFrame:
    """Model-scored quality gate (the CCNet/DCLM curation stage) on
    its graded FAKE-scorer path: one Arrow ``mapInPandas`` pass
    computes a deterministic md5-derived score per document and the
    threshold keep flag — the identical plumbing a real classifier
    rides (``preql_spark.operators.text.classifier_gate``).  The
    exposed ``score_u32`` is the scorer's exact 32-bit integer
    (recovered losslessly from the double: u32/2^32 is
    float64-exact), so the oracle comparison is integer-exact, no
    rounding anywhere."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df
    out = text.classifier_gate(d.select("doc_id", "source", "text"),
                               threshold=0.5)
    return out.select(
        "doc_id", "source",
        F.floor(F.col("score") * F.lit(4294967296.0)).cast("long")
        .alias("score_u32"),
        "keep")


def q222_classifier_rate_ingest(spark, sf_dir) -> DataFrame:
    """Streaming keep-rate monitor under the CLASSIFIER gate — the
    proof the shared GATES registry routes the streaming surface
    through the model-scored path: two availableNow waves maintain
    per-source (n_docs, n_keep) counters with the fake scorer at
    threshold 0.5, the report sums the state; two-wave == one-shot
    == the batch classifier_gate + GROUP BY source, which is the
    md5 arithmetic the oracle replays.  keep_rate rounds 4dp both
    sides."""
    from preql_spark.streaming.stream import incremental_gate_rate_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q222_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(gate="classifier", threshold=0.5)
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    return out.select("source", "n_docs", "n_keep",
                      _pr4(F.col("keep_rate")).alias("keep_rate"))


def q227_composed_rate_ingest(spark, sf_dir) -> DataFrame:
    """The rule→classifier funnel as a STREAMING gate — q223's
    two-stage composition registered once (``GATES["composed"]``)
    and consumed by the keep-rate monitor with zero ingest edits:
    two availableNow waves maintain per-source counters where keep =
    Gopher rules (q217's thresholds) AND classifier (fake scorer at
    0.5); the report sums the state; two-wave == one-shot == the
    batch funnel's (n_raw, n_final) arithmetic, which the oracle
    replays stage by stage.  The nested stage thresholds ride the
    gate-config fingerprint (plain (name, kwargs) data), so a
    changed funnel raises instead of mixing.  keep_rate rounds 4dp
    both sides."""
    from preql_spark.streaming.stream import incremental_gate_rate_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q227_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(gate="composed",
              stages=[("gopher", {"min_words": 40,
                                  "min_stop_words": 1}),
                      ("classifier", {"threshold": 0.5})])
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    return out.select("source", "n_docs", "n_keep",
                      _pr4(F.col("keep_rate")).alias("keep_rate"))


def q215_gopher_quality_gate(spark, sf_dir) -> DataFrame:
    """The Gopher/MassiveText composite rule-based quality gate
    (Rae et al. 2021 A1.1): raw per-doc metrics + one boolean per
    rule + the composite keep flag, ONE scan-local Project — zero
    shuffles, zero UDFs.  Deterministic dirt makes every rule fire
    somewhere: every 5th doc gains bullet + ellipsis lines, every
    7th a run of '#' symbols, every 11th a numeral flood (alpha-word
    fraction sinks), every 13th the full stop-word list.  The oracle
    replays the identical word/line-array arithmetic in DuckDB
    (list_filter/list_transform), unrounded booleans on both sides,
    4dp on the exposed fractions."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df
    i = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(i % 5 == 0, F.lit(
            "\n- bullet one\n- bullet two\n• bullet three"
            "\nplain tail...")).otherwise(F.lit("")),
        F.when(i % 7 == 0, F.lit(" # # # # # # # # # #"))
        .otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit(
            " 111 222 333 444 555 666 777 888 999 000"
            " 111 222 333 444 555 666 777 888 999 000"))
        .otherwise(F.lit("")),
        F.when(i % 13 == 0, F.lit(
            " the be to of and that have with"))
        .otherwise(F.lit("")))
    out = text.gopher_quality_gate(
        d.select("doc_id", dirty.alias("text")),
        min_words=40, max_symbol_word_ratio=0.1,
        max_bullet_line_frac=0.5, max_ellipsis_line_frac=0.15,
        min_alpha_word_frac=0.8, min_stop_words=1)
    return out.select(
        "doc_id", "n_words",
        _pr4(F.col("mean_word_len")).alias("mean_word_len"),
        _pr4(F.col("symbol_word_ratio")).alias("symbol_word_ratio"),
        _pr4(F.col("bullet_line_frac")).alias("bullet_line_frac"),
        _pr4(F.col("ellipsis_line_frac")).alias("ellipsis_line_frac"),
        _pr4(F.col("alpha_word_frac")).alias("alpha_word_frac"),
        "stop_word_hits", "pass_word_count", "pass_mean_word_len",
        "pass_symbol_ratio", "pass_bullet_lines",
        "pass_ellipsis_lines", "pass_alpha_words", "pass_stop_words",
        "keep")


def q220_clean_then_datacard(spark, sf_dir) -> DataFrame:
    """Composition capstone for the r12 cleaning family: C4-clean
    the corpus (q216's deterministic multi-line dirt), keep the
    survivors' CLEANED text, then publish the corpus data card over
    it — the "curate, then card the curated corpus" sequence a real
    pipeline runs before training.  The oracle replays BOTH stages
    (q216's line arithmetic keep-filtered, then q121's
    GROUPING()-aware cube over the cleaned text), so the cell hashes
    grade the whole composition: cleaning changes every
    token/byte/fingerprint the card reports."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df
    i, t = F.col("doc_id"), F.col("text")
    dirty = F.concat_ws(
        "\n",
        F.concat(F.substring(t, 1, 40), F.lit(".")),
        F.substring(t, 41, 30),
        F.lit("Too short."),
        F.when(i % 3 == 0,
               F.lit("Please enable javascript to continue here."))
        .otherwise(F.concat(F.substring(t, 71, 40), F.lit("!"))),
        F.when(i % 5 == 0,
               F.concat(F.substring(t, 111, 40), F.lit("?")))
        .otherwise(F.substring(t, 111, 40)),
        F.when(i % 7 == 0, F.lit("a curly { brace"))
        .otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("this page is Lorem Ipsum filler"))
        .otherwise(F.lit("")))
    cleaned = (text.c4_clean(
        d.select("doc_id", "source", "lang", dirty.alias("text")),
        min_sentences=2)
        .filter(F.col("keep"))
        .select("source", "lang", F.col("clean").alias("text")))
    out = text.corpus_datacard(cleaned)
    return out.select("source", "lang", "gid", "n_docs",
                      "total_tokens", "total_bytes", "n_distinct",
                      _pr4(F.col("dup_ratio")).alias("dup_ratio"))


def q219_lang_gopher_pipeline(spark, sf_dir) -> DataFrame:
    """The Gopher gate composed ENTIRELY in the query language —
    `gopher_quality_gate` as a first-class lang builtin, filtered on
    its keep flag and folded per source with lang aggregates: proves
    the lang surface and the Python API compile to the same values
    (q123's contract for the r12 gate family).  Oracle = the q217
    keep arithmetic + GROUP BY, plus the kept docs' word total."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'gopher_quality_gate(documents, "doc_id", 40, 1)[keep]'
        ' {source => n_keep: count(),'
        '  total_words: sum(n_words)}')
    return out.df.select("source", "n_keep", "total_words")


def q218_curation_ingest(spark, sf_dir) -> DataFrame:
    """Streaming curated-corpus materialization: two availableNow
    waves append C4-gate survivors' CLEANED text to the curated
    store, deduped through the dedicated IDS SIDECAR (the r13
    re-grade: the IVF sidecar machinery verbatim — epoch markers,
    intent-store crash recovery, compactable to one file — so the
    corpus-sized store is never re-scanned for dedup and
    gate-REJECTED ids are remembered too), over q216's deterministic
    multi-line dirt with min_sentences=2 so survival varies by doc.
    The report counts the store per source; two-wave == one-shot ==
    batch c4_clean + keep-filter + GROUP BY over the full corpus,
    which is the SQL the oracle runs (q216's spelling folded per
    source)."""
    from preql_spark.streaming.stream import incremental_curation_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q218_")
    src, store, ids, ck = (os.path.join(tmp, x)
                           for x in ("src", "store", "ids", "ck"))
    i, t = F.col("doc_id"), F.col("text")
    dirty = F.concat_ws(
        "\n",
        F.concat(F.substring(t, 1, 40), F.lit(".")),
        F.substring(t, 41, 30),
        F.lit("Too short."),
        F.when(i % 3 == 0,
               F.lit("Please enable javascript to continue here."))
        .otherwise(F.concat(F.substring(t, 71, 40), F.lit("!"))),
        F.when(i % 5 == 0,
               F.concat(F.substring(t, 111, 40), F.lit("?")))
        .otherwise(F.substring(t, 111, 40)),
        F.when(i % 7 == 0, F.lit("a curly { brace"))
        .otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("this page is Lorem Ipsum filler"))
        .otherwise(F.lit("")))
    d = eng.t.documents.df.select("doc_id", "source",
                                  dirty.alias("text"))
    # the entry holds the producing frame, so the ingest can skip its
    # first-call source-schema infer (~170 ms of driver work) — the
    # checkpoint marker still pins the schema for later calls
    kw = dict(gate="c4", ids_path=ids, min_sentences=2,
              source_schema=d.schema)
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_curation_ingest(spark, src, ck, store, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_curation_ingest(spark, src, ck, store, **kw)
    return out.select("source", "n_docs", "total_chars")


def q217_gate_rate_ingest(spark, sf_dir) -> DataFrame:
    """Streaming keep-rate monitor for the Gopher gate (q215's
    operator, min_words=40 / min_stop_words=1, other rules at
    defaults): two availableNow waves maintain per-source
    (n_docs, n_keep) counters — the data-card counters contract,
    epoch-guarded — and the report sums the state.  Two-wave ==
    one-shot == the batch gate + GROUP BY source over the full
    corpus, which is the SQL the oracle runs (q215's word/line
    arithmetic with the same thresholds, folded per source).
    keep_rate rounds 4dp both sides."""
    from preql_spark.streaming.stream import incremental_gate_rate_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q217_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    # schema handed to the ingest: skips the first-call infer (the
    # hand twin reads its own frame's schema the same way)
    kw = dict(gate="gopher", min_words=40, min_stop_words=1,
              source_schema=d.schema)
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_gate_rate_ingest(spark, src, ck, st, ids, **kw)
    return out.select("source", "n_docs", "n_keep",
                      _pr4(F.col("keep_rate")).alias("keep_rate"))


def q216_c4_clean(spark, sf_dir) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020 §2.2): terminal-
    punctuation + min-words + javascript line filters, brace /
    lorem-ipsum / min-sentences page gates — ONE scan-local Project,
    audit columns + cleaned text.  Deterministic multi-line pages
    synthesized so every rule fires: line 2 lacks terminal punct,
    line 3 is under 5 words, every 3rd doc gets a javascript line in
    place of its '!' line, every 5th doc's '?' line keeps its
    terminal mark (others lose it), every 7th doc gains a curly
    brace, every 11th a lorem-ipsum line.  Oracle replays the
    identical list arithmetic in DuckDB."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents.df
    i, t = F.col("doc_id"), F.col("text")
    dirty = F.concat_ws(
        "\n",
        F.concat(F.substring(t, 1, 40), F.lit(".")),
        F.substring(t, 41, 30),
        F.lit("Too short."),
        F.when(i % 3 == 0,
               F.lit("Please enable javascript to continue here."))
        .otherwise(F.concat(F.substring(t, 71, 40), F.lit("!"))),
        F.when(i % 5 == 0,
               F.concat(F.substring(t, 111, 40), F.lit("?")))
        .otherwise(F.substring(t, 111, 40)),
        F.when(i % 7 == 0, F.lit("a curly { brace"))
        .otherwise(F.lit("")),
        F.when(i % 11 == 0, F.lit("this page is Lorem Ipsum filler"))
        .otherwise(F.lit("")))
    return text.c4_clean(d.select("doc_id", dirty.alias("text"))) \
        .select("doc_id", "n_lines", "n_kept", "n_sentences",
                "has_brace", "has_lorem", "keep", "clean")


def q212_cluster_size_histogram(spark, sf_dir) -> DataFrame:
    """Dedup observability datacard: near-dup cluster-size
    distribution over the MinHash pair graph at 0.9 — CC over the
    pairs, one component-keyed count, one size-keyed count.  The
    oracle recomputes q73's recursive-CTE clusters over brute exact
    Jaccard and counts the same way."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents
    pairs = dedup.minhash_lsh_pairs(d.df, "doc_id", threshold=0.9)
    return dedup.cluster_size_histogram(pairs) \
        .select("cluster_size", "n_clusters")


def q83_strip_short_lines(spark, sf_dir) -> DataFrame:
    """Rule-based boilerplate removal: drop lines under 4 tokens via
    a JVM-side array filter (documents given synthetic line breaks)."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    lined = F.replace(F.col("text"), F.lit("."), F.lit("\n"))
    return d.df.select(
        "doc_id", text.strip_short_lines(lined, min_tokens=4).alias("clean"))


def q84_sample_weighted(spark, sf_dir) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis-Spirakis over a
    content-hash uniform): longer documents proportionally more
    likely; plan is TakeOrderedAndProject (per-partition heaps)."""
    d = _eng(spark, sf_dir).t.documents
    return (d.sample_weighted("doc_id", F.length("text"), 50)
            .project("doc_id").df)


def q85_lang_fmt(spark, sf_dir) -> DataFrame:
    """fmt() $var interpolation through the lang front-end
    (pql_functions.py:132-169) — compiles to one concat expression."""
    eng = _eng(spark, sf_dir)
    out = eng.q('customer{c_custkey,'
                ' msg: fmt("customer $c_name in segment $c_mktsegment")}')
    return out.df


def q86_ivf_full_probe(spark, sf_dir) -> DataFrame:
    """IVF index search probing ALL cells — must equal brute-force
    exactly (the recall trade-off only appears when nprobe <
    n_centroids), so it shares q40's oracle.  Proves the inverted-list
    partition covers the corpus with no loss."""
    from preql_spark.operators import similarity
    e = _eng(spark, sf_dir).t.embeddings
    q = e.df.filter(F.col("vec_id") < 5)
    out = similarity.ivf_topk(e.df, q, k=5, n_centroids=8, nprobe=8)
    return out.select("query_id", "neighbor_id", "rank",
                      _pr4(F.col("sim")).alias("sim"))


def q87_stream_dedup(spark, sf_dir) -> DataFrame:
    """Watermark-bounded streaming dedup on (user_id, event_type):
    the streamed distinct set must equal the batch DISTINCT.  (On a
    live stream, duplicates farther apart than the watermark delay
    may re-emit — that's the bounded-state contract; an availableNow
    replay drains in one micro-batch, so here dedup is exact.)"""
    import os as _os
    from preql_spark import streaming as st
    _eng(spark, sf_dir)
    p = _os.path.join(sf_dir, "events.parquet")
    stream = st.read_event_stream(spark, p, watermark="1 day") \
        .select("user_id", "event_type", "ts")
    out = st.run_to_memory(
        st.stream_dedup(stream, ["user_id", "event_type"]),
        f"q87_sink_{abs(hash(sf_dir)) % 10**6}", output_mode="append")
    return out.select("user_id", "event_type")


def q88_lang_dml_lifecycle(spark, sf_dir) -> DataFrame:
    """In-language statements end-to-end (§2.12 + §2.10 as SYNTAX, not
    Python API): CTAS from a query, postfix ``update``/``delete``,
    ``new`` row insert, a ``for`` loop over a range with ``fmt``
    interpolation — reference grammar preql.lark:2-17,83-85, statement
    execution evaluate.py:173-437.  Deterministic: the CTAS
    re-materializes from the parquet source every run."""
    from preql_spark.engine import Engine
    eng = Engine(spark)
    eng.load_dir(sf_dir, names=["nation"])
    out = eng.q('''
    table ndml = nation
    ndml[n_regionkey == 0] update {n_name: n_name + "_AF"}
    ndml delete [n_regionkey == 4]
    new ndml(900, "ATLANTIS", 0)
    for (i in [901..904]) {
        new ndml(i, fmt("LOST_$i"), 0)
    }
    ndml{n_nationkey, n_name, n_regionkey}
    ''')
    return out.df


def q89_sql_recursion(spark, sf_dir) -> DataFrame:
    """SQL() escape hatch with $self recursion (pql_functions.py:86-123
    "A special $self variable allows to perform recursion") — compiled
    to a native Spark 4 recursive CTE.  Walks the region→nation FK as
    a recursive hierarchy: level 0 = regions (as -1 parents), level
    n+1 = nations of those regions."""
    eng = _eng(spark, sf_dir)
    return eng.sql("""
        SELECT CAST(r_regionkey AS INT) AS node, CAST(-1 AS INT) AS parent,
               0 AS lvl
        FROM $region
        UNION ALL
        SELECT CAST(n.n_nationkey + 100 AS INT), s.node, s.lvl + 1
        FROM $self s JOIN $nation n ON n.n_regionkey = s.node
        WHERE s.lvl = 0
    """).df


def q90_lazy_param(spark, sf_dir) -> DataFrame:
    """General `$param` lazy parameters (evaluate.py:597: "$param means
    don't evaluate expression, leave it to the function"): the
    call-site expression is captured unevaluated and compiles where the
    function body references it — here the filter predicate and both
    sides of the aggregation arrow name columns that only resolve
    inside the function.  Inlined at compile time: the physical plan is
    a plain filter + partial-agg, no UDF."""
    eng = _eng(spark, sf_dir)
    out = eng.q('''
    func top_spend(t, $cond, $k, $v) = t[$cond] { $k => total: sum($v) }
    top_spend(orders, o_totalprice > 1000, o_orderstatus, o_totalprice)
    ''')
    return out.df.select("o_orderstatus",
                         F.round(F.col("total"), 2).alias("total"))


def q91_join_by_column(spark, sf_dir) -> DataFrame:
    """Join-by-column operands — the reference's `join(a: t1.x,
    b: t2.y)` spelling (pql_functions.py join; used across its tests,
    e.g. tests/test_autocomplete.py test_attr): the column operands
    name the join keys directly, no `on:` needed.  Plan: identical to
    the equi-join the on: spelling produces (BroadcastHashJoin on the
    dimension)."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'join(c: customer.c_nationkey, n: nation.n_nationkey)'
        '{nation: n.n_name, bal: c.c_acctbal}'
        '{nation => n_cust: count(), total_bal: sum(bal)}')
    return out.df.select("nation", "n_cust",
                         F.round(F.col("total_bal"), 2).alias("total_bal"))


def q92_table_methods(spark, sf_dir) -> DataFrame:
    """Table methods declared in lang DDL (reference
    test_basic.py:700-744; MethodInstance pql_objects.py:266-274):
    `func area() = size * size` usable in projections and selections,
    composing (is_big calls area).  Methods inline to plain Column
    expressions — the physical plan is a filter + project, no UDF."""
    from preql_spark.engine import Engine
    eng = Engine(spark)
    eng.load_dir(sf_dir, names=["nation"])
    out = eng.q('''
    table Sq {
        size: float

        func area() = size * size
        func is_big(lim) = area() > lim
    }
    Sq += nation{size: float(n_nationkey)}
    Sq[is_big(100.0)]{size, a: area()}
    ''')
    return out.df


def q93_fk_traversal(spark, sf_dir) -> DataFrame:
    """FK attribute traversal (reference test_basic.py
    test_self_reference: `parent.name` follows the relation): dotted
    access on an FK column compiles to a left join through the FK
    registry, chaining across tables
    (orders → customer → nation).  Plan: two BroadcastHashJoins, the
    filter pushed to the orders scan."""
    eng = _eng(spark, sf_dir)
    out = eng.q('orders[o_totalprice > 400000]'
                '{o_orderkey, cust: o_custkey.c_name,'
                ' nation: o_custkey.c_nationkey.n_name}')
    return out.df


def q94_backref_agg(spark, sf_dir) -> DataFrame:
    """Reverse relations (`-> name` backrefs, reference
    test_basic.py test_self_reference `count(children)`): the catalog
    registers TPC-H backrefs, so `count(customers)` inside a nation
    aggregation counts the joined customer rows, and
    `customers.c_acctbal` collects their values.  Plan: one left join
    + grouped agg, the backref source never scanned twice."""
    eng = _eng(spark, sf_dir)
    out = eng.q('nation{n_name => n_cust: count(customers),'
                ' total_bal: sum(customers.c_acctbal)}')
    return out.df.select("n_name", "n_cust",
                         F.round(F.col("total_bal"), 2).alias("total_bal"))


def q95_repetition_metrics(spark, sf_dir) -> DataFrame:
    """Gopher-style repetition quality gates: duplicate-line fraction,
    duplicate-line character fraction, top-bigram share — per doc,
    computed on narrow hashed rows (the text never shuffles).

    The fractions are emitted as integer-scaled longs
    (``floor(frac * 10000 + 0.5)``, i.e. 4-dp fixed point) so the
    correctness hash has no float-formatting surface at all; the
    oracle mirrors the same fixed-point expression over explicit
    DOUBLE division (DuckDB's bare ``* 1.0`` is DECIMAL arithmetic,
    which can land the other side of the floor boundary)."""
    from preql_spark.operators import text
    d = _eng(spark, sf_dir).t.documents
    m = text.repetition_metrics(d.df)

    def e4(c):
        return F.floor(F.col(c) * 10000 + F.lit(0.5)).cast("long")

    return m.select("doc_id", "n_lines",
                    e4("dup_line_frac").alias("dup_line_frac_e4"),
                    e4("dup_line_char_frac").alias("dup_line_char_frac_e4"),
                    e4("top_bigram_frac").alias("top_bigram_frac_e4"))


def q96_decontaminate(spark, sf_dir) -> DataFrame:
    """Benchmark decontamination: training docs sharing an 8-token
    shingle with the held-out eval slice (doc_id % 5 == 0) are
    flagged; eval shingle hashes broadcast, train side is one scan +
    broadcast semi-join.  portable md5 hashing so the oracle matches
    values, not just counts."""
    from preql_spark.operators import dedup
    d = _eng(spark, sf_dir).t.documents.df
    ev = d.filter(F.col("doc_id") % 5 == 0)
    tr = d.filter(F.col("doc_id") % 5 != 0)
    return dedup.contaminated_ids(tr, ev, "doc_id", "text", k=8,
                                  portable=True)


def q97_quantize_embeddings(spark, sf_dir) -> DataFrame:
    """Symmetric int8 embedding quantization (scale = 127/max|x|,
    round-half-up) + L2 norm — scan-local vector transforms."""
    from preql_spark.operators import similarity
    e = _eng(spark, sf_dir).t.embeddings.df
    q = similarity.quantize_int8(e)
    u = similarity.normalize_vectors(q, "embedding", "unit")
    unit_norm = F.sqrt(F.aggregate("unit", F.lit(0.0),
                                   lambda a, x: a + x * x))
    return (u.withColumn("__un", unit_norm)
            .select("vec_id",
                    _pr4(F.col("scale")).alias("scale"),
                    F.col("q").getItem(0).alias("q0"),
                    F.col("q").getItem(1).alias("q1"),
                    F.col("q").getItem(2).alias("q2"),
                    F.col("q").getItem(3).alias("q3"),
                    _pr4(F.col("__un")).alias("unit_norm")))


def q98_bm25_top_terms(spark, sf_dir) -> DataFrame:
    """Okapi BM25 (Lucene positive-idf) top-3 terms per doc — the
    retrieval-scoring companion to TF-IDF (q64); corpus constants
    broadcast, one explode + two partial-agg shuffles."""
    from preql_spark.operators.text import bm25
    d = _eng(spark, sf_dir).t.documents.df
    scored = bm25(d.filter(F.col("doc_id") < 100), "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("bm25").desc(), F.col("token"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 3)
            .select("doc_id", "token", "rnk",
                    _pr4(F.col("bm25")).alias("bm25")))


def q99_lm_perplexity(spark, sf_dir) -> DataFrame:
    """CCNet-style bigram-LM perplexity quality scores (add-0.4
    smoothing, self-trained corpus model); model tables are two
    partial aggs, V broadcast as a 1-row frame."""
    from preql_spark.operators.text import lm_perplexity
    d = _eng(spark, sf_dir).t.documents.df
    out = lm_perplexity(d.filter(F.col("doc_id") < 200))
    return out.select("doc_id", "n_bigrams",
                      _pr4(F.col("avg_logp")).alias("avg_logp"),
                      _pr4(F.col("ppl")).alias("ppl"))


def q100_kmeans(spark, sf_dir) -> DataFrame:
    """Lloyd k-means over the embedding corpus (k=8, 2 update rounds,
    deterministic lowest-id init).  Assignment is a scan-local argmin
    against driver-held centroid literals — zero corpus-scale shuffle
    per round; the update ships only (cluster, dim, avg) scalar rows.
    The oracle replays the identical iterations as chained DuckDB CTEs."""
    from preql_spark.operators.cluster import kmeans
    e = _eng(spark, sf_dir).t.embeddings
    assigned, _ = kmeans(e.df, k=8, iters=2)
    return assigned.select("vec_id", "cluster")


def q101_semdedup(spark, sf_dir) -> DataFrame:
    """SemDeDup (arXiv:2303.09540): k-means clusters, then drop every
    vector with a lower-id cluster-mate at cosine >= 0.45 — the pair
    join is cluster-local (equi-join on cluster id), never corpus^2."""
    from preql_spark.operators.cluster import semdedup
    e = _eng(spark, sf_dir).t.embeddings
    return semdedup(e.df, tau=0.45, k=8, iters=2)


def q102_chunk_dedup(spark, sf_dir) -> DataFrame:
    """Chunk-level exact dedup with doc reassembly (CCNet paragraph
    dedup over 3-token units): first corpus occurrence of each unit
    survives, docs are rebuilt from their surviving units.  Chunking
    is scan-local (sequence+slice); the keep-pick is one shuffle on
    the unit string."""
    from preql_spark.operators.dedup import chunk_dedup
    d = _eng(spark, sf_dir).t.documents
    return chunk_dedup(d.df, chunk=3)


def q103_domain_cap(spark, sf_dir) -> DataFrame:
    """Domain balancing: keep the top 5 docs per source, ranked by
    length then id — one shuffle on the domain key, per-domain
    row_number (no global sort)."""
    from preql_spark.operators.text import cap_per_domain
    d = _eng(spark, sf_dir).t.documents
    out = cap_per_domain(d.df, "source", 5,
                         [F.col("n_chars").desc(), F.col("doc_id")])
    return out.select("doc_id", "source", "n_chars")


def q104_scd2_history(spark, sf_dir) -> DataFrame:
    """SCD2 versioning of each customer's order-priority change log:
    consecutive equal observations collapse, validity ranges from
    lead(ts).  Both windows share one shuffle on the business key."""
    from preql_spark.operators.history import scd2_history
    o = _eng(spark, sf_dir).t.orders
    log = o.df.filter(F.col("o_custkey") < 200)
    return scd2_history(log, ["o_custkey"], "o_orderdate",
                        ["o_orderpriority"], ["o_orderkey"])


def q105_llr_importance(spark, sf_dir) -> DataFrame:
    """DSIR-style unigram log-likelihood-ratio importance scores
    against a target domain (sources src0-src3): one token explode,
    vocab-sized weight table, totals on a broadcast 1-row frame."""
    from preql_spark.operators.text import llr_importance
    d = _eng(spark, sf_dir).t.documents
    target = F.col("source").isin("src0", "src1", "src2", "src3")
    out = llr_importance(d.df, target)
    return out.select("doc_id", "n_tokens",
                      _pr4(F.col("score")).alias("score"))


def q106_bloom_semi_join(spark, sf_dir) -> DataFrame:
    """Bloom-accelerated exact semi join: lineitem rows of expensive
    orders.  The fact side is pruned scan-locally against a broadcast
    bloom of the order-key set BEFORE the join shuffle; the exact
    left-semi join then removes false positives, so the result equals
    the plain semi join while only bloom survivors cross the wire."""
    from preql_spark.operators.bloom import bloom_semi_join
    eng = _eng(spark, sf_dir)
    expensive = eng.t.orders.df.filter(F.col("o_totalprice") > 400000)
    out = bloom_semi_join(eng.t.lineitem.df, "l_orderkey",
                          expensive, "o_orderkey")
    return out.select("l_orderkey", "l_linenumber", "l_quantity")


def q107_corpus_overlap(spark, sf_dir) -> DataFrame:
    """Dataset diff: fingerprint overlap between two corpus slices —
    8-byte fingerprints through the shuffles, one global agg row."""
    from preql_spark.operators.dedup import corpus_overlap
    d = _eng(spark, sf_dir).t.documents.df
    out = corpus_overlap(d.filter(F.col("doc_id") < 300),
                         d.filter(F.col("doc_id") >= 200))
    return out.select("n_a", "n_b", "n_common",
                      _pr4(F.col("jaccard")).alias("jaccard"))


def q108_snapshot_diff(spark, sf_dir) -> DataFrame:
    """CDC between two snapshots (one full outer join on the key):
    the new snapshot deterministically drops custkey%97==0, bumps
    acctbal for custkey%5==0, and inserts 50 fresh keys."""
    from preql_spark.operators.history import snapshot_diff
    c = _eng(spark, sf_dir).t.customer.df
    old = c.select("c_custkey", "c_acctbal")
    new = (c.filter(F.col("c_custkey") % 97 != 0)
           .select("c_custkey",
                   F.when(F.col("c_custkey") % 5 == 0,
                          F.col("c_acctbal") + 100)
                   .otherwise(F.col("c_acctbal")).alias("c_acctbal"))
           .unionByName(
               c.filter(F.col("c_custkey") < 50)
               .select((F.col("c_custkey") + 1000000).alias("c_custkey"),
                       F.lit(42.0).alias("c_acctbal"))))
    out = snapshot_diff(old, new, ["c_custkey"])
    return out.select("c_custkey", "change_type")


def q109_quantile_bucketize(spark, sf_dir) -> DataFrame:
    """Equal-frequency bucketing without the global sort ntile needs:
    exact percentile thresholds broadcast, assignment scan-local."""
    from preql_spark.operators.text import quantile_bucketize
    o = _eng(spark, sf_dir).t.orders.df
    out = quantile_bucketize(o, "o_totalprice", 8)
    return out.select("o_orderkey", "bucket")


def q110_zorder_key(spark, sf_dir) -> DataFrame:
    """Morton (Z-order) interleave of two keys — the layout key behind
    write_zordered; pure shift/and/or codegen, mirrored bit-for-bit
    in the oracle."""
    from preql_spark.operators.layout import zorder_key
    o = _eng(spark, sf_dir).t.orders.df
    return o.select("o_orderkey",
                    zorder_key(["o_custkey", "o_orderkey"], bits=10)
                    .alias("zkey"))


def q111_skew_report(spark, sf_dir) -> DataFrame:
    """Join-key skew diagnostic: top-20 heaviest event users with
    row share and uniform-load multiple (broadcast totals, top-k)."""
    from preql_spark.operators.layout import skew_report
    e = _eng(spark, sf_dir).t.events.df
    out = skew_report(e, "user_id", top=20)
    return out.select(F.col("key").alias("user_id"), "n_rows",
                      _pr4(F.col("share")).alias("share"),
                      _pr4(F.col("x_uniform")).alias("x_uniform"))


def q112_stream_ingest_dedup(spark, sf_dir) -> DataFrame:
    """Two-wave incremental ingestion with content dedup against the
    growing store (foreachBatch + checkpoint).  The final store is
    provably equal to one-shot exact dedup over the full corpus —
    earlier waves carry strictly smaller ids, so the incremental
    min-id keep rule composes to the global one (that equality IS the
    oracle)."""

    from preql_spark.streaming.stream import incremental_dedup_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q112_")
    src, store, ck = (os.path.join(tmp, d)
                      for d in ("src", "store", "ck"))
    d = eng.t.documents.df.select("doc_id", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_dedup_ingest(spark, src, store, ck)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_dedup_ingest(spark, src, store, ck)
    return out.select("doc_id")


def q113_contrastive_pairs(spark, sf_dir) -> DataFrame:
    """Contrastive pair mining on the LSH SCALE path (graded):
    directed candidates are the signature-hamming <= 7 pairs
    (pigeonhole-banded generation, same exactness contract as q41);
    per anchor, candidates at cosine >= 0.45 are positives and the 3
    highest-cosine candidates below it are hard negatives.  The
    hard-negative top-k is a grouped collect_list/array_sort/slice —
    map-side PARTIAL aggregation before the anchor exchange, not a
    full row_number window re-shuffle (plan-asserted in
    tests/test_plans.py).  Brute mine_contrastive_pairs stays as the
    tiny-corpus cross-check."""
    from preql_spark.operators.similarity import mine_contrastive_pairs_lsh
    e = _eng(spark, sf_dir).t.embeddings
    out = mine_contrastive_pairs_lsh(e.df, pos_tau=0.45, k_neg=3,
                                     dim=64, max_hamming=7)
    return out.select("anchor", "partner", "hamming",
                      _pr4(F.col("sim")).alias("sim"), "label")


def q114_curation_pipeline(spark, sf_dir) -> DataFrame:
    """End-to-end corpus curation as ONE composed lazy plan — quality
    gate (token count) + language filter → exact dedup → benchmark
    decontamination (8-token shingle overlap with the eval slice) →
    per-domain cap.  The whole chain is a single DuckDB oracle, so the
    stages are value-checked IN COMPOSITION, not just individually."""
    from preql_spark.operators import dedup
    from preql_spark.operators.text import cap_per_domain, token_count
    d = _eng(spark, sf_dir).t.documents.df
    gated = d.filter((token_count(F.col("text")) >= 30)
                     & (F.col("lang") == "en"))
    deduped = dedup.dedup_exact(gated, "doc_id")
    ev = d.filter(F.col("doc_id") % 5 == 0)
    train = deduped.filter(F.col("doc_id") % 5 != 0)
    clean = dedup.decontaminate(train, ev, "doc_id")
    capped = cap_per_domain(clean, "source", 10,
                            [F.col("n_chars").desc(), F.col("doc_id")])
    return capped.select("doc_id", "source", "n_chars")


def q115_mixture_sample(spark, sf_dir) -> DataFrame:
    """Data-mixture sampling: per-source deterministic keep fractions
    (content-hash buckets keyed on doc_id) — the mixture-weighting
    step of training-data assembly.  Scan-local, no shuffle."""
    d = _eng(spark, sf_dir).t.documents
    out = d.sample_mixture(
        "source", {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.1},
        key="doc_id")
    return out.df.select("doc_id", "source")


def q116_audio_features(spark, sf_dir) -> DataFrame:
    """Audio feature extraction through the Arrow mapInPandas kernel
    (fake deterministic decode — the value oracle replays the md5
    math; the REAL PCM-WAV path is pytest-verified since the driver
    fixtures carry text, not audio)."""
    from preql_spark.operators import multimodal
    d = _eng(spark, sf_dir).t.documents
    withbin = multimodal.attach_binary_column(d.df.filter(
        F.col("doc_id") < 300))
    out = multimodal.extract_audio_features(withbin)
    return out.select("doc_id", "sample_rate", "n_samples",
                      _pr4(F.col("duration_s")).alias("duration_s"),
                      _pr4(F.col("rms")).alias("rms"))


def q117_validation_report(spark, sf_dir) -> DataFrame:
    """Data-quality expectation gate as one lazy plan: null-rate,
    uniqueness, value-range, and FK-integrity rules each contribute a
    (rule, violations) row — the publish gate of a pipeline run."""
    from preql_spark.operators.expect import validation_report
    eng = _eng(spark, sf_dir)
    return validation_report(
        eng.t.orders.df,
        not_null=["o_orderpriority"],
        unique=["o_orderkey", "o_orderpriority"],
        ranges={"o_totalprice": (0, 400000)},
        fk=[("o_custkey", eng.t.customer.df, "c_custkey")])


def q118_stream_stateful_counter(spark, sf_dir) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running count + last-seen carried in explicit GroupState.
    After an availableNow drain, each key's FINAL state must equal the
    batch aggregate — that equality is the oracle (update-mode sinks
    emit one row per key per batch; max() takes the final)."""
    from preql_spark import streaming as st
    _eng(spark, sf_dir)
    stream = st.read_event_stream(
        spark, os.path.join(sf_dir, "events.parquet"))
    counter = st.stateful_counter(stream)
    out = st.run_to_memory(counter,
                           f"q118_sink_{abs(hash(sf_dir)) % 10**6}",
                           output_mode="update")
    return (out.groupBy("key")
            .agg(F.max("n_events").alias("n_events"),
                 _pr4(F.max("last_epoch")).alias("last_epoch"))
            .withColumnRenamed("key", "user_id"))


def q119_domain_blocklist(spark, sf_dir) -> DataFrame:
    """URL/domain blocklist filtering with suffix-chain matching
    (entry `spam.com` blocks `a.spam.com`): suffixes explode
    scan-locally, matching is one equi-join against the list — never
    a per-row regex scan.  URLs synthesized onto the corpus (like
    q82's PII) so both exact and suffix rules fire."""
    from preql_spark.operators.text import domain_block_filter
    d = _eng(spark, sf_dir).t.documents.df
    withurl = d.withColumn(
        "url", F.concat(F.lit("https://h"), F.col("doc_id") % 7,
                        F.lit(".site"), F.col("doc_id") % 3,
                        F.lit(".example.com/p/"), F.col("doc_id")))
    bl = spark.createDataFrame(
        [("h3.site0.example.com",),      # exact host
         ("site1.example.com",)],        # suffix: blocks every h*.site1.*
        "host: string")
    out = domain_block_filter(withurl, bl)
    return out.select("doc_id", "source")


def q120_join_cardinality(spark, sf_dir) -> DataFrame:
    """Pre-flight join diagnostics: exact inner-join output size and
    hottest-key blow-up from count tables only (payloads never
    shuffle) — know a join's cost before running it."""
    from preql_spark.operators.layout import join_cardinality
    eng = _eng(spark, sf_dir)
    out = join_cardinality(eng.t.lineitem.df, "l_orderkey",
                           eng.t.orders.df, "o_orderkey")
    return out.select("n_left", "n_right", "n_out", "max_key_out",
                      _pr4(F.col("amplification")).alias("amplification"))


def q121_corpus_datacard(spark, sf_dir) -> DataFrame:
    """Corpus data card: docs/tokens/bytes/exact-dup ratio for every
    source×lang combination plus the marginals and the global row —
    one CUBE aggregate over scan-local per-row metrics.  Every 17th
    doc's lang is deterministically NULLed (real crawl metadata has
    undetected langs), so the report contains GENUINE-NULL lang
    cells; the ``gid`` column (grouping_id, = GROUPING(source, lang))
    is what keeps them distinct from the rollup cells — graded here
    with the NULL-group rows present."""
    from preql_spark.operators.text import corpus_datacard
    d = _eng(spark, sf_dir).t.documents.df.withColumn(
        "lang", F.when(F.col("doc_id") % 17 == 0,
                       F.lit(None).cast("string"))
                 .otherwise(F.col("lang")))
    out = corpus_datacard(d)
    return out.select("source", "lang", "gid", "n_docs",
                      "total_tokens", "total_bytes", "n_distinct",
                      _pr4(F.col("dup_ratio")).alias("dup_ratio"))


def q122_debounce(spark, sf_dir) -> DataFrame:
    """Time-windowed event dedup (debounce): per user, bursts of
    events within 120 s collapse to their first event — one shuffle
    on the key, lag+cumsum burst windows."""
    from preql_spark.operators.asof import debounce
    e = _eng(spark, sf_dir).t.events.df
    out = debounce(e, ["user_id"], "ts", window_s=120,
                   tiebreak_cols=["event_id"])
    return out.select("user_id", "event_id")


def q123_lang_pipeline_builtins(spark, sf_dir) -> DataFrame:
    """The curation pipeline composed ENTIRELY in the query language —
    the LLM-pipeline operators as first-class lang builtins
    (`token_count`, `dedup_exact`, `decontaminate` are lang functions,
    not Python calls).  Same stages as q114 minus the domain cap, so
    the oracle is the same replay; proves the lang surface and the
    Python API compile to the same values."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'decontaminate('
        '  dedup_exact(documents[token_count(text) >= 30,'
        '              lang == "en"], "doc_id")[doc_id % 5 != 0],'
        '  documents[doc_id % 5 == 0], "doc_id")')
    return out.df.select("doc_id", "source", "n_chars")


def q124_lsh_selective_neardup(spark, sf_dir) -> DataFrame:
    """Embedding near-dup on the SELECTIVE LSH regime (n_planes=64,
    max_hamming=5 -> 6 bands x 10 bits, ~0.6% random band collision)
    over a corpus with PLANTED near-duplicates: every 40th vector
    gains a deterministically perturbed copy (id + 1_000_000,
    elementwise x + 0.15*|x|*h with h a portable-hash value in
    [-1, 1), cos ~0.99).  This grades the banded join where bands are
    actually selective — the q41 instance (16 planes / 2-bit bands)
    is permissive on the synthetic corpus (similarity.py docstring
    admits it); here candidates are plan-measurably << n^2/2
    (tests/test_plans.py::test_lsh_selective_candidate_count).
    Oracle: brute all-pairs replay of the same signature + hamming +
    cosine contract (pigeonhole recall makes the banded plan exactly
    equivalent)."""
    from preql_spark.operators import similarity
    from preql_spark.operators.text import portable_hash
    e = _eng(spark, sf_dir).t.embeddings.df
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = e.select("vec_id", vd.alias("embedding"))

    def h(i):
        return (portable_hash(F.concat(
            F.lit("perturb:"), F.col("vec_id").cast("string"),
            F.lit(":"), i.cast("string"))) % 2001 - 1000) / 1000.0

    pert = (base.filter(F.col("vec_id") % 40 == 0)
            .select((F.col("vec_id") + 1000000).alias("__nid"),
                    F.transform(F.col("embedding"),
                                lambda x, i: x + 0.15 * F.abs(x) * h(i))
                    .alias("embedding"), F.col("vec_id"))
            .select(F.col("__nid").alias("vec_id"), "embedding"))
    aug = base.unionByName(pert)
    out = similarity.lsh_cosine_pairs_exact(aug, 0.9, dim=64,
                                            max_hamming=5, n_planes=64,
                                            sig_method="hof")
    return out.select("id_a", "id_b", "hamming",
                      _pr4(F.col("sim")).alias("sim"))


def q125_lang_in_table(spark, sf_dir) -> DataFrame:
    """Lang `x in <table>` selection lowered to a LeftSemi join
    engine-side (reference Contains -> IN (SELECT ...),
    sql.py:319-329) — no driver collect, no size bound;
    tests/test_lang.py asserts the LeftSemi plan shape."""
    eng = _eng(spark, sf_dir)
    out = eng.q('customer[c_nationkey in nation[n_regionkey == 0]'
                '{n_nationkey}]{c_custkey, c_nationkey, c_acctbal}')
    return out.df


def q126_stream_neardup_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave incremental ingestion with NEAR-dup rejection against
    the growing MinHash-band state store.  Waves arrive in id order,
    so the surviving store provably equals the one-shot batch rule
    "drop id_b of every verified near-dup pair" — the oracle replays
    that rule brute-force (exact shingle Jaccard >= 0.9, the q38
    contract) over the whole corpus."""

    from preql_spark.streaming.stream import incremental_neardup_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q126_")
    src, store, ck = (os.path.join(tmp, d)
                      for d in ("src", "store", "ck"))
    d = eng.t.documents.df.select("doc_id", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_neardup_ingest(spark, src, store, ck, threshold=0.9)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_neardup_ingest(spark, src, store, ck,
                                     threshold=0.9)
    return out.select("doc_id")


def q127_jsonl_roundtrip(spark, sf_dir) -> DataFrame:
    """write_jsonl → import_jsonl round-trip (reference import_json,
    pql_functions.py:875-898): shipping the corpus through the
    JSON-lines interchange format must be value-lossless, including
    text with embedded newlines/quotes (JSON escapes them).  Schema
    passed explicitly — inference would be a second full read at
    scale."""
    eng = _eng(spark, sf_dir)
    d = eng.t.documents
    tmp = _scratch("q127_") + "/docs"
    d.write_jsonl(tmp)
    back = eng.import_jsonl(tmp, schema=d.df.schema)
    return back.df.select("doc_id", "text", "lang", "source", "n_chars")


def q128_csv_roundtrip(spark, sf_dir) -> DataFrame:
    """write_csv → import_csv round-trip (reference import_csv,
    pql_functions.py:902-956) with header + type inference.  The
    text column stays out: embedded newlines need a multiLine reader
    — the round-trip contract here is the flat-typed columns."""
    eng = _eng(spark, sf_dir)
    d = eng.t.documents.project("doc_id", "lang", "source", "n_chars")
    tmp = _scratch("q128_") + "/docs"
    d.write_csv(tmp)
    back = eng.import_csv(tmp)
    return back.df.select("doc_id", "lang", "source", "n_chars")


def q129_four_way_chain(spark, sf_dir) -> DataFrame:
    """4-table FK chain through the n-ary struct join (region ←
    nation ← customer ← orders), pairwise auto-resolution — the
    chinook-example shape, previously value-tested only locally."""
    from preql_spark import table as tbl
    eng = _eng(spark, sf_dir)
    j = tbl.join(o=eng.t.orders, c=eng.t.customer, n=eng.t.nation,
                 r=eng.t.region, broadcast=("n", "r"))
    return (eng.from_df(j.df)
            .project(region=F.col("r.r_name"), nation=F.col("n.n_name"),
                     price=F.col("o.o_totalprice"))
            .group(["region", "nation"],
                   n_orders=F.count(F.lit(1)),
                   total=_pr4(F.sum("price")))
            .order("region", "nation")
            .df)


def q130_orc_roundtrip(spark, sf_dir) -> DataFrame:
    """write_orc → import_orc round-trip (beyond-reference columnar
    source): full-fidelity including the text column — ORC, like
    parquet, needs no escaping compromises."""
    eng = _eng(spark, sf_dir)
    d = eng.t.documents
    tmp = _scratch("q130_") + "/docs"
    d.write_orc(tmp)
    back = eng.import_orc(tmp)
    return back.df.select("doc_id", "text", "lang", "source", "n_chars")


def q131_sqlite_roundtrip(spark, sf_dir) -> DataFrame:
    """write_sqlite → import_sqlite round-trip — the FULL migration
    loop with the reference's default storage target (its persistent
    databases are SQLite files, sql_interface.py:962).  Text survives
    verbatim (SQLite TEXT is unescaped UTF-8); integer columns come
    back through declared-type affinity as longs."""
    eng = _eng(spark, sf_dir)
    d = eng.t.documents.project("doc_id", "text", "lang", "source",
                                "n_chars")
    tmp = _scratch("q131_") + "/docs.db"
    d.write_sqlite(tmp, "documents")
    got = eng.import_sqlite(tmp, tables=["documents"], prefix="rt_")
    return got["rt_documents"].df.select("doc_id", "text", "lang",
                                         "source", "n_chars")


def q132_cosine_topk_arrow(spark, sf_dir) -> DataFrame:
    """Brute cosine top-5 on the Arrow/BLAS path (batchwise matmul in
    mapInPandas, per-batch local top-k — the q101 lesson applied to
    the ANN baseline).  Same contract and oracle as q40; the HOF
    spelling is the cross-check (tests/test_operators.py::
    test_cosine_topk_arrow_equals_hof)."""
    from preql_spark.operators import similarity
    e = _eng(spark, sf_dir).t.embeddings
    q = e.df.filter(F.col("vec_id") < 5)
    out = similarity.cosine_topk_arrow(e.df, q, k=5)
    return out.select("query_id", "neighbor_id", "rank",
                      _pr4(F.col("sim")).alias("sim"))


def q133_semdedup_paper_rule(spark, sf_dir) -> DataFrame:
    """SemDeDup with the PAPER's keep rule (Abbas et al. 2023 §2):
    near-dup pairs become connected components and each component
    keeps its centroid-FARTHEST member (lowest cosine to the cluster
    centroid, id tiebreak).  Oracle: q101's chained-CTE k-means
    replay + q73's recursive-CTE connected components + a
    per-component argmin over centroid cosine."""
    from preql_spark.operators.cluster import semdedup
    e = _eng(spark, sf_dir).t.embeddings.df
    return semdedup(e, tau=0.45, k=8, iters=2,
                    keep="far_from_centroid")


def q134_temptable_agg(spark, sf_dir) -> DataFrame:
    """temptable (reference pql_functions.py:327-348) mid-pipeline:
    the cached materialization must be value-transparent — filtering
    and aggregating THROUGH the temp table equals doing so directly
    (and the registered name is SQL-visible)."""
    eng = _eng(spark, sf_dir)
    t = eng.t.documents.filter(F.col("n_chars") >= 100) \
        .temptable("q134_docs")
    out = (t.group("source",
                   n=F.count(F.lit(1)),
                   chars=F.sum("n_chars"))
           .order("source"))
    sql_n = spark.sql("SELECT count(*) FROM q134_docs").collect()[0][0]
    assert sql_n == t.count()          # the temp view is live
    return out.df


def q135_salted_join(spark, sf_dir) -> DataFrame:
    """Skew-salted equi-join (operators/skew.py): the fact side's hot
    keys scatter over 16 salt buckets, the dimension replicates 16× —
    result must equal the plain join, which is exactly what the
    oracle computes."""
    from preql_spark.operators.skew import salted_join
    eng = _eng(spark, sf_dir)
    orders = eng.t.orders.df.select("o_orderkey", "o_custkey",
                                    "o_totalprice")
    cust = eng.t.customer.df.select("c_custkey", "c_nationkey")
    out = salted_join(orders,
                      cust.withColumnRenamed("c_custkey", "o_custkey"),
                      on="o_custkey", salt=16)
    return (eng.from_df(out)
            .group("c_nationkey",
                   n=F.count(F.lit(1)),
                   total=_pr4(F.sum("o_totalprice")))
            .df)


def q136_transactions(spark, sf_dir) -> DataFrame:
    """Transaction semantics externally confirmed (§2.10,
    reference api.py:221-229): a rolled-back block leaves no trace, a
    committed block persists — the final state after
    [commit update, rollback delete+insert, commit insert] is fully
    determined, and the oracle replays it in SQL."""
    from preql_spark.sources.mutable import MutableTable, transaction
    root = _scratch("preql_txn_q136_")
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    t = MutableTable.from_expr(spark, "nation_txn", root, nation)
    with transaction(t):
        t.update(F.col("n_regionkey") == 1,
                 n_name=F.concat(F.col("n_name"), F.lit("_TX")))
    try:
        with transaction(t):
            t.delete(F.col("n_regionkey") >= 0)    # would wipe all
            t.insert_rows([{"n_nationkey": 990, "n_name": "GHOST",
                            "n_regionkey": 0}])
            raise RuntimeError("abort")            # roll it back
    except RuntimeError:
        pass
    with transaction(t):
        t.insert_rows([{"n_nationkey": 991, "n_name": "DURABLE",
                        "n_regionkey": 2}])
    return t.df().select("n_nationkey", "n_name", "n_regionkey")


def q137_duplicate_spans(spark, sf_dir) -> DataFrame:
    """Cross-document duplicate-SPAN detection (substring-level dedup,
    Lee et al. 2022): flag every 5-token gram shared by >= 2 distinct
    documents, merge flagged positions into maximal spans, and report
    per-doc duplicated-token coverage.  Complements q95 (intra-doc
    repetition) and q38/q102 (whole-doc / chunk dedup): this is the
    boilerplate-between-distinct-pages signal.  Text never shuffles —
    grams travel as 8-byte xxhash64 fingerprints; the only wide
    exchange is gram-keyed."""
    from preql_spark.operators.dedup import duplicate_spans
    d = _eng(spark, sf_dir).t.documents
    out = duplicate_spans(d.df, k=5, min_docs=2)
    return out.select("doc_id", "n_tokens", "n_dup_grams", "n_spans",
                      "dup_tokens", _pr4(F.col("dup_ratio"))
                      .alias("dup_ratio"))


def q138_pq_adc_topk(spark, sf_dir) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011): sampled 8x16
    codebook, per-subspace argmin encode (8-byte codes for 256-byte
    vectors), then ADC top-10 for 4 queries — per corpus row the
    distance costs 8 LUT lookups instead of a 64-wide dot product.
    The oracle replays codebook, encode, and LUT sums in SQL with
    the sequential-fold distance spelling; ranking ties break on the
    1e-4-rounded distance then vec_id on both engines."""
    from preql_spark.operators import similarity as S
    e = _eng(spark, sf_dir).t.embeddings.df
    cb = S.pq_codebook(e, dim=64, m=8, ksub=16)
    enc = S.pq_encode(e, cb, method="hof")
    q = e.filter(F.col("vec_id") < 4)
    top = S.pq_adc_topk(enc, q, cb, k=10, tie_digits=4)
    return top.select("query_id", "vec_id",
                      _pr4(F.col("dist")).alias("dist"), "rank")


def q139_ivf_pq_topk(spark, sf_dir) -> DataFrame:
    """IVF-PQ compound ANN (IVFADC shape, no residuals): the q100
    coarse k-means replay routes each of 4 queries to its 2 nearest
    of 8 cells; only those cells' PQ codes (q138's sampled 8x16
    codebook) are ADC-scored for the top-5.  The oracle replays the
    full composition — Lloyd rounds, probe ranking, encode, LUT sums
    — in one SQL statement, all with the sequential-fold (a-b)*(a-b)
    distance spelling."""
    from preql_spark.operators import similarity as S
    e = _eng(spark, sf_dir).t.embeddings.df
    q = e.filter(F.col("vec_id") < 4)
    top = S.ivf_pq_topk(e, q, k=5, dim=64, n_centroids=8, iters=2,
                        nprobe=2, m=8, ksub=16, tie_digits=4)
    return top.select("query_id", "vec_id",
                      _pr4(F.col("dist")).alias("dist"), "rank")


def q140_phrase_search(spark, sf_dir) -> DataFrame:
    """Positional inverted index + exact phrase search: postings are
    one (term, doc)-keyed shuffle; the search joins ONLY the phrase's
    posting lists (term-pushable filters) on the doc id and verifies
    adjacency with array predicates — no explode of position lists.
    The oracle computes the same phrase-occurrence counts directly
    from token positions."""
    from preql_spark.operators.text import phrase_search, postings
    d = _eng(spark, sf_dir).t.documents
    return (phrase_search(postings(d.df), "the table")
            .select("doc_id", "n_hits"))


def q141_stream_postings_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming maintenance of the positional inverted
    index: wave 1 indexes doc_id < 250, wave 2 the rest, a third
    replay appends nothing (id-anti-join idempotence).  Documents are
    immutable, so the incremental index must equal the one-shot
    postings over the full corpus — the oracle replays that one-shot
    build (terms, per-doc sorted position lists, tf) in SQL."""
    from preql_spark.streaming.stream import incremental_postings_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q141_")
    src, idx, ck = (os.path.join(tmp, d) for d in ("src", "idx", "ck"))
    d = eng.t.documents.df.select("doc_id", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_postings_ingest(spark, src, idx, ck)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_postings_ingest(spark, src, idx, ck)
    # position lists ride as comma-joined strings: the driver's
    # hash-compare canonicalizer cannot hash list-typed cells
    pos_s = F.array_join(
        F.transform(F.col("positions"), lambda x: x.cast("string")),
        ",")
    return out.select("term", "doc_id", pos_s.alias("positions"), "tf")


def q142_remove_duplicate_spans(spark, sf_dir) -> DataFrame:
    """Substring-level dedup REMOVAL (Lee et al. 2022, acting half of
    q137): tokens covered by cross-document duplicated 5-gram spans
    are dropped everywhere except the gram's minimum-id holder; the
    survivors re-join in order.  The oracle replays gram → min-holder
    → condemned positions → interval merge → token filter in SQL."""
    from preql_spark.operators.dedup import remove_duplicate_spans
    d = _eng(spark, sf_dir).t.documents
    return remove_duplicate_spans(d.df, k=5, min_docs=2) \
        .select("doc_id", "n_tokens", "dropped_tokens", "text_dedup")


def q143_ranked_search(spark, sf_dir) -> DataFrame:
    """Ranked boolean retrieval: BM25 scores summed over the query
    terms {hash, table}, AND semantics, top-20 by the 1e-4-rounded
    score (two-term sums are order-independent in IEEE, so the
    cross-engine hash is stable).  The oracle replays q98's BM25
    formula over the full corpus, filters to the query terms, and
    ranks identically."""
    from preql_spark.operators.text import ranked_search
    d = _eng(spark, sf_dir).t.documents
    out = ranked_search(d.df, "hash table", k=20, tie_digits=4)
    return out.select("doc_id", _pr4(F.col("score")).alias("score"),
                      "rank")


def q144_lang_returned_revenue(spark, sf_dir) -> DataFrame:
    """TPC-H Q10 shape written entirely in the lang: 4-table FK
    auto-join (lineitem->orders->customer->nation resolved pairwise),
    a returnflag filter, grouped revenue, and a top-20 order/slice —
    one lang statement, one broadcast-chained Spark plan.  Revenue
    ranks have real margins, so the unordered-sum ulp caveat of the
    FP-portability notes does not bite."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'join(l: lineitem, o: orders, c: customer, n: nation)'
        '[l.l_returnflag == "R"]'
        '{c.c_custkey, c.c_name, nation: n.n_name =>'
        ' revenue: sum(l.l_extendedprice * (1 - l.l_discount))}'
        ' order {^revenue, c_custkey} [..20]')
    return out.df.select("c_custkey", "c_name", "nation",
                         _pr4(F.col("revenue")).alias("revenue"))


def q145_hybrid_search(spark, sf_dir) -> DataFrame:
    """Hybrid lexical+dense retrieval fused by reciprocal-rank fusion
    (RRF, Cormack et al. 2009, k0=60): the lexical leg is exactly
    q143's ranked BM25 query ("hash table", AND semantics, top-20 on
    the 1e-4-rounded score); the dense leg is the q40-spelling cosine
    top-20 for the stored query vector vec_id=7; every candidate
    scores sum_s 1/(60+rank_s) over the legs that retrieved it and
    the fused top-15 returns (doc_id, rrf_score, rank).  The fusion
    arithmetic is exact IEEE ops on integer ranks, so the oracle
    replays the two legs' CTEs and the fusion bit-for-bit; ties
    (doc pairs whose ranks swap across legs) break on ascending id."""
    from preql_spark.operators.text import hybrid_search
    eng = _eng(spark, sf_dir)
    out = hybrid_search(eng.t.documents.df, eng.t.embeddings.df,
                        "hash table", 7, k=15, n_cand=20,
                        tie_digits=4)
    rs = F.floor(F.col("rrf_score") * 1000000 + F.lit(0.5)) / 1000000
    return out.select("doc_id", rs.alias("rrf_score"), "rank")


def q146_random_projection(spark, sf_dir) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 8 dims over the
    portable-hash plane matrix (the q41-proven component spelling),
    scaled by 1/sqrt(8).  Graded on the hof path whose sequential
    fold is bit-identical to the oracle's list_dot_product; the BLAS
    path is the pytest-equal production spelling.  Values rounded to
    4 dp with the portable floor rule inside the array."""
    from preql_spark.operators.similarity import random_project
    e = _eng(spark, sf_dir).t.embeddings
    out = random_project(e.df, out_dim=8, dim=64, method="hof")
    # quantize each element to an integer 1e-4 grid and join as a
    # string: list cells are unhashable in the driver's canonicalizer
    arr = F.transform(
        F.col("projected"),
        lambda x: F.floor(x * 10000 + F.lit(0.5))
        .cast("long").cast("string"))
    return out.select("vec_id", F.array_join(arr, ",").alias("projected"))


def q147_frequent_tokens(spark, sf_dir) -> DataFrame:
    """EXACT phi-frequent tokens (count >= ceil(0.005 * n)) via the
    mergeable Misra-Gries candidate sketch + exact verify recount.
    The sketch only bounds the candidate set (per-partition summaries
    of <= capacity rows instead of a full-vocabulary shuffle); the
    counts that reach the answer come from an exact recount
    semi-joined to the broadcast candidates, so the oracle is a plain
    GROUP BY ... HAVING over the same whitespace tokens."""
    from preql_spark.operators.sketch import frequent_items
    from preql_spark.operators.text import tokens
    d = _eng(spark, sf_dir).t.documents
    items = (d.df.select(F.explode(tokens(F.col("text"))).alias("item"))
             .filter(F.col("item") != ""))
    out = frequent_items(items, "item", phi=0.005)
    return out.select(F.col("item").alias("token"), "cnt")


def q148_scrub_contaminated_spans(spark, sf_dir) -> DataFrame:
    """Span-level decontamination: docs with doc_id % 10 == 0 act as
    the eval set; in the remaining training docs every token covered
    by a 5-gram that also occurs in the eval set is dropped and the
    survivors re-join in order (q96's broadcast-semi decontamination
    contract at q142's span granularity).  The oracle replays eval
    grams -> condemned positions -> interval merge -> token filter in
    SQL on the gram STRINGS (the Spark side shuffles 8-byte xxhash64
    fingerprints — collision-free at these cardinalities, same
    equivalence q137/q142 rest on)."""
    from preql_spark.operators.dedup import scrub_contaminated_spans
    d = _eng(spark, sf_dir).t.documents.df
    train = d.filter(F.col("doc_id") % 10 != 0)
    ev = d.filter(F.col("doc_id") % 10 == 0)
    return scrub_contaminated_spans(train, ev, k=5) \
        .select("doc_id", "n_tokens", "dropped_tokens", "text_clean")


def q149_topk_per_group(spark, sf_dir) -> DataFrame:
    """Grouped top-k WITHOUT a per-group sort window: top-5 orders by
    totalprice per order priority via the partial-agg spelling
    (slice(array_sort(collect_list))) whose map-side combine ships one
    list row per (partition, group) instead of window-sorting every
    row.  Ties break on ascending o_orderkey; the oracle is the plain
    row_number window — same rows, cheaper plan."""
    from preql_spark.operators.topk import topk_per_group
    o = _eng(spark, sf_dir).t.orders.df \
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    out = topk_per_group(o, ["o_orderpriority"], "o_totalprice", 5,
                         tie_col="o_orderkey")
    return out.select("o_orderpriority", "o_orderkey",
                      _pr4(F.col("o_totalprice")).alias("total"),
                      "rank")


def q150_dsir_resample(spark, sf_dir) -> DataFrame:
    """DSIR end-to-end (Xie et al. 2023 shape): unigram LLR importance
    scores against the src0-src3 target domain (q105's operator), then
    deterministic importance-weighted sampling without replacement —
    Efraimidis-Spirakis on weight exp(score) with the portable-hash
    uniform (q84's operator) — keeping the top-100.  One composed lazy
    plan: token explode + vocab-sized weight join + per-doc agg +
    TakeOrdered; the oracle chains the two green CTE replays."""
    from preql_spark.operators.text import llr_importance
    eng = _eng(spark, sf_dir)
    d = eng.t.documents
    target = F.col("source").isin("src0", "src1", "src2", "src3")
    scored = llr_importance(d.df, target)
    out = d._with(scored).sample_weighted(
        "doc_id", F.exp(F.col("score")), 100)
    return out.df.select("doc_id", "n_tokens",
                         _pr4(F.col("score")).alias("score"))


def q151_stream_frequent_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming maintenance of the exact phi-frequent-token
    report: wave 1 ingests doc_id < 250, wave 2 the rest, folding each
    wave's Misra-Gries partition summaries into a kilobyte state file
    whose candidates the final report recounts EXACTLY over the
    accumulated store.  The mergeable-summaries bound survives the
    wave merges, so the incremental report equals q147's one-shot
    operator equals a plain GROUP BY ... HAVING over the full corpus
    — which is the oracle."""
    from preql_spark.streaming.stream import (
        incremental_frequent_items_ingest)
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q151_")
    src, store, ck = (os.path.join(tmp, d) for d in ("src", "store", "ck"))
    d = eng.t.documents.df.select("doc_id", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_frequent_items_ingest(spark, src, store, ck, phi=0.005)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_frequent_items_ingest(spark, src, store, ck,
                                            phi=0.005)
    return out.select(F.col("item").alias("token"), "cnt")


def q152_weighted_hybrid_search(spark, sf_dir) -> DataFrame:
    """q145's hybrid retrieval with WEIGHTED reciprocal-rank fusion:
    the lexical BM25 leg counts double (w=2.0) against the dense
    cosine leg (w=1.0) — the standard tilt when one retriever is
    known-stronger.  Each candidate scores
    sum_s w_s/(60 + rank_s); the arithmetic is exact IEEE ops on
    integer ranks scaled by exactly-representable weights, so the
    oracle replays the two legs' CTEs and the weighted fusion
    bit-for-bit; ties break on ascending id."""
    from preql_spark.operators.text import hybrid_search
    eng = _eng(spark, sf_dir)
    out = hybrid_search(eng.t.documents.df, eng.t.embeddings.df,
                        "hash table", 7, k=15, n_cand=20,
                        tie_digits=4, weights=[2.0, 1.0])
    rs = F.floor(F.col("rrf_score") * 1000000 + F.lit(0.5)) / 1000000
    return out.select("doc_id", rs.alias("rrf_score"), "rank")


def q153_quantile_rollup(spark, sf_dir) -> DataFrame:
    """Multi-level exact quantile report in ONE shuffle pass: median
    and p90 of o_totalprice per (status, priority), per status, and
    grand total via ROLLUP — NULLs mark the aggregated-out levels.
    Spark's exact ``percentile`` interpolation mirrors DuckDB's
    ``quantile_cont`` (the q08 precedent); the approx=True twin
    (mergeable percentile_approx state) is the 100 TB path,
    pytest-bounded against this exact result."""
    from preql_spark.operators.sketch import quantile_rollup
    o = _eng(spark, sf_dir).t.orders.df
    out = quantile_rollup(o, ["o_orderstatus", "o_orderpriority"],
                          "o_totalprice", [0.5, 0.9])
    return out.select("o_orderstatus", "o_orderpriority", "n",
                      F.round(F.col("p50"), 4).alias("p50"),
                      F.round(F.col("p90"), 4).alias("p90"))


def q154_mmr_diversify(spark, sf_dir) -> DataFrame:
    """MMR diversification (Carbonell & Goldstein 1998) of the q40
    retrieval: the cosine top-20 for stored query vec_id=7 is greedily
    re-ranked by lam*rel - (1-lam)*max-sim-to-picked (lam=0.7, k=5).
    Relevance and the pairwise candidate cosines are rounded to 4 dp
    BEFORE the greedy loop, so the chain is exact IEEE on rounded
    doubles and the oracle replays it as 5 chained argmax CTEs; ties
    break on ascending id."""
    from preql_spark.operators.similarity import (cosine_topk,
                                                  mmr_diversify)
    e = _eng(spark, sf_dir).t.embeddings.df
    qv = e.filter(F.col("vec_id") == 7)
    top = cosine_topk(e, qv, k=20)
    cand = (top.select(F.col("neighbor_id").alias("vec_id"),
                       F.col("sim").alias("rel"))
            .join(e.select("vec_id", "embedding"), "vec_id"))
    out = mmr_diversify(cand, k=5, lam=0.7)
    ms = F.floor(F.col("mmr_score") * 1000000 + F.lit(0.5)) / 1000000
    return out.select("vec_id", "rel", ms.alias("mmr_score"), "pick")


def q155_temperature_mixture(spark, sf_dir) -> DataFrame:
    """Temperature-based source rebalancing (alpha=0.5, the XLM-R
    sampling rule): groups are the source-name digit prefix (skewed —
    one group holds 11 of the 20 sources), keep share proportional to
    sqrt(count_g) scaled to 200 expected rows, applied via q115's
    deterministic content-hash rule.  The ratio chain is a left fold
    of correctly rounded IEEE ops over groups in ascending order, so
    the oracle replays it with list_reduce + the same parenthesized
    arithmetic."""
    eng = _eng(spark, sf_dir)
    d = eng.t.documents.df.withColumn("grp", F.substring("source", 4, 1))
    out = eng.from_df(d).temperature_mixture("grp", "doc_id", 200,
                                             alpha=0.5)
    return out.df.select("doc_id", "grp")


def q156_budget_select(spark, sf_dir) -> DataFrame:
    """Token-budget selection: best documents first (quality =
    char length as a stand-in score, ties on ascending id) until the
    15000-token budget is exhausted — the greedy fill step of a
    fixed-size training mix.  The engine splits quality space into
    buckets so only the boundary bucket pays an ordered window; the
    oracle is the naive global running-sum rule, which the bucket plan
    must equal exactly (integer token sums, no FP hazard)."""
    from preql_spark.operators.text import budget_select, token_count
    d = _eng(spark, sf_dir).t.documents.df.select(
        "doc_id",
        F.length("text").cast("long").alias("quality"),
        token_count(F.col("text")).cast("int").alias("n_tokens"))
    out = budget_select(d, 15000, "quality", "n_tokens",
                        id_col="doc_id", n_buckets=8)
    return out.select("doc_id", "quality", "n_tokens")


def q157_interleave_sources(spark, sf_dir) -> DataFrame:
    """Deterministic proportional interleave: every source progresses
    uniformly through the epoch — row r of a c-row source sits at
    position r/c, within-source order = the portable content-hash
    permutation of doc_id.  One group-partitioned window pass + a
    range sort; the position is one IEEE division of exact integers,
    so the oracle replays the layout bit-for-bit."""
    eng = _eng(spark, sf_dir)
    out = eng.t.documents.interleave_sources("source", "doc_id")
    return out.df.select("doc_id", "source", "pos")


def q158_stream_quantile_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming maintenance of exact per-source token-length
    quantiles: each wave folds its (source, n_tokens) histogram into a
    summed state table (bounded by groups x distinct lengths, never
    corpus size); the report computes p50/p90 from the state via
    frequency-weighted exact percentile — identical to percentile over
    the raw rows, so the oracle is plain per-source quantile_cont over
    the full corpus."""
    from preql_spark.streaming.stream import incremental_quantile_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q158_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "state", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_quantile_ingest(
        spark, src, ck, st, ids,
        value_expr=r"size(split(trim(text), '\\s+'))")
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_quantile_ingest(
        spark, src, ck, st, ids,
        value_expr=r"size(split(trim(text), '\\s+'))")
    return out.select("source", "n",
                      F.round(F.col("p50"), 4).alias("p50"),
                      F.round(F.col("p90"), 4).alias("p90"))


def q159_retrieve_refine_diversify(spark, sf_dir) -> DataFrame:
    """The production ANN serving pipeline as ONE composition:
    IVF-PQ retrieval (q139's operator, query vec_id=0, top-10 by ADC)
    -> exact-cosine REFINE of just those candidates (rel, rounded
    4 dp) -> MMR diversification (q154's operator, lam=0.7, top-4).
    The corpus-scale cost stays in the retrieval leg; refine and MMR
    touch only the 10 candidates.  The oracle chains q139's full
    replay (Lloyd rounds, probe ranking, PQ encode, ADC) into q154's
    refine + greedy argmax CTEs."""
    from preql_spark.operators import similarity as S
    e = _eng(spark, sf_dir).t.embeddings.df
    q0 = e.filter(F.col("vec_id") < 1)
    top = S.ivf_pq_topk(e, q0, k=10, dim=64, n_centroids=8, iters=2,
                        nprobe=2, m=8, ksub=16, tie_digits=4)
    cand = (top.select("vec_id")
            .join(e.select("vec_id", "embedding"), "vec_id")
            .crossJoin(F.broadcast(
                q0.select(F.col("embedding").alias("__qv"))))
            .select("vec_id", "embedding",
                    S.cosine(F.col("embedding"),
                             F.col("__qv")).alias("rel")))
    out = S.mmr_diversify(cand, k=4, lam=0.7)
    ms = F.floor(F.col("mmr_score") * 1000000 + F.lit(0.5)) / 1000000
    return out.select("vec_id", "rel", ms.alias("mmr_score"), "pick")


def q160_bpe_pair_counts(spark, sf_dir) -> DataFrame:
    """Adjacent-token-pair frequencies, top-20 — the counting step of
    a BPE merge round ('which pair merges next?').  Scan-local
    zip/slice pairing + ONE pair-keyed partial-agg shuffle +
    TakeOrdered (word-count shape); ties break on (left, right).  The
    merge APPLICATION (`text.bpe_merge_pair`, a greedy scan-local
    array fold) is pytest-pinned against a Python model."""
    from preql_spark.operators.text import adjacent_pair_counts
    d = _eng(spark, sf_dir).t.documents.df
    return adjacent_pair_counts(d, k=20) \
        .select("left", "right", "cnt", "rank")


def q161_ngram_diversity(spark, sf_dir) -> DataFrame:
    """Per-source bigram diversity (distinct/total) — the standard
    repetitiveness report for a training mix; one explode + one
    group-keyed partial-agg shuffle.  Counts are exact integers; the
    ratio is one IEEE division rounded 4 dp on both engines."""
    from preql_spark.operators.text import ngram_diversity
    d = _eng(spark, sf_dir).t.documents.df
    out = ngram_diversity(d, 2, "source")
    return out.select("source", "total", "n_distinct",
                      _pr4(F.col("diversity")).alias("diversity"))


def q162_funnel(spark, sf_dir) -> DataFrame:
    """Windowed ordered funnel view -> click -> purchase, whole
    funnel within 8 h of the user's FIRST view (the anchored
    contract): per-prefix user counts.  ONE user-keyed shuffle + a
    JVM fold replaces the textbook n-way self-join; the fold's greedy
    earliest-completion is provably the CTE chain the oracle runs
    (each step takes its minimal admissible timestamp)."""
    from preql_spark.operators.events import funnel
    e = _eng(spark, sf_dir).t.events
    return funnel(e.df, ["view", "click", "purchase"],
                  within_seconds=8 * 3600) \
        .select("step_idx", "step", "n_users")


def q163_cohort_retention(spark, sf_dir) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first
    activity; distinct actives per (cohort start, 7-day offset).
    User-level partial agg + one user-keyed join-back + a tiny
    (cohort, offset) count-distinct — all-integer arithmetic."""
    from preql_spark.operators.events import cohort_retention
    e = _eng(spark, sf_dir).t.events
    return cohort_retention(e.df, period_days=7) \
        .select("cohort_start", "period_offset", "n_users")


def q164_transition_counts(spark, sf_dir) -> DataFrame:
    """First-order event-type transition matrix from one lead window
    per user (ordered ts, event_id) + one pair-keyed agg — exact
    integer counts, no self-join."""
    from preql_spark.operators.events import transition_counts
    e = _eng(spark, sf_dir).t.events
    return transition_counts(e.df).select("src", "dst", "cnt")


def q165_winsorize(spark, sf_dir) -> DataFrame:
    """Per-event-type winsorization of `value` into the exact
    [p05, p95] interval.  Spark `percentile` == DuckDB
    `quantile_cont` (the q158-proven identity), so the clipped
    doubles agree bit-for-bit; rounded 4 dp for the hash.  The
    bounds frame broadcasts — rows never shuffle."""
    from preql_spark.operators.events import winsorize
    e = _eng(spark, sf_dir).t.events
    out = winsorize(e.df, ["event_type"], "value")
    return out.select("event_id", "event_type",
                      _pr4(F.col("value_w")).alias("value_w"))


def q166_ewma(spark, sf_dir) -> DataFrame:
    """Per-(user, event_type) exponential smoothing (alpha = 0.25 —
    exactly representable, so 1-alpha is too) of the time-ordered
    value sequence; the explicit-order sequential fold is
    bit-identical to DuckDB's list_reduce replay (q155 contract).
    One group-keyed shuffle with map-side partial collect."""
    from preql_spark.operators.events import ewma
    e = _eng(spark, sf_dir).t.events
    out = ewma(e.df, ["user_id", "event_type"], "ts", "value", 0.25,
               tie_col="event_id")
    r6 = F.floor(F.col("ewma") * 1000000 + F.lit(0.5)) / 1000000
    return out.select("user_id", "event_type", "n", r6.alias("ewma"))


def q167_fuzzy_pairs(spark, sf_dir) -> DataFrame:
    """All customer-name pairs within Levenshtein distance 2 (subset
    c_custkey % 7 = 0) via ED-Join q-gram prefix filtering: rarest
    (q*d+1)-gram signatures bound the candidate join (the shared
    'Customer#0000' prefix grams are frequent and drop OUT of
    signatures — that is what defeats the n² a naive gram join
    suffers here), then thresholded built-in levenshtein verifies.
    The oracle is the brute-force definition itself."""
    from preql_spark.operators.fuzzy import fuzzy_pairs
    c = _eng(spark, sf_dir).t.customer
    sub = c.df.filter(F.col("c_custkey") % 7 == 0)
    return fuzzy_pairs(sub, "c_custkey", "c_name", 2, q=2) \
        .select("id1", "id2", "dist")


def q168_distinct_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming maintenance of the exact per-source
    distinct token-count inventory: wave 1 ingests doc_id < 250,
    wave 2 the rest; new (group, value) pairs append via a
    distributed anti-join (state never crosses the driver), ids fold
    before they append (the q151 ordering), and the report over the
    state equals one-shot COUNT(DISTINCT) — the oracle."""
    from preql_spark.streaming.stream import incremental_distinct_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q168_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    expr = r"cast(size(split(trim(text), '\\s+')) as string)"
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_distinct_ingest(spark, src, ck, st, ids,
                                value_expr=expr)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_distinct_ingest(spark, src, ck, st, ids,
                                      value_expr=expr)
    return out.select("source", "n_distinct")


def q169_conversion_lag(spark, sf_dir) -> DataFrame:
    """Per-user conversion lags from the funnel fold's completion
    times (q162's per-user rows before counting): seconds from first
    view to the chain's click / purchase, NULL once the chain breaks.
    Lags are exact integer micros divided once — identical IEEE on
    both engines.  Same single user-keyed shuffle as q162."""
    from preql_spark.operators.events import funnel_times
    e = _eng(spark, sf_dir).t.events
    out = funnel_times(e.df, ["view", "click", "purchase"])
    lag = lambda a, b: F.floor(
        (F.unix_micros(b) - F.unix_micros(a)) / 1000000.0
        * 1000000 + F.lit(0.5)) / 1000000
    return out.select("user_id", lag(F.col("t1"), F.col("t2"))
                      .alias("lag12_s"),
                      lag(F.col("t1"), F.col("t3")).alias("lag13_s"))


def q170_rfm_scores(spark, sf_dir) -> DataFrame:
    """RFM segmentation over the event stream: recency days vs the
    corpus max date, event counts, monetary summed in EXACT integer
    cents (half-up per row before the sum — order-independent), each
    ntile(5)-scored with ascending-user tie-break.  One user-keyed
    partial agg; the tile stage auto-picks its plan from the user
    count — here (users << windowed_max_users) the three score
    windows share one sort of the tiny user-level table, never the
    events; above the threshold it switches to the range-repartition
    + partition-offset rank plan that q193 forces and grades."""
    from preql_spark.operators.events import rfm_scores
    e = _eng(spark, sf_dir).t.events
    return rfm_scores(e.df, n_tiles=5) \
        .select("user_id", "r_days", "freq", "monetary_cents",
                "r_score", "f_score", "m_score")


def q171_pagerank(spark, sf_dir) -> DataFrame:
    """Exact-integer PageRank (damping 17/20, rank units 10^6) over
    the bidirectional supplier<->part graph from lineitem, 3
    iterations.  Integer contributions (rank DIV outdeg) and the
    rational damping step make every rank bit-identical across
    engines and partitionings; the oracle unrolls the same three
    rounds as CTEs.  Per iteration: one rank-to-edge hash join
    (edge+degree side pre-partitioned by src once) + one dst-keyed
    partial agg — the Pregel shape that scales to billions of
    edges."""
    from preql_spark.operators.graph import pagerank
    li = _eng(spark, sf_dir).t.lineitem.df
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
        .alias("dst")).distinct()
    ed = e.unionAll(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    return pagerank(ed, iters=3) \
        .select("node", "rank_units", F.col("rank").alias("pr"))


def q172_value_trend(spark, sf_dir) -> DataFrame:
    """Per-event-type OLS trend of value against time: all five
    moments are exact int64 sums (day index x integer cents), so the
    slope/intercept are a fixed sequence of correctly-rounded double
    ops — bit-identical cross-engine.  One group-keyed partial agg;
    rows fold map-side to five numbers per group."""
    from preql_spark.operators.events import trend
    e = _eng(spark, sf_dir).t.events
    return trend(e.df, "event_type", origin="2024-01-01")


def q173_mad_outliers(spark, sf_dir) -> DataFrame:
    """Robust MAD outlier gate per event type: exact integer cents,
    exact median/MAD (Spark percentile == DuckDB quantile_cont), flag
    |cents - med| > 3 * MAD, then count — two bounds-broadcast rounds
    (the winsorize contract), the event rows never shuffle."""
    from preql_spark.operators.events import mad_outliers
    e = _eng(spark, sf_dir).t.events
    return (mad_outliers(e.df, "event_type", k=3.0)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("is_outlier").cast("long"))
                 .alias("n_outliers"),
                 F.first("med_cents").alias("med_cents"),
                 F.first("mad_cents").alias("mad_cents")))


def q174_hll_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming HLL distinct-count maintenance: per-group
    DataSketches sketches union across waves (register-wise max —
    exactly mergeable), state is APPEND-ONLY per-(group, wave)
    sketch rows guarded by (run_id, batch_id) — the crash-safe
    contract of the histogram/t-digest siblings, closing the old
    overwrite-merge's state-loss window — and the report unions the
    wave rows per group distributed.  Two-wave == one-shot sketching
    is pytest-pinned; no DuckDB oracle exists for DataSketches HLL,
    so this entry is rows-only by design (the bounded-state sibling
    of the exact q168 inventory)."""
    from preql_spark.streaming.stream import incremental_hll_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q174_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_hll_ingest(spark, src, ck, st, ids)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_hll_ingest(spark, src, ck, st, ids)
    return out.select("source", "n_distinct_approx")


def q175_token_entropy(spark, sf_dir) -> DataFrame:
    """Per-source Shannon entropy of the token distribution: int64
    counts, the c*ln(c) sum folded in lexicographic token order
    (the q155 fixed-order contract, == DuckDB list_reduce with
    ORDER BY token), so every double is bit-identical cross-engine.
    One explode + one (group, token) partial agg; the fold runs over
    each group's bounded vocabulary."""
    from preql_spark.operators.text import token_entropy
    d = _eng(spark, sf_dir).t.documents
    return token_entropy(d.df, "source")


def q176_session_paths(spark, sf_dir) -> DataFrame:
    """Top-20 session paths: 30-min-gap sessionization (exact
    integer-micro gap compare), ordered '>'-joined event-type
    strings, frequency-ranked with path tie-break.  One user-keyed
    sort window whose hash layout the per-session aggregation
    reuses; the top-k is a TakeOrdered over the tiny path-count
    table."""
    from preql_spark.operators.events import session_paths
    e = _eng(spark, sf_dir).t.events
    return session_paths(e.df, k=20)


def q177_tdigest_ingest(spark, sf_dir) -> DataFrame:
    """Two-wave streaming t-digest maintenance of per-source
    quantiles over a CONTINUOUS metric (ln(1 + n_chars)): bounded
    ~delta-centroid state per group, deterministic wave-by-wave
    merge, report interpolates from the state.  Rows-only by design
    (a t-digest estimate has no DuckDB twin); sub-percent rank
    accuracy and replay idempotence are pytest-pinned."""
    from preql_spark.streaming.stream import incremental_tdigest_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q177_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "n_chars")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_tdigest_ingest(spark, src, ck, st, ids,
                               value_expr="ln(1 + n_chars)")
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_tdigest_ingest(spark, src, ck, st, ids,
                                     value_expr="ln(1 + n_chars)")
    return out.select("source", "n", "p50", "p90")


def q178_entity_resolution(spark, sf_dir) -> DataFrame:
    """Entity-resolution capstone: ED-Join fuzzy pairs (edit
    distance <= 1 on customer names, q167's blocking) -> connected
    components (q73's min-label propagation) -> every record mapped
    to its cluster's min-id entity.  The oracle replays the brute
    levenshtein pair definition through q73's recursive-CTE closure.
    No cartesian product anywhere; CC rounds are bounded by cluster
    diameter (early-exit on convergence)."""
    from preql_spark.operators import dedup, fuzzy
    c = _eng(spark, sf_dir).t.customer.df.filter("c_custkey % 7 = 0")
    pairs = fuzzy.fuzzy_pairs(c, "c_custkey", "c_name", 1)
    comp = dedup.connected_components(pairs, "id1", "id2",
                                      max_iter=100)
    return (c.join(comp, c["c_custkey"] == comp["node"], "left")
            .select("c_custkey",
                    F.coalesce("component", "c_custkey")
                    .alias("entity_id")))


def q179_ks_drift(spark, sf_dir) -> DataFrame:
    """Two-sample KS drift between 'view' and 'purchase' event
    values in exact integer cents: integer cumulative counts through
    one division each, argmax with min-value tie-break — exact
    cross-engine.  The cumulative window runs over the bounded
    distinct-cents domain; the answer is a TakeOrdered."""
    from preql_spark.operators.events import ks_statistic
    e = _eng(spark, sf_dir).t.events.df
    cents = e.withColumn(
        "cents", F.floor(F.col("value").cast("double") * 100
                         + F.lit(0.5)).cast("long"))
    return ks_statistic(cents, "cents", "event_type",
                        "view", "purchase")


def q199_ks_quantized(spark, sf_dir) -> DataFrame:
    """q179's KS drift on the RAW double event values with the
    ``quantize_to`` degradation knob: values tick-round via
    ``floor(v / 7.5) * 7.5`` (two correctly-rounded double ops,
    spelled identically in the oracle) BEFORE the distinct-domain
    collapse — the opt-in alternative to the ``max_domain`` failure
    for continuous metrics.  ``max_domain=200`` would REJECT the raw
    domain (thousands of distinct doubles) but accepts the ~130
    ticks, so this grades the knob doing its actual job, not just
    the arithmetic."""
    from preql_spark.operators.events import ks_statistic
    e = _eng(spark, sf_dir).t.events.df
    return ks_statistic(e, "value", "event_type", "view", "purchase",
                        max_domain=200, quantize_to=7.5)


def q180_ab_test(spark, sf_dir) -> DataFrame:
    """Two-proportion A/B z-test (view vs click, conversion = value
    > 50): four int64 counts from ONE map-side conditional agg, then
    a fixed sequence of double ops (divisions + one sqrt) — the
    statistic is bit-identical cross-engine."""
    from preql_spark.operators.events import ab_test
    e = _eng(spark, sf_dir).t.events.df
    return ab_test(e, "event_type", "view", "click", "value > 50")


def q181_triangles(spark, sf_dir) -> DataFrame:
    """Exact triangle count over a deterministic pseudo-random graph
    derived from customer keys (k%400 -> (k*17+3)%400): canonical
    (lo, hi) edges, ordered wedge join closed on (a, c) — two
    equi-joins + one count, pure int64."""
    from preql_spark.operators.graph import triangle_count
    c = _eng(spark, sf_dir).t.customer.df
    edges = c.select((F.col("c_custkey") % 400).alias("src"),
                     ((F.col("c_custkey") * 17 + 3) % 400)
                     .alias("dst"))
    return triangle_count(edges)


def q182_attribution(spark, sf_dir) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's
    most recent view/click at-or-before it (touches deduped to one
    per (user, ts) by max event_id, so the as-of match is
    deterministic), then counts by touch type with 'none' for
    cold-start purchases.  Composes the as-of operator — one
    union + user-keyed window, NO join node; the oracle replays the
    rule as a correlated min-lookup."""
    from preql_spark.operators.asof import asof_join
    e = _eng(spark, sf_dir).t.events.df
    touches = (e.filter(F.col("event_type").isin("view", "click"))
               .groupBy("user_id", "ts")
               .agg(F.max_by("event_type", "event_id")
                    .alias("touch_type")))
    purchases = (e.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    att = asof_join(purchases, touches, key="user_id",
                    left_time="ts", right_time="ts",
                    right_cols=["touch_type"])
    return (att.groupBy(F.coalesce("touch_type", F.lit("none"))
                        .alias("touch_type"))
            .agg(F.count(F.lit(1)).alias("n_purchases")))


def q183_psi_drift(spark, sf_dir) -> DataFrame:
    """Population Stability Index between view and error event
    values (exact integer cents): integer equal-width bucketing,
    add-one-smoothed shares, and the (p-q)ln(p/q) sum folded in
    bucket order — the q175 fixed-order contract, exact
    cross-engine."""
    from preql_spark.operators.events import psi
    e = _eng(spark, sf_dir).t.events.df
    cents = e.withColumn(
        "cents", F.floor(F.col("value").cast("double") * 100
                         + F.lit(0.5)).cast("long"))
    return psi(cents, "cents", "event_type", "view", "error",
               n_buckets=10)


def q184_containment_pairs(spark, sf_dir) -> DataFrame:
    """Asymmetric shingle containment pairs over a 150-doc slice:
    |A∩B|/|A| >= 0.9 for ordered pairs — the quote-detection
    complement to symmetric Jaccard; shingle equi-join, never
    all-pairs, one exact int64 division per pair."""
    from preql_spark.operators.dedup import ngram_containment_pairs
    d = _eng(spark, sf_dir).t.documents
    return ngram_containment_pairs(
        d.df.filter(F.col("doc_id") < 150), "doc_id",
        threshold=0.9)


def q185_weighted_pagerank(spark, sf_dir) -> DataFrame:
    """Weighted PageRank over the supplier<->part graph with edge
    weight = lineitem pair multiplicity: contrib = (rank * w) DIV
    wsum — still pure int64, still bit-identical cross-engine; same
    Pregel shape as q171."""
    from preql_spark.operators.graph import pagerank
    li = _eng(spark, sf_dir).t.lineitem.df
    e = (li.groupBy(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
        .alias("dst"))
        .agg(F.count(F.lit(1)).alias("w")))
    ed = e.unionAll(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"), "w"))
    return pagerank(ed, iters=3, weight_col="w") \
        .select("node", "rank_units", F.col("rank").alias("pr"))


def q186_assortativity(spark, sf_dir) -> DataFrame:
    """Degree assortativity of the q181 pseudo-random customer
    graph: endpoint-degree Pearson r from six exact int64 moments
    through a fixed double-op sequence (two sqrts, one division) —
    exact cross-engine."""
    from preql_spark.operators.graph import degree_assortativity
    c = _eng(spark, sf_dir).t.customer.df
    edges = c.select((F.col("c_custkey") % 400).alias("src"),
                     ((F.col("c_custkey") * 17 + 3) % 400)
                     .alias("dst"))
    return degree_assortativity(edges)


def q187_lang_shipping_priority(spark, sf_dir) -> DataFrame:
    """TPC-H Q3 shape written entirely in the lang (the q144
    discipline, second capstone): 3-table FK auto-join, a segment
    filter plus two date cuts, grouped revenue, top-10 with orderkey
    tie-break.  Revenue sums have real margins; values hash at the
    portable 4-dp rounding."""
    eng = _eng(spark, sf_dir)
    out = eng.q(
        'join(l: lineitem, o: orders, c: customer)'
        '[c.c_mktsegment == "BUILDING"'
        ' and o.o_orderdate < timestamp("1998-06-01")'
        ' and l.l_shipdate > timestamp("1998-06-01")]'
        '{o.o_orderkey, o_orderdate: o.o_orderdate,'
        ' o_orderpriority: o.o_orderpriority =>'
        ' revenue: sum(l.l_extendedprice * (1 - l.l_discount))}'
        ' order {^revenue, o_orderkey} [..10]')
    return out.df.select("o_orderkey", "o_orderdate",
                         "o_orderpriority",
                         _pr4(F.col("revenue")).alias("revenue"))


def q188_mann_whitney(spark, sf_dir) -> DataFrame:
    """Mann-Whitney U between view and purchase values (exact
    integer cents): doubled-rank int64 arithmetic over the distinct
    value domain, then a fixed double-op chain for U and the
    tie-corrected z — bit-identical cross-engine."""
    from preql_spark.operators.events import mann_whitney
    e = _eng(spark, sf_dir).t.events.df
    cents = e.withColumn(
        "cents", F.floor(F.col("value").cast("double") * 100
                         + F.lit(0.5)).cast("long"))
    return mann_whitney(cents, "cents", "event_type",
                        "view", "purchase")


def q189_chi_square(spark, sf_dir) -> DataFrame:
    """Chi-square independence of event type vs value bucket
    (cents DIV 2000): int64 contingency cells, window-sum marginals,
    (o-e)^2/e folded in cell order (the q175 contract), Cramér's V
    through one more fixed op chain — exact cross-engine."""
    from preql_spark.operators.events import chi_square
    e = _eng(spark, sf_dir).t.events.df
    b = e.withColumn(
        "bucket", F.expr("cast(floor(value * 100 + 0.5) as bigint)"
                         " DIV 2000"))
    return chi_square(b, "event_type", "bucket")


def q190_hits(spark, sf_dir) -> DataFrame:
    """HITS hubs/authorities over the q181 pseudo-random customer
    digraph, 2 rounds: int64 sums with max-rescaling via integer DIV
    — order-independent and cross-engine exact; the oracle unrolls
    both rounds with scalar-max CTEs."""
    from preql_spark.operators.graph import hits
    c = _eng(spark, sf_dir).t.customer.df
    edges = c.select((F.col("c_custkey") % 400).alias("src"),
                     ((F.col("c_custkey") * 17 + 3) % 400)
                     .alias("dst"))
    return hits(edges, iters=2)


def q191_shortest_paths(spark, sf_dir) -> DataFrame:
    """Weighted single-source shortest paths (Bellman-Ford rounds to
    the fixpoint) over a 60-node pseudo-random digraph with parallel
    weighted edges: integer relaxation mins are order-independent,
    so the fixpoint equals the oracle's bounded recursive-CTE
    enumeration exactly."""
    from preql_spark.operators.graph import shortest_paths
    c = _eng(spark, sf_dir).t.customer.df
    edges = c.select((F.col("c_custkey") % 60).alias("src"),
                     ((F.col("c_custkey") * 13 + 7) % 60)
                     .alias("dst"),
                     (1 + F.col("c_custkey") % 4).alias("w"))
    srcs = spark.range(1).select(F.lit(0).cast("long").alias("n"))
    return shortest_paths(edges, srcs, max_rounds=80, weight_col="w")


def q192_conversion_drift(spark, sf_dir) -> DataFrame:
    """Event-family integration capstone: the funnel fold labels
    each user converter/non-converter (completed view->click — the
    3-step chain has zero completions at sf0.001), RFM's exact
    integer-cent monetary aggregates per user, and the two-sample
    KS statistic measures how differently the two groups spend —
    one row (n_a, n_b, d_stat, at_value), exact cross-engine
    (integer CDFs, min-value argmax).  The oracle splices the q169
    funnel chain, the q170 cents aggregation, and the q179 KS
    pattern."""
    from preql_spark.operators.events import funnel_times, ks_statistic
    e = _eng(spark, sf_dir).t.events.df
    conv = (funnel_times(e, ["view", "click"])
            .filter(F.col("t2").isNotNull())
            .select("user_id", F.lit(1).alias("__c")))
    per = (e.groupBy("user_id")
           .agg(F.coalesce(F.sum(
               F.floor(F.col("value").cast("double") * 100
                       + F.lit(0.5)).cast("long")), F.lit(0))
               .alias("monetary_cents")))
    lab = (per.join(conv, "user_id", "left")
           .withColumn("side", F.when(F.col("__c").isNotNull(),
                                      "conv").otherwise("non")))
    return ks_statistic(lab, "monetary_cents", "side", "conv", "non")


def q197_ks_ingest(spark, sf_dir) -> DataFrame:
    """q195's streaming drift state, ordinal flavor: the SAME
    lossless per-(side, value) histogram ingest, reported as the
    two-sample KS statistic between src1 and src2 document lengths
    — exact integer CDFs from the summed counters, bit-identical to
    batch ks_statistic over the raw corpus, which is the SQL the
    oracle runs directly.  Battery/tail query (drift family keeps
    q179/q183/q195 in-window)."""
    from preql_spark.streaming.stream import incremental_ks_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q197_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(side_a="src1", side_b="src2", side_col="source",
              value_expr="length(text)")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_ks_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    return incremental_ks_ingest(spark, src, ck, st, ids, **kw) \
        .select("n_a", "n_b", "d_stat", "at_value")


def q196_pagerank_dangling(spark, sf_dir) -> DataFrame:
    """PageRank with CLASSIC dangling-mass redistribution over the
    DIRECTED supplier->part graph (every part node is a sink, so a
    large share of the mass dangles each round): rank' = base +
    ((inflow + D DIV |nodes|) * 17) DIV 20, all int64, the uniform
    share riding a single-row broadcast — zero driver actions in
    the loop.  The oracle unrolls the same three rounds with a
    dangling-sum CTE per round.  Battery/tail query (the driver
    window keeps q171/q185 for the family)."""
    from preql_spark.operators.graph import pagerank
    li = _eng(spark, sf_dir).t.lineitem.df
    e = li.select(
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
        .alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string"))
        .alias("dst")).distinct()
    return pagerank(e, iters=3, dangling="redistribute") \
        .select("node", "rank_units", F.col("rank").alias("pr"))


def q198_chi_square_ingest(spark, sf_dir) -> DataFrame:
    """Completing the drift-from-state family (PSI q195, KS q197):
    the SAME lossless per-(side, value) histogram ingest, two waves,
    reported as the chi-square independence test between side
    membership (src1/src2) and a 7-level categorical
    (``length(text) % 7``) computed FROM THE STATE — the contingency
    cells rebuild from the histogram and run batch chi_square's
    shared tail, so the report is bit-identical to the batch
    operator over the raw corpus, which is the SQL the oracle runs
    directly (the q189 formula over the filtered sides)."""
    from preql_spark.streaming.stream import incremental_chi_square_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q198_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(side_a="src1", side_b="src2", side_col="source",
              value_expr="length(text) % 7")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_chi_square_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    return incremental_chi_square_ingest(spark, src, ck, st, ids,
                                         **kw) \
        .select("n", "dof", "chi2", "cramers_v")


def q210_z_monitor_ingest(spark, sf_dir) -> DataFrame:
    """Streaming metric monitor from state — the two-moment sibling
    of the drift-from-state family: two-wave maintenance of the
    exact per-(group, value) histogram (the SAME sink/guard/state as
    the quantile ingest), reported as each observed document
    length's z-score against its source's mean/stddev computed FROM
    THE STATE, |z| > 1.5 flagging.  Moments are exact int64 sums
    pushed through a fixed double sequence and the report shares
    the batch operator's tail, so two-wave == one-shot == batch
    z_outliers over the raw corpus — the SQL the oracle runs
    directly.  z rounds 4dp on both sides (the q02 convention; the
    flag computes on the unrounded z)."""
    from preql_spark.streaming.stream import incremental_z_monitor_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q210_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(group_col="source", value_expr="length(text)", k=1.5)
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_z_monitor_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_z_monitor_ingest(spark, src, ck, st, ids, **kw)
    return out.select("g", "v", "cnt", _pr4(F.col("z")).alias("z"),
                      "is_anomaly")


def q213_datacard_ingest(spark, sf_dir) -> DataFrame:
    """Streaming corpus data card: two availableNow waves maintain a
    per-(epoch, group) counters state plus an exact (group,
    fingerprint) inventory, and the report rebuilds EVERY CUBE cell
    (per source, per lang, source×lang, global) from the states —
    docs / tokens / bytes / distinct fingerprints / dup_ratio.  The
    additive metrics cube over counter sums; n_distinct cubes over
    the inventory (a fingerprint spanning two sources counts once at
    rolled-up cells — only an inventory can express that).  Every
    17th doc's lang is deterministically NULLed, so the state holds
    GENUINE-NULL group values; both cubes carry grouping_id() in the
    cube-join key (output ``gid``), which is what keeps the NULL-lang
    cells distinct from the rollup cells — graded here with the
    NULL-group rows present.  Two-wave == one-shot == batch
    corpus_datacard over the full corpus, cell for cell, which is
    the SQL the oracle runs (q121's spelling).
    dup_ratio rounds 4dp on both sides."""
    from preql_spark.streaming.stream import incremental_datacard_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q213_")
    src, st, prs, ids, ck = (os.path.join(tmp, x)
                             for x in ("src", "st", "prs", "ids", "ck"))
    d = (eng.t.documents.df.select("doc_id", "source", "lang", "text")
         .withColumn("lang", F.when(F.col("doc_id") % 17 == 0,
                                    F.lit(None).cast("string"))
                     .otherwise(F.col("lang"))))
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_datacard_ingest(spark, src, ck, st, prs, ids)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    out = incremental_datacard_ingest(spark, src, ck, st, prs, ids)
    return out.select("source", "lang", "gid", "n_docs",
                      "total_tokens", "total_bytes", "n_distinct",
                      _pr4(F.col("dup_ratio")).alias("dup_ratio"))


def q195_psi_ingest(spark, sf_dir) -> DataFrame:
    """Streaming drift capstone: two-wave maintenance of the exact
    per-(side, value) histogram state — the (run_id, batch_id)
    append-only contract of the quantile ingest — then PSI between
    src1 and src2 document lengths computed FROM THE STATE.  The
    state is lossless, so two-wave == one-shot == batch PSI over the
    raw corpus, and the oracle computes that PSI directly in SQL —
    a full value-level check of an incremental drift monitor."""
    from preql_spark.streaming.stream import incremental_psi_ingest
    eng = _eng(spark, sf_dir)
    tmp = _scratch("q195_")
    src, st, ids, ck = (os.path.join(tmp, x)
                        for x in ("src", "st", "ids", "ck"))
    d = eng.t.documents.df.select("doc_id", "source", "text")
    kw = dict(side_a="src1", side_b="src2", side_col="source",
              value_expr="length(text)")
    d.filter(F.col("doc_id") < 250).write.mode("overwrite").parquet(src)
    incremental_psi_ingest(spark, src, ck, st, ids, **kw)
    d.filter(F.col("doc_id") >= 250).write.mode("append").parquet(src)
    return incremental_psi_ingest(spark, src, ck, st, ids, **kw) \
        .select("n_a", "n_b", "psi")


def q194_containment_capped(spark, sf_dir) -> DataFrame:
    """q184's asymmetric containment WITH the hot-shingle n²-defense
    graded: ``max_doc_freq=2`` drops every shingle shared by more
    than 2 of the 150 docs BEFORE the equi-join (stopword shingles
    are the quadratic blowup at corpus scale — a shingle in f docs
    contributes f² join rows); |A| is recomputed over the PRUNED
    shingle set so the measure stays a true containment of the kept
    shingles.  The pruning is plan-real (left_semi against the
    doc-freq filter) and pytest-asserted to shrink the join input on
    this very slice."""
    from preql_spark.operators.dedup import ngram_containment_pairs
    d = _eng(spark, sf_dir).t.documents
    return ngram_containment_pairs(
        d.df.filter(F.col("doc_id") < 150), "doc_id",
        threshold=0.6, max_doc_freq=2)


def q193_rfm_scale_safe(spark, sf_dir) -> DataFrame:
    """q170's RFM segmentation FORCING the billion-user tile plan
    (``windowed=False``): each score runs the exact-global-ntile
    stage — range repartition on the composite (key, user) sort key,
    eager localCheckpoint to freeze the partitioning, one (pid,
    count) row per partition to the driver, then a pid-partitioned
    rank window — so no stage is ever a single-partition sort
    (plan-asserted in tests/test_plans.py).  Output is bit-identical
    to q170 (same exact ntile arithmetic, same tie-break); the oracle
    is the same SQL, so the driver value-checks the scale path
    itself."""
    from preql_spark.operators.events import rfm_scores
    e = _eng(spark, sf_dir).t.events
    return rfm_scores(e.df, n_tiles=5, windowed=False) \
        .select("user_id", "r_days", "freq", "monetary_cents",
                "r_score", "f_score", "m_score")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # NOTE on ordering: the driver's correctness gate checks the FIRST
    # 50 entries; every §2 family and every LLM-pipeline operator keeps
    # at least one representative inside that window.  Rotations (the
    # displaced query moves to the tail, its family keeps an in-window
    # representative):
    #   r2: q88 (lang DML) ← q03 (global agg; attested by q01/q02),
    #       q89 (SQL() $self) ← q24 (UNION ALL; attested by q23).
    #   r3: q91 (join-by-column) ← q22 (cross join; joins q17–q20
    #       remain), q93 (FK traversal) ← q21 (zipjoin; q66 in tail,
    #       driver-green r2), q94 (backref agg) ← q43 (walk_tree;
    #       graph family keeps q42 bfs), q95 (repetition gates) ←
    #       q33 (fingerprint; text family keeps q34–q36), q99 (LM
    #       perplexity) ← q29 (map_range; range family keeps q28).
    #       All rotated-out queries stay tri-scale green in the local
    #       battery (tools/check_oracle.py, 99/99 at sf0.001/0.01/0.1).
    #   r3b: q100 (k-means) ← q26 (running sum; window family keeps
    #       q25, battery keeps q52), q101 (SemDeDup) ← q05 (fact-dim
    #       join agg attested by q04), q102 (chunk dedup) ← q34
    #       (token stats; text family keeps q35/q36/q95).
    #   r3c: q104 (SCD2) ← q18 (semi membership attested in-window by
    #       q50 in-list), q103 (domain cap) ← q19 (anti join; battery
    #       keeps q96 decontaminate's anti path and q19 itself),
    #       q105 (LLR importance) ← q35 (lang-ID; text family keeps
    #       q36/q95/q102 in-window, q35 stays green in the battery).
    #   r3d: q106 (bloom semi join) ← q09 (product agg; §2.4 keeps
    #       q01/q02/q07/q08), q107 (corpus overlap) ← q37 (minhash
    #       signatures; family attested end-to-end by q38 LSH),
    #       q114 (composed curation pipeline) ← q32 (exact dedup —
    #       a strict subset of q114's dedup stage; battery-green).
    #   r4 (bulk rotation): the entire r3 window was driver-green
    #       (CORRECTNESS_r03: 49/50, only q95's hash), so it rotates
    #       to the tail wholesale and the window takes the 48
    #       never-driver-tested queries + q95 (fixed this round — the
    #       HUGEINT/fixed-point repair must be externally confirmed)
    #       + q41 (re-spelled on the LSH scale path).  Family
    #       representation in-window: scans/projections (q51, q62),
    #       aggregation (q53, q57, q59, q72, q81), windows (q52),
    #       joins (q66, q68, q78, q120), sampling (q58, q65, q84,
    #       q115), text pipeline (q64, q82, q95, q98), dedup/ANN
    #       (q41, q73, q86, q96, q113), streaming (q63, q67, q79,
    #       q87, q112, q118), DML/history (q60, q108), lang (q61,
    #       q68, q85, q90, q92), multimodal (q116).  Deferred to the
    #       r5 window (family-redundant, battery-green): q54, q55,
    #       q56, q69, q71, q74, q77, q83.
    #   r5: the 12 never-driver-confirmed queries enter — the 9
    #       deferred above (q54-q56, q69, q71, q74, q77, q83, q123)
    #       plus this round's new q124 (selective-regime LSH), q125
    #       (lang in-table semi-join), q126 (streaming near-dup
    #       ingest) — closing lifetime external confirmation at
    #       126/126.  Displaced (all r4-green; family keeps an
    #       in-window representative): q41 ← q124 (same operator,
    #       stricter regime), q85 ← q54 (fmt), q68 ← q56 (lang
    #       join), q90 (lang: q61/q92/q123/q125 remain), q58 ← q74
    #       (hash sampling; q65/q84/q115 remain), q109 ← q77
    #       (quantile gates), q72 (agg: q53/q57/q59/q69/q70/q71/q81
    #       remain), q63/q67/q79 (streaming: q87/q112/q118/q122/q126
    #       remain), q97 (similarity: q86/q113/q124 remain),
    #       q110 (layout/tooling: q111/q120/q121 remain).
    #       NOTE (r5 erratum, per ADVICE r5): q80/q81/q82/q84 sat at
    #       positions 51-54 — IN the dict region but OUTSIDE the
    #       50-entry gate, so they were NOT externally run in r5.
    #       All four are r4-green, so lifetime confirmation held.
    #   r6: q134 (temptable), q135 (salted join identity), q136
    #       (transactions) — the only never-driver-confirmed queries
    #       — enter at the head, plus this round's new q137-q144
    #       (duplicate spans, PQ ADC, IVF-PQ, phrase search,
    #       streaming postings ingest, span-dedup removal, ranked
    #       retrieval, lang TPC-H-Q10 capstone).
    #       Displaced (all r5-green; family keeps an in-window
    #       representative): q54 (fmt: lang keeps q55/q61/q123/
    #       q125), q66 (zipjoin: joins keep q78/q120/q129),
    #       q51 (char funcs: scalar family keeps q62), q70 (unpivot:
    #       reshape keeps q53 cube/q69 collect-explode), q76 (token
    #       chunking: q75 pack_sequences remains), q122 (debounce)
    #       and q112 (exact-dedup ingest: streaming keeps q118/q126/
    #       q141 — q141 is the same two-wave==one-shot machinery),
    #       q83 (short-line strip: text keeps q64/q95/q137/q140),
    #       q119 (domain blocklist: curation keeps q115/q117/q120/
    #       q121), q98 (BM25 top terms: q143 replays the formula
    #       plus retrieval), q56 (lang join: q144 replays the n-ary
    #       FK join plus filter/agg/topk), and the
    #       mispositioned q80/q81/q82/q84 move below the marker
    #       (r4-green; agg keeps q53/q57/q59/q69/q71, similarity
    #       keeps q113/q124, text keeps q64/q95/q137/q140, sampling
    #       keeps q65/q74/q115).  Same displacement list in
    #       COVERAGE.md's confirmation log (kept in lockstep).
    #       Mid-r6 late additions: q145 (hybrid RRF retrieval),
    #       q146 (JL random projection), q147 (exact frequent-items
    #       sketch), q148 (span-level decontamination) enter at the
    #       head; q64 (TF-IDF), q57 (describe), q111 (skew report),
    #       q96 (doc-level decontaminate — q148 replays its broadcast
    #       -semi contract at span granularity), q65 (stratified
    #       sampling, displaced by q149 grouped top-k; sampling keeps
    #       q74/q115), q55 (lang pipeline, displaced by q150 DSIR;
    #       lang keeps q61/q123/q125/q144), all r5-green, rotate to
    #       the tail —
    #       text/retrieval keeps q95/q137/q140/q142/q143/q145, agg
    #       keeps q53/q59/q69/q71, layout/tooling keeps q120/q121.
    #       Second batch of mid-r6 late additions: q151 (streaming
    #       frequent-items ingest) displaces q118 (stateful counter;
    #       streaming keeps q126/q141/q151), q152 (weighted RRF)
    #       displaces q132 (arrow cosine top-k; its BLAS kernel stays
    #       pytest-equal to the hof path that q145/q152/q154 grade,
    #       ANN keeps q124/q138/q139), q153 (quantile rollup)
    #       displaces q77 (quantile filter; q153 replays the exact
    #       percentile contract at rollup granularity), q154 (MMR
    #       diversification) displaces q113 (contrastive pairs;
    #       similarity keeps q124/q133/q138/q139/q146/q154).  All
    #       four displaced are r5-green (CORRECTNESS_r05).
    #       Third batch: q155 (temperature mixture) displaces q115
    #       (mixture sample — q155 replays its hash rule plus the
    #       sqrt-share arithmetic; sampling keeps q150/q155/q157) and
    #       q156 (token-budget selection) displaces q121 (corpus
    #       datacard; curation/tooling keeps q117/q120).  Both
    #       displaced are r5-green.
    #       q157 (proportional interleave) displaces q74 (hash
    #       split; the deterministic-hash family keeps q150/q155/
    #       q157 in-window; q74 is r5-green).
    #       q158 (streaming exact-quantile ingest) displaces q71
    #       (fixed-range histogram; distribution reporting keeps
    #       q153 rollup + q158 quantiles, agg keeps q53/q59/q69;
    #       q71 is r5-green).
    #   r7: the 10 never-driver-confirmed queries enter at the head —
    #       q159 (retrieve->refine->diversify ANN capstone), q160
    #       (BPE pair counts), q161 (n-gram diversity), and this
    #       round's event-analytics/fuzzy/streaming batch q162
    #       (anchored-window funnel), q163 (cohort retention), q164
    #       (transition matrix), q165 (winsorize), q166 (EWMA fold),
    #       q167 (ED-Join fuzzy pairs), q168 (streaming distinct
    #       inventory).  q141/q146 STAY in-window: both failed r6
    #       only in the driver's list-cell canonicalizer and now
    #       serialize arrays to strings — the fix must be externally
    #       confirmed.  Displaced (all r6-green; family keeps an
    #       in-window representative): q123 (lang: q61/q125/q144
    #       remain), q127/q128/q130 (io roundtrips: q131 remains),
    #       q52 (window battery: q164 lead + q153 rollup + q149's
    #       window oracle remain), q59 (first/last_by: agg keeps
    #       q53/q147), q69 (collect/explode: q53 + q160 slices
    #       remain), q108 (snapshot diff: DML keeps q60/q136), q117
    #       (expectations: tooling keeps q120), q133 (SemDeDup rule:
    #       similarity keeps q138/q139/q146/q152/q154/q159).
    #   r8: the 24 never-driver-confirmed round-7 queries q169-q192
    #       enter at the head (incl. the rows-only sketch ingests
    #       q174/q177 — the driver records their weaker rows-only
    #       check), restoring lifetime external confirmation to
    #       192/192.  Displaced (all r7-green, CORRECTNESS_r07 50/50;
    #       family keeps an in-window representative): the r7 batch
    #       q162-q168 (events family keeps q169/q170/q176/q182;
    #       fuzzy keeps q178 — the ER capstone replays the ED-Join;
    #       winsorize/EWMA robust-stats family keeps q173 MAD;
    #       streaming keeps q126/q158/q174/q177), q155/q157
    #       (mixture/interleave: sampling keeps q150 DSIR + q156
    #       budget select), q151/q153 (sketch/distribution reporting
    #       keeps q158 quantile ingest + q174/q177), q154 (MMR:
    #       q159's diversify stage replays it; ANN keeps
    #       q124/q152/q159), q137/q142 (span family keeps q148),
    #       q138/q139 (PQ: ANN keeps q159's IVF refine + q152),
    #       q140/q143/q145 (search keeps q152 weighted hybrid),
    #       q141 (postings ingest: streaming keeps q126/q158 and the
    #       two sketch ingests), q144 (lang capstone: q187 TPC-H Q3
    #       replays n-ary join+filter+agg+topk; lang keeps
    #       q61/q125/q187), q146 (projection: similarity keeps
    #       q152/q159), q147 (frequent tokens: sketch keeps
    #       q174/q177), q73 (CC canonical: q178 replays
    #       fuzzy->CC->canonical end-to-end).
    "q216_c4_clean": q216_c4_clean,
    "q217_gate_rate_ingest": q217_gate_rate_ingest,
    "q193_rfm_scale_safe": q193_rfm_scale_safe,
    "q196_pagerank_dangling": q196_pagerank_dangling,
    "q197_ks_ingest": q197_ks_ingest,
    "q215_gopher_quality_gate": q215_gopher_quality_gate,
    "q121_corpus_datacard": q121_corpus_datacard,
    # rows-only by design: DataSketches HLL has no DuckDB twin; the
    # two-wave == one-shot identity is pytest-pinned instead
    "q174_hll_ingest": q174_hll_ingest,
    "q201_normalize_text": q201_normalize_text,
    "q200_leakage_safe_split": q200_leakage_safe_split,
    # rows-only by design: t-digest estimates have no DuckDB twin
    "q177_tdigest_ingest": q177_tdigest_ingest,
    "q178_entity_resolution": q178_entity_resolution,
    "q179_ks_drift": q179_ks_drift,
    "q198_chi_square_ingest": q198_chi_square_ingest,
    "q218_curation_ingest": q218_curation_ingest,
    "q182_attribution": q182_attribution,
    "q223_quality_funnel": q223_quality_funnel,
    "q194_containment_capped": q194_containment_capped,
    "q195_psi_ingest": q195_psi_ingest,
    "q185_weighted_pagerank": q185_weighted_pagerank,
    "q221_classifier_gate": q221_classifier_gate,
    "q225_embed_text": q225_embed_text,
    "q226_embed_semdedup": q226_embed_semdedup,
    "q187_lang_shipping_priority": q187_lang_shipping_priority,
    "q219_lang_gopher_pipeline": q219_lang_gopher_pipeline,
    "q222_classifier_rate_ingest": q222_classifier_rate_ingest,
    "q227_composed_rate_ingest": q227_composed_rate_ingest,
    "q220_clean_then_datacard": q220_clean_then_datacard,
    "q191_shortest_paths": q191_shortest_paths,
    "q192_conversion_drift": q192_conversion_drift,
    "q224_ccnet_buckets": q224_ccnet_buckets,
    "q209_curation_pipeline": q209_curation_pipeline,
    "q210_z_monitor_ingest": q210_z_monitor_ingest,
    "q156_budget_select": q156_budget_select,
    "q202_ivf_stream_index": q202_ivf_stream_index,
    "q211_strip_repeated_units": q211_strip_repeated_units,
    "q212_cluster_size_histogram": q212_cluster_size_histogram,
    "q205_k_anonymity": q205_k_anonymity,
    "q206_quantile_normalize": q206_quantile_normalize,
    "q213_datacard_ingest": q213_datacard_ingest,
    "q204_canonicalize_url": q204_canonicalize_url,
    "q125_lang_in_table": q125_lang_in_table,
    "q203_dedup_keep_best": q203_dedup_keep_best,
    "q131_sqlite_roundtrip": q131_sqlite_roundtrip,
    "q95_repetition_metrics": q95_repetition_metrics,
    "q116_audio_features": q116_audio_features,
    "q120_join_cardinality": q120_join_cardinality,
    "q214_pii_counts": q214_pii_counts,
    "q60_dml_lifecycle": q60_dml_lifecycle,
    "q62_json_extract": q62_json_extract,
    # ---- end of the 50-entry driver window -------------------------
    # rotated out for r9 (all r8-green per CORRECTNESS_r08; family
    # keeps an in-window representative): q161 (text diversity:
    # q95/q160/q175 remain), q149 (grouped top-k: q187's
    # TakeOrdered + q152's ranked lists remain), q129 (join chain:
    # q187 n-ary join + q135 salted + q78 interval remain) — making
    # room for this round's NEW graded queries q193 (forced
    # scale-safe RFM ntile plan), q194 (containment with the
    # hot-shingle max_doc_freq cap), q195 (streaming PSI ingest).
    # Every r9-TOUCHED code path stays in-window for external
    # re-confirmation: q170/q193 (rfm), q174 (HLL append-only
    # rewrite), q183/q195 (psi refactor), q179/q188/q192 (KS/MW
    # domain guard), q190 (HITS in-plan rescale), q184/q194
    # (containment).
    #   r10: q196 (dangling-mass PageRank) and q197 (KS-from-state)
    #       — the only 2 of 197 queries never externally
    #       driver-confirmed (added after the r9 window head was
    #       fixed) — enter the head, displacing q171 (graph keeps
    #       q185/q190/q191/q196) and q184 (q194 replays it capped).
    #       The round's ELEVEN new graded queries also enter: q198
    #       (chi-square from the shared drift state), q199
    #       (quantize_to KS), q200 (leakage-safe split), q201
    #       (normalize_text), q202 (streaming IVF index), q203
    #       (dedup keep-best), q204 (URL canonicalization), q205
    #       (k-anonymity gate), q206 (quantile normalize), q207
    #       (rolling z anomalies), q208 (source concentration) —
    #       displacing q180, q186, q176,
    #       q175, q152, q126, q124, q134, q135, q61, q158
    #       (all r9-green; per-displacement family notes at the r10
    #       tail markers below, mirrored in COVERAGE.md).
    #   r11: q209 (end-to-end curation capstone — canonicalize_url →
    #       URL-exact dedup → normalize_text → MinHash pairs →
    #       dedup_keep_best → leakage_safe_split → concentration
    #       datacard, oracled end-to-end) and q210 (streaming
    #       z-monitor from the shared per-group histogram state —
    #       the two-moment sibling of the drift-from-state family)
    #       enter the head, displacing q159 (ANN/search keeps q202's
    #       streaming IVF search; the retrieve→refine→diversify
    #       stages stay battery tri-scale + pytest) and q160 (text
    #       keeps q95/q201 plus q209's normalize/concentration path;
    #       the BPE loop stays battery tri-scale + pytest).  Every
    #       r11-TOUCHED graded code path stays in-window for
    #       external re-confirmation: q201 (widened accent fold),
    #       q202 (ids sidecar + compaction lock), q204 (scheme-aware
    #       port strip), q206 (non-null-only ranking).  Mid-round,
    #       q211 (intra-doc self-repetition removal, scan-local
    #       array_distinct) and q212 (near-dup cluster-size
    #       histogram datacard) also enter, displacing q148 (span
    #       decontamination — r10-green; dedup/span family keeps
    #       q194 containment + q200/q203/q209, and the broadcast
    #       LeftSemi scrub machinery stays battery tri-scale +
    #       pytest) and q150 (DSIR resample — r10-green; sampling
    #       keeps q156 budget-select plus q209's md5-split replay;
    #       the hash-bucket resample rule stays battery tri-scale).
    #       Late addition: q213 (streaming corpus data
    #       card: counters state + fingerprint inventory, report
    #       rebuilds every CUBE cell from state == batch
    #       corpus_datacard) enters, displacing q136 (transactions —
    #       r10-green; DML keeps q60's full lifecycle in-window, the
    #       transaction machinery stays battery tri-scale + pytest);
    #       and q214 (PII exposure datacard — per (source, kind)
    #       match counts from the engine's own RE2-portable
    #       PII_PATTERNS, the audit sibling of q82's redaction)
    #       enters, displacing q53 (cube — r10-green; the CUBE
    #       semantics keep an in-window representative through
    #       q213's cube-from-state report graded cell-for-cell, and
    #       q81 grouping-sets holds lifetime confirmation; the cube
    #       operator stays battery tri-scale).
    #   r12: q215 (Gopher/MassiveText composite quality gate — the
    #       remaining cheap-boolean rules of the paper whose
    #       repetition half q95/q211 already grade, ONE scan-local
    #       Project) enters, displacing q172 (value trend —
    #       r11-green; events keeps q169/q170/q182/q192/q193/q206/
    #       q207 in-window, and the regression-slope arithmetic
    #       stays battery tri-scale + pytest).  q121 (batch corpus
    #       datacard) RE-ENTERS the head — this round changes its
    #       output contract (grouping_id column + deterministic
    #       NULL-lang injection, the r11 watch-item fix), and every
    #       touched graded path must be externally re-confirmed —
    #       displacing q173 (MAD outliers — r11-green; the robust
    #       outlier family keeps q207 rolling z + q210 z-monitor
    #       in-window).  q213's identical gid re-grade stays
    #       in-window as before.  Mid-round, q216 (C4 cleaning rules
    #       — Raffel et al. 2020 §2.2 line/page heuristics, the
    #       line-structure sibling of q215's document-statistics
    #       gate, ONE scan-local Project) also enters, displacing
    #       q169 (conversion lag — r11-green; events keeps
    #       q182/q192/q193/q206/q207 in-window, the
    #       first-match-per-user machinery stays battery tri-scale
    #       + pytest); and q217 (streaming gate keep-rate monitor —
    #       the observability half of curation: per-source
    #       (n_docs, n_keep) counters under the data-card epoch
    #       guard, report = state sums == batch gate + GROUP BY,
    #       oracled end-to-end) enters, displacing q170 (RFM scores
    #       — r11-green; q193 is the same operator's forced
    #       scale-safe plan, in-window); and q218 (streaming
    #       curated-corpus materialization — C4 survivors' CLEANED
    #       text appended exactly-once, content-addressed on the
    #       store's own ids, report == batch gate+filter+GROUP BY)
    #       enters, displacing q181 (triangles — r11-green; graph
    #       keeps q185/q190/q191/q196 in-window); and q219 (the
    #       Gopher gate composed entirely IN THE LANG — filter on
    #       its keep flag + lang aggregates; the q123 lang-parity
    #       contract for the r12 gate family) enters, displacing
    #       q188 (Mann-Whitney — r11-green; the stats family keeps
    #       q179/q183/q189/q192/q195/q197/q198/q199 in-window).
    #       Late addition: q220 (clean-then-card composition — C4
    #       clean → keep → GROUPING()-aware corpus datacard over the
    #       CLEANED text, both stages replayed in the oracle so the
    #       cell hashes grade the composition) enters, displacing
    #       q190 (HITS — r11-green; graph keeps q185/q191/q196
    #       in-window).
    #   r13: q221 (model-scored classifier gate on its graded FAKE
    #       path — deterministic md5 scores through the real Arrow
    #       mapInPandas boundary, integer-exact oracle) enters,
    #       displacing q199 (quantize_to KS knob — r12-green; the
    #       KS family keeps q179 drift + q197 ks-from-state
    #       in-window, and the quantize arithmetic stays battery
    #       tri-scale + pytest).  q222 (streaming keep-rate monitor
    #       under the classifier gate — the proof the unified GATES
    #       registry routes the streaming surface through the
    #       model-scored path; same counters state as q217) also
    #       enters, displacing q189 (chi-square batch — r12-green;
    #       the stats family keeps q179/q183/q192/q195/q197/q198
    #       in-window, and q198 replays the identical chi-square
    #       formula FROM STATE).  Late addition: q223 (the
    #       rule→classifier quality funnel — Gopher battery composed
    #       with the classifier gate in one pass, per-source
    #       (n_raw, n_rule_keep, n_final) funnel; both stages
    #       replayed in the oracle) enters, displacing q183 (PSI
    #       drift — r12-green; the drift family keeps
    #       q179/q192/q195/q197/q198 in-window, and q195 replays
    #       the identical PSI formula FROM STATE); and q224 (the
    #       CCNet bucketing — q99's bigram-LM perplexity cut into
    #       head/middle/tail by exact terciles via
    #       quantile_bucketize's one-pass percentile + scan-local
    #       strict-> assignment; NULL ppl -> NULL bucket both
    #       sides) enters, displacing q208 (source concentration —
    #       r12-green; q209's split-datacard stage replays the
    #       identical sorted-HHI concentration fold in-window, and
    #       the operator stays battery tri-scale + pytest).  Every
    #       r13-TOUCHED graded path
    #       stays in-window for external re-confirmation: q215-q220
    #       (golden-corpus gate tightenings: Unicode-ellipsis
    #       symbol, c4_utils ellipsis-line exclusion + policy
    #       substrings, \s-aware blank/bullet/ellipsis line edges),
    #       q213 (datacard in-batch id dedup), q202 (marker-safe
    #       prune), q218 (ids sidecar + gate fingerprint).
    #   r14: q225 (text→embedding hook on its graded FAKE path —
    #       md5-derived vectors through the real Arrow mapInPandas
    #       boundary, integer-exact per-component oracle via the
    #       lossless u32 recovery) enters, displacing q75 (sequence
    #       packing — r13-green; the token/text family keeps
    #       q95/q201/q204/q211/q224 in-window, and the packing
    #       window stays battery tri-scale + in the bench).  q226
    #       (the end-to-end semantic dedup FROM RAW TEXT: embed_text
    #       → semdedup, the composition the fixtures used to
    #       short-circuit; the oracle replays embeddings, both
    #       Lloyd iterations, and the min-id cosine drop) enters,
    #       displacing q78 (interval join — r13-green; joins keep
    #       q120 cardinality + q187 n-ary in-window, and the
    #       bucketized range join stays battery tri-scale + in the
    #       bench).  q227 (the rule→classifier funnel as a STREAMING
    #       gate — q223's composition registered once as
    #       GATES["composed"] and consumed by the keep-rate monitor
    #       with zero ingest edits; nested stage thresholds ride the
    #       config fingerprint) enters, displacing q207 (rolling z
    #       anomalies — r13-green; the anomaly/drift family keeps
    #       q210 z-monitor + q179/q192/q195/q197/q198 in-window, and
    #       the rolling-window arithmetic stays battery tri-scale +
    #       pytest).  q224 STAYS in-window: this round removes its
    #       fixed doc_id slice (the r13 watch-item), so the changed
    #       full-corpus grading must be externally confirmed; the
    #       sidecar-safety fixes keep q218 in-window likewise.
    # displaced mid-r11 by the NEW graded q209 (see the r11 note):
    "q159_retrieve_refine_diversify": q159_retrieve_refine_diversify,
    # displaced mid-r11 by the NEW graded q210 (see the r11 note):
    "q160_bpe_pair_counts": q160_bpe_pair_counts,
    # displaced mid-r11 by the NEW graded q211 (see the r11 note):
    "q148_scrub_contaminated_spans": q148_scrub_contaminated_spans,
    # displaced mid-r11 by the NEW graded q212 (see the r11 note):
    "q150_dsir_resample": q150_dsir_resample,
    # displaced in r14 by the NEW graded q225 (see the r14 note):
    "q75_pack_sequences": q75_pack_sequences,
    # displaced in r14 by the NEW graded q227 (see the r14 note):
    "q207_rolling_anomalies": q207_rolling_anomalies,
    # displaced in r14 by the NEW graded q226 (see the r14 note):
    "q78_interval_join": q78_interval_join,
    # displaced in r13 by the NEW graded q221 (see the r13 note):
    "q199_ks_quantized": q199_ks_quantized,
    # displaced mid-r13 by the NEW graded q223 (see the r13 note):
    "q183_psi_drift": q183_psi_drift,
    # displaced mid-r13 by the NEW graded q224 (see the r13 note):
    "q208_source_concentration": q208_source_concentration,
    # displaced in r13 by the NEW graded q222 (see the r13 note):
    "q189_chi_square": q189_chi_square,
    # displaced in r12 by the NEW graded q215 (see the r12 note):
    "q172_value_trend": q172_value_trend,
    # displaced mid-r12 by the NEW graded q216 (see the r12 note):
    "q169_conversion_lag": q169_conversion_lag,
    # displaced mid-r12 by the NEW graded q217 (see the r12 note):
    "q170_rfm_scores": q170_rfm_scores,
    # displaced mid-r12 by the NEW graded q218 (see the r12 note):
    "q181_triangles": q181_triangles,
    # displaced mid-r12 by the NEW graded q219 (see the r12 note):
    "q188_mann_whitney": q188_mann_whitney,
    # displaced mid-r12 by the NEW graded q220 (see the r12 note):
    "q190_hits": q190_hits,
    # displaced in r12 by q121's re-entry (gid contract change):
    "q173_mad_outliers": q173_mad_outliers,
    # displaced mid-r11 by the NEW graded q213 (see the r11 note):
    "q136_transactions": q136_transactions,
    # displaced mid-r11 by the NEW graded q214 (see the r11 note):
    "q53_cube": q53_cube,
    "q161_ngram_diversity": q161_ngram_diversity,
    "q149_topk_per_group": q149_topk_per_group,
    "q129_four_way_chain": q129_four_way_chain,
    # rotated out for r8 (all r7-green per CORRECTNESS_r07; families
    # kept in-window per the r8 rotation log above):
    "q162_funnel": q162_funnel,
    "q163_cohort_retention": q163_cohort_retention,
    "q164_transition_counts": q164_transition_counts,
    "q165_winsorize": q165_winsorize,
    "q166_ewma": q166_ewma,
    "q167_fuzzy_pairs": q167_fuzzy_pairs,
    "q168_distinct_ingest": q168_distinct_ingest,
    "q157_interleave_sources": q157_interleave_sources,
    "q155_temperature_mixture": q155_temperature_mixture,
    "q151_stream_frequent_ingest": q151_stream_frequent_ingest,
    "q153_quantile_rollup": q153_quantile_rollup,
    "q154_mmr_diversify": q154_mmr_diversify,
    "q137_duplicate_spans": q137_duplicate_spans,
    "q138_pq_adc_topk": q138_pq_adc_topk,
    "q139_ivf_pq_topk": q139_ivf_pq_topk,
    "q140_phrase_search": q140_phrase_search,
    "q141_stream_postings_ingest": q141_stream_postings_ingest,
    "q142_remove_duplicate_spans": q142_remove_duplicate_spans,
    "q143_ranked_search": q143_ranked_search,
    "q144_lang_returned_revenue": q144_lang_returned_revenue,
    "q145_hybrid_search": q145_hybrid_search,
    "q146_random_projection": q146_random_projection,
    "q147_frequent_tokens": q147_frequent_tokens,
    "q73_dedup_canonical": q73_dedup_canonical,
    # rotated out for r10 (all r9-green per CORRECTNESS_r09; family
    # keeps an in-window representative — the displaced slots went to
    # q196/q197, the only two queries with no lifetime driver
    # confirmation, per the r9 verdict's top item): q171 exact-int
    # PageRank (graph keeps q185 weighted + q190 HITS + q191 SSSP +
    # q196 dangling-redistribute, which replays q171's per-iteration
    # join+agg loop PLUS the dangling-mass stage), q184 containment
    # pairs (q194 replays the same operator under the hot-shingle
    # cap; its uncapped branch stays battery tri-scale green):
    "q171_pagerank": q171_pagerank,
    "q184_containment_pairs": q184_containment_pairs,
    # displaced mid-r10 by the NEW graded q198 chi-square-from-state
    # (drift/stats family keeps q179 KS, q183 PSI, q188 MW, q189
    # chi-square batch, q192 capstone, q195/q197/q198 ingests):
    "q180_ab_test": q180_ab_test,
    # displaced mid-r10 by the NEW graded q199 quantize_to KS knob
    # (graph family keeps q185/q190/q191/q196 in-window):
    "q186_assortativity": q186_assortativity,
    # displaced mid-r10 by the NEW graded q200 leakage-safe split
    # capstone (events family keeps q169/q170/q182/q192/q193):
    "q176_session_paths": q176_session_paths,
    # displaced mid-r10 by the NEW graded q201 normalize_text (text
    # family keeps q95 repetition metrics + q160 BPE + q200/q201):
    "q175_token_entropy": q175_token_entropy,
    # displaced mid-r10 by the NEW graded q202 streaming IVF index
    # (ANN/search family keeps q124/q159/q202 — q159 replays the IVF
    # refine stage plus MMR; RRF fusion stays battery tri-scale):
    "q152_weighted_hybrid_search": q152_weighted_hybrid_search,
    # displaced mid-r10 by the NEW graded q203 quality-aware dedup
    # canonical (streaming keeps q158/q174/q177/q195/q197/q198/q202;
    # the near-dup ingest machinery stays battery tri-scale):
    "q126_stream_neardup_ingest": q126_stream_neardup_ingest,
    # displaced mid-r10 by the NEW graded q204 URL canonicalization
    # (similarity/LSH keeps q159/q202; dedup keeps q194/q200/q203):
    "q124_lsh_selective_neardup": q124_lsh_selective_neardup,
    # displaced mid-r10 by the NEW graded q205 k-anonymity gate
    # (DML keeps q60/q136; agg keeps q53 cube):
    "q134_temptable_agg": q134_temptable_agg,
    # displaced mid-r10 by the NEW graded q206 quantile-normalize
    # (joins keep q78 interval + q187 lang n-ary; the salted-join
    # identity stays battery tri-scale):
    "q135_salted_join": q135_salted_join,
    # displaced mid-r10 by the NEW graded q207 rolling z anomalies
    # (lang keeps q125 in-table semi-join + q187 full-query capstone;
    # user functions stay pytest-covered end to end):
    "q61_lang_user_func": q61_lang_user_func,
    # displaced mid-r10 by the NEW graded q208 source concentration
    # (streaming keeps q174/q177/q195/q197/q198/q202 — q195/q197/q198
    # share q158's exact histogram-state machinery):
    "q158_stream_quantile_ingest": q158_stream_quantile_ingest,
    # rotated out for r7 (all r6-green; families kept in-window per
    # the r7 rotation log above):
    "q123_lang_pipeline_builtins": q123_lang_pipeline_builtins,
    "q127_jsonl_roundtrip": q127_jsonl_roundtrip,
    "q128_csv_roundtrip": q128_csv_roundtrip,
    "q130_orc_roundtrip": q130_orc_roundtrip,
    "q133_semdedup_paper_rule": q133_semdedup_paper_rule,
    "q69_collect_explode_roundtrip": q69_collect_explode_roundtrip,
    "q108_snapshot_diff": q108_snapshot_diff,
    "q117_validation_report": q117_validation_report,
    "q52_window_battery": q52_window_battery,
    "q59_first_last_by": q59_first_last_by,
    # rotated out mid-r6 by the late batches q151-q158 (all
    # r5-green; families kept in-window per the rotation log above):
    "q71_histogram": q71_histogram,
    "q74_split_by_hash": q74_split_by_hash,
    "q115_mixture_sample": q115_mixture_sample,
    # (q121 re-entered the 50-entry head in r12 — gid contract change)
    "q132_cosine_topk_arrow": q132_cosine_topk_arrow,
    "q77_quantile_filter": q77_quantile_filter,
    "q113_contrastive_pairs": q113_contrastive_pairs,
    "q118_stream_stateful_counter": q118_stream_stateful_counter,
    # rotated out mid-r6 by the late additions q145 (hybrid RRF),
    # q146 (JL projection), q147 (frequent-items sketch), q148 (span
    # decontamination): q64 TF-IDF, q57 describe, q111 skew report,
    # q96 doc-level decontaminate, q65 stratified sampling (q149
    # displaced it; sampling keeps q74/q115), q55 lang pipeline (q150
    # displaced it; lang keeps q61/q123/q125/q144) are r5-green;
    # text/retrieval keeps q95/q137/q140/q142/q143/q145 in-window,
    # agg keeps q53/q59/q69/q71, layout/tooling keeps q120/q121, and
    # q148 replays q96's broadcast-semi decontamination contract at
    # span granularity.
    "q64_tfidf_top_terms": q64_tfidf_top_terms,
    "q57_describe_stats": q57_describe_stats,
    "q111_skew_report": q111_skew_report,
    "q96_decontaminate": q96_decontaminate,
    "q65_sample_stratified": q65_sample_stratified,
    "q55_lang_pipeline": q55_lang_pipeline,
    "q76_chunk_tokens": q76_chunk_tokens,
    # rotated out r6 (all driver-green r4/r5):
    "q56_lang_join": q56_lang_join,
    "q98_bm25_top_terms": q98_bm25_top_terms,
    "q119_domain_blocklist": q119_domain_blocklist,
    "q112_stream_ingest_dedup": q112_stream_ingest_dedup,
    "q83_strip_short_lines": q83_strip_short_lines,
    "q122_debounce": q122_debounce,
    "q70_unpivot": q70_unpivot,
    "q54_fmt_interpolation": q54_fmt_interpolation,
    "q66_zipjoin_longest": q66_zipjoin_longest,
    "q51_char_funcs": q51_char_funcs,
    "q80_centroid_agg": q80_centroid_agg,
    "q81_grouping_sets": q81_grouping_sets,
    "q82_redact_pii": q82_redact_pii,
    "q84_sample_weighted": q84_sample_weighted,
    # rotated out r5 (driver-green r4).  q86/q87/q92 displaced by the
    # late additions q127-q129 (round-trip identities + 4-way chain):
    # ANN keeps q124 in-window, streaming keeps
    # q112/q118/q122/q126, lang/UDF keeps q55/q56/q61/q123/q125.
    "q86_ivf_full_probe": q86_ivf_full_probe,
    "q87_stream_dedup": q87_stream_dedup,
    "q92_table_methods": q92_table_methods,
    "q41_embedding_neardup": q41_embedding_neardup,
    "q58_sample_hash": q58_sample_hash,
    "q63_stream_sliding": q63_stream_sliding,
    "q67_stream_session": q67_stream_session,
    "q68_lang_theta_join": q68_lang_theta_join,
    "q72_corr": q72_corr,
    "q79_stream_stream_join": q79_stream_stream_join,
    "q85_lang_fmt": q85_lang_fmt,
    "q90_lazy_param": q90_lazy_param,
    "q97_quantize_embeddings": q97_quantize_embeddings,
    "q109_quantile_bucketize": q109_quantile_bucketize,
    "q110_zorder_key": q110_zorder_key,
    # driver-green r3 window, rotated out earlier:
    "q01_pricing_summary": q01_pricing_summary,
    "q02_agg_battery": q02_agg_battery,
    "q88_lang_dml_lifecycle": q88_lang_dml_lifecycle,
    "q04_revenue_by_nation": q04_revenue_by_nation,
    "q101_semdedup": q101_semdedup,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_collect_list": q07_collect_list,
    "q08_median_percentile": q08_median_percentile,
    "q106_bloom_semi_join": q106_bloom_semi_join,
    "q10_projection_markup": q10_projection_markup,
    "q11_selection": q11_selection,
    "q12_slice_page": q12_slice_page,
    "q13_string_funcs": q13_string_funcs,
    "q14_date_parts": q14_date_parts,
    "q15_case_when": q15_case_when,
    "q16_casts": q16_casts,
    "q17_leftjoin": q17_leftjoin,
    "q104_scd2_history": q104_scd2_history,
    "q103_domain_cap": q103_domain_cap,
    "q20_theta_join": q20_theta_join,
    "q93_fk_traversal": q93_fk_traversal,
    "q91_join_by_column": q91_join_by_column,
    "q23_set_ops": q23_set_ops,
    "q89_sql_recursion": q89_sql_recursion,
    "q25_window_rank": q25_window_rank,
    "q100_kmeans": q100_kmeans,
    "q27_enum": q27_enum,
    "q28_range": q28_range,
    "q99_lm_perplexity": q99_lm_perplexity,
    "q30_rollup": q30_rollup,
    "q31_pivot": q31_pivot,
    "q114_curation_pipeline": q114_curation_pipeline,
    "q102_chunk_dedup": q102_chunk_dedup,
    "q105_llr_importance": q105_llr_importance,
    "q36_quality": q36_quality,
    "q107_corpus_overlap": q107_corpus_overlap,
    "q38_neardup_minhash": q38_neardup_minhash,
    "q39_simhash_pairs": q39_simhash_pairs,
    "q40_cosine_topk": q40_cosine_topk,
    "q42_bfs": q42_bfs,
    "q94_backref_agg": q94_backref_agg,
    "q44_sessionize": q44_sessionize,
    "q45_tumbling_window": q45_tumbling_window,
    "q46_asof_join": q46_asof_join,
    "q47_multimodal_features": q47_multimodal_features,
    "q48_stream_tumbling": q48_stream_tumbling,
    "q49_struct_join_access": q49_struct_join_access,
    "q50_in_list": q50_in_list,
    # driver-green r1/r2, rotated out earlier rounds:
    "q03_global_agg": q03_global_agg,
    "q24_union_all": q24_union_all,
    "q21_zipjoin": q21_zipjoin,
    "q22_cross_join": q22_cross_join,
    "q43_walk_tree": q43_walk_tree,
    "q33_fingerprint": q33_fingerprint,
    "q29_map_range": q29_map_range,
    "q05_region_order_stats": q05_region_order_stats,
    "q26_running_sum": q26_running_sum,
    "q34_token_stats": q34_token_stats,
    "q18_semi_join": q18_semi_join,
    "q19_anti_join": q19_anti_join,
    "q35_lang_id": q35_lang_id,
    "q09_product_agg": q09_product_agg,
    "q37_minhash_signature": q37_minhash_signature,
    "q32_dedup_exact": q32_dedup_exact,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def _accent_fold_sql(expr: str) -> str:
    """The q201 oracle's accent-fold chain composed from the SAME
    tables the engine uses (preql_spark.operators.text
    ACCENT_FOLD_*), so the two spellings cannot drift."""
    from preql_spark.operators.text import (ACCENT_FOLD_FROM,
                                            ACCENT_FOLD_MULTI,
                                            ACCENT_FOLD_TO)
    s = expr
    for a, b in ACCENT_FOLD_MULTI:
        s = f"replace({s}, '{a}', '{b}')"
    return (f"translate({s}, '{ACCENT_FOLD_FROM}', "
            f"'{ACCENT_FOLD_TO}')")


def _pii_counts_sql() -> str:
    """The q214 oracle composed from the engine's own PII_PATTERNS
    (RE2-compatible by design), so the two spellings cannot drift."""
    from preql_spark.operators.text import PII_PATTERNS
    legs = " UNION ALL ".join(
        f"SELECT source, '{k}' AS kind, "
        f"coalesce(len(regexp_extract_all(s, '{pat}')), 0) AS n "
        "FROM dirty"
        for k, pat in PII_PATTERNS.items())
    return rf"""
        WITH dirty AS (
            SELECT source,
                   text || ' contact u' || doc_id
                        || '@example.com or +1 (555) 010-' || doc_id
                        || ' at 10.0.0.' || (doc_id % 255) AS s
            FROM documents),
        m AS ({legs})
        SELECT source, kind,
               CAST(sum(n) AS BIGINT) AS n_matches,
               CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_docs
        FROM m GROUP BY source, kind
    """


#: synthesized dirt for q201 — exercises the multi-char folds
#: (Æ/œ/ß/ĳ/Þ), the Latin Extended-A translate entries (Ł ó ź), the
#: Latin-1 table, punctuation incl. non-ASCII (— … ’), and ragged
#: spacing, identically on both engines
_Q201_DIRT = ("  Héllo,\u00a0Wörld!—ÆSOP’s\u0085Œuvre: "
              "straße, Łódź,\u2009ĳs & Þorn…  ")


def _ws_sql() -> str:
    """The normalize_text collapse class, composed from the SAME
    constant the engine uses (text.WHITESPACE_CLASS — ASCII \\s plus
    the Unicode separators), so the two spellings cannot drift."""
    from preql_spark.operators.text import WHITESPACE_CLASS
    return WHITESPACE_CLASS


ORACLES: dict[str, str] = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_agg_battery": """
        SELECT c_nationkey,
               count(*) AS n,
               count(DISTINCT c_mktsegment) AS n_seg,
               round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total,
               round(avg(c_acctbal), 4) AS avg,
               min(c_acctbal) AS lo,
               max(c_acctbal) AS hi,
               round(stddev_samp(c_acctbal), 4) AS sd,
               CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich
        FROM customer GROUP BY c_nationkey
    """,
    "q03_global_agg": """
        SELECT count(*) AS n,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total,
               round(max(o_totalprice), 2) AS hi
        FROM orders
    """,
    "q04_revenue_by_nation": """
        SELECT n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY revenue DESC, nation
    """,
    "q05_region_order_stats": """
        SELECT r_name AS region, count(*) AS n_orders,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "q06_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
    """,
    "q07_collect_list": """
        SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS names
        FROM nation GROUP BY n_regionkey
    """,
    "q08_median_percentile": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
               round(quantile_cont(l_extendedprice, 0.9), 2) AS p90_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "q09_product_agg": """
        SELECT l_orderkey,
               floor(product(1.0 + l_discount) * 10000 + 0.5) / 10000 AS prod
        FROM lineitem GROUP BY l_orderkey
    """,
    "q10_projection_markup": """
        SELECT p_partkey, p_name, round(p_retailprice / p_size, 4) AS markup
        FROM part ORDER BY markup DESC, p_partkey LIMIT 100
    """,
    "q11_selection": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal >= 1000 AND c_acctbal < 5000 AND c_mktsegment = 'HOUSEHOLD'
    """,
    "q12_slice_page": """
        SELECT c_custkey, c_name FROM customer
        ORDER BY c_custkey LIMIT 50 OFFSET 100
    """,
    "q13_string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS up,
               lower(p_brand) AS lo,
               CAST(length(p_name) AS INT) AS ln,
               CAST(strpos(p_name, 'old') - 1 AS BIGINT) AS idx,
               contains(p_name, 'cold') AS has,
               substr(p_name, 1, 4) AS sliced,
               p_brand || ':' || p_type AS cat
        FROM part
    """,
    "q14_date_parts": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               CAST(day(o_orderdate) AS INT) AS d,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               CAST(weekofyear(o_orderdate) AS INT) AS woy
        FROM orders
    """,
    "q15_case_when": """
        SELECT c_custkey,
               CASE WHEN c_acctbal > 5000 THEN 'rich' ELSE c_mktsegment END AS label,
               c_mktsegment AS seg
        FROM customer
    """,
    "q16_casts": """
        SELECT l_orderkey, l_linenumber,
               CAST(floor(l_quantity) AS BIGINT) AS qty_int,
               CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) AS qty_str,
               CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR)::BIGINT AS back,
               floor(l_extendedprice / l_quantity * 10000 + 0.5) / 10000 AS fdiv,
               CAST(floor(l_orderkey / 7) AS BIGINT) AS idiv
        FROM lineitem
    """,
    "q17_leftjoin": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "q18_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    "q19_anti_join": """
        SELECT c_custkey FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q20_theta_join": """
        SELECT a.n_regionkey AS region, a.n_name AS n1, b.n_name AS n2
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
    """,
    "q21_zipjoin": """
        WITH a AS (SELECT r_name, row_number() OVER (ORDER BY r_name) AS i FROM region),
             b AS (SELECT r_regionkey, row_number() OVER (ORDER BY r_regionkey DESC) AS i FROM region)
        SELECT a.r_name AS name_asc, b.r_regionkey AS key_desc
        FROM a JOIN b ON a.i = b.i
    """,
    "q22_cross_join": """
        SELECT r_name, seg FROM region
        CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    """,
    "q23_set_ops": """
        WITH cn AS (SELECT CAST(c_nationkey AS INT) AS key FROM customer),
             sn AS (SELECT CAST(s_nationkey AS INT) AS skey FROM supplier)
        SELECT key, 'both' AS tag FROM (SELECT key FROM cn INTERSECT SELECT skey FROM sn)
        UNION ALL
        SELECT key, 'cust_only' AS tag FROM (SELECT key FROM cn EXCEPT SELECT skey FROM sn)
        UNION ALL
        SELECT key, 'any' AS tag FROM (SELECT key FROM cn UNION SELECT skey FROM sn)
    """,
    "q24_union_all": """
        SELECT o_orderkey FROM orders WHERE o_totalprice > 350000
        UNION ALL
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "q25_window_rank": """
        SELECT c_custkey, c_nationkey, c_acctbal, rn FROM (
          SELECT c_custkey, c_nationkey, c_acctbal,
                 CAST(row_number() OVER (PARTITION BY c_nationkey
                      ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
          FROM customer) WHERE rn <= 3
    """,
    "q26_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running,
               round(coalesce(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey), 0.0), 2) AS prev
        FROM orders WHERE o_custkey < 100
    """,
    "q27_enum": """
        SELECT CAST(row_number() OVER (ORDER BY n_name) - 1 AS INT) AS index, n_name
        FROM nation
    """,
    "q28_range": """
        SELECT item % 7 AS bucket, count(*) AS n,
               CAST(sum(item) AS BIGINT) AS total
        FROM (SELECT CAST(range AS BIGINT) AS item FROM range(0, 1000))
        GROUP BY bucket
    """,
    "q29_map_range": """
        SELECT r_name, CAST(unnest(range(0, r_regionkey + 1)) AS INT) AS i
        FROM region
    """,
    "q30_rollup": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q31_pivot": """
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS "O",
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS "F"
        FROM lineitem GROUP BY l_returnflag
    """,
    "q32_dedup_exact": r"""
        WITH fp AS (SELECT doc_id,
                           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
                    FROM documents),
             w AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f)
        SELECT d.doc_id, d.source FROM documents d JOIN w USING (doc_id)
    """,
    "q33_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
               ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp64
        FROM documents
    """,
    "q34_token_stats": r"""
        SELECT source,
               CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS total_tokens,
               floor(avg(len(string_split_regex(trim(text), '\s+'))) * 10000 + 0.5) / 10000 AS avg_tokens,
               count(*) AS n_docs
        FROM documents GROUP BY source
    """,
    "q35_lang_id": r"""
        WITH t AS (SELECT doc_id, text,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        s AS (SELECT doc_id, text,
              len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
              len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
              len(list_filter(toks, x -> list_contains(['el','la','que','y','en','un','es','los','por','como'], x))) AS s_es,
              len(list_filter(toks, x -> list_contains(['le','les','et','des','une','est','dans','pour','au','sur'], x))) AS s_fr
              FROM t)
        SELECT doc_id,
               CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) > 0 THEN 'zh'
                    WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
                    WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
                    WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS pred
        FROM s
    """,
    "q36_quality": r"""
        WITH t AS (SELECT doc_id, text,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents)
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               floor(length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(toks) * 10000 + 0.5) / 10000 AS avg_token_len,
               floor(len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) * 1.0 / len(toks) * 10000 + 0.5) / 10000 AS stopword_ratio,
               floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) * 10000 + 0.5) / 10000 AS alpha_ratio
        FROM t
    """,
    "q37_minhash_signature": r"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        hb AS (SELECT doc_id,
                      ('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647 AS h
               FROM sh)
        SELECT doc_id,
               min((h * 506952114 + 17) % 2147483647) AS h0,
               min((h * 1013904228 + 40520) % 2147483647) AS h1,
               min((h * 1520856342 + 81023) % 2147483647) AS h2,
               min((h * 2027808456 + 121526) % 2147483647) AS h3
        FROM hb GROUP BY doc_id
    """,
    "q38_neardup_minhash": r"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        jac AS (SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS j
                FROM inter
                JOIN sizes sa ON id_a = sa.doc_id
                JOIN sizes sb ON id_b = sb.doc_id)
        SELECT id_a, id_b, floor(j * 10000 + 0.5) / 10000 AS jaccard
        FROM jac WHERE j >= 0.9
    """,
    "q39_simhash_pairs": r"""
        WITH tok AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tk
                     FROM documents),
        th AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS h FROM tok),
        bits AS (SELECT doc_id, CAST(b AS INT) AS b,
                        sum(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS v
                 FROM th, UNNEST(range(0, 60)) AS r(b) GROUP BY doc_id, b),
        sig AS (SELECT doc_id,
                       CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS s
                FROM bits GROUP BY doc_id)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.s, b.s)) AS INT) AS distance
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.s, b.s)) <= 3
    """,
    "q40_cosine_topk": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT query_id, neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT query_id, neighbor_id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS INT) AS rank, sim
              FROM s)
        SELECT query_id, neighbor_id, rank,
               floor(sim * 10000 + 0.5) / 10000 AS sim
        FROM r WHERE rank <= 5
    """,
    # brute mirror of the LSH contract: hyperplane signatures (same
    # portable-hash plane components as similarity._plane_component),
    # hamming gate <= 7, exact cosine >= 0.45 over ALL pairs — the
    # banded Spark plan must return exactly this set (pigeonhole)
    "q41_embedding_neardup": """
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        comp AS (
          SELECT p, d,
                 (('0x' || substr(md5('plane:' || p || ':' || d), 1, 15))::BIGINT
                  % 2001 - 1000) / 1000.0 AS c
          FROM range(0, 16) r1(p), range(0, 64) r2(d)
        ),
        planes AS (SELECT p, list(c ORDER BY d) AS plane FROM comp GROUP BY p),
        proj AS (
          SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.plane) AS pr
          FROM emb e CROSS JOIN planes pl
        ),
        sigs AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN pr > 0 THEN (1::BIGINT << p)
                               ELSE 0 END) AS BIGINT) AS sig
          FROM proj GROUP BY vec_id
        ),
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 7
        ),
        s AS (
          SELECT c.id_a, c.id_b, c.hamming,
                 list_dot_product(ea.v, eb.v)
                 / (sqrt(list_dot_product(ea.v, ea.v))
                    * sqrt(list_dot_product(eb.v, eb.v))) AS sim
          FROM cand c JOIN emb ea ON c.id_a = ea.vec_id
                      JOIN emb eb ON c.id_b = eb.vec_id
        )
        SELECT id_a, id_b, hamming,
               floor(sim * 10000 + 0.5) / 10000 AS sim
        FROM s WHERE sim >= 0.45
    """,
    "q42_bfs": """
        WITH RECURSIVE e AS (SELECT DISTINCT o_custkey % 97 AS src,
                                             o_orderkey % 97 AS dst FROM orders),
        r(node) AS (SELECT CAST(0 AS BIGINT)
                    UNION
                    SELECT e.dst FROM r JOIN e ON r.node = e.src)
        SELECT node FROM r
    """,
    "q43_walk_tree": """
        WITH RECURSIVE e AS (SELECT CAST(n_nationkey AS BIGINT) AS src,
                                    CAST((n_nationkey * 2 + 1) % 25 AS BIGINT) AS dst
                             FROM nation),
        w(node, rank) AS (SELECT CAST(0 AS BIGINT), 0
                          UNION ALL
                          SELECT e.dst, w.rank + 1
                          FROM w JOIN e ON w.node = e.src WHERE w.rank < 4)
        SELECT node, CAST(rank AS INT) AS rank FROM w
    """,
    "q44_sessionize": """
        WITH g AS (SELECT user_id, event_id, ts,
                          CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(lag(ts) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap
                   FROM events),
        s AS (SELECT user_id, event_id,
                     CAST(sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
              FROM g)
        SELECT user_id, session_idx, count(*) AS n_events,
               min(event_id) AS first_event
        FROM s GROUP BY user_id, session_idx
    """,
    "q45_tumbling_window": """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket,
               event_type, count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    """,
    "q46_asof_join": """
        WITH l AS (SELECT user_id, ts, event_id FROM events
                   WHERE event_type IN ('view', 'click')),
             r AS (SELECT user_id, ts, event_id AS error_id FROM events
                   WHERE event_type = 'error')
        SELECT l.event_id, r.error_id
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "q47_multimodal_features": """
        WITH h AS (SELECT doc_id, md5(text) AS m FROM documents),
        p AS (SELECT doc_id, m,
                     ('0x' || substr(m, 9, 8))::BIGINT AS hi,
                     ('0x' || substr(m, 17, 8))::BIGINT AS lo
              FROM h)
        SELECT doc_id,
               CAST(64 + ('0x' || substr(m, 1, 2))::INT % 192 AS INT)
                   AS width,
               CAST(64 + ('0x' || substr(m, 3, 2))::INT % 192 AS INT)
                   AS height,
               ('0x' || substr(m, 5, 2))::INT / 255.0 AS mean_luma,
               CASE WHEN hi >= 2147483648
                    THEN (hi - 4294967296) * 4294967296 + lo
                    ELSE hi * 4294967296 + lo END AS phash
        FROM p
    """,
    "q48_stream_tumbling": """
        SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket,
               event_type, count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    """,
    "q49_struct_join_access": """
        SELECT n_name AS nation, r_name AS region,
               n_nationkey + r_regionkey AS key_sum
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "q50_in_list": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
    "q51_char_funcs": """
        SELECT n_nationkey,
               CAST(ascii(substr(n_name, 1, 1)) AS INT) AS first_ord,
               chr(ascii(substr(n_name, 1, 1))) AS chr_back,
               repeat(substr(n_name, 1, 2), 3) AS rep
        FROM nation
    """,
    "q52_window_battery": """
        SELECT o_custkey, o_orderkey,
               CAST(rank() OVER w AS INT) AS rnk,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               coalesce(lag(o_orderkey, 1) OVER w, -1) AS prev_key,
               coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
               CAST(ntile(4) OVER w AS INT) AS quartile
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q53_cube": """
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q54_fmt_interpolation": """
        SELECT c_custkey,
               'customer ' || c_name || ' in segment ' || c_mktsegment AS msg
        FROM customer
    """,
    "q55_lang_pipeline": """
        SELECT c_mktsegment, count(*) AS n,
               round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS total
        FROM customer WHERE c_acctbal > 5000
        GROUP BY c_mktsegment ORDER BY total DESC
    """,
    "q56_lang_join": """
        SELECT n_name AS nation, r_name AS region
        FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    "q57_describe_stats": """
        SELECT 'c_acctbal' AS col_name, count(c_acctbal) AS n,
               floor(avg(c_acctbal) * 10000 + 0.5) / 10000 AS mean,
               floor(stddev_samp(c_acctbal) * 10000 + 0.5) / 10000 AS sd,
               CAST(min(c_acctbal) AS DOUBLE) AS lo,
               CAST(max(c_acctbal) AS DOUBLE) AS hi
        FROM customer
        UNION ALL
        SELECT 'c_nationkey', count(c_nationkey),
               floor(avg(c_nationkey) * 10000 + 0.5) / 10000,
               floor(stddev_samp(c_nationkey) * 10000 + 0.5) / 10000,
               CAST(min(c_nationkey) AS DOUBLE),
               CAST(max(c_nationkey) AS DOUBLE)
        FROM customer
    """,
    "q58_sample_hash": """
        SELECT doc_id, source
        FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < 250000
    """,
    "q59_first_last_by": """
        SELECT c_nationkey,
               arg_min(c_name, c_custkey) AS first_name,
               arg_max(c_name, c_custkey) AS last_name
        FROM customer GROUP BY c_nationkey
    """,
    "q60_dml_lifecycle": """
        SELECT n_nationkey,
               CASE WHEN n_nationkey = 1 THEN 'NATION_1_M'
                    WHEN n_regionkey = 0 THEN n_name || '_AF'
                    ELSE n_name END AS n_name,
               n_regionkey
        FROM nation WHERE n_regionkey <> 4
        UNION ALL
        SELECT 900, 'ATLANTIS', 0
        UNION ALL
        SELECT 901, 'LEMURIA', NULL
    """,
    "q61_lang_user_func": """
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem WHERE l_quantity < 10
        GROUP BY l_returnflag
    """,
    "q62_json_extract": """
        SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events
    """,
    "q63_stream_sliding": """
        SELECT CAST(epoch(ws) AS BIGINT) AS bucket, event_type,
               count(*) AS n, round(sum(value), 2) AS total
        FROM (
            SELECT time_bucket(INTERVAL '1 hour', ts)
                     - (i * INTERVAL '1 hour') AS ws,
                   event_type, value, ts
            FROM events, (SELECT unnest([0, 1]) AS i) shifts
        ) sub
        WHERE ts >= ws AND ts < ws + INTERVAL '2 hours'
        GROUP BY 1, 2
    """,
    "q64_tfidf_top_terms": """
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 100),
        toks AS (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
            FROM docs
        ),
        toks2 AS (SELECT * FROM toks WHERE token <> ''),
        doc_term AS (
            SELECT doc_id, token, count(*) AS n FROM toks2 GROUP BY 1, 2
        ),
        doc_len AS (SELECT doc_id, count(*) AS len FROM toks2 GROUP BY 1),
        dfreq AS (SELECT token, count(*) AS df FROM doc_term GROUP BY 1),
        n_docs AS (SELECT count(*) AS n FROM docs),
        scored AS (
            SELECT dt.doc_id, dt.token,
                   (dt.n * 1.0 / dl.len) * ln(nd.n * 1.0 / f.df) AS tfidf
            FROM doc_term dt
            JOIN dfreq f USING (token)
            JOIN doc_len dl USING (doc_id)
            CROSS JOIN n_docs nd
        ),
        ranked AS (
            SELECT doc_id, token,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY tfidf DESC, token) AS rnk,
                   tfidf
            FROM scored
        )
        SELECT doc_id, token, rnk,
               floor(tfidf * 10000 + 0.5) / 10000 AS tfidf
        FROM ranked WHERE rnk <= 3
    """,
    "q65_sample_stratified": """
        SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 <
              CASE WHEN source = 'src1' THEN 1000000
                   WHEN source = 'src0' THEN 300000
                   ELSE 0 END
    """,
    "q66_zipjoin_longest": """
        WITH ra AS (SELECT r_name,
                           row_number() OVER (ORDER BY r_regionkey) - 1 AS zi,
                           r_regionkey
                    FROM region),
             nb AS (SELECT n_name,
                           row_number() OVER (ORDER BY n_nationkey) - 1 AS zi,
                           n_nationkey
                    FROM nation)
        SELECT COALESCE(nb.n_nationkey, ra.r_regionkey) AS idx,
               ra.r_name, nb.n_name
        FROM ra FULL OUTER JOIN nb USING (zi)
    """,
    "q67_stream_session": """
        WITH g AS (SELECT user_id, event_id, ts,
                          epoch(ts) - epoch(lag(ts) OVER
                              (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
                   FROM events),
        s AS (SELECT user_id, event_id, ts,
                     CAST(sum(CASE WHEN gap IS NULL OR gap >= 1800 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
              FROM g)
        SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
               user_id, count(*) AS n_events, min(event_id) AS first_event
        FROM s GROUP BY user_id, sid
    """,
    "q68_lang_theta_join": """
        SELECT a.n_name AS x, b.n_name AS y
        FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
    "q69_collect_explode_roundtrip": """
        SELECT n_regionkey, n_name FROM nation
    """,
    "q70_unpivot": """
        SELECT l_orderkey, l_linenumber, 'qty' AS variable,
               CAST(l_quantity AS DOUBLE) AS value
        FROM lineitem WHERE l_orderkey < 200
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc', CAST(l_discount AS DOUBLE)
        FROM lineitem WHERE l_orderkey < 200
    """,
    "q71_histogram": """
        WITH b AS (
            SELECT CAST(least(greatest(
                       floor((c_acctbal - (-1000.0)) / 1000.0), 0), 10) AS INT)
                   AS bucket
            FROM customer WHERE c_acctbal IS NOT NULL
        )
        SELECT bucket, count(*) AS n,
               floor((-1000.0 + bucket * 1000.0) * 10000 + 0.5) / 10000 AS lo,
               floor((-1000.0 + (bucket + 1) * 1000.0) * 10000 + 0.5) / 10000 AS hi
        FROM b GROUP BY bucket
    """,
    "q72_corr": """
        SELECT l_returnflag,
               floor(corr(l_quantity, l_extendedprice) * 10000 + 0.5) / 10000 AS c,
               floor(covar_samp(l_discount, l_tax) * 10000 + 0.5) / 10000 AS cv
        FROM lineitem GROUP BY l_returnflag
    """,
    "q73_dedup_canonical": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM inter
                  JOIN sizes sa ON id_a = sa.doc_id
                  JOIN sizes sb ON id_b = sb.doc_id
                  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT node FROM comp WHERE component != node)
    """,
    # the identical (group, key) weight agg + sorted-key HHI fold
    "q208_source_concentration": """
        WITH per AS (SELECT lang, source,
                            CAST(sum(n_chars) AS BIGINT) AS w
                     FROM documents GROUP BY lang, source),
        tot AS (SELECT lang, CAST(sum(w) AS BIGINT) AS total
                FROM per GROUP BY lang),
        g AS (SELECT p.lang,
                     CAST(count(*) AS BIGINT) AS n_keys,
                     t.total,
                     CAST(max(w) AS BIGINT) AS top,
                     list_reduce(
                       list((CAST(w AS DOUBLE) / t.total)
                            * (CAST(w AS DOUBLE) / t.total)
                            ORDER BY p.source),
                       (a, b) -> a + b) AS hhi
              FROM per p JOIN tot t ON p.lang = t.lang
              GROUP BY p.lang, t.total)
        SELECT lang, n_keys, total,
               floor(hhi * 10000 + 0.5) / 10000 AS hhi,
               floor(CAST(top AS DOUBLE) / total * 10000 + 0.5)
                 / 10000 AS top_share
        FROM g
    """,
    # the identical bounded-frame rolling window; z rounded 4dp on
    # both engines (stddev impls agree to ~1 ulp), the anomaly flag
    # computed on the UNROUNDED z under the same n/sigma gate
    "q207_rolling_anomalies": """
        WITH w AS (SELECT event_id, event_type,
                          CAST(value AS DOUBLE) AS v,
                          avg(CAST(value AS DOUBLE)) OVER win AS mu,
                          stddev_samp(CAST(value AS DOUBLE))
                            OVER win AS sigma,
                          count(value) OVER win AS n
                   FROM events
                   WINDOW win AS (PARTITION BY event_type
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 50 PRECEDING
                                           AND 1 PRECEDING))
        SELECT event_id, event_type,
               CASE WHEN n >= 5 AND sigma > 0 THEN
                 floor((v - mu) / sigma * 10000 + 0.5) / 10000
               END AS z,
               CASE WHEN n >= 5 AND sigma > 0 THEN
                 abs((v - mu) / sigma) > 2.5
               ELSE FALSE END AS is_anomaly
        FROM w
    """,
    # the identical non-null-only quantile window: NULLS FIRST rank
    # minus the null count, integers through one exact division
    "q206_quantile_normalize": """
        WITH e AS (SELECT event_id, event_type,
                          CASE WHEN event_id % 97 <> 0 THEN
                            CAST(floor(CAST(value AS DOUBLE) * 100
                                       + 0.5) AS BIGINT)
                          END AS cents
                   FROM events),
        w AS (SELECT event_id, event_type, cents,
                     rank() OVER (PARTITION BY event_type
                                  ORDER BY cents ASC NULLS FIRST) AS r,
                     count(*) OVER (PARTITION BY event_type) AS n,
                     count(CASE WHEN cents IS NULL THEN 1 END)
                       OVER (PARTITION BY event_type) AS nnull
              FROM e)
        SELECT event_id, event_type,
               CASE WHEN cents IS NOT NULL THEN
                 CASE WHEN n - nnull > 1 THEN
                   CAST(r - nnull - 1 AS DOUBLE) / (n - nnull - 1)
                 ELSE 0.0 END
               END AS qn
        FROM w
    """,
    # the identical quasi-key count window, replayed in SQL
    "q205_k_anonymity": """
        WITH e AS (SELECT event_id, event_type,
                          CAST(floor(CAST(value AS DOUBLE) * 100
                                     + 0.5) AS BIGINT) // 2000 AS vb
                   FROM events),
        c AS (SELECT event_id, event_type, vb,
                     count(*) OVER (PARTITION BY event_type, vb)
                       AS kn
              FROM e)
        SELECT event_id, event_type, vb FROM c WHERE kn >= 10
    """,
    # the identical canonicalization regex chain in RE2 (DuckDB
    # backrefs are \1 where Spark/Java spells $1 — same semantics)
    "q204_canonicalize_url": r"""
        WITH d AS (SELECT doc_id,
                          'HTTPS://Example.COM:443/p/' || doc_id
                            || '/' AS b
                   FROM documents),
        raw AS (SELECT doc_id,
                       b || '?utm_source=a&ref=1#top' AS v1,
                       b || '?ref=1&utm_campaign=b' AS v2
                FROM d),
        canon AS (SELECT doc_id,
          regexp_replace(
            CASE WHEN a1 = '' THEN c1 ELSE a1 || r1 END,
            '(/[^?]*?)/+(\?|$)', '\1\2', 'g') AS c1,
          regexp_replace(
            CASE WHEN a2 = '' THEN c2 ELSE a2 || r2 END,
            '(/[^?]*?)/+(\?|$)', '\1\2', 'g') AS c2
          FROM (SELECT doc_id, c1, c2,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(c1,
                     '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
                   '^(http://[^:]*):80$', '\1', 'g'),
                   '^(https://[^:]*):443$', '\1', 'g') AS a1,
                 regexp_extract(c1,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
                   AS r1,
                 regexp_replace(regexp_replace(
                   lower(regexp_extract(c2,
                     '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
                   '^(http://[^:]*):80$', '\1', 'g'),
                   '^(https://[^:]*):443$', '\1', 'g') AS a2,
                 regexp_extract(c2,
                   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
                   AS r2
                FROM (SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(
                         regexp_replace(regexp_replace(v1,
                           '#.*$', '', 'g'),
                           '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*',
                           '\1', 'g'),
                         '\?&+', '?', 'g'), '&&+', '&', 'g'),
                         '[?&]+$', '', 'g') AS c1,
                       regexp_replace(regexp_replace(regexp_replace(
                         regexp_replace(regexp_replace(v2,
                           '#.*$', '', 'g'),
                           '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*',
                           '\1', 'g'),
                         '\?&+', '?', 'g'), '&&+', '&', 'g'),
                         '[?&]+$', '', 'g') AS c2
                      FROM raw)))
        SELECT doc_id, c1, c2, c1 = c2 AS collapsed FROM canon
    """,
    # q73's recursive-CTE clusters + the cluster-partitioned
    # keep-longest window (desc length, doc_id tie-break)
    "q203_dedup_keep_best": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM inter
                  JOIN sizes sa ON id_a = sa.doc_id
                  JOIN sizes sb ON id_b = sb.doc_id
                  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node),
        keyed AS (SELECT d.doc_id,
                         coalesce(c.component, d.doc_id) AS comp,
                         length(d.text) AS ln
                  FROM documents d
                  LEFT JOIN comp c ON d.doc_id = c.node),
        rr AS (SELECT doc_id,
                      row_number() OVER (PARTITION BY comp
                                         ORDER BY ln DESC, doc_id)
                        AS rn
               FROM keyed)
        SELECT doc_id FROM rr WHERE rn = 1
    """,
    # min-ordinal-per-unit: the order-explicit spelling of Spark's
    # (first-occurrence-preserving) array_distinct
    "q211_strip_repeated_units": """
        WITH d AS (SELECT doc_id,
                          text || chr(10) || substr(text, 1, 30)
                            || chr(10) || substr(text, 1, 30)
                            || chr(10) || text AS s
                   FROM documents),
        u AS (SELECT doc_id,
                     unnest(string_split(s, chr(10))) AS u,
                     generate_subscripts(
                       string_split(s, chr(10)), 1) AS i,
                     len(string_split(s, chr(10))) AS n_units
              FROM d),
        f AS (SELECT doc_id, u, min(i) AS mi, min(n_units) AS n_units
              FROM u GROUP BY doc_id, u)
        SELECT doc_id,
               CAST(min(n_units) AS INT) AS n_units,
               CAST(count(*) AS INT) AS n_kept,
               string_agg(u, chr(10) ORDER BY mi) AS clean
        FROM f GROUP BY doc_id
    """,
    # q73's recursive-CTE clusters over brute exact Jaccard, counted
    # per component then per size
    "q212_cluster_size_histogram": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        prs AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON id_a = sa.doc_id
                JOIN sizes sb ON id_b = sb.doc_id
                WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
        sym AS (SELECT id_a AS a, id_b AS b FROM prs
                UNION ALL SELECT id_b, id_a FROM prs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node),
        cs AS (SELECT component, count(*) AS cluster_size
               FROM comp GROUP BY component)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        FROM cs GROUP BY cluster_size
    """,
    # the end-to-end curation replay: q204's RE2 canonicalization
    # chain, min-seq URL dedup, the q201 fold chain (composed from
    # the engine's fold tables), q73's recursive-CTE clusters over
    # brute-force exact Jaccard on the NORMALIZED text, the q203
    # keep-best window, q200's md5-bucket split, q208's sorted fold
    "q209_curation_pipeline": rf"""
        WITH RECURSIVE
        raw AS (SELECT doc_id,
                       CASE doc_id % 3
                         WHEN 0 THEN upper(text)
                         WHEN 1 THEN text || ' !!'
                         ELSE text END AS dirty
                FROM documents),
        crawl AS (SELECT doc_id, 1 AS seq,
                         'HTTP://H' || (doc_id % 7)
                           || '.Example.COM:80/p/' || doc_id
                           || '/?utm_source=x&ref=' || doc_id
                           || '#f' AS url, dirty
                  FROM raw
                  UNION ALL
                  SELECT doc_id, 2,
                         'http://h' || (doc_id % 7)
                           || '.example.com/p/' || doc_id
                           || '?ref=' || doc_id, dirty
                  FROM raw),
        s1 AS (SELECT doc_id, seq, dirty,
                      regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(regexp_replace(url,
                          '#.*$', '', 'g'),
                          '([?&])(utm_[A-Za-z0-9_]+|fbclid|gclid)=[^&#]*',
                          '\1', 'g'),
                        '\?&+', '?', 'g'), '&&+', '&', 'g'),
                        '[?&]+$', '', 'g') AS c
               FROM crawl),
        s2 AS (SELECT doc_id, seq, dirty, c,
                      regexp_replace(regexp_replace(
                        lower(regexp_extract(c,
                          '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
                        '^(http://[^:]*):80$', '\1', 'g'),
                        '^(https://[^:]*):443$', '\1', 'g') AS a,
                      regexp_extract(c,
                        '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)
                        AS r
               FROM s1),
        canon AS (SELECT doc_id, seq, dirty,
                         regexp_replace(
                           CASE WHEN a = '' THEN c ELSE a || r END,
                           '(/[^?]*?)/+(\?|$)', '\1\2', 'g') AS curl
                  FROM s2),
        page AS (SELECT doc_id, dirty, curl FROM (
                   SELECT *, row_number() OVER (PARTITION BY curl
                                                ORDER BY seq) AS rn
                   FROM canon) WHERE rn = 1),
        hosted AS (SELECT doc_id, dirty,
                          lower(regexp_extract(curl,
                            '^(?:[a-zA-Z][\w+.-]*:)?(?://)?([^/:?#]+)',
                            1)) AS host,
                          trim(regexp_replace(regexpreplace_FOLD,
                               '{_ws_sql()}+', ' ', 'g')) AS ntext
                   FROM (SELECT doc_id, dirty, curl,
                           regexp_replace(
                             {_accent_fold_sql('lower(dirty)')},
                             '[\p{{P}}]', ' ', 'g')
                             AS regexpreplace_FOLD
                         FROM page)),
        t AS (SELECT doc_id,
                     string_split_regex(trim(ntext), '\s+') AS toks
              FROM hosted),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ')
                        AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2)))
                       AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh
                  GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         count(*) AS i
                  FROM sh a JOIN sh b
                    ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        prs AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON id_a = sa.doc_id
                JOIN sizes sb ON id_b = sb.doc_id
                WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
        sym AS (SELECT id_a AS a, id_b AS b FROM prs
                UNION ALL SELECT id_b, id_a FROM prs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node),
        keyed AS (SELECT h.doc_id, h.dirty, h.host,
                         coalesce(c.component, h.doc_id) AS comp
                  FROM hosted h
                  LEFT JOIN comp c ON h.doc_id = c.node),
        rr AS (SELECT *, row_number() OVER (
                 PARTITION BY comp
                 ORDER BY length(dirty) DESC, doc_id) AS rn
               FROM keyed),
        kept AS (SELECT doc_id, dirty, host, comp FROM rr
                 WHERE rn = 1),
        lbl AS (SELECT *,
                       ('0x' || substr(md5(CAST(comp AS VARCHAR)),
                                       1, 15))::BIGINT
                         % 1000000 AS bucket
                FROM kept),
        sp AS (SELECT host, length(dirty) AS w0,
                      CASE WHEN bucket < 800000 THEN 'train'
                           WHEN bucket < 900000 THEN 'valid'
                           ELSE 'test' END AS split
               FROM lbl),
        per AS (SELECT split, host, CAST(sum(w0) AS BIGINT) AS w
                FROM sp GROUP BY split, host),
        tot AS (SELECT split, CAST(sum(w) AS BIGINT) AS total
                FROM per GROUP BY split),
        g AS (SELECT p.split, CAST(count(*) AS BIGINT) AS n_keys,
                     t2.total, CAST(max(w) AS BIGINT) AS top,
                     list_reduce(
                       list((CAST(w AS DOUBLE) / t2.total)
                            * (CAST(w AS DOUBLE) / t2.total)
                            ORDER BY p.host),
                       (x, y) -> x + y) AS hhi
              FROM per p JOIN tot t2 ON p.split = t2.split
              GROUP BY p.split, t2.total)
        SELECT split, n_keys, total,
               floor(hhi * 10000 + 0.5) / 10000 AS hhi,
               floor(CAST(top AS DOUBLE) / total * 10000 + 0.5)
                 / 10000 AS top_share
        FROM g
    """,
    # q73's recursive-CTE clusters + q74's md5 hash-split spelling:
    # the split key is the cluster canonical (min member id) when the
    # doc is in one, else its own id
    "q200_leakage_safe_split": r"""
        WITH RECURSIVE
        t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
              FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b FROM inter
                  JOIN sizes sa ON id_a = sa.doc_id
                  JOIN sizes sb ON id_b = sb.doc_id
                  WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.9),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node),
        keyed AS (SELECT d.doc_id,
                         CAST(coalesce(c.component, d.doc_id)
                              AS VARCHAR) AS k
                  FROM documents d
                  LEFT JOIN comp c ON d.doc_id = c.node),
        b AS (SELECT doc_id,
                     ('0x' || substr(md5(k), 1, 15))::BIGINT
                       % 1000000 AS bucket
              FROM keyed)
        SELECT doc_id,
               CASE WHEN bucket < 800000 THEN 'train'
                    WHEN bucket < 900000 THEN 'valid'
                    ELSE 'test' END AS split
        FROM b
    """,
    "q74_split_by_hash": """
        WITH b AS (
            SELECT source,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 1000000 AS bucket
            FROM documents
        )
        SELECT source,
               CASE WHEN bucket < 800000 THEN 'train'
                    WHEN bucket < 900000 THEN 'valid'
                    ELSE 'test' END AS split,
               count(*) AS n
        FROM b GROUP BY 1, 2
    """,
    "q75_pack_sequences": r"""
        WITH t AS (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 16 AS bucket,
                   len(string_split_regex(trim(text), '\s+')) AS n_tokens
            FROM documents
        )
        SELECT doc_id, bucket, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY bucket
                                               ORDER BY doc_id)
                           - n_tokens) / 512.0) AS BIGINT) AS pack
        FROM t
    """,
    "q76_chunk_tokens": r"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks, CAST(i AS INT) AS start
              FROM t, UNNEST(range(1, greatest(len(toks) - 16, 1) + 1, 48))
                      AS r(i))
        SELECT doc_id,
               CAST((start - 1) / 48 AS INT) AS chunk_id,
               CAST(len(list_slice(toks, start, start + 63)) AS INT)
                   AS n_tokens,
               array_to_string(list_slice(toks, start, start + 63), ' ')
                   AS chunk_text
        FROM s
    """,
    "q77_quantile_filter": r"""
        WITH base AS (SELECT doc_id, source,
                             CAST(len(string_split_regex(trim(text), '\s+'))
                                  AS INT) AS n_tokens
                      FROM documents),
        thr AS (SELECT source, quantile_cont(n_tokens, 0.25) AS t
                FROM base GROUP BY source)
        SELECT b.doc_id, b.source, b.n_tokens
        FROM base b JOIN thr ON b.source = thr.source
        WHERE b.n_tokens >= thr.t
    """,
    "q78_interval_join": """
        WITH iv AS (
            SELECT CAST(i AS BIGINT) AS window_id,
                   TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL (CAST(i AS INT) * 2) DAY AS s,
                   TIMESTAMP '2024-01-01 00:00:00'
                       + INTERVAL (CAST(i AS INT) * 2) DAY
                       + INTERVAL 6 HOUR AS e
            FROM range(15) AS r(i)
        )
        SELECT window_id, count(*) AS n_events
        FROM events JOIN iv ON ts >= s AND ts < e
        GROUP BY window_id
    """,
    "q79_stream_stream_join": """
        SELECT l.user_id, count(*) AS n_pairs
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND r.ts >= l.ts - INTERVAL 2 MINUTE
         AND r.ts <= l.ts + INTERVAL 2 MINUTE
        GROUP BY l.user_id
    """,
    "q80_centroid_agg": """
        WITH ex AS (
            SELECT vec_id % 8 AS grp,
                   generate_subscripts(embedding, 1) AS p,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        )
        SELECT grp, p - 1 AS dim,
               floor(avg(x) * 10000 + 0.5) / 10000 AS val
        FROM ex GROUP BY grp, p
    """,
    "q81_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    # the identical lower -> replace(multi folds) -> translate(accent
    # fold) -> \p{P} strip -> \s+ collapse chain, spelled in DuckDB;
    # the fold chain is COMPOSED from the engine's own tables so the
    # two spellings cannot drift
    "q201_normalize_text": rf"""
        WITH dirty AS (
            SELECT doc_id,
                   upper(substr(text, 1, 24))
                     || '{_Q201_DIRT}' || text AS s
            FROM documents)
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                    {_accent_fold_sql('lower(s)')},
                    '[\p{{P}}]', ' ', 'g'),
                    '{_ws_sql()}+', ' ', 'g')) AS norm
        FROM dirty
    """,
    "q82_redact_pii": r"""
        WITH dirty AS (
            SELECT doc_id,
                   text || ' contact u' || doc_id
                        || '@example.com or +1 (555) 010-' || doc_id
                        || ' at 10.0.0.' || (doc_id % 255) AS s
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(s,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                     '<EMAIL>', 'g'),
                   '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                 '<IPV4>', 'g') AS clean
        FROM dirty
    """,
    "q83_strip_short_lines": r"""
        WITH lined AS (
            SELECT doc_id, replace(text, '.', chr(10)) AS s
            FROM documents
        )
        SELECT doc_id,
               array_to_string(
                 list_filter(string_split(s, chr(10)),
                   x -> len(string_split_regex(trim(x), '\s+')) >= 4),
                 chr(10)) AS clean
        FROM lined
    """,
    "q84_sample_weighted": """
        SELECT doc_id FROM (
            SELECT doc_id,
                   ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        ::BIGINT % 1099511627776) + 1) / 1099511627777.0)
                   / CAST(length(text) AS DOUBLE) AS s
            FROM documents
            ORDER BY s DESC LIMIT 50
        )
    """,
    "q85_lang_fmt": """
        SELECT c_custkey,
               'customer ' || c_name || ' in segment ' || c_mktsegment
                   AS msg
        FROM customer
    """,
    "q88_lang_dml_lifecycle": """
        SELECT n_nationkey,
               CASE WHEN n_regionkey = 0 THEN n_name || '_AF'
                    ELSE n_name END AS n_name,
               n_regionkey
        FROM nation WHERE n_regionkey <> 4
        UNION ALL
        SELECT 900, 'ATLANTIS', 0
        UNION ALL
        SELECT i, 'LOST_' || CAST(i AS VARCHAR), 0 FROM range(901, 904) t(i)
    """,
    "q89_sql_recursion": """
        WITH RECURSIVE h AS (
            SELECT CAST(r_regionkey AS INT) AS node,
                   CAST(-1 AS INT) AS parent, 0 AS lvl
            FROM region
            UNION ALL
            SELECT CAST(n.n_nationkey + 100 AS INT), h.node, h.lvl + 1
            FROM h JOIN nation n ON n.n_regionkey = h.node
            WHERE h.lvl = 0
        )
        SELECT node, parent, lvl FROM h
    """,
    "q90_lazy_param": """
        SELECT o_orderstatus, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders WHERE o_totalprice > 1000
        GROUP BY o_orderstatus
    """,
    "q91_join_by_column": """
        SELECT n_name AS nation, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q92_table_methods": """
        SELECT CAST(n_nationkey AS DOUBLE) AS size,
               CAST(n_nationkey AS DOUBLE) * CAST(n_nationkey AS DOUBLE)
                   AS a
        FROM nation
        WHERE CAST(n_nationkey AS DOUBLE) * CAST(n_nationkey AS DOUBLE)
              > 100.0
    """,
    "q93_fk_traversal": """
        SELECT o_orderkey, c_name AS cust, n_name AS nation
        FROM orders
        LEFT JOIN customer ON o_custkey = c_custkey
        LEFT JOIN nation ON c_nationkey = n_nationkey
        WHERE o_totalprice > 400000
    """,
    "q94_backref_agg": """
        SELECT n_name, COUNT(c_custkey) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q95_repetition_metrics": r"""
        WITH ln AS (
            SELECT doc_id, trim(l) AS l
            FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
                  FROM documents)
            WHERE trim(l) <> ''
        ),
        per_line AS (
            SELECT doc_id, l, count(*) AS c, min(length(l)) AS len
            FROM ln GROUP BY doc_id, l
        ),
        line_stats AS (
            SELECT doc_id, sum(c) AS n_lines, sum(c - 1) AS dup,
                   sum(c * len) AS chars, sum((c - 1) * len) AS dup_chars
            FROM per_line GROUP BY doc_id
        ),
        tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents
        ),
        bi AS (
            SELECT doc_id, array_to_string(list_slice(t, i, i + 1), ' ') AS g
            FROM tok, UNNEST(range(1, len(t))) AS r(i)
        ),
        per_gram AS (
            SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g
        ),
        gram_stats AS (
            SELECT doc_id, max(c) AS mx, sum(c) AS tot
            FROM per_gram GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(ls.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(floor(CASE WHEN coalesce(ls.n_lines, 0) > 0
                          THEN CAST(ls.dup AS DOUBLE) / ls.n_lines
                          ELSE 0.0 END
                     * 10000 + 0.5) AS BIGINT) AS dup_line_frac_e4,
               CAST(floor(CASE WHEN coalesce(ls.chars, 0) > 0
                          THEN CAST(ls.dup_chars AS DOUBLE) / ls.chars
                          ELSE 0.0 END
                     * 10000 + 0.5) AS BIGINT) AS dup_line_char_frac_e4,
               CAST(floor(CASE WHEN coalesce(gs.tot, 0) > 0
                          THEN CAST(gs.mx AS DOUBLE) / gs.tot
                          ELSE 0.0 END
                     * 10000 + 0.5) AS BIGINT) AS top_bigram_frac_e4
        FROM documents d
        LEFT JOIN line_stats ls ON d.doc_id = ls.doc_id
        LEFT JOIN gram_stats gs ON d.doc_id = gs.doc_id
    """,
    "q96_decontaminate": r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(list_slice(t, i, i + 7), ' ') AS s
            FROM tok, UNNEST(range(1, greatest(len(t) - 6, 2))) AS r(i)
        ),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 5 = 0),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 <> 0)
        SELECT DISTINCT tr.doc_id
        FROM tr JOIN ev ON tr.s = ev.s
    """,
    "q97_quantize_embeddings": r"""
        WITH a AS (
            SELECT vec_id, embedding,
                   list_max(list_transform(embedding, x -> abs(x))) AS am
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, embedding,
                   CASE WHEN am > 0 THEN 127.0 / CAST(am AS DOUBLE)
                        ELSE 0.0 END AS sc
            FROM a
        ),
        q AS (
            SELECT vec_id, sc,
                   CAST(floor(CAST(embedding[1] AS DOUBLE) * sc + 0.5) AS INT) AS q0,
                   CAST(floor(CAST(embedding[2] AS DOUBLE) * sc + 0.5) AS INT) AS q1,
                   CAST(floor(CAST(embedding[3] AS DOUBLE) * sc + 0.5) AS INT) AS q2,
                   CAST(floor(CAST(embedding[4] AS DOUBLE) * sc + 0.5) AS INT) AS q3,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
            FROM s
        ),
        n AS (
            SELECT vec_id, sc, q0, q1, q2, q3,
                   sqrt(list_sum(list_transform(ed, x -> x * x))) AS nrm,
                   ed
            FROM q
        )
        SELECT vec_id,
               floor(sc * 10000 + 0.5) / 10000 AS scale,
               q0, q1, q2, q3,
               floor(CASE WHEN nrm > 0
                          THEN sqrt(list_sum(list_transform(ed,
                                             x -> (x / nrm) * (x / nrm))))
                          ELSE 0.0 END
                     * 10000 + 0.5) / 10000 AS unit_norm
        FROM n
    """,
    "q98_bm25_top_terms": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents WHERE doc_id < 100
        ),
        dt AS (
            SELECT doc_id, token, count(*) AS c
            FROM tok WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (SELECT doc_id, sum(c) AS dl FROM dt GROUP BY doc_id),
        ndocs AS (SELECT count(*) * 1.0 AS n
                  FROM documents WHERE doc_id < 100),
        stats AS (SELECT avg(dl) AS avgdl FROM dl),
        dfq AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
        scored AS (
            SELECT dt.doc_id, dt.token,
                   ln((ndocs.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                   * (dt.c * (1.2 + 1))
                   / (dt.c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       AS s
            FROM dt
            JOIN dfq USING (token)
            JOIN dl USING (doc_id)
            CROSS JOIN ndocs CROSS JOIN stats
        ),
        r AS (
            SELECT doc_id, token, s,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY s DESC, token) AS rnk
            FROM scored
        )
        SELECT doc_id, token, rnk,
               floor(s * 10000 + 0.5) / 10000 AS bm25
        FROM r WHERE rnk <= 3
    """,
    "q99_lm_perplexity": r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents WHERE doc_id < 200
        ),
        bg AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM tok, UNNEST(range(1, len(t))) AS r(i)
        ),
        cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY w1),
        v AS (SELECT count(DISTINCT w) * 1.0 AS v
              FROM (SELECT w1 AS w FROM bg
                    UNION ALL SELECT w2 FROM bg)),
        lp AS (
            SELECT bg.doc_id,
                   ln((cb.cb + 0.4) / (cu.cu + 0.4 * v.v)) AS lp
            FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
            CROSS JOIN v
        ),
        pd AS (SELECT doc_id, count(*) AS n_bigrams,
                      avg(lp) AS avg_logp
               FROM lp GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(pd.n_bigrams, 0) AS n_bigrams,
               floor(pd.avg_logp * 10000 + 0.5) / 10000 AS avg_logp,
               floor(exp(-pd.avg_logp) * 10000 + 0.5) / 10000 AS ppl
        FROM (SELECT doc_id FROM documents WHERE doc_id < 200) d
        LEFT JOIN pd USING (doc_id)
    """,
    # Lloyd k-means, k=8, 2 centroid updates + final assignment —
    # chained CTEs replay the engine's iterations exactly: same
    # lowest-id init, same (a-b)*(a-b) fold distance, same
    # empty-cluster carryover (COALESCE), ties to the lowest cid.
    "q100_kmeans": """
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, v AS c
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        a1 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        )
        SELECT vec_id, cid - 1 AS cluster FROM (
          SELECT e.vec_id, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id ORDER BY
                   list_sum(list_transform(list_zip(e.v, c.c),
                            x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
          FROM emb e CROSS JOIN c2 c) WHERE rn = 1
    """,
    # SemDeDup: the q100 clustering, then NOT EXISTS a lower-id
    # cluster-mate at cosine >= 0.45.
    "q101_semdedup": """
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, v AS c
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        a1 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        ),
        final AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c2 c) WHERE rn = 1
        )
        SELECT f.vec_id, f.cid - 1 AS cluster FROM final f
        WHERE NOT EXISTS (
          SELECT 1 FROM final g
          WHERE g.cid = f.cid AND g.vec_id < f.vec_id
            AND list_dot_product(g.v, f.v)
                / (sqrt(list_dot_product(g.v, g.v))
                   * sqrt(list_dot_product(f.v, f.v))) >= 0.45
        )
    """,
    # chunk-level exact dedup: 3-token units, global first occurrence
    # by (doc_id, unit_no) wins, docs reassembled from survivors
    "q102_chunk_dedup": """
        WITH ulist AS (
          SELECT doc_id,
                 list_transform(range(0, CAST(ceil(len(words) / 3.0) AS INT)),
                     i -> array_to_string(list_slice(words, i*3 + 1, i*3 + 3),
                                          ' ')) AS us
          FROM (SELECT doc_id, string_split(text, ' ') AS words
                FROM documents) d
        ),
        units AS (
          SELECT doc_id, unnest(range(0, len(us))) AS unit_no,
                 unnest(us) AS unit
          FROM ulist
        ),
        kept AS (
          SELECT doc_id, unit_no, unit FROM (
            SELECT *, row_number() OVER (PARTITION BY unit
                        ORDER BY doc_id, unit_no) AS rn
            FROM units) WHERE rn = 1
        )
        SELECT doc_id, count(*) AS n_kept,
               string_agg(unit, ' ' ORDER BY unit_no) AS text_dedup
        FROM kept GROUP BY doc_id
    """,
    "q103_domain_cap": """
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                     ORDER BY n_chars DESC, doc_id) AS rk
          FROM documents) WHERE rk <= 5
    """,
    # SCD2: collapse each customer's order-priority log into validity
    # ranges — consecutive equal observations merge, lead(ts) closes
    # each version, the open version is current
    "q104_scd2_history": """
        WITH log AS (
          SELECT o_custkey, o_orderdate AS ts, o_orderpriority AS prio,
                 o_orderkey AS tb
          FROM orders WHERE o_custkey < 200
        ),
        seq AS (
          SELECT *, row_number() OVER (PARTITION BY o_custkey
                        ORDER BY ts, tb) AS rn,
                 lag(prio) OVER (PARTITION BY o_custkey
                        ORDER BY ts, tb) AS prev
          FROM log
        ),
        vers AS (
          SELECT o_custkey, ts, tb, prio FROM seq
          WHERE rn = 1 OR prio IS DISTINCT FROM prev
        )
        SELECT o_custkey, prio AS o_orderpriority, ts AS valid_from,
               lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts, tb)
                   AS valid_to,
               lead(ts) OVER (PARTITION BY o_custkey ORDER BY ts, tb)
                   IS NULL AS is_current
        FROM vers
    """,
    # DSIR-style unigram LLR importance: add-0.5 smoothing over the
    # joint vocabulary, target = sources src0..src3
    "q105_llr_importance": """
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN source IN ('src0','src1','src2','src3')
                      THEN 1.0 ELSE 0.0 END AS t,
                 unnest(string_split_regex(trim(text), '\\s+')) AS w
          FROM documents
        ),
        stats AS (
          SELECT w, sum(t) AS ct, sum(1.0 - t) AS cb
          FROM toks GROUP BY w
        ),
        tot AS (
          SELECT sum(ct) AS tt, sum(cb) AS tb,
                 CAST(count(*) AS DOUBLE) AS v
          FROM stats
        ),
        wt AS (
          SELECT w, ln(((ct + 0.5) / (tt + 0.5 * v))
                       / ((cb + 0.5) / (tb + 0.5 * v))) AS lw
          FROM stats, tot
        )
        SELECT doc_id, count(*) AS n_tokens,
               floor((sum(lw) / count(*)) * 10000 + 0.5) / 10000 AS score
        FROM toks JOIN wt USING (w) GROUP BY doc_id
    """,
    # bloom pruning is a pure accelerator — the exact-join result IS
    # the oracle contract
    "q106_bloom_semi_join": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_totalprice > 400000)
    """,
    "q107_corpus_overlap": r"""
        WITH fa AS (
          SELECT DISTINCT ('0x' || substr(md5(regexp_replace(
              lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
          FROM documents WHERE doc_id < 300
        ),
        fb AS (
          SELECT DISTINCT ('0x' || substr(md5(regexp_replace(
              lower(trim(text)), '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
          FROM documents WHERE doc_id >= 200
        ),
        j AS (
          SELECT fa.fp AS fpa, fb.fp AS fpb
          FROM fa FULL OUTER JOIN fb ON fa.fp = fb.fp
        )
        SELECT count(fpa) AS n_a, count(fpb) AS n_b,
               CAST(sum(CASE WHEN fpa IS NOT NULL AND fpb IS NOT NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
               floor(CAST(sum(CASE WHEN fpa IS NOT NULL AND fpb IS NOT NULL
                          THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 10000 + 0.5) / 10000 AS jaccard
        FROM j
    """,
    "q108_snapshot_diff": """
        WITH old AS (SELECT c_custkey, c_acctbal FROM customer),
        new AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100
                      ELSE c_acctbal END AS c_acctbal
          FROM customer WHERE c_custkey % 97 != 0
          UNION ALL
          SELECT c_custkey + 1000000, 42.0 FROM customer
          WHERE c_custkey < 50
        )
        SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'inserted'
                    WHEN n.c_custkey IS NULL THEN 'deleted'
                    WHEN o.c_acctbal IS DISTINCT FROM n.c_acctbal
                         THEN 'changed'
                    ELSE 'unchanged' END AS change_type
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    """,
    # thresholds = exact (i/8)-percentiles; bucket = count of
    # thresholds strictly below the value (ties to the lower bucket)
    "q109_quantile_bucketize": """
        WITH t AS (
          SELECT quantile_cont(o_totalprice,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS ts
          FROM orders
        )
        SELECT o_orderkey,
               CAST(len(list_filter(t.ts, x -> o_totalprice > x)) AS INT)
                   AS bucket
        FROM orders, t
    """,
    "q111_skew_report": """
        WITH counts AS (
          SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
        ),
        tot AS (
          SELECT CAST(sum(n_rows) AS DOUBLE) AS total,
                 count(*) AS nkeys
          FROM counts
        )
        SELECT user_id, n_rows,
               floor(n_rows / total * 10000 + 0.5) / 10000 AS share,
               floor(n_rows * nkeys / total * 10000 + 0.5) / 10000
                   AS x_uniform
        FROM counts, tot
        ORDER BY n_rows DESC, user_id LIMIT 20
    """,
    # the incremental two-wave ingest must equal one-shot exact dedup
    "q112_stream_ingest_dedup": r"""
        SELECT min(doc_id) AS doc_id FROM documents
        GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    """,
    # brute mirror of the LSH contract (see q41): directed
    # hamming<=7 candidates, positives at cos>=0.45, per-anchor top-3
    # hard negatives below it (sim desc, partner asc)
    "q113_contrastive_pairs": """
        WITH emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        comp AS (
          SELECT p, d,
                 (('0x' || substr(md5('plane:' || p || ':' || d), 1, 15))::BIGINT
                  % 2001 - 1000) / 1000.0 AS c
          FROM range(0, 16) r1(p), range(0, 64) r2(d)
        ),
        planes AS (SELECT p, list(c ORDER BY d) AS plane FROM comp GROUP BY p),
        proj AS (
          SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.plane) AS pr
          FROM emb e CROSS JOIN planes pl
        ),
        sigs AS (
          SELECT vec_id,
                 CAST(sum(CASE WHEN pr > 0 THEN (1::BIGINT << p)
                               ELSE 0 END) AS BIGINT) AS sig
          FROM proj GROUP BY vec_id
        ),
        cand AS (
          SELECT a.vec_id AS anchor, b.vec_id AS partner,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM sigs a JOIN sigs b ON a.vec_id != b.vec_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 7
        ),
        scored AS (
          SELECT c.anchor, c.partner, c.hamming,
                 list_dot_product(ea.v, eb.v)
                 / (sqrt(list_dot_product(ea.v, ea.v))
                    * sqrt(list_dot_product(eb.v, eb.v))) AS sim
          FROM cand c JOIN emb ea ON c.anchor = ea.vec_id
                      JOIN emb eb ON c.partner = eb.vec_id
        )
        SELECT anchor, partner, hamming,
               floor(sim * 10000 + 0.5) / 10000 AS sim, 1 AS label
        FROM scored WHERE sim >= 0.45
        UNION ALL
        SELECT anchor, partner, hamming,
               floor(sim * 10000 + 0.5) / 10000 AS sim, 0 AS label
        FROM (
          SELECT *, row_number() OVER (PARTITION BY anchor
                        ORDER BY sim DESC, partner) AS rk
          FROM scored WHERE sim < 0.45) WHERE rk <= 3
    """,
    # the full curation chain replayed stage by stage: gate -> exact
    # dedup (min-id by normalized fingerprint) -> 8-token-shingle
    # decontamination vs the eval slice -> per-domain cap
    "q114_curation_pipeline": r"""
        WITH gated AS (
          SELECT * FROM documents
          WHERE len(string_split_regex(trim(text), '\s+')) >= 30
            AND lang = 'en'
        ),
        dedup AS (
          SELECT * FROM gated WHERE doc_id IN (
            SELECT min(doc_id) FROM gated
            GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        ),
        tok_tr AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM dedup WHERE doc_id % 5 <> 0
        ),
        tok_ev AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE doc_id % 5 = 0
        ),
        sh_tr AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(t, i, i + 7), ' ') AS s
          FROM tok_tr, UNNEST(range(1, greatest(len(t) - 6, 2))) AS r(i)
        ),
        sh_ev AS (
          SELECT DISTINCT array_to_string(list_slice(t, i, i + 7), ' ') AS s
          FROM tok_ev, UNNEST(range(1, greatest(len(t) - 6, 2))) AS r(i)
        ),
        bad AS (
          SELECT DISTINCT sh_tr.doc_id FROM sh_tr
          JOIN sh_ev ON sh_tr.s = sh_ev.s
        ),
        clean AS (
          SELECT * FROM dedup
          WHERE doc_id % 5 <> 0
            AND doc_id NOT IN (SELECT doc_id FROM bad)
        )
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 row_number() OVER (PARTITION BY source
                     ORDER BY n_chars DESC, doc_id) AS rk
          FROM clean) WHERE rk <= 10
    """,
    # q114's replay minus the domain-cap stage (the lang-builtin
    # spelling stops at decontamination)
    "q123_lang_pipeline_builtins": r"""
        WITH gated AS (
          SELECT * FROM documents
          WHERE len(string_split_regex(trim(text), '\s+')) >= 30
            AND lang = 'en'
        ),
        dedup AS (
          SELECT * FROM gated WHERE doc_id IN (
            SELECT min(doc_id) FROM gated
            GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
        ),
        tok_tr AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM dedup WHERE doc_id % 5 <> 0
        ),
        tok_ev AS (
          SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
          FROM documents WHERE doc_id % 5 = 0
        ),
        sh_tr AS (
          SELECT DISTINCT doc_id,
                 array_to_string(list_slice(t, i, i + 7), ' ') AS s
          FROM tok_tr, UNNEST(range(1, greatest(len(t) - 6, 2))) AS r(i)
        ),
        sh_ev AS (
          SELECT DISTINCT array_to_string(list_slice(t, i, i + 7), ' ') AS s
          FROM tok_ev, UNNEST(range(1, greatest(len(t) - 6, 2))) AS r(i)
        ),
        bad AS (
          SELECT DISTINCT sh_tr.doc_id FROM sh_tr
          JOIN sh_ev ON sh_tr.s = sh_ev.s
        )
        SELECT doc_id, source, n_chars FROM dedup
        WHERE doc_id % 5 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM bad)
    """,
    # brute mirror of the SELECTIVE LSH contract over the corpus with
    # planted near-dups (see q124): perturbed copies built with the
    # same portable hash + exact expression shape, then 64-plane
    # signatures, hamming <= 5, cosine >= 0.9 over ALL pairs
    "q124_lsh_selective_neardup": """
        WITH emb0 AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        pcomp AS (
          SELECT vec_id, d, x + 0.15 * abs(x) *
                 ((('0x' || substr(md5('perturb:' || vec_id || ':' || d), 1, 15))::BIGINT
                   % 2001 - 1000) / 1000.0) AS xd
          FROM (SELECT vec_id, unnest(v) AS x, unnest(range(0, 64)) AS d
                FROM emb0 WHERE vec_id % 40 = 0)
        ),
        pert AS (
          SELECT vec_id + 1000000 AS vec_id, list(xd ORDER BY d) AS v
          FROM pcomp GROUP BY vec_id
        ),
        emb AS (SELECT * FROM emb0 UNION ALL SELECT * FROM pert),
        comp AS (
          SELECT p, d,
                 (('0x' || substr(md5('plane:' || p || ':' || d), 1, 15))::BIGINT
                  % 2001 - 1000) / 1000.0 AS c
          FROM range(0, 64) r1(p), range(0, 64) r2(d)
        ),
        planes AS (SELECT p, list(c ORDER BY d) AS plane FROM comp GROUP BY p),
        proj AS (
          SELECT e.vec_id, pl.p, list_dot_product(e.v, pl.plane) AS pr
          FROM emb e CROSS JOIN planes pl
        ),
        sigs AS (
          -- p = 63 is the sign bit: DuckDB raises on 1 << 63, so it
          -- is spelled as the min-BIGINT literal; the HUGEINT sum of
          -- mixed-sign terms CASTs back to the same signed 64-bit
          -- signature Spark's long addition produces
          SELECT vec_id,
                 CAST(sum(CASE WHEN pr > 0 THEN
                            CASE WHEN p = 63
                                 THEN (-9223372036854775807 - 1)
                                 ELSE (1::BIGINT << p) END
                          ELSE 0 END) AS BIGINT) AS sig
          FROM proj GROUP BY vec_id
        ),
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
          FROM sigs a JOIN sigs b ON a.vec_id < b.vec_id
          WHERE bit_count(xor(a.sig, b.sig)) <= 5
        ),
        s AS (
          SELECT c.id_a, c.id_b, c.hamming,
                 list_dot_product(ea.v, eb.v)
                 / (sqrt(list_dot_product(ea.v, ea.v))
                    * sqrt(list_dot_product(eb.v, eb.v))) AS sim
          FROM cand c JOIN emb ea ON c.id_a = ea.vec_id
                      JOIN emb eb ON c.id_b = eb.vec_id
        )
        SELECT id_a, id_b, hamming,
               floor(sim * 10000 + 0.5) / 10000 AS sim
        FROM s WHERE sim >= 0.9
    """,
    "q125_lang_in_table": """
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                              WHERE n_regionkey = 0)
    """,
    # one-shot replay of the incremental near-dup keep rule: a doc
    # survives iff it is never the HIGHER id of a verified near-dup
    # pair (exact shingle Jaccard >= 0.9 — the q38 brute contract)
    "q126_stream_neardup_ingest": r"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ') AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2))) AS r(i)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        jac AS (SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS j
                FROM inter
                JOIN sizes sa ON id_a = sa.doc_id
                JOIN sizes sb ON id_b = sb.doc_id)
        SELECT doc_id FROM documents
        WHERE doc_id NOT IN (SELECT id_b FROM jac WHERE j >= 0.9)
    """,
    # round-trip identity contracts: the interchange write+read must
    # reproduce the source table exactly
    "q132_cosine_topk_arrow": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT query_id, neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT query_id, neighbor_id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS INT) AS rank, sim
              FROM s)
        SELECT query_id, neighbor_id, rank,
               floor(sim * 10000 + 0.5) / 10000 AS sim
        FROM r WHERE rank <= 5
    """,
    # paper-rule SemDeDup: q101's k-means replay + q73's recursive CC
    # + keep the centroid-farthest member per component
    "q133_semdedup_paper_rule": """
        WITH RECURSIVE emb AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, v AS c
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        a1 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        ),
        final AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c2 c) WHERE rn = 1
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM final a JOIN final b
            ON a.cid = b.cid AND a.vec_id < b.vec_id
          WHERE list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))) >= 0.45
        ),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node),
        scored AS (
          SELECT f.vec_id, f.cid, comp.component,
                 list_dot_product(f.v, c2.c)
                 / (sqrt(list_dot_product(f.v, f.v))
                    * sqrt(list_dot_product(c2.c, c2.c))) AS cc
          FROM comp JOIN final f ON comp.node = f.vec_id
          JOIN c2 ON c2.cid = f.cid
        ),
        keepers AS (
          SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY component
                                      ORDER BY cc, vec_id) AS rn
            FROM scored) WHERE rn = 1
        )
        SELECT f.vec_id, f.cid - 1 AS cluster FROM final f
        WHERE f.vec_id NOT IN (SELECT node FROM comp)
        UNION ALL
        SELECT vec_id, cid - 1 AS cluster FROM keepers
    """,
    "q134_temptable_agg": """
        SELECT source, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM documents WHERE n_chars >= 100
        GROUP BY source
    """,
    "q144_lang_returned_revenue": """
        SELECT c_custkey, c_name, n_name AS nation,
               floor(sum(l_extendedprice * (1 - l_discount))
                     * 10000 + 0.5) / 10000 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
                 c_custkey
        LIMIT 20
    """,
    "q143_ranked_search": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        ),
        dt AS (
            SELECT doc_id, token, count(*) AS c
            FROM tok WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (SELECT doc_id, sum(c) AS dl FROM dt GROUP BY doc_id),
        ndocs AS (SELECT count(*) * 1.0 AS n FROM documents),
        stats AS (SELECT avg(dl) AS avgdl FROM dl),
        dfq AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
        scored AS (
            SELECT dt.doc_id, dt.token,
                   ln((ndocs.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                   * (dt.c * (1.2 + 1))
                   / (dt.c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       AS s
            FROM dt
            JOIN dfq USING (token)
            JOIN dl USING (doc_id)
            CROSS JOIN ndocs CROSS JOIN stats
            WHERE dt.token IN ('hash', 'table')
        ),
        ag AS (
            SELECT doc_id, sum(s) AS score, count(*) AS nt
            FROM scored GROUP BY doc_id
        ),
        fr AS (
            SELECT doc_id,
                   floor(score * 10000 + 0.5) / 10000 AS score_r
            FROM ag WHERE nt = 2
        ),
        rk AS (
            SELECT doc_id, score_r,
                   row_number() OVER (ORDER BY score_r DESC, doc_id)
                     AS rank
            FROM fr
        )
        SELECT doc_id, score_r AS score, CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 20
    """,
    # DSIR composition: q105's LLR CTEs feed q84's E-S ranking —
    # weight exp(score), portable-hash uniform, top-100
    # streaming histogram state == raw corpus: frequency-weighted
    # exact percentile over (value, cnt) == quantile_cont over rows
    "q158_stream_quantile_ingest": r"""
        WITH t AS (SELECT source,
                          len(string_split_regex(trim(text), '\s+')) AS v
                   FROM documents)
        SELECT source, count(*) AS n,
               round(quantile_cont(v, 0.5), 4) AS p50,
               round(quantile_cont(v, 0.9), 4) AS p90
        FROM t GROUP BY source
    """,
    # proportional interleave: per-source hash-permutation rank r of a
    # c-row source -> position r/c (one exact-integer IEEE division)
    "q157_interleave_sources": """
        WITH r AS (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 15))::BIGINT,
                                doc_id) AS rk,
                   count(*) OVER (PARTITION BY source) AS c
            FROM documents)
        SELECT doc_id, source,
               CAST(rk AS DOUBLE) / CAST(c AS DOUBLE) AS pos
        FROM r
    """,
    # sqrt-share temperature sampling: the ratio chain replays the
    # engine's left fold (list_reduce over ascending groups) and the
    # same parenthesized IEEE arithmetic; selection is q115's
    # content-hash rule with the computed thresholds
    "q155_temperature_mixture": """
        WITH d AS (SELECT doc_id, substr(source, 4, 1) AS grp
                   FROM documents),
        c AS (SELECT grp, count(*) AS c FROM d GROUP BY grp),
        s AS (SELECT list_reduce(
                  list(sqrt(CAST(c AS DOUBLE)) ORDER BY grp),
                  (a, b) -> a + b) AS s FROM c),
        r AS (SELECT grp,
                     CAST(floor(least(
                         ((sqrt(CAST(c AS DOUBLE)) / s.s) * 200.0)
                         / CAST(c AS DOUBLE), 1.0) * 1000000)
                       AS BIGINT) AS thr
              FROM c, s)
        SELECT d.doc_id, d.grp
        FROM d JOIN r USING (grp)
        WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000 < r.thr
    """,
    # the naive global running-sum prefix rule — the engine's bucketed
    # plan must keep exactly the same maximal prefix (integer sums)
    "q156_budget_select": r"""
        WITH t AS (SELECT doc_id,
                          CAST(length(text) AS BIGINT) AS quality,
                          CAST(len(string_split_regex(trim(text),
                                                      '\s+')) AS INT)
                            AS n_tokens
                   FROM documents),
        w AS (SELECT doc_id, quality, n_tokens,
                     sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT doc_id, quality, n_tokens FROM w WHERE cum <= 15000
    """,
    # two-wave streaming ingest == one-shot frequent_items == plain
    # exact GROUP BY ... HAVING (q147's oracle verbatim — the MG
    # state only bounds candidates, the recount decides every count)
    "q151_stream_frequent_ingest": r"""
        WITH tok AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        ),
        tk AS (SELECT token FROM tok WHERE token <> ''),
        nn AS (SELECT count(*) AS n FROM tk),
        c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token)
        SELECT c.token, c.cnt
        FROM c, nn
        WHERE c.cnt >= CAST(ceil(0.005 * nn.n) AS BIGINT)
    """,
    # q145's leg CTEs with WEIGHTED fusion: lexical w=2.0, dense
    # w=1.0 — score = sum_s w_s/(60 + rank_s), absent leg -> 0
    "q152_weighted_hybrid_search": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        ),
        dt AS (
            SELECT doc_id, token, count(*) AS c
            FROM tok WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (SELECT doc_id, sum(c) AS dl FROM dt GROUP BY doc_id),
        ndocs AS (SELECT count(*) * 1.0 AS n FROM documents),
        stats AS (SELECT avg(dl) AS avgdl FROM dl),
        dfq AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
        scored AS (
            SELECT dt.doc_id, dt.token,
                   ln((ndocs.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                   * (dt.c * (1.2 + 1))
                   / (dt.c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       AS s
            FROM dt
            JOIN dfq USING (token)
            JOIN dl USING (doc_id)
            CROSS JOIN ndocs CROSS JOIN stats
            WHERE dt.token IN ('hash', 'table')
        ),
        ag AS (
            SELECT doc_id, sum(s) AS score, count(*) AS nt
            FROM scored GROUP BY doc_id
        ),
        fr AS (
            SELECT doc_id,
                   floor(score * 10000 + 0.5) / 10000 AS score_r
            FROM ag WHERE nt = 2
        ),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_r DESC, doc_id)
                     AS r
            FROM fr
        ),
        lex20 AS (SELECT doc_id, r FROM lex WHERE r <= 20),
        q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 7),
        p AS (SELECT c.vec_id AS neighbor_id,
                     q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT neighbor_id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE))
                        * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1),
        den AS (SELECT neighbor_id AS doc_id,
                       row_number() OVER (ORDER BY sim DESC, neighbor_id)
                         AS r
                FROM s),
        den20 AS (SELECT doc_id, r FROM den WHERE r <= 20),
        fused AS (
            SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
                   coalesce(2.0 / (60.0 + l.r), 0.0)
                   + coalesce(1.0 / (60.0 + d.r), 0.0) AS rrf
            FROM lex20 l FULL OUTER JOIN den20 d ON l.doc_id = d.doc_id
        ),
        rk AS (
            SELECT doc_id, rrf,
                   row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
            FROM fused
        )
        SELECT doc_id,
               floor(rrf * 1000000 + 0.5) / 1000000 AS rrf_score,
               CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 15
    """,
    # one ROLLUP pass == per-level GROUP BYs; quantile_cont mirrors
    # Spark's exact percentile interpolation (q08 precedent)
    "q153_quantile_rollup": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    # q40's cosine spelling -> top-20 candidates (rel rounded 4dp),
    # pairwise candidate cosines rounded 4dp, then the greedy MMR
    # chain lam*rel - (1-lam)*max-sim as 5 chained argmax CTEs;
    # ties break on ascending id
    "q154_mmr_diversify": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings
                   WHERE vec_id = 7),
        p AS (SELECT c.vec_id AS id, q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE))
                        * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1),
        r AS (SELECT id, sim,
                     row_number() OVER (ORDER BY sim DESC, id) AS rk
              FROM s),
        cand AS (SELECT id, floor(sim * 10000 + 0.5) / 10000 AS rel
                 FROM r WHERE rk <= 20),
        ce AS (SELECT e.vec_id AS id, e.embedding AS v
               FROM embeddings e SEMI JOIN cand ON e.vec_id = cand.id),
        pp AS (SELECT x.id AS a, y.id AS b, x.v AS av, y.v AS bv
               FROM ce x, ce y WHERE x.id <> y.id),
        pu AS (SELECT a, b, unnest(av) AS x, unnest(bv) AS y FROM pp),
        ps AS (SELECT a, b,
                      floor((sum(x::DOUBLE * y::DOUBLE)
                             / (sqrt(sum(x::DOUBLE * x::DOUBLE))
                                * sqrt(sum(y::DOUBLE * y::DOUBLE))))
                            * 10000 + 0.5) / 10000 AS s
               FROM pu GROUP BY a, b),
        p1 AS (SELECT id, rel, 0.7 * rel AS score, 1 AS pick FROM cand
               ORDER BY rel DESC, id LIMIT 1),
        sel1 AS (SELECT id FROM p1),
        p2 AS (SELECT id, rel, score, 2 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM cand c JOIN ps ON ps.a = c.id
                 JOIN sel1 ON ps.b = sel1.id
                 WHERE c.id NOT IN (SELECT id FROM sel1)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        sel2 AS (SELECT id FROM sel1 UNION ALL SELECT id FROM p2),
        p3 AS (SELECT id, rel, score, 3 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM cand c JOIN ps ON ps.a = c.id
                 JOIN sel2 ON ps.b = sel2.id
                 WHERE c.id NOT IN (SELECT id FROM sel2)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        sel3 AS (SELECT id FROM sel2 UNION ALL SELECT id FROM p3),
        p4 AS (SELECT id, rel, score, 4 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM cand c JOIN ps ON ps.a = c.id
                 JOIN sel3 ON ps.b = sel3.id
                 WHERE c.id NOT IN (SELECT id FROM sel3)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        sel4 AS (SELECT id FROM sel3 UNION ALL SELECT id FROM p4),
        p5 AS (SELECT id, rel, score, 5 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM cand c JOIN ps ON ps.a = c.id
                 JOIN sel4 ON ps.b = sel4.id
                 WHERE c.id NOT IN (SELECT id FROM sel4)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                 UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4
                 UNION ALL SELECT * FROM p5)
        SELECT id AS vec_id, rel,
               floor(score * 1000000 + 0.5) / 1000000 AS mmr_score,
               CAST(pick AS INT) AS pick
        FROM allp
    """,
    "q150_dsir_resample": r"""
        WITH toks AS (
          SELECT doc_id,
                 CASE WHEN source IN ('src0','src1','src2','src3')
                      THEN 1.0 ELSE 0.0 END AS t,
                 unnest(string_split_regex(trim(text), '\s+')) AS w
          FROM documents
        ),
        stats AS (
          SELECT w, sum(t) AS ct, sum(1.0 - t) AS cb
          FROM toks GROUP BY w
        ),
        tot AS (
          SELECT sum(ct) AS tt, sum(cb) AS tb,
                 CAST(count(*) AS DOUBLE) AS v
          FROM stats
        ),
        wt AS (
          SELECT w, ln(((ct + 0.5) / (tt + 0.5 * v))
                       / ((cb + 0.5) / (tb + 0.5 * v))) AS lw
          FROM stats, tot
        ),
        sc AS (
          SELECT doc_id, count(*) AS n_tokens,
                 sum(lw) / count(*) AS score
          FROM toks JOIN wt USING (w) GROUP BY doc_id
        ),
        es AS (
          SELECT doc_id, n_tokens, score,
                 ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                      ::BIGINT % 1099511627776) + 1) / 1099511627777.0)
                 / exp(score) AS s
          FROM sc
        )
        SELECT doc_id, n_tokens,
               floor(score * 10000 + 0.5) / 10000 AS score
        FROM (SELECT * FROM es ORDER BY s DESC LIMIT 100)
    """,
    # grouped top-k: oracle is the naive window spelling the operator
    # is the cheap plan for — identical rows by the tie contract
    "q149_topk_per_group": """
        WITH r AS (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey)
                     AS INT) AS rank
            FROM orders
        )
        SELECT o_orderpriority, o_orderkey,
               floor(o_totalprice * 10000 + 0.5) / 10000 AS total,
               rank
        FROM r WHERE rank <= 5
    """,
    # q142's span-removal replay with the condemned set redefined:
    # gram IN eval-set grams (eval = doc_id % 10 == 0), no keeper rule
    "q148_scrub_contaminated_spans": """
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(coalesce(text, '')),
                                             '\\s+') AS toks
                   FROM documents WHERE doc_id % 10 <> 0),
        ev AS (SELECT string_split_regex(trim(coalesce(text, '')),
                                         '\\s+') AS toks
               FROM documents WHERE doc_id % 10 = 0),
        eg0 AS (SELECT toks, unnest(range(len(toks) - 5 + 1)) AS pos
                FROM ev WHERE len(toks) >= 5),
        eg AS (SELECT DISTINCT array_to_string(toks[pos+1:pos+5], ' ')
                 AS gram FROM eg0),
        g0 AS (SELECT doc_id, toks,
                      unnest(range(len(toks) - 5 + 1)) AS pos
               FROM t WHERE len(toks) >= 5),
        g AS (SELECT doc_id, pos,
                     array_to_string(toks[pos+1:pos+5], ' ') AS gram
              FROM g0),
        c AS (SELECT g.doc_id, g.pos FROM g
              SEMI JOIN eg ON g.gram = eg.gram),
        m AS (SELECT doc_id, pos, pos + 4 AS e,
                     max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pm
              FROM c),
        isl AS (SELECT doc_id, pos, e,
                       sum(CASE WHEN pm IS NULL OR pos > pm + 1
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS iid
                FROM m),
        sp AS (SELECT doc_id, iid, min(pos) AS lo, max(e) AS hi
               FROM isl GROUP BY doc_id, iid),
        dcount AS (SELECT doc_id, CAST(sum(hi - lo + 1) AS INT) AS dr
                   FROM sp GROUP BY doc_id),
        tok AS (SELECT doc_id, unnest(range(len(toks))) AS p, toks
                FROM t),
        dropped AS (SELECT tok.doc_id, tok.p FROM tok JOIN sp
                    ON sp.doc_id = tok.doc_id
                   AND tok.p BETWEEN sp.lo AND sp.hi),
        kept AS (SELECT t2.doc_id, t2.p, t2.toks[t2.p+1] AS w
                 FROM tok t2 ANTI JOIN dropped d
                 ON d.doc_id = t2.doc_id AND d.p = t2.p),
        reb AS (SELECT doc_id,
                       array_to_string(list(w ORDER BY p), ' ') AS txt
                FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
               coalesce(dcount.dr, 0) AS dropped_tokens,
               coalesce(reb.txt, '') AS text_clean
        FROM t LEFT JOIN dcount USING (doc_id)
               LEFT JOIN reb USING (doc_id)
    """,
    # exact phi-frequent tokens: the MG sketch bounds candidates only,
    # so the oracle is the plain exact GROUP BY ... HAVING
    "q147_frequent_tokens": r"""
        WITH tok AS (
            SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        ),
        tk AS (SELECT token FROM tok WHERE token <> ''),
        nn AS (SELECT count(*) AS n FROM tk),
        c AS (SELECT token, count(*) AS cnt FROM tk GROUP BY token)
        SELECT c.token, c.cnt
        FROM c, nn
        WHERE c.cnt >= CAST(ceil(0.005 * nn.n) AS BIGINT)
    """,
    # JL projection: q41's plane-component spelling, p in [0, 8),
    # list_dot_product == the hof fold, * (1.0/sqrt(8)) == the
    # driver-side inv double, portable 4-dp floor inside the list
    "q146_random_projection": """
        WITH emb AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        comp AS (
          SELECT p, d,
                 (('0x' || substr(md5('plane:' || p || ':' || d), 1, 15))::BIGINT
                  % 2001 - 1000) / 1000.0 AS c
          FROM range(0, 8) r1(p), range(0, 64) r2(d)
        ),
        planes AS (SELECT p, list(c ORDER BY d) AS plane FROM comp GROUP BY p),
        proj AS (
          SELECT e.vec_id, pl.p,
                 list_dot_product(e.v, pl.plane) * (1.0 / sqrt(8.0)) AS y
          FROM emb e CROSS JOIN planes pl
        )
        SELECT vec_id,
               array_to_string(
                 list(CAST(CAST(floor(y * 10000 + 0.5) AS BIGINT)
                           AS VARCHAR) ORDER BY p),
                 ',') AS projected
        FROM proj GROUP BY vec_id
    """,
    # q143's BM25 CTE chain + q40's cosine spelling (query vec_id=7),
    # fused by RRF: score = sum_s 1/(60 + rank_s), absent leg -> 0.
    "q145_hybrid_search": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        ),
        dt AS (
            SELECT doc_id, token, count(*) AS c
            FROM tok WHERE token <> '' GROUP BY doc_id, token
        ),
        dl AS (SELECT doc_id, sum(c) AS dl FROM dt GROUP BY doc_id),
        ndocs AS (SELECT count(*) * 1.0 AS n FROM documents),
        stats AS (SELECT avg(dl) AS avgdl FROM dl),
        dfq AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
        scored AS (
            SELECT dt.doc_id, dt.token,
                   ln((ndocs.n - dfq.df + 0.5) / (dfq.df + 0.5) + 1)
                   * (dt.c * (1.2 + 1))
                   / (dt.c + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                       AS s
            FROM dt
            JOIN dfq USING (token)
            JOIN dl USING (doc_id)
            CROSS JOIN ndocs CROSS JOIN stats
            WHERE dt.token IN ('hash', 'table')
        ),
        ag AS (
            SELECT doc_id, sum(s) AS score, count(*) AS nt
            FROM scored GROUP BY doc_id
        ),
        fr AS (
            SELECT doc_id,
                   floor(score * 10000 + 0.5) / 10000 AS score_r
            FROM ag WHERE nt = 2
        ),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY score_r DESC, doc_id)
                     AS r
            FROM fr
        ),
        lex20 AS (SELECT doc_id, r FROM lex WHERE r <= 20),
        q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 7),
        p AS (SELECT c.vec_id AS neighbor_id,
                     q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT neighbor_id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE))
                        * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1),
        den AS (SELECT neighbor_id AS doc_id,
                       row_number() OVER (ORDER BY sim DESC, neighbor_id)
                         AS r
                FROM s),
        den20 AS (SELECT doc_id, r FROM den WHERE r <= 20),
        fused AS (
            SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
                   coalesce(1.0 / (60.0 + l.r), 0.0)
                   + coalesce(1.0 / (60.0 + d.r), 0.0) AS rrf
            FROM lex20 l FULL OUTER JOIN den20 d ON l.doc_id = d.doc_id
        ),
        rk AS (
            SELECT doc_id, rrf,
                   row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
            FROM fused
        )
        SELECT doc_id,
               floor(rrf * 1000000 + 0.5) / 1000000 AS rrf_score,
               CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 15
    """,
    "q142_remove_duplicate_spans": """
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(coalesce(text, '')),
                                             '\\s+') AS toks
                   FROM documents),
        g0 AS (SELECT doc_id, toks,
                      unnest(range(len(toks) - 5 + 1)) AS pos
               FROM t WHERE len(toks) >= 5),
        g AS (SELECT doc_id, pos,
                     array_to_string(toks[pos+1:pos+5], ' ') AS gram
              FROM g0),
        h AS (SELECT gram, min(doc_id) AS keeper FROM g GROUP BY gram
              HAVING count(DISTINCT doc_id) >= 2),
        c AS (SELECT g.doc_id, g.pos FROM g JOIN h USING (gram)
              WHERE g.doc_id <> h.keeper),
        m AS (SELECT doc_id, pos, pos + 4 AS e,
                     max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pm
              FROM c),
        isl AS (SELECT doc_id, pos, e,
                       sum(CASE WHEN pm IS NULL OR pos > pm + 1
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS iid
                FROM m),
        sp AS (SELECT doc_id, iid, min(pos) AS lo, max(e) AS hi
               FROM isl GROUP BY doc_id, iid),
        dcount AS (SELECT doc_id, CAST(sum(hi - lo + 1) AS INT) AS dr
                   FROM sp GROUP BY doc_id),
        tok AS (SELECT doc_id, unnest(range(len(toks))) AS p, toks
                FROM t),
        dropped AS (SELECT tok.doc_id, tok.p FROM tok JOIN sp
                    ON sp.doc_id = tok.doc_id
                   AND tok.p BETWEEN sp.lo AND sp.hi),
        kept AS (SELECT t2.doc_id, t2.p, t2.toks[t2.p+1] AS w
                 FROM tok t2 ANTI JOIN dropped d
                 ON d.doc_id = t2.doc_id AND d.p = t2.p),
        reb AS (SELECT doc_id,
                       array_to_string(list(w ORDER BY p), ' ') AS txt
                FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
               coalesce(dcount.dr, 0) AS dropped_tokens,
               coalesce(reb.txt, '') AS text_dedup
        FROM t LEFT JOIN dcount USING (doc_id)
               LEFT JOIN reb USING (doc_id)
    """,
    "q141_stream_postings_ingest": """
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(coalesce(text, '')),
                                             '\\s+') AS toks
                   FROM documents),
        p AS (SELECT doc_id, unnest(range(len(toks))) AS pos, toks
              FROM t),
        g AS (SELECT toks[pos+1] AS term, doc_id, pos FROM p
              WHERE toks[pos+1] <> '')
        SELECT term, doc_id,
               array_to_string(
                 list(CAST(pos AS VARCHAR) ORDER BY pos),
                 ',') AS positions,
               CAST(count(*) AS BIGINT) AS tf
        FROM g GROUP BY term, doc_id
    """,
    "q140_phrase_search": """
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(coalesce(text, '')),
                                             '\\s+') AS toks
                   FROM documents),
        p AS (SELECT doc_id, unnest(range(len(toks) - 1)) AS pos, toks
              FROM t WHERE len(toks) >= 2),
        h AS (SELECT doc_id, count(*) AS n FROM p
              WHERE toks[pos+1] = 'the' AND toks[pos+2] = 'table'
              GROUP BY doc_id)
        SELECT doc_id, CAST(n AS INT) AS n_hits FROM h
    """,
    # adjacent pairs via 1-based positional zip; ties (cnt, left,
    # right); left/right quoted (SQL keywords)
    "q160_bpe_pair_counts": r"""
        WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        p AS (SELECT toks[i] AS l, toks[i + 1] AS r
              FROM t, unnest(range(1, len(toks))) AS u(i)
              WHERE len(toks) >= 2),
        pf AS (SELECT l, r FROM p WHERE l <> '' AND r <> ''),
        c AS (SELECT l, r, count(*) AS cnt FROM pf GROUP BY l, r),
        rk AS (SELECT l, r, cnt,
                      row_number() OVER (ORDER BY cnt DESC, l, r)
                        AS rank
               FROM c)
        SELECT l AS "left", r AS "right", cnt, CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 20
    """,
    # bigrams as inclusive 2-element slices; exact integer counts,
    # one rounded IEEE division for the ratio
    "q161_ngram_diversity": r"""
        WITH t AS (SELECT source,
                          string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        g AS (SELECT source, array_to_string(toks[i:i+1], ' ') AS gram
              FROM t, unnest(range(1, len(toks))) AS u(i)
              WHERE len(toks) >= 2)
        SELECT source, count(*) AS total,
               count(DISTINCT gram) AS n_distinct,
               floor((CAST(count(DISTINCT gram) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)) * 10000 + 0.5)
                 / 10000 AS diversity
        FROM g GROUP BY source
    """,
    # anchored-window funnel: the greedy fold == this CTE chain
    # (each step takes its minimal admissible ts; window anchored at
    # the user's first step-1 event)
    "q162_funnel": """
        WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) AS t, any_value(t1.t) AS t0
               FROM events e JOIN t1 ON e.user_id = t1.user_id
               WHERE e.event_type = 'click' AND e.ts > t1.t
                 AND e.ts <= t1.t + INTERVAL 8 HOUR
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(e.ts) AS t
               FROM events e JOIN t2 ON e.user_id = t2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > t2.t
                 AND e.ts <= t2.t0 + INTERVAL 8 HOUR
               GROUP BY e.user_id)
        SELECT CAST(1 AS INT) AS step_idx, 'view' AS step,
               (SELECT count(*) FROM t1) AS n_users
        UNION ALL SELECT CAST(2 AS INT), 'click',
               (SELECT count(*) FROM t2)
        UNION ALL SELECT CAST(3 AS INT), 'purchase',
               (SELECT count(*) FROM t3)
    """,
    # first-activity cohorts x 7-day offsets, all-integer arithmetic
    "q163_cohort_retention": """
        WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS d0
                   FROM events GROUP BY user_id)
        SELECT d0 AS cohort_start,
               CAST(floor(datediff('day', d0, CAST(ts AS DATE)) / 7.0)
                    AS INT) AS period_offset,
               count(DISTINCT e.user_id) AS n_users
        FROM events e JOIN f ON e.user_id = f.user_id
        GROUP BY cohort_start, period_offset
    """,
    "q164_transition_counts": """
        WITH o AS (SELECT event_type AS src,
                          lead(event_type) OVER (
                            PARTITION BY user_id ORDER BY ts, event_id)
                            AS dst
                   FROM events)
        SELECT src, dst, count(*) AS cnt FROM o
        WHERE dst IS NOT NULL GROUP BY src, dst
    """,
    # exact-percentile clip: quantile_cont == Spark percentile
    # bit-for-bit (q158 identity), so the clipped doubles agree
    "q165_winsorize": """
        WITH b AS (SELECT event_type,
                          quantile_cont(value, 0.05) AS lo,
                          quantile_cont(value, 0.95) AS hi
                   FROM events GROUP BY event_type)
        SELECT event_id, event_type,
               floor(least(greatest(value, lo), hi) * 10000 + 0.5)
                 / 10000 AS value_w
        FROM events e JOIN b USING (event_type)
    """,
    # explicit-order sequential fold == Spark aggregate HOF replay;
    # alpha = 0.25 and 0.75 are both exactly representable
    "q166_ewma": """
        WITH l AS (SELECT user_id, event_type,
                          CAST(count(*) AS BIGINT) AS n,
                          list(value ORDER BY ts, event_id) AS vs
                   FROM events GROUP BY user_id, event_type)
        SELECT user_id, event_type, n,
               floor(list_reduce(vs, (a, b) -> 0.25 * b + 0.75 * a)
                     * 1000000 + 0.5) / 1000000 AS ewma
        FROM l
    """,
    # the brute-force definition the ED-Join blocking must equal
    "q167_fuzzy_pairs": """
        WITH c AS (SELECT c_custkey, c_name FROM customer
                   WHERE c_custkey % 7 = 0)
        SELECT a.c_custkey AS id1, b.c_custkey AS id2,
               CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
        FROM c a JOIN c b ON a.c_custkey < b.c_custkey
        WHERE abs(length(a.c_name) - length(b.c_name)) <= 2
          AND levenshtein(a.c_name, b.c_name) <= 2
    """,
    # one-shot COUNT(DISTINCT) the two-wave ingest must equal; NULL
    # text yields a NULL value on both engines and is ignored
    "q168_distinct_ingest": r"""
        SELECT source,
               count(DISTINCT len(string_split_regex(trim(text),
                                                     '\s+')))
                 AS n_distinct
        FROM documents GROUP BY source
    """,
    # q162's CTE chain extended to per-user completion times; lags
    # are integer micros through one division
    "q169_conversion_lag": """
        WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) AS t
               FROM events e JOIN t1 ON e.user_id = t1.user_id
               WHERE e.event_type = 'click' AND e.ts > t1.t
               GROUP BY e.user_id),
        t3 AS (SELECT e.user_id, min(e.ts) AS t
               FROM events e JOIN t2 ON e.user_id = t2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > t2.t
               GROUP BY e.user_id)
        SELECT t1.user_id,
               floor(date_diff('us', t1.t, t2.t) / 1000000.0
                     * 1000000 + 0.5) / 1000000 AS lag12_s,
               floor(date_diff('us', t1.t, t3.t) / 1000000.0
                     * 1000000 + 0.5) / 1000000 AS lag13_s
        FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
                LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
    # exact integer cents; ntile quantile tiles with ascending-user
    # tie-break (identical ntile bucket arithmetic on both engines)
    "q170_rfm_scores": """
        WITH per AS (
          SELECT user_id, max(ts) AS last,
                 CAST(count(*) AS BIGINT) AS freq,
                 CAST(coalesce(sum(CAST(floor(value * 100 + 0.5)
                                        AS BIGINT)), 0) AS BIGINT)
                   AS monetary_cents
          FROM events GROUP BY user_id),
        mx AS (SELECT max(last) AS m FROM per),
        r AS (SELECT user_id, freq, monetary_cents,
                     CAST(datediff('day', CAST(last AS DATE),
                                   CAST((SELECT m FROM mx) AS DATE))
                          AS INT) AS r_days
              FROM per)
        SELECT user_id, r_days, freq, monetary_cents,
               CAST(ntile(5) OVER (ORDER BY r_days, user_id)
                    AS INT) AS r_score,
               CAST(ntile(5) OVER (ORDER BY freq DESC, user_id)
                    AS INT) AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary_cents DESC,
                                   user_id) AS INT) AS m_score
        FROM r
    """,
    # the same three integer PageRank rounds unrolled as CTEs:
    # contrib = rank // outdeg, rank' = 150000 + (inflow * 17) // 20
    # (base = (10^6 * 3) // 20; all int64, order-independent)
    "q171_pagerank": """
        WITH e AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'p' || CAST(l_partkey AS VARCHAR) AS dst
          FROM lineitem),
        ed AS (SELECT src, dst FROM e
               UNION ALL SELECT dst AS src, src AS dst FROM e),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
                FROM ed GROUP BY src),
        n AS (SELECT DISTINCT src AS node FROM ed
              UNION SELECT DISTINCT dst AS node FROM ed),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        i1 AS (SELECT ed.dst AS node, SUM(r0.r // deg.d) AS f
               FROM ed JOIN r0 ON ed.src = r0.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r1 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i1.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i1 USING (node)),
        i2 AS (SELECT ed.dst AS node, SUM(r1.r // deg.d) AS f
               FROM ed JOIN r1 ON ed.src = r1.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r2 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i2.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i2 USING (node)),
        i3 AS (SELECT ed.dst AS node, SUM(r2.r // deg.d) AS f
               FROM ed JOIN r2 ON ed.src = r2.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r3 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i3.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i3 USING (node))
        SELECT node, r AS rank_units, r / 1000000 AS pr FROM r3
    """,
    # q171's integer rounds, DIRECTED graph (parts are sinks), with
    # the classic dangling-mass share: rank' = base + ((inflow +
    # D // |nodes|) * 17) // 20, one dangling-sum CTE per round
    "q196_pagerank_dangling": """
        WITH ed AS (
          SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                          'p' || CAST(l_partkey AS VARCHAR) AS dst
          FROM lineitem),
        deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d
                FROM ed GROUP BY src),
        n AS (SELECT DISTINCT src AS node FROM ed
              UNION SELECT DISTINCT dst AS node FROM ed),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM n),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        d1 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm
               FROM r0 WHERE node NOT IN (SELECT src FROM deg)),
        i1 AS (SELECT ed.dst AS node, SUM(r0.r // deg.d) AS f
               FROM ed JOIN r0 ON ed.src = r0.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r1 AS (SELECT n.node,
                      CAST(150000 + ((COALESCE(i1.f, 0)
                           + (SELECT dm FROM d1)
                             // (SELECT c FROM nn)) * 17) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN i1 USING (node)),
        d2 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm
               FROM r1 WHERE node NOT IN (SELECT src FROM deg)),
        i2 AS (SELECT ed.dst AS node, SUM(r1.r // deg.d) AS f
               FROM ed JOIN r1 ON ed.src = r1.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r2 AS (SELECT n.node,
                      CAST(150000 + ((COALESCE(i2.f, 0)
                           + (SELECT dm FROM d2)
                             // (SELECT c FROM nn)) * 17) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN i2 USING (node)),
        d3 AS (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) AS dm
               FROM r2 WHERE node NOT IN (SELECT src FROM deg)),
        i3 AS (SELECT ed.dst AS node, SUM(r2.r // deg.d) AS f
               FROM ed JOIN r2 ON ed.src = r2.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r3 AS (SELECT n.node,
                      CAST(150000 + ((COALESCE(i3.f, 0)
                           + (SELECT dm FROM d3)
                             // (SELECT c FROM nn)) * 17) // 20
                           AS BIGINT) AS r
               FROM n LEFT JOIN i3 USING (node))
        SELECT node, r AS rank_units, r / 1000000 AS pr FROM r3
    """,
    # exact int64 OLS moments (day index x half-up cents), then a
    # fixed sequence of double ops — q172's cross-engine contract
    "q172_value_trend": """
        WITH b AS (
          SELECT event_type,
                 CAST(datediff('day', DATE '2024-01-01',
                               CAST(ts AS DATE)) AS BIGINT) AS x,
                 CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
          FROM events),
        m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM b GROUP BY event_type)
        SELECT event_type, n,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                 CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) END
                 AS slope_cents_per_day,
               (CAST(sy AS DOUBLE)
                - (CASE WHEN n * sxx - sx * sx <> 0 THEN
                     CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END)
                  * CAST(sx AS DOUBLE)) / n AS intercept_cents
        FROM m
    """,
    # exact cents -> exact median / MAD (quantile_cont == Spark
    # percentile), |c - med| > 3 * MAD counted per group
    "q173_mad_outliers": """
        WITH c AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                            AS c
                   FROM events),
        med AS (SELECT event_type, quantile_cont(c, 0.5) AS med
                FROM c GROUP BY event_type),
        dev AS (SELECT c.event_type, abs(c.c - med.med) AS d, med.med
                FROM c JOIN med USING (event_type)),
        mad AS (SELECT event_type, quantile_cont(d, 0.5) AS mad
                FROM dev GROUP BY event_type)
        SELECT dev.event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN dev.d > 3.0 * mad.mad
                             THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers,
               first(dev.med) AS med_cents,
               first(mad.mad) AS mad_cents
        FROM dev JOIN mad USING (event_type)
        GROUP BY dev.event_type
    """,
    # c*ln(c) folded in lexicographic token order (list_reduce ==
    # F.aggregate over the sorted struct list — the q155 contract)
    "q175_token_entropy": r"""
        WITH toks AS (
          SELECT source,
                 unnest(string_split_regex(trim(text), '\s+'))
                   AS token
          FROM documents),
        t2 AS (SELECT * FROM toks WHERE token <> ''),
        tc AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
               FROM t2 GROUP BY source, token),
        g AS (SELECT source,
                     CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     list_reduce(
                       list(CAST(c AS DOUBLE)
                            * ln(CAST(c AS DOUBLE)) ORDER BY token),
                       (a, b) -> a + b) AS s
              FROM tc GROUP BY source)
        SELECT source, n_tokens, n_distinct,
               ln(CAST(n_tokens AS DOUBLE)) - s / n_tokens
                 AS entropy_nats,
               CASE WHEN n_distinct > 1 THEN
                 (ln(CAST(n_tokens AS DOUBLE)) - s / n_tokens)
                 / ln(CAST(n_distinct AS DOUBLE)) END
                 AS entropy_norm
        FROM g
    """,
    # q44's session rule in exact integer micros, paths as ordered
    # string_agg, frequency top-20 with path tie-break
    "q176_session_paths": """
        WITH o AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR date_diff('us', lag(ts) OVER w, ts)
                         > 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                          AS sess
              FROM o),
        p AS (SELECT user_id, sess,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sess),
        c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
              FROM p GROUP BY path)
        SELECT path, n_sessions FROM c
        ORDER BY n_sessions DESC, path LIMIT 20
    """,
    # q167's brute pair definition (dist <= 1) through q73's
    # recursive-CTE transitive closure; singletons map to themselves
    "q178_entity_resolution": """
        WITH RECURSIVE
        c AS (SELECT c_custkey, c_name FROM customer
              WHERE c_custkey % 7 = 0),
        pairs AS (
          SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
          FROM c a JOIN c b ON a.c_custkey < b.c_custkey
          WHERE abs(length(a.c_name) - length(b.c_name)) <= 1
            AND levenshtein(a.c_name, b.c_name) <= 1),
        sym AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
        reach(node, r) AS (SELECT a, b FROM sym
                           UNION
                           SELECT reach.node, sym.b
                           FROM reach JOIN sym ON reach.r = sym.a),
        comp AS (SELECT node, least(node, min(r)) AS component
                 FROM reach GROUP BY node)
        SELECT c.c_custkey,
               coalesce(comp.component, c.c_custkey) AS entity_id
        FROM c LEFT JOIN comp ON c.c_custkey = comp.node
    """,
    # exact-integer empirical CDFs, one division each, min-value
    # argmax tie-break — deterministic cross-engine
    # exhaustive-probe search over the streamed IVF store == brute
    # force over the full corpus: q40's oracle, verbatim
    "q202_ivf_stream_index": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
        p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     q.embedding AS qe, c.embedding AS ce
              FROM q, embeddings c WHERE c.vec_id != q.vec_id),
        u AS (SELECT query_id, neighbor_id, unnest(qe) AS x, unnest(ce) AS y FROM p),
        s AS (SELECT query_id, neighbor_id,
                     sum(x::DOUBLE * y::DOUBLE)
                     / (sqrt(sum(x::DOUBLE * x::DOUBLE)) * sqrt(sum(y::DOUBLE * y::DOUBLE))) AS sim
              FROM u GROUP BY 1, 2),
        r AS (SELECT query_id, neighbor_id,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY sim DESC, neighbor_id) AS INT) AS rank, sim
              FROM s)
        SELECT query_id, neighbor_id, rank,
               floor(sim * 10000 + 0.5) / 10000 AS sim
        FROM r WHERE rank <= 5
    """,
    # the q179 KS pattern on the RAW double values, tick-rounded by
    # the same floor(v/7.5)*7.5 double ops the quantize_to knob runs
    "q199_ks_quantized": """
        WITH e AS (SELECT event_type,
                          floor(value / 7.5) * 7.5 AS v
                   FROM events WHERE value IS NOT NULL),
        a AS (SELECT v, CAST(count(*) AS BIGINT) AS ca
              FROM e WHERE event_type = 'view' GROUP BY v),
        b AS (SELECT v, CAST(count(*) AS BIGINT) AS cb
              FROM e WHERE event_type = 'purchase' GROUP BY v),
        u AS (SELECT coalesce(a.v, b.v) AS v,
                     coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v),
        c AS (SELECT v,
                     sum(ca) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_a,
                     sum(cb) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_b
              FROM u),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM u)
        SELECT n.n_a, n.n_b,
               abs(cum_a / n.n_a - cum_b / n.n_b) AS d_stat,
               c.v AS at_value
        FROM c, n
        ORDER BY d_stat DESC, at_value ASC LIMIT 1
    """,
    "q179_ks_drift": """
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                            AS cents
                   FROM events),
        a AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS ca
              FROM e WHERE event_type = 'view' GROUP BY cents),
        b AS (SELECT cents AS v, CAST(count(*) AS BIGINT) AS cb
              FROM e WHERE event_type = 'purchase' GROUP BY cents),
        u AS (SELECT coalesce(a.v, b.v) AS v,
                     coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v),
        c AS (SELECT v,
                     sum(ca) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_a,
                     sum(cb) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_b
              FROM u),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM u)
        SELECT n.n_a, n.n_b,
               abs(cum_a / n.n_a - cum_b / n.n_b) AS d_stat,
               c.v AS at_value
        FROM c, n
        ORDER BY d_stat DESC, at_value ASC LIMIT 1
    """,
    # four int64 counts, then the pooled-SE z in the same fixed
    # double-op order as the Spark side
    "q180_ab_test": """
        WITH m AS (
          SELECT CAST(sum(CASE WHEN event_type = 'view'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN event_type = 'view'
                               AND value > 50
                               THEN 1 ELSE 0 END) AS BIGINT) AS s_a,
                 CAST(sum(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN event_type = 'click'
                               AND value > 50
                               THEN 1 ELSE 0 END) AS BIGINT) AS s_b
          FROM events),
        s AS (SELECT n_a, s_a, n_b, s_b,
                     s_a / n_a AS rate_a, s_b / n_b AS rate_b,
                     (s_a + s_b) / (n_a + n_b) AS pooled
              FROM m)
        SELECT n_a, s_a, n_b, s_b, rate_a, rate_b,
               CASE WHEN sqrt(pooled * (1.0 - pooled)
                              * (1.0 / n_a + 1.0 / n_b)) > 0
                    THEN (rate_a - rate_b)
                         / sqrt(pooled * (1.0 - pooled)
                                * (1.0 / n_a + 1.0 / n_b)) END AS z
        FROM s
    """,
    # canonical (lo, hi) edges, ordered wedge join closed on (a, c)
    "q181_triangles": """
        WITH raw AS (SELECT c_custkey % 400 AS s,
                            (c_custkey * 17 + 3) % 400 AS d
                     FROM customer),
        e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
        w AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              FROM e e1 JOIN e e2 ON e1.b = e2.a)
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM w JOIN e ON w.x = e.a AND w.z = e.b
    """,
    # deduped touches (max event_id per (user, ts)); each purchase
    # takes the latest touch at-or-before it, 'none' otherwise
    "q182_attribution": """
        WITH t AS (SELECT user_id, ts,
                          max_by(event_type, event_id) AS touch_type
                   FROM events
                   WHERE event_type IN ('view', 'click')
                   GROUP BY user_id, ts),
        p AS (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'purchase'),
        a AS (SELECT p.event_id,
                     (SELECT t.touch_type FROM t
                      WHERE t.user_id = p.user_id AND t.ts <= p.ts
                      ORDER BY t.ts DESC LIMIT 1) AS touch_type
              FROM p)
        SELECT coalesce(touch_type, 'none') AS touch_type,
               CAST(count(*) AS BIGINT) AS n_purchases
        FROM a GROUP BY 1
    """,
    # integer bucketing ((v-lo)*B // (hi-lo+1)), add-one-smoothed
    # shares, fixed bucket-order fold — matches the Spark HOF fold
    "q183_psi_drift": """
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM events
                   WHERE event_type IN ('view', 'error')),
        bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM e),
        b AS (SELECT (v - lo) * 10 // (hi - lo + 1) AS bucket,
                     event_type FROM e, bounds),
        cnt AS (SELECT bucket,
                       CAST(sum(CASE WHEN event_type = 'view'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS ca,
                       CAST(sum(CASE WHEN event_type = 'error'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS cb
                FROM b GROUP BY bucket),
        allb AS (SELECT r.bucket, coalesce(ca, 0) AS ca,
                        coalesce(cb, 0) AS cb
                 FROM (SELECT unnest(range(0, 10)) AS bucket) r
                 LEFT JOIN cnt USING (bucket)),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM allb)
        SELECT n.n_a, n.n_b,
               list_reduce(
                 list(((CAST(ca AS DOUBLE) + 1.0) / (n.n_a + 10)
                       - (CAST(cb AS DOUBLE) + 1.0) / (n.n_b + 10))
                      * ln(((CAST(ca AS DOUBLE) + 1.0)
                            / (n.n_a + 10))
                           / ((CAST(cb AS DOUBLE) + 1.0)
                              / (n.n_b + 10)))
                      ORDER BY bucket),
                 (a, b) -> a + b) AS psi
        FROM allb, n GROUP BY n.n_a, n.n_b
    """,
    # q73's DISTINCT shingle spelling; ordered pairs, |A∩B|/|A|
    "q184_containment_pairs": r"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 150),
        t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM docs),
        sh AS (SELECT DISTINCT doc_id,
                      array_to_string(list_slice(toks, i, i + 2), ' ')
                        AS s
               FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2)))
                       AS r(i)),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                  FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS i
                  FROM sh a JOIN sh b
                    ON a.s = b.s AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b, i / sizes.n AS containment
        FROM inter JOIN sizes ON inter.id_a = sizes.doc_id
        WHERE i / sizes.n >= 0.9
    """,
    # the shared drift state is lossless, so the KS oracle is simply
    # batch KS over the raw rows (q179's SQL shape on documents)
    "q197_ks_ingest": """
        WITH e AS (SELECT source,
                          CAST(length(text) AS BIGINT) AS v
                   FROM documents
                   WHERE source IN ('src1', 'src2')),
        a AS (SELECT v, CAST(count(*) AS BIGINT) AS ca
              FROM e WHERE source = 'src1' GROUP BY v),
        b AS (SELECT v, CAST(count(*) AS BIGINT) AS cb
              FROM e WHERE source = 'src2' GROUP BY v),
        u AS (SELECT coalesce(a.v, b.v) AS v,
                     coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v),
        c AS (SELECT v,
                     sum(ca) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_a,
                     sum(cb) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_b
              FROM u),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM u)
        SELECT n.n_a, n.n_b,
               abs(cum_a / n.n_a - cum_b / n.n_b) AS d_stat,
               c.v AS at_value
        FROM c, n
        ORDER BY d_stat DESC, at_value ASC LIMIT 1
    """,
    # the streaming PSI state is a lossless per-(side, value)
    # histogram, so the oracle is simply batch PSI over the raw rows
    # (q183's SQL shape on documents: sides src1/src2, v = length)
    # the q189 chi-square formula over the two sides the streaming
    # ingest maintains — the from-state report is bit-identical to
    # batch chi_square, which this SQL computes directly
    # the q214 oracle is COMPOSED from the engine's own PII_PATTERNS
    "q214_pii_counts": _pii_counts_sql(),
    # the streaming data card's batch identity: q121's cube spelling
    # run directly over the raw corpus (same deterministic NULL-lang
    # injection; GROUPING() = Spark's grouping_id(), so data-NULL
    # cells and rollup cells stay distinct rows on both sides)
    "q213_datacard_ingest": r"""
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS BIGINT) AS gid,
               count(*) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS total_tokens,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               count(DISTINCT fp) AS n_distinct,
               floor((1 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS dup_ratio
        FROM (SELECT source,
                     CASE WHEN doc_id % 17 = 0 THEN NULL
                          ELSE lang END AS lang, text,
                     ('0x' || substr(md5(regexp_replace(lower(trim(text)),
                          '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
              FROM documents)
        GROUP BY CUBE (source, lang)
    """,
    # the CCNet bucketing: q99's bigram-LM chain UNROUNDED, terciles
    # via quantile_cont (linear interpolation — Spark percentile's
    # rule), strict-> assignment, NULL ppl -> NULL bucket
    "q224_ccnet_buckets": r"""
        WITH tok AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
            FROM documents
        ),
        bg AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM tok, UNNEST(range(1, len(t))) AS r(i)
        ),
        cb AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        cu AS (SELECT w1, count(*) AS cu FROM bg GROUP BY w1),
        v AS (SELECT count(DISTINCT w) * 1.0 AS v
              FROM (SELECT w1 AS w FROM bg
                    UNION ALL SELECT w2 FROM bg)),
        lp AS (
            SELECT bg.doc_id,
                   ln((cb.cb + 0.4) / (cu.cu + 0.4 * v.v)) AS lp
            FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1)
            CROSS JOIN v
        ),
        pd AS (SELECT doc_id, avg(lp) AS avg_logp
               FROM lp GROUP BY doc_id),
        sc AS (
            SELECT d.doc_id, exp(-pd.avg_logp) AS ppl
            FROM (SELECT doc_id FROM documents) d
            LEFT JOIN pd USING (doc_id)
        ),
        ts AS (SELECT quantile_cont(ppl,
                      [1.0/3, 2.0/3]) AS t FROM sc)
        SELECT doc_id,
               floor(ppl * 10000 + 0.5) / 10000 AS ppl,
               CASE WHEN ppl IS NULL THEN NULL ELSE
                 CAST((CASE WHEN ppl > t[1] THEN 1 ELSE 0 END)
                    + (CASE WHEN ppl > t[2] THEN 1 ELSE 0 END)
                    AS INT) END AS bucket
        FROM sc CROSS JOIN ts
    """,
    # the rule→classifier funnel: q217's Gopher arithmetic AND
    # q221's md5 threshold, composed per document then folded per
    # source — both stages replayed so the funnel counts grade the
    # composition
    "q223_quality_funnel": r"""
        WITH arr AS (
          SELECT source, text,
                 list_filter(string_split_regex(coalesce(text, ''),
                             '\s+'), w -> w <> '') AS words,
                 list_filter(string_split(coalesce(text, ''),
                             chr(10)), x -> NOT regexp_matches(x, '^\s*$')) AS lines,
                 len(regexp_extract_all(coalesce(text, ''),
                     '#|\.\.\.|…')) AS n_sym
          FROM documents),
        m AS (
          SELECT source, text,
                 len(words) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   CAST(list_sum(list_transform(words,
                        w -> length(w))) AS DOUBLE) / len(words)
                 END AS mean_wl,
                 CASE WHEN len(words) > 0 THEN
                   CAST(n_sym AS DOUBLE) / len(words)
                 END AS sym_r,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '^\s*[-*•‣▪]')))
                        AS DOUBLE) / len(lines)
                 END AS bullet_f,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '(\.\.\.|…)\s*$')))
                        AS DOUBLE) / len(lines)
                 END AS ell_f,
                 CASE WHEN len(words) > 0 THEN
                   CAST(len(list_filter(words, w ->
                        regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(words)
                 END AS alpha_f,
                 ((CASE WHEN list_contains(words, 'the')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'be')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'to')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'of')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'and')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'that')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'have')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'with')
                        THEN 1 ELSE 0 END)) AS stop_hits
          FROM arr),
        k AS (
          SELECT source,
                 ((n_words >= 40 AND n_words <= 100000)
                  AND coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0,
                               FALSE)
                  AND coalesce(sym_r <= 0.1, FALSE)
                  AND coalesce(bullet_f <= 0.9, TRUE)
                  AND coalesce(ell_f <= 0.3, TRUE)
                  AND coalesce(alpha_f >= 0.8, FALSE)
                  AND stop_hits >= 1) AS rule_keep,
                 coalesce(('0x' || substr(md5(text), 1, 8))::BIGINT
                          >= 2147483648, FALSE) AS clf_keep
          FROM m)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_raw,
               CAST(sum(CASE WHEN rule_keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rule_keep,
               CAST(sum(CASE WHEN rule_keep AND clf_keep
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
               floor(sum(CASE WHEN rule_keep AND clf_keep
                         THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS final_rate
        FROM k GROUP BY source
    """,
    # the model-scored gate's FAKE path is content-addressed md5
    # arithmetic, replayed exactly: the engine's Arrow kernel hashes
    # utf8(text) with hashlib, DuckDB with its md5 — same bytes,
    # same top-32-bit integer, no rounding anywhere (keep NULL-safe:
    # a NULL text never keeps)
    "q221_classifier_gate": r"""
        SELECT doc_id, source,
               ('0x' || substr(md5(text), 1, 8))::BIGINT
                 AS score_u32,
               coalesce(('0x' || substr(md5(text), 1, 8))::BIGINT
                        >= 2147483648, FALSE) AS keep
        FROM documents
    """,
    # the fake embedder is content-addressed md5 arithmetic per
    # (text, component) pair, replayed exactly: comp_u32 is the
    # lossless integer recovery of each double component (u32/2^31-1
    # is float64-exact), so the comparison is integer-exact; NULL
    # text embeds NULL and contributes no exploded rows either side
    "q225_embed_text": r"""
        SELECT doc_id, j,
               ('0x' || substr(md5(text || ':' ||
                    CAST(j AS VARCHAR)), 1, 8))::BIGINT AS comp_u32,
               floor((('0x' || substr(md5(text || ':' ||
                        CAST(j AS VARCHAR)), 1, 8))::BIGINT
                      / 2147483648.0 - 1) * 10000 + 0.5) / 10000
                 AS comp
        FROM documents
        CROSS JOIN (SELECT UNNEST(range(0, 8)) AS j) r
        WHERE text IS NOT NULL
    """,
    # raw text -> fake md5 embeddings (bit-exact doubles, see
    # q225) -> the q101 k-means + min-id cosine-drop replay at
    # dim 16 / tau 0.9 over documents plus 30 exact-copy rows
    "q226_embed_semdedup": r"""
        WITH corpus AS (
          SELECT doc_id, text FROM documents WHERE text IS NOT NULL
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id, text FROM documents
          WHERE text IS NOT NULL AND doc_id < 30
        ),
        emb AS (
          SELECT doc_id, list_transform(range(0, 16), j ->
            ('0x' || substr(md5(text || ':' ||
                 CAST(j AS VARCHAR)), 1, 8))::BIGINT
              / 2147483648.0 - 1) AS v
          FROM corpus
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY doc_id) AS INT)
                   AS cid, v AS c
          FROM (SELECT doc_id, v FROM emb ORDER BY doc_id LIMIT 8)
        ),
        a1 AS (
          SELECT doc_id, v, cid FROM (
            SELECT e.doc_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.doc_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid)
                     AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 16) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT doc_id, v, cid FROM (
            SELECT e.doc_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.doc_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid)
                     AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 16) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        ),
        final AS (
          SELECT doc_id, v, cid FROM (
            SELECT e.doc_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.doc_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid)
                     AS rn
            FROM emb e CROSS JOIN c2 c) WHERE rn = 1
        )
        SELECT f.doc_id, f.cid - 1 AS cluster FROM final f
        WHERE NOT EXISTS (
          SELECT 1 FROM final g
          WHERE g.cid = f.cid AND g.doc_id < f.doc_id
            AND list_dot_product(g.v, f.v)
                / (sqrt(list_dot_product(g.v, g.v))
                   * sqrt(list_dot_product(f.v, f.v))) >= 0.9
        )
    """,
    # the classifier-gated streaming monitor's batch identity: q221's
    # md5 keep arithmetic folded per source over the raw corpus
    "q222_classifier_rate_ingest": r"""
        WITH k AS (
          SELECT source,
                 coalesce(('0x' || substr(md5(text), 1, 8))::BIGINT
                          >= 2147483648, FALSE) AS keep
          FROM documents)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_keep,
               floor(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS keep_rate
        FROM k GROUP BY source
    """,
    # the streaming funnel: q223's two-stage arithmetic (q217's
    # Gopher thresholds AND q221's md5 classifier at 0.5) folded to
    # the keep-rate monitor's (n_docs, n_keep, keep_rate) contract —
    # the state identity makes two-wave == this one-shot replay
    "q227_composed_rate_ingest": r"""
        WITH arr AS (
          SELECT source, text,
                 list_filter(string_split_regex(coalesce(text, ''),
                             '\s+'), w -> w <> '') AS words,
                 list_filter(string_split(coalesce(text, ''),
                             chr(10)),
                             x -> NOT regexp_matches(x, '^\s*$'))
                   AS lines,
                 len(regexp_extract_all(coalesce(text, ''),
                     '#|\.\.\.|…')) AS n_sym
          FROM documents),
        m AS (
          SELECT source, text,
                 len(words) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   CAST(list_sum(list_transform(words,
                        w -> length(w))) AS DOUBLE) / len(words)
                 END AS mean_wl,
                 CASE WHEN len(words) > 0 THEN
                   CAST(n_sym AS DOUBLE) / len(words)
                 END AS sym_r,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '^\s*[-*•‣▪]')))
                        AS DOUBLE) / len(lines)
                 END AS bullet_f,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '(\.\.\.|…)\s*$')))
                        AS DOUBLE) / len(lines)
                 END AS ell_f,
                 CASE WHEN len(words) > 0 THEN
                   CAST(len(list_filter(words, w ->
                        regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(words)
                 END AS alpha_f,
                 ((CASE WHEN list_contains(words, 'the')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'be')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'to')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'of')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'and')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'that')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'have')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'with')
                        THEN 1 ELSE 0 END)) AS stop_hits
          FROM arr),
        k AS (
          SELECT source,
                 (((n_words >= 40 AND n_words <= 100000)
                   AND coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0,
                                FALSE)
                   AND coalesce(sym_r <= 0.1, FALSE)
                   AND coalesce(bullet_f <= 0.9, TRUE)
                   AND coalesce(ell_f <= 0.3, TRUE)
                   AND coalesce(alpha_f >= 0.8, FALSE)
                   AND stop_hits >= 1)
                  AND coalesce(('0x' || substr(md5(text), 1, 8))
                               ::BIGINT >= 2147483648, FALSE))
                   AS keep
          FROM m)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_keep,
               floor(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS keep_rate
        FROM k GROUP BY source
    """,
    # the clean-then-card composition: q216's C4 spelling
    # keep-filtered, then q121's GROUPING()-aware cube over the
    # CLEANED text — both stages replayed, cell hashes grade the
    # whole composition
    "q220_clean_then_datacard": r"""
        WITH dirty AS (
          SELECT doc_id, source, lang,
                 concat_ws(chr(10),
                   substr(text, 1, 40) || '.',
                   substr(text, 41, 30),
                   'Too short.',
                   CASE WHEN doc_id % 3 = 0 THEN
                     'Please enable javascript to continue here.'
                   ELSE substr(text, 71, 40) || '!' END,
                   CASE WHEN doc_id % 5 = 0 THEN
                     substr(text, 111, 40) || '?'
                   ELSE substr(text, 111, 40) END,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'a curly { brace' ELSE '' END,
                   CASE WHEN doc_id % 11 = 0
                        THEN 'this page is Lorem Ipsum filler'
                        ELSE '' END) AS t
          FROM documents),
        arr AS (
          SELECT doc_id, source, lang, t,
                 list_filter(string_split(t, chr(10)),
                             x -> NOT regexp_matches(x, '^\s*$')) AS lines
          FROM dirty),
        k AS (
          SELECT doc_id, source, lang, t,
                 array_to_string(list_filter(lines, x ->
                   regexp_matches(x, '[.!?"”]\s*$')
                   AND NOT regexp_matches(x, '(\.\.\.|…)\s*$')
                   AND len(list_filter(
                         string_split_regex(x, '\s+'),
                         w -> w <> '')) >= 5
                   AND NOT contains(lower(x), 'javascript')
                   AND NOT contains(lower(x), 'terms of use')
                   AND NOT contains(lower(x), 'privacy policy')
                   AND NOT contains(lower(x), 'cookie policy')
                   AND NOT contains(lower(x), 'uses cookies')
                   AND NOT contains(lower(x), 'use of cookies')
                   AND NOT contains(lower(x), 'use cookies')),
                   chr(10)) AS clean
          FROM arr),
        kept AS (
          SELECT source, lang, clean AS text,
                 ('0x' || substr(md5(regexp_replace(lower(trim(clean)),
                      '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
          FROM k
          WHERE len(regexp_extract_all(clean, '[.!?]')) >= 2
            AND NOT contains(t, '{')
            AND NOT contains(lower(t), 'lorem ipsum'))
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS BIGINT) AS gid,
               count(*) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS total_tokens,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               count(DISTINCT fp) AS n_distinct,
               floor((1 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS dup_ratio
        FROM kept
        GROUP BY CUBE (source, lang)
    """,
    # the lang-composed Gopher pipeline: q217's keep arithmetic
    # folded per source over KEPT docs only, plus their word total
    "q219_lang_gopher_pipeline": r"""
        WITH arr AS (
          SELECT source,
                 list_filter(string_split_regex(coalesce(text, ''),
                             '\s+'), w -> w <> '') AS words,
                 list_filter(string_split(coalesce(text, ''),
                             chr(10)), x -> NOT regexp_matches(x, '^\s*$')) AS lines,
                 len(regexp_extract_all(coalesce(text, ''),
                     '#|\.\.\.|…')) AS n_sym
          FROM documents),
        m AS (
          SELECT source,
                 len(words) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   CAST(list_sum(list_transform(words,
                        w -> length(w))) AS DOUBLE) / len(words)
                 END AS mean_wl,
                 CASE WHEN len(words) > 0 THEN
                   CAST(n_sym AS DOUBLE) / len(words)
                 END AS sym_r,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '^\s*[-*•‣▪]')))
                        AS DOUBLE) / len(lines)
                 END AS bullet_f,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '(\.\.\.|…)\s*$')))
                        AS DOUBLE) / len(lines)
                 END AS ell_f,
                 CASE WHEN len(words) > 0 THEN
                   CAST(len(list_filter(words, w ->
                        regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(words)
                 END AS alpha_f,
                 ((CASE WHEN list_contains(words, 'the')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'be')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'to')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'of')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'and')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'that')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'have')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'with')
                        THEN 1 ELSE 0 END)) AS stop_hits
          FROM arr)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_keep,
               CAST(sum(n_words) AS BIGINT) AS total_words
        FROM m
        WHERE (n_words >= 40 AND n_words <= 100000)
          AND coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0, FALSE)
          AND coalesce(sym_r <= 0.1, FALSE)
          AND coalesce(bullet_f <= 0.9, TRUE)
          AND coalesce(ell_f <= 0.3, TRUE)
          AND coalesce(alpha_f >= 0.8, FALSE)
          AND stop_hits >= 1
        GROUP BY source
    """,
    # the curation ingest's batch identity: q216's C4 spelling
    # (min_sentences=2) keep-filtered and folded per source — total
    # curated chars over the CLEANED text
    "q218_curation_ingest": r"""
        WITH dirty AS (
          SELECT doc_id, source,
                 concat_ws(chr(10),
                   substr(text, 1, 40) || '.',
                   substr(text, 41, 30),
                   'Too short.',
                   CASE WHEN doc_id % 3 = 0 THEN
                     'Please enable javascript to continue here.'
                   ELSE substr(text, 71, 40) || '!' END,
                   CASE WHEN doc_id % 5 = 0 THEN
                     substr(text, 111, 40) || '?'
                   ELSE substr(text, 111, 40) END,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'a curly { brace' ELSE '' END,
                   CASE WHEN doc_id % 11 = 0
                        THEN 'this page is Lorem Ipsum filler'
                        ELSE '' END) AS t
          FROM documents),
        arr AS (
          SELECT doc_id, source, t,
                 list_filter(string_split(t, chr(10)),
                             x -> NOT regexp_matches(x, '^\s*$')) AS lines
          FROM dirty),
        k AS (
          SELECT doc_id, source, t,
                 array_to_string(list_filter(lines, x ->
                   regexp_matches(x, '[.!?"”]\s*$')
                   AND NOT regexp_matches(x, '(\.\.\.|…)\s*$')
                   AND len(list_filter(
                         string_split_regex(x, '\s+'),
                         w -> w <> '')) >= 5
                   AND NOT contains(lower(x), 'javascript')
                   AND NOT contains(lower(x), 'terms of use')
                   AND NOT contains(lower(x), 'privacy policy')
                   AND NOT contains(lower(x), 'cookie policy')
                   AND NOT contains(lower(x), 'uses cookies')
                   AND NOT contains(lower(x), 'use of cookies')
                   AND NOT contains(lower(x), 'use cookies')),
                   chr(10)) AS clean
          FROM arr),
        kept AS (
          SELECT source, clean
          FROM k
          WHERE len(regexp_extract_all(clean, '[.!?]')) >= 2
            AND NOT contains(t, '{')
            AND NOT contains(lower(t), 'lorem ipsum'))
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(length(clean)) AS BIGINT) AS total_chars
        FROM kept GROUP BY source
    """,
    # the gate-rate monitor's batch identity: q215's Gopher word/line
    # arithmetic (min_words=40, min_stop_words=1, other thresholds at
    # the engine defaults) folded per source over the raw corpus
    "q217_gate_rate_ingest": r"""
        WITH arr AS (
          SELECT source,
                 list_filter(string_split_regex(coalesce(text, ''),
                             '\s+'), w -> w <> '') AS words,
                 list_filter(string_split(coalesce(text, ''),
                             chr(10)), x -> NOT regexp_matches(x, '^\s*$')) AS lines,
                 len(regexp_extract_all(coalesce(text, ''),
                     '#|\.\.\.|…')) AS n_sym
          FROM documents),
        m AS (
          SELECT source,
                 len(words) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   CAST(list_sum(list_transform(words,
                        w -> length(w))) AS DOUBLE) / len(words)
                 END AS mean_wl,
                 CASE WHEN len(words) > 0 THEN
                   CAST(n_sym AS DOUBLE) / len(words)
                 END AS sym_r,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '^\s*[-*•‣▪]')))
                        AS DOUBLE) / len(lines)
                 END AS bullet_f,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '(\.\.\.|…)\s*$')))
                        AS DOUBLE) / len(lines)
                 END AS ell_f,
                 CASE WHEN len(words) > 0 THEN
                   CAST(len(list_filter(words, w ->
                        regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(words)
                 END AS alpha_f,
                 ((CASE WHEN list_contains(words, 'the')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'be')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'to')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'of')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'and')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'that')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'have')
                        THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(words, 'with')
                        THEN 1 ELSE 0 END)) AS stop_hits
          FROM arr),
        k AS (
          SELECT source,
                 ((n_words >= 40 AND n_words <= 100000)
                  AND coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0,
                               FALSE)
                  AND coalesce(sym_r <= 0.1, FALSE)
                  AND coalesce(bullet_f <= 0.9, TRUE)
                  AND coalesce(ell_f <= 0.3, TRUE)
                  AND coalesce(alpha_f >= 0.8, FALSE)
                  AND stop_hits >= 1) AS keep
          FROM m)
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_keep,
               floor(sum(CASE WHEN keep THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE) * 10000 + 0.5)
                 / 10000 AS keep_rate
        FROM k GROUP BY source
    """,
    # the C4 rules' line/list arithmetic replayed verbatim (same
    # deterministic dirt; sentence count = terminal marks in the
    # KEPT text; booleans on both sides from the same predicates)
    "q216_c4_clean": r"""
        WITH dirty AS (
          SELECT doc_id,
                 concat_ws(chr(10),
                   substr(text, 1, 40) || '.',
                   substr(text, 41, 30),
                   'Too short.',
                   CASE WHEN doc_id % 3 = 0 THEN
                     'Please enable javascript to continue here.'
                   ELSE substr(text, 71, 40) || '!' END,
                   CASE WHEN doc_id % 5 = 0 THEN
                     substr(text, 111, 40) || '?'
                   ELSE substr(text, 111, 40) END,
                   CASE WHEN doc_id % 7 = 0
                        THEN 'a curly { brace' ELSE '' END,
                   CASE WHEN doc_id % 11 = 0
                        THEN 'this page is Lorem Ipsum filler'
                        ELSE '' END) AS t
          FROM documents),
        arr AS (
          SELECT doc_id, t,
                 list_filter(string_split(t, chr(10)),
                             x -> NOT regexp_matches(x, '^\s*$')) AS lines
          FROM dirty),
        k AS (
          SELECT doc_id, t, lines,
                 list_filter(lines, x ->
                   regexp_matches(x, '[.!?"”]\s*$')
                   AND NOT regexp_matches(x, '(\.\.\.|…)\s*$')
                   AND len(list_filter(
                         string_split_regex(x, '\s+'),
                         w -> w <> '')) >= 5
                   AND NOT contains(lower(x), 'javascript')
                   AND NOT contains(lower(x), 'terms of use')
                   AND NOT contains(lower(x), 'privacy policy')
                   AND NOT contains(lower(x), 'cookie policy')
                   AND NOT contains(lower(x), 'uses cookies')
                   AND NOT contains(lower(x), 'use of cookies')
                   AND NOT contains(lower(x), 'use cookies'))
                 AS kept
          FROM arr),
        m AS (
          SELECT doc_id,
                 CAST(len(lines) AS INT) AS n_lines,
                 CAST(len(kept) AS INT) AS n_kept,
                 array_to_string(kept, chr(10)) AS clean,
                 contains(t, '{') AS has_brace,
                 contains(lower(t), 'lorem ipsum') AS has_lorem
          FROM k)
        SELECT doc_id, n_lines, n_kept,
               CAST(len(regexp_extract_all(clean, '[.!?]')) AS INT)
                 AS n_sentences,
               has_brace, has_lorem,
               (len(regexp_extract_all(clean, '[.!?]')) >= 3
                AND NOT has_brace AND NOT has_lorem) AS keep,
               clean
        FROM m
    """,
    # the Gopher gate's word/line-array arithmetic replayed verbatim
    # (same deterministic dirt, same thresholds, booleans computed on
    # the unrounded doubles both sides, 4dp on exposed fractions)
    "q215_gopher_quality_gate": r"""
        WITH dirty AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 5 = 0 THEN
                      chr(10) || '- bullet one'
                      || chr(10) || '- bullet two'
                      || chr(10) || '• bullet three'
                      || chr(10) || 'plain tail...'
                    ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                    THEN ' # # # # # # # # # #' ELSE '' END
                 || CASE WHEN doc_id % 11 = 0 THEN
                      ' 111 222 333 444 555 666 777 888 999 000'
                      || ' 111 222 333 444 555 666 777 888 999 000'
                    ELSE '' END
                 || CASE WHEN doc_id % 13 = 0
                    THEN ' the be to of and that have with'
                    ELSE '' END AS t
          FROM documents),
        arr AS (
          SELECT doc_id,
                 list_filter(string_split_regex(t, '\s+'),
                             w -> w <> '') AS words,
                 list_filter(string_split(t, chr(10)),
                             x -> NOT regexp_matches(x, '^\s*$')) AS lines,
                 len(regexp_extract_all(t, '#|\.\.\.|…')) AS n_sym
          FROM dirty),
        m AS (
          SELECT doc_id,
                 CAST(len(words) AS INT) AS n_words,
                 CASE WHEN len(words) > 0 THEN
                   CAST(list_sum(list_transform(words,
                        w -> length(w))) AS DOUBLE) / len(words)
                 END AS mean_wl,
                 CASE WHEN len(words) > 0 THEN
                   CAST(n_sym AS DOUBLE) / len(words)
                 END AS sym_r,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '^\s*[-*•‣▪]')))
                        AS DOUBLE) / len(lines)
                 END AS bullet_f,
                 CASE WHEN len(lines) > 0 THEN
                   CAST(len(list_filter(lines, x ->
                        regexp_matches(x, '(\.\.\.|…)\s*$')))
                        AS DOUBLE) / len(lines)
                 END AS ell_f,
                 CASE WHEN len(words) > 0 THEN
                   CAST(len(list_filter(words, w ->
                        regexp_matches(w, '[A-Za-z]')))
                        AS DOUBLE) / len(words)
                 END AS alpha_f,
                 CAST(
                   (CASE WHEN list_contains(words, 'the')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'be')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'to')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'of')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'and')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'that')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'have')
                         THEN 1 ELSE 0 END)
                 + (CASE WHEN list_contains(words, 'with')
                         THEN 1 ELSE 0 END) AS INT) AS stop_hits
          FROM arr)
        SELECT doc_id, n_words,
               floor(mean_wl * 10000 + 0.5) / 10000
                 AS mean_word_len,
               floor(sym_r * 10000 + 0.5) / 10000
                 AS symbol_word_ratio,
               floor(bullet_f * 10000 + 0.5) / 10000
                 AS bullet_line_frac,
               floor(ell_f * 10000 + 0.5) / 10000
                 AS ellipsis_line_frac,
               floor(alpha_f * 10000 + 0.5) / 10000
                 AS alpha_word_frac,
               stop_hits AS stop_word_hits,
               (n_words >= 40 AND n_words <= 100000)
                 AS pass_word_count,
               coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0, FALSE)
                 AS pass_mean_word_len,
               coalesce(sym_r <= 0.1, FALSE) AS pass_symbol_ratio,
               coalesce(bullet_f <= 0.5, TRUE) AS pass_bullet_lines,
               coalesce(ell_f <= 0.15, TRUE) AS pass_ellipsis_lines,
               coalesce(alpha_f >= 0.8, FALSE) AS pass_alpha_words,
               (stop_hits >= 1) AS pass_stop_words,
               ((n_words >= 40 AND n_words <= 100000)
                AND coalesce(mean_wl >= 3.0 AND mean_wl <= 10.0,
                             FALSE)
                AND coalesce(sym_r <= 0.1, FALSE)
                AND coalesce(bullet_f <= 0.5, TRUE)
                AND coalesce(ell_f <= 0.15, TRUE)
                AND coalesce(alpha_f >= 0.8, FALSE)
                AND stop_hits >= 1) AS keep
        FROM m
    """,
    # the z-monitor's batch identity run directly over the raw
    # corpus: exact int64 moment sums through the identical fixed
    # double sequence, z rounded 4dp, flag on the unrounded z
    "q210_z_monitor_ingest": """
        WITH e AS (SELECT source AS g,
                          CAST(length(text) AS BIGINT) AS v
                   FROM documents),
        vc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
               FROM e GROUP BY g, v),
        m AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
                     CAST(sum(v * cnt) AS BIGINT) AS s,
                     CAST(sum(v * v * cnt) AS BIGINT) AS ss
              FROM vc GROUP BY g),
        mm AS (SELECT g, CAST(s AS DOUBLE) / n AS mu,
                      CASE WHEN n > 1 THEN
                        sqrt(greatest(
                          (CAST(ss AS DOUBLE)
                           - CAST(s AS DOUBLE) * s / n) / (n - 1),
                          0.0))
                      END AS sd
               FROM m)
        SELECT vc.g, vc.v, vc.cnt,
               CASE WHEN sd > 0 THEN
                 floor((CAST(v AS DOUBLE) - mu) / sd * 10000 + 0.5)
                   / 10000
               END AS z,
               coalesce(CASE WHEN sd > 0 THEN
                          abs((CAST(v AS DOUBLE) - mu) / sd) > 1.5
                        END, FALSE) AS is_anomaly
        FROM vc JOIN mm ON vc.g = mm.g
    """,
    "q198_chi_square_ingest": """
        WITH e AS (SELECT source AS a,
                          CAST(length(text) % 7 AS BIGINT) AS b
                   FROM documents
                   WHERE source IN ('src1', 'src2')),
        cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
                  FROM e GROUP BY a, b),
        j AS (SELECT a, b, o,
                     CAST(sum(o) OVER (PARTITION BY a) AS BIGINT)
                       AS ra,
                     CAST(sum(o) OVER (PARTITION BY b) AS BIGINT)
                       AS cb,
                     CAST(sum(o) OVER () AS BIGINT) AS nn
              FROM cells),
        g AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                     CAST(count(DISTINCT a) AS BIGINT) AS r,
                     CAST(count(DISTINCT b) AS BIGINT) AS c,
                     list_reduce(
                       list((CAST(o AS DOUBLE)
                             - CAST(ra * cb AS DOUBLE) / nn)
                            * (CAST(o AS DOUBLE)
                               - CAST(ra * cb AS DOUBLE) / nn)
                            / (CAST(ra * cb AS DOUBLE) / nn)
                            ORDER BY a NULLS FIRST, b NULLS FIRST),
                       (x, y) -> x + y) AS chi2
              FROM j)
        SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof, chi2,
               CASE WHEN least(r - 1, c - 1) > 0 THEN
                 sqrt(chi2 / CAST(n * least(r - 1, c - 1)
                                  AS DOUBLE)) END AS cramers_v
        FROM g
    """,
    "q195_psi_ingest": """
        WITH e AS (SELECT source,
                          CAST(length(text) AS BIGINT) AS v
                   FROM documents
                   WHERE source IN ('src1', 'src2')),
        bounds AS (SELECT min(v) AS lo, max(v) AS hi FROM e),
        b AS (SELECT (v - lo) * 10 // (hi - lo + 1) AS bucket,
                     source FROM e, bounds),
        cnt AS (SELECT bucket,
                       CAST(sum(CASE WHEN source = 'src1'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS ca,
                       CAST(sum(CASE WHEN source = 'src2'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS cb
                FROM b GROUP BY bucket),
        allb AS (SELECT r.bucket, coalesce(ca, 0) AS ca,
                        coalesce(cb, 0) AS cb
                 FROM (SELECT unnest(range(0, 10)) AS bucket) r
                 LEFT JOIN cnt USING (bucket)),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM allb)
        SELECT n.n_a, n.n_b,
               list_reduce(
                 list(((CAST(ca AS DOUBLE) + 1.0) / (n.n_a + 10)
                       - (CAST(cb AS DOUBLE) + 1.0) / (n.n_b + 10))
                      * ln(((CAST(ca AS DOUBLE) + 1.0)
                            / (n.n_a + 10))
                           / ((CAST(cb AS DOUBLE) + 1.0)
                              / (n.n_b + 10)))
                      ORDER BY bucket),
                 (a, b) -> a + b) AS psi
        FROM allb, n GROUP BY n.n_a, n.n_b
    """,
    # q184 with the hot-shingle cap: shingles in more than 2 docs are
    # pruned BEFORE the equi-join; |A| recomputed over the kept set
    "q194_containment_capped": r"""
        WITH docs AS (SELECT * FROM documents WHERE doc_id < 150),
        t AS (SELECT doc_id,
                     string_split_regex(trim(text), '\s+') AS toks
              FROM docs),
        sh0 AS (SELECT DISTINCT doc_id,
                       array_to_string(list_slice(toks, i, i + 2), ' ')
                         AS s
                FROM t, UNNEST(range(1, greatest(len(toks) - 1, 2)))
                        AS r(i)),
        keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= 2),
        sh AS (SELECT sh0.doc_id, sh0.s FROM sh0 JOIN keep USING (s)),
        sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
                  FROM sh GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS i
                  FROM sh a JOIN sh b
                    ON a.s = b.s AND a.doc_id <> b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b, i / sizes.n AS containment
        FROM inter JOIN sizes ON inter.id_a = sizes.doc_id
        WHERE i / sizes.n >= 0.6
    """,
    # q171's integer rounds with per-edge weights:
    # contrib = (rank * w) // wsum
    "q185_weighted_pagerank": """
        WITH e AS (
          SELECT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                 'p' || CAST(l_partkey AS VARCHAR) AS dst,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2),
        ed AS (SELECT src, dst, w FROM e
               UNION ALL SELECT dst AS src, src AS dst, w FROM e),
        deg AS (SELECT src, CAST(sum(w) AS BIGINT) AS d
                FROM ed GROUP BY src),
        n AS (SELECT DISTINCT src AS node FROM ed
              UNION SELECT DISTINCT dst AS node FROM ed),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM n),
        i1 AS (SELECT ed.dst AS node,
                      SUM((r0.r * ed.w) // deg.d) AS f
               FROM ed JOIN r0 ON ed.src = r0.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r1 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i1.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i1 USING (node)),
        i2 AS (SELECT ed.dst AS node,
                      SUM((r1.r * ed.w) // deg.d) AS f
               FROM ed JOIN r1 ON ed.src = r1.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r2 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i2.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i2 USING (node)),
        i3 AS (SELECT ed.dst AS node,
                      SUM((r2.r * ed.w) // deg.d) AS f
               FROM ed JOIN r2 ON ed.src = r2.node
                       JOIN deg ON ed.src = deg.src
               GROUP BY ed.dst),
        r3 AS (SELECT n.node,
                      CAST(150000 + COALESCE((i3.f * 17) // 20, 0)
                           AS BIGINT) AS r
               FROM n LEFT JOIN i3 USING (node))
        SELECT node, r AS rank_units, r / 1000000 AS pr FROM r3
    """,
    # endpoint-degree Pearson r from exact int64 moments; den =
    # sqrt(vx) * sqrt(vy) in the same op order as the Spark side
    "q186_assortativity": """
        WITH raw AS (SELECT c_custkey % 400 AS s,
                            (c_custkey * 17 + 3) % 400 AS d
                     FROM customer),
        e AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
              FROM raw WHERE s <> d),
        bo AS (SELECT a, b FROM e
                 UNION ALL SELECT b AS a, a AS b FROM e),
        deg AS (SELECT a, CAST(count(*) AS BIGINT) AS dg
                FROM bo GROUP BY a),
        p AS (SELECT da.dg AS x, db.dg AS y
              FROM bo JOIN deg da ON bo.a = da.a
                        JOIN deg db ON bo.b = db.a),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM p)
        SELECT n AS n_edge_ends,
               CASE WHEN sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                         * sqrt(CAST(n * syy - sy * sy AS DOUBLE))
                         > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                            * sqrt(CAST(n * syy - sy * sy
                                        AS DOUBLE))) END
                 AS assortativity
        FROM m
    """,
    # TPC-H Q3 shape (q144's rounding + tie-break discipline)
    "q187_lang_shipping_priority": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               floor(sum(l_extendedprice * (1 - l_discount))
                     * 10000 + 0.5) / 10000 AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
                 o_orderkey
        LIMIT 10
    """,
    # doubled average ranks (2*below + t + 1, pure int64), then U
    # and the tie-corrected z in the same fixed double-op order
    "q188_mann_whitney": """
        WITH e AS (SELECT event_type,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                            AS v
                   FROM events
                   WHERE value IS NOT NULL
                     AND event_type IN ('view', 'purchase')),
        cnt AS (SELECT v,
                       CAST(sum(CASE WHEN event_type = 'view'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS ca,
                       CAST(sum(CASE WHEN event_type = 'purchase'
                                     THEN 1 ELSE 0 END) AS BIGINT)
                         AS cb
                FROM e GROUP BY v),
        c AS (SELECT v, ca, cb,
                     COALESCE(CAST(sum(ca + cb) OVER (
                       ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS BIGINT), 0) AS below
              FROM cnt),
        m AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
                     CAST(sum(cb) AS BIGINT) AS n2,
                     CAST(sum((2 * below + (ca + cb) + 1) * ca)
                          AS BIGINT) AS r2a,
                     CAST(sum((ca + cb) * (ca + cb) * (ca + cb)
                              - (ca + cb)) AS BIGINT) AS tie
              FROM c)
        SELECT n1 AS n_a, n2 AS n_b,
               r2a / 2.0 - (n1 * (n1 + 1)) / 2.0 AS u,
               CASE WHEN sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                              * (CAST(n1 + n2 + 1 AS DOUBLE)
                                 - CAST(tie AS DOUBLE)
                                 / CAST((n1 + n2) * (n1 + n2 - 1)
                                        AS DOUBLE))) > 0
                    THEN ((r2a / 2.0 - (n1 * (n1 + 1)) / 2.0)
                          - (n1 * n2) / 2.0)
                         / sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0
                                * (CAST(n1 + n2 + 1 AS DOUBLE)
                                   - CAST(tie AS DOUBLE)
                                   / CAST((n1 + n2) * (n1 + n2 - 1)
                                          AS DOUBLE))) END AS z
        FROM m
    """,
    # window-sum marginals, (o-e)^2/e folded in (a, b) cell order
    "q189_chi_square": """
        WITH e AS (SELECT event_type AS a,
                          CAST(floor(value * 100 + 0.5) AS BIGINT)
                            // 2000 AS b
                   FROM events),
        cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS o
                  FROM e GROUP BY a, b),
        j AS (SELECT a, b, o,
                     CAST(sum(o) OVER (PARTITION BY a) AS BIGINT)
                       AS ra,
                     CAST(sum(o) OVER (PARTITION BY b) AS BIGINT)
                       AS cb,
                     CAST(sum(o) OVER () AS BIGINT) AS nn
              FROM cells),
        g AS (SELECT CAST(sum(o) AS BIGINT) AS n,
                     -- a NULL category is its own level (the Spark
                     -- side struct-wraps count_distinct)
                     CAST(count(DISTINCT a)
                          + max(CASE WHEN a IS NULL THEN 1 ELSE 0
                                END) AS BIGINT) AS r,
                     CAST(count(DISTINCT b)
                          + max(CASE WHEN b IS NULL THEN 1 ELSE 0
                                END) AS BIGINT) AS c,
                     list_reduce(
                       list((CAST(o AS DOUBLE)
                             - CAST(ra * cb AS DOUBLE) / nn)
                            * (CAST(o AS DOUBLE)
                               - CAST(ra * cb AS DOUBLE) / nn)
                            / (CAST(ra * cb AS DOUBLE) / nn)
                            ORDER BY a NULLS FIRST, b NULLS FIRST),
                       (x, y) -> x + y) AS chi2
              FROM j)
        SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof, chi2,
               CASE WHEN least(r - 1, c - 1) > 0 THEN
                 sqrt(chi2 / CAST(n * least(r - 1, c - 1)
                                  AS DOUBLE)) END AS cramers_v
        FROM g
    """,
    # two HITS rounds unrolled: in/out int64 sums + integer
    # max-rescaling via scalar CTEs
    "q190_hits": """
        WITH raw AS (SELECT c_custkey % 400 AS s,
                            (c_custkey * 17 + 3) % 400 AS d
                     FROM customer),
        e AS (SELECT DISTINCT s AS src, d AS dst FROM raw),
        n AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
        h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM n),
        a1r AS (SELECT e.dst AS node, CAST(sum(h0.h) AS BIGINT) AS a
                FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
        a1f AS (SELECT n.node, COALESCE(a1r.a, 0) AS a
                FROM n LEFT JOIN a1r USING (node)),
        m1 AS (SELECT max(a) AS m FROM a1f),
        a1 AS (SELECT node, CASE WHEN (SELECT m FROM m1) <= 0 THEN 0
                            ELSE (a * 1000000)
                                 // (SELECT m FROM m1) END AS a
               FROM a1f),
        h1r AS (SELECT e.src AS node, CAST(sum(a1.a) AS BIGINT) AS h
                FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
        h1f AS (SELECT n.node, COALESCE(h1r.h, 0) AS h
                FROM n LEFT JOIN h1r USING (node)),
        mh1 AS (SELECT max(h) AS m FROM h1f),
        h1 AS (SELECT node, CASE WHEN (SELECT m FROM mh1) <= 0
                            THEN 0
                            ELSE (h * 1000000)
                                 // (SELECT m FROM mh1) END AS h
               FROM h1f),
        a2r AS (SELECT e.dst AS node, CAST(sum(h1.h) AS BIGINT) AS a
                FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
        a2f AS (SELECT n.node, COALESCE(a2r.a, 0) AS a
                FROM n LEFT JOIN a2r USING (node)),
        m2 AS (SELECT max(a) AS m FROM a2f),
        a2 AS (SELECT node, CASE WHEN (SELECT m FROM m2) <= 0 THEN 0
                            ELSE (a * 1000000)
                                 // (SELECT m FROM m2) END AS a
               FROM a2f),
        h2r AS (SELECT e.src AS node, CAST(sum(a2.a) AS BIGINT) AS h
                FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
        h2f AS (SELECT n.node, COALESCE(h2r.h, 0) AS h
                FROM n LEFT JOIN h2r USING (node)),
        mh2 AS (SELECT max(h) AS m FROM h2f),
        h2 AS (SELECT node, CASE WHEN (SELECT m FROM mh2) <= 0
                            THEN 0
                            ELSE (h * 1000000)
                                 // (SELECT m FROM mh2) END AS h
               FROM h2f)
        SELECT h2.node, h2.h AS hub_units, a2.a AS auth_units
        FROM h2 JOIN a2 USING (node)
    """,
    # bounded recursive enumeration of path lengths, then min per
    # node — equals the Bellman-Ford fixpoint for positive weights
    # (bound 300 > (nodes-1) * max_weight = 236)
    "q191_shortest_paths": """
        WITH RECURSIVE
        e AS (SELECT DISTINCT c_custkey % 60 AS src,
                     (c_custkey * 13 + 7) % 60 AS dst,
                     1 + c_custkey % 4 AS w
              FROM customer),
        reach(node, dist) AS (
            SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            UNION
            SELECT e.dst, r.dist + e.w
            FROM reach r JOIN e ON r.node = e.src
            WHERE r.dist + e.w <= 300)
        SELECT node, CAST(min(dist) AS BIGINT) AS dist
        FROM reach GROUP BY node
    """,
    # q169's funnel chain labels converters; q170's exact cents per
    # user; q179's KS pattern between the two labels
    "q192_conversion_drift": """
        WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
                    WHERE event_type = 'view' GROUP BY user_id),
        t2 AS (SELECT e.user_id, min(e.ts) AS t
               FROM events e JOIN t1 ON e.user_id = t1.user_id
               WHERE e.event_type = 'click' AND e.ts > t1.t
               GROUP BY e.user_id),
        per AS (SELECT user_id,
                       CAST(coalesce(sum(CAST(floor(value * 100
                                                    + 0.5)
                                              AS BIGINT)), 0)
                            AS BIGINT) AS m
                FROM events GROUP BY user_id),
        lab AS (SELECT per.user_id, per.m,
                       CASE WHEN t2.user_id IS NOT NULL
                            THEN 'conv' ELSE 'non' END AS side
                FROM per LEFT JOIN t2 ON per.user_id = t2.user_id),
        a AS (SELECT m AS v, CAST(count(*) AS BIGINT) AS ca
              FROM lab WHERE side = 'conv' GROUP BY m),
        b AS (SELECT m AS v, CAST(count(*) AS BIGINT) AS cb
              FROM lab WHERE side = 'non' GROUP BY m),
        u AS (SELECT coalesce(a.v, b.v) AS v,
                     coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v),
        c AS (SELECT v,
                     sum(ca) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_a,
                     sum(cb) OVER (ORDER BY v
                                   ROWS UNBOUNDED PRECEDING) AS cum_b
              FROM u),
        n AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                     CAST(sum(cb) AS BIGINT) AS n_b FROM u)
        SELECT n.n_a, n.n_b,
               abs(cum_a / n.n_a - cum_b / n.n_b) AS d_stat,
               c.v AS at_value
        FROM c, n
        ORDER BY d_stat DESC, at_value ASC LIMIT 1
    """,
    # q139's full IVF-PQ replay (one query, top-10 ADC candidates)
    # -> exact-cosine refine (rel, 4dp) -> q154's greedy MMR CTEs
    "q159_retrieve_refine_diversify": """
        WITH emb AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid,
                 v AS c
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        a1 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        ),
        asg AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c2 c) WHERE rn = 1
        ),
        pr AS (
          SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     list_sum(list_transform(list_zip(q.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb q CROSS JOIN c2 c WHERE q.vec_id < 1)
          WHERE rn <= 2
        ),
        smp AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16),
        cb AS (
          SELECT j.j,
                 CAST(row_number() OVER (PARTITION BY j.j
                      ORDER BY smp.vec_id) AS INT) AS ccid,
                 smp.v[j.j*8+1 : j.j*8+8] AS c
          FROM smp CROSS JOIN (SELECT unnest(range(8)) AS j) j
        ),
        enc AS (
          SELECT vec_id, j, ccid - 1 AS code FROM (
            SELECT e.vec_id, cb.j, cb.ccid,
                   row_number() OVER (PARTITION BY e.vec_id, cb.j
                     ORDER BY list_sum(list_transform(
                       list_zip(e.v[cb.j*8+1 : cb.j*8+8], cb.c),
                       x -> (x[1]-x[2])*(x[1]-x[2]))), cb.ccid) AS rn
            FROM emb e CROSS JOIN cb) WHERE rn = 1
        ),
        lut AS (
          SELECT q.vec_id AS query_id, cb.j, cb.ccid - 1 AS code,
                 list_sum(list_transform(
                   list_zip(q.v[cb.j*8+1 : cb.j*8+8], cb.c),
                   x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
          FROM emb q CROSS JOIN cb WHERE q.vec_id < 1
        ),
        adc AS (
          SELECT l.query_id, e.vec_id,
                 list_sum(list(l.d ORDER BY l.j)) AS dist
          FROM enc e
          JOIN asg a ON a.vec_id = e.vec_id
          JOIN pr p ON p.cid = a.cid
          JOIN lut l ON l.query_id = p.query_id
                     AND l.j = e.j AND l.code = e.code
          GROUP BY l.query_id, e.vec_id
        ),
        rd AS (
          SELECT query_id, vec_id,
                 floor(dist * 10000 + 0.5) / 10000 AS dist_r
          FROM adc
        ),
        rk AS (
          SELECT query_id, vec_id, dist_r,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dist_r, vec_id) AS rank
          FROM rd
        ),
        cand AS (SELECT vec_id FROM rk WHERE rank <= 10),
        cv AS (SELECT e.vec_id AS id, e.v AS v FROM emb e
               SEMI JOIN cand ON e.vec_id = cand.vec_id),
        qv AS (SELECT v FROM emb WHERE vec_id = 0),
        ru AS (SELECT cv.id, unnest(qv.v) AS x, unnest(cv.v) AS y
               FROM cv, qv),
        r0 AS (SELECT id, sum(x * y)
                      / (sqrt(sum(x * x)) * sqrt(sum(y * y))) AS sim
               FROM ru GROUP BY id),
        candr AS (SELECT id, floor(sim * 10000 + 0.5) / 10000 AS rel
                  FROM r0),
        pp AS (SELECT a.id AS a, b.id AS b, a.v AS av, b.v AS bv
               FROM cv a, cv b WHERE a.id <> b.id),
        pu AS (SELECT a, b, unnest(av) AS x, unnest(bv) AS y FROM pp),
        ps AS (SELECT a, b,
                      floor((sum(x * y)
                             / (sqrt(sum(x * x)) * sqrt(sum(y * y))))
                            * 10000 + 0.5) / 10000 AS s
               FROM pu GROUP BY a, b),
        p1 AS (SELECT id, rel, 0.7 * rel AS score, 1 AS pick FROM candr
               ORDER BY rel DESC, id LIMIT 1),
        sel1 AS (SELECT id FROM p1),
        p2 AS (SELECT id, rel, score, 2 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM candr c JOIN ps ON ps.a = c.id
                 JOIN sel1 ON ps.b = sel1.id
                 WHERE c.id NOT IN (SELECT id FROM sel1)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        sel2 AS (SELECT id FROM sel1 UNION ALL SELECT id FROM p2),
        p3 AS (SELECT id, rel, score, 3 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM candr c JOIN ps ON ps.a = c.id
                 JOIN sel2 ON ps.b = sel2.id
                 WHERE c.id NOT IN (SELECT id FROM sel2)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        sel3 AS (SELECT id FROM sel2 UNION ALL SELECT id FROM p3),
        p4 AS (SELECT id, rel, score, 4 AS pick FROM (
                 SELECT c.id, c.rel,
                        0.7 * c.rel - 0.3 * max(ps.s) AS score
                 FROM candr c JOIN ps ON ps.a = c.id
                 JOIN sel3 ON ps.b = sel3.id
                 WHERE c.id NOT IN (SELECT id FROM sel3)
                 GROUP BY c.id, c.rel)
               ORDER BY score DESC, id LIMIT 1),
        allp AS (SELECT * FROM p1 UNION ALL SELECT * FROM p2
                 UNION ALL SELECT * FROM p3 UNION ALL SELECT * FROM p4)
        SELECT id AS vec_id, rel,
               floor(score * 1000000 + 0.5) / 1000000 AS mmr_score,
               CAST(pick AS INT) AS pick
        FROM allp
    """,
    "q139_ivf_pq_topk": """
        WITH emb AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid,
                 v AS c
          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8)
        ),
        a1 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c0 c) WHERE rn = 1
        ),
        c1 AS (
          SELECT c0.cid, COALESCE(u.c, c0.c) AS c FROM c0 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a1 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c0.cid
        ),
        a2 AS (
          SELECT vec_id, v, cid FROM (
            SELECT e.vec_id, e.v, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c1 c) WHERE rn = 1
        ),
        c2 AS (
          SELECT c1.cid, COALESCE(u.c, c1.c) AS c FROM c1 LEFT JOIN (
            SELECT cid, list(m ORDER BY p) AS c FROM (
              SELECT a.cid AS cid, t.i AS p, avg(a.v[t.i]) AS m
              FROM a2 a CROSS JOIN generate_series(1, 64) t(i)
              GROUP BY a.cid, t.i) GROUP BY cid) u ON u.cid = c1.cid
        ),
        asg AS (
          SELECT vec_id, cid FROM (
            SELECT e.vec_id, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id ORDER BY
                     list_sum(list_transform(list_zip(e.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb e CROSS JOIN c2 c) WHERE rn = 1
        ),
        pr AS (
          SELECT query_id, cid FROM (
            SELECT q.vec_id AS query_id, c.cid,
                   row_number() OVER (PARTITION BY q.vec_id ORDER BY
                     list_sum(list_transform(list_zip(q.v, c.c),
                              x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
            FROM emb q CROSS JOIN c2 c WHERE q.vec_id < 4)
          WHERE rn <= 2
        ),
        smp AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16),
        cb AS (
          SELECT j.j,
                 CAST(row_number() OVER (PARTITION BY j.j
                      ORDER BY smp.vec_id) AS INT) AS ccid,
                 smp.v[j.j*8+1 : j.j*8+8] AS c
          FROM smp CROSS JOIN (SELECT unnest(range(8)) AS j) j
        ),
        enc AS (
          SELECT vec_id, j, ccid - 1 AS code FROM (
            SELECT e.vec_id, cb.j, cb.ccid,
                   row_number() OVER (PARTITION BY e.vec_id, cb.j
                     ORDER BY list_sum(list_transform(
                       list_zip(e.v[cb.j*8+1 : cb.j*8+8], cb.c),
                       x -> (x[1]-x[2])*(x[1]-x[2]))), cb.ccid) AS rn
            FROM emb e CROSS JOIN cb) WHERE rn = 1
        ),
        lut AS (
          SELECT q.vec_id AS query_id, cb.j, cb.ccid - 1 AS code,
                 list_sum(list_transform(
                   list_zip(q.v[cb.j*8+1 : cb.j*8+8], cb.c),
                   x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
          FROM emb q CROSS JOIN cb WHERE q.vec_id < 4
        ),
        adc AS (
          SELECT l.query_id, e.vec_id,
                 list_sum(list(l.d ORDER BY l.j)) AS dist
          FROM enc e
          JOIN asg a ON a.vec_id = e.vec_id
          JOIN pr p ON p.cid = a.cid
          JOIN lut l ON l.query_id = p.query_id
                     AND l.j = e.j AND l.code = e.code
          GROUP BY l.query_id, e.vec_id
        ),
        rd AS (
          SELECT query_id, vec_id,
                 floor(dist * 10000 + 0.5) / 10000 AS dist_r
          FROM adc
        ),
        rk AS (
          SELECT query_id, vec_id, dist_r,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dist_r, vec_id) AS rank
          FROM rd
        )
        SELECT query_id, vec_id, dist_r AS dist,
               CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 5
    """,
    "q138_pq_adc_topk": """
        WITH emb AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        smp AS (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16),
        cb AS (
          SELECT j.j,
                 CAST(row_number() OVER (PARTITION BY j.j
                      ORDER BY smp.vec_id) AS INT) AS cid,
                 smp.v[j.j*8+1 : j.j*8+8] AS c
          FROM smp CROSS JOIN (SELECT unnest(range(8)) AS j) j
        ),
        enc AS (
          SELECT vec_id, j, cid - 1 AS code FROM (
            SELECT e.vec_id, cb.j, cb.cid,
                   row_number() OVER (PARTITION BY e.vec_id, cb.j
                     ORDER BY list_sum(list_transform(
                       list_zip(e.v[cb.j*8+1 : cb.j*8+8], cb.c),
                       x -> (x[1]-x[2])*(x[1]-x[2]))), cb.cid) AS rn
            FROM emb e CROSS JOIN cb) WHERE rn = 1
        ),
        lut AS (
          SELECT q.vec_id AS query_id, cb.j, cb.cid - 1 AS code,
                 list_sum(list_transform(
                   list_zip(q.v[cb.j*8+1 : cb.j*8+8], cb.c),
                   x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
          FROM emb q CROSS JOIN cb WHERE q.vec_id < 4
        ),
        adc AS (
          SELECT l.query_id, e.vec_id,
                 list_sum(list(l.d ORDER BY l.j)) AS dist
          FROM enc e JOIN lut l ON l.j = e.j AND l.code = e.code
          GROUP BY l.query_id, e.vec_id
        ),
        rd AS (
          SELECT query_id, vec_id,
                 floor(dist * 10000 + 0.5) / 10000 AS dist_r
          FROM adc
        ),
        rk AS (
          SELECT query_id, vec_id, dist_r,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dist_r, vec_id) AS rank
          FROM rd
        )
        SELECT query_id, vec_id, dist_r AS dist,
               CAST(rank AS INT) AS rank
        FROM rk WHERE rank <= 10
    """,
    "q137_duplicate_spans": """
        WITH t AS (SELECT doc_id,
                          string_split_regex(trim(coalesce(text, '')),
                                             '\\s+') AS toks
                   FROM documents),
        g0 AS (SELECT doc_id, toks,
                      unnest(range(len(toks) - 5 + 1)) AS pos
               FROM t WHERE len(toks) >= 5),
        g AS (SELECT doc_id, pos,
                     array_to_string(toks[pos+1:pos+5], ' ') AS gram
              FROM g0),
        dup AS (SELECT gram FROM (SELECT gram,
                                         count(DISTINCT doc_id) AS nd
                                  FROM g GROUP BY gram)
                WHERE nd >= 2),
        fl AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN dup USING (gram)),
        m AS (SELECT doc_id, pos, pos + 4 AS e,
                     max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS pm
              FROM fl),
        isl AS (SELECT doc_id, pos, e,
                       sum(CASE WHEN pm IS NULL OR pos > pm + 1
                                THEN 1 ELSE 0 END)
                         OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS iid
                FROM m),
        sp AS (SELECT doc_id, iid, max(e) - min(pos) + 1 AS cov,
                      count(*) AS ng
               FROM isl GROUP BY doc_id, iid),
        agg AS (SELECT doc_id, count(*) AS n_spans,
                       sum(cov) AS dup_tokens, sum(ng) AS n_dup_grams
                FROM sp GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
               CAST(coalesce(n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
               CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens,
               floor(coalesce(dup_tokens, 0) / len(t.toks)
                     * 10000 + 0.5) / 10000 AS dup_ratio
        FROM t LEFT JOIN agg USING (doc_id)
    """,
    "q135_salted_join": """
        SELECT c_nationkey, count(*) AS n,
               floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
    """,
    "q136_transactions": """
        SELECT n_nationkey,
               CASE WHEN n_regionkey = 1 THEN n_name || '_TX'
                    ELSE n_name END AS n_name,
               n_regionkey
        FROM nation
        UNION ALL
        SELECT 990, 'GHOST', 0 WHERE 1 = 0
        UNION ALL
        SELECT 991, 'DURABLE', 2
    """,
    "q127_jsonl_roundtrip": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "q128_csv_roundtrip": """
        SELECT doc_id, lang, source, n_chars FROM documents
    """,
    "q130_orc_roundtrip": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "q131_sqlite_roundtrip": """
        SELECT doc_id, text, lang, source, n_chars FROM documents
    """,
    "q129_four_way_chain": """
        SELECT r_name AS region, n_name AS nation,
               count(*) AS n_orders,
               floor(sum(o_totalprice) * 10000 + 0.5) / 10000 AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY 1, 2
    """,
    "q115_mixture_sample": """
        SELECT doc_id, source FROM documents
        WHERE (source = 'src0' AND
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 < 1000000)
           OR (source = 'src1' AND
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 < 500000)
           OR (source = 'src2' AND
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 < 250000)
           OR (source = 'src3' AND
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 1000000 < 100000)
    """,
    # fake audio decode replayed: sr table-lookup on h[0]%4,
    # n = 1000 + int(h[1:4]) % 100000, rms = h[4]/255
    "q116_audio_features": """
        WITH h AS (SELECT doc_id, md5(text) AS m FROM documents
                   WHERE doc_id < 300),
        p AS (SELECT doc_id,
                     ('0x' || substr(m, 1, 2))::INT % 4 AS sridx,
                     1000 + ('0x' || substr(m, 3, 6))::BIGINT % 100000 AS n,
                     ('0x' || substr(m, 9, 2))::INT / 255.0 AS rms
              FROM h),
        s AS (SELECT doc_id,
                     CAST(list_extract([8000, 16000, 22050, 44100],
                                       sridx + 1) AS INT) AS sample_rate,
                     n, rms
              FROM p)
        SELECT doc_id, sample_rate, CAST(n AS BIGINT) AS n_samples,
               floor(CAST(n AS DOUBLE) / sample_rate * 10000 + 0.5) / 10000
                   AS duration_s,
               floor(rms * 10000 + 0.5) / 10000 AS rms
        FROM s
    """,
    "q117_validation_report": """
        SELECT 'not_null:o_orderpriority' AS rule,
               CAST(coalesce(sum(CASE WHEN o_orderpriority IS NULL
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'range:o_totalprice',
               CAST(coalesce(sum(CASE WHEN o_totalprice < 0
                                   OR o_totalprice > 400000
                                 THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM orders
        UNION ALL
        SELECT 'unique:o_orderkey',
               count(*) - count(DISTINCT
                   coalesce(CAST(o_orderkey AS VARCHAR), chr(1)))
        FROM orders
        UNION ALL
        SELECT 'unique:o_orderpriority',
               count(*) - count(DISTINCT coalesce(o_orderpriority, chr(1)))
        FROM orders
        UNION ALL
        SELECT 'fk:o_custkey',
               (SELECT count(*) FROM orders
                WHERE o_custkey IS NOT NULL
                  AND o_custkey NOT IN (SELECT c_custkey FROM customer))
    """,
    # final GroupState per key == the batch aggregate
    "q118_stream_stateful_counter": """
        SELECT user_id, count(*) AS n_events,
               floor(epoch(max(ts)) * 10000 + 0.5) / 10000 AS last_epoch
        FROM events GROUP BY user_id
    """,
    # suffix-chain blocklist: host h{d%7}.site{d%3}.example.com is
    # blocked when any dot-suffix appears in the list
    "q119_domain_blocklist": """
        WITH withhost AS (
          SELECT doc_id, source,
                 'h' || (doc_id % 7) || '.site' || (doc_id % 3)
                     || '.example.com' AS host
          FROM documents
        ),
        sufs AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, len(string_split(host, '.'))),
                     i -> array_to_string(list_slice(string_split(host, '.'),
                              i + 1, len(string_split(host, '.'))), '.')))
                 AS suf
          FROM withhost
        ),
        bl AS (SELECT 'h3.site0.example.com' AS suf
               UNION ALL SELECT 'site1.example.com'),
        bad AS (SELECT DISTINCT doc_id FROM sufs
                JOIN bl ON sufs.suf = bl.suf)
        SELECT doc_id, source FROM withhost
        WHERE doc_id NOT IN (SELECT doc_id FROM bad)
    """,
    "q120_join_cardinality": """
        WITH lc AS (SELECT l_orderkey AS key, count(*) AS nl
                    FROM lineitem GROUP BY 1),
        rc AS (SELECT o_orderkey AS key, count(*) AS nr
               FROM orders GROUP BY 1),
        pk AS (SELECT lc.key, nl * nr AS o FROM lc JOIN rc USING (key)),
        t AS (SELECT coalesce(sum(o), 0) AS n_out,
                     coalesce(max(o), 0) AS max_key_out FROM pk)
        SELECT (SELECT count(*) FROM lineitem) AS n_left,
               (SELECT count(*) FROM orders) AS n_right,
               CAST(n_out AS BIGINT) AS n_out,
               CAST(max_key_out AS BIGINT) AS max_key_out,
               floor(n_out / CAST(greatest(
                   (SELECT count(*) FROM lineitem),
                   (SELECT count(*) FROM orders)) AS DOUBLE)
                   * 10000 + 0.5) / 10000 AS amplification
        FROM t
    """,
    # same deterministic NULL-lang injection as the Spark side;
    # GROUPING(source, lang) = Spark's grouping_id() bit-for-bit, so
    # the genuine-NULL lang cells and the rollup cells grade as
    # DISTINCT rows
    "q121_corpus_datacard": r"""
        SELECT source, lang,
               CAST(GROUPING(source, lang) AS BIGINT) AS gid,
               count(*) AS n_docs,
               CAST(sum(len(string_split_regex(trim(text), '\s+')))
                    AS BIGINT) AS total_tokens,
               CAST(sum(length(text)) AS BIGINT) AS total_bytes,
               count(DISTINCT fp) AS n_distinct,
               floor((1 - count(DISTINCT fp) / CAST(count(*) AS DOUBLE))
                     * 10000 + 0.5) / 10000 AS dup_ratio
        FROM (SELECT source,
                     CASE WHEN doc_id % 17 = 0 THEN NULL
                          ELSE lang END AS lang, text,
                     ('0x' || substr(md5(regexp_replace(lower(trim(text)),
                          '\s+', ' ', 'g')), 1, 15))::BIGINT AS fp
              FROM documents)
        GROUP BY CUBE (source, lang)
    """,
    "q122_debounce": """
        WITH seq AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch(ts) - epoch(lag(ts) OVER w) > 120
                      THEN 1 ELSE 0 END AS nb
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        b AS (
          SELECT *, sum(nb) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS burst
          FROM seq
        )
        SELECT user_id, event_id FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id, burst
                     ORDER BY ts, event_id) AS rn
          FROM b) WHERE rn = 1
    """,
}


def _zorder_terms(cols: list[str], bits: int) -> str:
    """The q110 oracle's Morton expression, generated with the same
    bit placement as operators.layout.zorder_key (bit i of col j at
    position i*n + j)."""
    n = len(cols)
    return " | ".join(
        f"((({c} >> {i}) & 1) << {i * n + j})"
        for j, c in enumerate(cols) for i in range(bits))


ORACLES["q110_zorder_key"] = f"""
    SELECT o_orderkey,
           CAST({_zorder_terms(['o_custkey', 'o_orderkey'], 10)} AS BIGINT)
               AS zkey
    FROM orders
"""


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    # full-probe IVF is exact, so it shares the brute-force oracle
    out["q86_ivf_full_probe"] = ORACLES["q40_cosine_topk"]
    # the forced scale-safe tile plan is exact ntile — same oracle
    out["q193_rfm_scale_safe"] = ORACLES["q170_rfm_scores"]
    out["q87_stream_dedup"] = \
        "SELECT DISTINCT user_id, event_type FROM events"
    return out

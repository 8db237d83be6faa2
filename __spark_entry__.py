"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` exercises one operator family from
SURVEY.md §2 *through the preql_spark engine API* (not raw Spark), and
``oracle_sql()`` holds the DuckDB-equivalent ANSI SQL.  Column names
are aliased identically on both sides; float aggregates are rounded on
both sides to make the value-hash deterministic across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_ENGINES: dict = {}


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
    for determinism."""
    from preql_spark.functions import aggregate as agg
    n = _eng(spark, sf_dir).t.nation
    return (n.group("n_regionkey", names=agg.collect("n_name", sort=True))
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
    """Union-distinct / intersect / except surfaced as tagged rows."""
    eng = _eng(spark, sf_dir)
    cn = eng.t.customer.project(key=F.col("c_nationkey").cast("int")).distinct()
    sn = eng.t.supplier.project(key=F.col("s_nationkey").cast("int")).distinct()
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
    """map_range fan-out → explode(sequence())."""
    r = _eng(spark, sf_dir).t.region
    return (r.project("r_name",
                      i=F.explode(F.sequence(F.lit(0), F.col("r_regionkey"))))
            .df)


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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_agg_battery": q02_agg_battery,
    "q03_global_agg": q03_global_agg,
    "q04_revenue_by_nation": q04_revenue_by_nation,
    "q05_region_order_stats": q05_region_order_stats,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_collect_list": q07_collect_list,
    "q08_median_percentile": q08_median_percentile,
    "q09_product_agg": q09_product_agg,
    "q10_projection_markup": q10_projection_markup,
    "q11_selection": q11_selection,
    "q12_slice_page": q12_slice_page,
    "q13_string_funcs": q13_string_funcs,
    "q14_date_parts": q14_date_parts,
    "q15_case_when": q15_case_when,
    "q16_casts": q16_casts,
    "q17_leftjoin": q17_leftjoin,
    "q18_semi_join": q18_semi_join,
    "q19_anti_join": q19_anti_join,
    "q20_theta_join": q20_theta_join,
    "q21_zipjoin": q21_zipjoin,
    "q22_cross_join": q22_cross_join,
    "q23_set_ops": q23_set_ops,
    "q24_union_all": q24_union_all,
    "q25_window_rank": q25_window_rank,
    "q26_running_sum": q26_running_sum,
    "q27_enum": q27_enum,
    "q28_range": q28_range,
    "q29_map_range": q29_map_range,
    "q30_rollup": q30_rollup,
    "q31_pivot": q31_pivot,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


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
        SELECT n_regionkey, list_sort(list(n_name)) AS names
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
        WITH cn AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS key FROM customer),
             sn AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS key FROM supplier)
        SELECT key, 'both' AS tag FROM (SELECT key FROM cn INTERSECT SELECT key FROM sn)
        UNION ALL
        SELECT key, 'cust_only' AS tag FROM (SELECT key FROM cn EXCEPT SELECT key FROM sn)
        UNION ALL
        SELECT key, 'any' AS tag FROM (SELECT key FROM cn UNION SELECT key FROM sn)
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
}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

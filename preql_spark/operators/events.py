"""Event-stream analytics: funnels (counts + per-user completion
times), cohort retention, transition counts, session paths, RFM
segmentation, per-group OLS trends, group-wise winsorization, MAD
outlier gates, KS distribution drift, and EWMA smoothing.

The reference stops at generic group-by/window queries over event
tables (e.g. its Chinook/forum examples); these operators package the
standard event-analytics shapes a warehouse user writes by hand, each
with a 100-TB-safe plan:

- :func:`funnel` — ordered-step conversion without the textbook
  n-way self-join: ONE user-keyed shuffle collects each user's
  step-relevant events, a JVM higher-order fold walks them in time
  order, and the per-step counts aggregate map-side.  The greedy
  earliest-completion fold is provably equal to the SQL chain
  ``t_i = min(ts) where type = s_i and ts > t_{i-1}`` (induction on
  steps: processing events in ascending order sets each step to the
  minimal admissible timestamp).
- :func:`cohort_retention` — first-activity cohorts x period offsets:
  a user-level partial agg (map-side combine), a user-keyed join back
  (the only wide shuffle; both sides already hash-partitioned by
  user), then a (cohort, offset) count-distinct.
- :func:`transition_counts` — Markov-style (src -> dst) transition
  counts from one lag/lead window per user plus one pair-keyed agg.
- :func:`winsorize` — per-group exact-percentile clipping; the group
  bounds frame is tiny (one row per group) and broadcast back, so
  rows never shuffle.
- :func:`ewma` — per-group exponential smoothing as a sequential
  left fold over the time-sorted value list (one shuffle, map-side
  partial collect).  The fold order is explicit, so the result is
  bit-reproducible across engines — the q155 list_reduce contract.

No reference counterpart (beyond-ref surface, like the curation
operators); semantics follow the standard definitions used by event
warehouses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: list[str],
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type",
           within_seconds: float | None = None) -> DataFrame:
    """Ordered-funnel conversion counts: for each prefix of ``steps``,
    how many users completed it — ``(step_idx, step, n_users)``,
    1-based, strictly-increasing timestamps between steps (same-ts
    events do NOT advance the funnel; ties inside a timestamp are
    irrelevant because the fold only compares ``ts``).

    Semantics match the CTE chain ``t1 = min(ts | type=s1)``,
    ``t_i = min(ts | type=s_i, ts > t_{i-1})``: the fold walks the
    user's step events in ascending (ts, any) order and sets each
    unset step whose predecessor is set and strictly older — the
    first admissible event is the minimal one.

    ``within_seconds`` bounds the whole funnel to a window ANCHORED
    AT THE USER'S FIRST step-1 EVENT (``t_i <= t1 + within``): the
    deterministic anchored contract, equal to adding that bound to
    every CTE of the chain (the same induction applies — each step
    still takes its minimal admissible event).  A later step-1 event
    never re-anchors the window.

    Scale shape: filter to step types (pushed to the scan), ONE
    user-keyed shuffle with map-side partial ``collect_list``, the
    fold and the per-step flags stay in whole-stage codegen (HOFs, no
    Python), and the final count aggregates n rows per user down to
    len(steps) rows.  Per-task memory is bounded by the largest
    single user's step-event count — the same contract as any
    sessionization."""
    reached = _funnel_reached(df, steps, user_col, ts_col, type_col,
                              within_seconds)
    n = len(steps)
    flags = reached.select(
        "u", *[F.element_at("__r", i + 1).isNotNull().cast("int")
               .alias(f"__s{i}") for i in range(n)])
    agg = flags.agg(*[F.coalesce(F.sum(f"__s{i}"), F.lit(0))
                      .alias(f"__n{i}") for i in range(n)])
    pairs = F.array(*[
        F.struct(F.lit(i + 1).alias("step_idx"),
                 F.lit(steps[i]).alias("step"),
                 F.col(f"__n{i}").cast("long").alias("n_users"))
        for i in range(n)])
    return (agg.select(F.explode(pairs).alias("__p"))
            .select("__p.step_idx", "__p.step", "__p.n_users"))


def _funnel_reached(df: DataFrame, steps: list[str], user_col: str,
                    ts_col: str, type_col: str,
                    within_seconds: float | None) -> DataFrame:
    """Shared funnel fold: per user, the array of step-completion
    timestamps (unix micros; 1-based slot i+1 holds step i, NULL if
    never reached) — ``(u, __r array<bigint>)``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    n = len(steps)
    idx = F.create_map(*[F.lit(x) for i, s in enumerate(steps)
                         for x in (s, i)])
    ev = (df.filter(F.col(type_col).isin(list(steps)))
          .select(F.col(user_col).alias("u"),
                  F.unix_micros(F.col(ts_col).cast("timestamp"))
                  .alias("t"),
                  idx[F.col(type_col)].alias("i")))
    per_user = (ev.groupBy("u")
                .agg(F.sort_array(F.collect_list(F.struct(
                    F.col("t"), F.col("i")))).alias("__evs")))
    init = F.array_repeat(F.lit(None).cast("bigint"), n)
    win = (None if within_seconds is None
           else F.lit(int(round(within_seconds * 1_000_000))))

    def _step(acc, e):
        # set step e.i iff unset, and (first step | predecessor set
        # and strictly older than this event)
        ok = F.when(e["i"] == 0, F.lit(True)) \
             .otherwise(F.element_at(acc, e["i"]).isNotNull()
                        & (e["t"] > F.element_at(acc, e["i"])))
        if win is not None:
            # window anchored at the first step-1 event (acc[1])
            ok = ok & F.when(e["i"] == 0, F.lit(True)).otherwise(
                e["t"] <= F.element_at(acc, 1) + win)
        # element_at(acc, i) is 1-based → acc[i] is the PREDECESSOR
        # of 0-based step e.i; the step's own slot is acc[i+1]
        cur_unset = F.element_at(acc, e["i"] + 1).isNull()
        return F.transform(
            acc, lambda v, j: F.when(
                (j == e["i"]) & cur_unset & ok, e["t"]).otherwise(v))

    return per_user.select(
        "u", F.aggregate("__evs", init, _step).alias("__r"))


def funnel_times(df: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type",
                 within_seconds: float | None = None) -> DataFrame:
    """Per-user funnel completion TIMES: for every user who did
    step 1, the timestamp each step completed (NULL once the chain
    breaks) — ``(user, t1..tn timestamps)``.  Same fold, same
    anchored-window contract, and exactly the per-user rows the
    aggregate :func:`funnel` counts — use it for conversion-lag
    distributions (``t_k - t_1``) and per-segment drill-downs.
    Same single-shuffle scale shape as :func:`funnel`."""
    reached = _funnel_reached(df, steps, user_col, ts_col, type_col,
                              within_seconds)
    return (reached
            .filter(F.element_at("__r", 1).isNotNull())
            .select(F.col("u").alias(user_col),
                    *[F.timestamp_micros(F.element_at("__r", i + 1))
                      .alias(f"t{i + 1}")
                      for i in range(len(steps))]))


# above this many shuffle partitions the (pid, offset) table is
# broadcast-joined instead of inlined as a create_map literal — a
# many-thousand-entry literal map (plus the per-score CASE) bloats the
# expression tree past codegen limits; a broadcast hash join of a
# numPartitions-row frame is O(1) plan size at any partition count
OFFSETS_BROADCAST_MIN_PARTS = 64

#: conservative COMPRESSED bytes-per-event-row floor for rfm_scores'
#: auto mode: Catalyst's sizeInBytes for parquet sources is the
#: on-disk (compressed) size, and a (user, ts, value) row with a
#: high-cardinality user column realistically never encodes below ~2
#: bytes, so an input whose estimate is under windowed_max_users *
#: this bound is taken as safely below the user threshold and the
#: windowed tile plan is chosen statically — skipping the decision
#: checkpoint+count on interactive-sized inputs.  This is a
#: heuristic, not a proof (pathological encodings exist); a
#: misclassification costs only plan choice, never correctness —
#: both tile plans are exact ntile.
RFM_AUTO_BYTES_PER_ROW = 2

#: safety margin on the static shortcut above: the 2-byte floor is a
#: heuristic (a sorted low-entropy layout can RLE/dictionary-compress
#: below it), so the shortcut only fires when the size estimate sits
#: at least this factor BELOW the bound — an estimate within one
#: order of magnitude of the boundary falls through to the exact
#: counted decision instead of trusting the floor at the edge.
RFM_AUTO_STATIC_MARGIN = 10


def _exact_global_ntile(df: DataFrame, n_tiles: int, total: int,
                        sort_cols: list, out_col: str) -> DataFrame:
    """Exact SQL-``ntile`` assignment over a global ordering, with no
    single-partition sort.  Range-repartition on the FULL composite
    sort key (the trailing unique tie-break column rides along, so a
    dominant value cannot pile into one straggler partition), freeze
    the partitioning with an eager ``localCheckpoint``, collect the
    tiny per-partition row counts (one row per shuffle partition) and
    fold them into a pid -> offset mapping — a literal map below
    :data:`OFFSETS_BROADCAST_MIN_PARTS` partitions, a broadcast-joined
    (pid, offset) frame above it (keeps the expression tree O(1) on
    many-thousand-partition clusters); the global 1-based rank is then
    ``offset + partition-local row_number``, and the tile is the exact
    ntile arithmetic — with ``total = q*n + rem``, tiles ``1..rem``
    take ``q+1`` rows, the rest take ``q``.  Every exchange is
    distributed (range, then hash on the frozen pid); driver traffic
    is one (pid, count) row per partition.

    Failure mode to know: ``localCheckpoint`` storage is
    NON-RELIABLE — losing an executor that holds checkpoint blocks
    aborts the job (rerun from the source).  On long-lived production
    clusters set a reliable checkpoint dir and swap in
    ``.checkpoint()`` if executor churn is expected."""
    tmp = df.repartitionByRange(*sort_cols).localCheckpoint()
    tmp = tmp.withColumn("__pid", F.spark_partition_id())
    counts = sorted(
        (r["__pid"], r["__cnt"])
        for r in tmp.groupBy("__pid")
                    .agg(F.count(F.lit(1)).alias("__cnt")).collect())
    offsets, off = [], 0
    for p, c in counts:
        offsets.append((p, off))
        off += c
    if len(offsets) >= OFFSETS_BROADCAST_MIN_PARTS:
        offs = df.sparkSession.createDataFrame(
            offsets, "__pid: int, __off: long")
        tmp = tmp.join(F.broadcast(offs), "__pid", "left")
        off_expr = F.coalesce(F.col("__off"), F.lit(0))
    else:
        pairs = [lit for p, o in offsets for lit in (F.lit(p), F.lit(o))]
        off_expr = (F.element_at(F.create_map(*pairs), F.col("__pid"))
                    if pairs else F.lit(0))
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    q_, rem = divmod(total, n_tiles)
    qs = max(q_, 1)          # else-branch unreachable when q_ == 0
    cutoff = rem * (q_ + 1)
    ranked = tmp.withColumn(
        "__r", F.row_number().over(w).cast("long") + off_expr)
    # exact integer arithmetic end-to-end (DIV, not /: double division
    # would drift past 2^53 ranks); ceil(a/b) spelled (a + b - 1) div b
    tile = F.expr(
        f"CASE WHEN __r <= {cutoff} THEN (__r + {q_}) DIV {q_ + 1} "
        f"ELSE {rem} + ((__r - {cutoff} + {qs - 1}) DIV {qs}) END")
    return (ranked.withColumn(out_col, tile.cast("int"))
            .drop("__pid", "__r", "__off"))


def rfm_scores(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               n_tiles: int = 5,
               value_filter=None,
               windowed: bool | None = None,
               windowed_max_users: int = 4_000_000,
               auto_bytes_per_row: float | None = RFM_AUTO_BYTES_PER_ROW
               ) -> DataFrame:
    """RFM segmentation: per user, recency (days since last activity,
    against the corpus max date), frequency (event count), monetary
    (value summed in exact integer cents — floats round HALF-UP to
    cents BEFORE summing, so the sum is order-independent and
    cross-engine exact), each scored into ``n_tiles`` quantile tiles
    (1 = best: most recent / most frequent / highest spend), ties
    broken by ascending user id — ``(user, r_days, freq,
    monetary_cents, r_score, f_score, m_score)``.

    Auto-mode cost note: deciding the tile plan needs the user
    count, which needs a scan — so auto mode freezes the per-user
    table with an eager ``localCheckpoint`` first (one scan total).
    Two static shortcuts skip that for interactive-sized inputs:
    when CBO stats carry an exact ``rowCount`` at or under
    ``windowed_max_users`` (rows bound users from above — exact, no
    heuristic), or when the Catalyst size estimate sits at least
    ``RFM_AUTO_STATIC_MARGIN`` x below ``windowed_max_users *
    auto_bytes_per_row`` (the compressed bytes-per-row floor — a
    heuristic, so estimates within an order of magnitude of the
    boundary deliberately FALL THROUGH to the counted decision
    rather than trust the floor at the edge; a pathological
    all-constant layout can compress below it).  Pass
    ``auto_bytes_per_row=None`` to disable the size shortcut
    entirely (the rowCount one is exact and stays).  A
    misclassification costs only plan choice — both tile plans are
    exact ntile.

    Scale shape: one user-keyed partial agg builds the per-user
    triple.  The tile stage has two plans that produce IDENTICAL
    output (both are exact SQL ntile with the same (key, user)
    tie-break): below ``windowed_max_users`` users (or with
    ``windowed=True``) the three ntile windows share one
    single-partition sort of the USER-LEVEL table — cheapest when
    |users| is modest; above it (or with ``windowed=False``) each
    score runs :func:`_exact_global_ntile` — a range repartition on
    the composite sort key plus a partition-offset rank, so no stage
    is ever a single-partition sort and a billion-user table tiles in
    parallel.  ``windowed=None`` picks automatically from the exact
    user count (measured by the same action that finds the corpus max
    date — no extra scan)."""
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    e = df
    if value_filter is not None:
        e = e.filter(value_filter)
    if windowed is None:
        try:
            stats = e._jdf.queryExecution().optimizedPlan().stats()
            # exact shortcut first: CBO row counts (when ANALYZE'd)
            # bound users from above — rows <= max_users proves
            # users <= max_users, no heuristic involved
            rc = stats.rowCount()
            if rc.isDefined():
                if int(rc.get().toString()) <= windowed_max_users:
                    windowed = True
            if windowed is None and auto_bytes_per_row is not None:
                # static lower bound: every user has >= 1 event row
                # and an event row compresses to >= auto_bytes_per_row
                # bytes in the (on-disk for parquet) Catalyst
                # estimate — but only trust it with
                # RFM_AUTO_STATIC_MARGIN x headroom; boundary-close
                # estimates fall through to the counted decision
                # (heuristic: see the constants' notes; wrong only
                # costs plan choice, both plans are exact)
                est = stats.sizeInBytes()
                if not isinstance(est, int):   # py4j BigInteger
                    est = int(est.toString())
                if est * RFM_AUTO_STATIC_MARGIN \
                        <= windowed_max_users * auto_bytes_per_row:
                    windowed = True
        except Exception:
            pass
    cents = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)) \
        .cast("long")
    per = (e.groupBy(F.col(user_col).alias("u"))
           .agg(F.max(F.col(ts_col).cast("timestamp")).alias("__last"),
                F.count(F.lit(1)).alias("freq"),
                F.coalesce(F.sum(cents), F.lit(0))
                .alias("monetary_cents")))
    if windowed is True:
        mx = per.agg(F.max("__last")).collect()[0][0]
        n_users = None
    else:
        per = per.localCheckpoint()   # events scan happens ONCE
        stats = per.agg(F.max("__last").alias("mx"),
                        F.count(F.lit(1)).alias("n")).collect()[0]
        mx, n_users = stats["mx"], stats["n"]
    per = per.withColumn(
        "r_days", F.datediff(F.lit(mx).cast("timestamp").cast("date"),
                             F.col("__last").cast("date")).cast("int"))
    use_window = (windowed if windowed is not None
                  else n_users <= windowed_max_users)
    if use_window:
        wr = Window.orderBy(F.col("r_days").asc(), F.col("u").asc())
        wf = Window.orderBy(F.col("freq").desc(), F.col("u").asc())
        wm = Window.orderBy(F.col("monetary_cents").desc(),
                            F.col("u").asc())
        return per.select(
            F.col("u").alias(user_col), "r_days", "freq",
            "monetary_cents",
            F.ntile(n_tiles).over(wr).alias("r_score"),
            F.ntile(n_tiles).over(wf).alias("f_score"),
            F.ntile(n_tiles).over(wm).alias("m_score"))
    out = _exact_global_ntile(
        per, n_tiles, n_users,
        [F.col("r_days").asc(), F.col("u").asc()], "r_score")
    out = _exact_global_ntile(
        out, n_tiles, n_users,
        [F.col("freq").desc(), F.col("u").asc()], "f_score")
    out = _exact_global_ntile(
        out, n_tiles, n_users,
        [F.col("monetary_cents").desc(), F.col("u").asc()], "m_score")
    return out.select(
        F.col("u").alias(user_col), "r_days", "freq", "monetary_cents",
        "r_score", "f_score", "m_score")


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     period_days: int = 7) -> DataFrame:
    """Cohort retention triangle: users grouped by their first-ever
    activity period; for each (cohort_start, period_offset) the
    number of distinct cohort users active in that period —
    ``(cohort_start date, period_offset int, n_users)``.

    Periods are fixed ``period_days`` blocks anchored at each user's
    cohort start date (offset = floor(days_since_first_day / p)),
    so the triangle is exact regardless of calendar alignment.

    Scale shape: the user-level first-activity agg combines map-side
    (one narrow row per user per partition); joining it back is
    user-keyed on both sides — with AQE this is one co-partitioned
    exchange pair, and at 100 TB the user dimension is the natural
    bucketing key.  The final count-distinct is (cohort, offset)
    keyed: cardinality ≈ cohorts x horizon, tiny."""
    if period_days < 1:
        raise ValueError(f"period_days must be >= 1, got {period_days}")
    e = df.select(F.col(user_col).alias("u"),
                  F.col(ts_col).cast("timestamp").alias("t"))
    first = e.groupBy("u").agg(F.min("t").alias("t0"))
    j = e.join(first, "u")
    off = F.floor(F.datediff(F.to_date("t"), F.to_date("t0"))
                  / period_days).cast("int")
    return (j.select("u", F.to_date("t0").alias("cohort_start"),
                     off.alias("period_offset"))
            .groupBy("cohort_start", "period_offset")
            .agg(F.count_distinct("u").alias("n_users")))


def transition_counts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      type_col: str = "event_type",
                      tie_col: str | None = "event_id") -> DataFrame:
    """First-order transition matrix: counts of consecutive
    (src_type -> dst_type) pairs within each user's timeline —
    ``(src, dst, cnt)``.  Ordering is (ts, tie_col) so same-timestamp
    events sequence deterministically; each user's last event has no
    successor and contributes nothing.

    Scale shape: ONE user-keyed window shuffle computes the lead; the
    pair count then aggregates with map-side combine into at most
    |types|² rows.  No self-join — the lead window reads each row
    once."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    nxt = F.lead(type_col, 1).over(w)
    return (df.select(F.col(type_col).alias("src"), nxt.alias("dst"))
            .filter(F.col("dst").isNotNull())
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("cnt")))


def winsorize(df: DataFrame, group_cols: list[str], value_col: str,
              p_lo: float = 0.05, p_hi: float = 0.95) -> DataFrame:
    """Per-group winsorization: ``value_col`` clipped into the
    group's exact [p_lo, p_hi] percentile interval (linear
    interpolation — Spark ``percentile``, equal to DuckDB
    ``quantile_cont``; the q158-proven cross-engine identity).
    Returns the input columns plus ``<value_col>_w``.

    Scale shape: the bounds frame is one row per group (map-side
    partial percentile, then a tiny agg); it broadcasts back onto
    the rows, so the data itself NEVER shuffles — the clip runs in
    the scan stage.  Group cardinality is the only driver-side
    assumption (same contract as every bounds-broadcast operator
    here)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError(f"need 0 <= p_lo <= p_hi <= 1, "
                         f"got {p_lo}, {p_hi}")
    v = F.col(value_col).cast("double")
    bounds = (df.groupBy(*group_cols)
              .agg(F.percentile(v, F.lit(float(p_lo))).alias("__lo"),
                   F.percentile(v, F.lit(float(p_hi))).alias("__hi")))
    j = df.join(F.broadcast(bounds), group_cols, "left")
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return j.select(*df.columns, clipped.alias(f"{value_col}_w"))


def rolling_anomalies(df: DataFrame, group_cols: list[str] | str,
                      ts_col: str = "ts", value_col: str = "value",
                      window: int = 50, k: float = 3.0,
                      min_periods: int = 5,
                      tie_col: str | None = None) -> DataFrame:
    """Rolling z-score anomaly gate — the standard streaming-metrics
    monitor in batch form: each event scores against the mean and
    sample stddev of the PRECEDING ``window`` events in its group
    (strictly preceding, so the point never judges itself), and rows
    with ``|z| > k`` flag as anomalies — ``(group..., ts, value,
    mu, sigma, z, is_anomaly)``.  The first ``min_periods`` events
    per group (and zero-variance windows) score NULL z / false flag
    rather than dividing by nothing.  Pass ``tie_col`` (a unique
    column) to make same-timestamp ordering deterministic — REQUIRED
    for cross-engine reproducibility when timestamps collide.

    Scale shape: ONE group-keyed shuffle + a per-group sort window
    with a bounded ROWS frame — never a global sort, per-row state is
    the fixed window, so a group's history length never accumulates
    in memory; at real group cardinality the per-group sorts spread
    across tasks (measured flat at 10× rows AND 10× groups —
    SCALE.md q207b row).  (For a robust flavor,
    winsorize/mad_outliers are the distribution-free siblings; this
    one is the cheap two-moment gate; :func:`z_outliers` is the
    per-value population gate.)"""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_periods < 2:
        raise ValueError(
            f"min_periods must be >= 2 (sample stddev), got {min_periods}")
    gc = [group_cols] if isinstance(group_cols, str) else group_cols
    order = [F.col(ts_col).asc()]
    if tie_col is not None:
        order.append(F.col(tie_col).asc())
    w = (Window.partitionBy(*[F.col(c) for c in gc]).orderBy(*order)
         .rowsBetween(-int(window), -1))
    v = F.col(value_col).cast("double")
    mu = F.avg(v).over(w)
    sigma = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when((n >= int(min_periods)) & (sigma > 0),
               (v - mu) / sigma)
    return (df.withColumn("mu", mu).withColumn("sigma", sigma)
            .withColumn("z", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(F.col("z")) > F.lit(float(k)),
                                   F.lit(False))))


def quantile_normalize(df: DataFrame, group_cols: list[str] | str,
                       value_col: str,
                       out_col: str = "qn") -> DataFrame:
    """Within-group empirical-quantile feature scaling: each value
    maps to its ``percent_rank`` inside its group — ``(rank - 1) /
    (n - 1)`` in [0, 1] — the rank-based normalization that is
    robust to outliers and arbitrary scale differences between
    groups (the standard preprocessing for mixing quality signals
    from different sources before a single threshold).  Ties share a
    rank (equal inputs stay equal); a single-non-null-row group
    scores 0.0.  NULL inputs score NULL and do NOT participate in
    the ranking (they neither take a rank nor inflate ``n`` — a
    bare ``percent_rank`` with Spark's NULLS FIRST would do both and
    shift every real value's quantile).

    Exactness: rank and n are exact integers, the division is one
    IEEE op — bit-identical cross-engine (the oracle replays
    ``(rank - n_null - 1) / (n - n_null - 1)`` over the same
    NULLS-FIRST window).

    Scale shape: ONE hash shuffle on the group key and a per-group
    sort window — never a global sort; per-key work bounded by group
    size (skewed groups are the quantile's own population, not a
    defect)."""
    gc = [group_cols] if isinstance(group_cols, str) else group_cols
    v = F.col(value_col)
    w = Window.partitionBy(*[F.col(c) for c in gc]) \
        .orderBy(v.asc_nulls_first())
    wp = Window.partitionBy(*[F.col(c) for c in gc])
    # with NULLS FIRST every null precedes every value, so a non-null
    # row's rank among non-nulls is its full rank minus the null count
    n_null = F.count(F.when(v.isNull(), F.lit(1))).over(wp)
    n = F.count(F.lit(1)).over(wp)
    r = F.rank().over(w)
    nn = n - n_null
    qn = F.when(
        v.isNotNull(),
        F.when(nn > 1, (r - n_null - 1).cast("double") / (nn - 1))
        .otherwise(F.lit(0.0)))
    return df.withColumn(out_col, qn)


def ewma(df: DataFrame, group_cols: list[str], ts_col: str,
         value_col: str, alpha: float,
         tie_col: str | None = None) -> DataFrame:
    """Per-group exponentially-weighted moving average of the
    time-ordered value sequence, returning the FINAL smoothed level
    per group — ``(group..., n, ewma)``.  s_0 = v_0;
    s_k = alpha * v_k + (1 - alpha) * s_{k-1}.

    The fold order is explicit (ts, then tie_col), so the double
    arithmetic is a fixed-order sequential fold — bit-identical to
    any engine replaying the same fold (DuckDB ``list_reduce``), per
    the q155 portability contract.

    Scale shape: one group-keyed shuffle with map-side partial
    ``collect_list``; the fold is a JVM HOF over the sorted array.
    Per-task memory is bounded by the largest group's history — for
    unbounded histories, window the input first (this matches pandas
    ``ewm(adjust=False)`` semantics, so downsampling preserves
    meaning)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    key = [F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t")]
    if tie_col is not None:
        key.append(F.col(tie_col).alias("__k"))
    ev = df.select(*[F.col(c) for c in group_cols],
                   F.struct(*key, F.col(value_col).cast("double")
                            .alias("__v")).alias("__e"))
    per = (ev.groupBy(*group_cols)
           .agg(F.sort_array(F.collect_list("__e")).alias("__evs")))
    a = F.lit(float(alpha))
    fold = F.aggregate(
        F.slice("__evs", 2, F.greatest(F.size("__evs") - 1, F.lit(0))),
        F.element_at("__evs", 1)["__v"],
        lambda acc, e: a * e["__v"] + (F.lit(1.0) - a) * acc)
    return per.select(*group_cols,
                      F.size("__evs").cast("long").alias("n"),
                      fold.alias("ewma"))


def trend(df: DataFrame, group_cols: list[str] | str,
          ts_col: str = "ts", value_col: str = "value",
          origin: str = "1970-01-01") -> DataFrame:
    """Per-group OLS trend of value-cents against day index —
    ``(group..., n, slope_cents_per_day, intercept_cents)``.

    Exactness contract: x = whole days since ``origin`` (int), y =
    value rounded HALF-UP to integer cents (the order-independent
    q170 trick), and all five OLS moments (n, Sx, Sy, Sxx, Sxy) are
    exact int64 sums.  slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) and
    intercept = (Sy - slope*Sx) / n are then a FIXED sequence of
    correctly-rounded double ops — bit-identical on any engine and
    any partitioning.  Groups with a single distinct x (vertical
    line) get NULL slope/intercept.

    Scale shape: one group-keyed partial agg — the map side folds
    each partition to five numbers per group, so rows never shuffle.
    Overflow bound: n * Sxx < 2^63 — pick ``origin`` near the data
    (day indexes stay small) for very large groups.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    x = F.datediff(F.col(ts_col).cast("date"),
                   F.lit(origin).cast("date")).cast("long")
    y = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)) \
        .cast("long")
    # rows with NULL x or y drop BEFORE the agg so n stays
    # consistent with the four moment sums (a count(*) n against
    # NULL-skipping sums would silently skew the slope)
    m = (df.filter(x.isNotNull() & y.isNotNull())
         .groupBy(*group_cols)
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(x).alias("__sx"), F.sum(y).alias("__sy"),
              F.sum(x * x).alias("__sxx"),
              F.sum(x * y).alias("__sxy")))
    num = (F.col("n") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy")).cast("double")
    den = (F.col("n") * F.col("__sxx")
           - F.col("__sx") * F.col("__sx")).cast("double")
    slope = F.when(den != 0, num / den)
    intercept = (F.col("__sy").cast("double")
                 - slope * F.col("__sx").cast("double")) / F.col("n")
    return m.select(*group_cols, "n",
                    slope.alias("slope_cents_per_day"),
                    intercept.alias("intercept_cents"))


def mad_outliers(df: DataFrame, group_cols: list[str] | str,
                 value_col: str = "value",
                 k: float = 3.0) -> DataFrame:
    """Median-absolute-deviation outlier flagging: each row gains
    ``med_cents``, ``mad_cents`` (its group's exact median and MAD of
    the half-up integer-cent values) and ``is_outlier`` =
    |cents - med| > k * MAD.  The robust alternative to z-scores —
    one wild row cannot drag the gate, and MAD = 0 degenerates to
    "anything off the median is an outlier".

    Exactness: cents are int64; Spark ``percentile`` over ints yields
    exact .0/.5 doubles (== DuckDB ``quantile_cont``, the q158-proven
    identity); |cents - med| is again an exact double, and its median
    interpolates exact halves — every comparison is deterministic
    cross-engine.

    Scale shape: two bounds-broadcast rounds (the winsorize
    contract): pass 1 computes per-group medians (map-side partial
    percentile), pass 2 the MAD of deviations; both broadcast back,
    so the event rows themselves NEVER shuffle.
    """
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    cents = F.floor(F.col(value_col).cast("double") * 100
                    + F.lit(0.5)).cast("long")
    w = df.withColumn("__c", cents)

    def _nullsafe(left, right):
        # NULL group keys must still meet their own group's bounds
        # (plain join-on-names is null-unsafe and would NULL the
        # gate for the NULL group)
        cond = None
        for g in group_cols:
            c = left[g].eqNullSafe(right[f"__g_{g}"])
            cond = c if cond is None else (cond & c)
        return cond

    med = (w.groupBy(*[F.col(g).alias(f"__g_{g}")
                       for g in group_cols])
           .agg(F.percentile(F.col("__c"), F.lit(0.5))
                .alias("med_cents")))
    w = w.join(F.broadcast(med), _nullsafe(w, med), "left") \
        .drop(*[f"__g_{g}" for g in group_cols])
    dev = F.abs(F.col("__c") - F.col("med_cents"))
    mad = (w.groupBy(*[F.col(g).alias(f"__g_{g}")
                       for g in group_cols])
           .agg(F.percentile(dev, F.lit(0.5)).alias("mad_cents")))
    w = w.join(F.broadcast(mad), _nullsafe(w, mad), "left") \
        .drop(*[f"__g_{g}" for g in group_cols])
    return w.select(*df.columns, "med_cents", "mad_cents",
                    (dev > F.lit(float(k)) * F.col("mad_cents"))
                    .alias("is_outlier"))


def session_paths(df: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type",
                  tie_col: str = "event_id",
                  gap_seconds: float = 1800.0,
                  k: int | None = 20) -> DataFrame:
    """Top-k most common session paths: events sessionize on a
    ``gap_seconds`` inactivity gap per user (the q44 rule, compared
    in exact integer micros), each session becomes the ordered
    ``'>'``-joined event-type string, and paths rank by frequency —
    ``(path, n_sessions)``, ties broken by path ascending; ``k=None``
    returns every path.

    Scale shape: ONE user-keyed sort window assigns session indexes,
    and the per-session path aggregation reuses that hash layout
    (clustering on (user, session) is satisfied by the window's
    user partitioning — no second exchange of the events); only the
    tiny (path, count) table shuffles again, and the top-k is a
    TakeOrdered, never a global sort.  Per-task memory is bounded by
    the largest single session.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(t, 1).over(w)
    gap_us = int(round(gap_seconds * 1_000_000))
    newsess = F.when(prev.isNull() | (t - prev > gap_us), 1) \
        .otherwise(0)
    sess = (df.withColumn("__ns", newsess)
            .withColumn("__sess", F.sum("__ns").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    paths = (sess.groupBy(user_col, "__sess")
             .agg(F.concat_ws(">", F.transform(
                 F.sort_array(F.collect_list(F.struct(
                     t.alias("t"), F.col(tie_col).alias("i"),
                     F.col(type_col).alias("y")))),
                 lambda e: e["y"])).alias("path")))
    counts = (paths.groupBy("path")
              .agg(F.count(F.lit(1)).alias("n_sessions")))
    if k is None:
        return counts
    return counts.orderBy(F.col("n_sessions").desc(),
                          F.col("path").asc()).limit(int(k))


#: default cumulative-window domain bound for ks_statistic /
#: mann_whitney — the exact CDFs sort the DISTINCT value domain in
#: one task, so the domain must stay interactive-sized; a raw
#: continuous metric (every value unique) would otherwise funnel the
#: full row count through that task
MAX_CDF_DOMAIN = 1_000_000


def _domain_guard(dom: DataFrame, max_domain: int | None,
                  fn: str) -> DataFrame | None:
    """One-row broadcast frame whose evaluation ASSERTS the distinct
    value domain is within ``max_domain`` — crossJoined below the
    cumulative window so the broadcast stage materializes (and
    fails, clearly) before the window's single task ever reads its
    exchange.  In-plan enforcement: no extra driver action; the
    domain agg is planned over the same grouped frame it guards, so
    avoiding a second upstream scan depends on Spark's ReuseExchange
    rule (on by default; AQE also reuses identical exchanges) — with
    exchange reuse disabled the guard still enforces correctly but
    pays one extra scan of the (already collapsed) grouped frame.
    Callers that hold a persisted/checkpointed frame can guard off
    that instead to make the single-scan property unconditional.  The
    caller must FOLD ``__g`` into a consumed column (it is NULL when
    the assert passes, so ``+ coalesce(cast(__g as long), 0)`` is an
    exact no-op) — an unused guard column gets column-pruned and the
    assert silently vanishes."""
    if max_domain is None:
        return None
    return dom.agg(F.assert_true(
        F.count(F.lit(1)) <= F.lit(int(max_domain)),
        F.lit(f"{fn}: distinct value domain exceeds max_domain="
              f"{int(max_domain)} — the exact-CDF window sorts the "
              "domain in one task; quantize/round the values to "
              "ticks first (the bounded-domain contract), or raise "
              "max_domain explicitly")).alias("__g"))


def _apply_domain_guard(df: DataFrame, max_domain: int | None,
                        fn: str) -> DataFrame:
    """Fold :func:`_domain_guard` into ``df``'s ``ca`` column as an
    exact ``+ 0`` — the ONE place the subtle invariant lives: the
    guard must ride a CONSUMED column, because an unused assert
    column gets column-pruned and the check silently vanishes."""
    g = _domain_guard(df, max_domain, fn)
    if g is None:
        return df
    return (df.crossJoin(F.broadcast(g))
            .withColumn("ca", F.col("ca")
                        + F.coalesce(F.col("__g").cast("long"),
                                     F.lit(0)))
            .drop("__g"))


def _quantize_col(v: Column, quantize_to) -> Column:
    """Tick-round a value column BEFORE the distinct-domain collapse:
    ``floor(v / tick) * tick`` — two correctly-rounded double ops, so
    the quantized values are deterministic cross-engine (the oracle
    spells the identical arithmetic).  This is the opt-in degradation
    alternative to the ``max_domain`` guard: raw continuous metrics
    (every value unique) bucket to at most ``range/tick`` distinct
    ticks instead of failing with the quantize-first message."""
    t = float(quantize_to)
    if not t > 0:
        raise ValueError(
            f"quantize_to must be a positive tick size, got {quantize_to!r}")
    return F.floor(v.cast("double") / F.lit(t)) * F.lit(t)


def ks_statistic(df: DataFrame, value_col: str, side_col: str,
                 side_a, side_b,
                 max_domain: int | None = MAX_CDF_DOMAIN,
                 quantize_to=None) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distribution-drift statistic
    between the rows where ``side_col == side_a`` and those where
    ``side_col == side_b`` — one row ``(n_a, n_b, d_stat, at_value)``
    with D = max over values of |F_a(v) - F_b(v)| and ``at_value``
    the smallest value attaining it.  The standard drift monitor
    between a baseline and a new wave (D near 0 = same distribution).

    Exactness: the empirical CDFs are integer cumulative counts
    through ONE division each (exact IEEE), so D and the argmax are
    deterministic cross-engine.  Values are compared exactly — round
    continuous metrics to ticks first if that is the contract.

    Scale shape: per-side counts collapse to the DISTINCT value
    domain before anything global happens; the cumulative window
    runs over that bounded domain, and the answer is a TakeOrdered
    over it.  The bounded-domain contract is ENFORCED: if the
    distinct domain exceeds ``max_domain`` (default 10^6) the job
    fails with an explicit quantize-first message BEFORE the window's
    single task runs — raw continuous metrics (every value unique)
    cannot silently funnel a billion rows through one task.  Pass
    ``max_domain=None`` to opt out — or ``quantize_to=<tick>`` to opt
    into DEGRADATION instead of failure: values tick-round via
    ``floor(v / tick) * tick`` BEFORE the domain collapse (identical
    to pre-quantizing the column yourself), bounding the domain by
    ``range/tick``."""
    v = F.col(value_col)
    if quantize_to is not None:
        v = _quantize_col(v, quantize_to)
    base = df.filter(v.isNotNull())   # standard KS ignores NULLs
    sa = (base.filter(F.col(side_col) == F.lit(side_a))
          .groupBy(v.alias("v"))
          .agg(F.count(F.lit(1)).alias("ca")))
    sb = (base.filter(F.col(side_col) == F.lit(side_b))
          .groupBy(v.alias("v"))
          .agg(F.count(F.lit(1)).alias("cb")))
    u = (sa.join(sb, "v", "full_outer")
         .select("v", F.coalesce("ca", F.lit(0)).alias("ca"),
                 F.coalesce("cb", F.lit(0)).alias("cb")))
    return _ks_from_u(u, max_domain, "ks_statistic")


def _ks_from_u(u: DataFrame, max_domain: int | None,
               fn: str) -> DataFrame:
    """KS tail shared by :func:`ks_statistic` (raw rows collapsed to
    the distinct domain) and :func:`ks_from_value_counts` (the
    streaming ingest's lossless histogram): domain guard, one
    cumulative window over the ``(v, ca, cb)`` frame, exact integer
    CDF divisions, TakeOrdered argmax."""
    u = _apply_domain_guard(u, max_domain, fn)
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = u.select("v", F.sum("ca").over(w).alias("cum_a"),
                 F.sum("cb").over(w).alias("cum_b"))
    n = u.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    d = (c.crossJoin(F.broadcast(n))
         .select("n_a", "n_b", F.col("v").alias("at_value"),
                 # an EMPTY side makes D undefined: NULL d_stat
                 # instead of an ANSI divide-by-zero
                 F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                        F.abs(F.col("cum_a") / F.col("n_a")
                              - F.col("cum_b") / F.col("n_b")))
                 .alias("d_stat")))
    return (d.orderBy(F.col("d_stat").desc(),
                      F.col("at_value").asc()).limit(1)
            .select("n_a", "n_b", "d_stat", "at_value"))


def ks_from_value_counts(vc: DataFrame,
                         max_domain: int | None = MAX_CDF_DOMAIN
                         ) -> DataFrame:
    """Two-sample KS from an EXACT per-value histogram ``(v, ca,
    cb)`` — the lossless state the streaming drift ingest maintains:
    identical integer cumulative counts, identical divisions,
    identical argmax as :func:`ks_statistic` over the raw rows, so
    KS-from-state is bit-identical to batch KS.  NULL values are
    excluded HERE (batch KS ignores them; the shared drift state DOES
    store null-v rows when ``value_expr`` evaluates to NULL, and a
    null sorting first would offset every cumulative count) — note
    the asymmetry with :func:`psi_from_value_counts`, which keeps
    them for batch-psi parity."""
    u = (vc.filter(F.col("v").isNotNull())
         .select("v", F.col("ca").cast("long").alias("ca"),
                 F.col("cb").cast("long").alias("cb")))
    return _ks_from_u(u, max_domain, "ks_from_value_counts")


def ab_test(df: DataFrame, side_col: str, side_a, side_b,
            success_expr: str) -> DataFrame:
    """Two-proportion A/B z-test: one row ``(n_a, s_a, n_b, s_b,
    rate_a, rate_b, z)`` comparing the ``success_expr`` conversion
    rate between the two sides.  z uses the pooled standard error —
    the standard superiority test; |z| > 1.96 ~ p < 0.05 two-sided.

    Exactness: the four counts are int64; rates, the pooled
    proportion, and z are a FIXED sequence of correctly-rounded
    double ops (divisions, one sqrt), so the statistic is
    bit-identical cross-engine.  Degenerate pooled rates (0 or 1 —
    zero variance) yield NULL z.

    Scale shape: ONE map-side conditional-count aggregate over the
    rows; everything after is arithmetic on a single row."""
    s = F.expr(success_expr).cast("boolean")
    side = F.col(side_col)
    agg = df.agg(
        F.sum(F.when(side == F.lit(side_a), 1).otherwise(0))
        .cast("long").alias("n_a"),
        F.sum(F.when((side == F.lit(side_a)) & s, 1).otherwise(0))
        .cast("long").alias("s_a"),
        F.sum(F.when(side == F.lit(side_b), 1).otherwise(0))
        .cast("long").alias("n_b"),
        F.sum(F.when((side == F.lit(side_b)) & s, 1).otherwise(0))
        .cast("long").alias("s_b"))
    rate_a = F.col("s_a") / F.col("n_a")
    rate_b = F.col("s_b") / F.col("n_b")
    pooled = (F.col("s_a") + F.col("s_b")) \
        / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pooled * (F.lit(1.0) - pooled)
                * (F.lit(1.0) / F.col("n_a")
                   + F.lit(1.0) / F.col("n_b")))
    z = F.when(se > 0, (rate_a - rate_b) / se)
    return agg.select("n_a", "s_a", "n_b", "s_b",
                      rate_a.alias("rate_a"), rate_b.alias("rate_b"),
                      z.alias("z"))


def psi(df: DataFrame, value_col: str, side_col: str,
        side_a, side_b, n_buckets: int = 10) -> DataFrame:
    """Population Stability Index between two sides — one row
    ``(n_a, n_b, psi)``.  Values bucket into ``n_buckets`` equal-width
    bins over the combined [min, max] (pure integer arithmetic:
    ``(v - lo) * B DIV (hi - lo + 1)`` on integer inputs), per-side
    bucket shares use add-one smoothing (p = (c+1)/(n+B), so empty
    buckets stay defined), and PSI = sum (p-q) * ln(p/q) folds in
    bucket order — the q155/q175 fixed-order contract, bit-identical
    cross-engine.  Rule of thumb: PSI < 0.1 stable, > 0.25 shifted.

    Scale shape: one conditional-count agg over the rows (map-side),
    then arithmetic over B bucket rows.  ``value_col`` must be
    integral (cents/ticks) — quantize first; that is also what makes
    the bucketing exact."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    from pyspark.sql import types as T
    dt = df.schema[value_col].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
        raise TypeError(
            f"psi needs an integral value column (got {value_col}:"
            f" {dt.simpleString()}) — quantize to cents/ticks first,"
            " which is also what makes the bucketing exact")
    B = int(n_buckets)
    v = F.col(value_col)
    side = F.col(side_col)
    two = df.filter(side.isin([side_a, side_b])) \
        .select(v.alias("v"), side.alias("s"))
    vc = (two.groupBy("v")
          .agg(F.sum(F.when(F.col("s") == F.lit(side_a), 1)
                     .otherwise(0)).cast("long").alias("ca"),
               F.sum(F.when(F.col("s") == F.lit(side_b), 1)
                     .otherwise(0)).cast("long").alias("cb")))
    return psi_from_value_counts(vc, n_buckets=B)


def psi_from_value_counts(vc: DataFrame,
                          n_buckets: int = 10) -> DataFrame:
    """PSI from an EXACT per-value histogram ``(v long, ca long,
    cb long)`` — the lossless state the streaming ingest maintains
    (:func:`preql_spark.streaming.stream.incremental_psi_ingest`).
    Bounds come from the histogram's own value domain, the integer
    equal-width bucketing runs over VALUES (count-weighted bucket
    sums — identical integers to bucketing the raw rows), and the
    add-one-smoothed (p-q)ln(p/q) terms fold in bucket order, so
    PSI-from-state is bit-identical to :func:`psi` over the raw
    rows.  Scale shape: everything after the (already bounded) value
    histogram is arithmetic over B bucket rows."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    B = int(n_buckets)
    bounds = vc.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    b = (vc.crossJoin(F.broadcast(bounds))
         .select(F.expr(f"(v - lo) * {B} DIV (hi - lo + 1)")
                 .alias("bucket"), "ca", "cb"))
    cnt = (b.groupBy("bucket")
           .agg(F.sum("ca").cast("long").alias("ca"),
                F.sum("cb").cast("long").alias("cb")))
    allb = (vc.sparkSession.range(B).select(
        F.col("id").alias("bucket"))
        .join(cnt, "bucket", "left")
        .select("bucket", F.coalesce("ca", F.lit(0)).alias("ca"),
                F.coalesce("cb", F.lit(0)).alias("cb")))
    g = allb.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"),
                 F.sort_array(F.collect_list(F.struct(
                     F.col("bucket"), F.col("ca"), F.col("cb"))))
                 .alias("__l"))

    def _term(e):
        p = (e["ca"].cast("double") + F.lit(1.0)) \
            / (F.col("n_a") + F.lit(B))
        q = (e["cb"].cast("double") + F.lit(1.0)) \
            / (F.col("n_b") + F.lit(B))
        return (p - q) * F.log(p / q)

    fold = F.aggregate("__l", F.lit(0.0), lambda a, e: a + _term(e))
    return g.select("n_a", "n_b", fold.alias("psi"))


def mann_whitney(df: DataFrame, value_col: str, side_col: str,
                 side_a, side_b,
                 max_domain: int | None = MAX_CDF_DOMAIN,
                 quantize_to=None) -> DataFrame:
    """Mann-Whitney U (rank-sum) test between two sides — one row
    ``(n_a, n_b, u, z)``: U for side a (U1 = R1 − n1(n1+1)/2, the
    scipy convention — positive z means side a ranks HIGHER) with
    average ranks over ties and the tie-corrected normal
    approximation.  The nonparametric complement to :func:`ab_test`
    (shift in location without normality assumptions).

    Exactness: ranks are handled in DOUBLED integer units
    (avg_rank*2 = 2*c_below + c + 1 — pure int64, no halves), so the
    rank sum is an exact integer; U, mu, and the tie-corrected sigma
    are then a FIXED sequence of double ops — bit-identical
    cross-engine.  Zero-variance degenerate cases (all values tied)
    yield NULL z.  NULL values are ignored.

    Scale shape: per-side counts collapse to the DISTINCT value
    domain; one cumulative window over that bounded domain (the
    :func:`ks_statistic` contract — and the same ENFORCED
    ``max_domain`` guard: an over-limit domain fails with a
    quantize-first message before the window's single task runs;
    ``max_domain=None`` opts out, ``quantize_to=<tick>`` opts into
    degradation instead — values tick-round via ``floor(v / tick) *
    tick`` before the collapse, identical to pre-quantizing the
    column yourself) and a map-side moment fold."""
    v = F.col(value_col)
    if quantize_to is not None:
        v = _quantize_col(v, quantize_to)
    base = df.filter(v.isNotNull())
    cnt = (base.filter(F.col(side_col).isin([side_a, side_b]))
           .groupBy(v.alias("v"))
           .agg(F.sum(F.when(F.col(side_col) == F.lit(side_a), 1)
                      .otherwise(0)).cast("long").alias("ca"),
                F.sum(F.when(F.col(side_col) == F.lit(side_b), 1)
                      .otherwise(0)).cast("long").alias("cb")))
    cnt = _apply_domain_guard(cnt, max_domain, "mann_whitney")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    c = cnt.withColumn(
        "__below", F.coalesce(F.sum(F.col("ca") + F.col("cb"))
                              .over(w), F.lit(0)))
    t = F.col("ca") + F.col("cb")
    # doubled average rank: 2 * c_below + t + 1 (int64)
    r2 = 2 * F.col("__below") + t + 1
    m = c.agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"),
              F.sum(r2 * F.col("ca")).alias("__r2a"),
              F.sum(t * t * t - t).alias("__tie"))
    n1, n2 = F.col("n_a"), F.col("n_b")
    n = n1 + n2
    # U for SIDE A (the scipy/Wikipedia U1 convention):
    # U1 = R1 - n1(n1+1)/2 — positive z means side a ranks higher
    u = (F.col("__r2a") / F.lit(2.0)
         - (n1 * (n1 + 1)) / F.lit(2.0))
    mu = (n1 * n2) / F.lit(2.0)
    sigma = F.sqrt((n1 * n2).cast("double") / F.lit(12.0)
                   * ((n + 1).cast("double")
                      - F.col("__tie").cast("double")
                      / (n * (n - 1)).cast("double")))
    z = F.when(sigma > 0, (u - mu) / sigma)
    return m.select("n_a", "n_b", u.alias("u"), z.alias("z"))


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Chi-square independence test between two categorical columns
    — one row ``(n, dof, chi2, cramers_v)``.  The categorical drift
    companion to :func:`psi` (numeric) and :func:`ks_statistic`
    (ordinal).

    Exactness: observed counts and marginals are int64; each cell's
    expected value is ONE exact division, the (o-e)^2/e terms fold in
    (a, b) cell order (the q175 fixed-order contract), and Cramér's
    V is one more fixed op chain — bit-identical cross-engine.  NULL
    categories count as their own level via null-safe grouping.

    Scale shape: one (a, b)-keyed partial agg to the contingency
    table (bounded by the category-pair domain), marginals from the
    cell table, one fold."""
    a, b = F.col(col_a), F.col(col_b)
    cells = (df.groupBy(a.alias("__a"), b.alias("__b"))
             .agg(F.count(F.lit(1)).alias("o")))
    return _chi_square_from_cells(cells)


def chi_square_from_value_counts(vc: DataFrame, side_a, side_b
                                 ) -> DataFrame:
    """Chi-square independence test from an EXACT per-value histogram
    ``(v, ca, cb)`` — the lossless state the streaming drift ingest
    maintains (:func:`preql_spark.streaming.stream.
    incremental_chi_square_ingest`): side membership is one
    categorical axis, the value the other.  The contingency cells
    rebuild as ``(side_a, v, ca)`` / ``(side_b, v, cb)`` rows (only
    observed cells, ``o > 0`` — exactly the cells a raw-row groupBy
    would produce) and flow through the SAME
    :func:`_chi_square_from_cells` tail as :func:`chi_square`, so
    chi-square-from-state is bit-identical to batch
    ``chi_square(df.filter(side.isin(a, b)), side_col, value_col)``
    over the raw rows.  NULL values are KEPT as their own category
    level (batch chi-square groups null-safe; note the asymmetry
    with :func:`ks_from_value_counts`, which must drop them).

    Scale shape: everything after the (already bounded) value
    histogram is arithmetic over the cell table — bounded by
    ``2 x |distinct values|``, never the corpus."""
    cells = (vc.select(F.explode(F.array(
        F.struct(F.lit(side_a).alias("__a"),
                 F.col("v").alias("__b"),
                 F.col("ca").cast("long").alias("o")),
        F.struct(F.lit(side_b).alias("__a"),
                 F.col("v").alias("__b"),
                 F.col("cb").cast("long").alias("o"))))
        .alias("__c"))
        .select("__c.*")
        .filter(F.col("o") > 0))
    return _chi_square_from_cells(cells)


def _chi_square_from_cells(cells: DataFrame) -> DataFrame:
    """Chi-square tail shared by :func:`chi_square` (cells from a
    raw-row groupBy) and :func:`chi_square_from_value_counts` (cells
    rebuilt from the streaming ingest's lossless histogram): window
    marginals over the cell table, null-safe level counts, one fixed
    (a, b)-ordered fold — the shared tail IS the bit-identity
    argument between the batch and from-state reports."""
    # marginals as window sums over the (tiny) cell table: window
    # partitions treat a NULL category as its own level, where an
    # equi-join back would silently drop it
    j = cells.select(
        "__a", "__b", "o",
        F.sum("o").over(Window.partitionBy("__a")).alias("__ra"),
        F.sum("o").over(Window.partitionBy("__b")).alias("__cb"))
    g = j.agg(
        F.sum("o").alias("n"),
        # struct-wrap so a NULL category still counts as a level
        F.count_distinct(F.struct("__a")).alias("__r"),
        F.count_distinct(F.struct("__b")).alias("__c"),
        F.sort_array(F.collect_list(F.struct(
            F.col("__a"), F.col("__b"), F.col("o"),
            F.col("__ra"), F.col("__cb")))).alias("__l"))

    def _term(e):
        exp = (e["__ra"] * e["__cb"]).cast("double") / F.col("n")
        d = e["o"].cast("double") - exp
        return d * d / exp

    chi2 = F.aggregate("__l", F.lit(0.0), lambda acc, e: acc + _term(e))
    dof = (F.col("__r") - 1) * (F.col("__c") - 1)
    mind = F.least(F.col("__r") - 1, F.col("__c") - 1)
    v = F.when(mind > 0,
               F.sqrt(chi2 / (F.col("n") * mind).cast("double")))
    return g.select("n", dof.cast("long").alias("dof"),
                    chi2.alias("chi2"), v.alias("cramers_v"))


def z_outliers_from_value_counts(vc: DataFrame,
                                 k: float = 3.0) -> DataFrame:
    """Per-value z-scores from an EXACT per-(group, value) integer
    histogram ``(g, v, cnt)`` — the lossless state the streaming
    metric monitor maintains (:func:`preql_spark.streaming.stream.
    incremental_z_monitor_ingest`, the same state as the quantile
    ingest): each group's moments are exact int64 sums (n, Σv·cnt,
    Σv²·cnt) pushed through a FIXED sequence of double ops —
    ``mean = s/n``, ``var = max((ss - s·s/n)/(n-1), 0)`` — and every
    observed value scores ``z = (v - mean)/stddev``, flagged at
    ``|z| > k`` — output ``(g, v, cnt, z, is_anomaly)``.  NULL
    values are excluded from the moments and carry NULL z;
    zero-variance and single-count groups score NULL z / false flag
    (nothing to judge against).

    This function is ALSO the batch operator's tail
    (:func:`z_outliers` builds the same histogram from raw rows), so
    from-state == batch bit-identically — the shared-tail identity
    argument of :func:`_chi_square_from_cells`.

    Scale shape: the moments ride UNORDERED window sums over the
    histogram (no sort frame, no self-join — the vc frame is read
    ONCE, so the batch operator scans the corpus once), then pure
    per-row arithmetic; everything after the histogram is bounded by
    groups × distinct values, never the corpus."""
    if k <= 0:
        raise ValueError(f"k must be > 0, got {k}")
    v, cnt = F.col("v"), F.col("cnt")
    wg = Window.partitionBy("g")
    n = F.sum(F.when(v.isNotNull(), cnt)).over(wg)
    s = F.sum(F.when(v.isNotNull(), v * cnt)).over(wg)
    ss = F.sum(F.when(v.isNotNull(), v * v * cnt)).over(wg)
    mean = s.cast("double") / n
    var = F.when(
        n > 1,
        F.greatest(
            (ss.cast("double") - s.cast("double") * s / n) / (n - 1),
            F.lit(0.0)))
    sd = F.sqrt(var)
    z = F.when(v.isNotNull() & (sd > 0),
               (v.cast("double") - mean) / sd)
    return vc.select("g", "v", cnt.cast("long").alias("cnt"),
                     z.alias("z"),
                     F.coalesce(F.abs(z) > F.lit(float(k)),
                                F.lit(False)).alias("is_anomaly"))


def z_outliers(df: DataFrame, group_col: str, value_col: str,
               k: float = 3.0) -> DataFrame:
    """Batch twin of the streaming metric monitor: which observed
    integer values are outliers against their group's mean and
    sample stddev — ``(g, v, cnt, z, is_anomaly)``, one row per
    distinct (group, value), flagged at ``|z| > k``.  Builds the
    exact ``(g, v, cnt)`` histogram a raw-row groupBy produces and
    flows through the SAME :func:`z_outliers_from_value_counts`
    tail as the streaming report, so batch and from-state are
    bit-identical by construction.  ``value_col`` must be integral
    (the exact-moments contract) — quantize to cents/ticks first;
    :func:`rolling_anomalies` is the per-event windowed sibling,
    this is the per-value population gate.

    Scale shape: ONE (group, value) partial agg (map-side combine)
    over the corpus; everything after is arithmetic on the bounded
    histogram."""
    from pyspark.sql import types as T
    dt = df.schema[value_col].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
        raise TypeError(
            f"z_outliers needs an integral value column (got "
            f"{value_col}: {dt.simpleString()}) — quantize to "
            "cents/ticks first, which is what makes the moments "
            "exact")
    vc = (df.groupBy(F.col(group_col).alias("g"),
                     F.col(value_col).cast("long").alias("v"))
          .agg(F.count(F.lit(1)).alias("cnt")))
    return z_outliers_from_value_counts(vc, k=k)

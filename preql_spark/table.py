"""Table — the fluent front-end over a DataFrame + catalog metadata.

Each method maps one reference operator (SURVEY.md §2) onto the
DataFrame expression that Catalyst optimizes best; nothing executes
until an action (``collect``/``show``/``count``/``write``).  The class
is immutable: every operator returns a new Table sharing the engine.

Reference parity citations are per-method.  Scale notes: projections
and filters stay declarative so parquet pushdown + column pruning are
free; ``order().limit()`` lowers to TakeOrderedAndProject; joins defer
physical strategy to Catalyst/AQE with explicit broadcast hints
available for FK-discovered dimension tables.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from preql_spark.engine import Engine, TableMeta


class Desc:
    """Marker for descending sort — Preql ``^field`` (preql.lark:120)."""

    def __init__(self, col):
        self.col = col


def desc(col) -> Desc:
    return Desc(col)


class Exclude:
    """Ellipsis-exclusion marker — Preql ``... !field``
    (compiler.py:81-128 ``_expand_ellipsis``)."""

    def __init__(self, *names: str):
        self.names = names


def exclude(*names: str) -> Exclude:
    return Exclude(*names)


def _as_col(x, table: "Table | None" = None) -> Column:
    if isinstance(x, Column):
        return x
    if callable(x) and table is not None:
        return _as_col(x(table), table)
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def _plain_attr_name(c) -> str | None:
    """The column's name iff it is a trivial attribute reference —
    used to detect direct column references for ellipsis hiding
    (reference ``direct_names``, compiler.py:82)."""
    if not isinstance(c, Column):
        return None
    import re as _re
    m = _re.fullmatch(r"Column<'(\w+)'>", str(c))
    return m.group(1) if m else None


class Table:
    """Immutable logical table: DataFrame + (pk, fks) metadata."""

    def __init__(self, engine: Engine, df: DataFrame, meta: TableMeta | None = None):
        self.engine = engine
        self.df = df
        self.meta = meta or TableMeta("anon")

    # ---- column access ---------------------------------------------
    def __getattr__(self, name: str) -> Column:
        # attribute misses resolve table methods first (reference
        # MethodInstance dispatch, evaluate.py:57-59), then fall
        # through to column references
        if name.startswith("_"):
            raise AttributeError(name)
        meta = object.__getattribute__(self, "meta")
        if meta.methods and name in meta.methods:
            return meta.methods[name](self)
        return self.df[name]

    def __getitem__(self, item):
        # t[col] -> Column;  t[cond] -> filter;  t[a:b] -> slice
        # (reference selection t[...] compiler.py:583-613; slice :555-580)
        if isinstance(item, str):
            return self.df[item]
        if isinstance(item, slice):
            return self.slice(item.start or 0, item.stop)
        if isinstance(item, (Column, list, tuple)):
            conds = item if isinstance(item, (list, tuple)) else [item]
            return self.filter(*conds)
        raise TypeError(f"cannot index Table with {type(item)}")

    @property
    def columns(self) -> list[str]:
        """Reference ``columns(t)`` — pql_functions.py:627-665."""
        return self.df.columns

    @property
    def schema(self):
        return self.df.schema

    def pipe(self, fn, *args, **kwargs):
        """Apply a DataFrame operator while staying in the fluent
        Table API: ``t.pipe(chunk_dedup, chunk=3).group(...)``.
        ``fn`` takes the underlying DataFrame first (every function in
        ``preql_spark.operators`` fits); a DataFrame result is
        re-wrapped as a Table, anything else (stats tuples, model
        objects) passes through unchanged."""
        out = fn(self.df, *args, **kwargs)
        return self._with(out) if isinstance(out, DataFrame) else out

    def _with(self, df: DataFrame, name: str | None = None) -> "Table":
        return Table(self.engine, df, TableMeta(name or self.meta.name,
                                                pk=self.meta.pk, fks=self.meta.fks,
                                                methods=self.meta.methods,
                                                backrefs=getattr(
                                                    self.meta, "backrefs",
                                                    None) or {}))

    # ---- projection -------------------------------------------------
    def project(self, *items, **named) -> "Table":
        """Preql projection ``t{f1, n: expr, ...}`` with ellipsis
        splicing (compiler.py:186-280; ellipsis :81-128).

        ``items``: column names, Columns, ``(name, expr)`` tuples
        (named fields that keep their position), ``...`` (splice
        remaining columns at this position), or ``exclude("a","b")``
        (splice all but those).  ``named``: name=expression appended at
        the end (str | Column | callable(table) -> Column).

        Reference-parity rules (_expand_ellipsis, compiler.py:81-128):
        the ellipsis expands IN PLACE, in table column order, skipping
        every directly-referenced column — positional names AND named
        fields whose value is a plain column reference (``{name2:
        name, ...}`` hides ``name``; ``{name2: name+"!", ...}`` does
        not).  Excluding a missing column raises; excluding a directly
        included one raises."""
        entries: list = [*items, *named.items()]
        direct: set[str] = set()
        for it in entries:
            if isinstance(it, str):
                direct.add(it)
            elif isinstance(it, tuple):
                src = it[1] if isinstance(it[1], str) else \
                    _plain_attr_name(it[1])
                if src is not None:
                    direct.add(src)
        out: list[Column] = []
        for it in entries:
            if it is Ellipsis or isinstance(it, Exclude):
                skip = list(it.names) if isinstance(it, Exclude) else []
                missing = [n for n in skip if n not in self.df.columns]
                if missing:
                    raise NameError(
                        f"Fields to exclude {missing} not found")
                clash = [n for n in skip if n in direct]
                if clash:
                    raise NameError(
                        f"Field to exclude {clash} is explicitly "
                        "included in projection")
                out.extend(self.df[c] for c in self.df.columns
                           if c not in direct and c not in skip
                           # FK/backref traversal helper columns are
                           # private to the expression that made them
                           and not c.startswith(("__fk_", "__br_")))
            elif isinstance(it, str):
                out.append(self.df[it])
            elif isinstance(it, tuple):
                out.append(_as_col(it[1], self).alias(it[0]))
            else:
                out.append(_as_col(it, self))
        if not out:
            # reference: excluding every column is a TypeError
            # (test_basic.py:139 `[3]{... !item}`)
            raise TypeError("projection is empty (all columns excluded)")
        return self._with(self.df.select(*out))

    def with_columns(self, **named) -> "Table":
        """Keep everything, add/replace computed columns (sugar for
        ``project(..., **named)``)."""
        return self._with(self.df.withColumns(
            {n: _as_col(e, self) for n, e in named.items()}))

    # ---- selection --------------------------------------------------
    def filter(self, *conds) -> "Table":
        """Preql selection ``t[c1, c2]`` — conditions ANDed
        (compiler.py:583-613)."""
        df = self.df
        for c in conds:
            df = df.filter(_as_col(c, self))
        return self._with(df)

    # ---- group / aggregate -----------------------------------------
    def group(self, by=None, **aggs) -> "Table":
        """Preql grouped projection ``t {keys => aggs}``
        (compiler.py:217-277).

        ``by``: str | list | dict(name -> expr); None/[] = global
        aggregate (reference ``{=> aggs}`` compiles LIMIT-1 global agg,
        compiler.py:274-275).  ``aggs`` values: aggregate Columns, or a
        bare column-name string → collect the group's values into an
        array (reference MakeArray, compiler.py:59-63 / sql.py:300-315).
        """
        if by is None:
            by = []
        if isinstance(by, str):
            by = [by]
        if isinstance(by, dict):
            keys = [_as_col(e, self).alias(n) for n, e in by.items()]
        else:
            keys = [_as_col(k, self) for k in by]
        agg_cols = []
        for n, e in aggs.items():
            if isinstance(e, str):
                e = F.collect_list(self.df[e])  # bare column → array
            elif callable(e) and not isinstance(e, Column):
                e = _as_col(e, self)
            agg_cols.append(e.alias(n))
        if keys:
            return self._with(self.df.groupBy(*keys).agg(*agg_cols))
        return self._with(self.df.agg(*agg_cols))

    def agg_scalar(self, expr) -> "Table":
        """Whole-table scalar aggregate, e.g. ``sum(t{area})``
        (reference dual-mode agg — __builtins__.pql:3-27)."""
        return self.group(None, value=_as_col(expr, self))

    def cube(self, by: list, **aggs) -> "Table":
        """Beyond-reference: grouping sets (SURVEY §2.4 'cheap to add')."""
        agg_cols = [_as_col(e, self).alias(n) for n, e in aggs.items()]
        return self._with(self.df.cube(*[_as_col(k, self) for k in by]).agg(*agg_cols))

    def rollup(self, by: list, **aggs) -> "Table":
        agg_cols = [_as_col(e, self).alias(n) for n, e in aggs.items()]
        return self._with(self.df.rollup(*[_as_col(k, self) for k in by]).agg(*agg_cols))

    def grouping_sets(self, sets: list[list[str]], **aggs) -> "Table":
        """Explicit GROUPING SETS (the general form of cube/rollup):
        one pass computes an arbitrary list of groupings; columns not
        in a given set come back NULL.  All sets share one shuffle
        (Spark expands rows per set before the partial aggregate)."""
        agg_cols = [_as_col(e, self).alias(n) for n, e in aggs.items()]
        all_keys = list(dict.fromkeys(k for s in sets for k in s))
        gs = self.df.groupingSets([[F.col(k) for k in s] for s in sets],
                                  *[F.col(k) for k in all_keys])
        return self._with(gs.agg(*agg_cols))

    def unpivot(self, ids: list[str] | str, value_cols: list[str],
                var_name: str = "variable",
                value_name: str = "value") -> "Table":
        """Melt wide columns to (variable, value) rows — the inverse of
        pivot.  Metadata-only reshape: no shuffle, output rows =
        input rows × len(value_cols)."""
        ids = [ids] if isinstance(ids, str) else list(ids)
        return self._with(self.df.unpivot(ids, value_cols,
                                          var_name, value_name))

    def histogram(self, col, lo: float, hi: float, bins: int = 10) -> "Table":
        """Fixed-range histogram: (bucket, lo, hi, n) — one partial-agg
        pass, bucket = floor((x-lo)/width) clamped to [0, bins-1].
        Fixed range keeps it single-pass; for unknown ranges run
        describe_stats first (two passes total)."""
        c = F.col(col) if isinstance(col, str) else col
        width = (hi - lo) / bins
        bucket = F.least(F.greatest(
            F.floor((c - lo) / width), F.lit(0)), F.lit(bins - 1)).cast("int")
        return self._with(
            self.df.filter(c.isNotNull())
            .select(bucket.alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
            .select("bucket",
                    (F.lit(lo) + F.col("bucket") * width).alias("lo"),
                    (F.lit(lo) + (F.col("bucket") + 1) * width).alias("hi"),
                    "n"))

    def pivot(self, key, pivot_col: str, values: list, agg) -> "Table":
        return self._with(self.df.groupBy(_as_col(key, self))
                          .pivot(pivot_col, values).agg(agg))

    def distinct(self) -> "Table":
        """Reference distinct(t) — __builtins__.pql:259-274."""
        return self._with(self.df.distinct())

    def explode(self, col: str, alias: str | None = None,
                outer: bool = False) -> "Table":
        """Unnest an array column to one row per element (the inverse
        of the bare-column-in-agg collect_list); ``outer=True`` keeps
        rows with empty/null arrays as a null element."""
        fn = F.explode_outer if outer else F.explode
        others = [c for c in self.df.columns if c != col]
        return self._with(self.df.select(
            *others, fn(F.col(col)).alias(alias or col)))

    def map_range(self, start, end, alias: str = "index") -> "Table":
        """Reference map_range(tbl, start, end) — __builtins__.pql:
        592-650: fan each row out into (end - start) rows carrying an
        ``alias`` index in [start, end); bounds may be constants or
        per-row expressions.  Pure explode(sequence()) — scan-local,
        no shuffle."""
        s = F.lit(start) if isinstance(start, int) else _as_col(start, self)
        e = F.lit(end) if isinstance(end, int) else _as_col(end, self)
        # sequence(5, 4) would auto-step DOWN; empty ranges must fan
        # out to zero rows (explode drops the null array)
        seq = F.when(e > s, F.sequence(s, e - 1))
        return self._with(self.df.select(
            "*", F.explode(seq).alias(alias)))

    def describe(self) -> "Table":
        """Reference describe(tbl) — __builtins__.pql:656-667."""
        return self._with(self.df.summary("count", "mean", "stddev", "min", "max"))

    def describe_stats(self, *cols: str) -> "Table":
        """Deterministic numeric describe: one row per column with
        (column, n, mean, sd, lo, hi) as typed values — the reference's
        describe() semantics (count/mean/stddev/min/max,
        __builtins__.pql:656-667) without .summary()'s string
        formatting.  One aggregate pass over the table; the per-column
        rows are unpivoted from a single row of aggregates, so wide
        tables still scan once."""
        from pyspark.sql import functions as F
        cols = cols or [f.name for f in self.df.schema
                        if f.dataType.typeName() in
                        ("integer", "long", "double", "float", "short", "decimal")]
        aggs = []
        for c in cols:
            aggs += [F.count(c).alias(f"__n_{c}"),
                     F.avg(F.col(c).cast("double")).alias(f"__mean_{c}"),
                     F.stddev(F.col(c).cast("double")).alias(f"__sd_{c}"),
                     F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
        one = self.df.agg(*aggs)
        rows = F.array(*[
            F.struct(F.lit(c).alias("col_name"),
                     F.col(f"__n_{c}").alias("n"),
                     F.col(f"__mean_{c}").alias("mean"),
                     F.col(f"__sd_{c}").alias("sd"),
                     F.col(f"__lo_{c}").alias("lo"),
                     F.col(f"__hi_{c}").alias("hi"))
            for c in cols])
        return self._with(
            one.select(F.explode(rows).alias("__s")).select("__s.*"))

    def sample_hash(self, key, ratio: float) -> "Table":
        """Deterministic content-hash sampling: keep rows whose
        md5-based portable hash of ``key`` falls below ``ratio``.
        Unlike rand()-based sample(), the choice is a pure function of
        the key — reproducible across runs, engines, and cluster
        topology, which is what training-data pipelines need for
        stable held-out splits."""
        from pyspark.sql import functions as F
        from preql_spark.operators.text import portable_hash
        k = F.col(key) if isinstance(key, str) else key
        bucket = portable_hash(k.cast("string")) % 1000000
        return self._with(self.df.filter(bucket < int(ratio * 1000000)))

    def sample_mixture(self, group_col: str, ratios: dict,
                       key: str) -> "Table":
        """Data-mixture sampling: keep a per-group deterministic
        fraction of rows — the mixture-weighting step of training-data
        assembly (upsample/downsample each source toward target
        proportions; ratios > 1 are clamped to keep-all, this operator
        never duplicates rows).  Selection is the same content-hash
        bucket rule as :meth:`sample_hash` on the ROW-UNIQUE ``key``
        column (the id column, not the group column — hashing the
        group value would give every row in a group the same bucket,
        collapsing any ratio to keep-all/keep-none per group), so the
        mixture is reproducible across runs, engines, and topology.
        ``key`` is therefore required, like ``cap_per_domain``'s
        ``order_by``.  Scan-local: one filter, no shuffle."""
        from pyspark.sql import functions as F

        from preql_spark.operators.text import portable_hash
        if key is None:
            raise ValueError(
                "sample_mixture requires a row-unique `key` column; "
                "hashing the group column would make the bucket "
                "constant per group (keep-all/keep-none, not a "
                "fraction)")
        k = F.col(key)
        bucket = portable_hash(k.cast("string")) % 1000000
        cond = F.lit(False)
        for grp, ratio in ratios.items():
            cond = cond | ((F.col(group_col) == grp)
                           & (bucket < int(min(ratio, 1.0) * 1000000)))
        return self._with(self.df.filter(cond))

    def temperature_mixture(self, group_col: str, key: str,
                            target_rows: int,
                            alpha: float = 0.5) -> "Table":
        """Temperature-based source rebalancing (the multilingual /
        XLM-R sampling rule): group g's share of the kept corpus is
        proportional to ``count_g ** alpha`` — alpha < 1 flattens the
        natural distribution, upweighting small sources — scaled so
        the expected kept total is ``target_rows``.  Per-group keep
        ratios are computed from the group counts and applied through
        :meth:`sample_mixture`'s deterministic content-hash rule on
        the row-unique ``key``.

        Scale shape: one count aggregate whose result is bounded by
        the GROUP CARDINALITY (sources/languages — dozens, not
        corpus-sized) crosses to the driver, then the keep filter is
        scan-local.  Determinism: the ratio arithmetic is a fixed
        left-fold over groups in ascending group order — with the
        default ``alpha=0.5`` every step (sqrt, /, *) is a correctly
        rounded IEEE op, so an engine replaying the same counts
        reproduces the thresholds bit-for-bit (general ``alpha`` uses
        pow, which libm only guarantees to 1 ulp — fine for
        production, not for bit-exact replay)."""
        import math

        from pyspark.sql import functions as F
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"alpha must be in (0, 1], got {alpha}")
        if target_rows < 0:
            raise ValueError(f"target_rows must be >= 0, got {target_rows}")
        counts = {r[0]: r[1] for r in
                  self.df.groupBy(group_col).count().collect()}
        if None in counts:
            # a NULL group can never match sample_mixture's equality
            # filter (rows would vanish silently) and breaks the
            # sorted-group ratio fold — make the contract explicit
            raise ValueError(
                f"temperature_mixture: {group_col!r} contains NULLs; "
                "fill or filter them upstream")
        if not counts:
            return self._with(self.df.limit(0))
        wfun = (math.sqrt if alpha == 0.5
                else (lambda c: math.pow(c, alpha)))
        s = 0.0
        for g in sorted(counts):
            s += wfun(float(counts[g]))
        ratios = {g: (wfun(float(c)) / s) * float(target_rows) / float(c)
                  for g, c in counts.items()}
        return self.sample_mixture(group_col, ratios, key)

    def shuffle_deterministic(self, key, seed: int = 0,
                              n_files: int | None = None) -> "Table":
        """Deterministic global permutation for training-order
        shuffling: sort by a seeded content hash of ``key``.  The
        order is a pure function of (key, seed) — re-runs, engines,
        and cluster topologies all produce the same epoch order, and
        changing ``seed`` gives an independent permutation per epoch.
        One range-partitioned sort (what any global shuffle costs);
        ``n_files`` pins the output partition count for writing."""
        from pyspark.sql import functions as F
        k = F.col(key) if isinstance(key, str) else key
        h = F.xxhash64(k.cast("string"), F.lit(seed))
        df = self.df.withColumn("__shuf", h)
        if n_files is not None:
            df = df.repartitionByRange(n_files, "__shuf") \
                   .sortWithinPartitions("__shuf")
        else:
            df = df.orderBy("__shuf")
        return self._with(df.drop("__shuf"))

    def interleave_sources(self, group_col: str, key: str,
                           pos_col: str = "pos") -> "Table":
        """Deterministic proportional interleave for training-order
        layout: every group (source/language) progresses uniformly
        through the epoch — row r of a c-row group lands at position
        ``r / c`` in (0, 1], with the within-group order a
        reproducible content-hash permutation of ``key`` (the
        :meth:`shuffle_deterministic` rule).  Reading the result in
        ``pos_col`` order consumes each source at a constant rate — a
        small source spreads across the whole epoch instead of
        clustering, without any sampling.

        Plan/scale: one group-partitioned window pass (row_number +
        count over the same partitioning — a single shuffle on the
        group key) followed by one range-partitioned global sort,
        which is what ANY total ordering costs; no single-reducer
        window anywhere.  Position arithmetic is one IEEE division of
        exact integers, so the layout replays bit-identically on any
        engine."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from preql_spark.operators.text import portable_hash
        w = Window.partitionBy(group_col).orderBy(
            portable_hash(F.col(key).cast("string")), F.col(key))
        wc = Window.partitionBy(group_col)
        pos = (F.row_number().over(w).cast("double")
               / F.count(F.lit(1)).over(wc).cast("double"))
        return self._with(
            self.df.withColumn(pos_col, pos)
                .orderBy(pos_col, group_col, key))

    def split_by_hash(self, key, splits: dict, label: str = "split") -> "Table":
        """Deterministic train/validation/test split: label every row
        by which cumulative hash-bucket range its ``key`` falls into,
        e.g. ``{"train": 0.9, "valid": 0.05, "test": 0.05}``.  Because
        the assignment is a pure function of the key (not rand()), the
        split is reproducible across runs/engines AND group-aware: use
        the dedup cluster id or source domain as ``key`` and all
        near-duplicate rows land on the same side — the leakage-safe
        way to hold out evaluation data (packaged end-to-end as
        :func:`preql_spark.operators.dedup.leakage_safe_split`).
        Fractions must sum to 1."""
        from preql_spark.operators.text import hash_split_label
        return self._with(
            self.df.withColumn(label, hash_split_label(key, splits)))

    # ---- order / slice / limit -------------------------------------
    def order(self, *keys) -> "Table":
        """Preql ``t order {a, ^b}`` (compiler.py:283-303).  Accepts
        "col", "^col" (desc), Column, desc(col)."""
        sort_cols = []
        for k in keys:
            if isinstance(k, Desc):
                sort_cols.append(_as_col(k.col, self).desc())
            elif isinstance(k, str) and k.startswith("^"):
                sort_cols.append(F.col(k[1:]).desc())
            else:
                sort_cols.append(_as_col(k, self))
        return self._with(self.df.orderBy(*sort_cols))

    def slice(self, start: int, stop: int | None = None) -> "Table":
        """Preql ``t[start..stop]`` → OFFSET/LIMIT (compiler.py:555-580).
        Spark 3.4+ has native offset."""
        df = self.df
        if start:
            df = df.offset(start)
        if stop is not None:
            df = df.limit(stop - start)
        return self._with(df)

    def limit(self, n: int) -> "Table":
        """Reference limit(t, n) — __builtins__.pql:131-137."""
        return self._with(self.df.limit(n))

    def page(self, index: int, page_size: int) -> "Table":
        """Reference page(t, i, size) — __builtins__.pql:553-557."""
        return self.slice((index - 1) * page_size, index * page_size)

    def top_k(self, k: int, *keys) -> "Table":
        """Idiom ``order {^x} [..k]`` → TakeOrderedAndProject.  Keys
        use order() syntax: "col" ascending, "^col" / desc(col)
        descending — so tiebreakers keep their own direction."""
        return self.order(*keys).limit(k)

    def sample_ratio(self, ratio: float, seed: int = 42) -> "Table":
        """Reference sample_ratio_fast — __builtins__.pql:515-529."""
        return self._with(self.df.sample(fraction=ratio, seed=seed))

    def sample_n(self, n: int, seed: int = 42) -> "Table":
        """Reference sample_fast(t, n) — __builtins__.pql:531-551.
        Approximate fraction + limit top-up, no full shuffle."""
        total = self.df.count()
        if total <= n:
            return self
        frac = min(1.0, (n / total) * 1.2)
        return self._with(self.df.sample(fraction=frac, seed=seed).limit(n))

    # ---- window helpers --------------------------------------------
    #: auto-switch threshold for enum(): inputs estimated above this
    #: take the distributed plan (a "driver page" of interactive
    #: results stays on the simple global window).  Catalyst's
    #: sizeInBytes OVERestimates post-filter, which errs toward the
    #: safe (parallel) plan.
    ENUM_AUTO_BYTES = 64 * 1024 * 1024

    def enum(self, order_by=None,
             distributed: bool | None = None) -> "Table":
        """Reference enum(tbl): prepend 0-based ``index``
        (__builtins__.pql:290-311).

        ``distributed=None`` (default) AUTO-SWITCHES: inputs whose
        Catalyst size estimate exceeds ``ENUM_AUTO_BYTES`` take the
        two-pass range-partition + per-partition-offsets plan (stays
        parallel at 100 TB — one tiny count job plus per-partition
        windows), anything interactive-sized keeps the one global
        window.  Pass True/False to force a path; the two plans agree
        whenever the order key is unique.  TIED keys may enumerate in
        a different — equally valid — order between the two plans, so
        the auto mode's assignment for ties follows the size
        estimate; pass an explicit ``distributed=`` (or a tiebreaking
        order key) where plan-stable tie numbering matters."""
        if distributed is None:
            try:
                est = self.df._jdf.queryExecution().optimizedPlan() \
                    .stats().sizeInBytes()
                if not isinstance(est, int):  # py4j BigInteger
                    est = int(est.toString())
                distributed = est > self.ENUM_AUTO_BYTES
            except Exception:
                distributed = False
        if distributed:
            return self._enum_distributed(order_by)
        if order_by is not None:
            w = Window.orderBy(_as_col(order_by, self))
        else:
            w = Window.orderBy(F.monotonically_increasing_id())
        idx = (F.row_number().over(w) - F.lit(1)).alias("index")
        return self._with(self.df.select(idx, "*"))

    def _enum_distributed(self, order_by=None) -> "Table":
        """Parallel global enumeration: range-partition on the order
        key (or keep input partitioning), freeze partition ids, count
        rows per partition (small driver-side job), then per-partition
        row_number + broadcast cumulative offsets."""
        ord_col = _as_col(order_by, self) if order_by is not None \
            else F.monotonically_increasing_id()
        part = self.df.repartitionByRange(ord_col) if order_by is not None \
            else self.df
        tagged = part.withColumn("__pid", F.spark_partition_id()) \
            .localCheckpoint(eager=False)
        counts = tagged.groupBy("__pid").count().collect()
        offsets, acc = {}, 0
        for r in sorted(counts, key=lambda r: r["__pid"]):
            offsets[r["__pid"]] = acc
            acc += r["count"]
        omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        w = Window.partitionBy("__pid").orderBy(ord_col)
        out = (tagged.withColumn(
            "index", F.row_number().over(w) - 1 + omap[F.col("__pid")])
            .drop("__pid"))
        return self._with(out.select("index", *self.df.columns))

    # ---- joins ------------------------------------------------------
    def join(self, other: "Table", on=None, how: str = "inner",
             broadcast_other: bool = False) -> "Table":
        """Flat binary join. ``on=None`` triggers auto-join through the
        FK registry (reference _auto_join — pql_functions.py:439-455):
        exactly one FK must exist between the two tables, else error.
        ``on`` may be a column name, list of names, or a boolean Column
        (theta join, reference ``$on:`` — pql_functions.py:503-507)."""
        right = other.df
        if broadcast_other:
            right = F.broadcast(right)
        if on is None:
            lcol, rcol = _auto_join_cols(self, other)
            cond = self.df[lcol] == other.df[rcol]
            return self._with(self.df.join(right, cond, how))
        if isinstance(on, Column):
            return self._with(self.df.join(right, on, how))
        return self._with(self.df.join(right, on, how))

    def joinall(self, other: "Table") -> "Table":
        """Cartesian product — reference joinall (pql_functions.py:596-613)."""
        return self._with(self.df.crossJoin(other.df))

    def in_table(self, other: "Table", lcol: str, rcol: str | None = None,
                 negate: bool = False) -> "Table":
        """Membership against a table: ``x in t`` → left-semi join;
        ``!in`` → left-anti (reference Contains — sql.py:319-329)."""
        how = "left_anti" if negate else "left_semi"
        cond = self.df[lcol] == other.df[rcol or lcol]
        return self._with(self.df.join(other.df, cond, how))

    # ---- set operations (compile_binops.py:185-199) -----------------
    def _align_setop(self, other: "Table", name: str) -> DataFrame:
        """Positional alignment for set ops (reference sql_bin_op —
        pql_functions.py:362-383): match columns by POSITION, require
        equal arity and per-position type compatibility; the result
        keeps the left table's column names (``t1.type``).  Same-typed
        tables with different column names therefore combine, unlike
        ``unionByName``."""
        lf, rf = self.df.schema.fields, other.df.schema.fields
        if len(lf) != len(rf):
            raise TypeError(
                f"Cannot {name} tables due to column mismatch "
                f"(table1 has {len(lf)} columns, table2 has {len(rf)} columns)")
        from pyspark.sql import functions as F
        from pyspark.sql.types import NumericType
        cols = []
        for e1, e2 in zip(lf, rf):
            if e1.dataType == e2.dataType:
                cols.append(F.col(e2.name).alias(e1.name))
            elif isinstance(e1.dataType, NumericType) and \
                    isinstance(e2.dataType, NumericType):
                cols.append(F.col(e2.name).cast(e1.dataType).alias(e1.name))
            else:
                raise TypeError(
                    f"Cannot {name}. Column types don't match: "
                    f"'{e1.dataType.simpleString()}' and "
                    f"'{e2.dataType.simpleString()}'")
        return other.df.select(*cols)

    def __add__(self, other: "Table") -> "Table":
        """``t1 + t2`` → UNION ALL, positional (pql_functions.py:411-417)."""
        return self._with(self.df.union(self._align_setop(other, "concatenate")))

    def __or__(self, other: "Table") -> "Table":
        """``t1 | t2`` → UNION DISTINCT (pql_functions.py:403-409)."""
        return self._with(
            self.df.union(self._align_setop(other, "union")).distinct())

    def __and__(self, other: "Table") -> "Table":
        """``t1 & t2`` → INTERSECT, distinct (pql_functions.py:385-391)."""
        return self._with(self.df.intersect(self._align_setop(other, "intersect")))

    def __sub__(self, other: "Table") -> "Table":
        """``t1 - t2`` → EXCEPT, distinct like the reference — NOT
        EXCEPT ALL (pql_functions.py:393-401: plain EXCEPT dedups)."""
        return self._with(self.df.subtract(self._align_setop(other, "subtract")))

    # ---- row access -------------------------------------------------
    def one(self, nullable: bool = False):
        """Assert exactly one row (``one`` / ``one?``) and return it —
        reference evaluate.py:678-709."""
        rows = self.df.limit(2).collect()
        if len(rows) == 1:
            return rows[0]
        if not rows and nullable:
            return None
        raise ValueError(f"'one' expected 1 row, got {'>1' if rows else '0'}")

    def is_empty(self) -> bool:
        """Reference is_empty — __builtins__.pql:192-197."""
        return self.df.isEmpty()

    # ---- actions ----------------------------------------------------
    def count(self) -> int:
        return self.df.count()

    def collect(self):
        return self.df.collect()

    def to_pandas(self):
        """Reference TablePromise.to_pandas — api.py:31-88."""
        return self.df.toPandas()

    def to_json(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.df.collect()]

    def show(self, n: int = 20, truncate: bool | int = True, vertical: bool = False):
        self.df.show(n, truncate=truncate, vertical=vertical)

    def preview(self, offset: int = 0, fmt: str = "text") -> str:
        """Bounded table rendering (reference table_repr,
        preql/core/display.py:189-221): header with `=N` / `>=N`
        count, preview rows, `...` marker when truncated.  Never
        scans more than display.MAX_AUTO_COUNT rows."""
        from preql_spark.display import table_repr
        return table_repr(self, offset=offset, fmt=fmt)

    def _repr_html_(self) -> str:
        """Jupyter hook — the reference's HtmlDisplay surface
        (display.py:282-305)."""
        from preql_spark.display import table_repr
        return table_repr(self, fmt="html")

    def cache(self) -> "Table":
        return self._with(self.df.cache())

    def write_orc(self, path: str, mode: str = "overwrite") -> None:
        """ORC sink (columnar; same pushdown/pruning properties as
        parquet for engines that prefer ORC)."""
        self.df.write.mode(mode).orc(path)

    def write_csv(self, path: str, mode: str = "overwrite",
                  header: bool = True) -> None:
        """CSV sink — the interchange-with-spreadsheets format; flat
        schemas only (arrays/structs don't fit CSV)."""
        self.df.write.mode(mode).option("header", header).csv(path)

    def write_sqlite(self, path: str, table: str,
                     mode: str = "overwrite",
                     batch_rows: int = 10_000) -> int:
        """SQLite sink — the write half of the migration round-trip
        with the reference's default storage target (its persistent
        databases are SQLite files; ``Engine.import_sqlite`` is the
        read half).  Streams through ``toLocalIterator`` in
        ``batch_rows`` chunks, so driver memory stays bounded at one
        batch; still inherently a single-connection funnel — a
        RESULT/dimension export, not a corpus sink (exactly the shape
        the reference itself has).  Returns the row count written.
        ``mode``: "overwrite" drops an existing table, "append" adds,
        "error" raises when the table exists.  Struct/array/map
        columns serialize as their JSON text (SQLite has no composite
        types)."""
        import sqlite3
        if mode not in ("overwrite", "append", "error"):
            raise ValueError(
                f"mode must be overwrite/append/error, got {mode!r}")
        _SQLT = {"bigint": "INTEGER", "int": "INTEGER",
                 "smallint": "INTEGER", "tinyint": "INTEGER",
                 "double": "REAL", "float": "REAL",
                 "boolean": "INTEGER", "string": "TEXT",
                 "binary": "BLOB", "date": "DATE",
                 "timestamp": "DATETIME", "timestamp_ntz": "DATETIME"}
        cols = self.df.dtypes
        qt = '"' + table.replace('"', '""') + '"'
        con = sqlite3.connect(path)
        try:
            exists = con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' "
                "AND name=?", (table,)).fetchone()
            if exists and mode == "error":
                raise ValueError(f"table {table!r} already exists")
            if exists and mode == "overwrite":
                con.execute(f"DROP TABLE {qt}")
                exists = None
            if not exists:
                # decimals declare TEXT deliberately: NUMERIC affinity
                # would coerce the bound string to a lossy REAL —
                # TEXT keeps the full precision round-trippable
                decl = ", ".join(
                    f'"{n}" {_SQLT.get(t, "TEXT")}' for n, t in cols)
                con.execute(f"CREATE TABLE {qt} ({decl})")
            ph = ", ".join("?" for _ in cols)
            ins = f"INSERT INTO {qt} VALUES ({ph})"

            def jsonable(v):
                from pyspark.sql import Row as _Row
                if isinstance(v, _Row):
                    return {k: jsonable(x)
                            for k, x in v.asDict().items()}
                if isinstance(v, dict):
                    # JSON keys must be strings (e.g. map<date, _>)
                    return {str(k): jsonable(x) for k, x in v.items()}
                if isinstance(v, (list, tuple)):
                    return [jsonable(x) for x in v]
                return v

            def bindable(v):
                import datetime as _dt
                import decimal as _dec

                from pyspark.sql import Row as _Row
                if isinstance(v, (_Row, dict, list, tuple)):
                    import json
                    return json.dumps(jsonable(v), default=str)
                if isinstance(v, _dec.Decimal):
                    # sqlite3 can't bind Decimal; str is lossless and
                    # SQLite's NUMERIC affinity reads it back numeric
                    return str(v)
                if isinstance(v, _dt.datetime):
                    # explicit ISO text — sqlite3's default datetime
                    # adapters are deprecated since Python 3.12
                    return v.isoformat(sep=" ")
                if isinstance(v, _dt.date):
                    return v.isoformat()
                return v

            n, batch = 0, []
            for row in self.df.toLocalIterator():
                batch.append(tuple(bindable(v) for v in row))
                if len(batch) >= batch_rows:
                    con.executemany(ins, batch)
                    n += len(batch)
                    batch = []
            if batch:
                con.executemany(ins, batch)
                n += len(batch)
            con.commit()
            return n
        finally:
            con.close()

    def write_jsonl(self, path: str, mode: str = "overwrite",
                    n_shards: int | None = None) -> None:
        """Write as JSON-lines shards — the interchange format of
        training-data pipelines.  ``n_shards`` repartitions to an
        exact shard count (costs one round-robin shuffle — asking for
        a fixed count is a layout decision); None keeps the plan's
        partitioning, which at 100 TB (one file per task) is the
        right default."""
        df = self.df
        if n_shards is not None:
            df = df.repartition(n_shards)
        df.write.mode(mode).json(path)

    def write_parquet(self, path: str, mode: str = "overwrite") -> None:
        """Plain parquet sink (see write_partitioned / write_bucketed /
        write_clustered for the layout-aware variants)."""
        self.df.write.mode(mode).parquet(path)

    def write_zordered(self, path: str, cols: list, bits: int = 16,
                       n_files: int | None = None,
                       mode: str = "overwrite") -> None:
        """Z-ordered parquet layout (the Delta/Iceberg `OPTIMIZE
        ZORDER BY` shape): one range-partitioned global sort on the
        Morton interleave of ``cols``, so every file's min/max footer
        stats are tight on ALL interleaved columns — scans filtering
        on any of them prune files, not just the leading sort key.
        Costs exactly the one sort shuffle a plain sorted write costs.
        ``n_files`` pins the output file count (a layout decision,
        like write_jsonl's n_shards); None lets AQE size the range
        partitions."""
        from preql_spark.operators.layout import zorder_key
        df = self.df.withColumn("__z", zorder_key(cols, bits))
        if n_files is not None:
            df = df.repartitionByRange(n_files, "__z") \
                   .sortWithinPartitions("__z")
        else:
            df = df.orderBy("__z")
        df.drop("__z").write.mode(mode).parquet(path)

    def write_bucketed(self, name: str, cols: list[str] | str,
                       buckets: int = 16, sort_by: list[str] | str | None = None,
                       mode: str = "overwrite") -> "Table":
        """Persist hash-bucketed (+ optionally sorted) by the join/agg
        keys — the engine's scale analogue of the reference's
        ``add_index`` (pql_functions.py:1043-1082): two tables bucketed
        on the same keys join with ZERO exchanges (verified in
        tests/test_plans.py), and aggregations on the bucket keys skip
        their shuffle.  At 100 TB this is the difference between
        re-shuffling the fact table per query and paying the shuffle
        once at write time."""
        cols = [cols] if isinstance(cols, str) else list(cols)
        if mode == "overwrite":
            # drop metastore entry AND any orphaned location (a crashed
            # writer can leave files without a catalog entry)
            self.engine.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
            import shutil
            wh = self.engine.spark.conf.get("spark.sql.warehouse.dir", "")
            loc = os.path.join(wh.removeprefix("file:"), name.lower())
            if loc.startswith("/") and os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
        w = (self.df.write.format("parquet").mode(mode)
             .bucketBy(buckets, *cols))
        if sort_by:
            sort_by = [sort_by] if isinstance(sort_by, str) else list(sort_by)
            w = w.sortBy(*sort_by)
        w.saveAsTable(name)
        out = self.engine.spark.table(name)
        self.engine.register(name, out, pk=self.meta.pk,
                             fks=self.meta.fks)
        return self.engine.table(name)

    def write_partitioned(self, path: str, by: list[str] | str,
                          mode: str = "overwrite") -> "Table":
        """Persist hive-partitioned by ``by`` — scans that filter on
        the partition columns prune at the directory level
        (PartitionFilters in the scan, verified in tests/test_plans.py).
        Choose low-cardinality columns (date, source, language): at
        100 TB a date-partitioned fact table turns a time-range query
        from a full scan into a handful of directories."""
        by = [by] if isinstance(by, str) else list(by)
        self.df.write.mode(mode).partitionBy(*by).parquet(path)
        return self._with(self.engine.spark.read.parquet(path))

    def write_clustered(self, path: str, by: list[str] | str,
                        mode: str = "overwrite",
                        n_files: int | None = None) -> "Table":
        """Persist range-clustered on ``by``: rows are range-
        partitioned then sorted within files, so every parquet file
        covers a narrow key range and its min/max footer statistics
        let range/point predicates skip whole files (the Z-order-lite
        answer for single-dimension clustering — the complement of
        hive partitioning for HIGH-cardinality keys like timestamps
        or ids, where one-directory-per-value would explode)."""
        by = [by] if isinstance(by, str) else list(by)
        from pyspark.sql import functions as F
        cols = [F.col(c) for c in by]
        part = (self.df.repartitionByRange(n_files, *cols) if n_files
                else self.df.repartitionByRange(*cols))
        (part.sortWithinPartitions(*cols)
         .write.mode(mode).parquet(path))
        return self._with(self.engine.spark.read.parquet(path))

    def sample_stratified(self, key, strata_col: str,
                          ratios: dict, default: float = 0.0) -> "Table":
        """Deterministic per-stratum hash sampling: each stratum keeps
        its own ratio of rows (by content hash of ``key``), unlisted
        strata keep ``default``.  The balanced-dataset primitive for
        training pipelines (e.g. downsample boilerplate sources, keep
        all rare ones) — reproducible across runs and engines like
        :meth:`sample_hash`."""
        from pyspark.sql import functions as F
        from preql_spark.operators.text import portable_hash
        k = F.col(key) if isinstance(key, str) else key
        bucket = portable_hash(k.cast("string")) % 1000000
        thr = F.lit(int(default * 1000000))
        for stratum, ratio in sorted(ratios.items()):
            thr = F.when(F.col(strata_col) == stratum,
                         F.lit(int(ratio * 1000000))).otherwise(thr)
        return self._with(self.df.filter(bucket < thr))

    def sample_weighted(self, key, weight, n: int) -> "Table":
        """Deterministic weighted sampling without replacement
        (Efraimidis-Spirakis A-Res): rank every row by
        ln(u) / w where u is a (0,1) uniform derived from the content
        hash of ``key``, keep the top ``n``.  Heavier rows win
        proportionally more often, the draw is a pure function of the
        data (reproducible across runs/engines), and the plan is a
        TakeOrderedAndProject — per-partition heaps, no global sort."""
        from pyspark.sql import functions as F
        from preql_spark.operators.text import portable_hash
        k = F.col(key) if isinstance(key, str) else key
        w = F.col(weight) if isinstance(weight, str) else weight
        # 2^40 buckets: tie probability stays negligible at corpus
        # scale (1e6 buckets would birthday-collide in the thousands)
        m = 1 << 40
        u = (portable_hash(k.cast("string")) % m + 1) / float(m + 1)
        score = F.log(u) / w.cast("double")
        return self._with(
            self.df.withColumn("__ws", score)
            .orderBy(F.col("__ws").desc()).limit(n).drop("__ws"))

    def temptable(self, name: str) -> "Table":
        """Reference temptable — pql_functions.py:327-348: session-scoped
        materialized table.  Spark analogue: cache + temp view + catalog
        registration so later queries (DataFrame or SQL) reuse the
        materialization instead of recomputing the lineage."""
        self.df.cache().createOrReplaceTempView(name)
        return self.engine.register(name, self.df, pk=self.meta.pk, fks=self.meta.fks)

    def inspect_plan(self, mode: str = "formatted") -> str:
        """Reference inspect_sql (pql_functions.py:76-83) → the Spark
        analogue is the optimized/physical plan text."""
        return self.df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            self.df._jdf.queryExecution(), mode)

    def explain(self, mode: str = "formatted"):
        self.df.explain(mode)


def _auto_join_cols(a: Table, b: Table) -> tuple[str, str]:
    """Discover the unique FK between two tables (reference
    _find_table_reference — pql_functions.py:619-625). Returns
    (left_col, right_col); raises if zero or ambiguous."""
    cands: list[tuple[str, str]] = []
    for col, (tgt, tgt_col) in (a.meta.fks or {}).items():
        if tgt == b.meta.name:
            cands.append((col, tgt_col))
    for col, (tgt, tgt_col) in (b.meta.fks or {}).items():
        if tgt == a.meta.name:
            cands.append((tgt_col, col))
    if not cands:
        raise ValueError(
            f"no FK relation between {a.meta.name!r} and {b.meta.name!r}")
    if len(cands) > 1:
        raise ValueError(
            f"ambiguous join between {a.meta.name!r} and {b.meta.name!r}: {cands}")
    return cands[0]


def join(how: str = "inner", on: Column | None = None,
         broadcast: Iterable[str] = (), **tables: Table) -> Table:
    """N-ary keyword join with struct-per-table output — the reference's
    ``join(a: t1, b: t2)`` (pql_functions.py:458-529): result columns are
    one struct per input table, named by the keyword.

    Join keys: explicit ``on`` boolean Column (theta, ``$on:``), else
    auto-join resolution pairwise through the FK registry over all
    already-joined tables (pql_functions.py:512-525).
    ``broadcast``: names of inputs to hint as broadcast (dimension
    tables at 100 TB scale — keeps the big fact table shuffle-free).
    """
    if len(tables) < 2:
        raise ValueError("join requires at least two tables")
    names = list(tables)
    engine = tables[names[0]].engine
    aliased = {n: t.df.alias(n) for n, t in tables.items()}
    for n in broadcast:
        aliased[n] = F.broadcast(aliased[n])

    # `on` forms: a single Column (theta join of two tables) or a list
    # of k-1 Columns applied stepwise for a k-way chain (join-by-column
    # spelling `join(a: t1.x, b: t2.y, c: t3.z)` — reference
    # test_basic.py test_triple_join)
    conds: list | None
    if on is None:
        conds = None
    elif isinstance(on, (list, tuple)):
        if len(on) != len(names) - 1:
            raise ValueError(
                f"join of {len(names)} tables needs {len(names) - 1} "
                f"conditions, got {len(on)}")
        conds = list(on)
    elif len(names) == 2:
        conds = [on]
    else:
        raise ValueError("explicit `on` with >2 tables must be a list "
                         "of per-step conditions")
    joined = aliased[names[0]]
    joined_names = [names[0]]
    for step, n in enumerate(names[1:]):
        if conds is not None:
            cond = conds[step]
        else:
            cond = _resolve_auto_cond(tables, joined_names, n)
        joined = joined.join(aliased[n], cond, how)
        joined_names.append(n)

    structs = [F.struct(*[F.col(f"{n}.{c}") for c in tables[n].df.columns]).alias(n)
               for n in names]
    return Table(engine, joined.select(*structs), TableMeta("join"))


def leftjoin(on: Column | None = None, **tables: Table) -> Table:
    """Reference leftjoin — pql_functions.py:582-587."""
    return join(how="left", on=on, **tables)


def outerjoin(on: Column | None = None, **tables: Table) -> Table:
    """Reference outerjoin — pql_functions.py:589-594."""
    return join(how="full", on=on, **tables)


def joinall(**tables: Table) -> Table:
    """Reference joinall (cartesian) — pql_functions.py:596-613."""
    names = list(tables)
    engine = tables[names[0]].engine
    joined = tables[names[0]].df.alias(names[0])
    for n in names[1:]:
        joined = joined.crossJoin(tables[n].df.alias(n))
    structs = [F.struct(*[F.col(f"{n}.{c}") for c in tables[n].df.columns]).alias(n)
               for n in names]
    return Table(engine, joined.select(*structs), TableMeta("join"))


def _resolve_auto_cond(tables: dict[str, Table], joined: list[str], new: str) -> Column:
    """Auto-join the incoming table against any already-joined one via
    the FK registry; ambiguity across the chain is an error (reference
    n-way resolution — pql_functions.py:512-525)."""
    cands = []
    t_new = tables[new]
    for jn in joined:
        t_j = tables[jn]
        for col, (tgt, tgt_col) in (t_j.meta.fks or {}).items():
            if tgt == t_new.meta.name:
                cands.append(F.col(f"{jn}.{col}") == F.col(f"{new}.{tgt_col}"))
        for col, (tgt, tgt_col) in (t_new.meta.fks or {}).items():
            if tgt == t_j.meta.name:
                cands.append(F.col(f"{new}.{col}") == F.col(f"{jn}.{tgt_col}"))
    if not cands:
        raise ValueError(f"no FK path from {joined} to {new!r}")
    if len(cands) > 1:
        raise ValueError(f"ambiguous FK path from {joined} to {new!r}")
    return cands[0]


def zipjoin(a: Table, b: Table, how: str = "inner",
            order_a=None, order_b=None) -> Table:
    """Positional join, like Python ``zip`` — reference
    zipjoin/zipjoin_left/zipjoin_longest (__builtins__.pql:167-257):
    row_number over both sides + equi-join on index.  ``order_a`` /
    ``order_b`` define each side's positional order (defaults to the
    physical row order, like the reference's table order).  Both sides
    enumerate via the distributed two-pass path (per-partition offsets)
    — no single-partition global window — and then meet in one
    equi-join shuffle on the index."""
    cols_a, cols_b = a.df.columns, b.df.columns
    ea = a.enum(order_by=order_a, distributed=True).df \
        .withColumnRenamed("index", "__zi").alias("za")
    eb = b.enum(order_by=order_b, distributed=True).df \
        .withColumnRenamed("index", "__zi").alias("zb")
    hows = {"inner": "inner", "left": "left", "longest": "full"}
    j = ea.join(eb, F.col("za.__zi") == F.col("zb.__zi"), hows[how])
    sa = F.struct(*[F.col(f"za.{c}") for c in cols_a]).alias("a")
    sb = F.struct(*[F.col(f"zb.{c}") for c in cols_b]).alias("b")
    return Table(a.engine, j.select(sa, sb), TableMeta("zipjoin"))

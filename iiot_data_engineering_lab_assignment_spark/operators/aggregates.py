"""Aggregation operators (SURVEY.md section 2.4).

A1 — the reference's four-function rollup AVG/MIN/MAX/COUNT
(flink-jobs/sensor_aggregation.py:90-93); A2 — multi-key grouping (:97);
A3 — the batch re-aggregation of the streaming rollup (PDF Task 4.2,
specified-but-unimplemented in the reference).  Plus the extended
aggregate surface (distinct, approximate, rollup/cube) that Spark gives
for free and the engine exposes as first-class.

Scale notes: every aggregate here is a hash aggregate with map-side
partial aggregation — Spark plans partial_avg/min/max/count before the
shuffle, so the shuffle carries one row per (partition x group), not per
input row.  Group keys of low cardinality (16 sensor groups) make the
shuffle trivially small even at 100 TB of input; AQE coalesces the
post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ROLLUP_AGGS",
    "sensor_rollup",
    "grouped_stats",
    "rollup_partials",
    "merge_rollup_partials",
    "ewma_state_segmented",
    "kmv_hash52",
    "key_skew_profile",
    "profile_salted_rollup",
]


def ROLLUP_AGGS(value_col: str = "value") -> list[Column]:
    """The reference's aggregate list (sensor_aggregation.py:90-93), named
    exactly as the sink table columns (init-db.sql:29-32).

    avg_value is exact-DECIMAL-sum / count rather than float AVG: float
    summation order varies with partitioning, and for 2-decimal sensor
    values the true mean often terminates exactly ON a rounding boundary
    (sum/32 has 7 decimal digits), so last-bit differences flip any
    rounded comparison.  The decimal route is order-independent and
    bit-identical across engines; for 2-4dp inputs it equals true AVG.
    """
    return [
        (
            F.sum(F.col(value_col).cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("count_readings"),
    ]


def sensor_rollup(df: DataFrame, *group_cols: str, value_col: str = "value") -> DataFrame:
    """A1+A2 without the time window: AVG/MIN/MAX/COUNT grouped by the given
    keys.  The windowed variants live in operators.windows."""
    return df.groupBy(*group_cols).agg(*ROLLUP_AGGS(value_col))


def rollup_partials(
    df: DataFrame, *group_cols: str, value_col: str = "value"
) -> DataFrame:
    """ALGEBRAIC PARTIAL STATES of the four-function rollup — what an
    incremental pipeline persists per ingestion unit (per day, per
    micro-batch, per backfill slice) so the running total NEVER requires
    re-reading history: (decimal sum, min, max, count) are each mergeable
    by a further sum/min/max/sum, unlike the finalized avg.

    At 100 TB this is the difference between a nightly rollup that scans
    one day and one that scans three years: store partials keyed by
    (group keys x day), merge with :func:`merge_rollup_partials` at
    query time (or incrementally).  The decimal sum keeps the merged
    average bit-identical to a direct rollup regardless of how the data
    was sliced — float partial sums would drift with the slicing.
    """
    return df.groupBy(*group_cols).agg(
        F.sum(F.col(value_col).cast("decimal(18,4)")).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("count_readings"),
    )


def merge_rollup_partials(states: DataFrame, group_cols: list[str]) -> DataFrame:
    """Combine partial rollup states (any number of slices, any slicing)
    into the finalized AVG/MIN/MAX/COUNT rollup over the given keys.
    sum-of-sums / min-of-mins / max-of-maxes / sum-of-counts, then the
    average is derived LAST from the exact decimal total — the same
    two-phase shape Spark itself uses for partial aggregation, lifted to
    cross-run persistence."""
    return (
        states.groupBy(*group_cols)
        .agg(
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.sum("count_readings").alias("count_readings"),
        )
        .select(
            *group_cols,
            (F.col("sum_value").cast("double") / F.col("count_readings")).alias(
                "avg_value"
            ),
            "min_value",
            "max_value",
            "count_readings",
        )
    )


def kmv_hash52(expr: str) -> Column:
    """The KMV sketch family's 52-bit hash: fold the first 13 hex chars
    of ``md5(CAST(expr AS STRING))`` into a BIGINT.  52 bits make
    ``hv / 2**52`` an exactly-representable dyadic double, and the md5
    family is reproducible in the DuckDB oracle (``list_reduce`` /
    ``list_transform`` over the same digits), so every sketch value and
    every estimate derived from it is bit-identical across engines.
    Shared by the batch KMV set-algebra query and the streaming KMV
    store; production deployments would swap xxhash64 exactly as the
    MinHash pair (minhash_lsh_pairs vs _md5 twin) does."""
    return F.expr(
        "aggregate(transform(sequence(1, 13), i -> cast(locate(substr("
        f"md5(cast(({expr}) as string)), i, 1), '0123456789abcdef') - 1 as bigint)), "
        "0L, (a, x) -> a * 16 + x)"
    )


def grouped_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    mode: str = "groupby",
) -> DataFrame:
    """Extended aggregate surface over one value column.

    mode: 'groupby' | 'rollup' | 'cube' — hierarchical/grouping-set
    aggregates (not in the reference; exposed because the engine's query
    surface is the full DataFrame API, SURVEY.md section 2.4 note).

    sum/avg here are FLOAT aggregates: fine for analysis, but their low
    bits depend on partitioning — for cross-engine/exactness-sensitive
    use, decimal-cast inside the aggregate (see registry.dsum/davg;
    float-sum-then-cast leaks the error into decimals once totals reach
    ~1e10).
    """
    aggs = [
        F.sum(value_col).alias("sum_value"),
        F.avg(value_col).alias("avg_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.count(F.lit(1)).alias("count_rows"),
    ]
    if mode == "rollup":
        return df.rollup(*group_cols).agg(*aggs)
    if mode == "cube":
        return df.cube(*group_cols).agg(*aggs)
    return df.groupBy(*group_cols).agg(*aggs)


def ewma_state_segmented(
    df: DataFrame,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    alpha: float = 0.3,
    segment_col: str | None = None,
) -> DataFrame:
    """Tree-aggregable EWMA — the scale path for the recurrence
    y_t = alpha*x_t + (1-alpha)*y_{t-1} (zero-initialized, y_0 = 0) when
    a key's series is too long for one task's sorted-array fold.

    EWMA composes ASSOCIATIVELY as affine maps: a segment holding values
    x_1..x_n folds to (m, c) with y_out = m*y_in + c, where
    m = (1-alpha)^n and c is the segment's own zero-seeded fold; two
    consecutive segments compose as (m1*m2, m2*c1 + c2).  So the plan
    is the standard two-level partial-aggregate shape: (1) ONE shuffle
    to (key, segment) computes per-segment (m, c) from a bounded sorted
    array — segment size (e.g. one day) bounds task memory regardless
    of series length; (2) the tiny per-segment summaries fold in
    segment order per key.  Float caveat: re-association changes
    summation order, so the result agrees with the direct fold to
    ~1e-12 relative, not bit-for-bit — use the direct form
    (registry.ewma_sensor_state) when an external value-hash must match.

    ``segment_col`` defaults to the calendar day of ``time_col``.
    Returns (key..., n_obs, ewma).
    """
    seg = (
        F.col(segment_col) if segment_col else F.to_date(time_col).alias("_seg")
    )
    per_seg = (
        df.select(*key_cols, seg.alias("_seg"), F.col(time_col).alias("_t"), F.col(value_col).alias("_v"))
        .groupBy(*key_cols, "_seg")
        .agg(
            F.sort_array(F.collect_list(F.struct("_t", "_v"))).alias("_tv"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    vals = F.transform(F.col("_tv"), lambda e: e["_v"])
    # zero-seeded fold of the segment, and its decay factor (1-a)^n
    c = F.aggregate(
        vals, F.lit(0.0), lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc
    )
    m = F.pow(F.lit(1.0 - alpha), F.col("_n"))
    summaries = per_seg.select(
        *key_cols,
        F.struct(F.col("_seg").alias("s"), m.alias("m"), c.alias("c")).alias("_mc"),
        F.col("_n"),
    )
    per_key = summaries.groupBy(*key_cols).agg(
        F.sort_array(F.collect_list("_mc")).alias("_mcs"),
        F.sum("_n").alias("n_obs"),
    )
    zero = F.struct(F.lit(1.0).alias("m"), F.lit(0.0).alias("c"))
    composed = F.aggregate(
        F.col("_mcs"),
        zero,
        lambda acc, x: F.struct(
            (acc["m"] * x["m"]).alias("m"),
            (x["m"] * acc["c"] + x["c"]).alias("c"),
        ),
    )
    return per_key.select(*key_cols, "n_obs", composed["c"].alias("ewma"))


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    parallelism: int = 32,
) -> DataFrame:
    """Shuffle-key skew reconnaissance: the profile a pipeline runs on a
    join/aggregation key BEFORE pointing 1000 executors at it — the
    measurement that decides between a plain shuffle, a broadcast, and a
    salted join (the decision `salted_join_revenue` hard-codes, made
    data-driven).

    Per heavy key (top ``top_k`` by count, (count DESC, key) tiebreak):
    exact row count, corpus share in exact ppm (integer cross-multiply,
    no float division), and ``needs_salt`` — TRUE when the key alone
    carries more rows than a fair 1/``parallelism`` share, i.e. the
    straggler condition: one reducer of a ``parallelism``-way shuffle
    would process more rows than its fair slice even if every other key
    balanced perfectly.  One hash aggregate (map-side partial combine
    absorbs the skew this operator measures — counting a hot key is
    cheap even when joining on it is not) + a top-k.  The share of all
    OTHER keys is readable from total_rows, carried on every row."""
    total = df.agg(F.count(F.lit(1)).alias("total_rows"))
    counts = df.groupBy(F.col(key_col).alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key_value",
            "cnt",
            "total_rows",
            F.expr("cnt * 1000000 DIV total_rows").alias("share_ppm"),
            (F.col("cnt") * parallelism > F.col("total_rows")).alias(
                "needs_salt"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc("key_value"))
        .limit(top_k)
    )


def profile_salted_rollup(
    df: DataFrame,
    key_col: str,
    extra_group_cols: list[str] | None = None,
    value_col: str = "value",
    parallelism: int = 32,
    top_k: int = 20,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-ADAPTIVE four-function rollup (r14 verdict ask #4): profile
    ``key_col`` with :func:`key_skew_profile`; keys whose ``needs_salt``
    predicate fires take a TWO-STAGE salted aggregate — partial states
    per (key, extra keys, salt) via :func:`rollup_partials`, merged by
    :func:`merge_rollup_partials` — while every cold key runs the plain
    one-stage hash aggregate.  Both slices union into one plan; when no
    key trips the predicate, the plain rollup IS the plan.  This is the
    aggregation dual of :func:`~..joins.profile_salted_join`: the same
    measurement, now driving the reference's own A1/A2 shape.

    When salting a groupBy actually matters: for algebraic aggregates,
    Spark's map-side partial aggregation already absorbs most key skew —
    a hot key spread over many map tasks pre-combines before the
    shuffle.  The cases the two-stage form exists for are the ones
    partial aggregation cannot save: engines or plans without map-side
    combine, where the hot key's raw rows really do land on one
    reducer.  The salt splits that reducer into ``salt_buckets`` and
    the merge stage is group-cardinality-sized.  Profiling the LEADING
    key alone over-approximates hotness for composite groupings (a hot
    leading key salts all its subgroups) — the safe direction: extra
    salting costs one vocabulary-sized merge, a missed hot key costs a
    straggler.

    MEASURED on this engine (tools/adaptive_agg_probe.py, SCALE.md
    "Round-15 adaptive-aggregation probe"): the plain one-stage rollup
    wins on BOTH a planted 30%-share hot key (3.84 s vs 5.22 s at 40M
    rows) and uniform keys — Spark's partial aggregation pre-combines
    the skew away, so the adaptive form's delta is the profile pass
    itself.  That is the opposite of the JOIN dual (r14: +22% for
    adaptive), where reducers receive raw replicated rows.  Read
    ``needs_salt`` on a decomposable aggregate as "partial aggregation
    already has this"; this operator is the semantics-proven
    decomposition for the plans that lack it.

    Output schema equals :func:`sensor_rollup` over
    ``[key_col, *extra_group_cols]``: the exact decimal partial sums
    re-merge associatively, so the salted result is bit-identical to
    the plain rollup (driver-proven by ``profile_salted_agg_revenue``'s
    all-plain oracle).  The hot-key list is the only driver round-trip,
    parameter-sized (<= ``top_k``).
    """
    extra = list(extra_group_cols or [])
    group_cols = [key_col, *extra]
    prof = key_skew_profile(df, key_col, top_k=top_k, parallelism=parallelism)
    hot = [r["key_value"] for r in prof.filter(F.col("needs_salt")).collect()]
    if not hot:
        return sensor_rollup(df, *group_cols, value_col=value_col)
    df_hot = df.filter(F.col(key_col).isin(hot))
    df_cold = df.filter(~F.col(key_col).isin(hot) | F.col(key_col).isNull())
    salted = df_hot.withColumn(
        "_salt", (F.rand(42) * salt_buckets).cast("int")
    )
    hot_rolled = merge_rollup_partials(
        rollup_partials(salted, *group_cols, "_salt", value_col=value_col),
        group_cols,
    )
    cold_rolled = sensor_rollup(df_cold, *group_cols, value_col=value_col)
    return hot_rolled.unionByName(cold_rolled)

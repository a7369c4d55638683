"""Join operators (SURVEY.md section 2.6).

The reference implements NO joins — its star schema stays implicit
(machine metadata at ingestion/ingest_data.py:19-24 is never emitted, so
never joined).  For capability parity the engine exposes Spark's full join
surface with explicit strategy control, because at 100 TB the difference
between a broadcast and a shuffle join IS the query plan:

* dimension tables (region/nation/supplier/machines) -> ``broadcast()``
  hint: no shuffle of the fact side at all.
* fact-fact joins (orders x lineitem) -> sort-merge on the shuffle key;
  AQE converts to broadcast at runtime when a side turns out small and
  splits skewed partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "join_dim",
    "join_fact",
    "semi_join",
    "anti_join",
    "fuzzy_block_join",
    "profile_salted_join",
]


def fuzzy_block_join(
    df: DataFrame,
    block_on: Column,
    compare: Column,
    max_distance: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Record-linkage fuzzy self-join: candidate pairs restricted to an
    exact BLOCKING key, then verified by Levenshtein edit distance —
    the classic entity-resolution shape (Fellegi-Sunter blocking), and
    the string-metric sibling of the dedup cascade's shingle/LSH tiers
    (catches small in-place edits that change every containing shingle).

    Scale posture mirrors the capped posting join: records meet ONLY
    inside a block (an equi-join key — never a cross product), so
    candidates are sum(block_size^2)/2 and the O(m^2)-per-pair edit
    distance runs on candidates alone.  Pick blocking keys the way
    record-linkage practice does: cheap, high-recall prefixes/phonetic
    codes; run several redundant blocking passes and union when one
    key's recall is not enough (a miss here is a block miss, not a
    verify miss).  A hot block is AQE-splittable; cap pathological keys
    with a frequency filter like ``_cap_postings`` if the data has them.

    Output: (id_a, id_b, distance), id_a < id_b, distance <= max.
    """
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    s = df.select(
        F.col(id_col).alias("_id"), block_on.alias("_blk"), compare.alias("_cmp")
    )
    a, b = s.alias("a"), s.alias("b")
    dist = F.levenshtein(F.col("a._cmp"), F.col("b._cmp"))
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dist.alias("distance"),
        )
        .filter(F.col("distance") <= max_distance)
    )


def join_dim(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact-to-dimension join; the dimension side is broadcast so the fact
    table never shuffles (map-side hash join on every executor)."""
    return fact.join(F.broadcast(dim), on, how)


def join_fact(
    left: DataFrame, right: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Fact-to-fact join: shuffle on the join key (sort-merge / shuffled
    hash chosen by Catalyst, AQE-adjusted at runtime).  Callers co-locating
    multiple joins on the same key should pre-``repartition`` once and reuse
    the exchange."""
    return left.join(right, on, how)


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """EXISTS-style filtering join: keeps left rows with a match, emits only
    left columns, never duplicates (unlike inner join + distinct — and
    cheaper: the right side reduces to its join key)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str] | Column) -> DataFrame:
    """NOT EXISTS-style filtering join: keeps left rows WITHOUT a match."""
    return left.join(right, on, "left_anti")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the heavy left side gets a random salt in
    [0, salt_buckets); the right side is replicated salt_buckets times; the
    join runs on (key, salt), spreading a hot key over `salt_buckets`
    partitions instead of one straggler task.

    AQE's skew-join split handles most skew automatically (on in
    session.py); explicit salting is the manual override for the cases AQE
    can't fix — a single key too large for any one partition even after
    splitting, or non-AQE engines.  For ``inner``/``left`` joins the result
    rows are identical to the plain join (salt columns are internal).
    ``right``/``full`` are rejected: the right side is replicated
    `salt_buckets` times, so unmatched right rows would be emitted once per
    replica — dedup'ing them back would need a second shuffle, defeating
    the point.  Flip the sides (salt the heavy side) instead.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): the "
            "replicated right side would duplicate unmatched right rows under "
            "right/full outer joins"
        )
    salted_l = left.withColumn("_salt", (F.rand(42) * salt_buckets).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    salted_r = right.select("*", salts)
    out = salted_l.join(
        salted_r,
        (F.col(left_key) == F.col(right_key)) & (salted_l["_salt"] == salted_r["_salt"]),
        how,
    )
    return out.drop(salted_l["_salt"]).drop(salted_r["_salt"])


def profile_salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    parallelism: int = 32,
    top_k: int = 20,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-ADAPTIVE equi-join: profile the left key with
    :func:`~..aggregates.key_skew_profile`, salt ONLY the keys whose
    ``needs_salt`` predicate fires (a single key outweighing a fair
    1/``parallelism`` reducer slice), and send every cold key through the
    plain shuffle — the decision :func:`salted_join` hard-codes, made by
    the measurement that exists to make it (r13 verdict ask #5).

    Why not salt everything: salting replicates the non-preserved side
    ``salt_buckets``x and forbids full-outer joins; paying that tax on a
    uniformly-distributed key is pure overhead.  Why not salt nothing:
    one 5%-share key at 1000-way parallelism is a 50x straggler AQE can
    only split AFTER materializing the skewed map output.  The profile
    is one map-side-combinable aggregate over the left relation —
    counting a hot key is cheap even when joining on it is not — and the
    hot-key list that comes back to the driver is parameter-sized
    (<= ``top_k`` rows, the pinned-centroid convention).

    Result rows are identical to the plain join for ``inner``/``left``
    (the hot/cold split partitions the left relation exactly; salt
    columns stay internal), proven against the all-plain oracle by the
    registered row.  The physical plan carries BOTH strategies: a
    salted join over the hot slice (right side filtered to hot keys —
    usually broadcast-small) unioned with a plain join over the cold
    slice.  When no key needs salt the plain join IS the plan.

    ``right`` joins (r14 verdict ask #5) run as the exact DUAL: the
    preserved side is the right relation, so the profile runs on the
    RIGHT key, the right relation takes the hot/cold split + salt, and
    the LEFT side is the replicated one — implemented by flipping to
    the ``left`` form and restoring the caller's column order (which
    requires disjoint column names across the two inputs, enforced
    loudly).  ``full`` outer is REJECTED: salting replicates one side,
    and under full-outer BOTH sides' unmatched rows must survive
    exactly once — the replicated side's unmatched rows would emit once
    per replica, and no flip fixes both sides at once.  Full-outer skew
    belongs to AQE's skew-join split (on in session.py), which handles
    it after materializing map output instead of rewriting the plan.
    """
    from .aggregates import key_skew_profile

    if how in ("right", "rightouter", "right_outer"):
        dup = set(left.columns) & set(right.columns)
        if dup:
            raise ValueError(
                "profile_salted_join(how='right') restores column order by "
                f"name after flipping sides; rename overlapping columns {sorted(dup)}"
            )
        flipped = profile_salted_join(
            right,
            left,
            right_key,
            left_key,
            parallelism=parallelism,
            top_k=top_k,
            salt_buckets=salt_buckets,
            how="left",
        )
        return flipped.select(*left.columns, *right.columns)
    if how in ("full", "outer", "fullouter", "full_outer"):
        raise ValueError(
            "profile_salted_join does not support full outer joins: salting "
            "replicates one side, so that side's unmatched rows would emit "
            "once per salt replica, and flipping sides only moves the "
            "problem. Use the plain join and let AQE's skew-join split "
            "handle runtime skew, or pre-aggregate the hot side."
        )

    prof = key_skew_profile(left, left_key, top_k=top_k, parallelism=parallelism)
    hot = [
        r["key_value"] for r in prof.filter(F.col("needs_salt")).collect()
    ]
    if not hot:
        return left.join(right, left[left_key] == right[right_key], how)
    left_hot = left.filter(F.col(left_key).isin(hot))
    left_cold = left.filter(
        ~F.col(left_key).isin(hot) | F.col(left_key).isNull()
    )
    right_hot = right.filter(F.col(right_key).isin(hot))
    hot_joined = salted_join(
        left_hot, right_hot, left_key, right_key, salt_buckets=salt_buckets, how=how
    )
    cold_joined = left_cold.join(
        right, left_cold[left_key] == right[right_key], how
    )
    return hot_joined.unionByName(cold_joined)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    time_col: str,
    right_value_cols: list[str],
    suffix: str = "_right",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row with
    ``right.time <= left.time`` within the same key (the canonical
    time-series enrichment operator; Spark has no native form).

    Implementation is the scalable union trick rather than a range join:
    tag both sides, union, sort within key by (time, tag) — right rows
    sort before left rows at equal timestamps, matching ASOF's inclusive
    bound — and carry the last right ROW forward as one struct with
    ``last(struct, ignorenulls=True)`` (row-level, so a newer right row
    with NULL values correctly shadows older values, matching ASOF
    row-match semantics).  Cost: ONE shuffle of |L|+|R| rows on
    the key + a per-partition sort — no range-explosion, no broadcast of
    either side, skew-safe under AQE.  Equivalent DuckDB: ``ASOF JOIN ...
    ON l.key = r.key AND l.time >= r.time``.

    ``tolerance`` (interval string, e.g. ``"15 minutes"``): maximum
    staleness — a match older than ``left.time - tolerance`` is nulled
    out, pandas ``merge_asof(tolerance=...)`` semantics.  Enriching a
    reading with sensor state from six hours ago is usually worse than
    admitting you have none; the bound costs one extra carried column
    (the matched right time) and a CASE, no extra shuffle.

    Output: every left row/column plus ``<value><suffix>`` columns
    (NULL when no right row precedes the left row, or none within
    tolerance).
    """
    import re

    from pyspark.sql import Window

    if tolerance is not None:
        # The tolerance lands inside F.expr(f"INTERVAL {tolerance}"): accept
        # only `<int> <unit>` pairs so arbitrary expression text can never
        # ride in through the parameter (review finding r6/ADVICE).
        _unit = r"(?:year|month|week|day|hour|minute|second|millisecond|microsecond)s?"
        _num = r"\d+(?:\.\d+)?"  # fractional magnitudes are valid INTERVAL text
        if not re.fullmatch(
            rf"\s*{_num}\s+{_unit}(?:\s+{_num}\s+{_unit})*\s*", tolerance, re.IGNORECASE
        ):
            raise ValueError(
                f"tolerance must be '<n> <unit>' interval text (got {tolerance!r})"
            )
    if "_rt" in right_value_cols:
        raise ValueError(
            "right_value_cols may not contain '_rt': asof_join reserves that "
            "field name for the carried match timestamp — rename the column "
            "before joining"
        )

    lcols = left.columns
    # Carry the matched row as ONE struct (its own time + all values):
    # last(ignorenulls) over the struct takes the NEWEST preceding right
    # ROW — its values attach even when some are NULL, exactly DuckDB
    # ASOF semantics.  Per-column last-non-null would instead reach past
    # a newer NULL-valued row to an older value (review finding r6).
    tagged_l = left.withColumn("_tag", F.lit(1)).withColumn(
        "_match",
        F.lit(None).cast(
            f"struct<_rt:timestamp,{','.join(f'{v}:{dict(right.dtypes)[v]}' for v in right_value_cols)}>"
        ),
    )
    tagged_r = right.select(
        *key_cols,
        time_col,
        F.struct(
            F.col(time_col).cast("timestamp").alias("_rt"),
            *[F.col(v) for v in right_value_cols],
        ).alias("_match"),
    ).withColumn("_tag", F.lit(0))
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn("_match", F.last("_match", ignorenulls=True).over(w))
    if tolerance is not None:
        stale = F.col("_match").isNull() | (
            F.col("_match")["_rt"] < F.col(time_col) - F.expr(f"INTERVAL {tolerance}")
        )
        filled = filled.withColumn(
            "_match", F.when(stale, F.lit(None)).otherwise(F.col("_match"))
        )
    return filled.filter(F.col("_tag") == 1).select(
        *lcols,
        *[F.col("_match")[v].alias(f"{v}{suffix}") for v in right_value_cols],
    )

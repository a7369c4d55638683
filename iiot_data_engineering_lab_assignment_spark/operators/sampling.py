"""Deterministic sampling and dataset splitting for training pipelines.

Every operator here derives its randomness from ``md5(salt:key)`` instead
of ``rand()``, which matters at 100 TB for three reasons:

* **Reproducibility.** ``rand()`` is seeded per task attempt: a retried
  or speculatively-executed task resamples different rows, so two runs of
  the "same" job ship different training sets.  A hash of a stable key
  yields the same decision on every run, every retry, every cluster size.
* **Stability under growth.** When new documents land, hash-bucketed
  membership never reassigns an existing document (doc 42 is in `val`
  forever), so eval contamination cannot creep in across dataset
  versions.
* **Plan shape.** The decision is a pure codegen expression - a filter
  or projection evaluated inside the scan, no shuffle, no state, and
  Catalyst pushes the sampling filter below joins where legal.

The uniform variate is the first 13 hex digits of the md5 (52 bits) over
2^52: a dyadic rational that doubles represent exactly, so the float
comparison against any threshold is bit-identical in any engine that
implements md5 - which also makes every operator here expressible as an
ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform",
    "sample_fraction",
    "train_val_test_split",
    "stratified_sample",
    "epoch_shuffle",
    "weighted_sample_per_group",
]

#: 2^52 - the 13-hex-digit hash fits in a double's mantissa exactly.
_DENOM = float(1 << 52)


def hash_uniform(key: Column | str, salt: str = "sample") -> Column:
    """Deterministic U[0,1) from a stable key: md5(salt:key) -> 52 bits
    -> /2^52.  Exact in double; reproducible across engines and runs."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat_ws(":", F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 13), 16, 10).cast("long") / F.lit(_DENOM)).alias(
        "u"
    )


def sample_fraction(
    df: DataFrame, fraction: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, selected by key hash.
    Unlike ``DataFrame.sample`` this is exactly repeatable and stable
    under repartitioning/retries; the filter is a scan-level expression."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(hash_uniform(key_col, salt) < F.lit(fraction))


def train_val_test_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> DataFrame:
    """Assign each row a ``split`` label (train/val/test) by key hash.

    The standard corpus split, made idempotent: membership depends only
    on (salt, key), so regenerating the dataset - or appending to it -
    never moves a document between splits."""
    if len(weights) != 3 or any(w < 0 for w in weights) or abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must be 3 non-negative values summing to 1, got {weights}")
    u = hash_uniform(key_col, salt)
    t1, t2 = weights[0], weights[0] + weights[1]
    split = (
        F.when(u < F.lit(t1), F.lit("train"))
        .when(u < F.lit(t2), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "stratified",
    default_fraction: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling - the source-rebalancing
    primitive (e.g. keep 50% of English, all of everything else).

    ``fractions`` is known at plan time, so the per-row threshold is a
    literal CASE expression: no join, no shuffle - the whole decision
    runs inside the scan's codegen stage even when the stratum column
    has millions of rows per value."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {v}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    frac = F.lit(default_fraction)
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == F.lit(k), F.lit(v)).otherwise(frac)
    return df.filter(hash_uniform(key_col, salt) < frac)


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-epoch permutation: a stable pseudo-random
    global order over the corpus, different per epoch, identical across
    runs/retries/cluster sizes — what a training loader needs instead of
    ``ORDER BY rand()`` (task-seeded, unreproducible) or a driver-side
    shuffle (doesn't scale).

    Order key = md5("epoch:<epoch>:<id>"); shard = the key's 16-bit
    prefix range-partitioned into ``n_shards``; pos = rank of the key
    within the shard.  The total
    order is (shard, pos): readers consume shards in shard order — a
    distributed sort with NO single-task global stage, because the
    shard id is itself derived from the key's most significant digits,
    so concatenating shards in order IS the sorted-by-key order.  One
    shard-keyed exchange + per-shard sort; shards are the parallel unit
    for both the write and the training read.

    Output: (id, epoch, shard, pos) — pos is 1-based within shard.
    """
    from pyspark.sql import Window

    if n_shards < 1 or n_shards > 0x10000:
        raise ValueError(f"n_shards must be in [1, 65536], got {n_shards}")
    key = F.md5(
        F.concat_ws(":", F.lit("epoch"), F.lit(str(epoch)), F.col(id_col).cast("string"))
    )
    # shard = RANGE partition of the key's 16-bit prefix (div, not mod):
    # shard order == key order, so the (shard, pos) concatenation is the
    # globally sorted order with no single-task stage
    prefix = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    # exact in double (prefix*n_shards <= 2^32, /2^16 dyadic), so floor
    # is deterministic and mirrors the SQL oracle bit-for-bit
    shard = F.floor(prefix * n_shards / F.lit(0x10000)).cast("int")
    tagged = docs.select(
        F.col(id_col), key.alias("_key"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("_key", id_col)
    return tagged.select(
        id_col,
        F.lit(epoch).alias("epoch"),
        "shard",
        F.row_number().over(w).alias("pos"),
    )


def weighted_sample_per_group(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_cols: list[str] | None = None,
    key_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``k`` rows per group whose Efraimidis–Spirakis key
    ``ln(u) / w`` is largest, where ``u`` is the md5-derived U[0,1)
    variate and ``w`` the row's weight.  Equivalent to drawing k items
    sequentially with probability proportional to remaining weight
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir" — they state it as max u^(1/w); ln(u)/w is the same
    ordering without the pow, and pow's libm rounding differs across
    engines while ln + divide agree to the bit on dyadic-rational u).

    Scale: the only shuffle is the per-group top-k window (or a global
    TakeOrdered when ``group_cols`` is None) — the sampling key itself
    is a scan-level expression, so at 100 TB this costs exactly one
    exchange on the group key, and AQE's skew handling applies to hot
    groups.  Deterministic under retries/growth like everything in this
    module: a row's key depends only on (salt, id, weight).

    Zero/negative/NaN/NULL weights never win: the guard maps them to
    NULL key -> filtered (NaN needs the explicit isnan test — Spark
    sorts NaN ABOVE every double, so an unguarded NaN weight would
    monopolize the sample), matching the "invalid weight means never
    sampled" contract.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = hash_uniform(key_col, salt)
    w = F.col(weight_col).cast("double")
    # u > 0 guard: on the ~2^-52/row zero-hash draw, Spark's log(0) is
    # NULL (row filtered) while an oracle's ln(0) is -inf (row kept and
    # still rankable in an under-full group) — drop it identically on
    # both sides (oracles mirror the u > 0 predicate)
    es_key = F.when((w > 0) & ~F.isnan(w) & (u > 0), F.log(u) / w)
    keyed = df.withColumn("_es_key", es_key).filter(F.col("_es_key").isNotNull())
    order = [F.col("_es_key").desc(), F.col(key_col)]
    if not group_cols:
        # global mode: TakeOrderedAndProject (per-partition heaps, the
        # driver merges P x k rows) instead of a single-partition window
        # sort of the whole table; the k survivors are then ranked by a
        # window over exactly k rows.
        top = keyed.orderBy(*order).limit(k)
        win = Window.orderBy(*order)
        return (
            top.withColumn("sample_rank", F.row_number().over(win))
            .drop("_es_key")
        )
    win = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        keyed.withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= k)
        .drop("_es_key")
    )

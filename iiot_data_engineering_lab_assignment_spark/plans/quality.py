"""Data-quality rule engine: declarative expectations over any DataFrame,
evaluated in ONE scan, with a quarantine split and a WAP-audit adapter.

The reference pipeline trusts its producer end to end (the only
validation is Flink's drop-malformed JSON flag,
`sensor_aggregation.py:31-32`); a 100 TB lake needs the next tier —
declared row expectations (not-null, ranges, set membership),
referential checks, and a quarantine path that keeps bad rows
inspectable instead of silently dropped.  This module is that tier,
deliberately tiny: a rule is just ``(name, violation_predicate)`` where
the predicate is any Column — everything composes from there.

Scale shape: row rules are CASE expressions folded into one aggregate
scan (no shuffle beyond the final 1-row agg); the quarantine split is
one scan emitting a reasons array per row; referential checks are
left-anti joins (key-only shuffle).  ``dq_audit`` plugs the whole rule
set into write_audit_publish / publish_epoch so a bad batch never
becomes visible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null",
    "in_range",
    "in_set",
    "row_rule_counts",
    "quarantine",
    "fk_violation_count",
    "dq_audit",
]


def not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violated when the value exists and falls outside [lo, hi]."""
    return (
        f"{col}_out_of_range",
        F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi)),
    )


def in_set(col: str, allowed: list) -> tuple[str, Column]:
    return (
        f"{col}_unknown",
        F.col(col).isNotNull() & ~F.col(col).isin(allowed),
    )


def row_rule_counts(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """(rule, violations) summary for every row rule — ONE aggregate scan
    regardless of rule count (each rule is a conditional sum), unpivoted
    with stack() so the output is long-form and joinable."""
    agg = df.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
            for name, pred in rules
        ]
    )
    stack = ", ".join(f"'{name}', {name}" for name, _ in rules)
    return agg.selectExpr(f"stack({len(rules)}, {stack}) AS (rule, violations)")


def quarantine(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, invalid): invalid rows carry a ``reasons``
    column naming every violated rule (comma-joined in declaration
    order) — inspectable and replayable after a fix, instead of the
    drop-and-forget the reference's lenient JSON decode does."""
    reasons = F.concat_ws(
        ",",
        F.filter(
            F.array(
                *[F.when(pred, F.lit(name)) for name, pred in rules]
            ),
            lambda x: x.isNotNull(),
        ),
    )
    tagged = df.withColumn("reasons", reasons)
    valid = tagged.filter(F.col("reasons") == "").drop("reasons")
    invalid = tagged.filter(F.col("reasons") != "")
    return valid, invalid


def fk_violation_count(
    child: DataFrame, key_cols: list[str], parent: DataFrame, parent_keys: list[str]
) -> DataFrame:
    """Referential check: rows in ``child`` whose key has no match in
    ``parent`` — a left-anti join carrying only the key columns into the
    shuffle.  Returns a LAZY 1-row (rule, violations) plan (review
    finding r6: an eager count here would run a blocking job at
    query-construction time and hide the join from plan audits)."""
    p = parent.select(
        *[F.col(c).alias(k) for c, k in zip(parent_keys, key_cols)]
    ).distinct()
    rule = f"fk_{'_'.join(key_cols)}_missing"
    return (
        child.select(*key_cols)
        .join(p, key_cols, "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        .select(F.lit(rule).alias("rule"), "violations")
    )


def dq_audit(rules: list[tuple[str, Column]], max_violations: int = 0):
    """Adapter: a rule set as a write-audit-publish ``audit`` callback —
    the staged read-back must have at most ``max_violations`` total row
    violations or the publish aborts (pointer untouched, batch
    invisible)."""

    def audit(staged: DataFrame) -> bool:
        total = (
            row_rule_counts(staged, rules).agg(F.sum("violations")).head()[0] or 0
        )
        return total <= max_violations

    return audit

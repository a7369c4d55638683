"""Storage lifecycle (SURVEY.md section 2.10).

D1 — time-partitioned tables: the TimescaleDB hypertable
(init-db.sql:16,36) maps to date-partitioned columnar layout, exactly the
reference ETL's own Delta output shape (timescale_to_deltalake.py:33-37):
derive year/month/day (P3) and partitionBy them (K5).

D2 — secondary indexes ((machine_id, ts DESC), init-db.sql:19-20) map to
file-level data skipping: within each date partition we sort files by the
index prefix so parquet row-group min/max stats prune like an index scan.

D3 — retention (drop chunks > 90 days, init-db.sql:43-44): partition-level
delete — with date partitioning this removes whole directories without
rewriting surviving data.

D4 — overwrite-per-run refresh (timescale_to_deltalake.py:37): dynamic
partition overwrite replaces only the partitions present in the incoming
batch — at 100 TB you never blow away the whole table to refresh a day.

Format: Delta when the package is importable (production), plain
partitioned Parquet otherwise (this runtime) — same API, same layout.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "lake_format",
    "write_partitioned",
    "write_partitioned_by_date",
    "read_lake",
    "apply_retention",
    "write_audit_publish",
    "read_published",
    "rollback_published",
    "publish_epoch",
    "read_published_epochs",
    "compact_epochs",
    "vacuum_epochs",
    "snapshot_diff",
    "compact",
    "zorder_key",
    "write_bucketed",
]


def zorder_key(cols, bits: int = 8):
    """Morton/Z-order interleave of non-negative integer columns — the
    multi-column extension of the D2 sort-within-partitions index analog
    (Delta Lake's ``OPTIMIZE ZORDER BY``, Hudi's space-filling curves).

    A single-column sort gives tight row-group min/max bounds on that
    column only; sorting by the interleaved key gives *every* input
    column locality proportional to its bit share, so point/range
    predicates on ANY of the columns skip row groups.  Pure JVM bit
    arithmetic (``bits`` low bits per column, clamped into range), stays
    inside whole-stage codegen, and is exactly reproducible in SQL — the
    registry query's DuckDB oracle recomputes the same key bit-for-bit.

    ``len(cols) * bits`` must fit in a signed 64-bit key.  Callers
    pre-bucket continuous values (e.g. ``value % 256``) to the bit
    budget; clamping keeps out-of-range inputs ordered at the domain
    edge instead of wrapping.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a 63-bit key")
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    key = F.lit(0).cast("long")
    for j, c in enumerate(cs):
        v = F.least(
            F.greatest(c.cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
        )
        for i in range(bits):
            # disjoint target bits, so + is bitwise OR
            key = key + F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), i * n + j)
    return key


def lake_format() -> str:
    try:
        import delta  # noqa: F401

        return "delta"
    except ImportError:
        return "parquet"


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_within_partitions: list[str] | None = None,
) -> None:
    """K5/D1: partitioned columnar write.

    ``sort_within_partitions`` is the D2 index analogue: sorting rows
    within each task by the lookup-key prefix gives parquet row groups
    tight min/max bounds, so point/range lookups skip most of the file —
    the engine's replacement for (machine_id, timestamp DESC) B-trees.
    """
    if sort_within_partitions:
        df = df.sortWithinPartitions(*partition_cols, *sort_within_partitions)
    df.write.format(lake_format()).mode(mode).partitionBy(*partition_cols).save(path)


def write_partitioned_by_date(
    df: DataFrame,
    path: str,
    ts_col: str,
    mode: str = "overwrite",
    dynamic: bool = False,
    sort_within_partitions: list[str] | None = None,
) -> None:
    """The reference ETL's exact transform chain
    (timescale_to_deltalake.py:33-45): derive year/month/day from `ts_col`,
    partition by them.  ``dynamic=True`` -> D4 partition-scoped refresh
    (only incoming partitions replaced)."""
    spark = df.sparkSession
    out = df.withColumns(
        {
            "year": F.year(ts_col),
            "month": F.month(ts_col),
            "day": F.dayofmonth(ts_col),
        }
    )
    if dynamic:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            write_partitioned(out, path, ["year", "month", "day"], mode, sort_within_partitions)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        write_partitioned(out, path, ["year", "month", "day"], mode, sort_within_partitions)


def read_lake(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Read the lake table.  ``merge_schema=True`` unions the schemas of
    all files (schema evolution: columns added by later writes appear as
    NULL in older partitions) — costs a footer scan per file, so leave it
    off for fixed-schema reads."""
    reader = spark.read.format(lake_format())
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    audit=None,
    partition_cols: list[str] | None = None,
    keep_versions: int = 2,
) -> str:
    """Write-audit-publish (WAP): atomic table publication over plain
    parquet — the transactional-visibility half of what the env-blocked
    Delta path would provide (`timescale_to_deltalake.py`'s Delta leg;
    delta-spark remains unimportable in this runtime), without a table
    format: readers can never observe a partial, failed, or unaudited
    write.

    Layout::

        table_dir/_versions/v00000001/  ...immutable version dirs...
        table_dir/_CURRENT              pointer file: current version name

    A writer stages into a NEW version directory, re-reads the staged
    files, runs the ``audit`` callback on that read-back (count checks,
    schema checks, null-rate gates — return False or raise to abort),
    marks the directory with a ``_COMMITTED`` file, and only then swaps
    the pointer via write-temp + ``os.replace`` — atomic on POSIX
    filesystems; on an object store substitute the conditional-put/rename
    primitive.  A crash or failed audit leaves the pointer untouched;
    the staged directory is removed on audit failure, and a leftover
    from a hard crash (no ``_COMMITTED`` marker) is deleted by the next
    publish before it assigns a version number — crashed partial dirs
    never enter the retained-snapshot set, so :func:`rollback_published`
    can only ever land on a fully-audited version.  Old committed
    versions beyond ``keep_versions`` are pruned; the ones kept give
    snapshot reads and one-step rollback.

    Returns the published version name.
    """
    import os
    import shutil

    spark = df.sparkSession
    vdir = os.path.join(table_dir, "_versions")
    os.makedirs(vdir, exist_ok=True)
    # Stamp legacy pre-marker versions FIRST (at/below the pointer — fully
    # audited when published), so a later rollback can never strand a good
    # legacy snapshot above the pointer where the reclaim pass would
    # mistake it for a crashed stage (ADVICE r6).
    _wap_migrate_markers(table_dir)
    # Reclaim crashed stages: a crashed stage is an UNMARKED dir
    # NEWER than the current pointer (staging always takes a number past
    # every existing dir, and the marker lands before the pointer swap).
    current = _wap_current(table_dir)
    for d in sorted(os.listdir(vdir)):
        if (
            d.startswith("v")
            and (current is None or d > current)
            and not _wap_committed(vdir, d)
        ):
            shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
    existing = sorted(
        d
        for d in os.listdir(vdir)
        if d.startswith("v")
        and (_wap_committed(vdir, d) or (current is not None and d <= current))
    )
    n = 1 + (int(existing[-1][1:]) if existing else 0)
    version = f"v{n:08d}"
    staged = os.path.join(vdir, version)
    writer = df.write.format("parquet").mode("errorifexists")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(staged)
    try:
        staged_df = spark.read.parquet(staged)
        if audit is not None and audit(staged_df) is False:
            raise ValueError(f"audit rejected staged version {version}")
    except Exception:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    # Commit marker BEFORE the pointer swap: the pointer only ever names a
    # fully-audited dir, and rollback/pruning only trust marked dirs.
    # (Spark ignores underscore-prefixed files on read.)
    with open(os.path.join(staged, "_COMMITTED"), "w") as f:
        f.write("committed\n")
    tmp = os.path.join(table_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(table_dir, "_CURRENT"))  # the atomic publish
    keep = {version} | set(existing[-(keep_versions - 1):] if keep_versions > 1 else [])
    for d in existing:
        if d not in keep:
            shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
    return version


def _wap_current(table_dir: str) -> str | None:
    """Name of the currently-published version, or None."""
    import os

    cur = os.path.join(table_dir, "_CURRENT")
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        return f.read().strip()


def _wap_committed(vdir: str, version: str) -> bool:
    import os

    return os.path.exists(os.path.join(vdir, version, "_COMMITTED"))


def _wap_migrate_markers(table_dir: str) -> None:
    """One-time marker migration for pre-marker (legacy) tables: every
    unmarked version dir at or below the current pointer was fully
    audited when it was published, so stamp ``_COMMITTED`` into it on
    first contact.  Run BEFORE any reclaim or rollback: once stamped, a
    rollback that moves the pointer below a legacy version can no longer
    expose it to the crashed-stage reclaim pass (ADVICE r6)."""
    import os

    current = _wap_current(table_dir)
    if current is None:
        return
    vdir = os.path.join(table_dir, "_versions")
    if not os.path.isdir(vdir):
        return
    for d in sorted(os.listdir(vdir)):
        # isdir guard: a stray regular file in _versions must not crash
        # publish/rollback with NotADirectoryError (ADVICE r7)
        if (
            d.startswith("v")
            and d <= current
            and os.path.isdir(os.path.join(vdir, d))
            and not _wap_committed(vdir, d)
        ):
            with open(os.path.join(vdir, d, "_COMMITTED"), "w") as f:
                f.write("committed\n")  # legacy pre-marker version, migrated


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    """Resolve the WAP pointer and read the current published version —
    unaffected by in-flight stages, crashes, or audit failures."""
    import os

    cur = os.path.join(table_dir, "_CURRENT")
    if not os.path.exists(cur):
        raise FileNotFoundError(f"no published version at {table_dir}")
    with open(cur) as f:
        version = f.read().strip()
    return spark.read.parquet(os.path.join(table_dir, "_versions", version))


def rollback_published(table_dir: str) -> str:
    """Point the WAP table back at the newest RETAINED COMMITTED version
    older than the current one (one-step rollback).  Crash leftovers are
    never rollback targets — they may hold partial data; a crashed stage
    is always NEWER than the pointer, so unmarked dirs below the pointer
    are legacy pre-marker versions and remain valid targets.  Returns
    the new current."""
    import os

    _wap_migrate_markers(table_dir)  # stamp legacy versions BEFORE moving
    # the pointer below them (ADVICE r6: otherwise the next publish's
    # reclaim pass would delete a stranded unmarked-but-good snapshot)
    with open(os.path.join(table_dir, "_CURRENT")) as f:
        current = f.read().strip()
    vdir = os.path.join(table_dir, "_versions")
    older = sorted(
        d for d in os.listdir(vdir) if d.startswith("v") and d < current
    )
    if not older:
        raise ValueError(f"no older version than {current} retained to roll back to")
    tmp = os.path.join(table_dir, "_CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(older[-1])
    os.replace(tmp, os.path.join(table_dir, "_CURRENT"))
    return older[-1]


def publish_epoch(df: DataFrame, table_dir: str, batch_id: int, audit=None) -> bool:
    """Streaming write-audit-publish: commit ONE micro-batch (epoch) to an
    append-only WAP table with atomic whole-epoch visibility.

    The snapshot-versioned :func:`write_audit_publish` rewrites the full
    table per publish — right for nightly refreshes, quadratic for an
    append stream.  Here each epoch stages only ITS OWN files and the
    published state is a MANIFEST (``_EPOCHS`` file) naming the committed
    epoch dirs::

        table_dir/_epochs/batch-00000042/   one dir per committed epoch
        table_dir/_EPOCHS                   manifest: committed epoch names

    Protocol per micro-batch: if ``batch_id`` is already in the manifest
    the batch was fully published before the checkpoint crashed — skip
    (this is what turns foreachBatch's at-least-once retry into
    exactly-once visible state).  Otherwise overwrite-stage the epoch dir
    (a retry replaces its own partial files), audit the staged read-back
    (return False or raise to abort — the manifest is untouched and the
    streaming query fails loudly), then atomically swap the manifest via
    write-temp + ``os.replace``.  Readers (:func:`read_published_epochs`)
    resolve the manifest only: a crash at ANY point mid-batch leaves them
    on the previous epoch set — never a partial epoch.

    This is the reference's at-least-once JDBC sink semantics
    (`flink-jobs/sensor_aggregation.py:37-54`) upgraded to
    effectively-exactly-once on plain parquet, no table format needed.
    Returns True if this call published the epoch, False if skipped.
    """
    import os

    spark = df.sparkSession
    os.makedirs(table_dir, exist_ok=True)
    manifest_path = os.path.join(table_dir, "_EPOCHS")
    committed: list[str] = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            committed = [ln.strip() for ln in f if ln.strip()]
    epoch = f"batch-{batch_id:08d}"
    if epoch in committed or epoch in _compacted_epochs(table_dir):
        # already visible — either directly in the manifest or folded into
        # a compacted dir (the _COMPACTED ledger survives compaction, so a
        # replay from an old checkpoint cannot re-publish folded batches)
        return False
    staged = os.path.join(table_dir, "_epochs", epoch)
    df.write.mode("overwrite").parquet(staged)
    staged_df = spark.read.parquet(staged)
    if audit is not None and audit(staged_df) is False:
        raise ValueError(f"audit rejected epoch {epoch}")
    tmp = os.path.join(table_dir, "_EPOCHS.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join([*committed, epoch]) + "\n")
    os.replace(tmp, manifest_path)  # atomic epoch publication
    return True


def _compacted_epochs(table_dir: str) -> set[str]:
    """Epoch names folded into compacted dirs (the ledger compact_epochs
    maintains) — still 'committed' for publish_epoch's skip check even
    though the manifest no longer lists them individually."""
    import os

    ledger = os.path.join(table_dir, "_COMPACTED")
    if not os.path.exists(ledger):
        return set()
    with open(ledger) as f:
        return {ln.strip() for ln in f if ln.strip()}


def read_published_epochs(spark: SparkSession, table_dir: str) -> DataFrame:
    """Union-read every committed epoch of a streaming WAP table.  Dirs
    not (yet) named by the ``_EPOCHS`` manifest — in-flight or crashed
    partial batches — are invisible."""
    import os

    manifest_path = os.path.join(table_dir, "_EPOCHS")
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(f"no published epochs at {table_dir}")
    with open(manifest_path) as f:
        epochs = [ln.strip() for ln in f if ln.strip()]
    paths = [os.path.join(table_dir, "_epochs", e) for e in epochs]
    return spark.read.parquet(*paths)


def compact_epochs(
    spark: SparkSession, table_dir: str, keep_last: int = 10, delete_old: bool = False
) -> int:
    """Compact a streaming WAP table's oldest epochs into one merged dir.

    A long-running :func:`publish_epoch` sink accumulates one directory
    per micro-batch — thousands of small files is the classic streaming
    read-amplification failure.  This folds every committed epoch except
    the newest ``keep_last`` into a single ``compact-<first>-<last>``
    epoch, then atomically swaps the manifest (merged entry first, recent
    epochs unchanged).  Readers at ANY instant see either the old
    manifest (old dirs still on disk) or the new one (merged dir
    complete before the swap) — the same crash-safety contract as
    publish: a crash before the swap leaves an unreferenced merged dir
    (invisible, re-collectable), never a partial table.

    By default the superseded dirs are LEFT on disk: a reader that
    resolved the old manifest just before the swap can still finish its
    scan (the Delta-VACUUM separation of logical delete from physical
    delete).  Reclaim them later with :func:`vacuum_epochs` once no
    reader can hold a pre-swap manifest, or pass ``delete_old=True`` to
    delete immediately when no concurrent readers exist.  Single
    maintenance writer assumed (same as publish_epoch's single-sink
    contract).

    Returns the number of epochs folded (0 = nothing to do).
    """
    import os
    import shutil

    manifest_path = os.path.join(table_dir, "_EPOCHS")
    with open(manifest_path) as f:
        committed = [ln.strip() for ln in f if ln.strip()]
    to_fold = committed[:-keep_last] if keep_last > 0 else committed
    if len(to_fold) < 2:
        return 0
    recent = committed[len(to_fold):]
    paths = [os.path.join(table_dir, "_epochs", e) for e in to_fold]
    merged_name = f"compact-{to_fold[0]}-{to_fold[-1]}"
    merged_path = os.path.join(table_dir, "_epochs", merged_name)
    spark.read.parquet(*paths).write.mode("overwrite").parquet(merged_path)
    # Record the folded batch names in the _COMPACTED ledger BEFORE the
    # manifest swap (review finding r6): publish_epoch's already-committed
    # check consults this ledger, so a replay from an old checkpoint
    # cannot re-publish a folded batch and duplicate its rows.  Crash
    # between ledger write and swap is safe: the folded names are still
    # in the manifest, so the skip check holds either way.
    ledger = os.path.join(table_dir, "_COMPACTED")
    prior = sorted(_compacted_epochs(table_dir) | {e for e in to_fold if not e.startswith("compact-")})
    tmp = os.path.join(table_dir, "_COMPACTED.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(prior) + "\n")
    os.replace(tmp, ledger)
    tmp = os.path.join(table_dir, "_EPOCHS.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join([merged_name, *recent]) + "\n")
    os.replace(tmp, manifest_path)  # atomic: merged view becomes current
    if delete_old:
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
    return len(to_fold)


def vacuum_epochs(table_dir: str, grace_seconds: float = 0.0) -> int:
    """Physically delete epoch dirs no longer referenced by the manifest
    (superseded by compaction, or left by a pre-swap crash).  Run when no
    reader can still hold an older manifest — the retention knob real
    table formats expose as VACUUM.  Returns dirs removed.

    Writer-safety (ADVICE r6, wording corrected r7): vacuum assumes the
    table's single-maintenance-writer contract — do NOT run it while a
    publisher is active.  As defense-in-depth for operator error, the
    manifest is re-read immediately before each actual delete (an epoch
    committed between the initial scan and that re-read is spared) and
    ``grace_seconds`` skips any dir younger than the grace window
    (mtime-based), which also covers staged-but-uncommitted dirs.  These
    NARROW the race to the instants around the re-read; only the
    no-concurrent-writer contract eliminates it — a filesystem manifest
    has no compare-and-swap to fence against (real table formats use the
    catalog's conditional commit for exactly this)."""
    import os
    import shutil
    import time

    manifest_path = os.path.join(table_dir, "_EPOCHS")
    edir = os.path.join(table_dir, "_epochs")

    def referenced() -> set[str]:
        with open(manifest_path) as f:
            return {ln.strip() for ln in f if ln.strip()}

    removed = 0
    now = time.time()
    keep = referenced()  # one read covers the common all-referenced case
    for d in sorted(os.listdir(edir)):
        if d in keep:
            continue
        path = os.path.join(edir, d)
        if grace_seconds > 0:
            try:
                if now - os.path.getmtime(path) < grace_seconds:
                    continue
            except OSError:
                continue  # raced with a concurrent delete/rename: leave it
        # deletion candidate: re-read to confirm it was not committed
        # since the scan (defense-in-depth, not a guarantee — see above)
        keep = referenced()
        if d not in keep:
            shutil.rmtree(path, ignore_errors=True)
            removed += 1
    return removed


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level CHANGE FEED between two table snapshots — what Delta's
    change-data-feed emits, computed engine-side for plain parquet so it
    composes with the WAP retained versions (diff any two published
    versions of :func:`write_audit_publish`).

    Full outer join on ``key_cols``; rows classify as ``insert`` (key
    only in new), ``delete`` (key only in old), or ``update`` (key in
    both with any ``compare_cols`` value differing — null-safe
    comparison, so NULL -> value and value -> NULL both count as
    changes).  Unchanged rows are dropped.  ``compare_cols`` defaults to
    every shared non-key column.

    Output: key cols + change_type + old_<col> / new_<col> for each
    compared column.

    Scale: ONE key-partitioned shuffle join of the two snapshots; at
    100 TB, pre-filter both sides to the partitions that could differ
    (e.g. WAP version manifests or partition mtimes) before calling —
    the operator itself never needs the full history, only the two
    snapshots it is asked to compare.
    """
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = [c for c in new.columns if c in shared and c not in key_cols]
    # presence flags: compared columns may legitimately be NULL, so key
    # presence needs a sentinel literal, not a column null-check
    o = old.select(
        *key_cols,
        F.lit(1).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change_type = (
        F.when(F.col("_in_old").isNull(), F.lit("insert"))
        .when(F.col("_in_new").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_cols = [*key_cols, change_type.alias("change_type")]
    for c in compare_cols:
        out_cols += [F.col(f"old_{c}"), F.col(f"new_{c}")]
    return j.select(*out_cols).filter(F.col("change_type").isNotNull())


def apply_retention(
    spark: SparkSession, path: str, ts_col: str, keep_days: int, now=None
) -> int:
    """D3: retention policy — drop data older than `keep_days` (the
    reference's drop_chunks, init-db.sql:43-44).

    With Delta: ``DELETE WHERE`` + VACUUM (transactional).  On plain
    parquet, prune whole expired (year,month,day) partition directories —
    the same chunk-drop semantics as the hypertable: no data rewrite,
    directory-level removal.  Returns the number of partitions dropped.
    """
    anchor = "current_date()" if now is None else f"DATE'{now}'"
    cutoff = spark.sql(f"SELECT date_sub({anchor}, {keep_days}) AS d").head()["d"]
    if lake_format() == "delta":
        spark.sql(f"DELETE FROM delta.`{path}` WHERE {ts_col} < DATE'{cutoff}'")
        return 0
    base = Path(path)
    dropped = 0
    for ydir in sorted(base.glob("year=*")):
        y = int(ydir.name.split("=")[1])
        for mdir in sorted(ydir.glob("month=*")):
            m = int(mdir.name.split("=")[1])
            for ddir in sorted(mdir.glob("day=*")):
                d = int(ddir.name.split("=")[1])
                from datetime import date

                if date(y, m, d) < date(cutoff.year, cutoff.month, cutoff.day):
                    shutil.rmtree(ddir)
                    dropped += 1
    return dropped


def upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    version_col: str | None = None,
) -> None:
    """MERGE-style upsert into a date-partitioned table: rows in `updates`
    replace target rows with the same key; new keys are inserted.

    With Delta this is ``MERGE INTO`` (transactional).  On plain parquet
    the same semantics come from a partition-scoped rewrite: only the
    date partitions TOUCHED by `updates` are read back, anti-joined
    against the update keys, unioned with the updates, and rewritten via
    dynamic partition overwrite — untouched partitions are never read or
    written, which is what makes upsert viable on a 100 TB table.

    ``version_col`` (defaults to `ts_col`) breaks ties when `updates`
    itself carries multiple rows per key: highest version wins.

    A key whose timestamp MOVED to a different day is handled: the target
    is probed for partitions that currently hold any updated key (a
    key-columns-only scan with the update keys broadcast — Parquet reads
    just the key + partition columns), and those partitions join the
    rewrite set, so the old-day row is anti-joined away rather than
    surviving as a duplicate.  A partition left empty by such a move is
    deleted outright (dynamic overwrite only rewrites partitions present
    in the new data, so emptied ones need the explicit drop).
    """
    version_col = version_col or ts_col
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    latest_updates = (
        updates.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )
    target = read_lake(spark, path)
    update_part_keys = {
        (r["year"], r["month"], r["day"])
        for r in updates.select(
            F.year(ts_col).alias("year"),
            F.month(ts_col).alias("month"),
            F.dayofmonth(ts_col).alias("day"),
        )
        .distinct()
        .collect()
    }
    update_keys = latest_updates.select(*key_cols).distinct()
    stale_part_keys = {
        (r["year"], r["month"], r["day"])
        for r in target.join(F.broadcast(update_keys), key_cols, "left_semi")
        .select("year", "month", "day")
        .distinct()
        .collect()
    }
    part_keys = sorted(update_part_keys | stale_part_keys)
    touched = target.filter(
        F.struct(F.col("year"), F.col("month"), F.col("day")).isin(
            [F.struct(F.lit(y), F.lit(m), F.lit(d)) for y, m, d in part_keys]
        )
    ).drop("year", "month", "day")
    survivors = touched.join(latest_updates.select(*key_cols), key_cols, "left_anti")
    # persist: the merged plan (target scan + anti-join + window) feeds BOTH
    # the rewritten-partition collect and the write — without it the
    # heaviest stage of every upsert runs twice
    merged = survivors.unionByName(latest_updates).persist()
    try:
        rewritten = {
            (r["year"], r["month"], r["day"])
            for r in merged.select(
                F.year(ts_col).alias("year"),
                F.month(ts_col).alias("month"),
                F.dayofmonth(ts_col).alias("day"),
            )
            .distinct()
            .collect()
        }
        write_partitioned_by_date(merged, path, ts_col, mode="overwrite", dynamic=True)
    finally:
        merged.unpersist()
    emptied_keys = set(part_keys) - rewritten
    if not emptied_keys:
        return
    if lake_format() == "delta":
        # dynamic overwrite only rewrites partitions PRESENT in the new
        # data, so a partition fully emptied by keys moving days would
        # survive as stale duplicates — delete it transactionally
        cond = " OR ".join(
            f"(year = {y} AND month = {m} AND day = {d})" for y, m, d in sorted(emptied_keys)
        )
        spark.sql(f"DELETE FROM delta.`{path}` WHERE {cond}")  # noqa: S608 (ints, not user input)
    else:
        for y, m, d in emptied_keys:
            emptied = Path(path) / f"year={y}" / f"month={m}" / f"day={d}"
            if emptied.exists():
                shutil.rmtree(emptied)


def incremental_rollup_refresh(
    spark: SparkSession,
    rollup_path: str,
    new_events: DataFrame,
    time_col: str,
    duration: str,
    group_cols: list[str],
    value_col: str = "value",
) -> None:
    """Continuous-aggregate maintenance (the TimescaleDB hypertable rollup
    kept fresh, init-db.sql:24-36): recompute ONLY the window buckets that
    `new_events` touches and dynamically overwrite those date partitions
    of the rollup table.

    The reference maintains sensor_aggregates by streaming append; this is
    the batch/late-data path — a late event changes one window bucket, so
    only that bucket's partition is recomputed, never the whole rollup.
    Source rows for affected days are re-read so re-aggregation is exact
    (avg/min/max/count are not incrementally subtractable).
    NOTE: requires the raw events for affected days — pass the full raw
    slice for those days as `new_events`.
    """
    from ..operators.windows import windowed_rollup

    rolled = windowed_rollup(new_events, time_col, duration, None, group_cols, value_col)
    write_partitioned_by_date(rolled, rollup_path, "window_start", mode="overwrite", dynamic=True)


def compact(spark: SparkSession, path: str, target_files_per_partition: int = 1) -> None:
    """OPTIMIZE-style compaction: rewrite each date partition into
    `target_files_per_partition` files (small-file mitigation for
    streaming-appended partitions)."""
    df = read_lake(spark, path)
    part_cols = [c for c in ("year", "month", "day") if c in df.columns]
    (
        df.repartition(target_files_per_partition, *[F.col(c) for c in part_cols])
        .write.format(lake_format())
        .mode("overwrite")
        .partitionBy(*part_cols)
        .save(path + "_compacted")
    )
    shutil.rmtree(path)
    Path(path + "_compacted").rename(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist `df` as a bucketed (hash-clustered) table on the join key.

    The co-located-join primitive: two tables bucketed on the same key
    with the same bucket count join WITHOUT any exchange - each task
    reads bucket i from both sides and merges locally.  At 100 TB this
    converts the recurring fact-fact join (orders x lineitem every run)
    from two full shuffles into zero; the shuffle is paid once at write
    time and amortized over every subsequent join, aggregation, or MERGE
    keyed on the same column.  ``sort_col`` additionally sorts within
    buckets, letting the sort-merge join skip its sort phase too.

    Bucketed layout requires the table catalog (bucket metadata lives in
    the metastore, not the parquet footer), hence saveAsTable rather
    than a path write - same as the reference's warehouse tables living
    in a catalog (init-db.sql) rather than loose files.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, key)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)

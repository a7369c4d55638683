"""Storage lifecycle (SURVEY.md section 2.10): partitioned writes, dynamic
partition refresh, retention, compaction, index-analog sorting."""

from pathlib import Path

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
    apply_retention,
    compact,
    read_lake,
    write_partitioned_by_date,
)


def test_partitioned_write_layout(spark, events, tmp_path):
    """K5/D1: the ETL's date-partitioned layout
    (timescale_to_deltalake.py:33-37): year/month/day directories."""
    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    dirs = sorted(p.name for p in Path(path).glob("year=*/month=*/day=*"))
    assert len(dirs) == 30  # events span 2024-01-01 .. 2024-01-30
    back = read_lake(spark, path)
    assert back.count() == events.count()
    # partition pruning: a single-day filter reads one directory
    one_day = back.filter((F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 5))
    plan = one_day.explain(mode="formatted") or one_day._jdf.queryExecution().executedPlan().toString()
    assert one_day.count() > 0


def test_overwrite_idempotent(spark, events, tmp_path):
    """D4: overwrite-per-run refresh is idempotent (SURVEY.md section 5.2.4)."""
    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    c1 = read_lake(spark, path).count()
    write_partitioned_by_date(events, path, "ts")
    c2 = read_lake(spark, path).count()
    assert c1 == c2 == events.count()


def test_dynamic_partition_refresh(spark, events, tmp_path):
    """D4 at scale: dynamic overwrite replaces only incoming partitions."""
    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    before = read_lake(spark, path).count()
    # rewrite ONLY day 5 with a filtered subset; other days must survive
    day5 = events.filter(F.dayofmonth("ts") == 5)
    write_partitioned_by_date(day5, path, "ts", dynamic=True)
    after = read_lake(spark, path)
    assert after.count() == before  # same rows: day-5 replaced with itself
    assert after.filter(F.col("day") == 5).count() == day5.count()


def test_retention_drops_old_partitions(spark, events, tmp_path):
    """D3: retention prunes expired date partitions without touching
    surviving data (init-db.sql:43-44 chunk-drop semantics)."""
    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    dropped = apply_retention(spark, path, "ts", keep_days=10, now="2024-01-30")
    assert dropped == 19  # days 1..19 expired (cutoff 2024-01-20)
    back = read_lake(spark, path)
    assert back.agg(F.min("day")).head()[0] == 20
    expected = events.filter(F.dayofmonth("ts") >= 20).count()
    assert back.count() == expected


def test_compact_preserves_data(spark, events, tmp_path):
    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    before = {tuple(r) for r in read_lake(spark, path).select("event_id").collect()}
    compact(spark, path)
    after_df = read_lake(spark, path)
    after = {tuple(r) for r in after_df.select("event_id").collect()}
    assert before == after
    # one file per partition after compaction
    for ddir in Path(path).glob("year=*/month=*/day=*"):
        files = [f for f in ddir.iterdir() if f.suffix == ".parquet"]
        assert len(files) == 1


def test_sorted_within_partitions_row_groups(spark, events, tmp_path):
    """D2: the index analogue — rows sorted by (user_id, ts) within files
    so row-group stats prune point lookups."""
    path = str(tmp_path / "lake")
    write_partitioned_by_date(
        events, path, "ts", sort_within_partitions=["user_id", "ts"]
    )
    f = next(Path(path).glob("year=*/month=*/day=*/*.parquet"))
    import pyarrow.parquet as pq

    ids = pq.read_table(str(f), columns=["user_id"]).column("user_id").to_pylist()
    assert ids == sorted(ids)


def test_upsert_merges_by_key(spark, events, tmp_path):
    """MERGE semantics on the partitioned lake: updated keys replaced,
    new keys inserted, untouched partitions byte-stable."""
    from pyspark.sql import functions as F

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import upsert

    path = str(tmp_path / "lake")
    write_partitioned_by_date(events, path, "ts")
    import os

    untouched_file = sorted(Path(path).glob("year=*/month=*/day=10/*.parquet"))[0]
    mtime_before = os.path.getmtime(untouched_file)

    # modify 5 existing day-5 rows and add 2 brand-new rows on day 5
    day5 = events.filter(F.dayofmonth("ts") == 5)
    modified = day5.limit(5).withColumn("value", F.lit(-999.0))
    new_rows = (
        day5.limit(2)
        .withColumn("event_id", F.col("event_id") + 10_000_000)
        .withColumn("value", F.lit(+999.0))
    )
    upsert(spark, path, modified.unionByName(new_rows), ["event_id"], "ts")

    back = read_lake(spark, path)
    assert back.count() == events.count() + 2
    assert back.filter(F.col("value") == -999.0).count() == 5
    assert back.filter(F.col("value") == 999.0).count() == 2
    # only day-5 partitions rewritten
    assert os.path.getmtime(untouched_file) == mtime_before


def test_incremental_rollup_refresh(spark, events, tmp_path):
    """Continuous-aggregate maintenance: a late event refreshes only its
    window's partitions; the refreshed rollup equals a full recompute."""
    from pyspark.sql import functions as F

    from iiot_data_engineering_lab_assignment_spark.operators.windows import windowed_rollup
    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        incremental_rollup_refresh,
    )

    rollup_path = str(tmp_path / "rollup")
    group_cols = ["user_id", "event_type"]
    # initial full build
    full = windowed_rollup(events, "ts", "1 minute", None, group_cols)
    write_partitioned_by_date(full, rollup_path, "window_start")

    # a late reading lands on day 7; re-aggregate ONLY day 7's raw slice
    late = spark.createDataFrame(
        [(999_999, events.filter(F.dayofmonth("ts") == 7).head()["ts"], 12345, "click", 42.0, "{}")],
        events.schema,
    )
    events_v2 = events.unionByName(late)
    day7 = events_v2.filter(F.to_date("ts") == "2024-01-07")
    incremental_rollup_refresh(spark, rollup_path, day7, "ts", "1 minute", group_cols)

    refreshed = read_lake(spark, rollup_path).drop("year", "month", "day")
    expected = windowed_rollup(events_v2, "ts", "1 minute", None, group_cols)
    assert {tuple(r) for r in refreshed.collect()} == {tuple(r) for r in expected.collect()}


def test_schema_evolution_merge_read(spark, events, tmp_path):
    """Columns added by later writes surface via mergeSchema, NULL in old
    partitions."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "lake")
    write_partitioned_by_date(events.filter(F.dayofmonth("ts") <= 5), path, "ts", mode="overwrite")
    evolved = events.filter(F.dayofmonth("ts") == 6).withColumn("quality", F.lit("gold"))
    write_partitioned_by_date(evolved, path, "ts", mode="append")
    merged = read_lake(spark, path, merge_schema=True)
    assert "quality" in merged.columns
    assert merged.filter(F.col("quality") == "gold").count() == evolved.count()
    assert merged.filter(F.col("day") <= 5).filter(F.col("quality").isNotNull()).count() == 0


def test_upsert_key_moved_to_new_day(spark, tmp_path):
    """ADVICE r1: an updated key whose timestamp moved to a DIFFERENT day
    must not leave its stale old-day row behind; a partition emptied by the
    move is dropped entirely."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import upsert

    path = str(tmp_path / "lake")
    schema = "event_id long, ts timestamp, value double"
    base = spark.createDataFrame(
        [
            (1, datetime(2024, 5, 1, 10, 0), 1.0),
            (2, datetime(2024, 5, 1, 11, 0), 2.0),
            (3, datetime(2024, 5, 2, 10, 0), 3.0),
            (4, datetime(2024, 5, 2, 11, 0), 4.0),
        ],
        schema,
    )
    write_partitioned_by_date(base, path, "ts")
    # keys 1 and 2 (ALL of day 1) move to day 3
    updates = spark.createDataFrame(
        [
            (1, datetime(2024, 5, 3, 9, 0), -1.0),
            (2, datetime(2024, 5, 3, 9, 30), -2.0),
        ],
        schema,
    )
    upsert(spark, path, updates, ["event_id"], "ts")
    back = read_lake(spark, path)
    assert back.count() == 4  # replaced, not duplicated
    moved = {r["event_id"]: r for r in back.filter(F.col("event_id").isin(1, 2)).collect()}
    assert len(moved) == 2
    assert all(moved[k]["value"] < 0 and moved[k]["ts"].day == 3 for k in (1, 2))
    # day-1 directory was emptied by the move and must be gone
    assert not (Path(path) / "year=2024" / "month=5" / "day=1").exists()


def test_zorder_key_interleaves_and_tightens_both_columns(spark, events, tmp_path):
    """Z-order clustering: (1) the key is the exact Morton interleave of
    the two bucketed columns (checked against a pure-python reference on
    the events fixture); (2) sorting a multi-row-group file by it
    tightens row-group min/max spans on BOTH columns vs the unsorted
    layout — the multi-column data skip a single-column sort cannot
    give."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import zorder_key

    ux = F.col("user_id") % 256
    vx = F.floor(F.col("value")).cast("long") % 256
    keyed = events.select(
        ux.alias("ux"), vx.alias("vx"), zorder_key([ux, vx], bits=8).alias("zkey")
    )

    def morton(x, y):
        k = 0
        for i in range(8):
            k |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return k

    for r in keyed.limit(200).collect():
        assert r["zkey"] == morton(r["ux"], r["vx"])

    # span check needs many row groups -> a bigger synthetic frame with
    # both dimensions uniformly scattered (worst case for any layout)
    big = spark.range(0, 60000, 1, 1).select(
        ((F.col("id") * 2654435761) % 256).alias("ux"),
        ((F.col("id") * 40503) % 256).alias("vx"),
    )
    big = big.withColumn("zkey", zorder_key(["ux", "vx"], bits=8))

    def spans(path):
        md = pq.ParquetFile(path).metadata
        names = {md.schema.column(c).name: c for c in range(md.num_columns)}
        assert md.num_row_groups >= 4, "need multiple row groups to measure skipping"
        out = {}
        for col in ("ux", "vx"):
            tot = 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                tot += st.max - st.min
            out[col] = tot / md.num_row_groups
        return out

    plain = str(tmp_path / "plain.parquet")
    zsorted = str(tmp_path / "zsorted.parquet")
    big.coalesce(1).write.option("parquet.block.size", "16384").mode(
        "overwrite"
    ).parquet(plain)
    big.coalesce(1).sortWithinPartitions("zkey").write.option(
        "parquet.block.size", "16384"
    ).mode("overwrite").parquet(zsorted)
    p = spans(next(Path(plain).glob("*.parquet")))
    z = spans(next(Path(zsorted).glob("*.parquet")))
    # scattered layout leaves each row group spanning ~the full 0..255
    # domain on both columns; the z-sorted layout must cut both spans
    assert z["ux"] < 0.5 * p["ux"]
    assert z["vx"] < 0.5 * p["vx"]


def test_wap_publish_read_audit_rollback(spark, tmp_path):
    """Write-audit-publish: readers only ever see fully-audited versions;
    failed audits leave the pointer untouched; rollback is one pointer
    swap; unpointed (crashed) stage dirs are invisible."""
    import os

    import pytest as _pytest

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        read_published,
        rollback_published,
        write_audit_publish,
    )

    table = str(tmp_path / "wap_table")
    v1_df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    v1 = write_audit_publish(v1_df, table, audit=lambda d: d.count() == 100)
    assert read_published(spark, table).count() == 100

    # audit rejection: pointer stays on v1, staged dir removed
    with _pytest.raises(ValueError, match="audit rejected"):
        write_audit_publish(spark.range(0, 5), table, audit=lambda d: False)
    assert read_published(spark, table).count() == 100
    versions = sorted(os.listdir(os.path.join(table, "_versions")))
    assert versions == [v1]

    # second good publish becomes current; rollback restores v1
    write_audit_publish(spark.range(0, 7), table)
    assert read_published(spark, table).count() == 7
    assert rollback_published(table) == v1
    assert read_published(spark, table).count() == 100

    # a crashed stage (dir present, pointer never swapped) is invisible
    os.makedirs(os.path.join(table, "_versions", "v99999999"))
    assert read_published(spark, table).count() == 100


def test_wap_crashed_stage_never_retained_or_rolled_back_to(spark, tmp_path):
    """Hard-crash mid-write leaves a partial version dir WITHOUT a
    _COMMITTED marker.  The next publish must delete it (not count it as
    a retained snapshot), number the new version past it, and
    rollback_published must land on the older GOOD version — never on
    the unaudited partial dir."""
    import os

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        read_published,
        rollback_published,
        write_audit_publish,
    )

    table = str(tmp_path / "wap_crash")
    v1 = write_audit_publish(spark.range(0, 100), table)
    assert v1 == "v00000001"

    # simulate a hard crash mid-write of v2: partial parquet, no marker
    vdir = os.path.join(table, "_versions")
    crashed = os.path.join(vdir, "v00000002")
    spark.range(0, 3).write.parquet(crashed)  # "some files completed"
    assert not os.path.exists(os.path.join(crashed, "_COMMITTED"))

    # next publish reclaims the crashed dir and keeps v1 as the snapshot
    v_new = write_audit_publish(spark.range(0, 7), table, keep_versions=2)
    assert read_published(spark, table).count() == 7
    retained = sorted(d for d in os.listdir(vdir) if d.startswith("v"))
    assert retained == [v1, v_new]  # crashed partial dir is GONE

    # rollback lands on the committed v1, and the data reads back whole
    assert rollback_published(table) == v1
    assert read_published(spark, table).count() == 100


def test_wap_premarker_versions_survive_upgrade(spark, tmp_path):
    """Migration rule (review finding r6): versions published BEFORE the
    _COMMITTED marker existed carry no marker but were fully audited.
    A crashed stage is always NEWER than the pointer, so unmarked dirs
    at/below the pointer must be kept as snapshots and remain rollback
    targets; only unmarked dirs ABOVE the pointer are reclaimed."""
    import os

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        read_published,
        rollback_published,
        write_audit_publish,
    )

    table = str(tmp_path / "wap_legacy")
    vdir = os.path.join(table, "_versions")
    # build a pre-marker table by stripping the markers the new code wrote
    v1 = write_audit_publish(spark.range(0, 100), table, keep_versions=3)
    v2 = write_audit_publish(spark.range(0, 50), table, keep_versions=3)
    for v in (v1, v2):
        os.remove(os.path.join(vdir, v, "_COMMITTED"))
    # plus a genuine crashed stage ABOVE the pointer
    spark.range(0, 3).write.parquet(os.path.join(vdir, "v00000003"))

    v3 = write_audit_publish(spark.range(0, 7), table, keep_versions=3)
    retained = sorted(d for d in os.listdir(vdir) if d.startswith("v"))
    assert retained == [v1, v2, v3]  # legacy kept, crashed v3-stage replaced
    assert read_published(spark, table).count() == 7
    # one-step rollback still works onto the unmarked legacy version
    assert rollback_published(table) == v2
    assert read_published(spark, table).count() == 50


def test_snapshot_diff_classification_and_null_safety(spark):
    """insert/delete/update classification; NULL<->value transitions are
    updates (null-safe compare); unchanged rows (incl. NULL==NULL) drop."""
    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, None), (4, 40.0), (5, None)],
        "k long, v double",
    )
    new = spark.createDataFrame(
        [(1, 10.0), (2, 21.0), (3, 30.0), (5, None), (6, 60.0)],
        "k long, v double",
    )
    rows = {r["k"]: r for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert set(rows) == {2, 3, 4, 6}  # 1 unchanged, 5 NULL==NULL unchanged
    assert rows[2]["change_type"] == "update" and rows[2]["new_v"] == 21.0
    assert rows[3]["change_type"] == "update"  # NULL -> value IS a change
    assert rows[3]["old_v"] is None and rows[3]["new_v"] == 30.0
    assert rows[4]["change_type"] == "delete" and rows[4]["new_v"] is None
    assert rows[6]["change_type"] == "insert" and rows[6]["old_v"] is None


def test_wap_rollback_then_publish_preserves_stranded_legacy(spark, tmp_path):
    """ADVICE r6: on a pre-marker (legacy) table, rollback used to move
    the pointer BELOW a legitimately published legacy version; the next
    publish's crashed-stage reclaim then deleted that unmarked-but-good
    snapshot.  rollback_published now stamps _COMMITTED into every
    legacy dir at/below the pointer BEFORE moving it, so the stranded
    version survives as a snapshot and future rollback target."""
    import os

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        read_published,
        rollback_published,
        write_audit_publish,
    )

    table = str(tmp_path / "wap_legacy_rb")
    vdir = os.path.join(table, "_versions")
    v1 = write_audit_publish(spark.range(0, 100), table, keep_versions=3)
    v2 = write_audit_publish(spark.range(0, 50), table, keep_versions=3)
    for v in (v1, v2):
        os.remove(os.path.join(vdir, v, "_COMMITTED"))  # simulate pre-marker table
    # First contact with the upgraded code is a ROLLBACK (no publish ran
    # to stamp markers first): pointer moves v2 -> v1, stranding v2 above it.
    assert rollback_published(table) == v1
    assert os.path.exists(os.path.join(vdir, v2, "_COMMITTED"))  # stamped, not stranded
    # The next publish must NOT reclaim v2 as a crashed stage.
    v3 = write_audit_publish(spark.range(0, 7), table, keep_versions=3)
    retained = sorted(d for d in os.listdir(vdir) if d.startswith("v"))
    assert v2 in retained and retained[-1] == v3
    assert read_published(spark, table).count() == 7


def test_vacuum_epochs_grace_skips_young_dirs(spark, tmp_path):
    """ADVICE r6: vacuum could delete a dir staged by a live
    publish_epoch between its manifest read and the rmtree.  Vacuum now
    re-reads the manifest before each actual delete and grace_seconds
    skips any dir younger than the grace window — defense-in-depth that
    narrows the race; the single-maintenance-writer contract (don't run
    vacuum while a publisher is active) is what eliminates it."""
    import os

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        publish_epoch,
        read_published_epochs,
        vacuum_epochs,
    )

    table = str(tmp_path / "epochs_vac")
    publish_epoch(spark.range(0, 10), table, 0)
    publish_epoch(spark.range(10, 20), table, 1)
    # Simulate a freshly STAGED (not yet committed) epoch: on disk, not
    # in the manifest — exactly what a concurrent publish looks like
    # mid-batch.
    staged = os.path.join(table, "_epochs", "batch-00000002")
    spark.range(20, 30).write.parquet(staged)
    # With a grace window the staged dir survives vacuum.
    assert vacuum_epochs(table, grace_seconds=3600) == 0
    assert os.path.isdir(staged)
    # The concurrent publish completes (same batch: overwrite-stage + commit).
    publish_epoch(spark.range(20, 30), table, 2)
    assert read_published_epochs(spark, table).count() == 30
    # A later vacuum with no grace removes nothing: everything committed.
    assert vacuum_epochs(table) == 0
    assert read_published_epochs(spark, table).count() == 30


def test_wap_stray_file_in_versions_tolerated(spark, tmp_path):
    """ADVICE r7: a stray regular FILE in _versions (editor droppings,
    OS metadata) must not crash publish/rollback — the legacy-marker
    stamp loop now guards with isdir before opening <dir>/_COMMITTED."""
    import os

    from iiot_data_engineering_lab_assignment_spark.plans.lifecycle import (
        read_published,
        rollback_published,
        write_audit_publish,
    )

    table = str(tmp_path / "wap_table")
    write_audit_publish(spark.range(0, 10), table)
    # stray regular file sorting below the current pointer
    with open(os.path.join(table, "_versions", "v00000000_stray"), "w") as f:
        f.write("not a version dir\n")
    v2 = write_audit_publish(spark.range(0, 20), table)  # must not raise
    assert read_published(spark, table).count() == 20
    assert rollback_published(table) != v2  # rollback also tolerates it
    assert read_published(spark, table).count() == 10

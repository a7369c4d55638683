"""Round-13 operators: BPE pair-count training statistic, delta-encoded
inverted-index build, shuffle-key skew profiler, the planted-partition
LPA quality envelope, and the fold-order GEMM distance helper
(`_fold_d2_matrix`) whose bit parity with the JVM fold underwrites the
64x8 trained-codebook driver row."""

import pytest
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.aggregates import (
    key_skew_profile,
)
from iiot_data_engineering_lab_assignment_spark.operators.text import (
    bpe_pair_counts,
    inverted_index_postings,
)


# ---------------------------------------------------------------------------
# BPE pair counting


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bpe_pair_counts_hand_corpus(spark):
    # "abab" x2 and "abc": pairs ab=2+2+1=5, ba=2, bc=1
    docs = _docs(spark, [(0, "abab abab"), (1, "abc")])
    got = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in bpe_pair_counts(docs).collect()
    }
    assert got == {("a", "b"): 5, ("b", "a"): 2, ("b", "c"): 1}


def test_bpe_pair_counts_ignores_short_words(spark):
    # single-char words contribute no pairs and must not break the
    # sequence(1, len-1) explode (Spark's sequence(1, 0) DESCENDS)
    docs = _docs(spark, [(0, "a b c x y"), (1, "ab")])
    got = bpe_pair_counts(docs).collect()
    assert len(got) == 1
    assert (got[0]["left_sym"], got[0]["right_sym"], got[0]["pair_count"]) == (
        "a",
        "b",
        1,
    )


def test_bpe_pair_counts_weighted_by_word_frequency(spark):
    # the vocab factoring: 3 occurrences of "xy" count 3 even though the
    # distinct word explodes once
    docs = _docs(spark, [(0, "xy xy"), (1, "xy")])
    got = bpe_pair_counts(docs).collect()
    assert len(got) == 1 and got[0]["pair_count"] == 3


def test_bpe_pair_counts_topk_order(spark):
    docs = _docs(spark, [(0, "aa bb bb cc cc")])
    rows = bpe_pair_counts(docs, top_k=2).collect()
    # count DESC then left ASC: bb and cc tie at 2, aa (1) cut by top_k
    assert [(r["left_sym"], r["right_sym"]) for r in rows] == [
        ("b", "b"),
        ("c", "c"),
    ]


# ---------------------------------------------------------------------------
# inverted index


def test_inverted_index_gap_encoding(spark):
    docs = _docs(spark, [(3, "w q"), (10, "w"), (25, "w")])
    rows = {r["term"]: r for r in inverted_index_postings(docs).collect()}
    assert rows["w"]["df"] == 3
    assert rows["w"]["gap_list"] == "3,7,15"  # 3, 10-3, 25-10
    assert rows["q"]["df"] == 1 and rows["q"]["gap_list"] == "3"


def test_inverted_index_distinct_within_doc(spark):
    # duplicate term in one doc -> one posting
    docs = _docs(spark, [(1, "t t t"), (2, "t")])
    rows = {r["term"]: r for r in inverted_index_postings(docs).collect()}
    assert rows["t"]["df"] == 2 and rows["t"]["gap_list"] == "1,1"


def test_inverted_index_posting_cap_keeps_true_df(spark):
    docs = _docs(spark, [(i, "hot") for i in range(10)])
    rows = inverted_index_postings(docs, max_postings=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["df"] == 10  # true document frequency survives the cap
    assert r["gap_list"] == "0,1,1"  # ids 0,1,2 delta-encoded


def test_inverted_index_min_df_prunes(spark):
    docs = _docs(spark, [(0, "a b"), (1, "a")])
    rows = inverted_index_postings(docs, min_df=2).collect()
    assert [r["term"] for r in rows] == ["a"]


# ---------------------------------------------------------------------------
# skew profiler


def test_key_skew_profile_flags_straggler(spark):
    # key 7 holds 60 of 100 rows: share 600000 ppm, 60*4 > 100 -> salt
    rows = [(7,)] * 60 + [(i,) for i in range(100, 140)]
    df = spark.createDataFrame(rows, "k long")
    prof = key_skew_profile(df, "k", top_k=3, parallelism=4).collect()
    assert prof[0]["key_value"] == 7
    assert prof[0]["cnt"] == 60
    assert prof[0]["share_ppm"] == 600000
    assert prof[0]["needs_salt"] is True
    # uniform keys (1 row each) are far under the 1/4 fair share
    assert all(not r["needs_salt"] for r in prof[1:])
    assert all(r["total_rows"] == 100 for r in prof)


def test_key_skew_profile_deterministic_tiebreak(spark):
    df = spark.createDataFrame([(5,), (3,), (9,)], "k long")
    prof = key_skew_profile(df, "k", top_k=3).collect()
    assert [r["key_value"] for r in prof] == [3, 5, 9]  # cnt ties -> key ASC


# ---------------------------------------------------------------------------
# LPA planted-partition quality (registered row's engine side)


def test_lpa_planted_quality_perfect_recovery(spark):
    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    row = QUERIES["lpa_planted_quality"].fn(spark, "/root/testdata/sf0.001").head()
    assert row["n_nodes"] == 320
    assert row["n_communities"] == 20
    assert row["pairs_planted"] == 2400
    assert row["pairs_recovered"] == 2400
    assert row["pairs_both"] == 2400
    assert row["pair_precision"] == 1.0 and row["pair_recall"] == 1.0
    assert row["quality_ok"] is True


# ---------------------------------------------------------------------------
# fold-order GEMM distances


def test_fold_d2_matrix_bit_identical_to_python_fold():
    """_fold_d2_matrix must replay dot()'s sequential fold exactly: each
    accumulation step one IEEE double op in the same order.  Replicate
    the fold in pure Python (the same op sequence the JVM executes) and
    require BIT equality, not closeness — closeness is the property the
    r12 ADVICE said was insufficient."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        _fold_cnorm,
        _fold_d2_matrix,
    )

    rng = [
        [((i * 37 + j * 11) % 97) / 97.0 - 0.5 for j in range(7)]
        for i in range(23)
    ]
    cents = [
        (c, [((c * 13 + j * 29) % 89) / 89.0 - 0.5 for j in range(7)])
        for c in range(5)
    ]
    Xs = np.array(rng, dtype=np.float64)
    C = np.array([v for _, v in cents], dtype=np.float64)
    D = _fold_d2_matrix(Xs, C, _fold_cnorm(cents))
    for i, v in enumerate(rng):
        vn = 0.0
        for x in v:
            vn = vn + x * x
        for k, (_, c) in enumerate(cents):
            dt = 0.0
            for x, y in zip(v, c):
                dt = dt + x * y
            cn = float(sum(y * y for y in c))
            expect = (vn - 2.0 * dt) + cn
            assert D[i, k] == expect  # bitwise, no tolerance


def test_fold_d2_matrix_argmin_matches_bruteforce():
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        _fold_cnorm,
        _fold_d2_matrix,
    )

    rs = np.random.RandomState(13)
    Xs = rs.rand(50, 8)
    cents = [(c, list(rs.rand(8))) for c in range(6)]
    C = np.array([v for _, v in cents])
    D = _fold_d2_matrix(Xs, C, _fold_cnorm(cents))
    brute = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    assert (D.argmin(axis=1) == brute.argmin(axis=1)).all()
    assert np.allclose(D, brute)


# ---------------------------------------------------------------------------
# iterated BPE training


def test_bpe_learned_merges_hand_corpus(spark):
    """Hand-traced two-iteration run (same corpus as the oracle
    prototype): stage-1 counts aa=4 ab=4 ba=4 tie-break to (a,a);
    after merging, (a,b) and (b,a) tie at 4 -> (a,b)."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        bpe_learned_merges,
    )

    docs = _docs(
        spark,
        [(0, "aaab aaab abab"), (1, "ba ba ba")],
    )
    rows = bpe_learned_merges(docs, n_merges=2).collect()
    assert [(r["merge_rank"], r["left_sym"], r["right_sym"], r["pair_count"])
            for r in rows] == [(1, "a", "a", 4), (2, "a", "b", 4)]


def test_bpe_learned_merges_greedy_nonoverlap(spark):
    """'aaaa' under merge (a,a) must segment [aa, aa] (leftmost
    non-overlapping), so iteration 2's top pair is (aa, aa) — the
    overlap case a replace-based segmentation gets wrong."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        bpe_learned_merges,
    )

    docs = _docs(spark, [(0, "aaaa aaaa aaaa")])
    rows = bpe_learned_merges(docs, n_merges=2).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"], rows[0]["pair_count"]) == (
        "a", "a", 9
    )
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == (
        "aa", "aa", 3
    )


def test_bpe_learned_merges_merged_symbol_no_rematch(spark):
    """After merge (a,a), a fused 'aa' whose string ENDS with 'a' must
    not re-match l='a' against a following 'a': 'aaa' -> [aa, a], and
    the delimiter-aware last-symbol test keeps it that way."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        bpe_learned_merges,
    )

    docs = _docs(spark, [(0, "aaa aaa")])
    rows = bpe_learned_merges(docs, n_merges=2).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "a")
    # iteration 2 over [aa, a]: the only remaining pair is (aa, a)
    assert (rows[1]["left_sym"], rows[1]["right_sym"], rows[1]["pair_count"]) == (
        "aa", "a", 2
    )


def test_bpe_segment_counts_applies_merges(spark):
    """Segment 'aaab' (x2 words) and 'ba' under merges [(a,a), (a,b)]:
    'aaab' -> [aa, a, b] -> merge 2 fuses (a,b) -> [aa, ab] = 2 symbols;
    'ba' has no match -> 2 symbols."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        bpe_segment_counts,
    )

    docs = _docs(spark, [(0, "aaab aaab"), (1, "ba")])
    rows = {
        r["doc_id"]: r
        for r in bpe_segment_counts(docs, [("a", "a"), ("a", "b")]).collect()
    }
    assert rows[0]["n_words"] == 2 and rows[0]["n_symbols"] == 4
    assert rows[1]["n_words"] == 1 and rows[1]["n_symbols"] == 2


def test_bpe_segment_counts_single_char_words(spark):
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        bpe_segment_counts,
    )

    docs = _docs(spark, [(0, "a b c")])
    row = bpe_segment_counts(docs, [("a", "a")]).head()
    assert row["n_words"] == 3 and row["n_symbols"] == 3


# ---------------------------------------------------------------------------
# dynamic-gap session windows


def test_dynamic_gap_sessions_purchase_extends(spark):
    """A purchase's 10-minute gap keeps a session alive across a 7-minute
    silence that a click's 5-minute gap would break."""
    from pyspark.sql import functions as F

    rows = [
        (1, "purchase", "2024-01-01 10:00:00", 1.0),
        (1, "click", "2024-01-01 10:07:00", 2.0),  # merged: < 10:10
        (2, "click", "2024-01-01 10:00:00", 1.0),
        (2, "click", "2024-01-01 10:07:00", 2.0),  # split: >= 10:05
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, value double"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    gap = F.when(F.col("event_type") == "purchase", F.lit("10 minutes")).otherwise(
        F.lit("5 minutes")
    )
    out = (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .collect()
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n"])
    assert sorted(per_user[1]) == [2]  # one merged session
    assert sorted(per_user[2]) == [1, 1]  # two sessions


def test_dynamic_gap_sessions_end_is_max_end(spark):
    """Session end must be the MAX of per-event ends: a purchase followed
    1 min later by a click ends at purchase+10m, not click+5m."""
    from pyspark.sql import functions as F

    rows = [
        (1, "purchase", "2024-01-01 10:00:00", 1.0),
        (1, "click", "2024-01-01 10:01:00", 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string, value double"
    ).select("user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    gap = F.when(F.col("event_type") == "purchase", F.lit("10 minutes")).otherwise(
        F.lit("5 minutes")
    )
    w = (
        ev.groupBy(F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .head()
    )
    assert str(w["w"]["end"]) == "2024-01-01 10:10:00"


# ---------------------------------------------------------------------------
# change-point detection (registered row's engine side, planted shift)


def test_changepoint_locates_planted_shift(spark):
    """Series of 10 daily means: level 100 for 6 days then 500 for 4 —
    the split must land after day 6 with the correct segment means."""
    from pyspark.sql import functions as F

    rows = []
    for d in range(10):
        level = 100.0 if d < 6 else 500.0
        for h in (1, 13):  # two events per day, exact mean == level
            rows.append(("t", f"2024-03-{d + 1:02d} {h:02d}:00:00", level))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string, value double").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts"), "value",
        F.lit(0).alias("user_id"), F.lit(0).alias("event_id"), F.lit("").alias("props"),
    )
    import iiot_data_engineering_lab_assignment_spark.registry as reg
    # changepoint_by_type moved to registry_timeseries (r15 split), so
    # the loader monkeypatch targets THAT module's resolved global
    import iiot_data_engineering_lab_assignment_spark.registry_timeseries as rts

    orig = rts.load_table
    rts.load_table = lambda s, sf, t: ev if t == "events" else orig(s, sf, t)
    try:
        out = {r["event_type"]: r for r in reg.QUERIES["changepoint_by_type"].fn(
            spark, "/root/testdata/sf0.001").collect()}
    finally:
        rts.load_table = orig
    r = out["t"]
    assert str(r["split_day"]) == "2024-03-06"  # last day of the low segment
    assert r["days_before"] == 6 and r["days_after"] == 4
    assert r["mean_before_milli"] == 100000
    assert r["mean_after_milli"] == 500000

"""Round-8 operators: winsorized aggregation, RRF hybrid search,
vocabulary novelty, and the doubled-stream dedup replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_winsorize_bounds_and_clipping(spark):
    """Hand-checkable winsorization: one wild outlier per side gets
    clipped to the exact interpolated p05/p95 of its group."""
    vals = [float(v) for v in range(1, 20)] + [1000.0, -1000.0]
    df = spark.createDataFrame(
        [("t", i, v) for i, v in enumerate(vals)],
        "event_type string, event_id long, value double",
    )
    bounds = df.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    b = bounds.collect()[0]
    # n=21 -> index = p*(n-1): p05 at position 1.0 (sorted[1]),
    # p95 at position 19.0 (sorted[19]) of the sorted values
    s = sorted(vals)
    assert b["p05"] == s[1] and b["p95"] == s[19]
    clipped = df.join(F.broadcast(bounds), "event_type").select(
        F.least(F.greatest("value", "p05"), "p95").alias("cv")
    )
    cvs = sorted(r["cv"] for r in clipped.collect())
    assert cvs[0] == s[1] and cvs[-1] == s[19]
    assert -1000.0 not in cvs and 1000.0 not in cvs


def test_winsorize_query_clips_only_tails(spark):
    rows = QUERIES["winsorize_event_values"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        # ~10% of each group sits outside [p05, p95] by construction
        assert 0 < r["n_clipped"] < 0.2 * r["n"]
        assert r["p05_r"] <= r["avg_winsor"] <= r["p95_r"]


def test_hybrid_rrf_scores_and_membership(spark):
    """RRF fusion: docs in both legs outrank rank-equivalent docs in one
    leg; scores are exactly the 1/(60+r) sums of the leg ranks."""
    rows = QUERIES["hybrid_search_rrf"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        expected = 0.0
        if r["bm25_rank"] is not None:
            expected += 1.0 / (60 + r["bm25_rank"])
        if r["cosine_rank"] is not None:
            expected += 1.0 / (60 + r["cosine_rank"])
        assert abs(r["rrf_score"] - expected) < 1e-6
        assert r["bm25_rank"] is not None or r["cosine_rank"] is not None
    both = [r for r in rows if r["bm25_rank"] and r["cosine_rank"]]
    single = [r for r in rows if not (r["bm25_rank"] and r["cosine_rank"])]
    if both and single:
        assert max(r["rrf_score"] for r in both) > min(
            r["rrf_score"] for r in single
        )


def test_source_vocab_novelty_invariants(spark):
    rows = QUERIES["source_vocab_novelty"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_exclusive"] <= r["n_types"]
        assert abs(r["exclusivity"] - r["n_exclusive"] / r["n_types"]) < 1e-6
    # the fixture vocabulary is a shared base word list, so sources must
    # share types (nobody is 100% exclusive)
    assert all(r["n_exclusive"] < r["n_types"] for r in rows)


def test_stream_dedup_doubled_equals_pristine_table(spark):
    """Every event delivered twice, deduped on event_id -> exactly the
    pristine table (the registry oracle's claim, pinned here in-suite)."""
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    out = QUERIES["stream_dedup_doubled"].fn(spark, SF)
    base = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    assert out.count() == base.count()
    assert out.exceptAll(base).count() == 0
    assert base.exceptAll(out).count() == 0


def test_unigram_logprob_flags_rare_token_docs(spark):
    """A doc made of corpus-rare tokens must score a higher avg NLL than
    a doc of corpus-common tokens (the pruning signal)."""
    rows = [(i, "the and of to in a is", "x") for i in range(50)]
    rows.append((100, "zzq1 zzq2 zzq3 zzq4 zzq5 zzq6 zzq7", "x"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    docs.createOrReplaceTempView("ul_docs")
    from pyspark.sql import functions as FF

    toks = docs.select("doc_id", FF.explode(FF.split("text", " ")).alias("term"))
    tc = toks.groupBy("term").agg(FF.count(FF.lit(1)).alias("c"))
    tot = tc.agg(FF.sum("c").alias("t"))
    dt = toks.groupBy("doc_id", "term").agg(FF.count(FF.lit(1)).alias("cnt"))
    scored = (
        dt.join(tc, "term")
        .crossJoin(FF.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (
                FF.sum(FF.col("cnt") * -FF.log(FF.col("c") / FF.col("t")))
                / FF.sum("cnt")
            ).alias("avg_nll")
        )
    )
    by_id = {r["doc_id"]: r["avg_nll"] for r in scored.collect()}
    assert by_id[100] > by_id[0]


def test_dsir_weights_favor_target_like_docs(spark):
    """Docs from the target source score higher on average than the rest
    (they ARE the target distribution), and weights are length-normalized
    finite values."""
    import math

    rows = QUERIES["dsir_importance_weights"].fn(spark, SF).collect()
    assert rows and all(math.isfinite(r["dsir_weight"]) for r in rows)
    tgt = [r["dsir_weight"] for r in rows if r["source"] == "src0"]
    rest = [r["dsir_weight"] for r in rows if r["source"] != "src0"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_token_entropy_orders_repetition(spark):
    """Entropy: single-token spam = 0; uniform distinct tokens = ln(n)."""
    import math

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    dt = (
        docs.select("doc_id", FF.explode(FF.split("text", " ")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(FF.count(FF.lit(1)).alias("cnt"))
    )
    sized = dt.withColumn("n", FF.sum("cnt").over(Window.partitionBy("doc_id")))
    p = FF.col("cnt") / FF.col("n")
    ent = {
        r["doc_id"]: r["e"]
        for r in sized.groupBy("doc_id")
        .agg(FF.sum(-p * FF.log(p)).alias("e"))
        .collect()
    }
    assert ent[1] == 0.0
    assert abs(ent[2] - math.log(4)) < 1e-9
    assert abs(ent[3] - math.log(2)) < 1e-9
    # and on the fixture: entropy <= ln(n_types) always
    rows = QUERIES["token_entropy_per_doc"].fn(spark, SF).collect()
    for r in rows:
        assert r["entropy"] <= math.log(r["n_types"]) + 1e-6


def test_embedding_dim_stats_shape_and_dead_dim(spark):
    rows = QUERIES["embedding_dim_stats"].fn(spark, SF).collect()
    assert len(rows) == 64
    assert len({r["dim"] for r in rows}) == 64
    n0 = rows[0]["n"]
    assert all(r["n"] == n0 for r in rows)
    # synthetic dead dimension flagged by std ~ 0
    from pyspark.sql import functions as FF

    df = spark.createDataFrame(
        [(i, [float(i), 7.0]) for i in range(100)],
        "vec_id long, embedding array<double>",
    )
    st = (
        df.select(FF.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(FF.stddev_samp("x").alias("s"))
        .collect()
    )
    by_dim = {r["dim"]: r["s"] for r in st}
    # Welford's update leaves ~1e-16 residue on constant streams
    assert by_dim[1] < 1e-12 and by_dim[0] > 1.0


def test_dup_cluster_histogram_accounts_for_every_clustered_doc(spark):
    clusters = QUERIES["near_dup_clusters"].fn(spark, SF)
    hist = QUERIES["dup_cluster_size_histogram"].fn(spark, SF).collect()
    assert hist
    # every cluster has >= 2 members (singletons never enter the edge set)
    assert all(r["cluster_size"] >= 2 for r in hist)
    total = sum(r["cluster_size"] * r["n_clusters"] for r in hist)
    assert total == clusters.count()


def test_heavy_hitters_sketch_finds_planted_hitter(spark):
    """On a skewed feed the sketch must return the planted heavy hitter
    with an estimate inside the envelope (here: exactly, the map is far
    bigger than the distinct count)."""
    from pyspark.sql import functions as FF

    rows = [(999,)] * 500 + [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "user_id int")
    (tk,) = df.agg(FF.expr("approx_top_k(user_id, 3)").alias("tk")).collect()
    top = tk["tk"][0]
    assert top["item"] == 999 and top["count"] == 500
    # and the registered envelope query holds on the fixture
    res = QUERIES["heavy_hitters_envelope"].fn(spark, SF).collect()
    assert res and all(r["within_envelope"] for r in res)
    assert all(r["k_returned"] == 5 for r in res)


def test_tfidf_doc_similarity_detects_rewording(spark):
    """Two docs with identical wording except one rare token score near
    1.0; unrelated docs never appear (pairs are >= 0.5 by contract)."""
    rows = QUERIES["tfidf_doc_similarity"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.5 <= r["tfidf_cosine"] <= 1.0
        assert r["doc_a"] < r["doc_b"]
    # symmetric: no pair appears twice in either orientation
    pairs = [(r["doc_a"], r["doc_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_hard_negative_mining_excludes_query_label(spark):
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    qlabel = emb.filter("vec_id = 0").head()["label"]
    rows = QUERIES["hard_negative_mining"].fn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["label"] != qlabel for r in rows)
    # descending similarity with deterministic tiebreak
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)


def test_unpivot_round_trips_the_wide_aggregate(spark):
    rows = QUERIES["unpivot_sensor_stats"].fn(spark, SF).collect()
    stats = {r["stat_name"] for r in rows}
    assert stats == {"avg_value", "min_value", "max_value"}
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["stat_name"]] = r["stat_value"]
    for t, d in by_type.items():
        assert d["min_value"] <= d["avg_value"] <= d["max_value"]


def test_signbit_pack_known_vector(spark):
    """Hand-checkable packing: signs [+,-,+,+] MSB-first = 0b1011 = 11;
    0.0 counts as positive."""
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        signbit_pack,
    )

    df = spark.createDataFrame(
        [([1.0, -2.0, 0.0, 3.0],)], "emb array<double>"
    )
    packed = df.select(signbit_pack(F.col("emb"), 0, 4).alias("p")).head()["p"]
    assert packed == 0b1011
    # two-word layout over 4 dims: offset split keeps per-word MSB-first
    hi = df.select(signbit_pack(F.col("emb"), 0, 2).alias("p")).head()["p"]
    lo = df.select(signbit_pack(F.col("emb"), 2, 2).alias("p")).head()["p"]
    assert hi == 0b10 and lo == 0b11


def test_signbit_rerank_is_exact_on_self_duplicate(spark):
    """A planted exact duplicate of the query vector has hamming 0 and
    cosine 1.0, and must rank first after the re-rank."""
    from iiot_data_engineering_lab_assignment_spark.operators.similarity import (
        signbit_topk,
    )
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    emb = load_table(spark, SF, "embeddings")
    qvec = emb.filter("vec_id = 0").head()["embedding"]
    planted = spark.createDataFrame(
        [(100000, [float(x) for x in qvec], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = signbit_topk(emb.unionByName(planted), query_id=0, k=10).collect()
    assert rows[0]["vec_id"] == 100000
    assert rows[0]["hamming"] == 0
    assert rows[0]["cosine"] == 1.0
    # cosine descending with deterministic ordering
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert all(0 <= r["hamming"] <= 64 for r in rows)


def test_multiset_ops_match_per_key_counts(spark):
    """EXCEPT ALL keeps max(o-f, 0) copies and INTERSECT ALL min(o, f)
    copies per key — verified against a direct count recompute."""
    from collections import Counter

    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    o = load_table(spark, SF, "orders").select("o_custkey", "o_orderstatus")
    keys = [(r["o_custkey"], r["o_orderstatus"]) for r in o.collect()]
    no = Counter(k for k, s in keys if s == "O")
    nf = Counter(k for k, s in keys if s == "F")
    rows = QUERIES["multiset_order_custkeys"].fn(spark, SF).collect()
    got_ex = Counter(r["o_custkey"] for r in rows if r["op"] == "except_all")
    got_ix = Counter(r["o_custkey"] for r in rows if r["op"] == "intersect_all")
    want_ex = Counter(
        {k: no[k] - nf.get(k, 0) for k in no if no[k] > nf.get(k, 0)}
    )
    want_ix = Counter(
        {k: min(no[k], nf[k]) for k in no if k in nf and min(no[k], nf[k]) > 0}
    )
    assert got_ex == want_ex
    assert got_ix == want_ix


def test_rolling_median_matches_recompute_and_resists_spikes(spark):
    """The frame median equals a direct python recompute for every row of
    one user, and a planted spike does not move its neighbors' medians."""
    import statistics

    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "event_id", "ts", "value")
    )
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).head()["user_id"]
    series = sorted(
        [(r["ts"], r["event_id"], r["value"]) for r in ev.filter(ev.user_id == uid).collect()]
    )
    rows = {
        r["event_id"]: r["rolling_median"]
        for r in QUERIES["rolling_median_purchase"].fn(spark, SF).collect()
        if r["user_id"] == uid
    }
    for i in range(len(series)):
        frame = [v for _, _, v in series[max(0, i - 6) : i + 1]]
        assert abs(rows[series[i][1]] - statistics.median(frame)) < 1e-6


def test_lexical_diversity_ratios_are_consistent(spark):
    rows = QUERIES["lexical_diversity_by_source"].fn(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 < r["distinct_tokens"] <= r["total_tokens"]
        assert 0 <= r["distinct_bigrams"] <= max(r["total_bigrams"], 1)
        assert abs(r["ttr"] - round(r["distinct_tokens"] / r["total_tokens"], 6)) < 1e-9


def test_counter_rate_reset_semantics(spark):
    """Per-user recompute: negative deltas (resets) restart the increase
    from the raw value; rates are increase over exact elapsed seconds."""
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events").filter("event_type = 'view'")
    raw = sorted(
        [(r["user_id"], r["ts"], r["event_id"], r["value"]) for r in ev.collect()]
    )
    series = {}
    for uid, ts, eid, v in raw:
        series.setdefault(uid, []).append((ts, eid, v))
    want = {}
    for uid, rows_u in series.items():
        rows_u.sort()
        for (pts, _, pv), (ts, eid, v) in zip(rows_u, rows_u[1:]):
            dt = (ts - pts).total_seconds()
            if dt <= 0:
                continue
            inc = v if v - pv < 0 else v - pv
            want[eid] = (inc, inc / dt)
    got = {
        r["event_id"]: (r["increase"], r["rate_per_s"])
        for r in QUERIES["counter_rate_resets"].fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for eid, (inc, rate) in want.items():
        assert abs(got[eid][0] - inc) < 1e-6
        assert abs(got[eid][1] - rate) < 1e-4
    # the fixture's random walk guarantees some resets exist; none may
    # produce a negative increase
    assert all(inc >= 0 for inc, _ in got.values())


def test_seasonal_anomalies_deviate_from_their_hour_profile(spark):
    """Every flagged row is >2.5 sample stds from the mean of its OWN
    (event_type, hour-of-day) cell, recomputed directly."""
    import math
    from collections import defaultdict

    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events")
    cells = defaultdict(list)
    vals = {}
    for r in ev.collect():
        cells[(r["event_type"], r["ts"].hour)].append(r["value"])
        vals[r["event_id"]] = (r["event_type"], r["ts"].hour, r["value"])
    rows = QUERIES["seasonal_residual_anomalies"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        et, hod, v = vals[r["event_id"]]
        assert hod == r["hod"]
        xs = cells[(et, hod)]
        m = sum(xs) / len(xs)
        sd = math.sqrt(sum((x - m) ** 2 for x in xs) / (len(xs) - 1))
        z = (v - m) / sd
        assert abs(z) > 2.5
        assert abs(r["zscore"] - z) < 1e-3
        assert abs(r["expected"] - m) < 1e-5


def test_rolling_distinct_users_matches_recompute(spark):
    """24h rolling distinct-user count recomputed directly for every row
    of one event_type (range frame: all rows within 24h at-or-before,
    including timestamp-tie peers)."""
    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    ev = load_table(spark, SF, "events").filter("event_type = 'signup'")
    raw = sorted(
        ((r["ts"], r["event_id"], r["user_id"]) for r in ev.collect())
    )
    got = {
        r["event_id"]: r["distinct_users_24h"]
        for r in QUERIES["rolling_distinct_users"].fn(spark, SF).collect()
        if r["event_type"] == "signup"
    }
    for ts, eid, _ in raw:
        want = len(
            {u for t, _, u in raw if ts.timestamp() - 86400 <= t.timestamp() <= ts.timestamp()}
        )
        assert got[eid] == want


def test_pagerank_matches_pure_python_recompute(spark):
    """3-iteration damped PageRank recomputed in pure python over the
    same supplier->customer edge set; top-20 must agree in order and
    value."""
    from collections import defaultdict

    from iiot_data_engineering_lab_assignment_spark.sources.readers import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    edges = {
        (f"s{r['l_suppkey']}", f"c{r['o_custkey']}")
        for r in li.join(o, li.l_orderkey == o.o_orderkey).collect()
    }
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    n = float(len(nodes))
    outdeg = defaultdict(int)
    for s, _ in edges:
        outdeg[s] += 1
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(3):
        contrib = defaultdict(float)
        for s, d in edges:
            contrib[d] += pr[s] / outdeg[s]
        pr = {v: 0.15 / n + 0.85 * contrib.get(v, 0.0) for v in nodes}
    want = sorted(
        ((round(p * 1e8) / 1e8, v) for v, p in pr.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = QUERIES["pagerank_supplier_customer"].fn(spark, SF).collect()
    assert [(r["node"], r["pagerank"]) for r in got] == [
        (v, p) for p, v in want
    ]
    # customers (pure sinks here) accumulate mass; every rank positive
    assert all(r["pagerank"] > 0 for r in got)


def test_linear_trend_recovers_planted_slope(spark):
    """A clean 2.0-units/day ramp (plus an exactly-cancelling residual
    pattern) comes back as slope 2.0 and the right intercept."""
    rows = [
        ("ramp", i, f"2024-01-{1 + i:02d} 00:00:00", 10.0 + 2.0 * i)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    df.createOrReplaceTempView("_trend_ev")
    x = F.expr("unix_micros(ts) DIV 1000000") - F.lit(1_704_067_200)
    xd = x.cast("decimal(19,0)")
    y = F.col("value").cast("decimal(14,4)")
    s = df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(xd * xd).cast("double").alias("sxx"),
        F.sum(xd * y).cast("double").alias("sxy"),
    )
    r = s.collect()[0]
    num = r["n"] * r["sxy"] - r["sx"] * r["sy"]
    den = r["n"] * r["sxx"] - r["sx"] * r["sx"]
    slope_day = 86400.0 * num / den
    intercept = (r["sy"] - (num / den) * r["sx"]) / r["n"]
    assert abs(slope_day - 2.0) < 1e-9
    assert abs(intercept - 10.0) < 1e-6


def test_linear_trend_query_shape(spark):
    rows = QUERIES["linear_trend_per_type"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        # fixture values are time-stationary noise: slope ~ 0 per day
        assert r["n_obs"] > 0 and abs(r["slope_per_day"]) < 50.0
        assert r["intercept"] is not None


def test_autocorr_lag1_separates_smooth_from_alternating(spark):
    data = [("smooth", i, float(i)) for i in range(50)] + [
        ("alt", i, float(1 if i % 2 else -1)) for i in range(50)
    ]
    df = spark.createDataFrame(data, "k string, i long, v double")
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy("i")
    got = {
        r["k"]: r["ac"]
        for r in df.select("k", "v", F.lag("v").over(w).alias("p"))
        .groupBy("k")
        .agg(F.corr("v", "p").alias("ac"))
        .collect()
    }
    assert got["smooth"] > 0.99  # linear ramp: perfectly correlated
    assert got["alt"] < -0.99  # alternating: perfectly anti-correlated


def test_cusum_flags_planted_level_shift_only(spark):
    """User 'shift' jumps +50 at midpoint; user 'flat' is constant.
    CUSUM must flag the shifted user and never the flat one."""
    rows = []
    for i in range(40):
        rows.append(("2024-01-01 00:%02d:00" % i, 1, i, 10.0 + (50.0 if i >= 20 else 0.0)))
        rows.append(("2024-01-01 00:%02d:00" % i, 2, 100 + i, 10.0))
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    import tempfile

    sf = tempfile.mkdtemp(prefix="cusum_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {
        r["user_id"]: r
        for r in QUERIES["cusum_drift_per_user"].fn(spark, sf).collect()
    }
    # flat user: every deviation is 0 -> max_cusum 0, no drift points
    assert out[2]["max_cusum"] == 0.0 and out[2]["drift_points"] == 0
    assert out[2]["first_drift_event"] is None
    # shifted user: mean is 35, so the first half walks -25/step down
    # (running min tracks it: cusum stays 0), then +25/step up -> the
    # cusum climbs to ~ 20*25 = 500*n scaled; must cross the 400 bar
    assert out[1]["max_cusum"] > 400.0
    assert out[1]["drift_points"] > 0
    assert out[1]["first_drift_event"] >= 20  # flagged only after the shift


def test_last_touch_picks_latest_click_within_6h(spark):
    rows = [
        # user 1: click@09:00, click@10:00, purchase@11:00 -> latest click 10:00
        ("2024-01-01 09:00:00", 1, 10, "click"),
        ("2024-01-01 10:00:00", 1, 11, "click"),
        ("2024-01-01 11:00:00", 1, 12, "purchase"),
        # user 2: click 7h before purchase -> too stale, NULL attribution
        ("2024-01-01 01:00:00", 2, 20, "click"),
        ("2024-01-01 08:00:00", 2, 21, "purchase"),
        # user 3: purchase with no click at all
        ("2024-01-01 05:00:00", 3, 30, "view"),
        ("2024-01-01 06:00:00", 3, 31, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts_s")).withColumn(
        "value", F.lit(1.0)
    )
    import tempfile

    sf = tempfile.mkdtemp(prefix="attr_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {
        r["purchase_id"]: r
        for r in QUERIES["last_touch_attribution"].fn(spark, sf).collect()
    }
    assert len(out) == 3
    assert out[12]["click_id"] == 11 and out[12]["secs_since_click"] == 3600
    assert out[21]["click_id"] is None and out[21]["secs_since_click"] is None
    assert out[31]["click_id"] is None


def test_basket_pairs_counts_orders_not_lineitems(spark):
    """A pair repeated twice INSIDE one order counts once; support is
    the number of distinct orders containing both parts."""
    rows = [
        (1, 100), (1, 200), (1, 200),   # intra-order repeat of 200
        (2, 100), (2, 200),
        (3, 100), (3, 300),
        (4, 300),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    items = df.distinct()
    b = items.select(
        F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        items.join(
            b,
            (items.l_orderkey == F.col("bo"))
            & (items.l_partkey < F.col("part_b")),
        )
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    got = {(r["part_a"], r["part_b"]): r["n_orders"] for r in pairs.collect()}
    assert got[(100, 200)] == 2  # orders 1 and 2, repeat not double-counted
    assert got[(100, 300)] == 1


def test_gini_extremes(spark):
    """Equal spend -> gini 0; winner-take-all -> (n-1)/n."""
    from pyspark.sql import Window

    def gini(revs):
        df = spark.createDataFrame(
            [(0, i, float(r)) for i, r in enumerate(revs)],
            "nationkey int, o_custkey long, rd double",
        ).select("nationkey", "o_custkey", F.col("rd").cast("decimal(18,2)").alias("r"))
        w = Window.partitionBy("nationkey").orderBy("r", "o_custkey")
        ranked = df.select("nationkey", "r", F.row_number().over(w).alias("i"))
        s = ranked.groupBy("nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("r").cast("double").alias("sr"),
            F.sum(F.col("i") * F.col("r")).cast("double").alias("sir"),
        ).collect()[0]
        return (2.0 * s["sir"] - (s["n"] + 1) * s["sr"]) / (s["n"] * s["sr"])

    assert abs(gini([100.0] * 10)) < 1e-12
    n = 10
    assert abs(gini([0.0] * (n - 1) + [1000.0]) - (n - 1) / n) < 1e-12


def test_transition_probabilities_sum_to_one(spark):
    rows = QUERIES["event_type_transitions"].fn(spark, SF).collect()
    assert rows
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_prev[r["prev_type"]] += r["p"]
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-4, (prev, tot)


def test_gap_sessionization_splits_on_gap_only(spark):
    import tempfile

    rows = [
        ("2024-01-01 00:00:00", "view"),
        ("2024-01-01 00:29:00", "click"),      # 29 min: same session
        ("2024-01-01 01:00:01", "purchase"),   # 31 min 1 s: NEW session
        ("2024-01-01 01:10:00", "view"),
    ]
    df = spark.createDataFrame(
        [(ts, 1, i, et, 1.0) for i, (ts, et) in enumerate(rows)],
        "ts_s string, user_id long, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="sess_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = sorted(
        QUERIES["gap_sessionization"].fn(spark, sf).collect(),
        key=lambda r: r["session_seq"],
    )
    assert len(out) == 2
    assert out[0]["n_events"] == 2 and out[0]["duration_secs"] == 29 * 60
    assert out[0]["n_purchases"] == 0
    assert out[1]["n_events"] == 2 and out[1]["n_purchases"] == 1


def test_zipf_slope_on_planted_powerlaw(spark):
    """A corpus whose term frequencies are exactly f = 1000 / rank must
    regress to slope -1 in log-log space."""
    import tempfile

    words = []
    for rnk in range(1, 21):
        words += [f"w{rnk:02d}"] * (1000 // rnk)
    text = " ".join(words)
    df = spark.createDataFrame(
        [(1, text, "xx", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = tempfile.mkdtemp(prefix="zipf_")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = QUERIES["zipf_term_slope"].fn(spark, sf).collect()
    assert len(rows) == 1
    # 1000//rank introduces floor error; slope still lands near -1
    assert -1.05 < rows[0]["zipf_slope"] < -0.95


def test_pareto_abc_partition_and_ordering(spark):
    rows = {r["abc_class"]: r for r in QUERIES["pareto_abc_parts"].fn(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}
    total_rev = sum(r["revenue"] for r in rows.values())
    # A covers <=70% of revenue but (Pareto) uses fewer parts per
    # revenue-dollar than C
    assert rows["A"]["revenue"] <= 0.7 * total_rev + 1e-6
    a_eff = rows["A"]["revenue"] / rows["A"]["n_parts"]
    c_eff = rows["C"]["revenue"] / rows["C"]["n_parts"]
    assert a_eff > c_eff
    # classes A+B together cover <=90%, so C holds the remaining >=10%
    assert rows["C"]["revenue"] >= 0.1 * total_rev - 1e-6


def test_lateral_topk_matches_window_rank(spark):
    got = QUERIES["lateral_top3_customers_per_nation"].fn(spark, SF)
    from pyspark.sql import Window

    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_name"
    )
    want = (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "c_name", "c_acctbal")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_kl_divergence_zero_for_identical_sources(spark):
    """Two sources with identical term distributions both sit at the
    same (minimal) KL; a skewed third source scores strictly higher."""
    import tempfile

    base = "alpha beta gamma delta " * 5
    skew = "alpha alpha alpha alpha " * 5
    rows = [
        (1, base, "en", "s1", len(base)),
        (2, base, "en", "s2", len(base)),
        (3, skew, "en", "s3", len(skew)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tempfile.mkdtemp(prefix="kl_")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["source"]: r["kl_bits_nat"] for r in QUERIES["kl_divergence_by_source"].fn(spark, sf).collect()}
    assert abs(out["s1"] - out["s2"]) < 1e-9
    assert out["s3"] > out["s1"] + 0.1


def test_benford_probabilities_and_coverage(spark):
    rows = QUERIES["benford_leading_digit"].fn(spark, SF).collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    tot_obs = sum(r["obs_p"] for r in rows)
    assert abs(tot_obs - 1.0) < 1e-3
    ps = {r["digit"]: r["benford_p"] for r in rows}
    if 1 in ps:
        assert abs(ps[1] - 0.30103) < 1e-4
    if 9 in ps:
        assert abs(ps[9] - 0.045757) < 1e-4


def test_time_to_first_purchase_window_semantics(spark):
    import tempfile

    rows = [
        # user 1: signup 00:00, first purchase 10:00 -> 10h
        ("2024-01-01 00:00:00", 1, 1, "signup"),
        ("2024-01-01 10:00:00", 1, 2, "purchase"),
        ("2024-01-02 00:00:00", 1, 3, "purchase"),  # later purchase ignored
        # user 2: purchase BEFORE signup -> excluded
        ("2024-01-01 05:00:00", 2, 4, "purchase"),
        ("2024-01-01 06:00:00", 2, 5, "signup"),
        # user 3: signup, never purchases -> excluded
        ("2024-01-01 00:00:00", 3, 6, "signup"),
    ]
    df = spark.createDataFrame(
        [(ts, u, e, t, 1.0) for ts, u, e, t in rows],
        "ts_s string, user_id long, event_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="ttfp_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["time_to_first_purchase_quantiles"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["n_converted"] == 1
    assert abs(out[0]["p50_hours"] - 10.0) < 1e-6


def test_association_rules_directionality(spark):
    """Confidence is directional: if 300 appears in 4 orders and (100,300)
    in 2, conf(300->100)=0.5 but conf(100->300)=2/3 when 100 has 3 orders."""
    rows = [
        (1, 100), (1, 300),
        (2, 100), (2, 300),
        (3, 100),
        (4, 300), (5, 300),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    items = df.distinct()
    n = items.select("l_orderkey").distinct().count()
    supp1 = {r["l_partkey"]: r["s"] for r in items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s")).collect()}
    b = items.select(F.col("l_orderkey").alias("bo"), F.col("l_partkey").alias("cons"))
    pairs = (
        items.join(b, (items.l_orderkey == F.col("bo")) & (items.l_partkey != F.col("cons")))
        .groupBy(F.col("l_partkey").alias("ante"), "cons")
        .agg(F.count(F.lit(1)).alias("s_ab"))
    )
    got = {(r["ante"], r["cons"]): r["s_ab"] for r in pairs.collect()}
    assert got[(100, 300)] == 2 and got[(300, 100)] == 2
    assert got[(100, 300)] / supp1[100] == 2 / 3
    assert got[(300, 100)] / supp1[300] == 0.5
    # lift is symmetric: s_ab * n / (s_a * s_c)
    assert abs(got[(100, 300)] * n / (supp1[100] * supp1[300]) - 10 / 12) < 1e-12


def test_top_with_ties_keeps_all_tied_rows(spark):
    """RANK-based top-k must include every row tied at the boundary."""
    from pyspark.sql import Window

    rows = [(i, 100.0) for i in range(12)] + [(99, 500.0)]
    df = spark.createDataFrame(rows, "k long, revenue double").select(
        "k", F.col("revenue").cast("decimal(18,2)").alias("revenue")
    )
    w = Window.orderBy(F.desc("revenue"))
    out = df.select("k", F.rank().over(w).alias("rnk")).filter(F.col("rnk") <= 10)
    # 1 leader + 12 tied at rank 2 -> all 13 kept (row_number would keep 10)
    assert out.count() == 13


def test_mom_growth_ratio_semantics(spark):
    rows = QUERIES["mom_revenue_growth"].fn(spark, SF).collect()
    assert rows
    by_p = {}
    for r in sorted(rows, key=lambda r: (r["priority"], r["month"])):
        prev = by_p.get(r["priority"])
        if prev is not None and prev > 0:
            assert r["mom_growth"] is not None
            assert abs(r["mom_growth"] - round((r["revenue"] - prev) / prev, 6)) < 1e-9
        else:
            assert r["mom_growth"] is None
        by_p[r["priority"]] = r["revenue"]


def test_profile_columns_exactness(spark):
    rows = {r["col"]: r for r in QUERIES["profile_orders_columns"].fn(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    for col in ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]:
        r = rows[col]
        assert r["n"] == n
        assert r["non_null"] == o.filter(F.col(col).isNotNull()).count()
        assert r["n_distinct"] == o.select(col).distinct().filter(F.col(col).isNotNull()).count()


def test_streaming_session_window_matches_batch_gap_sessionization(spark):
    """The streaming session_window (gap merge) and the batch island
    numbering are INDEPENDENT implementations of the same semantics;
    closed streaming sessions must agree with the batch islands on
    (user, start, n_events) and end exactly at last_event + gap."""
    import tempfile
    import uuid
    from datetime import datetime

    from iiot_data_engineering_lab_assignment_spark.streaming.jobs import (
        streaming_rollup,
    )

    T = lambda h, m: datetime(2024, 5, 1, h, m, 0)  # noqa: E731
    # user 1: two sessions (09:00-09:20, 11:00); user 2: one session
    events = [
        (1, 101, "view", T(9, 0), 1.0),
        (1, 102, "click", T(9, 20), 1.0),   # 20 min gap: same session
        (1, 103, "view", T(11, 0), 1.0),    # 100 min gap: new session
        (2, 201, "view", T(9, 30), 1.0),
    ]
    closers = [(1, 199, "view", T(20, 0), 1.0), (2, 299, "view", T(20, 0), 1.0)]
    schema = "user_id long, event_id long, event_type string, ts timestamp, value double"

    # streaming leg: session_window with 30-min gap, closed by the closers
    src = tempfile.mkdtemp(prefix="sessparity_src_")
    name = f"sessparity_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_rollup(
        stream, "ts", "1 minute", "5 seconds", ["user_id"], session_gap="30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sessparity_ckpt_"))
        .start()
    )
    try:
        for batch in (events, closers):
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
    finally:
        q.stop()
    stream_rows = {
        (r["user_id"], r["window_start"]): r
        for r in spark.table(name).collect()
        if r["window_start"] < T(20, 0)
    }

    # batch leg: gap_sessionization islands over the same closed events
    sf = tempfile.mkdtemp(prefix="sessparity_batch_")
    spark.createDataFrame(events + closers, schema).write.mode("overwrite").parquet(
        f"{sf}/events.parquet"
    )
    batch_rows = QUERIES["gap_sessionization"].fn(spark, sf).collect()

    # reconstruct island starts for the comparison key
    starts = {}
    for u, eid, _t, ts, _v in sorted(events, key=lambda r: (r[0], r[3])):
        key = (u,)
        prev = starts.get(key)
        if prev is None or (ts - prev[-1][-1]).total_seconds() > 1800:
            starts.setdefault(key, []).append([ts, ts])
        else:
            starts[key][-1][-1] = ts
    expected = {}
    for (u,), sess in starts.items():
        for st, en in sess:
            expected[(u, st)] = en
    assert len(stream_rows) == 3 and len(expected) == 3
    for (u, st), en in expected.items():
        srow = stream_rows[(u, st)]
        # streaming session end = last event + gap
        assert (srow["window_end"] - en).total_seconds() == 1800
    # batch islands agree on count and duration per (user, n_events)
    closed_batch = [
        r for r in batch_rows if (r["user_id"], r["n_events"]) != (r["user_id"], 1) or True
    ]
    durations = sorted(
        (r["user_id"], r["n_events"], r["duration_secs"]) for r in closed_batch
    )
    # user1: (2 events, 1200s) + (1 event, 0s) + closer (1,0); user2: (1,0) + closer (1,0)
    assert (1, 2, 1200) in durations
    assert sum(1 for d in durations if d[0] == 1) == 3
    assert sum(1 for d in durations if d[0] == 2) == 2


def test_exact_dup_rate_counts_planted_duplicates(spark):
    import tempfile

    rows = [
        (1, "same text", "en", "sA", 9),
        (2, "same text", "en", "sA", 9),
        (3, "same text", "en", "sA", 9),
        (4, "unique one", "en", "sA", 10),
        (5, "other", "en", "sB", 5),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tempfile.mkdtemp(prefix="duprate_")
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    out = {r["source"]: r for r in QUERIES["exact_dup_rate_by_source"].fn(spark, sf).collect()}
    assert out["sA"]["n_docs"] == 4 and out["sA"]["n_unique"] == 2
    assert out["sA"]["n_dup_rows"] == 2 and abs(out["sA"]["dup_rate"] - 0.5) < 1e-9
    assert out["sB"]["dup_rate"] == 0.0


def test_ship_latency_nonnegative_and_exact_mean(spark):
    rows = QUERIES["ship_latency_by_supplier"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_shipments"] >= 5
        assert 0 <= r["avg_latency_days"] <= r["worst_days"]


def test_triangle_count_on_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; participation counts
    follow (the two hub nodes sit in both)."""
    import tempfile

    # orders = cliques: order 1 = {1,2,3}, order 2 = {1,2,4} -> edges
    # 12,13,23,14,24 (no 34): triangles 123 and 124
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 4)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = tempfile.mkdtemp(prefix="tri_")
    df.selectExpr(
        "l_orderkey", "l_partkey", "l_orderkey AS l_suppkey",
        "1 AS l_linenumber", "1.0 AS l_quantity", "1.0 AS l_extendedprice",
        "0.0 AS l_discount", "0.0 AS l_tax", "'N' AS l_returnflag",
        "'O' AS l_linestatus", "TIMESTAMP '2024-01-01' AS l_shipdate",
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    out = {r["part"]: r["n_triangles"] for r in QUERIES["triangle_parts_topk"].fn(spark, sf).collect()}
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_session_conversion_rates_bounded_and_consistent(spark):
    rows = QUERIES["session_conversion_by_depth"].fn(spark, SF).collect()
    assert rows
    total_sessions = sum(r["n_sessions"] for r in rows)
    batch = QUERIES["gap_sessionization"].fn(spark, SF).count()
    assert total_sessions == batch  # same islands, same session count
    for r in rows:
        assert 0.0 <= r["conversion_rate"] <= 1.0
        assert r["n_converted"] <= r["n_sessions"]
        assert 1 <= r["depth"] <= 10


def test_rfm_quintiles_partition_customers(spark):
    rows = QUERIES["rfm_segmentation"].fn(spark, SF).collect()
    n_customers = sum(r["n_customers"] for r in rows)
    assert n_customers == spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct().count()
    for r in rows:
        assert 1 <= r["r_score"] <= 5 and 1 <= r["f_score"] <= 5 and 1 <= r["m_score"] <= 5
        if r["r_score"] >= 4 and r["f_score"] >= 4 and r["m_score"] >= 4:
            assert r["segment"] == "champion"


def test_filtered_aggregates_match_case_when(spark):
    got = {r["o_orderpriority"]: r for r in QUERIES["filtered_aggregates"].fn(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    want = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("nf"),
    ).collect()
    for r in want:
        g = got[r["o_orderpriority"]]
        assert g["n_orders"] == r["n"] and g["n_finished"] == r["nf"]
        assert g["big_spenders"] <= g["n_orders"]


def test_backlog_matches_brute_force_interval_count(spark):
    """Event-ified backlog equals the brute-force per-day interval count
    on a hand-built schedule."""
    import tempfile
    from datetime import date

    # order 1: placed d1 shipped d3; order 2: placed d2 shipped d2;
    # order 3: placed d2 shipped d5
    orders = [
        (1, 1, "F", 10.0, "2024-01-01 00:00:00", "1-URGENT"),
        (2, 1, "F", 10.0, "2024-01-02 00:00:00", "1-URGENT"),
        (3, 1, "F", 10.0, "2024-01-02 00:00:00", "1-URGENT"),
    ]
    lines = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-03 00:00:00"),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-02 00:00:00"),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-04 00:00:00"),
        (3, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", "2024-01-05 00:00:00"),
    ]
    sf = tempfile.mkdtemp(prefix="backlog_")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, od string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("od")).drop("od").write.mode(
        "overwrite"
    ).parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_linenumber int, l_partkey long, l_suppkey long, l_quantity double, l_extendedprice double, l_discount double, l_tax double, l_returnflag string, l_linestatus string, sd string",
    ).withColumn("l_shipdate", F.to_timestamp("sd")).drop("sd").write.mode(
        "overwrite"
    ).parquet(f"{sf}/lineitem.parquet")
    out = {r["day"]: r["open_orders"] for r in QUERIES["open_order_backlog_daily"].fn(spark, sf).collect()}
    # running level: d1 +1=1; d2 +2-1=2; d3 -1=1; d5 -1=0
    assert out[date(2024, 1, 1)] == 1
    assert out[date(2024, 1, 2)] == 2
    assert out[date(2024, 1, 3)] == 1
    assert out[date(2024, 1, 5)] == 0


def test_error_streak_rle_on_planted_runs(spark):
    """Timeline E E E V E E V E -> runs of 3, 2, 1: longest 3, 3 streaks."""
    import tempfile

    seq = ["error", "error", "error", "view", "error", "error", "view", "error"]
    rows = [
        ("2024-01-01 00:%02d:00" % i, 1, i, t, 1.0) for i, t in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="streak_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["longest_error_streaks"].fn(spark, sf).collect()
    assert len(out) == 1
    assert out[0]["longest_streak"] == 3 and out[0]["n_streaks"] == 3


def test_wasserstein_known_distributions(spark):
    """Point masses at 0 vs 1 -> W1 = 1; identical distributions -> 0."""
    import tempfile

    rows = []
    eid = 0
    # type 'shift': first half all 0.0, second half all 1.0 -> W1 = 1
    for i in range(50):
        rows.append(("2024-01-05 00:00:%02d" % (i % 60), 1, eid, "shift", 0.0)); eid += 1
        rows.append(("2024-01-25 00:00:%02d" % (i % 60), 1, eid, "shift", 1.0)); eid += 1
    # type 'same': identical halves -> W1 = 0
    for i in range(50):
        rows.append(("2024-01-05 01:00:%02d" % (i % 60), 1, eid, "same", float(i % 5))); eid += 1
        rows.append(("2024-01-25 01:00:%02d" % (i % 60), 1, eid, "same", float(i % 5))); eid += 1
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="w1_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {r["event_type"]: r["w1_distance"] for r in QUERIES["wasserstein_value_drift"].fn(spark, sf).collect()}
    assert abs(out["shift"] - 1.0) < 1e-6
    assert out["same"] == 0.0


def test_histogram_buckets_cover_all_rows_with_clamp(spark):
    rows = QUERIES["value_histogram_by_type"].fn(spark, SF).collect()
    total = sum(r["n"] for r in rows)
    ev = spark.read.parquet(f"{SF}/events.parquet")
    assert total == ev.filter(F.col("value") >= 0).count()
    for r in rows:
        assert 0 <= r["bucket"] <= 19
        assert r["bucket_hi"] - r["bucket_lo"] == 25.0
    # overflow clamp: any value > 500 lands in bucket 19
    if ev.filter(F.col("value") > 500).count() > 0:
        assert any(r["bucket"] == 19 for r in rows)


def test_modal_type_deterministic_tiebreak(spark):
    import tempfile

    rows = [(1, i, t, "2024-01-01 00:00:00", 1.0) for i, t in enumerate(["b", "b", "a", "a"])]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_s string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="modal_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["modal_event_type_per_user"].fn(spark, sf).collect()
    # 2-2 tie between 'a' and 'b' -> alphabetical winner 'a'
    assert len(out) == 1 and out[0]["modal_type"] == "a" and out[0]["n_events"] == 2


def test_correlation_matrix_self_consistency(spark):
    """Perfectly co-moving planted series -> r = 1; anti-moving -> -1."""
    import tempfile

    rows = []
    eid = 0
    for h in range(24):
        base = float(h)
        for _ in range(2):  # two readings per hour per type
            rows.append(("2024-01-01 %02d:00:00" % h, 1, eid, "click", base)); eid += 1
            rows.append(("2024-01-01 %02d:10:00" % h, 1, eid, "view", 2.0 * base)); eid += 1
            rows.append(("2024-01-01 %02d:20:00" % h, 1, eid, "error", 23.0 - base)); eid += 1
    df = spark.createDataFrame(
        rows, "ts_s string, user_id long, event_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s"))
    sf = tempfile.mkdtemp(prefix="corrm_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = {r["pair"]: r["pearson_r"] for r in QUERIES["sensor_type_correlation_matrix"].fn(spark, sf).collect()}
    assert out["click|view"] == 1.0
    assert out["click|error"] == -1.0
    assert out["error|view"] == -1.0
    # pairs with a type absent from the fixture correlate over no rows -> NULL
    assert out["click|purchase"] is None


def test_ri_audit_detects_planted_orphans(spark):
    import tempfile

    sf = tempfile.mkdtemp(prefix="ri_")
    spark.createDataFrame(
        [(1, 1), (2, 1), (99, 1)], "l_orderkey long, l_partkey long"
    ).selectExpr(
        "l_orderkey", "l_partkey", "1 AS l_suppkey", "1 AS l_linenumber",
        "1.0 AS l_quantity", "1.0 AS l_extendedprice", "0.0 AS l_discount",
        "0.0 AS l_tax", "'N' AS l_returnflag", "'O' AS l_linestatus",
        "TIMESTAMP '2024-01-01' AS l_shipdate",
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 77)], "o_orderkey long, o_custkey long"
    ).selectExpr(
        "o_orderkey", "o_custkey", "'F' AS o_orderstatus",
        "1.0 AS o_totalprice", "TIMESTAMP '2024-01-01' AS o_orderdate",
        "'1-URGENT' AS o_orderpriority",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(10, 0)], "c_custkey long, c_nationkey long"
    ).selectExpr(
        "c_custkey", "'x' AS c_name", "'a' AS c_address", "c_nationkey",
        "'p' AS c_phone", "1.0 AS c_acctbal", "'m' AS c_mktsegment",
    ).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(0, "N0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    ).write.mode("overwrite").parquet(f"{sf}/nation.parquet")
    out = {r["fk"]: r for r in QUERIES["referential_integrity_audit"].fn(spark, sf).collect()}
    # lineitem 99 is an orphan; order 3 is childless AND points at
    # missing customer 77; customer 10 and nation 0 are consistent
    assert out["lineitem->orders"]["n_orphans"] == 1
    assert out["lineitem->orders"]["n_childless"] == 1
    assert out["orders->customer"]["n_orphans"] == 1
    assert out["orders->customer"]["n_childless"] == 0
    assert out["customer->nation"]["n_orphans"] == 0
    assert out["customer->nation"]["n_childless"] == 0

"""Property-based tests (hypothesis) for engine primitives whose
semantics have clean Python references."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iiot_data_engineering_lab_assignment_spark.operators.text import token_count
from iiot_data_engineering_lab_assignment_spark.operators.windows import tumbling_rollup

# words without spaces; documents are space-joined
words = st.lists(st.text(alphabet="abcdefgh01", min_size=1, max_size=6), min_size=1, max_size=30)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(words, min_size=1, max_size=8))
def test_token_count_matches_python(spark, docs):
    """token_count (length arithmetic, no array) == Python's split count."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r["n"] for r in df.select("id", token_count("text").alias("n")).collect()}
    for i, ws in enumerate(docs):
        assert got[i] == len(" ".join(ws).split(" ")), ws


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # seconds offset
            st.sampled_from(["a", "b"]),
            # quarter-integers: exact in binary AND in DECIMAL(18,4), so the
            # engine's exact-decimal mean equals the float reference mean
            st.integers(min_value=-4_000_000, max_value=4_000_000).map(lambda i: i / 4.0),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_tumbling_rollup_matches_python(spark, data):
    """The windowed rollup equals a dict-based Python reference on
    arbitrary inputs: same buckets, same min/max/count, avg within fp
    tolerance."""
    from datetime import datetime, timedelta

    base = datetime(2024, 6, 1)
    rows = [(base + timedelta(seconds=s), k, float(v)) for s, k, v in data]
    df = spark.createDataFrame(rows, "ts timestamp, k string, value double")
    got = {
        (r["window_start"], r["k"]): (r["min_value"], r["max_value"], r["count_readings"], r["avg_value"])
        for r in tumbling_rollup(df, "ts", "1 minute", ["k"]).collect()
    }
    ref: dict = {}
    for ts, k, v in rows:
        bucket = ts.replace(second=0, microsecond=0)
        cur = ref.setdefault((bucket, k), [])
        cur.append(v)
    assert set(got) == set(ref)
    for key, vals in ref.items():
        mn, mx, cnt, avg = got[key]
        assert mn == min(vals) and mx == max(vals) and cnt == len(vals)
        assert math.isclose(avg, sum(vals) / len(vals), rel_tol=1e-9, abs_tol=1e-9)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False), min_size=2, max_size=40
    )
)
def test_welford_state_matches_numpy(spark, vals):
    """The stateful operator's Welford accumulation == numpy's two-pass
    mean/variance (numerical-stability property)."""
    import numpy as np

    n, mean, m2 = 0, 0.0, 0.0
    for v in vals:
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    assert math.isclose(mean, float(np.mean(vals)), rel_tol=1e-9, abs_tol=1e-9)
    assert math.isclose(m2 / (n - 1), float(np.var(vals, ddof=1)), rel_tol=1e-7, abs_tol=1e-7)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w_train=st.floats(min_value=0.05, max_value=0.9),
    w_val_share=st.floats(min_value=0.0, max_value=1.0),
)
def test_split_partition_and_monotonicity(spark, w_train, w_val_share):
    """For ANY weights: the splits partition the ids, and growing the
    train weight never evicts a doc from train (threshold semantics on
    one fixed uniform => monotone membership)."""
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import (
        train_val_test_split,
    )

    w_val = (1.0 - w_train) * w_val_share
    w_test = 1.0 - w_train - w_val
    ids = spark.range(0, 120).withColumnRenamed("id", "doc_id")
    a = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            ids, weights=(w_train, w_val, w_test)
        ).collect()
    }
    assert len(a) == 120  # every doc assigned exactly once
    grown = min(w_train + 0.07, 1.0)
    rest = 1.0 - grown
    b = {
        r["doc_id"]: r["split"]
        for r in train_val_test_split(
            ids, weights=(grown, rest / 2, rest - rest / 2)
        ).collect()
    }
    train_a = {k for k, v in a.items() if v == "train"}
    train_b = {k for k, v in b.items() if v == "train"}
    assert train_a <= train_b


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
    ),
    rate=st.integers(min_value=1, max_value=192000),
)
def test_wav_roundtrip_property(samples, rate):
    """encode->decode is the identity for every int16 sample sequence and
    sample rate (no Spark involvement - pure codec property)."""
    import numpy as np

    from iiot_data_engineering_lab_assignment_spark.operators.audiocodec import (
        decode_wav,
        encode_wav,
    )

    s = np.array(samples, dtype=np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate and np.array_equal(out, s)


def _brute_force_span_coverage(texts: dict[int, str], n: int = 5):
    """Python reference for duplicated_span_coverage: position sets, no
    interval arithmetic — the independent check on the window-union
    implementation."""
    grams: dict[int, list[tuple[int, str]]] = {}
    df: dict[str, set[int]] = {}
    for d, t in texts.items():
        toks = t.split(" ")
        gs = [
            (i, " ".join(toks[i : i + n])) for i in range(len(toks) - n + 1)
        ]
        grams[d] = gs
        for _, g in gs:
            df.setdefault(g, set()).add(d)
    out = {}
    for d, t in texts.items():
        covered: set[int] = set()
        for i, g in grams[d]:
            if len(df[g]) >= 2:
                covered.update(range(i, i + n))
        out[d] = (len(t.split(" ")), len(covered))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=25),
        min_size=2,
        max_size=8,
    )
)
def test_dup_span_coverage_matches_python(spark, docs):
    """duplicated_span_coverage's interval-union window == a brute-force
    position-set reference, on tiny-alphabet corpora where cross-doc
    5-gram collisions (incl. overlapping and adjacent spans) are dense."""
    from iiot_data_engineering_lab_assignment_spark.operators.dedup import (
        duplicated_span_coverage,
    )

    texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in duplicated_span_coverage(df, n=5).collect()
    }
    assert got == _brute_force_span_coverage(texts, n=5)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=60),
    n_shards=st.sampled_from([1, 2, 7, 64, 65536]),
    epoch=st.integers(min_value=0, max_value=3),
)
def test_epoch_shuffle_permutation_property(spark, n, n_shards, epoch):
    """For ANY corpus size, shard count (including the 1 and 65536
    boundaries), and epoch: output is a permutation (each doc exactly
    once, (shard, pos) slots unique, pos contiguous from 1 per shard)
    and concatenated shard order equals the md5-key order."""
    from iiot_data_engineering_lab_assignment_spark.operators.sampling import epoch_shuffle

    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    rows = epoch_shuffle(docs, epoch=epoch, n_shards=n_shards).collect()
    assert len(rows) == n
    assert len({r["doc_id"] for r in rows}) == n
    assert len({(r["shard"], r["pos"]) for r in rows}) == n
    by_shard = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    import hashlib

    def key(i):
        return hashlib.md5(f"epoch:{epoch}:{i}".encode()).hexdigest()

    concat = [r["doc_id"] for r in sorted(rows, key=lambda r: (r["shard"], r["pos"]))]
    assert concat == sorted(range(n), key=lambda i: (key(i), i))


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lens=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=30),
    batch_size=st.integers(min_value=1, max_value=5),
)
def test_length_bucket_packing_property(spark, lens, batch_size):
    """For ANY token-length multiset and batch size: every doc lands in
    the smallest power-of-two bucket covering it, batches never exceed
    batch_size, and pad_to is each batch's max length."""
    from iiot_data_engineering_lab_assignment_spark.operators.text import (
        length_bucket_packing,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ln)) for i, ln in enumerate(lens)],
        "doc_id long, text string",
    )
    out = length_bucket_packing(docs, batch_size=batch_size).collect()
    assert len(out) == len(lens)
    from collections import Counter, defaultdict

    sizes = Counter((r["bucket"], r["batch_idx"]) for r in out)
    assert max(sizes.values()) <= batch_size
    bmax = defaultdict(int)
    for r in out:
        n, b = r["n_tokens"], r["bucket"]
        assert n == lens[r["doc_id"]]
        assert b & (b - 1) == 0 and b >= max(n, 1) and (n <= 1 or b < 2 * n)
        bmax[(b, r["batch_idx"])] = max(bmax[(b, r["batch_idx"])], n)
    for r in out:
        assert r["pad_to"] == bmax[(r["bucket"], r["batch_idx"])]


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    gaps=st.lists(
        st.integers(min_value=1, max_value=7200), min_size=1, max_size=40
    ),
    n_users=st.integers(min_value=1, max_value=3),
)
def test_gap_sessionization_invariants(spark, gaps, n_users):
    """Islands partition the timeline exactly: session count per user ==
    1 + #(gaps > 30 min), and event counts sum to the input size."""
    from datetime import datetime, timedelta

    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES
    import tempfile

    rows = []
    eid = 0
    for u in range(n_users):
        t = datetime(2024, 4, 1, 0, 0, 0)
        rows.append((t, u, eid, "view", 1.0))
        eid += 1
        for g in gaps:
            t = t + timedelta(seconds=g)
            rows.append((t, u, eid, "view", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string, value double"
    )
    sf = tempfile.mkdtemp(prefix="hyp_sess_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["gap_sessionization"].fn(spark, sf).collect()
    expected_sessions_per_user = 1 + sum(1 for g in gaps if g > 1800)
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user) == n_users
    for u, sess in by_user.items():
        assert len(sess) == expected_sessions_per_user
        assert sum(s["n_events"] for s in sess) == len(gaps) + 1
        for s in sess:
            assert s["duration_secs"] >= 0


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
        min_size=2,
        max_size=30,
    )
)
def test_cusum_matches_python_recompute(spark, vals):
    """The windowed n*S_k - k*S_n decomposition equals the direct
    running-sum-of-deviations recursion computed in Python."""
    import tempfile
    from datetime import datetime, timedelta

    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    vals = [round(v, 4) for v in vals]
    t0 = datetime(2024, 4, 1)
    rows = [
        (t0 + timedelta(minutes=i), 7, i, "view", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_id long, event_type string, value double"
    )
    sf = tempfile.mkdtemp(prefix="hyp_cusum_")
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    out = QUERIES["cusum_drift_per_user"].fn(spark, sf).collect()[0]
    mean = sum(vals) / len(vals)
    run, mn, mx = 0.0, 0.0, 0.0
    for v in vals:
        run += v - mean
        mn = min(mn, run)
        mx = max(mx, run - mn)
    assert out["n_events"] == len(vals)
    assert math.isclose(out["max_cusum"], round(mx, 6), rel_tol=1e-6, abs_tol=2e-4)
    assert out["max_cusum"] >= 0.0


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    times=st.lists(
        st.integers(min_value=0, max_value=200_000), min_size=1, max_size=40
    ),
    cooldown=st.integers(min_value=1, max_value=50_000),
)
def test_debounce_matches_python_reference(spark, tmp_path_factory, times, cooldown):
    """The registered debounce (applyInPandas) == the one-line Python
    recurrence, for arbitrary timelines and cooldowns; plus the
    idempotence property (debouncing the kept set keeps everything)."""
    from pyspark.sql import functions as F2

    from iiot_data_engineering_lab_assignment_spark.registry import QUERIES

    tmp = tmp_path_factory.mktemp("debounce_prop")
    # the registered query's cooldown is fixed at 6h; rescale the drawn
    # second offsets so the EFFECTIVE cooldown is the drawn one (keep-set
    # is scale-invariant), materialized at integer microseconds so the
    # reference recurrence and the engine see the identical timeline
    scale = 21_600 / cooldown
    rows = [
        (i, int(t * scale * 1_000_000), 1, "error", 1.0, "{}")
        for i, t in enumerate(sorted(times))
    ]
    kept_ref, last = [], None
    for i, (eid, us, *_rest) in enumerate(rows):
        if last is None or us >= last + 21_600 * 1_000_000:
            kept_ref.append(eid)
            last = us
    spark.createDataFrame(
        rows,
        "event_id long, us long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F2.timestamp_micros("us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.parquet(str(tmp / "events.parquet"))
    got = sorted(
        r["event_id"]
        for r in QUERIES["debounce_alerts"].fn(spark, str(tmp)).collect()
    )
    assert got == kept_ref
    # idempotence: debouncing only the kept events keeps all of them
    kept_rows = [r for r in rows if r[0] in set(kept_ref)]
    spark.createDataFrame(
        kept_rows,
        "event_id long, us long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id",
        F2.timestamp_micros("us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp / "events.parquet"))
    again = sorted(
        r["event_id"]
        for r in QUERIES["debounce_alerts"].fn(spark, str(tmp)).collect()
    )
    assert again == kept_ref

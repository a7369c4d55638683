"""Corpus-curation / tokenizer-training registrations (split from
registry.py, r13 verdict ask #9): exact-substring span dedup (Lee et
al. 2107.06499) and the span-first curation pipeline, the BPE trainer
family (pair statistic, 2-merge and 16-merge learned tables, apply /
compression-filter rows), the inverted-index builds (flat gap-encoded
and doc-sharded), and the shuffle-key skew profiler.  Imported by
``registry`` at the position the block previously occupied — QUERIES
insertion order is unchanged (tests/test_registry_split.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.text import quality_score
from .registry_core import register
from .sources.readers import load_table


def build_survivor_set(docs: DataFrame) -> DataFrame:
    """The curation flagship's survivor-set prefix — span removal (k=8,
    min_span=50, gap=8) -> empty-doc drop -> quality gate (>= 0.5 over
    the CLEANED text) -> md5-fingerprint exact dedup keep-first — as ONE
    shared builder (r15 ADVICE #3): corpus_curation_pipeline_spans_q
    pins this set ahead of the shard stage, and the plan test asserts
    the span-stage invariants on the SAME unpinned prefix, so a
    parameter drift in the registered query cannot silently outrun the
    test's hand-rebuilt copy."""
    from .operators.dedup import exact_dedup_keep_first_fp, remove_duplicate_spans

    clean = (
        remove_duplicate_spans(docs, k=8, min_span=50, gap=8)
        .select("doc_id", F.col("clean_text").alias("text"))
        .filter(F.col("text") != "")
    )
    gated = quality_score(clean).filter(F.col("quality_score") >= 0.5)
    return exact_dedup_keep_first_fp(gated.select("doc_id", "text"))

__all__ = ["MODULE_QUERIES"]

#: registration order within this module (order-preserving anchor)
MODULE_QUERIES = [
    "exact_substring_spans",
    "exact_substring_dedup",
    "corpus_curation_pipeline_spans",
    "bpe_merge_pair_counts",
    "bpe_learned_merges16",
    "bpe_learned_merges64",
    "bpe_learned_merges",
    "bpe_segment_counts",
    "bpe_compression_by_source",
    "inverted_index_gaps",
    "event_key_skew_profile",
    "inverted_index_sharded",
    "curation_e2e_composed",
]

# the positional-fingerprint-chain substring dedup as shared CTEs: k=8
# word-gram md5 fingerprints, corpus-first-occurrence via min(doc*2^20+pos),
# redundant occurrences island-merged with gap stitching (break at
# pos - prev > k + gap = 16), spans >= 50 tokens qualify — the prefix of
# both the span-finding and the span-removal oracle
_SUBSTR_SPAN_CTES = """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8
    ), g AS (
      SELECT doc_id, i AS pos,
             substr(md5(array_to_string(toks[i+1:i+8], ' ')), 1, 16) AS fp
      FROM t, LATERAL (SELECT unnest(range(0, len(toks) - 7)) AS i) r
    ), f AS (
      SELECT fp, MIN(doc_id * 1048576 + pos) AS min_ord FROM g
      GROUP BY 1 HAVING COUNT(*) > 1
    ), red AS (
      SELECT g.doc_id, g.pos FROM g JOIN f USING (fp)
      WHERE g.doc_id * 1048576 + g.pos > f.min_ord
    ), isl AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL OR pos - lag(pos) OVER w > 16
                  THEN 1 ELSE 0 END AS brk
      FROM red WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), grp AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM isl
    ), sp AS (
      SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 8 AS span_end
      FROM grp GROUP BY doc_id, island
    ), qual AS (
      SELECT doc_id, span_start, span_end FROM sp
      WHERE span_end - span_start >= 50
    )
"""


@register(
    "exact_substring_spans",
    _SUBSTR_SPAN_CTES
    + """
    SELECT doc_id, CAST(span_start AS BIGINT) AS span_start,
           CAST(span_end AS BIGINT) AS span_end,
           CAST(span_end - span_start AS BIGINT) AS span_len
    FROM qual
    """,
)
def exact_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r12 (r11 verdict ask #4): exact duplicated-SUBSTRING spans via
    positional k-gram fingerprint chains with gap stitching — the
    practical distributed tier of Lee et al.'s suffix-array substring
    dedup (arXiv:2107.06499), which the interval-union
    ``dup_span_coverage`` only approximates as a coverage FRACTION: this
    operator emits the spans themselves (keep-one semantics: the
    corpus-wide first occurrence of a duplicated substring is not
    flagged), and chain stitching merges a long duplicated span across
    internal edits of <= gap tokens, which no fixed-n-gram coverage
    form can do.  Parameters: k=8-token grams, gap=8, min_span=50 (the
    Lee et al. operating point).  Scale: fingerprint first-occurrence
    is ONE hash aggregate (min of an encoded (doc, pos) ordinal —
    skew-immune where a row_number window would serialize the hottest
    boilerplate gram); the island merge windows are bounded by document
    length.  See operators/dedup.py:duplicate_spans."""
    from .operators.dedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, k=8, min_span=50, gap=8)


@register(
    "exact_substring_dedup",
    _SUBSTR_SPAN_CTES
    + """
    , spl AS (
      SELECT doc_id, list(struct_pack(s := span_start, e := span_end)) AS spns
      FROM qual GROUP BY doc_id
    ), alltoks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE text IS NOT NULL
    ), keptt AS (
      SELECT a.doc_id, a.toks,
             list_filter(a.toks, (x, i) -> spns IS NULL OR
               len(list_filter(spns, s -> i - 1 >= s.s AND i - 1 < s.e)) = 0)
               AS kept
      FROM alltoks a LEFT JOIN spl USING (doc_id)
    )
    SELECT doc_id,
           -- a fully-removed doc: DuckDB's array_to_string([]) is NULL,
           -- Spark's array_join([]) is '' — normalize to ''
           COALESCE(array_to_string(kept, ' '), '') AS clean_text,
           CAST(len(toks) - len(kept) AS BIGINT) AS n_removed
    FROM keptt
    """,
)
def exact_substring_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r12 (r11 verdict ask #4, the done-criterion form): span
    REMOVAL — every token covered by a >= 50-token duplicated span is
    dropped, the corpus-wide first occurrence survives (keep-one).  The
    removal itself is a narrow projection (per-doc span array via one
    aggregate + left join; token filtering is a nested higher-order
    filter/exists — no explode of the token array, no Python), so at
    100 TB the cost is the fingerprint aggregate + one doc-keyed join,
    both linear.  Planted-span recall (every >= 50-token duplicated
    span dropped, internal-edit stitching included) is pytest-pinned;
    the 1M-doc A/B vs dup_span_coverage is in SCALE.md.  See
    operators/dedup.py:remove_duplicate_spans."""
    from .operators.dedup import remove_duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return remove_duplicate_spans(docs, k=8, min_span=50, gap=8)


@register(
    "corpus_curation_pipeline_spans",
    _SUBSTR_SPAN_CTES
    + """
    , spl AS (
      SELECT doc_id, list(struct_pack(s := span_start, e := span_end)) AS spns
      FROM qual GROUP BY doc_id
    ), alltoks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE text IS NOT NULL
    ), clean AS (
      SELECT a.doc_id,
             COALESCE(array_to_string(
               list_filter(a.toks, (x, i) -> spns IS NULL OR
                 len(list_filter(spns, s -> i - 1 >= s.s AND i - 1 < s.e)) = 0),
               ' '), '') AS text
      FROM alltoks a LEFT JOIN spl USING (doc_id)
    ), scored AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_dis
      FROM clean WHERE text <> ''
    ), gated AS (
      SELECT doc_id, text, n_tok FROM scored
      WHERE LEAST(1.0, n_tok / 50.0) * 0.5 + (n_dis / n_tok) * 0.3
            + (CASE WHEN n_tok BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.2
            >= 0.5
    ), deduped AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens
      FROM gated
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
        ORDER BY doc_id) = 1
    )
    SELECT doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
           CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
            - n_tokens) // 10000 AS BIGINT) AS shard_id
    FROM deduped
    """,
)
def corpus_curation_pipeline_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13 (r12 verdict ask #7): the curation flagship with
    exact-substring SPAN removal composed in FRONT — span dedup runs
    BEFORE document-level dedup in real pipelines (Lee et al.
    arXiv:2107.06499 §5: removing duplicated substrings first changes
    which documents survive the downstream gates), and until this row
    the composition was unproven.  One fused plan: span removal
    (operators/dedup.py:remove_duplicate_spans — fingerprint aggregate
    + one doc-keyed join, the clean_text projection) -> drop
    fully-deduplicated docs (empty clean_text; both engines skip the
    empty-string tokenize edge identically) -> quality gate (score >=
    0.5 over the CLEANED text, so a doc whose padding was duplicated
    boilerplate is now judged on what remains) -> md5-fingerprint exact
    dedup keep-first -> token-budget shard assignment.  Catalyst fuses
    the stages up to the survivor set, which is pinned once
    (localCheckpoint) because the shard stage consumes it three times
    (eager bucket-span bounds + the two-pass prefix sum).  Scale is
    the sum of its parts, each audited separately: two linear scans +
    one fingerprint aggregate (spans), then the flagship pipeline's
    fingerprint-keyed shuffle; nothing quadratic, no raw-text shuffle
    beyond the span stage's own."""
    from .operators.text import token_budget_shards

    docs = load_table(spark, sf_dir, "documents")
    # Pin the survivor set (r15 optimization): token_budget_shards derives
    # its bucket span from an EAGER bounds aggregate over its input, and
    # its two-pass prefix sum references the input twice more — unpinned,
    # the whole span-removal + gate + dedup prefix executed three times
    # per run (10.2 s -> 4.9 s at sf0.1, outputs exceptAll-equal).
    deduped = build_survivor_set(docs).localCheckpoint(eager=False)
    return token_budget_shards(deduped, budget=10_000)


@register(
    "bpe_merge_pair_counts",
    """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS freq FROM words WHERE len(w) >= 2 GROUP BY w
    ), pairs AS (
      SELECT substr(w, i, 1) AS left_sym, substr(w, i + 1, 1) AS right_sym,
             freq
      FROM vocab, LATERAL (SELECT unnest(range(1, len(w))) AS i) r
    )
    SELECT left_sym, right_sym, CAST(SUM(freq) AS BIGINT) AS pair_count
    FROM pairs GROUP BY 1, 2
    ORDER BY pair_count DESC, left_sym, right_sym LIMIT 50
    """,
)
def bpe_merge_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: adjacent symbol-pair frequencies — the inner statistic of
    one BPE tokenizer-TRAINING iteration (Sennrich et al. 2016; the
    registered ``bpe_token_count`` only applies a tokenizer, this is the
    operator that builds one).  The scale story is the standard trainer
    factoring the operator encodes (operators/text.py:bpe_pair_counts):
    the corpus collapses to the word-frequency table first — the ONLY
    corpus-sized shuffle — and pair explosion runs per DISTINCT word
    weighted by frequency, so counting is vocabulary-sized work at any
    corpus size.  Top-50 with the total (count DESC, left, right) order
    a merge-table builder consumes; the length >= 2 filter is applied
    identically in both engines (Spark's sequence(1, 0) would DESCEND
    rather than return empty — the cross-engine trap)."""
    from .operators.text import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(docs, top_k=50)


# The two-iteration BPE merge-learning pipeline as shared CTEs: word
# frequencies (length >= 2), char symbols, pair counts -> top-1 merge t1,
# greedy re-segmentation (delimiter-aware list_reduce fold), recount ->
# top-1 merge t2.  Prefix of both the merge-table and the segmentation
# oracle.
_BPE_LEARN_CTES = """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS freq FROM words WHERE len(w) >= 2 GROUP BY w
    ), chars AS (
      SELECT w, freq,
             list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms
      FROM vocab
    ), p1 AS (
      SELECT p.l AS l, p.r AS r, SUM(freq) AS c
      FROM chars, LATERAL (
        SELECT unnest(list_transform(range(1, len(syms)),
               i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p)
      GROUP BY 1, 2
    ), t1 AS (
      SELECT l, r, c FROM p1 ORDER BY c DESC, l, r LIMIT 1
    ), seg2 AS (
      SELECT freq,
             string_split(
               list_reduce(syms, (acc, x) ->
                 CASE WHEN (acc = t1.l OR ends_with(acc, '|' || t1.l))
                           AND x = t1.r
                      THEN acc || t1.r
                      ELSE acc || '|' || x END), '|') AS syms2
      FROM chars, t1
    ), p2 AS (
      SELECT p.l AS l, p.r AS r, SUM(freq) AS c
      FROM seg2, LATERAL (
        SELECT unnest(list_transform(range(1, len(syms2)),
               i -> struct_pack(l := syms2[i], r := syms2[i + 1]))) AS p)
      WHERE len(syms2) >= 2
      GROUP BY 1, 2
    ), t2 AS (
      SELECT l, r, c FROM p2 ORDER BY c DESC, l, r LIMIT 1
    )"""


def _bpe_learn_ctes_n(n_merges: int) -> str:
    """Generate the n-iteration BPE merge-learning CTE chain (the
    _BPE_LEARN_CTES pattern unrolled programmatically — the
    _PAGERANK_ITER convention): seg1 = char symbols of the weighted
    vocabulary, then per merge k: pair counts p{k} over seg{k}, top-1
    merge t{k}, greedy delimiter-aware re-segmentation seg{k+1}."""
    # seg{k} is referenced TWICE per level (by p{k} and seg{k+1}), so
    # DuckDB's default CTE inlining would copy the chain exponentially —
    # 2^16 base scans blew the fd limit.  MATERIALIZED pins each stage to
    # one evaluation, which is also what the Spark loop does (the symbol
    # table is a concrete DataFrame per iteration).
    parts = [
        """
    WITH words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, COUNT(*) AS freq FROM words WHERE len(w) >= 2 GROUP BY w
    ), seg1 AS MATERIALIZED (
      SELECT freq,
             list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)) AS syms
      FROM vocab
    )"""
    ]
    for k in range(1, n_merges + 1):
        parts.append(
            f""", p{k} AS (
      SELECT p.l AS l, p.r AS r, SUM(freq) AS c
      FROM seg{k}, LATERAL (
        SELECT unnest(list_transform(range(1, len(syms)),
               i -> struct_pack(l := syms[i], r := syms[i + 1]))) AS p)
      WHERE len(syms) >= 2
      GROUP BY 1, 2
    ), t{k} AS MATERIALIZED (
      SELECT l, r, c FROM p{k} ORDER BY c DESC, l, r LIMIT 1
    )"""
        )
        if k < n_merges:
            parts.append(
                f""", seg{k + 1} AS MATERIALIZED (
      SELECT freq,
             string_split(
               list_reduce(syms, (acc, x) ->
                 CASE WHEN (acc = t{k}.l OR ends_with(acc, '|' || t{k}.l))
                           AND x = t{k}.r
                      THEN acc || t{k}.r
                      ELSE acc || '|' || x END), '|') AS syms
      FROM seg{k}, t{k})"""
            )
    return "".join(parts)


@register(
    "bpe_learned_merges16",
    _bpe_learn_ctes_n(16)
    + "\n    "
    + "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym,"
        f" CAST(c AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, 17)
    ),
)
def bpe_learned_merges16_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r14 (r13 verdict ask #4): the BPE trainer at a REAL merge
    budget — 16 learned merges, the at-scale configuration row (the
    ``pq_codebook_trained_gemm`` precedent: when an operator's honest
    production shape is bigger than its minimal oracle-expressible
    unroll, the bigger shape gets its own driver row).  Same loop as
    ``bpe_learned_merges`` (shared code), now exercising the lineage
    checkpoint the r13 docstring only promised — and MEASURING it
    corrected the guidance: nested-fold execution turns superlinear
    past depth ~5 (22.7 s at depth 7 vs 0.7 s flat), so the policy is
    re-persist every 4 merges, not the promised ~8
    (tools/bpe_deep_probe.py, SCALE.md).  Oracle: the same
    16 iterations unrolled programmatically as DuckDB CTEs
    (_bpe_learn_ctes_n — the _PAGERANK_ITER convention), every merge
    decision value-hashed.  Assumes the corpus supports 16 merges
    (true for the fixtures; the Spark loop would stop early on
    exhaustion while the SQL emits empty t{k} rows — a row-count
    mismatch, i.e. loud)."""
    from .operators.text import bpe_learned_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learned_merges(docs, n_merges=16, repersist_every=4)


@register(
    "bpe_learned_merges64",
    _bpe_learn_ctes_n(64)
    + "\n    "
    + "\n    UNION ALL\n    ".join(
        f"SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym,"
        f" CAST(c AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, 65)
    ),
)
def bpe_learned_merges64_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r15 (r14 verdict ask #8): the BPE trainer at a PRODUCTION
    merge budget — 64 learned merges, the depth the r14 deep probe
    certified runs flat per-iteration under the corrected
    repersist-every-4 lineage policy (tools/bpe_deep_probe.py,
    SCALE.md).  Measured at sf0.01: 64 Spark iterations in ~59 s
    (~0.9 s/iteration, matching the probe's 0.5-0.9 s band — no
    superlinear blowup), DuckDB's 64-level MATERIALIZED CTE chain in
    ~1.1 s, and the fixture vocabulary is nowhere near exhaustion at
    depth 64 (merge 64 still carries pair_count ~900).  Every one of
    the 64 merge decisions value-hashes cross-engine — the same
    shared-fold argument as the 2- and 16-merge rows, now at the
    budget a real tokenizer-training pipeline would submit."""
    from .operators.text import bpe_learned_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learned_merges(docs, n_merges=64, repersist_every=4)


@register(
    "bpe_learned_merges",
    _BPE_LEARN_CTES
    + """
    SELECT 1 AS merge_rank, l AS left_sym, r AS right_sym,
           CAST(c AS BIGINT) AS pair_count FROM t1
    UNION ALL
    SELECT 2, l, r, CAST(c AS BIGINT) FROM t2
    """,
)
def bpe_learned_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: BPE tokenizer training ITERATED — the first two learned
    merge rules over the documents corpus, i.e. the actual training
    loop (count pairs -> adopt top pair -> re-segment -> recount), not
    just one iteration's statistic (``bpe_merge_pair_counts``).  Merge
    application is a left-to-right greedy fold over each distinct
    word's delimited symbol string, expressed with the SAME fold in
    both engines (F.aggregate / list_reduce over identical strings —
    the delimiter-aware last-symbol test gives non-overlapping leftmost
    semantics and stops a just-merged ``l||r`` from re-matching ``l``),
    so every merge decision value-hashes.  Each iteration is
    vocabulary-sized work; the only driver round-trip is the 1-row top
    pair (a parameter, the pinned-centroid convention).  The fixed
    2-merge unroll keeps the run oracle-expressible — the PQ-trainer /
    PageRank / LPA pin-the-iteration convention.  See
    operators/text.py:bpe_learned_merges."""
    from .operators.text import bpe_learned_merges

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learned_merges(docs, n_merges=2)


@register(
    "bpe_segment_counts",
    _BPE_LEARN_CTES
    + """
    , dwords AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ), sv AS (
      SELECT DISTINCT w FROM dwords
    ), svchars AS (
      SELECT w, list_transform(range(1, len(w) + 1), i -> substr(w, i, 1))
               AS syms
      FROM sv
    ), sv2 AS (
      SELECT w,
             string_split(
               list_reduce(syms, (acc, x) ->
                 CASE WHEN (acc = t1.l OR ends_with(acc, '|' || t1.l))
                           AND x = t1.r
                      THEN acc || t1.r
                      ELSE acc || '|' || x END), '|') AS syms2
      FROM svchars, t1
    ), sv3 AS (
      SELECT w,
             CAST(len(string_split(
               list_reduce(syms2, (acc, x) ->
                 CASE WHEN (acc = t2.l OR ends_with(acc, '|' || t2.l))
                           AND x = t2.r
                      THEN acc || t2.r
                      ELSE acc || '|' || x END), '|')) AS BIGINT) AS w_syms
      FROM sv2, t2
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(w_syms) AS BIGINT) AS n_symbols
    FROM dwords JOIN sv3 USING (w)
    GROUP BY doc_id
    """,
)
def bpe_segment_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: APPLY the learned tokenizer — segment every document
    under the two merges ``bpe_learned_merges`` trains and emit per-doc
    (n_words, n_symbols), the "how many tokens is this corpus under OUR
    tokenizer" number that drives token budgets, packing, and shard
    sizing.  Train -> apply is the full tokenizer loop under one
    value-hash: the merge table is learned inside the query (1-row
    driver collects per merge, the parameter convention), then
    segmentation runs once per DISTINCT word (same greedy
    delimiter-aware fold as training) and documents join their words
    back against the vocabulary-sized (word -> symbol count) table —
    re-segmenting every occurrence would redo the fold corpus-many
    times.  Single-char words pass through as one symbol (the fold's
    seed).  See operators/text.py:bpe_segment_counts."""
    from .operators.text import bpe_learned_merges, bpe_segment_counts

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learned_merges(docs, n_merges=2).collect()
    ]
    return bpe_segment_counts(docs, merges)


@register(
    "bpe_compression_by_source",
    _BPE_LEARN_CTES
    + """
    , dwords AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ), sv AS (
      SELECT DISTINCT w FROM dwords
    ), svchars AS (
      SELECT w, list_transform(range(1, len(w) + 1), i -> substr(w, i, 1))
               AS syms
      FROM sv
    ), sv2 AS (
      SELECT w,
             string_split(
               list_reduce(syms, (acc, x) ->
                 CASE WHEN (acc = t1.l OR ends_with(acc, '|' || t1.l))
                           AND x = t1.r
                      THEN acc || t1.r
                      ELSE acc || '|' || x END), '|') AS syms2
      FROM svchars, t1
    ), sv3 AS (
      SELECT w, CAST(len(w) AS BIGINT) AS w_chars,
             CAST(len(string_split(
               list_reduce(syms2, (acc, x) ->
                 CASE WHEN (acc = t2.l OR ends_with(acc, '|' || t2.l))
                           AND x = t2.r
                      THEN acc || t2.r
                      ELSE acc || '|' || x END), '|')) AS BIGINT) AS w_syms
      FROM sv2, t2
    )
    SELECT d.source,
           CAST(SUM(s.w_chars) AS BIGINT) AS n_chars,
           CAST(SUM(s.w_syms) AS BIGINT) AS n_symbols,
           CAST(SUM(s.w_chars) * 1000000 // SUM(s.w_syms) AS BIGINT)
             AS chars_per_symbol_ppm
    FROM dwords dw
    JOIN sv3 s USING (w)
    JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def bpe_compression_by_source_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: per-SOURCE compression under the corpus's own learned
    tokenizer — chars per emitted symbol, exact ppm (integer
    cross-multiply).  The data-quality read: a source whose text
    compresses poorly under merges learned from the whole corpus is
    distributionally unusual (noise, another language, machine junk) —
    the same signal DSIR/KL rows estimate with explicit LMs, here as a
    byproduct of tokenizer training (Gopher's compression-filter
    heuristic).  Reuses the segmentation factoring: distinct words
    segment once, the per-source rollup is one broadcast-joinable
    aggregate over (doc word -> symbol count)."""
    from .operators.text import bpe_learned_merges, bpe_segment_counts

    docs = load_table(spark, sf_dir, "documents")
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_learned_merges(docs, n_merges=2).collect()
    ]
    words_all = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vs = words_all.select("w").distinct().select(
        "w",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("syms"),
    )
    for lv, rv in merges:
        l, r = F.lit(lv), F.lit(rv)
        folded = F.aggregate(
            F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
            F.element_at("syms", 1),
            lambda acc, x: F.when(
                ((acc == l) | acc.endswith(F.concat(F.lit("|"), l)))
                & (x == r),
                F.concat(acc, r),
            ).otherwise(F.concat(acc, F.lit("|"), x)),
        )
        vs = vs.select("w", F.split(folded, "[|]").alias("syms"))
    counts = vs.select(
        "w",
        F.length("w").cast("long").alias("w_chars"),
        F.size("syms").cast("long").alias("w_syms"),
    )
    return (
        words_all.join(counts, "w")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.sum("w_chars").cast("long").alias("n_chars"),
            F.sum("w_syms").cast("long").alias("n_symbols"),
        )
        .select(
            "source",
            "n_chars",
            "n_symbols",
            F.expr("n_chars * 1000000 DIV n_symbols").alias(
                "chars_per_symbol_ppm"
            ),
        )
    )


@register(
    "inverted_index_gaps",
    """
    WITH tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id, term FROM tok0 WHERE term <> ''
    ), post AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
             list(doc_id ORDER BY doc_id) AS ids
      FROM tok GROUP BY term
    )
    SELECT term, df,
           array_to_string(list_transform(ids[1:128],
             (x, i) -> CAST(x - CASE WHEN i = 1 THEN 0 ELSE ids[i - 1] END
                            AS VARCHAR)), ',') AS gap_list
    FROM post
    """,
)
def inverted_index_gaps_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: inverted-index build with DELTA-ENCODED posting lists
    (gap lists — the storage form every IR engine ships, Manning et al.
    IIR ch. 5) — the materialized-index complement to the registered
    BM25/TF-IDF rows, which re-derive postings per query.  One
    term-keyed shuffle after a per-doc DISTINCT; posting lists CAP at
    128 ids while df keeps the true count — the stopword guard: a term
    in every document would otherwise collect a corpus-sized array onto
    one reducer (`_cap_postings`' failure mode in storage form).  Gaps
    emit as a comma-joined string from the SORTED id array (first
    element = smallest doc id, then deltas), so every value is
    deterministic and the whole index value-hashes cross-engine.  See
    operators/text.py:inverted_index_postings."""
    from .operators.text import inverted_index_postings

    docs = load_table(spark, sf_dir, "documents")
    return inverted_index_postings(docs, max_postings=128)


@register(
    "event_key_skew_profile",
    """
    WITH c AS (
      SELECT user_id AS key_value, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ), t AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total_rows FROM events
    )
    SELECT key_value, cnt, total_rows,
           cnt * 1000000 // total_rows AS share_ppm,
           cnt * 32 > total_rows AS needs_salt
    FROM c, t
    ORDER BY cnt DESC, key_value LIMIT 20
    """,
)
def event_key_skew_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r13: shuffle-key skew reconnaissance over the events join key
    (user_id) — the measurement that decides between plain shuffle,
    broadcast, and salted join BEFORE a 1000-executor stage hits the
    straggler (the decision ``salted_join_revenue`` hard-codes, made
    data-driven; at 100 TB you run this at sample or full scale as a
    planning pass).  Top-20 heavy keys with exact row count, exact-ppm
    corpus share (integer cross-multiply, no float division), and the
    ``needs_salt`` straggler predicate: key count x 32-way parallelism
    > total rows, i.e. this one key outweighs a fair reducer slice.
    One hash aggregate whose map-side partial combine absorbs exactly
    the skew being measured (counting a hot key is cheap even when
    joining on it is not) + a broadcast 1-row total.  See
    operators/aggregates.py:key_skew_profile."""
    from .operators.aggregates import key_skew_profile

    ev = load_table(spark, sf_dir, "events")
    return key_skew_profile(ev, "user_id", top_k=20, parallelism=32)


@register(
    "inverted_index_sharded",
    """
    WITH tok0 AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tok AS (
      SELECT DISTINCT doc_id, term FROM tok0 WHERE term <> ''
    ), sh AS (
      SELECT doc_id, term,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 4 AS dsh
      FROM tok
    ), pshard AS (
      SELECT term, dsh, CAST(COUNT(*) AS BIGINT) AS df_s,
             (list(doc_id ORDER BY doc_id))[1:128] AS ids_s
      FROM sh GROUP BY term, dsh
    ), merged AS (
      SELECT term,
             CAST(SUM(df_s) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS shards_with_term,
             (list_sort(flatten(list(ids_s))))[1:128] AS ids
      FROM pshard GROUP BY term
    )
    SELECT CAST(('0x' || substr(md5(substr(term, 1, 2)), 1, 8))
                AS BIGINT) % 4 AS shard,
           term, df, shards_with_term,
           array_to_string(list_transform(ids,
             (x, i) -> CAST(x - CASE WHEN i = 1 THEN 0 ELSE ids[i - 1] END
                            AS VARCHAR)), ',') AS gap_list
    FROM merged
    """,
)
def inverted_index_sharded_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r14 (r13 verdict ask #8): the SHARDED inverted-index build —
    per-doc-shard capped posting lists (md5(doc_id) % 4) merged per term
    into the same capped gap-encoded index ``inverted_index_gaps``
    builds unsharded, plus the serving shard key (md5 of the 2-char
    term prefix % 4, computable by a query router from the term alone)
    and per-term shard-coverage observability.  The merge exactness —
    a per-shard cap of 128 composes into the true global first-128 —
    is proven twice: the twin-equality pytest against the unsharded
    build, and this oracle row where DuckDB derives shards, caps, and
    merge independently.  The hot-term reducer's load divides by the
    doc-shard count (which scales with the cluster — the unsharded hot
    reducer does not) and the merge stage handles only (<= cap)-sized
    lists; probe at 1M docs / 3000-df terms: 1.6x the unsharded build's
    wall-clock for the divided-reducer guarantee
    (tools/invindex_scale_probe.py).  See
    operators/text.py:inverted_index_sharded."""
    from .operators.text import inverted_index_sharded

    docs = load_table(spark, sf_dir, "documents")
    return inverted_index_sharded(
        docs, n_doc_shards=4, n_term_shards=4, max_postings=128
    )


_CURATION_E2E_ORACLE = (
    # span removal + quality gate + fingerprint dedup: the
    # corpus_curation_pipeline_spans prefix, with text carried forward
    # (fpd keeps the cleaned text for the LSH / split stages below).
    # WITH RECURSIVE because the two closure stages (reach2 / reach3)
    # sit later in the same chain.
    _SUBSTR_SPAN_CTES.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    + """
    , spl AS (
      SELECT doc_id, list(struct_pack(s := span_start, e := span_end)) AS spns
      FROM qual GROUP BY doc_id
    ), alltoks AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      WHERE text IS NOT NULL
    ), cleanp AS MATERIALIZED (
      SELECT a.doc_id,
             COALESCE(array_to_string(
               list_filter(a.toks, (x, i) -> spns IS NULL OR
                 len(list_filter(spns, s -> i - 1 >= s.s AND i - 1 < s.e)) = 0),
               ' '), '') AS text
      FROM alltoks a LEFT JOIN spl USING (doc_id)
    ), scoredp AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_dis
      FROM cleanp WHERE text <> ''
    ), gatedp AS MATERIALIZED (
      SELECT doc_id, text FROM scoredp
      WHERE LEAST(1.0, n_tok / 50.0) * 0.5 + (n_dis / n_tok) * 0.3
            + (CASE WHEN n_tok BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.2
            >= 0.5
    ), fpd AS MATERIALIZED (
      SELECT doc_id, text FROM gatedp
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
        ORDER BY doc_id) = 1
    ), toks2 AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM fpd
    ), sh2 AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks2, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
    ), hashes2 AS (
      SELECT doc_id, seed,
             min(substr(md5(CAST(seed AS VARCHAR) || ':' || shingle), 1, 16)) AS mh
      FROM sh2, LATERAL (SELECT unnest(range(0, 16)) AS seed) s
      GROUP BY doc_id, seed
    ), bands2 AS MATERIALIZED (
      SELECT doc_id, seed // 4 AS band,
             md5(string_agg(mh, '|' ORDER BY seed)) AS bucket
      FROM hashes2 GROUP BY doc_id, seed // 4
    ), cands2 AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands2 a JOIN bands2 b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ), sizes2 AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n_sh FROM sh2 GROUP BY doc_id
    ), common2 AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS common
      FROM cands2 c
      JOIN sh2 a ON a.doc_id = c.doc_a
      JOIN sh2 b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ), pairs2 AS (
      SELECT doc_a, doc_b FROM common2
      JOIN sizes2 sa ON sa.doc_id = doc_a
      JOIN sizes2 sb ON sb.doc_id = doc_b
      WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.4
    ), edges2 AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pairs2
      UNION
      SELECT doc_b, doc_a FROM pairs2
    ), reach2(node, comp) AS (
      SELECT a, a FROM edges2
      UNION
      SELECT e.a, r.comp FROM edges2 e JOIN reach2 r ON r.node = e.b
    ), comp2 AS MATERIALIZED (
      SELECT node AS doc_id, MIN(comp) AS component FROM reach2 GROUP BY node
    ), allc2 AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
      FROM fpd d LEFT JOIN comp2 c ON c.doc_id = d.doc_id
    ), q2 AS (
      SELECT doc_id,
             ROUND(LEAST(1.0, n_tok / 50.0) * 0.5
                   + (n_dis / n_tok) * 0.3
                   + (CASE WHEN n_tok BETWEEN 10 AND 5000 THEN 1.0 ELSE 0.0 END) * 0.2,
                   6) AS quality_score
      FROM (SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_distinct(string_split(text, ' '))) AS n_dis
            FROM fpd)
    ), ranked2 AS (
      SELECT allc2.doc_id,
             row_number() OVER (PARTITION BY allc2.component
                                ORDER BY q2.quality_score DESC, allc2.doc_id) AS rn
      FROM allc2 JOIN q2 ON q2.doc_id = allc2.doc_id
    ), surv AS MATERIALIZED (
      SELECT f.doc_id, f.text FROM fpd f
      JOIN ranked2 k ON k.doc_id = f.doc_id AND k.rn = 1
    ), sh3 AS MATERIALIZED (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM surv) s3,
           LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r
    ), cold3 AS (
      SELECT shingle FROM sh3 GROUP BY shingle HAVING COUNT(*) <= 50
    ), shc3 AS MATERIALIZED (
      SELECT sh3.doc_id, sh3.shingle FROM sh3 JOIN cold3 USING (shingle)
    ), sizes3 AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS n_sh FROM shc3 GROUP BY doc_id
    ), common3 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shc3 a JOIN shc3 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs3 AS (
      SELECT doc_a, doc_b FROM common3
      JOIN sizes3 sa ON sa.doc_id = doc_a
      JOIN sizes3 sb ON sb.doc_id = doc_b
      WHERE common * 1.0 / (sa.n_sh + sb.n_sh - common) >= 0.4
    ), edges3 AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pairs3
      UNION
      SELECT doc_b, doc_a FROM pairs3
    ), reach3(node, comp) AS (
      SELECT a, a FROM edges3
      UNION
      SELECT e.a, r.comp FROM edges3 e JOIN reach3 r ON r.node = e.b
    ), comp3 AS MATERIALIZED (
      SELECT node AS doc_id, MIN(comp) AS component FROM reach3 GROUP BY node
    ), allc3 AS (
      SELECT s.doc_id, s.text, COALESCE(c.component, s.doc_id) AS component
      FROM surv s LEFT JOIN comp3 c ON c.doc_id = s.doc_id
    ), splits AS (
      SELECT doc_id, text,
             CASE WHEN u < 0.8 THEN 'train'
                  WHEN u < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5('split:' || CAST(component AS VARCHAR)), 1, 13))
                    AS BIGINT) / 4503599627370496.0 AS u
        FROM allc3
      )
    ), toked AS (
      SELECT doc_id, split, len(string_split(text, ' ')) AS n_tokens FROM splits
    )
    SELECT doc_id, split, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(SUM(n_tokens) OVER wsh AS BIGINT) AS cum_tokens,
           CAST((SUM(n_tokens) OVER wsh - n_tokens) // 10000 AS BIGINT) AS shard_id
    FROM toked
    WINDOW wsh AS (PARTITION BY split ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
    """
)


@register("curation_e2e_composed", _CURATION_E2E_ORACLE)
def curation_e2e_composed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW r15 (r14 verdict ask #2): the SIX-STAGE curation pipeline a
    100 TB run would actually submit, as ONE registered job — span
    removal -> quality gate over the cleaned text -> md5-fingerprint
    exact dedup -> MinHash-LSH keep-best -> leakage-safe
    component-keyed train/val/test split (df-capped Jaccard, a
    DIFFERENT candidate tier than the LSH stage, so correlated docs the
    banded pass missed still co-locate) -> per-split token-budget
    shards.  Every stage was individually oracle-proven (exact_
    substring_dedup, corpus_curation_pipeline_spans, dedup_keep_best_
    lsh, leakage_safe_split, token_budget_shards); this row proves the
    COMPOSITION value-hashes end to end — which documents survive, the
    split each lands in, and its exact shard — against one fused DuckDB
    chain (two recursive closures under a single WITH RECURSIVE).
    Per-stage wall/shuffle accounting at probe scale:
    tools/curation_e2e_probe.py + SCALE.md.  See
    operators/dedup.py:curation_e2e."""
    from .operators.dedup import curation_e2e

    docs = load_table(spark, sf_dir, "documents")
    return curation_e2e(docs)

"""Corpus-preparation queries: the sampling / packing / vocabulary /
decontamination passes of a large-scale training-data pipeline, over the
`documents` table.

These are the stages that sit between per-document scoring
(queries/text.py) and near-dedup (queries/dedup.py) in a real data-mix
build: choose a per-language mixture (stratified sampling), concatenate
and chunk the survivors into fixed-token training sequences (packing),
build the corpus vocabulary (df/tf/idf), and strike training documents
that leak evaluation-set n-grams (decontamination). All four are pure
DataFrame plans — codegen'd expressions, broadcast joins for the tiny
sides, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_workers_spark.functions.determinism import sample_coin, sql_sample_coin
from kafka_workers_spark.operators.text import (
    shingle_stage,
    sql_word_shingles,
    tokenize_stage,
    tokens,
)
from kafka_workers_spark.queries import register
from kafka_workers_spark.sources.files import load_table

_TOKS_SQL = "string_split(text, ' ')"

# Deterministic per-document md5 coin — shared with pipeline.sample_stratified
# (functions/determinism.py) so query and pipeline can never drift.
_SAMPLE_BUCKET_SQL = sql_sample_coin("doc_id")


def _sample_bucket() -> Column:
    return sample_coin("doc_id")


PACK_BUDGET = 512  # tokens per training sequence


@register(
    "corpus_sample_pack",
    f"""
    WITH sampled AS (
      SELECT lang, doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
      WHERE {_SAMPLE_BUCKET_SQL} < CASE WHEN lang = 'en' THEN 75 ELSE 40 END
    ), packed AS (
      SELECT lang, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      FROM sampled
    )
    SELECT lang, doc_id, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS pack_offset
    FROM packed
    """,
    category="corpus",
    windowed=False,  # rotated out round 14 (cheap veteran; pytest holds the oracle)
)
def corpus_sample_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling + sequence packing in one pass.

    Sampling: a deterministic md5(doc_id) coin keeps 75% of English and
    40% of everything else — the hash-based mixture weighting every
    training-data build uses (reproducible across re-runs; no RNG state).
    Packing: survivors are concatenated per language in doc_id order and
    cut into 512-token sequences; a document's pack_id/pack_offset
    come from the exclusive running token sum, so documents straddle
    sequence boundaries exactly as concat-then-chunk tokenization does.

    Scale: the scan projects (lang, doc_id, n_tokens) only — the text
    payload never rides the window shuffle. PARTITION BY lang alone would
    serialize each language on one task at 100 TB; the production form
    packs within (lang, hash-shard) instead — same plan shape, boundaries
    approximate only at shard edges. The sampling filter is a pushed-down
    scan predicate with no shuffle at all.
    """
    d = load_table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", 75).otherwise(40)
    sampled = d.filter(_sample_bucket() < rate).select(
        "lang", "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    packed = sampled.withColumn("cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return packed.select(
        "lang",
        "doc_id",
        "n_tokens",
        F.expr(f"cum_before DIV {PACK_BUDGET}").alias("pack_id"),
        (F.col("cum_before") % PACK_BUDGET).alias("pack_offset"),
    )


@register(
    "corpus_vocab_df",
    f"""
    WITH toks AS (
      SELECT doc_id, UNNEST({_TOKS_SQL}) AS term FROM documents
    ), vocab AS (
      SELECT term,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq,
             COUNT(*) AS total_tf
      FROM toks GROUP BY term
    )
    SELECT term, doc_freq, total_tf,
           (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) + 1.0)
              / (doc_freq + 1.0) AS idf_ratio
    FROM vocab
    ORDER BY doc_freq DESC, term LIMIT 100
    """,
    category="corpus",
    windowed=False,  # rotated out round 9 — oracle-checked by tests/test_oracle_extra.py
)
def corpus_vocab_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: document frequency, total term frequency and the
    smoothed idf ratio (n_docs+1)/(df+1) for the top-100 terms by df.

    One explode → one hash aggregate (count-distinct handled by Catalyst's
    two-phase expand; partial aggregation still combines map-side), the
    corpus doc count broadcast as a 1-row cross join (scalar subquery in
    the oracle), and TakeOrderedAndProject for the top-k — per-partition
    heaps, no global sort shuffle. The ratio is one IEEE division over
    exact integers — correctly rounded, so it hashes identically across
    engines; ln() is NOT (libm last-ULP drift), so idf = ln(ratio) is left
    to the consumer (monotone — rankings are unchanged)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    vocab = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("doc_freq"), F.count("*").alias("total_tf")
    )
    n_docs = d.agg(F.count("*").alias("__n_docs"))
    return (
        vocab.crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            "doc_freq",
            "total_tf",
            ((F.col("__n_docs").cast("double") + 1.0) / (F.col("doc_freq") + 1.0)).alias("idf_ratio"),
        )
        .orderBy(F.desc("doc_freq"), F.asc("term"))
        .limit(100)
    )


_SHINGLE_N = 8
_SH8_SQL = sql_word_shingles(_TOKS_SQL, _SHINGLE_N)


@register(
    "corpus_contamination",
    f"""
    WITH sh AS (
      SELECT doc_id,
             UNNEST(list_distinct([substr(md5(s), 1, 16) FOR s IN {_SH8_SQL}])) AS h
      FROM documents
    ), eval_h AS (
      SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0
    ), scored AS (
      SELECT t.doc_id,
             COUNT(*) AS n_shingles,
             CAST(SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
      FROM (SELECT * FROM sh WHERE doc_id % 50 <> 0) t
      LEFT JOIN eval_h e ON t.h = e.h
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_shingles, n_shared,
           CAST(n_shared AS DOUBLE) / n_shingles AS contam_frac
    FROM scored WHERE n_shared > 0
    """,
    category="corpus",
)
def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag training documents sharing word
    8-grams with the held-out set (doc_id % 50 == 0 stands in for the
    benchmark corpus).

    The eval side collapses to a distinct set of 64-bit shingle digests —
    small by construction (benchmarks are tiny next to the corpus) — and
    broadcasts; the training side explodes shingles, hashes, and left-joins
    the broadcast with zero shuffle of corpus bytes. The one shuffle is the
    per-doc count aggregate over (doc_id, hit) pairs with map-side partial
    combine. This is the standard n-gram-overlap decontamination pass
    (8-gram granularity), shaped exactly like the production job.
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = shingle_stage(tokenize_stage(d), _SHINGLE_N, distinct=True)
    sh = staged.select(
        "doc_id", F.explode("shingles").alias("__s")
    ).select("doc_id", F.substring(F.md5("__s"), 1, 16).alias("h"))
    eval_h = (
        sh.filter(F.col("doc_id") % 50 == 0).select("h").distinct().withColumn("__hit", F.lit(1))
    )
    train = sh.filter(F.col("doc_id") % 50 != 0)
    scored = (
        train.join(F.broadcast(eval_h), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_shared"),
        )
    )
    return scored.filter(F.col("n_shared") > 0).select(
        "doc_id",
        "n_shingles",
        "n_shared",
        (F.col("n_shared").cast("double") / F.col("n_shingles")).alias("contam_frac"),
    )


_BLOOM_BITS = 1 << 23  # 8.4M bits: ~0.004 EXPECTED false positives across
# all ~500k probes even at sf0.1 (fill ratio ~0.01, FP ≈ fill^4 ≈ 8e-9),
# so the exact-oracle equality holds with margin at every test SF while
# keeping the sketch row (and its dense-array assembly) half the size
_BLOOM_HASHES = 4


@register(
    "corpus_decontaminate_bloom",
    f"""
    WITH sh AS (
      SELECT doc_id,
             UNNEST(list_distinct([substr(md5(s), 1, 16) FOR s IN {_SH8_SQL}])) AS h
      FROM documents
    ),
    eval_h AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
    hit AS (
      SELECT DISTINCT doc_id FROM sh
      WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM eval_h)
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM hit)
    """,
    category="corpus",
)
def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination against a STORED Bloom sketch of the eval union's
    shingle digests (pipeline.eval_digest_bloom →
    pipeline.decontaminate_with_bloom; functions/sketches.py bloom_build /
    bloom_probe): doc_id % 50 == 0 stands in for the benchmark corpus,
    its 8-gram digests land in one {_BLOOM_BITS}-bit sketch row, and the
    training side drops every document whose shingles probe positive.

    The oracle is the EXACT decontamination (the corpus_contamination
    join). That comparison is the operator's own guarantee, stated as a
    check: the Bloom has NO false negatives, so no contaminated document
    can survive (a hash-mismatch here would mean leakage — the failure
    the operator exists to prevent), and at {_BLOOM_BITS} bits for the
    test-scale eval set the false-positive odds per probe are ~1e-10, so
    the one-sided over-drop the docstring budgets for is absent and the
    outputs coincide exactly (verified at sf0.001/0.01/0.1). Production
    sizing keeps the same discipline: bits scale with eval cardinality
    to hold the over-drop rate, never the other way.

    Scale shape: the sketch is ONE 2 MB row broadcast to every probe
    task — the corpus pass never shuffles eval data, and the only
    shuffle is the per-doc hit aggregate (map-side combined). The exact
    path (corpus_contamination) broadcasts the full digest set instead;
    the sketch replaces it when the eval union outgrows a broadcast."""
    from kafka_workers_spark.pipeline import decontaminate_with_bloom, eval_digest_bloom

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = d.filter(F.col("doc_id") % 50 == 0)
    train = d.filter(F.col("doc_id") % 50 != 0)
    bloom = eval_digest_bloom(
        eval_docs, shingle_n=_SHINGLE_N, n_bits=_BLOOM_BITS, n_hashes=_BLOOM_HASHES
    )
    return decontaminate_with_bloom(
        train, bloom, shingle_n=_SHINGLE_N, max_shared=0
    ).select("doc_id")


_CMS_W = 64  # deliberately tight: collisions occur at test scale, so the
_CMS_D = 4   # min-over-depth logic is exercised, not just the happy path
# (the oracle replays the identical hashes, so colliding estimates match
#  bit for bit — the pairing of these constants with the SQL below is
#  intentional; change both together)


@register(
    "corpus_cms_token_counts",
    f"""
    WITH toks AS (
      SELECT UNNEST(list_filter({_TOKS_SQL}, t -> len(t) > 0)) AS tok
      FROM documents
    ),
    cells AS (
      SELECT ds.d * {_CMS_W}
               + CAST('0x' || substr(md5('cms' || ds.d || ':' || tok), 1, 15) AS BIGINT)
                 % {_CMS_W} AS cell,
             COUNT(*) AS n
      FROM toks CROSS JOIN (SELECT UNNEST(range({_CMS_D})) AS d) ds
      GROUP BY 1
    ),
    exact AS (SELECT tok, COUNT(*) AS exact_cnt FROM toks GROUP BY tok)
    SELECT e.tok, CAST(e.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(c.n) AS BIGINT) AS cms_count
    FROM exact e
    CROSS JOIN (SELECT UNNEST(range({_CMS_D})) AS d) ds
    JOIN cells c
      ON c.cell = ds.d * {_CMS_W}
               + CAST('0x' || substr(md5('cms' || ds.d || ':' || e.tok), 1, 15) AS BIGINT)
                 % {_CMS_W}
    GROUP BY e.tok, e.exact_cnt
    """,
    category="corpus",
    windowed=False,
)
def corpus_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build → point-probe chain
    (functions/sketches.py cms_build / cms_probe, Cormode &
    Muthukrishnan 2005): the corpus token stream folds into ONE
    {_CMS_W}×{_CMS_D} sketch row, then every distinct token is probed
    back against the stored sketch next to its exact count. The oracle
    replays the md5-prefix cell hashing, the cell-count aggregate, and
    the min-over-depth probe bit for bit — including collided cells
    (width {_CMS_W} is deliberately tight so collisions exist at test
    scale), so a wrong cell index, a dropped depth row, or a packing
    off-by-one all hash-mismatch. The estimate >= exact one-sided bound
    is additionally property-tested in tests/test_sketches.py.

    Scale shape (100 TB): the build is ONE map-side-combined hash
    aggregate whose shuffle carries at most depth × width partial rows
    per partition (never raw tokens); the probe is a single-row
    broadcast + row-local min over depth codegen'd lookups. The sketch
    is the frequency analog of the stored Bloom membership row
    (corpus_decontaminate_bloom) — probe-later and mergeable across
    runs by element-wise addition (cms_merge), where Misra-Gries
    (frequent_items) can only answer at build time."""
    from kafka_workers_spark.functions.sketches import cms_build, cms_probe

    d = load_table(spark, sf_dir, "documents").select("text")
    toks = d.select(
        F.explode(F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)).alias("tok")
    )
    exact = toks.groupBy("tok").agg(F.count("*").cast("bigint").alias("exact_cnt"))
    cms = cms_build(toks, "tok", width=_CMS_W, depth=_CMS_D)
    return cms_probe(exact, cms, "tok", out="cms_count").select(
        "tok", "exact_cnt", F.col("cms_count").cast("bigint").alias("cms_count")
    )


_UNIMAX_NUM, _UNIMAX_DEN = 4, 5  # budget = 4/5 of total corpus tokens
_UNIMAX_EPOCHS = 1
# (constants pair with the oracle SQL below — change them together; at the
#  testdata's lang shares this splits the strata into capped small langs
#  and an uncapped 'en', exercising BOTH waterfilling arms)


@register(
    "corpus_unimax_budget",
    f"""
    WITH counts AS (
      SELECT lang,
             CAST(SUM(len(list_filter(string_split(text, ' '), t -> len(t) > 0)))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    tot AS (SELECT COUNT(*) AS l, SUM(n_tokens) AS t FROM counts),
    ranked AS (
      SELECT lang, n_tokens, n_tokens * {_UNIMAX_EPOCHS} AS cap,
             ROW_NUMBER() OVER (ORDER BY n_tokens * {_UNIMAX_EPOCHS}, lang) AS k,
             SUM(n_tokens * {_UNIMAX_EPOCHS})
               OVER (ORDER BY n_tokens * {_UNIMAX_EPOCHS}, lang)
               - n_tokens * {_UNIMAX_EPOCHS} AS prefix
      FROM counts
    ),
    flagged AS (
      SELECT r.lang, r.n_tokens, r.cap, t.l,
             (t.t * {_UNIMAX_NUM}) // {_UNIMAX_DEN} AS b,
             CAST(r.cap AS HUGEINT) * (t.l - r.k + 1) + r.prefix
               <= (t.t * {_UNIMAX_NUM}) // {_UNIMAX_DEN} AS is_capped
      FROM ranked r CROSS JOIN tot t
    ),
    ct AS (
      SELECT COALESCE(SUM(CASE WHEN is_capped THEN cap END), 0) AS pm,
             COALESCE(SUM(CASE WHEN is_capped THEN 1 ELSE 0 END), 0) AS m
      FROM flagged
    )
    SELECT lang, n_tokens, CAST(cap AS BIGINT) AS cap, is_capped,
           CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
                ELSE (CAST(b AS DOUBLE) - CAST(pm AS DOUBLE))
                     / CAST(l - m AS DOUBLE) END AS alloc,
           CASE WHEN is_capped THEN CAST(cap AS DOUBLE)
                ELSE (CAST(b AS DOUBLE) - CAST(pm AS DOUBLE))
                     / CAST(l - m AS DOUBLE) END
             / CAST(n_tokens AS DOUBLE) AS epochs_used
    FROM flagged CROSS JOIN ct
    """,
    category="corpus",
    windowed=False,
)
def corpus_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax budget waterfilling (pipeline.unimax_allocation, Chung et
    al. ICLR 2023): per-lang token counts → epoch-capped budget split,
    with the budget the exact in-plan rational {_UNIMAX_NUM}/{_UNIMAX_DEN}
    of total corpus tokens. The oracle replays the count aggregate, the
    ascending-capacity ranking, the DECIMAL/HUGEINT capping predicate,
    and the two division floats (single IEEE ops over exact integers —
    bit-reproducible, the text_phrase_mining float discipline).

    Scale shape: the corpus-sized work is ONE map-side-combined count
    aggregate; every window/join below it runs over strata-count rows
    (a handful) and the totals ride one-row broadcasts — job-free."""
    from kafka_workers_spark.operators.text import tokens
    from kafka_workers_spark.pipeline import unimax_allocation

    d = load_table(spark, sf_dir, "documents").select("lang", "text")
    counts = (
        d.select(
            "lang",
            F.size(
                F.filter(tokens(F.col("text")), lambda t: F.length(t) > 0)
            ).alias("__nt"),
        )
        .groupBy("lang")
        .agg(F.sum("__nt").cast("bigint").alias("n_tokens"))
    )
    return unimax_allocation(
        counts,
        budget_fraction=(_UNIMAX_NUM, _UNIMAX_DEN),
        max_epochs=_UNIMAX_EPOCHS,
    ).select("lang", "n_tokens", "cap", "is_capped", "alloc", "epochs_used")


# ---------------------------------------------------------------------------
# KMV distinct-vocabulary sketch (bottom-k order statistics)
# ---------------------------------------------------------------------------

_KMV_K = 16  # testdata vocab is ~31 tokens/lang — k=16 saturates, exercising the (k-1)/U_(k) estimator arm under the oracle
_KMV_HEX = 13  # == functions.sketches.KMV_HEX_CHARS (asserted in tests)
_KMV_SPACE = float(16**_KMV_HEX)
_KMV_TOKS_SQL = "list_filter(string_split(lower(text), ' '), t -> len(t) > 0)"


@register(
    "corpus_kmv_vocab",
    f"""
    WITH toks AS (
      SELECT lang, UNNEST({_KMV_TOKS_SQL}) AS t FROM documents
    ),
    dh AS (SELECT DISTINCT lang, substr(md5(t), 1, {_KMV_HEX}) AS h FROM toks),
    ranked AS (
      SELECT lang, h, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rnk
      FROM dh
    ),
    sk AS (
      SELECT lang, list(h ORDER BY h) AS hashes
      FROM ranked WHERE rnk <= {_KMV_K} GROUP BY lang
    )
    SELECT lang,
           CAST(len(hashes) AS BIGINT) AS n_distinct_capped,
           CASE WHEN len(hashes) >= {_KMV_K} THEN hashes[{_KMV_K}] END AS kth_hash,
           CASE WHEN len(hashes) < {_KMV_K} THEN CAST(len(hashes) AS DOUBLE)
                ELSE CAST({_KMV_K - 1} AS DOUBLE)
                     / (CAST(('0x' || hashes[{_KMV_K}]) AS BIGINT)::DOUBLE / {_KMV_SPACE!r})
           END AS est_distinct
    FROM sk
    """,
    category="corpus",
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def corpus_kmv_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-vocabulary KMV sketch
    (functions.sketches.kmv_build/kmv_merge, Beyer et al. SIGMOD 2007):
    the engine builds per-(lang, doc-parity) shard sketches and MERGES
    them — merge-exactness (bottom-k of a union == bottom-k of the
    bottom-ks) means the whole-pass DuckDB oracle must hold bit for
    bit, so the shard-rollup chain is oracle-checked like the
    BM25/CMS families. The k-th minimum hash is exact hex (string
    surface); the distinct estimate is (k-1)/U_(k) with the 52-bit hash
    converting to double exactly — one IEEE division each engine, so
    the float column rides the oracle too (the phrase_scores float
    rule). Tokenization is lower + whitespace-split (NOT the LM
    normalization: keeping punctuation makes the vocabulary sketch
    sensitive to markup, which is the signal a corpus-profile wants)."""
    from kafka_workers_spark.functions.sketches import (
        KMV_HEX_CHARS,
        kmv_build,
        kmv_distinct_estimate,
        kmv_merge,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toks = d.select(
        "lang",
        (F.col("doc_id") % 2).alias("__parity"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: F.length(t) > 0)
        ).alias("__t"),
    )
    shards = kmv_build(toks, "__t", k=_KMV_K, group_cols=["lang", "__parity"]).drop(
        "__parity"
    )
    sk = kmv_merge(shards, group_cols=["lang"])
    assert KMV_HEX_CHARS == _KMV_HEX
    return sk.select(
        "lang",
        "n_distinct_capped",
        F.when(
            F.size("hashes") >= _KMV_K, F.element_at("hashes", _KMV_K)
        ).alias("kth_hash"),
        kmv_distinct_estimate("hashes", _KMV_K).alias("est_distinct"),
    )


# ---------------------------------------------------------------------------
# Nucleus (top-p mass) selection per language
# ---------------------------------------------------------------------------

_NUC_NUM, _NUC_DEN = 3, 5  # keep the top docs covering 3/5 of each lang's tokens
_NUC_TOKS_SQL = (
    "list_filter(string_split("
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),"
    " ' +', ' ', 'g')), ' '), t -> len(t) > 0)"
)


@register(
    "corpus_nucleus_tokens",
    f"""
    WITH toked AS (
      SELECT lang, doc_id, CAST(len({_NUC_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    tot AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS group_total
            FROM toked GROUP BY lang),
    ranked AS (
      SELECT lang, doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY n_tokens DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS mass_before
      FROM toked
    )
    SELECT r.lang, r.doc_id, r.n_tokens, r.mass_before, tot.group_total
    FROM ranked r JOIN tot ON tot.lang = r.lang
    WHERE r.mass_before::HUGEINT * {_NUC_DEN} < tot.group_total::HUGEINT * {_NUC_NUM}
    """,
    category="corpus",
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def corpus_nucleus_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language nucleus selection (pipeline.nucleus_select, the
    Holtzman et al. top-p cutoff applied to token budgeting): rank each
    language's documents by token count (id tiebreak) and keep the
    minimal prefix covering {_NUC_NUM}/{_NUC_DEN} of its token mass —
    the exact DECIMAL(38,0) predicate decides membership, so the kept
    set replays bit-for-bit in the window-function oracle. Tokens are
    the LM family's normalized non-empty whitespace tokens."""
    from kafka_workers_spark.operators.text import normalized
    from kafka_workers_spark.pipeline import nucleus_select

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    toked = d.select(
        "lang",
        "doc_id",
        F.size(
            F.filter(tokens(normalized(F.col("text"))), lambda t: F.length(t) > 0)
        ).cast("bigint").alias("n_tokens"),
    )
    return nucleus_select(
        toked, "n_tokens", p=(_NUC_NUM, _NUC_DEN), group_cols=["lang"]
    ).select("lang", "doc_id", "n_tokens", "mass_before", "group_total")


# ---------------------------------------------------------------------------
# Whole-document (no-straddle) packing — size-class 2-approximation
# ---------------------------------------------------------------------------


@register(
    "corpus_pack_whole",
    f"""
    WITH sized AS (
      SELECT lang, doc_id,
             CAST(len({_NUC_TOKS_SQL}) AS BIGINT) AS n_tokens
      FROM documents
      WHERE len({_NUC_TOKS_SQL}) BETWEEN 1 AND {PACK_BUDGET}
    ),
    classed AS (
      SELECT lang, doc_id, n_tokens,
             CAST({PACK_BUDGET} // n_tokens AS BIGINT) AS fit_class
      FROM sized
    ),
    ranked AS (
      SELECT lang, doc_id, n_tokens, fit_class,
             ROW_NUMBER() OVER (PARTITION BY lang, fit_class
                                ORDER BY n_tokens DESC, doc_id) - 1 AS rn
      FROM classed
    )
    SELECT lang, doc_id, n_tokens, fit_class,
           CAST(rn // fit_class AS BIGINT) AS bin_id,
           CAST(rn % fit_class AS BIGINT) AS bin_slot
    FROM ranked
    """,
    category="corpus",
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def corpus_pack_whole(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-straddle packing per language (pipeline.pack_documents_whole):
    whole documents into <= PACK_BUDGET-token bins via the closed-form
    size-class rule — bins never overflow, full bins are > half full
    (the 2-approximation), one window per (lang, class), fully
    parallel. The complement of corpus_sample_pack's concat-then-chunk;
    documents longer than the budget are filtered here (production
    chunks them first). The oracle replays classes, ranks, and bin
    arithmetic."""
    from kafka_workers_spark.operators.text import normalized
    from kafka_workers_spark.pipeline import pack_documents_whole

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    sized = d.select(
        "lang",
        "doc_id",
        F.size(
            F.filter(tokens(normalized(F.col("text"))), lambda t: F.length(t) > 0)
        ).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens").between(1, PACK_BUDGET))
    return pack_documents_whole(
        sized, "n_tokens", budget=PACK_BUDGET, group_cols=["lang"]
    )


# ---------------------------------------------------------------------------
# Latest-wins upsert (SCD1 merge) — snapshot maintenance
# ---------------------------------------------------------------------------


@register(
    "corpus_merge_upsert",
    """
    WITH base AS (
      SELECT doc_id, CAST(0 AS BIGINT) AS version, text, lang FROM documents
    ),
    updates AS (
      SELECT doc_id, CAST(1 AS BIGINT) AS version,
             'rev1 ' || text AS text, lang
      FROM documents WHERE doc_id % 5 = 0
    ),
    unioned AS (SELECT * FROM base UNION ALL SELECT * FROM updates),
    best AS (
      SELECT doc_id, MAX({'version': version, 'text': text, 'lang': lang}) AS b
      FROM unioned GROUP BY doc_id
    )
    SELECT doc_id, b['version'] AS version, b['text'] AS text, b['lang'] AS lang
    FROM best
    """,
    category="corpus",
    windowed=False,  # new round 8 — EXTRA until rotated in
)
def corpus_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins snapshot merge (pipeline.merge_upsert): version-1
    revisions of every fifth document replace their version-0 rows, the
    rest pass through — one max(struct) hash aggregate, no window. The
    oracle replays the same struct-max resolution."""
    from kafka_workers_spark.pipeline import merge_upsert

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = d.select("doc_id", F.lit(0).cast("bigint").alias("version"), "text", "lang")
    updates = d.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        F.lit(1).cast("bigint").alias("version"),
        F.concat(F.lit("rev1 "), F.col("text")).alias("text"),
        "lang",
    )
    return merge_upsert(base, updates, key_cols=["doc_id"], version_col="version")


_PPS_K = 20


@register(
    "corpus_sample_pps",
    f"""
    WITH base AS (
      SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             md5('pps:' || CAST(doc_id AS VARCHAR)) AS coin
      FROM documents WHERE n_chars > 0
    ), cums AS (
      SELECT lang, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY lang ORDER BY coin, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n_chars) OVER (PARTITION BY lang) AS tot
      FROM base
    )
    SELECT lang, doc_id, n_chars FROM cums
    WHERE (cum * {_PPS_K}) // tot > ((cum - n_chars) * {_PPS_K}) // tot
    """,
    category="corpus",
    windowed=False,
)
def corpus_sample_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic PPS sample (pipeline.sample_pps, Madow systematic
    selection): 20 documents per language drawn proportional to
    character count — longer documents proportionally likelier, token
    mass of the sample tracking the corpus — selected by exact integer
    slot-crossing over a deterministic md5 permutation, so the oracle
    replays the entire draw."""
    from kafka_workers_spark.pipeline import sample_pps

    d = load_table(spark, sf_dir, "documents")
    return sample_pps(
        d.select("lang", "doc_id", "n_chars"), _PPS_K, "n_chars", ["lang"]
    )


# ---------------------------------------------------------------------------
# Source-level corpus similarity matrix (KMV Jaccard + containment)
# ---------------------------------------------------------------------------


@register(
    "corpus_source_similarity",
    f"""
    WITH toks AS (
      SELECT source, UNNEST({_KMV_TOKS_SQL}) AS t FROM documents
    ),
    dh AS (SELECT DISTINCT source, substr(md5(t), 1, {_KMV_HEX}) AS h FROM toks),
    ranked AS (
      SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rnk
      FROM dh
    ),
    sk AS (
      SELECT source, list(h ORDER BY h) AS hashes
      FROM ranked WHERE rnk <= {_KMV_K} GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.hashes AS ha, b.hashes AS hb,
             list_sort(list_distinct(a.hashes || b.hashes))[1:{_KMV_K}] AS uk
      FROM sk a JOIN sk b ON a.source < b.source
    )
    SELECT source_a, source_b,
           CAST(LEAST(len(uk), {_KMV_K}) AS BIGINT) AS n_sample,
           CAST(len(list_intersect(uk, list_intersect(ha, hb))) AS BIGINT)
             AS n_sample_both,
           CAST(len(list_intersect(uk, list_intersect(ha, hb))) AS DOUBLE)
             / CAST(LEAST(len(uk), {_KMV_K}) AS DOUBLE) AS est_jaccard,
           CASE WHEN len(list_intersect(uk, ha)) > 0 THEN
             CAST(len(list_intersect(uk, list_intersect(ha, hb))) AS DOUBLE)
               / CAST(len(list_intersect(uk, ha)) AS DOUBLE) END
             AS est_containment_ab,
           CASE WHEN len(list_intersect(uk, hb)) > 0 THEN
             CAST(len(list_intersect(uk, list_intersect(ha, hb))) AS DOUBLE)
               / CAST(len(list_intersect(uk, hb)) AS DOUBLE) END
             AS est_containment_ba
    FROM pairs
    """,
    category="corpus",
    windowed=False,  # new round 12 — EXTRA until rotated in
)
def corpus_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix from per-source KMV vocabulary
    sketches (functions.sketches.kmv_jaccard / kmv_containment, Beyer et
    al. SIGMOD 2007 §5): which ingest sources share vocabulary, and
    whether one is (near-)contained in another — the corpus-mixture
    screen a curator runs before weighting sources (containment catches
    the mirror-site case Jaccard hides). Sketches build per
    (source, doc-parity) shard and MERGE (the bottom-k-of-bottom-ks
    exactness the KMV family pins), so the whole-pass oracle checks the
    rollup chain too; every estimate is an int/int single IEEE division
    off the union's bottom-k sample, so the float columns ride the
    value hash (the phrase_scores float rule).

    Scale shape: sketches are fixed k-hash rows — ONE per source — so
    the pairwise join is |sources|², independent of corpus bytes; the
    heavy work (distinct-digest aggregation) is one hash aggregate whose
    shuffle carries 13-hex-char digests, never tokens or text."""
    from kafka_workers_spark.functions.sketches import (
        kmv_build,
        kmv_containment,
        kmv_jaccard,
        kmv_merge,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = d.select(
        "source",
        (F.col("doc_id") % 2).alias("__parity"),
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda t: F.length(t) > 0)
        ).alias("__t"),
    )
    shards = kmv_build(toks, "__t", k=_KMV_K, group_cols=["source", "__parity"]).drop(
        "__parity"
    )
    sk = kmv_merge(shards, group_cols=["source"])
    a = sk.select(F.col("source").alias("source_a"), F.col("hashes").alias("ha"))
    b = sk.select(F.col("source").alias("source_b"), F.col("hashes").alias("hb"))
    pairs = a.join(b, F.col("source_a") < F.col("source_b")).withColumn(
        "__uk",
        F.slice(F.array_sort(F.array_union(F.col("ha"), F.col("hb"))), 1, _KMV_K),
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.least(F.size("__uk"), F.lit(_KMV_K)).cast("long").alias("n_sample"),
        F.size(F.array_intersect(F.col("__uk"), F.array_intersect("ha", "hb")))
        .cast("long")
        .alias("n_sample_both"),
        kmv_jaccard("ha", "hb", _KMV_K).alias("est_jaccard"),
        kmv_containment("ha", "hb", _KMV_K).alias("est_containment_ab"),
        kmv_containment("hb", "ha", _KMV_K).alias("est_containment_ba"),
    )


# ---------------------------------------------------------------------------
# Weighted random sample without replacement (Efraimidis–Spirakis)
# ---------------------------------------------------------------------------

_ES_K = 10
_ES_SPACE_F = float(1 << 52)


@register(
    "corpus_weighted_sample",
    f"""
    WITH w AS (
      SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars
      FROM documents WHERE n_chars > 0
    ),
    keyed AS (
      SELECT lang, doc_id, n_chars,
             CAST(floor(1000000.0 * ln(
               (CAST(('0x' || substr(md5('es:' || CAST(doc_id AS VARCHAR)), 1, 13))
                     AS BIGINT) + 1)::DOUBLE / {_ES_SPACE_F!r}
             )) AS BIGINT) AS lnq
      FROM w
    )
    SELECT lang, doc_id, n_chars, es_key, rank FROM (
      SELECT lang, doc_id, n_chars,
             CAST(lnq AS DOUBLE) / CAST(n_chars AS DOUBLE) AS es_key,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY CAST(lnq AS DOUBLE) / CAST(n_chars AS DOUBLE) DESC,
                                         doc_id) AS rank
      FROM keyed
    ) WHERE rank <= {_ES_K}
    """,
    category="corpus",
    windowed=False,  # new round 12 — EXTRA until rotated in
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language weighted random sample without replacement
    (pipeline.sample_weighted — Efraimidis & Spirakis 2006 A-ES, the
    salt-reproducible counterpart to corpus_sample_pps's systematic
    selection): top-10 docs per language by ``floor(10^6·ln u)/n_chars``
    with u the 52-bit md5 coin. The quantized-ln key is the idf6
    cross-engine pattern, the final key one IEEE division of exact
    bigints — the whole sample, keys included, rides the value hash."""
    from kafka_workers_spark.pipeline import sample_weighted

    d = load_table(spark, sf_dir, "documents")
    return sample_weighted(
        d.select("lang", "doc_id", "n_chars"), _ES_K, "n_chars", ["lang"]
    )


_ALLOC_N = 120


@register(
    "corpus_sample_allocation",
    f"""
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nh FROM documents GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(nh) AS BIGINT) AS n FROM counts
    ), alloc AS (
      SELECT lang, nh,
             ({_ALLOC_N} * nh) // n AS base,
             ({_ALLOC_N} * nh) % n AS rem
      FROM counts, tot
    ), lo AS (
      SELECT CAST({_ALLOC_N} - SUM(base) AS BIGINT) AS l FROM alloc
    ), quota AS (
      SELECT lang,
             CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) <= l
                              THEN 1 ELSE 0 END AS BIGINT) AS q
      FROM alloc, lo
    ), keyed AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                        doc_id) AS rn
      FROM documents
    )
    SELECT k.lang, k.doc_id
    FROM keyed k JOIN quota ON k.lang = quota.lang
    WHERE k.rn <= quota.q
    """,
    category="corpus",
    windowed=False,
)
def corpus_sample_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget stratified draw (pipeline.sample_allocation): exactly
    {n} documents allocated across languages by Hamilton largest-remainder
    apportionment, rows picked per stratum in the deterministic md5-key
    order (sample_coin permutation family) — the per-epoch "exact budget,
    corpus mix" draw. The oracle replays the integer allocation (DuckDB
    // == Spark DIV, all operands non-negative), the remainder ranking
    (ties by lang ASC) and the keyed rank selection."""
    from kafka_workers_spark.pipeline import sample_allocation

    d = load_table(spark, sf_dir, "documents")
    return sample_allocation(d, _ALLOC_N, strata_col="lang", id_col="doc_id")

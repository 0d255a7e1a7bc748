"""Hashed-feature multinomial Naive Bayes: the trainable document
classifier of the curation stack (CCNet/RefinedWeb-style "does this page
look like Wikipedia?" quality gates, language/source routing, topic
buckets) in the package's fixed-size-model discipline.

fastText-style linear classifiers over hashed n-grams are the published
workhorse for corpus curation (Joulin et al., "Bag of Tricks for
Efficient Text Classification", EACL 2017); multinomial NB is its
closed-form cousin — ONE counting pass to train, no SGD loop — and at
corpus scale the two share the property that matters: the model is a
fixed-size table, not a per-document state. Features are hashed
unigrams+bigrams exactly as :func:`~kafka_workers_spark.operators.text.
dsir_weights` (md5-prefix buckets — deterministic, ANSI-SQL-replayable);
DSIR is the two-class importance-RATIO special case of what this module
scores as K-class log posteriors with priors.

Reference parity: content classification lives in user task code in the
reference (WorkerTask.java:50); this is the model-based routing stage
that code would implement.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_workers_spark.operators.text import normalized, tokens


class NBModel(NamedTuple):
    """A trained multinomial NB model: both frames are bounded BY
    CONSTRUCTION (``feature_counts`` <= labels × n_buckets rows,
    ``class_stats`` = one row per label), so they broadcast at any
    corpus size. ``n_buckets``/``alpha`` ride along so classify can
    never drift from the training geometry."""

    feature_counts: DataFrame  # label, __b, __cnt
    class_stats: DataFrame  # label, __docs, __toks
    n_buckets: int
    alpha: float


def _feature_rows(
    df: DataFrame,
    keep_cols: list[str],
    text_col: str,
    n_buckets: int,
    outer: bool,
) -> DataFrame:
    """Exploded hashed unigram+bigram feature-bucket rows — the DSIR
    feature space (operators/text.py dsir_weights), md5-prefix hashed so
    an oracle can replay it in ANSI SQL. The token array is MATERIALIZED
    behind a barrier before the bigram lambdas touch it: higher-order
    functions are interpreted, and an inlined token expression would
    re-run the normalize+split+filter chain on every ``element_at`` call
    — O(tokens²) string work per document (measured: the inlined form
    put text_nb_score at ~19 s at sf0.1; staged, ~2 s — the
    tokenize_stage rule, enforced here after being learned the hard
    way). ``outer`` keeps featureless documents as one NULL-bucket row
    (the scoring contract: the prior still applies)."""
    from kafka_workers_spark.operators.dedup import barrier

    toks = F.filter(tokens(normalized(F.col(text_col))), lambda t: F.length(t) > 0)
    staged = barrier(df.select(*keep_cols, toks.alias("__toks")))
    bi = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("__toks") - 2),
            lambda i: F.concat_ws(
                " ", F.element_at("__toks", i + 1), F.element_at("__toks", i + 2)
            ),
        ),
    ).otherwise(F.array())
    buckets = F.transform(
        F.concat(F.col("__toks"), bi),
        lambda f: F.conv(F.substring(F.md5(f), 1, 15), 16, 10).cast("bigint")
        % n_buckets,
    )
    ex = F.explode_outer(buckets) if outer else F.explode(buckets)
    return staged.select(*keep_cols, ex.alias("__b"))


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 1.0,
) -> NBModel:
    """Train multinomial NB in ONE counting pass (closed form — no
    iteration): per-(label, bucket) feature counts plus per-label doc
    and feature totals. Rows with a NULL label are excluded (unlabeled
    data trains nothing). Build is job-free: both returned frames are
    lazy aggregates; nothing materializes until a consuming plan runs.

    The per-label total is over the SAME feature space the counts table
    sums — unigrams + bigrams, i.e. ``n_toks + max(n_toks - 1, 0)`` per
    document — so likelihood denominators and numerators can never
    drift.

    Shape at scale: two partial-aggregatable shuffles whose OUTPUT is
    model-sized (labels × n_buckets and labels rows), never corpus-
    sized; the corpus shuffles nothing but (label, bucket) pairs.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets ({n_buckets}) must be positive")
    if alpha <= 0:
        raise ValueError(f"alpha ({alpha}) must be positive (add-α smoothing)")
    labeled = docs.where(F.col(label_col).isNotNull()).select(
        F.col(label_col).alias("label"), F.col(text_col).alias(text_col)
    )
    fb = _feature_rows(labeled, ["label"], text_col, n_buckets, outer=False)
    feature_counts = fb.groupBy("label", "__b").agg(F.count("*").alias("__cnt"))
    n_toks = F.size(
        F.filter(tokens(normalized(F.col(text_col))), lambda t: F.length(t) > 0)
    )
    class_stats = (
        labeled.select(
            "label",
            (n_toks + F.greatest(n_toks - 1, F.lit(0))).alias("__nf"),
        )
        .groupBy("label")
        .agg(
            F.count("*").alias("__docs"),
            F.sum("__nf").cast("bigint").alias("__toks"),
        )
    )
    return NBModel(feature_counts, class_stats, n_buckets, float(alpha))


def nb_score(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(document, label) log-posterior decomposition: one row per
    input document per trained label with ``n_feats, sum_feat_count``
    (exact integers — the doc's feature count; Σ over its features of
    the label's bucket counts) and ``log_posterior`` (ln prior + Σ ln
    smoothed likelihoods — libm, so differential-tested rather than
    oracled, the DSIR float discipline). Documents with no features
    carry the prior alone.

    Construction note: the feature rows are CROSSED with the label list
    BEFORE the counts join — a plain join on the bucket would fan out
    only to labels that saw the bucket, silently dropping the smoothed
    floor of the others (the coalesce-before-log lesson from
    dsir_weights, here at the join level).

    Shape at scale: explode features → one broadcast of the K-row label
    list → one broadcast join against the bounded counts table →
    (id, label)-keyed partial aggregate. No token-keyed shuffle exists,
    so Zipf-hot tokens never straggle (the dsir_weights scale story,
    K-way)."""
    m = float(model.n_buckets)
    a = model.alpha
    fb = _feature_rows(docs, [id_col], text_col, model.n_buckets, outer=True)
    labels = model.class_stats.select("label", "__docs", "__toks")
    # a model trained on zero labeled rows has NO labels, and an inner
    # label cross would silently score nothing — the silent-no-op
    # failure mode this package guards against (the semantic_dedup /
    # pq_train lazy raise_error pattern). A guard frame joined anywhere
    # BELOW the cross is raceable: AQE's empty-relation propagation can
    # materialize the empty class_stats stage first and prune the whole
    # subtree — guard included — before its broadcast ever evaluates
    # (observed: the raise fired on a doomed broadcast job while the
    # action returned empty). So the cross itself is a LEFT join on a
    # TRUE condition: an empty label list null-extends the real fb rows
    # instead of emptying the plan, and the raise rides the projection
    # of those rows, where no empty-relation rule can reach it. A
    # trained model matches every fb row to all K labels, so the
    # guarded column never evaluates its otherwise() arm in normal use.
    label_t = model.class_stats.schema["label"].dataType.simpleString()
    guarded_label = F.when(F.col("label").isNotNull(), F.col("label")).otherwise(
        F.raise_error(
            F.lit(
                "nb_score: the model has no labels — training saw "
                "zero non-NULL-label rows"
            )
        ).cast(label_t)
    )
    scored = (
        fb.join(F.broadcast(labels), F.lit(True), "left")
        .select(
            F.col(id_col),
            guarded_label.alias("label"),
            "__docs",
            "__toks",
            "__b",
        )
        .join(F.broadcast(model.feature_counts), ["label", "__b"], "left")
        .select(
            id_col,
            "label",
            "__docs",
            "__toks",
            F.col("__b").isNotNull().cast("bigint").alias("__has"),
            F.coalesce("__cnt", F.lit(0)).cast("bigint").alias("__cnt"),
        )
    )
    logl = F.when(
        F.col("__has") == 1,
        F.log(F.col("__cnt").cast("double") + F.lit(a))
        - F.log(F.col("__toks").cast("double") + F.lit(a * m)),
    ).otherwise(F.lit(0.0))
    total_docs = model.class_stats.agg(F.sum("__docs").alias("__d"))
    return (
        scored.groupBy(id_col, "label")
        .agg(
            F.sum("__has").cast("bigint").alias("n_feats"),
            F.sum(F.col("__cnt") * F.col("__has")).cast("bigint").alias("sum_feat_count"),
            F.sum(logl).alias("__sum_logl"),
            F.first("__docs").alias("__docs"),
        )
        .crossJoin(F.broadcast(total_docs))
        .select(
            id_col,
            "label",
            "n_feats",
            "sum_feat_count",
            (
                F.log(F.col("__docs").cast("double"))
                - F.log(F.col("__d").cast("double"))
                + F.col("__sum_logl")
            ).alias("log_posterior"),
        )
    )


def nb_classify(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    out: str = "predicted_label",
) -> DataFrame:
    """Argmax over :func:`nb_score`'s log posteriors with a deterministic
    tiebreak toward the SMALLEST label string, so an exact tie can never
    flip between runs. One row per input document: ``id_col, out,
    log_posterior``. Window-free and single-pass: the argmax is a
    ``min(struct(-log_posterior, label))`` — struct ordering compares
    the negated posterior first (min == best posterior) and the label
    second (min == lexicographically least) — one partial-aggregatable
    groupBy, no per-key sort, no join-back."""
    scored = nb_score(docs, model, id_col=id_col, text_col=text_col)
    best = scored.groupBy(id_col).agg(
        F.min(
            F.struct(
                (-F.col("log_posterior")).alias("__neg"), F.col("label").alias("__l")
            )
        ).alias("__best")
    )
    return best.select(
        id_col,
        F.col("__best.__l").alias(out),
        (-F.col("__best.__neg")).alias("log_posterior"),
    )

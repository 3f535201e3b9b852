"""Model-based quality filtering — the trained-classifier stage of
production LLM data curation (the "fasttext quality classifier"
pattern: GPT-3's WebText-vs-CommonCrawl LR filter, LLaMA's Wikipedia-
reference classifier, CCNet's language-model gate). The heuristic
scores in :mod:`..plans.llm_ops` (length/punct/stopword ratios, LM
surprisal) are hand-built features; this module closes the family with
the LEARNED gate: train a sparse logistic-regression classifier to
separate a REFERENCE ("looks high quality") corpus from the raw
background, score every document with the model, keep docs above a
probability threshold.

Spark-first shape, designed for the 100 TB corpus:

- Features are ``HashingTF`` over the SAME whitespace tokenizer the
  rest of the engine uses (``functions.text.tokens`` semantics) — a
  fixed ``num_features`` hash space, so there is NO vocabulary to fit,
  no second corpus pass, and the trained model is one dense
  coefficient vector of bounded size (``num_features`` doubles),
  broadcast to executors at scoring time.
- Training runs on the JVM (``pyspark.ml`` L-BFGS logistic
  regression) over the labeled union — reference docs are the
  positives, a background SAMPLE the negatives. The training set is
  classifier-sized (typically ≤ millions of rows), never the full
  corpus: at 100 TB you sample the background, train once, then score
  everything with the fixed model.
- Scoring is ``model.transform`` — JVM-side hashing + dot product,
  one map-shaped pass, no shuffle, no Python in the row path.

Determinism: HashingTF is a pure hash (stable across runs/engines);
L-BFGS from a fixed zero initialization on a fixed dataset converges
deterministically for this convex objective, and every test asserts
ORDERING/separation properties rather than exact coefficients.

This operator family is pytest-evidenced (iterative optimizer — the
non-SQL-expressible class; same posture as BPE training before its
r14 audit row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polygon_daily_market_data_pipeline_spark.functions.text import tokens

_FEATURES = "qm_features"
_RAWTOK = "qm_tokens"


def _featurize(docs: DataFrame, text_col: str, num_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    tok = docs.withColumn(_RAWTOK, tokens(text_col))
    tf = HashingTF(
        inputCol=_RAWTOK, outputCol=_FEATURES, numFeatures=num_features
    )
    return tf.transform(tok).drop(_RAWTOK)


def train_quality_model(
    reference_docs: DataFrame,
    background_docs: DataFrame,
    *,
    text_col: str = "text",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Train the reference-vs-background classifier. ``reference_docs``
    are the positives (the distribution you want more of);
    ``background_docs`` the negatives (a SAMPLE of the raw corpus —
    pass ``deterministic_sample``'s output at scale, never 100 TB).
    Returns the fitted ``LogisticRegressionModel`` (its
    ``.coefficients`` vector is the whole artifact — ``num_features``
    doubles, broadcastable)."""
    from pyspark.ml.classification import LogisticRegression

    ref = _featurize(
        reference_docs.select(F.col(text_col)), text_col, num_features
    ).withColumn("label", F.lit(1.0))
    bg = _featurize(
        background_docs.select(F.col(text_col)), text_col, num_features
    ).withColumn("label", F.lit(0.0))
    lr = LogisticRegression(
        featuresCol=_FEATURES,
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(ref.unionByName(bg))


def quality_model_scores(
    docs: DataFrame,
    model,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_features: "int | None" = None,
) -> DataFrame:
    """(id, quality_prob) for every document — P(reference | doc)
    under the trained model. One JVM map pass (hash + broadcast dot
    product); nothing corpus-sized moves. ``num_features`` must match
    training when given; defaults to the model's coefficient size."""
    from pyspark.ml.functions import vector_to_array

    # ADVICE r14: `num_features or model.numFeatures` silently treated
    # an explicit 0 as unset, and a mismatched value surfaced (if at
    # all) as an opaque JVM dimension error at transform time
    n = model.numFeatures if num_features is None else num_features
    if n != model.numFeatures:
        raise ValueError(
            f"num_features={n} does not match the trained model's "
            f"feature space ({model.numFeatures}) — score with the "
            "hash width the model was trained on"
        )
    feat = _featurize(
        docs.select(F.col(id_col), F.col(text_col)), text_col, n
    )
    # probability is a Vector UDT; element 2 is P(label=1)
    second = F.element_at(vector_to_array(F.col("probability")), 2)
    return (
        model.transform(feat)
        .select(F.col(id_col), second.alias("quality_prob"))
    )


# The pinned serving coefficients (round 15, VERDICT r14 Next #5):
# scoring with a FIXED model is a deterministic dot product + monotone
# threshold, so the driver-priced form quantizes everything to integer
# logit space — ppm-scaled weights over integer count features, exact
# BIGINT arithmetic end to end (the audit-value discipline: no float
# ever enters, so Spark and DuckDB agree bit-for-bit). The weights are
# pinned from inspecting trained reference-vs-background runs on the
# synthetic corpus: stopword saturation is the strongest prose signal
# (weight 2), alphabetic-token fraction next (weight 1), plus the
# C4-style length gate. Sigmoid is monotone, so thresholding the logit
# IS thresholding the probability with no transcendental in the
# compared surface; the threshold itself is PINNED_GATE_PPM below.
PINNED_INTERCEPT_PPM = -1_500_000
PINNED_LEN_GATE_PPM = 500_000
PINNED_STOPWORD_WEIGHT = 2
PINNED_ALPHA_WEIGHT = 1
# The keep threshold sits INSIDE the corpus score distribution (the
# GPT-3 posture: the cut is chosen for a target keep rate, not at
# P=0.5 — on this organic-prose synthetic corpus the logit-0 cut
# keeps 100% of documents, a vacuous gate). 100000 ppm keeps ~55-70%
# and drops ~30-45% at sf0.001/0.01/0.1 — non-vacuous BOTH ways at
# every SF, and the comparison is exact-integer so the cut carries no
# boundary risk.
PINNED_GATE_PPM = 100_000


def pinned_quality_score(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, score_ppm, keep) under the PINNED integer-quantized linear
    gate — the deployment half of the model-based filter with the
    training freeze applied (train once on a sample, serve the fixed
    coefficient vector everywhere; GPT-3/LLaMA curation serves exactly
    this shape). ``score_ppm`` is the exact-integer logit
    (ppm-quantized ratio features, BIGINT dot product — ``div``
    truncation matches DuckDB ``//`` on the non-negative operands);
    ``keep`` = score_ppm >= PINNED_GATE_PPM (a target-keep-rate cut —
    see the constant's comment; sigmoid is monotone, so any logit
    threshold IS a probability threshold with no transcendental in
    the compared surface).

    Scale: one codegen'd linear scan (regexp_count over the
    space-doubled normalized text, NOT interpreted array-filter HOFs —
    measured 5x faster on the cold first call and value-identical);
    integer arithmetic; no shuffle, no UDF, broadcastable nothing.

    The space-doubling trick: the normalized text has single spaces,
    so ``replace(' ', '  ')`` plus one pad space each end gives every
    token its OWN flanking spaces — token-bounded patterns like
    ``' (the|of) '`` then count non-overlapping matches without the
    lookarounds DuckDB's RE2 lacks, identically in both engines."""
    from polygon_daily_market_data_pipeline_spark.functions.text import (
        ENGLISH_STOPWORDS,
        normalize_text,
    )

    norm = normalize_text(text_col)
    spaced = F.concat(
        F.lit(" "), F.regexp_replace(norm, " ", "  "), F.lit(" ")
    )
    sw_pat = " (" + "|".join(ENGLISH_STOPWORDS) + ") "
    feats = docs.select(
        F.col(id_col),
        F.size(F.split(norm, " ")).cast("long").alias("qm_n_tok"),
        F.regexp_count(spaced, F.lit(sw_pat))
        .cast("long")
        .alias("qm_n_stop"),
        F.regexp_count(spaced, F.lit(r" [^ ]*[a-z][^ ]* "))
        .cast("long")
        .alias("qm_n_alpha"),
    )
    # integer division (Spark `div` == DuckDB `//` for non-negatives)
    # keeps the ppm ratios exact — float division would reintroduce
    # the killed rounding-boundary flake class into an audit value
    stop_ppm = F.expr("qm_n_stop * 1000000 div greatest(qm_n_tok, 1)")
    alpha_ppm = F.expr("qm_n_alpha * 1000000 div greatest(qm_n_tok, 1)")
    len_gate = (
        F.when(
            (F.col("qm_n_tok") >= 10) & (F.col("qm_n_tok") <= 100000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    score = (
        F.lit(PINNED_INTERCEPT_PPM).cast("long")
        + F.lit(PINNED_LEN_GATE_PPM).cast("long") * len_gate
        + F.lit(PINNED_STOPWORD_WEIGHT).cast("long") * stop_ppm
        + F.lit(PINNED_ALPHA_WEIGHT).cast("long") * alpha_ppm
    )
    return feats.select(
        F.col(id_col),
        score.alias("score_ppm"),
        (score >= PINNED_GATE_PPM).alias("keep"),
    )


def filter_by_quality_model(
    docs: DataFrame,
    model,
    threshold: float = 0.5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` restricted to documents the model scores at or above
    ``threshold`` — the Pareto-style keep gate (GPT-3 used a
    stochastic keep ∝ score; the deterministic threshold form is the
    reproducible variant). One scoring pass + a semi join on the id."""
    keep = quality_model_scores(
        docs, model, id_col=id_col, text_col=text_col
    ).where(F.col("quality_prob") >= threshold)
    return docs.join(keep.select(id_col), id_col, "left_semi")

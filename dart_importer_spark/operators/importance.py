"""Distribution-matched data selection (DSIR-style importance weighting).

The standard pretraining-corpus curation move (Xie et al., "Data Selection
for Language Models via Importance Resampling", 2023): score every raw
document by how much more likely its hashed-n-gram features are under a
TARGET distribution (e.g. curated wiki/books, or a high-quality language
slice) than under the RAW corpus distribution, then keep the top-weighted
documents. The weight is a log-likelihood ratio of two smoothed unigram
models over n-gram features:

    log w(x) = sum_f  c_x(f) * [ ln p_target(f) - ln p_raw(f) ]

with add-alpha smoothing over the union feature vocabulary. Deterministic
top-k selection here (the paper's Gumbel-top-k resampling needs RNG; a
seeded variant belongs to the caller) — so results are exactly
reproducible by any engine.

Scale shape: feature extraction is one explode + one (doc, feature)
hash-agg; BOTH corpus models are one further agg over that SAME table (no
re-tokenization); the per-feature log ratio is a feature-keyed table of
vocabulary size that joins back onto the doc-feature counts (AQE handles
the stopword-feature skew; the join is followed by a per-doc partial agg,
so hot features combine map-side). Nothing is driver-side except the
three scalar totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dart_importer_spark.functions.partitioning import widen_for_python
from dart_importer_spark.functions.tokenizer import shingles_of, tokenize_col


def ngram_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
) -> DataFrame:
    """(id, feature, cnt) n-gram feature counts WITH multiplicity, n in
    1..n_max, word n-grams joined by a single space (the DSIR feature
    space, un-hashed: exact and engine-portable; pass the output through
    a hash bucketing step when vocabulary memory matters at scale)."""
    if n_max < 1:
        raise ValueError(f"ngram_feature_counts: n_max >= 1, got {n_max}")
    toks = tokenize_col(F.col(text_col))
    feats = toks
    for n in range(2, n_max + 1):
        feats = F.concat(feats, shingles_of(toks, n, " "))
    # widen: tokenize + n-gram explode is CPU-dense and a one-file corpus
    # scans as a single partition (no-op at scale)
    return (
        widen_for_python(df, id_col)
        .select(F.col(id_col).alias("id"), F.explode(feats).alias("f"))
        .groupBy("id", "f")
        .agg(F.count("*").cast("double").alias("c"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    alpha: float = 1.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-raw-document DSIR log importance weight (``id``, ``log_w``).

    ``raw`` is the corpus being filtered; ``target`` is a sample of the
    distribution to match. Both sides use the same pinned tokenizer and
    the same n-gram feature space; smoothing is add-``alpha`` over the
    UNION vocabulary of both corpora, so a feature unseen in the target
    contributes a finite negative ratio instead of -inf."""
    # dfc feeds BOTH the raw model and the final per-doc weight join, and
    # joined feeds BOTH the totals agg and the ratio table — without a
    # materialization marker each consumer re-runs the tokenizer + explode
    # + hash-agg from the corpus (3 full passes instead of 1). The lazy
    # localCheckpoint computes each once at its first action and keeps
    # executor-local blocks (auto-freed on dereference).
    dfc = ngram_feature_counts(raw, text_col, id_col, n_max).localCheckpoint(
        eager=False
    )
    raw_m = dfc.groupBy("f").agg(F.sum("c").alias("cr"))
    tgt_m = (
        ngram_feature_counts(target, text_col, id_col, n_max)
        .groupBy("f")
        .agg(F.sum("c").alias("ct"))
    )
    joined = raw_m.join(tgt_m, "f", "full_outer").select(
        "f",
        F.coalesce("cr", F.lit(0.0)).alias("cr"),
        F.coalesce("ct", F.lit(0.0)).alias("ct"),
    ).localCheckpoint(eager=False)
    tot = joined.agg(
        F.sum("cr").alias("tr"),
        F.sum("ct").alias("tt"),
        F.count("*").cast("double").alias("v"),
    ).first()
    a = float(alpha)
    ratio = joined.select(
        "f",
        (
            F.log((F.col("ct") + a) / F.lit(float(tot["tt"]) + a * tot["v"]))
            - F.log((F.col("cr") + a) / F.lit(float(tot["tr"]) + a * tot["v"]))
        ).alias("lr"),
    )
    w = (
        dfc.join(ratio, "f")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("lr")).alias("log_w"))
    )
    if round_to is not None:
        w = w.withColumn("log_w", F.round("log_w", round_to))
    return w.select(F.col("id").alias(id_col), "log_w")


def select_by_importance(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_max: int = 2,
    alpha: float = 1.0,
    round_to: int | None = 6,
) -> DataFrame:
    """The selection step: top-``k`` raw documents by importance weight
    (deterministic tiebreak on ``id_col``) — a TakeOrderedAndProject, so
    only k rows ever reach the driver."""
    w = importance_weights(
        raw, target, text_col, id_col, n_max, alpha, round_to
    )
    return w.orderBy(F.desc("log_w"), F.asc(id_col)).limit(int(k))

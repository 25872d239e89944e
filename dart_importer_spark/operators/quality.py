"""Training-data quality operators: PII redaction, benchmark
contamination, and Gopher-style repetition signals.

All pure Catalyst expression plans (regexp / explode / groupBy — no
Python), shaped so the per-doc work keys on the doc id and the only
shuffles are per-doc partial aggregations:

- :func:`redact_pii` — regex PII scrubbing (emails, IPv4s, phone-like
  digit runs) with per-kind counts; the standard pre-training scrub.
- :func:`contamination_stats` — per-corpus-doc n-gram overlap with a
  benchmark set (the test-set contamination / decontamination check,
  cf. the n-gram overlap audits in LLM training reports).
- :func:`repetition_stats` — within-document repetition signals
  (duplicate / top n-gram occupancy, the Gopher repetition filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# patterns chosen for cross-engine parity: \\d, \\b, bounded classes —
# identical semantics under Java regex (Spark) and RE2 (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\- ]{7,}\d"


def redact_pii(
    df: DataFrame,
    text_col: str,
    out_col: str = "redacted",
) -> DataFrame:
    """Scrub emails → ``<EMAIL>``, IPv4s → ``<IP>``, phone-like digit
    runs → ``<PHONE>`` (applied in that order: an email's host never
    half-matches as an IP once the email is gone, and phone runs can't
    eat IP octets because the phone class has no dots). Adds per-kind
    match counts next to the redacted text — the counts are the audit
    record a scrubbing pass must emit.

    Scale shape: three regexp_replace + three regexp_count expressions —
    a narrow projection, no shuffle, pushes through any partitioning."""
    t = F.col(text_col)
    step1 = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    step2 = F.regexp_replace(step1, IPV4_RE, "<IP>")
    step3 = F.regexp_replace(step2, PHONE_RE, "<PHONE>")
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(EMAIL_RE)))
        .withColumn("n_ips", F.regexp_count(step1, F.lit(IPV4_RE)))
        .withColumn("n_phones", F.regexp_count(step2, F.lit(PHONE_RE)))
        .withColumn(out_col, step3)
    )


def _ngram_rows(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ng) rows — word n-grams after lowercase alnum tokenization;
    docs with fewer than n tokens contribute nothing. The token array is
    materialized as a column FIRST: referencing the split expression
    inside the transform lambda would re-tokenize the whole text once
    per n-gram position (quadratic in document length — measured 20x on
    the benchmark corpus)."""
    toked = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
        ).alias("_tk"),
    )
    ngrams = F.when(
        F.size("_tk") >= n,
        F.expr(
            f"transform(sequence(1, size(_tk) - {n - 1}), "
            f"i -> array_join(slice(_tk, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select("id", F.explode(ngrams).alias("ng"))


def contamination_stats(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per corpus document: what fraction of its word ``n``-grams appear
    anywhere in the benchmark set — the test-set contamination audit run
    before training (docs near 1.0 are benchmark copies; a decontam pass
    drops docs above a threshold). Returns (id, n_ngrams, n_contaminated,
    contamination) for every doc with at least one n-gram, ordered by id.

    Scale shape: the benchmark n-gram set is tiny relative to the corpus
    (evals are small) — distinct bench n-grams feed a BROADCAST semi-ish
    left join against the corpus n-gram stream, then one per-doc partial
    agg. The corpus is never self-joined."""
    if n < 1:
        raise ValueError(f"contamination_stats: n >= 1, got {n}")
    rows = _ngram_rows(corpus, id_col, text_col, n)
    bset = (
        _ngram_rows(
            bench.select(
                F.lit(0).alias("_bid"),
                F.col(bench_text_col or text_col).alias("_btext"),
            ),
            "_bid",
            "_btext",
            n,
        )
        .select("ng")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        rows.join(F.broadcast(bset), "ng", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6),
        )
        .orderBy("id")
    )


def repetition_stats(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
) -> DataFrame:
    """Within-document repetition (the Gopher repetition filters): per
    doc, the fraction of n-gram OCCURRENCES that are repeats
    (1 − distinct/total) and the occupancy of the single most frequent
    n-gram (top/total). Docs whose text loops ("buy now buy now buy
    now...") score high on both and get dropped by the quality gate.
    Returns (id, n_ngrams, dup_frac, top_frac) for docs with ≥1 n-gram.

    Scale shape: one groupBy keyed (id, ngram) then one keyed (id) — both
    partial-agg shuffles on per-doc keys; nothing global, no skew beyond
    a single document's length (bounded upstream by ingest limits)."""
    if n < 1:
        raise ValueError(f"repetition_stats: n >= 1, got {n}")
    per = (
        _ngram_rows(corpus, id_col, text_col, n)
        .groupBy("id", "ng")
        .agg(F.count("*").alias("c"))
    )
    return (
        per.groupBy("id")
        .agg(
            F.sum("c").alias("n_ngrams"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
        .select(
            "id",
            "n_ngrams",
            F.round(
                (F.col("n_ngrams") - F.col("n_distinct")) / F.col("n_ngrams"),
                6,
            ).alias("dup_frac"),
            F.round(F.col("top_c") / F.col("n_ngrams"), 6).alias("top_frac"),
        )
        .orderBy("id")
    )

"""ES percolator, Spark-first: which STORED QUERIES match which documents
of a batch (reverse search — the alerting/routing primitive; ES registers
queries in a percolator field and runs docs against them).

The reference delegates all matching to ES (import_dart_data.py query
surface); this is the inverted form of its `match`, built as one
distributed join instead of per-doc query loops: tokenize the batch once
(pure-Catalyst tokenizer, no Python), explode to distinct (doc, term)
pairs, broadcast-join the analyzed query-term table (a query log is tiny
next to a document batch), count matched terms per (query, doc), gate on
any/all. Scales as O(batch tokens) with no shuffle of raw text — the
100-TB shape for running a rule set over an ingest stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_col, tokenize_text


def percolate(
    spark: SparkSession,
    queries: dict[str, str],
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "or",
) -> DataFrame:
    """Match every stored query against every doc of the batch.

    ``queries``: {query_id: query text} — analyzed with the pinned
    tokenizer. ``mode='or'`` matches a doc containing ANY of a query's
    terms; ``'and'`` requires ALL of them. Returns (query_id, id_col,
    n_matched) with one row per (matching query, doc)."""
    if mode not in ("or", "and"):
        raise ValueError(f"percolate: unknown mode {mode!r}")
    rows = []
    n_terms: dict[str, int] = {}
    for qid, q in queries.items():
        terms = sorted(set(tokenize_text(q)))
        n_terms[qid] = len(terms)
        rows.extend((qid, t) for t in terms)
    if not rows:
        return spark.createDataFrame(
            [], f"query_id string, {id_col} long, n_matched long"
        )
    qdf = spark.createDataFrame(rows, "query_id string, term string")
    pairs = docs.select(
        id_col, F.explode(F.array_distinct(tokenize_col(text_col))).alias("term")
    )
    joined = pairs.join(F.broadcast(qdf), "term")
    agg = joined.groupBy("query_id", id_col).agg(
        F.count("*").alias("n_matched")
    )
    if mode == "and":
        need = F.create_map(
            *[x for qid in n_terms for x in (F.lit(qid), F.lit(n_terms[qid]))]
        )
        agg = agg.filter(F.col("n_matched") == need[F.col("query_id")])
    return agg

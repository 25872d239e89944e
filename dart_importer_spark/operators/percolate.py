"""ES percolator, Spark-first: which STORED QUERIES match which documents
of a batch (reverse search — the alerting/routing primitive; ES registers
queries in a percolator field and runs docs against them).

The reference delegates all matching to ES (import_dart_data.py query
surface); this is the inverted form of its `match` and `bool` composition
(Running-ELK.md:230-247), built as distributed joins instead of per-doc
query loops: tokenize the batch ONCE (pure-Catalyst tokenizer, no Python),
explode to (doc, term, pos), broadcast-join the analyzed clause table (a
rule set is tiny next to a document batch), aggregate matched-clause
counts per (query, doc), gate on each query's requirements. Scales as
O(batch tokens) with no shuffle of raw text — the 100-TB shape for
running an alerting rule set over an ingest stream.

Stored queries are either plain strings (back-compat; ``mode`` picks
any/all) or structured clause dicts mirroring the ES bool query:

    {"must": [...], "should": [...], "minimum_should_match": 2,
     "must_not": [...], "phrase": "exact token sequence"}

- ``must``: every analyzed term present.
- ``should`` + ``minimum_should_match`` (default 1): at least that many
  distinct should-terms present.
- ``must_not``: none of the terms present (non-scoring exclusion). A
  query with ONLY must_not matches every doc lacking the terms, like a
  bool filter with a lone must_not leg.
- ``phrase``: the exact analyzed token sequence occurs (match_phrase,
  slop 0) — checked positionally on the batch tokens, no index needed:
  each phrase slot joins on its term, pos - slot realigns every slot to
  the phrase start, and a start position where ALL slots land is a hit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tokenizer import tokenize_col, tokenize_text
from ..functions.localrel import local_df

_CLAUSE_KEYS = {"must", "should", "must_not", "phrase", "minimum_should_match"}


def _analyze_list(vals) -> list[str]:
    out: list[str] = []
    for v in vals if isinstance(vals, (list, tuple, set)) else [vals]:
        out.extend(tokenize_text(str(v)))
    return sorted(set(out))


def percolate(
    spark: SparkSession,
    queries: dict[str, str | dict],
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "or",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Match every stored query against every doc of the batch.

    Returns (query_id, id_col, n_matched) with one row per (matching
    query, doc); ``n_matched`` counts the distinct positive terms the doc
    matched (must + should; phrase-only or pure-negative matches report
    0). See the module docstring for the stored-query forms.

    Rule-set scale: ES indexes its percolator queries; here the analyzed
    clause table is broadcast by default (``broadcast_rules=True``) —
    right for alerting rule sets (10^2..10^5 rules, a few MB), where it
    keeps the match a map-side join with zero shuffle of the clause
    table. For rule sets past the broadcast comfort zone
    (~spark.sql.autoBroadcastJoinThreshold, or when the driver-side
    clause list itself is the bound) pass ``broadcast_rules=False``: the
    clause joins become ordinary shuffle hash joins on ``term`` —
    results identical (equivalence-tested), cost one shuffle of the
    (small) clause table and one of the batch's distinct (doc, term)
    pairs. Beyond ~10^6 rules the dict-shaped ``queries`` argument is
    itself the limit; at that scale store rules as a table and feed
    term_rows/reqs as DataFrames (same join graph — the documented
    growth path). Pure-negative rules keep a broadcast of their (tiny)
    id list either way: their semantics need the batch universe, and
    universe × pure-neg-ids is bounded by #docs · #pure_neg rows."""
    if mode not in ("or", "and"):
        raise ValueError(f"percolate: unknown mode {mode!r}")
    term_rows: list[tuple[str, str, str, int]] = []  # qid, term, clause, slot
    reqs: list[tuple[str, int, int, int]] = []  # qid, need_must, msm, plen
    pure_neg: list[str] = []  # queries with must_not as their ONLY clause
    for qid, q in queries.items():
        if isinstance(q, str):
            spec = (
                {"must": [q]} if mode == "and"
                else {"should": [q], "minimum_should_match": 1}
            )
        else:
            bad = set(q) - _CLAUSE_KEYS
            if bad:
                raise ValueError(f"percolate: unknown clause keys {sorted(bad)}")
            spec = q
        must = _analyze_list(spec.get("must", []))
        should = _analyze_list(spec.get("should", []))
        nots = _analyze_list(spec.get("must_not", []))
        phrase = tokenize_text(str(spec["phrase"])) if spec.get("phrase") else []
        # ES default: should is optional (msm=0) when a must-like clause
        # exists, required-once (msm=1) when should stands alone
        msm_default = 1 if (should and not must and not phrase) else 0
        msm = int(spec.get("minimum_should_match", msm_default))
        if msm > len(should):
            raise ValueError(
                f"percolate: query {qid!r} requires {msm} of "
                f"{len(should)} should terms"
            )
        if should and msm == 0 and not (must or phrase):
            raise ValueError(
                f"percolate: query {qid!r} with only should clauses and "
                "minimum_should_match=0 would match every document"
            )
        if not (must or should or nots or phrase):
            raise ValueError(f"percolate: query {qid!r} has no clauses")
        term_rows += [(qid, t, "must", 0) for t in must]
        term_rows += [(qid, t, "should", 0) for t in should]
        term_rows += [(qid, t, "not", 0) for t in nots]
        term_rows += [(qid, t, "phrase", i) for i, t in enumerate(phrase)]
        reqs.append((qid, len(must), msm, len(phrase)))
        if nots and not (must or should or phrase):
            pure_neg.append(qid)

    out_schema = f"query_id string, {id_col} long, n_matched long"
    if not term_rows:
        return local_df(spark, [], out_schema)
    qdf = local_df(spark, 
        term_rows, "query_id string, term string, clause string, slot int"
    )
    # rule-side join hint: broadcast (default) or plain shuffle join for
    # rule sets past broadcast size — identical results either way
    _rules = F.broadcast if broadcast_rules else (lambda df: df)
    req = _rules(
        local_df(spark, 
            reqs, "query_id string, need_must int, msm int, plen int"
        )
    )

    # ONE tokenize of the batch — materialized: the flat leg, the phrase
    # leg and the pure-negative leg each consume this stream, and without
    # the marker each branch re-runs tokenize+posexplode over the whole
    # batch (lazy executor-local blocks, batch-bounded by construction)
    toks = docs.select(
        id_col, F.posexplode(tokenize_col(text_col)).alias("pos", "term")
    ).localCheckpoint(eager=False)

    flat = (
        toks.select(id_col, "term")
        .distinct()
        .join(_rules(qdf.filter(F.col("clause") != "phrase")), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.count_distinct(
                F.when(F.col("clause") == "must", F.col("term"))
            ).alias("n_must"),
            F.count_distinct(
                F.when(F.col("clause") == "should", F.col("term"))
            ).alias("n_should"),
            F.count_distinct(
                F.when(F.col("clause") == "not", F.col("term"))
            ).alias("n_not"),
        )
    )
    # phrase hits: realign every slot to the phrase start; a start where
    # all slots land means the exact sequence occurs
    ph = (
        toks.join(_rules(qdf.filter(F.col("clause") == "phrase")), "term")
        .select("query_id", id_col, (F.col("pos") - F.col("slot")).alias("base"),
                "slot")
        .groupBy("query_id", id_col, "base")
        .agg(F.count_distinct("slot").alias("n_slots"))
        .join(req.select("query_id", "plen"), "query_id")
        .filter(F.col("n_slots") == F.col("plen"))
        .select("query_id", id_col)
        .distinct()
        .withColumn("phrase_ok", F.lit(True))
    )

    cand = flat.join(ph, ["query_id", id_col], "full_outer").select(
        "query_id", id_col,
        *[F.coalesce(F.col(n), F.lit(0)).alias(n)
          for n in ("n_must", "n_should", "n_not")],
        F.coalesce(F.col("phrase_ok"), F.lit(False)).alias("phrase_ok"),
    )
    gated = (
        cand.join(req, "query_id")
        .filter(
            (F.col("n_must") == F.col("need_must"))
            & (F.col("n_should") >= F.col("msm"))
            & (F.col("n_not") == 0)
            & ((F.col("plen") == 0) | F.col("phrase_ok"))
        )
        .select(
            "query_id", id_col,
            (F.col("n_must") + F.col("n_should")).cast("long").alias("n_matched"),
        )
    )

    # pure-negative queries (must_not only) match every doc with NO banned
    # term: anti-join the batch universe against their matched-not docs
    if pure_neg:
        universe = docs.select(id_col).distinct().crossJoin(
            F.broadcast(
                local_df(spark, [(q,) for q in pure_neg],
                                      "query_id string")
            )
        )
        banned = (
            toks.select(id_col, "term").distinct()
            .join(
                _rules(
                    qdf.filter(
                        (F.col("clause") == "not")
                        & F.col("query_id").isin(pure_neg)
                    )
                ),
                "term",
            )
            .select("query_id", id_col)
        )
        neg_hits = universe.join(
            banned, ["query_id", id_col], "left_anti"
        ).withColumn("n_matched", F.lit(0).cast("long"))
        # the positive pipeline above never emits pure-negative queries
        # (they have no positive clause rows), so this union is disjoint
        gated = gated.unionByName(neg_hits)
    return gated

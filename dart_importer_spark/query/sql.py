"""ES SQL (``POST _sql``): SQL over the index with the ES full-text
extensions — taken Spark-first. The statement IS Spark SQL: Catalyst
parses, optimizes and executes it, so GROUP BY / HAVING / windows /
subqueries / joins against other registered views all work — a strict
superset of the ES SQL dialect (ES translates its SQL into query DSL
and inherits its limits; here the engine's native planner is already a
SQL engine, so only the FULL-TEXT predicates need dispatch). The three
ES extensions are rewritten before parsing:

- ``MATCH(field, 'query'[, 'options'])`` -> a boolean column
  materialized from ONE postings pass for that predicate's doc-id set
  (``options`` supports ``operator=and|or``; a comma-separated field
  list unions the per-field match sets — ES multi-field MATCH).
- ``QUERY('query string')`` -> same, over the full query_string
  boolean grammar (AND/OR/NOT, parens, phrases, prefixes,
  field:scoping).
- ``SCORE()`` -> the BM25 score column of the statement's single
  scoring predicate (exactly one MATCH/QUERY must be present; its
  full scored match set comes from ``topk(k=None)``, never a
  driver-side collect).

The index is addressed in the statement by a table name (default
``idx``); every ``FROM``/``JOIN`` reference to that name is bound to a
temp view of ``doc_stats`` (live docs, runtime fields applied) with the
predicate/score columns left-joined on. Everything downstream is plain
Catalyst — predicate pushdown, column pruning and whole-stage codegen
apply to the stored columns exactly as in any Spark SQL query.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dsl import DslError

_MATCH_RE = re.compile(
    r"\bMATCH\s*\(\s*([A-Za-z_][\w.,]*)\s*,\s*'([^']*)'"
    r"\s*(?:,\s*'([^']*)')?\s*\)",
    re.I,
)
_QUERY_RE = re.compile(r"\bQUERY\s*\(\s*'([^']*)'\s*\)", re.I)
_SCORE_RE = re.compile(r"\bSCORE\s*\(\s*\)", re.I)

_VIEW = "__es_sql_index"


def _match_options(opts: str | None) -> str:
    mode = "or"
    for kv in (opts or "").split(";"):
        kv = kv.strip()
        if not kv:
            continue
        k, _, v = kv.partition("=")
        if k.strip().lower() != "operator":
            raise DslError(
                f"es_sql: unsupported MATCH option {k.strip()!r} "
                f"(supported: operator=and|or)"
            )
        mode = v.strip().lower()
        if mode not in ("and", "or"):
            raise DslError(f"es_sql: MATCH operator must be and|or, "
                           f"got {mode!r}")
    return mode


def es_sql(
    ix,
    statement: str,
    table: str = "idx",
    round_scores: int | None = None,
) -> DataFrame:
    """Run an ES-SQL statement against the index. ``table`` is the name
    the statement uses for the index (``FROM idx`` by default).
    ``round_scores`` rounds the SCORE() column (determinism knob, same
    contract as ``topk``)."""
    spark = ix.spark
    preds: list[tuple[str, str, tuple]] = []

    def sub_match(m: re.Match) -> str:
        fields, q, opts = m.group(1), m.group(2), m.group(3)
        name = f"__ftpred_{len(preds)}"
        preds.append(
            (name, "match",
             (tuple(f.strip() for f in fields.split(",") if f.strip()),
              q, _match_options(opts)))
        )
        return name

    def sub_query(m: re.Match) -> str:
        name = f"__ftpred_{len(preds)}"
        preds.append((name, "query_string", (m.group(1),)))
        return name

    stmt = _MATCH_RE.sub(sub_match, statement)
    stmt = _QUERY_RE.sub(sub_query, stmt)
    wants_score = bool(_SCORE_RE.search(stmt))
    stmt = _SCORE_RE.sub("__ftscore", stmt)

    from_re = re.compile(
        r"\b(FROM|JOIN)\s+" + re.escape(table) + r"\b", re.I
    )
    if not from_re.search(stmt):
        raise DslError(
            f"es_sql: the statement must reference the index as "
            f"FROM {table} (pass table= to use another name)"
        )
    stmt = from_re.sub(r"\1 " + _VIEW, stmt)

    if wants_score and len(preds) != 1:
        raise DslError(
            "es_sql: SCORE() needs exactly one MATCH()/QUERY() predicate "
            f"as its scoring context (statement has {len(preds)})"
        )

    ds = ix.doc_stats()
    for name, kind, args in preds:
        if kind == "match":
            fields, q, mode = args
            docs = None
            for f in fields:  # multi-field MATCH = union of match sets
                d = ix.match_docs(q, mode=mode, field=f)
                docs = d if docs is None else docs.union(d)
            if docs is None:
                raise DslError("es_sql: MATCH needs a field")
            if len(fields) > 1:
                docs = docs.distinct()
        else:
            ast = ix.parse_query_string(args[0])
            docs = ix._qs_doc_set(ast, ix._fid(None), 50)
        ds = ds.join(
            docs.withColumn(name, F.lit(True)), "doc_id", "left"
        ).withColumn(name, F.coalesce(F.col(name), F.lit(False)))

    if wants_score:
        name, kind, args = preds[0]
        if kind != "match":
            raise DslError(
                "es_sql: SCORE() is defined for MATCH() contexts "
                "(QUERY() scoring: use query_string() directly)"
            )
        fields, q, mode = args
        if len(fields) != 1:
            raise DslError("es_sql: SCORE() needs a single-field MATCH")
        scored = ix.topk(
            q, k=None, mode=mode, field=fields[0], prune=False,
            round_scores=round_scores,
        ).withColumnRenamed("score", "__ftscore")
        ds = ds.join(scored, "doc_id", "left")

    ds.createOrReplaceTempView(_VIEW)
    return spark.sql(stmt)

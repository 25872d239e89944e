"""ES ``_search`` request-body dispatcher: run Elasticsearch JSON bodies
verbatim against an :class:`InvertedIndex`.

The reference's documented query surface is literally curl ``_search``
bodies (Running-ELK.md:110-293 — match, wildcard, fuzzy, match_all, bool
must+filter, term triples with boost, exists; import_dart_data.py's
match_all / count / get flows). :func:`search` compiles such a dict into
the engine's Spark plans: scoring clauses dispatch to the BM25 /
positional operators, filter-context clauses compile to pure Catalyst
``Column`` predicates pushed into the doc_stats scan, and :func:`aggs`
maps the ES aggregation families onto the engine's aggregation methods.

Everything stays declarative: the compiler emits exactly the DataFrame
plan the equivalent direct method call would — no collect, no Python row
loops — so Catalyst sees the same pushdowns (term/bucket pruning into the
postings scan, predicate pushdown into the doc_stats scan) the
hand-written calls get. At cluster scale the dispatcher adds zero work:
it is driver-side plan construction only.

Deliberate scope limits raise :class:`DslError` with the supported
alternative spelled out, never a silently-wrong result:

- filter context accepts metadata predicates (term / terms / range /
  exists / ids over doc_stats columns, arbitrarily nested in bool);
  full-text clauses belong in ``must`` — in filter context their score
  is constant anyway, so the must spelling is equivalent.
- a scoring bool takes ONE primary full-text clause (plus optional
  match-family ``should`` / ``must_not`` legs and any number of metadata
  clauses), or several single-term match/term clauses over one field
  (compiled to the AND-mode BM25 path, which sums the same per-term
  contributions ES would).
"""
from __future__ import annotations

import re
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DslError(ValueError):
    """An ES body shape the dispatcher does not support (the message
    names the supported alternative)."""


# --------------------------------------------------------------------------
# clause-spec helpers
# --------------------------------------------------------------------------
_SIDE_KEYS = {"boost", "rewrite", "case_insensitive", "_name", "analyzer"}


def _field_spec(typ: str, spec: Any) -> tuple[str, Any, dict]:
    """Split a ``{field: value-or-params}`` clause body into
    (field, value, side-params). Tolerates the legacy flattened form the
    reference uses (``{"term": {"corp_code": "xxx", "boost": 1.0}}``,
    Running-ELK.md:287-291) where side params sit beside the field."""
    if not isinstance(spec, dict) or not spec:
        raise DslError(f"{typ}: expected {{field: ...}}, got {spec!r}")
    side = {k: v for k, v in spec.items() if k in _SIDE_KEYS}
    rest = {k: v for k, v in spec.items() if k not in _SIDE_KEYS}
    if len(rest) != 1:
        raise DslError(f"{typ}: expected exactly one field, got {list(rest)}")
    ((f, v),) = rest.items()
    if isinstance(v, dict):
        side.update({k: vv for k, vv in v.items() if k in _SIDE_KEYS})
    return f, v, side


def _as_list(x) -> list:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _not_null_safe(c: Column) -> Column:
    # ES must_not matches docs where the inner clause does NOT match —
    # including docs where the field is NULL; plain ~ would yield NULL there
    return ~F.coalesce(c, F.lit(False))


class _Compiler:
    def __init__(self, ix):
        self.ix = ix
        self.meta_cols = set(ix.doc_stats().columns)

    def is_indexed(self, f: str) -> bool:
        return f in self.ix.fields

    def is_meta(self, f: str) -> bool:
        return f in self.meta_cols

    # ------------------------------------------------------- filter context
    def compile_filter(self, clause: dict, cols: set | None = None) -> Column:
        """ES filter context -> one Catalyst Column over doc_stats.

        Supports term / terms / range / exists / ids / match_all and
        arbitrarily nested bool. ``cols`` (when given) collects the
        doc_stats columns the predicate references."""
        typ, spec = self._clause(clause)
        if typ == "match_all":
            return F.lit(True)
        if typ == "bool":
            return self._filter_bool(spec, cols)
        if typ == "ids":
            vals = spec.get("values")
            if not isinstance(vals, (list, tuple)) or not vals:
                raise DslError("ids: expected {'values': [...]}")
            if cols is not None:
                cols.add("doc_id")
            return F.col("doc_id").isin([int(v) for v in vals])
        if typ == "exists":
            f = spec.get("field")
            self._meta_field(typ, f, cols)
            return F.col(f).isNotNull()
        if typ in ("term", "terms", "range"):
            f, v, _side = _field_spec(typ, spec)
            self._meta_field(typ, f, cols)
            if typ == "term":
                if isinstance(v, dict):
                    v = v.get("value")
                return F.col(f) == F.lit(v)
            if typ == "terms":
                if not isinstance(v, (list, tuple)):
                    raise DslError(f"terms: expected a list for {f!r}")
                return F.col(f).isin(list(v))
            return self._range_col(f, v)
        if typ == "geo_distance":
            f = [k for k in spec if k not in ("distance",)]
            if len(f) != 1 or "distance" not in spec:
                raise DslError(
                    "geo_distance: need {'distance': ..., '<geo_field>': "
                    "{'lat': ..., 'lon': ...}}"
                )
            latc, lonc = self._geo_cols(typ, f[0], cols)
            pt = spec[f[0]]
            km = _parse_distance_km(spec["distance"])
            from ..query.engine import InvertedIndex

            d = F.round(
                InvertedIndex._haversine_km(
                    F.lit(float(pt["lat"])), F.lit(float(pt["lon"])),
                    F.col(latc), F.col(lonc),
                ),
                6,
            )
            return d <= F.lit(km)
        if typ == "geo_bounding_box":
            ((f, box),) = spec.items()
            latc, lonc = self._geo_cols(typ, f, cols)
            tl, br = box.get("top_left"), box.get("bottom_right")
            if not (isinstance(tl, dict) and isinstance(br, dict)):
                raise DslError(
                    "geo_bounding_box: need top_left/bottom_right "
                    "{'lat': ..., 'lon': ...}"
                )
            if float(tl["lon"]) > float(br["lon"]):
                raise DslError(
                    "geo_bounding_box: dateline-crossing boxes unsupported"
                )
            return F.col(latc).between(
                float(br["lat"]), float(tl["lat"])
            ) & F.col(lonc).between(float(tl["lon"]), float(br["lon"]))
        if typ == "nested":
            return self._nested_clause(spec, cols)
        if typ in ("match", "match_phrase", "wildcard", "prefix", "fuzzy"):
            raise DslError(
                f"{typ} in filter context: full-text clauses belong in "
                f"'must' (their score is constant in filter context, so "
                f"the must spelling is equivalent)"
            )
        raise DslError(f"unsupported clause in filter context: {typ!r}")

    # ------------------------------------------------------- nested clause
    def _nested_clause(self, spec: dict, cols: set | None) -> Column:
        """ES ``nested`` query (filter context): the inner query's
        conditions must co-match on the SAME array element — compiled to
        ONE ``exists`` over the array<struct> doc_stats column with the
        whole inner clause tree bound to the element variable. Pure
        Catalyst; the predicate evaluates inside the parent scan (a
        nested column rides the parent row group, so there is no
        child-table join — the Lucene block-join reading)."""
        path, q = spec.get("path"), spec.get("query")
        if not isinstance(path, str) or not isinstance(q, dict):
            raise DslError("nested: need {'path': ..., 'query': {...}}")
        try:
            elem = self.ix._nested_path(path)
        except ValueError as e:
            raise DslError(str(e)) from None
        if cols is not None:
            cols.add(path)
        fields = set(elem.names)
        return F.exists(
            F.col(path), lambda x: self._nested_pred(path, fields, q, x)
        )

    def _nested_pred(
        self, path: str, fields: set, clause: Any, x: Column
    ) -> Column:
        """Element-level predicate of a nested query's inner clause —
        term / terms / range / exists / match_all and arbitrarily nested
        bool over ``path.field`` struct fields, every leaf bound to the
        same element ``x`` (the ES nested contract)."""
        typ, spec = self._clause(clause)

        def sub(f) -> Column:
            name = f
            if isinstance(name, str) and name.startswith(path + "."):
                name = name[len(path) + 1:]
            if not isinstance(name, str) or name not in fields:
                raise DslError(
                    f"nested: {f!r} is not a field of {path!r} "
                    f"(fields: {sorted(fields)})"
                )
            return x[name]

        if typ == "match_all":
            return F.lit(True)
        if typ == "bool":
            must = [
                self._nested_pred(path, fields, c, x)
                for c in _as_list(spec.get("must"))
                + _as_list(spec.get("filter"))
            ]
            must_not = [
                _not_null_safe(self._nested_pred(path, fields, c, x))
                for c in _as_list(spec.get("must_not"))
            ]
            should = [
                self._nested_pred(path, fields, c, x)
                for c in _as_list(spec.get("should"))
            ]
            out = F.lit(True)
            for c in must + must_not:
                out = out & c
            if should:
                msm = spec.get("minimum_should_match")
                if msm is None:
                    msm = 0 if (must or spec.get("filter")) else 1
                msm = int(msm)
                if msm > 0:
                    n = sum(
                        F.coalesce(c.cast("int"), F.lit(0)) for c in should
                    )
                    out = out & (n >= F.lit(msm))
            return out
        if typ == "exists":
            return sub(spec.get("field")).isNotNull()
        if typ in ("term", "terms", "range"):
            f, v, _side = _field_spec(typ, spec)
            c = sub(f)
            if typ == "term":
                if isinstance(v, dict):
                    v = v.get("value")
                return c == F.lit(v)
            if typ == "terms":
                if not isinstance(v, (list, tuple)):
                    raise DslError(f"terms: expected a list for {f!r}")
                return c.isin(list(v))
            return self._range_pred(c, f, v)
        raise DslError(
            f"nested: unsupported inner clause {typ!r} (supported: term / "
            f"terms / range / exists / match_all / bool — full-text "
            f"clauses need an indexed field, which a nested element is "
            f"not)"
        )

    def _geo_cols(self, typ: str, f: str, cols: set | None) -> tuple[str, str]:
        """ES geo_point field -> the engine's two-numeric-column
        representation: ``<f>_lat``/``<f>_lon`` if stored (or runtime),
        else the bare ``lat``/``lon`` pair."""
        for pair in ((f"{f}_lat", f"{f}_lon"), ("lat", "lon")):
            if all(self.is_meta(c) for c in pair):
                if cols is not None:
                    cols.update(pair)
                return pair
        raise DslError(
            f"{typ}: geo field {f!r} needs doc_stats columns "
            f"'{f}_lat'/'{f}_lon' (or 'lat'/'lon') — stored meta columns "
            f"or runtime_mappings"
        )

    def _meta_field(self, typ: str, f, cols: set | None) -> None:
        if not isinstance(f, str) or not self.is_meta(f):
            hint = (
                f" ({f!r} is an indexed full-text field — use a scoring "
                f"clause)" if isinstance(f, str) and self.is_indexed(f)
                else ""
            )
            raise DslError(
                f"{typ}: {f!r} is not a stored metadata column "
                f"(doc_stats columns: {sorted(self.meta_cols)}){hint}"
            )
        if cols is not None:
            cols.add(f)

    @staticmethod
    def _range_pred(c: Column, f: str, v: Any) -> Column:
        if not isinstance(v, dict):
            raise DslError(f"range: expected bounds dict for {f!r}")
        conds = []
        for op, val in v.items():
            if op == "gte":
                conds.append(c >= F.lit(val))
            elif op == "gt":
                conds.append(c > F.lit(val))
            elif op == "lte":
                conds.append(c <= F.lit(val))
            elif op == "lt":
                conds.append(c < F.lit(val))
            elif op in ("boost", "format", "time_zone", "relation"):
                continue
            else:
                raise DslError(f"range: unknown bound {op!r}")
        if not conds:
            raise DslError(f"range: no bounds for {f!r}")
        out = conds[0]
        for c2 in conds[1:]:
            out = out & c2
        return out

    @classmethod
    def _range_col(cls, f: str, v: Any) -> Column:
        return cls._range_pred(F.col(f), f, v)

    def _filter_bool(self, spec: dict, cols: set | None) -> Column:
        must = [
            self.compile_filter(c, cols)
            for c in _as_list(spec.get("must")) + _as_list(spec.get("filter"))
        ]
        must_not = [
            _not_null_safe(self.compile_filter(c, cols))
            for c in _as_list(spec.get("must_not"))
        ]
        should = [
            self.compile_filter(c, cols)
            for c in _as_list(spec.get("should"))
        ]
        out = F.lit(True)
        for c in must + must_not:
            out = out & c
        if should:
            # ES: in a bool with no must/filter sibling, minimum_should_match
            # defaults to 1; with one present it defaults to 0
            msm = spec.get("minimum_should_match")
            if msm is None:
                msm = 0 if (must or spec.get("filter")) else 1
            msm = int(msm)
            if msm > 0:
                n = sum(
                    F.coalesce(c.cast("int"), F.lit(0)) for c in should
                )
                out = out & (n >= F.lit(msm))
        return out

    # ------------------------------------------------------------ utilities
    @staticmethod
    def _clause(clause: Any) -> tuple[str, Any]:
        if not isinstance(clause, dict) or len(clause) != 1:
            raise DslError(
                f"expected a single-key clause dict, got {clause!r}"
            )
        ((typ, spec),) = clause.items()
        return typ, spec

    def _text_field(self, typ: str, f: str) -> str | None:
        if not self.is_indexed(f):
            hint = (
                f" ({f!r} is a metadata column — use it in filter "
                f"context)" if self.is_meta(f) else ""
            )
            raise DslError(
                f"{typ}: {f!r} is not an indexed field "
                f"(indexed: {self.ix.fields}){hint}"
            )
        return None if f == self.ix.fields[0] else f

    def is_filterish(self, clause: dict) -> bool:
        """True when the clause compiles in filter context (metadata
        predicate / pure-filter bool) — used to split a scoring bool."""
        try:
            self.compile_filter(clause)
            return True
        except DslError:
            return False

    @staticmethod
    def _match_params(typ: str, v: Any) -> dict:
        """Normalize a match-family value (bare string or params dict)."""
        if isinstance(v, dict):
            if "query" not in v and "value" not in v:
                raise DslError(f"{typ}: missing 'query' in {v!r}")
            out = dict(v)
            out["query"] = v.get("query", v.get("value"))
            return out
        return {"query": v}


# --------------------------------------------------------------------------
# scoring dispatch
# --------------------------------------------------------------------------
def _and_all(cols: list[Column]) -> Column | None:
    if not cols:
        return None
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _const_hits(
    ix, filters: Column | None, k: int, offset: int,
    must_not_docs: DataFrame | None = None,
) -> DataFrame:
    """Constant-score hits (pure filter-context query): live docs under
    the predicate, score 1.0, doc_id order — the same shape every other
    constant-score operator in the engine emits."""
    ds = ix.doc_stats()
    if filters is not None:
        ds = ds.filter(filters)
    docs = ds.select("doc_id")
    if must_not_docs is not None:
        docs = docs.join(must_not_docs, "doc_id", "left_anti")
    out = (
        docs.withColumn("score", F.lit(1.0))
        .orderBy(F.asc("doc_id"))
        .limit(k + offset)
    )
    if offset:
        out = _apply_offset(out, offset, by_score=False)
    return out


def _apply_offset(df: DataFrame, offset: int, by_score: bool) -> DataFrame:
    from pyspark.sql.window import Window

    order = (
        [F.desc("score"), F.asc("doc_id")] if by_score else [F.asc("doc_id")]
    )
    w = Window.orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > offset)
        .drop("_rn")
    )


def _require_no_filters(typ: str, filters: Column | None) -> None:
    if filters is not None:
        raise DslError(
            f"{typ} under a bool filter is not supported through the DSL — "
            f"call the engine method directly, or express the predicate "
            f"with the match/term/terms/wildcard clause types (which "
            f"accept filters)"
        )


def _span_clause_terms(cp: _Compiler, clause: dict, typ: str) -> str:
    """A span sub-clause -> the engine's clause string: span_term {f: v}
    -> 'v'; a slop-0 in-order span_near of span_terms -> the phrase."""
    t, spec = cp._clause(clause)
    if t == "span_term":
        f, v, _ = _field_spec("span_term", spec)
        cp._text_field("span_term", f)
        if isinstance(v, dict):
            v = v.get("value")
        return str(v)
    if t == "span_near":
        if spec.get("slop", 0) != 0 or not spec.get("in_order", True):
            raise DslError(
                f"{typ}: nested span_near legs must be slop=0 in_order "
                f"(an exact phrase)"
            )
        return " ".join(
            _span_clause_terms(cp, c, typ) for c in spec.get("clauses", [])
        )
    raise DslError(f"{typ}: unsupported span sub-clause {t!r}")


def _span_slot(cp: _Compiler, clause: dict, typ: str):
    """A span_near sub-clause -> an engine span_near_slots slot:
    span_term -> the raw string (engine analyzes it on the near's field);
    span_multi -> the capped expansion as pre-analyzed alternatives;
    field_masking_span -> (inner slot terms, the inner clause's own field)
    — Lucene reads the masked clause's positions from ITS field and
    compares them as-is, which is exactly what a (terms, field) slot does."""
    t, spec = cp._clause(clause)
    if t == "span_multi":
        terms = cp.ix.expand_span_multi(
            spec["match"],
            max_expansions=int(spec.get("max_expansions", 128)),
        )
        # the inner multi-term query names its OWN field: the expansion
        # came from that field's dictionary, so positions must be scanned
        # there too (Lucene reads a span_multi's positions from the inner
        # query's field) — a bare term list would scan the span_near
        # default field instead
        (_ityp, ispec), = spec["match"].items()
        (ifield, _iv) = next(iter(ispec.items()))
        return (terms, ifield)
    if t == "field_masking_span":
        inner_t, inner_spec = cp._clause(spec["query"])
        if inner_t == "span_term":
            f, v, _ = _field_spec("span_term", inner_spec)
            cp._text_field("span_term", f)
            if isinstance(v, dict):
                v = v.get("value")
            toks = cp.ix._analyze(str(v), f)
            if len(toks) != 1:
                raise DslError(
                    f"field_masking_span: span_term {v!r} must analyze "
                    f"to one term"
                )
            return (toks, f)
        if inner_t == "span_multi":
            terms = cp.ix.expand_span_multi(
                inner_spec["match"],
                max_expansions=int(inner_spec.get("max_expansions", 128)),
            )
            f = next(iter(next(iter(inner_spec["match"].values()))))
            return (terms, f)
        raise DslError(
            f"field_masking_span: unsupported inner clause {inner_t!r}"
        )
    return _span_clause_terms(cp, clause, typ)


def _dispatch_leaf(
    cp: _Compiler,
    typ: str,
    spec: Any,
    *,
    k: int,
    filters: Column | None,
    round_scores: int | None,
    offset: int = 0,
    should: str | None = None,
    must_not: str | None = None,
    msm: int | None = None,
    search_after: tuple | None = None,
) -> DataFrame:
    ix = cp.ix
    topk_extras = dict(
        should=should, must_not=must_not, min_should_match=msm,
        search_after=search_after,
    )

    def plain(name):
        # leaves that take none of the bool-leg extras
        for key, v in topk_extras.items():
            if v is not None:
                raise DslError(
                    f"{name}: bool {key} legs are only supported around "
                    f"match/term clauses"
                )
        if offset:
            raise DslError(f"{name}: 'from' pagination not supported")

    if typ == "wrapper":
        # ES wrapper query: a base64-encoded JSON query, decoded and
        # dispatched as if written inline (all bool-leg extras pass
        # through — wrapper is transparent to its surroundings)
        import base64
        import json as _json

        if not isinstance(spec, dict) or "query" not in spec:
            raise DslError("wrapper: expected {'query': '<base64>'}")
        try:
            inner = _json.loads(base64.b64decode(spec["query"]))
        except Exception as e:  # noqa: BLE001 — surface as a DSL error
            raise DslError(f"wrapper: undecodable query: {e}") from e
        if not isinstance(inner, dict) or len(inner) != 1:
            raise DslError("wrapper: decoded body must be one query clause")
        (ityp, ispec), = inner.items()
        return _dispatch_leaf(
            cp, ityp, ispec, k=k, filters=filters,
            round_scores=round_scores, offset=offset, should=should,
            must_not=must_not, msm=msm, search_after=search_after,
        )
    if typ in ("sparse_vector", "text_expansion"):
        # ES sparse_vector: {field|<field>: {tokens|model_text...}} —
        # supported form: explicit query-side token weights
        plain(typ)
        body = spec
        if typ == "text_expansion":  # legacy: {field: {"model_text"...}}
            if not isinstance(spec, dict) or len(spec) != 1:
                raise DslError("text_expansion: expected one field block")
            body = next(iter(spec.values()))
        if not isinstance(body, dict) or not isinstance(
            body.get("tokens") or body.get("query_vector"), dict
        ):
            raise DslError(
                f"{typ}: expected explicit token weights under 'tokens' "
                f"(or 'query_vector'); model inference is not embedded"
            )
        weights = body.get("tokens") or body.get("query_vector")
        fld = body.get("field")
        return ix.sparse_vector(
            {str(t): float(w) for t, w in weights.items()}, k=k,
            field=fld, filters=filters, round_scores=round_scores,
        )
    if typ == "match":
        f, v, side = _field_spec(typ, spec)
        p = cp._match_params(typ, v)
        field = cp._text_field(typ, f)
        mode = str(p.get("operator", "or")).lower()
        if mode not in ("or", "and"):
            raise DslError(f"match: unknown operator {p['operator']!r}")
        if "fuzziness" in p:
            plain(typ)
            _require_no_filters(typ, filters)
            return ix.match_fuzzy(
                p["query"], k=k, fuzziness=p["fuzziness"], field=field,
                max_expansions=int(p.get("max_expansions", 50)),
                prefix_length=int(p.get("prefix_length", 0)),
                transpositions=bool(p.get("fuzzy_transpositions", True)),
                operator=mode, round_scores=round_scores,
            )
        boost = float(side.get("boost", p.get("boost", 1.0)))
        boosts = None
        if boost != 1.0:
            toks = ix._analyze(p["query"], field)
            boosts = {t: boost for t in toks}
        m = p.get("minimum_should_match")
        return ix.topk(
            p["query"], k=k, mode=mode, filters=filters, field=field,
            round_scores=round_scores, offset=offset, boosts=boosts,
            should=should, must_not=must_not,
            min_should_match=msm if msm is not None
            else (int(m) if m is not None else None),
            search_after=search_after,
        )
    if typ == "match_all":
        plain(typ)
        return _const_hits(ix, filters, k, offset)
    if typ == "term":
        f, v, side = _field_spec(typ, spec)
        if isinstance(v, dict):
            side.update({kk: vv for kk, vv in v.items() if kk in _SIDE_KEYS})
            v = v.get("value")
        field = cp._text_field(typ, f)
        boost = float(side.get("boost", 1.0))
        return ix.topk(
            str(v), k=k, filters=filters, field=field,
            round_scores=round_scores, offset=offset,
            boosts=(
                {t: boost for t in ix._analyze(str(v), field)}
                if boost != 1.0 else None
            ),
            should=should, must_not=must_not, min_should_match=msm,
            search_after=search_after,
        )
    if typ == "terms":
        f, v, _side = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        plain(typ)
        if isinstance(v, dict):
            # terms lookup: {field: {index/id/path}} — the engine resolves
            # the id against its own doc store
            key = v.get("id")
            path = v.get("path")
            if key is None or path is None:
                raise DslError("terms lookup: need 'id' and 'path'")
            return ix.terms_lookup((key,), path, field=field, k=k)
        return ix.terms_query(list(v), k=k, field=field, filters=filters)
    if typ == "terms_set":
        f, v, _side = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        mmf = (v or {}).get("minimum_should_match_field")
        if not mmf:
            raise DslError("terms_set: need minimum_should_match_field")
        return ix.terms_set(list(v.get("terms", [])), mmf, k=k, field=field)
    if typ in ("wildcard", "prefix"):
        f, v, _side = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        plain(typ)
        if isinstance(v, dict):
            v = v.get("value")
        pat = str(v)
        if typ == "prefix":
            return ix.wildcard(pat, k=k, filters=filters, field=field)
        if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
            return ix.wildcard(pat[:-1], k=k, filters=filters, field=field)
        # general wildcard pattern -> the regexp operator
        _require_no_filters("wildcard (non-prefix pattern)", filters)
        import re as _re

        rx = "".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in pat
        )
        return ix.regexp(rx, k=k, field=field)
    if typ == "fuzzy":
        f, v, _side = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        p = v if isinstance(v, dict) else {"value": v}
        return ix.fuzzy(
            str(p["value"]), k=k, field=field,
            max_dist=p.get("fuzziness", "AUTO"),
            transpositions=bool(p.get("transpositions", True)),
            prefix_length=int(p.get("prefix_length", 0)),
            max_expansions=int(p.get("max_expansions", 50)),
        )
    if typ == "regexp":
        f, v, _side = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        if isinstance(v, dict):
            v = v.get("value")
        return ix.regexp(str(v), k=k, field=field)
    if typ == "match_phrase":
        f, v, _side = _field_spec(typ, spec)
        p = cp._match_params(typ, v)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        # query context scores (Lucene PhraseQuery BM25) — any analyzed
        # field: non-primary dl decodes from the rarest phrase term's
        # posting runs. slop>0 scores the anchored-window sloppy phrase
        # with 1/(1+cost)-weighted anchors (engine._phrase_scores).
        # Filter-context phrases (bool.filter) stay constant-score.
        return ix.match_phrase_scored(
            p["query"], k=k, field=field, round_scores=round_scores,
            slop=int(p.get("slop", 0)),
        )
    if typ == "match_phrase_prefix":
        f, v, _side = _field_spec(typ, spec)
        p = cp._match_params(typ, v)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.match_phrase_prefix(
            p["query"], k=k, field=field,
            max_expansions=int(p.get("max_expansions", 50)),
        )
    if typ == "match_bool_prefix":
        f, v, _side = _field_spec(typ, spec)
        p = cp._match_params(typ, v)
        field = cp._text_field(typ, f)
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.match_bool_prefix(
            p["query"], k=k, field=field, round_scores=round_scores,
            max_expansions=int(p.get("max_expansions", 50)),
        )
    if typ == "multi_match":
        plain(typ)
        _require_no_filters(typ, filters)
        if not isinstance(spec, dict) or "query" not in spec:
            raise DslError("multi_match: need 'query' and 'fields'")
        fields = spec.get("fields") or []
        if not fields:
            raise DslError("multi_match: need non-empty 'fields'")
        mt = spec.get("type", "most_fields")
        if mt == "bool_prefix":
            return ix.search_as_you_type(
                spec["query"], k=k, round_scores=round_scores
            )
        if mt in ("phrase", "phrase_prefix"):
            slop = int(spec.get("slop", 0))
            if slop and mt != "phrase":
                raise DslError(
                    "multi_match: slop only applies to type=phrase"
                )
            return ix.multi_match_phrase(
                spec["query"], fields=list(fields), k=k, match_type=mt,
                tie_breaker=float(spec.get("tie_breaker", 0.0)),
                max_expansions=int(spec.get("max_expansions", 50)),
                round_scores=round_scores, slop=slop,
            )
        if mt not in ("most_fields", "best_fields", "cross_fields"):
            raise DslError(f"multi_match: unsupported type {mt!r}")
        op = str(spec.get("operator", "or")).lower()
        if op != "or" and mt != "cross_fields":
            raise DslError(
                "multi_match: 'operator' is only supported for "
                "type=cross_fields (term-centric AND)"
            )
        return ix.multi_match(
            spec["query"], fields=list(fields), k=k, match_type=mt,
            tie_breaker=float(spec.get("tie_breaker", 0.0)),
            operator=op,
            round_scores=round_scores,
        )
    if typ == "combined_fields":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.combined_fields(
            spec["query"], fields=list(spec.get("fields") or []),
            k=k, round_scores=round_scores,
        )
    if typ == "query_string":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.query_string(
            spec["query"], k=k,
            default_operator=str(spec.get("default_operator", "or")).lower(),
            field=(
                cp._text_field(typ, spec["default_field"])
                if spec.get("default_field") else None
            ),
            round_scores=round_scores,
        )
    if typ == "simple_query_string":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.simple_query_string(
            spec["query"], k=k,
            default_operator=str(spec.get("default_operator", "or")).lower(),
            round_scores=round_scores,
        )
    if typ == "more_like_this":
        plain(typ)
        _require_no_filters(typ, filters)
        like = spec.get("like")
        if isinstance(like, (list, tuple)):
            like = " ".join(str(x) for x in like)
        kwargs = {}
        m = spec.get("minimum_should_match")
        if m is not None:
            kwargs["min_should_match"] = int(m)
        return ix.more_like_this(
            str(like), k=k,
            max_query_terms=int(spec.get("max_query_terms", 25)),
            min_term_freq=int(spec.get("min_term_freq", 2)),
            min_doc_freq=int(spec.get("min_doc_freq", 5)),
            round_scores=round_scores, **kwargs,
        )
    if typ == "boosting":
        plain(typ)
        _require_no_filters(typ, filters)
        pos = cp._match_params(typ, _field_spec(
            typ, cp._clause(spec["positive"])[1])[1])
        neg = cp._match_params(typ, _field_spec(
            typ, cp._clause(spec["negative"])[1])[1])
        return ix.boosting(
            pos["query"], neg["query"],
            negative_boost=float(spec.get("negative_boost", 0.5)),
            k=k, round_scores=round_scores,
        )
    if typ == "match_none":
        plain(typ)
        from ..functions.localrel import local_df
        return local_df(ix.spark, [], "doc_id long, score double")
    if typ == "wrapper":
        # ES wrapper query: a base64-encoded JSON query, dispatched as if
        # it appeared inline (clients that must smuggle queries through
        # strict JSON schemas use this) — fully transparent: pagination
        # and bool legs pass through to the decoded query
        import base64
        import json as _json

        try:
            inner = _json.loads(base64.b64decode(spec["query"]))
        except Exception as exc:
            raise DslError(f"wrapper: undecodable query payload: {exc}")
        inner_t, inner_s = cp._clause(inner)
        return _dispatch_leaf(
            cp, inner_t, inner_s, k=k, filters=filters,
            round_scores=round_scores, offset=offset,
            should=should, must_not=must_not, msm=msm,
            search_after=search_after,
        )
    if typ == "constant_score":
        plain(typ)
        inner = spec.get("filter")
        if inner is None:
            raise DslError("constant_score: need 'filter'")
        col = cp.compile_filter(inner)
        if filters is not None:
            col = col & filters
        boost = float(spec.get("boost", 1.0))
        hits = _const_hits(ix, col, k, offset)
        if boost != 1.0:
            hits = hits.withColumn(
                "score", (F.col("score") * F.lit(boost)).cast("double")
            )
        return hits
    if typ == "ids":
        plain(typ)
        col = cp.compile_filter({"ids": spec})
        if filters is not None:
            col = col & filters
        return _const_hits(ix, col, k, offset)
    if typ in ("exists", "range"):
        plain(typ)
        col = cp.compile_filter({typ: spec})
        if filters is not None:
            col = col & filters
        return _const_hits(ix, col, k, offset)
    if typ == "function_score":
        plain(typ)
        _require_no_filters(typ, filters)
        return _function_score(cp, spec, k, round_scores)
    if typ == "script_score":
        plain(typ)
        _require_no_filters(typ, filters)
        inner_t, inner_s = cp._clause(spec.get("query", {"match_all": {}}))
        if inner_t != "match":
            raise DslError("script_score: inner query must be a match clause")
        f, v, _ = _field_spec("match", inner_s)
        p = cp._match_params("match", v)
        script = spec.get("script") or {}
        if "source" not in script:
            raise DslError("script_score: script.source is required")
        return cp.ix.script_score(
            p["query"], script["source"], params=script.get("params"),
            k=k, min_score=spec.get("min_score"),
            field=cp._text_field("match", f), round_scores=round_scores,
        )
    if typ == "pinned":
        plain(typ)
        _require_no_filters(typ, filters)
        org_t, org_s = cp._clause(spec["organic"])
        if org_t != "match":
            raise DslError("pinned: organic must be a match clause")
        f, v, _ = _field_spec("match", org_s)
        p = cp._match_params("match", v)
        cp._text_field("match", f)
        return ix.pinned(
            p["query"], [int(i) for i in spec.get("ids", [])], k=k
        )
    if typ == "intervals":
        plain(typ)
        _require_no_filters(typ, filters)
        # ES shape: {"intervals": {"<field>": {<source>}}} — one field key
        if len(spec) != 1:
            raise DslError("intervals: exactly one field key expected")
        fld, source = next(iter(spec.items()))
        return ix.intervals_query(
            source, k=k, field=cp._text_field(typ, fld)
        )
    if typ == "span_near":
        plain(typ)
        _require_no_filters(typ, filters)
        kinds = {cp._clause(c)[0] for c in spec.get("clauses", [])}
        if kinds & {"span_multi", "field_masking_span"}:
            slots = [_span_slot(cp, c, typ) for c in spec.get("clauses", [])]
            return ix.span_near_slots(
                slots, slop=int(spec.get("slop", 0)),
                in_order=bool(spec.get("in_order", True)), k=k,
            )
        terms = [
            _span_clause_terms(cp, c, typ) for c in spec.get("clauses", [])
        ]
        return ix.span_near(
            terms, slop=int(spec.get("slop", 0)),
            in_order=bool(spec.get("in_order", True)), k=k,
        )
    if typ == "span_multi":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.span_multi(
            spec["match"], k=k,
            max_expansions=int(spec.get("max_expansions", 128)),
        )
    if typ == "span_or":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.span_or(
            [_span_clause_terms(cp, c, typ) for c in spec.get("clauses", [])],
            k=k,
        )
    if typ == "span_term":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.span_or([_span_clause_terms(cp, {typ: spec}, typ)], k=k)
    if typ == "span_first":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.span_first(
            _span_clause_terms(cp, spec["match"], typ),
            int(spec["end"]), k=k,
        )
    if typ == "span_not":
        plain(typ)
        _require_no_filters(typ, filters)
        return ix.span_not(
            _span_clause_terms(cp, spec["include"], typ),
            _span_clause_terms(cp, spec["exclude"], typ),
            pre=int(spec.get("pre", 0)), post=int(spec.get("post", 0)), k=k,
        )
    if typ in ("span_containing", "span_within"):
        plain(typ)
        _require_no_filters(typ, filters)
        big_t, big_s = cp._clause(spec["big"])
        if big_t == "span_near":
            big = [
                _span_clause_terms(cp, c, typ)
                for c in big_s.get("clauses", [])
            ]
            slop = int(big_s.get("slop", 0))
            in_order = bool(big_s.get("in_order", True))
        else:
            big = [_span_clause_terms(cp, spec["big"], typ)]
            slop, in_order = 0, True
        little = _span_clause_terms(cp, spec["little"], typ)
        if typ == "span_containing":
            return ix.span_containing(
                big, little, slop=slop, in_order=in_order, k=k
            )
        return ix.span_within(little, big, slop=slop, in_order=in_order, k=k)
    if typ == "nested":
        # bare top-level nested query (the common ES spelling): non-scoring
        # constant-score hits, same treatment as exists/range/ids
        plain(typ)
        ih = spec.get("inner_hits")
        col = cp.compile_filter({typ: spec})
        if filters is not None:
            col = col & filters
        if ih is None:
            return _const_hits(ix, col, k, offset)
        # inner_hits: attach the MATCHING elements (first `size` in array
        # order) to each hit — F.filter over the same array column the
        # exists predicate scanned, still one parent-row read, no explode
        if not isinstance(ih, dict):
            raise DslError("nested inner_hits: expected an object")
        size = int(ih.get("size", 3))
        path, q = spec["path"], spec["query"]
        fields = set(ix._nested_path(path).names)
        matches = F.filter(
            F.col(path), lambda x: cp._nested_pred(path, fields, q, x)
        )
        out = (
            ix.doc_stats()
            .filter(col)
            .select(
                "doc_id",
                F.lit(1.0).alias("score"),
                F.slice(matches, 1, size).alias("inner_hits"),
            )
            .orderBy(F.asc("doc_id"))
            .limit(k + offset)
        )
        return _apply_offset(out, offset, by_score=False) if offset else out
    raise DslError(f"unsupported query clause: {typ!r}")


def _function_score(cp: _Compiler, spec: dict, k, round_scores) -> DataFrame:
    ix = cp.ix
    inner_t, inner_s = cp._clause(spec.get("query", {"match_all": {}}))
    if inner_t != "match":
        raise DslError("function_score: inner query must be a match clause")
    f, v, _ = _field_spec("match", inner_s)
    p = cp._match_params("match", v)
    field = cp._text_field("match", f)
    boost_mode = spec.get("boost_mode", "multiply")
    fns = _as_list(spec.get("functions"))
    if "field_value_factor" in spec or any(
        "field_value_factor" in fn for fn in fns
    ):
        fvf = spec.get("field_value_factor") or next(
            fn["field_value_factor"] for fn in fns
            if "field_value_factor" in fn
        )
        return ix.function_score(
            p["query"], k=k, factor_col=fvf["field"],
            modifier=fvf.get("modifier", "none"),
            factor=float(fvf.get("factor", 1.0)),
            boost_mode=boost_mode, field=field, round_scores=round_scores,
        )
    if "random_score" in spec or any("random_score" in fn for fn in fns):
        rs = spec.get("random_score") or next(
            fn["random_score"] for fn in fns if "random_score" in fn
        )
        return ix.random_score(
            p["query"], seed=int(rs.get("seed", 0)), k=k, field=field
        )
    for decay_fn in ("gauss", "exp", "linear"):
        holder = (
            spec if decay_fn in spec
            else next((fn for fn in fns if decay_fn in fn), None)
        )
        if holder is not None:
            df_, dv, _ = _field_spec(decay_fn, holder[decay_fn])
            return ix.decay_score(
                p["query"], k=k, on=df_,
                origin=float(dv["origin"]), scale=float(dv["scale"]),
                offset=float(dv.get("offset", 0.0)),
                decay=float(dv.get("decay", 0.5)),
                fn=decay_fn, boost_mode=boost_mode, field=field,
                round_scores=round_scores,
            )
    raise DslError(
        "function_score: supported functions are field_value_factor, "
        "random_score, gauss/exp/linear decay"
    )


# --------------------------------------------------------------------------
# the scoring bool
# --------------------------------------------------------------------------
_MATCHISH = ("match", "term")


def _bool_query(
    cp: _Compiler,
    spec: dict,
    *,
    k: int,
    offset: int,
    round_scores: int | None,
    search_after: tuple | None,
) -> DataFrame:
    ix = cp.ix
    must = _as_list(spec.get("must"))
    should = _as_list(spec.get("should"))
    must_not = _as_list(spec.get("must_not"))
    filt = _as_list(spec.get("filter"))
    msm_raw = spec.get("minimum_should_match")

    filter_cols: list[Column] = [cp.compile_filter(c) for c in filt]
    text_must, text_should, text_must_not = [], [], []
    for c in must:
        if cp.is_filterish(c):
            filter_cols.append(cp.compile_filter(c))
        else:
            text_must.append(c)
    for c in must_not:
        if cp.is_filterish(c):
            filter_cols.append(_not_null_safe(cp.compile_filter(c)))
        else:
            text_must_not.append(c)
    for c in should:
        if cp.is_filterish(c):
            raise DslError(
                "bool should with a metadata clause: wrap it in a nested "
                "pure-filter bool inside 'filter' instead (optional "
                "metadata clauses only affect constant scores)"
            )
        text_should.append(c)
    filters = _and_all(filter_cols)

    # must_not text legs -> one analyzed exclusion string (the engine's
    # term-level anti-set rides the tombstone mask machinery)
    mn_query = None
    if text_must_not:
        parts = []
        for c in text_must_not:
            t, s = cp._clause(c)
            if t not in _MATCHISH:
                raise DslError(
                    f"bool must_not supports match/term text clauses "
                    f"(got {t!r}) besides metadata predicates"
                )
            f, v, _ = _field_spec(t, s)
            cp._text_field(t, f)
            p = cp._match_params(t, v)
            parts.append(str(p["query"]))
        mn_query = " ".join(parts)

    # should text legs -> one optional-scoring string
    sh_query = None
    if text_should:
        parts = []
        for c in text_should:
            t, s = cp._clause(c)
            if t not in _MATCHISH:
                raise DslError(
                    f"bool should supports match/term clauses (got {t!r})"
                )
            f, v, _ = _field_spec(t, s)
            cp._text_field(t, f)
            p = cp._match_params(t, v)
            parts.append(str(p["query"]))
        sh_query = " ".join(parts)

    msm = int(msm_raw) if msm_raw is not None else None

    if not text_must and not text_should:
        # pure filter bool: constant score
        if search_after is not None:
            raise DslError("search_after needs a scored query")
        mn_docs = None
        if mn_query is not None:
            mn_docs = ix._docs_for_terms(
                sorted(set(ix._analyze(mn_query, None))), 0
            ).select("doc_id")
        return _const_hits(ix, filters, k, offset, must_not_docs=mn_docs)

    if not text_must:
        # should-only bool: ≥1 should clause must match (ES default);
        # clauses merge into one OR-mode BM25 pass
        return ix.topk(
            sh_query, k=k, mode="or", filters=filters,
            round_scores=round_scores, offset=offset, must_not=mn_query,
            min_should_match=msm, search_after=search_after,
        )

    if len(text_must) == 1:
        t, s = cp._clause(text_must[0])
        return _dispatch_leaf(
            cp, t, s, k=k, filters=filters, round_scores=round_scores,
            offset=offset, should=sh_query, must_not=mn_query, msm=msm,
            search_after=search_after,
        )

    # several must clauses: each must reduce to terms over ONE field; the
    # AND-mode BM25 pass sums the same per-term contributions ES would
    # (Running-ELK.md:234-239 — bool must of two match clauses)
    queries, fields = [], set()
    for c in text_must:
        t, s = cp._clause(c)
        if t not in _MATCHISH:
            raise DslError(
                f"bool with multiple must clauses supports match/term "
                f"legs (got {t!r}); put the single complex clause alone "
                f"in must"
            )
        f, v, _ = _field_spec(t, s)
        fields.add(cp._text_field(t, f))
        p = cp._match_params(t, v)
        queries.append(str(p["query"]))
    if len(fields) > 1:
        raise DslError(
            "bool must clauses across different fields: use multi_match "
            "or combined_fields"
        )
    return ix.topk(
        " ".join(queries), k=k, mode="and", filters=filters,
        field=next(iter(fields)), round_scores=round_scores, offset=offset,
        should=sh_query, must_not=mn_query, search_after=search_after,
    )


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------
def _vector_search(
    cp: _Compiler, body: dict, size: int, round_scores,
    emb: DataFrame | None, id_col: str, vec_col: str, ann=None,
) -> DataFrame:
    """ES 8 vector request forms: a top-level ``knn`` section (pure kNN
    with optional metadata ``filter``) or ``retriever: {rrf: ...}``
    (hybrid BM25 + cosine legs fused by Reciprocal Rank Fusion). Both
    need the embedding table passed via ``search(..., emb=...)`` — the
    engine keeps embeddings as a separate aligned table (the
    documents↔embeddings contract) rather than an index-internal
    column. ``num_candidates`` is accepted and ignored: the leg here is
    exact brute-force (swap an ANN index probe in for the 100-TB path)."""
    ix = cp.ix
    if emb is None and not (ann is not None and "retriever" not in body):
        raise DslError(
            "knn/retriever bodies need the embedding table: "
            "search(body, emb=<DataFrame>, emb_id_col=..., emb_vec_col=...) "
            "— or an ANN index via ann= for pure-knn bodies"
        )
    if "retriever" in body:
        r = body["retriever"]
        if (
            not isinstance(r, dict)
            or len(r) != 1
            or next(iter(r)) not in ("rrf", "linear")
        ):
            raise DslError(
                f"retriever: only 'standard', 'rrf' and 'linear' are "
                f"supported (got {sorted(r) if isinstance(r, dict) else r!r})"
            )
        kind, rr = next(iter(r.items()))
        std = knn = None
        wstd = wknn = 1.0
        for sub in _as_list(rr.get("retrievers")):
            # rrf entries are bare {"standard": ...} / {"knn": ...};
            # linear (8.18) wraps them: {"retriever": {...}, "weight",
            # "normalizer"}
            entry = sub.get("retriever", sub)
            if kind == "linear":
                norm = sub.get("normalizer", "none")
                if norm != "minmax":
                    # ES defaults to 'none' (raw-score sum); only the
                    # minmax form is implemented — require it spelled out
                    # rather than silently mis-ranking
                    raise DslError(
                        f"linear: normalizer {norm!r} is not supported — "
                        "set normalizer='minmax' on every leg"
                    )
            if "standard" in entry:
                std = entry["standard"].get("query", {})
                wstd = float(sub.get("weight", 1.0))
            elif "knn" in entry:
                knn = entry["knn"]
                wknn = float(sub.get("weight", 1.0))
            else:
                raise DslError(
                    f"{kind}: unsupported retriever {sorted(entry)}"
                )
        if std is None or knn is None:
            raise DslError(
                f"{kind}: need exactly one standard and one knn retriever"
            )
        t, s = cp._clause(std)
        if t not in _MATCHISH:
            raise DslError(
                f"{kind}: the standard retriever must be match/term (got {t!r})"
            )
        f, v, _ = _field_spec(t, s)
        qtext = str(cp._match_params(t, v)["query"])
        qvec = [float(x) for x in knn["query_vector"]]
        window = int(rr.get("rank_window_size", 100))
        if kind == "rrf":
            return ix.hybrid_rrf(
                qtext, qvec, emb, k=size, window=window,
                rank_constant=int(rr.get("rank_constant", 60)),
                field=cp._text_field(t, f), id_col=id_col, vec_col=vec_col,
            )
        return ix.hybrid_linear(
            qtext, qvec, emb, k=size, window=window,
            lex_weight=wstd, vec_weight=wknn,
            field=cp._text_field(t, f), id_col=id_col, vec_col=vec_col,
        )
    # ---- top-level knn section
    if body.get("query") not in (None, {}, {"match_all": {}}):
        raise DslError(
            "knn + query combined scoring is not supported — use "
            "retriever: {rrf: ...} for hybrid ranking"
        )
    spec = body["knn"]
    qv = spec.get("query_vector")
    if not qv:
        raise DslError("knn: need 'query_vector'")
    fld = spec.get("field", vec_col)
    if fld != vec_col:
        raise DslError(
            f"knn: field {fld!r} is not the embedding column ({vec_col!r})"
        )
    k = int(spec.get("k", size))
    if ann is not None:
        # true ANN probe (IvfAnnIndex / LshAnnIndex over the same
        # embedding table) — the 100-TB knn leg. Filter + tombstones
        # compose into ONE allowed set, pre-filtering candidates BEFORE
        # the exact rerank (ES 8 filtered-kNN order).
        aid = ann.id_col
        allowed = None
        if spec.get("filter") is not None:
            allowed = (
                ix.doc_stats()
                .filter(cp.compile_filter(spec["filter"]))
                .select(F.col("doc_id").alias(aid))
            )
        tomb = ix._tombstones()
        if tomb is not None:
            base = (
                allowed if allowed is not None
                else ann.table.select(aid)
            )
            allowed = base.join(
                tomb.withColumnRenamed("doc_id", aid), aid, "left_anti"
            )
        import inspect

        kwargs = {}
        params = inspect.signature(ann.topk).parameters
        for knob in ("nprobe", "multiprobe"):
            if knob in spec:
                if knob not in params:
                    # an explicit tuning knob the index cannot honor must
                    # raise, not silently run with defaults
                    raise DslError(
                        f"knn: {knob!r} is not a knob of "
                        f"{type(ann).__name__}.topk"
                    )
                kwargs[knob] = int(spec[knob])
        hits = ann.topk(
            [float(x) for x in qv], k=min(k, size), allowed=allowed,
            **kwargs,
        ).select(F.col(aid).alias("doc_id"), F.col("cosine").alias("score"))
    else:
        src = emb
        tomb = ix._tombstones()
        if tomb is not None:
            # deleted docs must not hold neighbour slots (same live-set
            # rule as hybrid_rrf's vector leg)
            src = src.join(
                tomb.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
            )
        if spec.get("filter") is not None:
            allowed = (
                ix.doc_stats()
                .filter(cp.compile_filter(spec["filter"]))
                .select(F.col("doc_id").alias(id_col))
            )
            src = src.join(allowed, id_col, "left_semi")
        from ..operators.similarity import brute_force_cosine_topk

        hits = brute_force_cosine_topk(
            src, [float(x) for x in qv], k=min(k, size),
            id_col=id_col, vec_col=vec_col,
        ).select(
            F.col(id_col).alias("doc_id"), F.col("cosine").alias("score")
        )
    if spec.get("similarity") is not None:
        # ES 8.8 knn similarity cutoff: drop neighbours below the
        # threshold AFTER the k cut (ES documents exactly this order —
        # it can return fewer than k, never different ones)
        hits = hits.filter(F.col("score") >= float(spec["similarity"]))
    if round_scores is not None:
        hits = hits.withColumn("score", F.round("score", round_scores))
    return hits.orderBy(F.desc("score"), F.asc("doc_id"))


def _apply_pit(ix, body: dict, default_pin: bool = False):
    """Apply a body's ``pit`` key — ES carries ``{"pit": {"id": ...,
    "keep_alive": ...}}``; the id here is :meth:`open_pit`'s snapshot
    dict (keep_alive has no meaning — the snapshot lives until compaction
    drops its tombstone files). With ``default_pin``, open a fresh
    snapshot when the body has none (scan's scroll-consistency
    default)."""
    pit = body.get("pit")
    if pit is None:
        return ix.with_pit(ix.open_pit()) if default_pin else ix
    spec = pit.get("id", pit) if isinstance(pit, dict) else None
    if not isinstance(spec, dict) or "tombstone_files" not in spec:
        raise DslError(
            "pit: expected {'id': <InvertedIndex.open_pit() result>}"
        )
    return ix.with_pit(spec)


def search(
    ix, body: dict, round_scores: int | None = None,
    emb: DataFrame | None = None, emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding", ann=None,
) -> DataFrame:
    """Run an ES ``_search`` request body, returning the hits DataFrame
    (doc_id, score). Top-level keys: ``query`` (default match_all),
    ``size`` / ``from``, ``search_after``, ``min_score``, ``sort``,
    ``collapse``, ``highlight``, ``rescore``, ``_source``, ``knn``,
    ``retriever`` (vector forms need ``emb``). Aggregations run through
    :func:`aggs`. ``ann`` (an IvfAnnIndex / LshAnnIndex built over the
    same embedding table) makes the ``knn`` section a true ANN probe —
    the 100-TB path — with ``nprobe``/``multiprobe`` accepted as body
    knobs next to ES's ``num_candidates``."""
    if not isinstance(body, dict):
        raise DslError("body must be a dict")
    ix = _apply_runtime(ix, body)
    ix = _apply_pit(ix, body)
    cp = _Compiler(ix)
    size = int(body.get("size", 10))
    r0 = body.get("retriever")
    if r0 is not None and "query" in body:
        # ES rejects the combination with a 400
        raise DslError("[retriever] and [query] cannot be used together")
    if isinstance(r0, dict) and set(r0) == {"standard"}:
        # ES 8.14 standard retriever = a plain query (+ optional filter) —
        # unwrap and take the ordinary search path, no embedding needed
        inner = r0["standard"]
        unsupported = set(inner) - {"query", "filter"}
        if unsupported:
            raise DslError(
                f"standard retriever: unsupported fields {sorted(unsupported)} "
                "(query/filter only)"
            )
        body = {k: v for k, v in body.items() if k != "retriever"}
        q0 = inner.get("query", {"match_all": {}})
        if inner.get("filter") is not None:
            q0 = {"bool": {"must": [q0], "filter": _as_list(inner["filter"])}}
        body["query"] = q0
    if "retriever" in body or "knn" in body:
        return _vector_search(
            cp, body, size, round_scores, emb, emb_id_col, emb_vec_col,
            ann=ann,
        )
    offset = int(body.get("from", 0))
    q = body.get("query", {"match_all": {}})
    sa = body.get("search_after")
    search_after = tuple(sa) if sa is not None else None

    # ------- exclusive decorated forms: sort / collapse / highlight / rescore
    decorated = [
        kk for kk in ("sort", "collapse", "highlight", "rescore")
        if body.get(kk) is not None
    ]
    if len(decorated) > 1:
        raise DslError(
            f"only one of sort/collapse/highlight/rescore per body "
            f"(got {decorated})"
        )
    if decorated:
        if offset or search_after is not None:
            raise DslError(
                f"{decorated[0]}: 'from'/'search_after' pagination is not "
                f"supported on decorated queries"
            )
        return _decorated(cp, decorated[0], body, q, size, round_scores)

    typ, spec = cp._clause(q)
    if typ == "bool":
        hits = _bool_query(
            cp, spec, k=size, offset=offset, round_scores=round_scores,
            search_after=search_after,
        )
    elif typ in ("term", "terms") and not isinstance(spec, dict):
        raise DslError(f"{typ}: expected {{field: ...}}")
    elif typ in ("term", "terms") and not cp.is_indexed(
        _field_spec(typ, spec)[0]
    ):
        # the reference's documented shape: term/terms over a stored
        # metadata column is a constant-score filter query
        # (Running-ELK.md:257-263, 287-291)
        if search_after is not None:
            raise DslError("search_after needs a scored query")
        hits = _const_hits(cp.ix, cp.compile_filter(q), size, offset)
    else:
        hits = _dispatch_leaf(
            cp, typ, spec, k=size, filters=None, round_scores=round_scores,
            offset=offset, search_after=search_after,
        )
    ih_reqs = (
        _collect_inner_hits(q) if typ in ("bool", "constant_score") else []
    )
    if ih_reqs:
        # nested inner_hits inside a bool tree: attach the matching
        # elements per request as a column (F.filter + F.slice over the
        # same array column the exists predicate scanned — one doc_stats
        # join for all requests, no explode). Column naming: ES names
        # inner_hits sections by `name` (default: the path) —
        # `inner_hits_<name>` here. A hit that matched via OTHER bool
        # legs gets an empty array, like ES's empty inner_hits block.
        seen: set[str] = set()
        proj = [F.col("doc_id")]
        for col_name, path, iq, sz in ih_reqs:
            if col_name in seen:
                raise DslError(
                    f"inner_hits: duplicate section name {col_name!r} — "
                    "give each nested inner_hits a distinct 'name'"
                )
            seen.add(col_name)
            fields = set(ix._nested_path(path).names)

            def _pred(p, flds, q_):
                # bind loop vars per request (HOF lambdas must be unary)
                return lambda x: cp._nested_pred(p, flds, q_, x)

            matches = F.filter(F.col(path), _pred(path, fields, iq))
            proj.append(F.slice(matches, 1, sz).alias(col_name))
        hits = hits.join(
            ix.doc_stats().select(*proj), "doc_id", "left"
        ).orderBy(F.desc("score"), F.asc("doc_id"))
    ms = body.get("min_score")
    if ms is not None:
        hits = hits.filter(F.col("score") >= F.lit(float(ms)))
    tth = body.get("track_total_hits")
    if tth is not None and tth is not False:
        # ES track_total_hits: the accurate match-set size regardless of
        # `size` — ES runs the same counting collector over the full match
        # set; here it's the engine's count path (one posting-df pass, no
        # scoring). Emitted as a constant column next to every hit (the
        # hits.total.value of the response envelope). An integer threshold
        # is accepted and still counts exactly (ES's cap is a latency
        # trade; the count pass here is already the cheap path).
        hits = hits.withColumn(
            "total_hits", F.lit(int(count(ix, {"query": q})))
        )
    src = body.get("_source")
    if not (isinstance(src, (list, tuple)) and src):
        # ES `fields` API: doc-value retrieval; stored meta columns ARE
        # this engine's doc values, so it rides the _source join
        fl = body.get("fields")
        if isinstance(fl, (list, tuple)) and fl:
            src = [f["field"] if isinstance(f, dict) else f for f in fl]
    if isinstance(src, (list, tuple)) and src:
        for c in src:
            if c not in cp.meta_cols:
                raise DslError(
                    f"_source: {c!r} is not a stored column "
                    f"({sorted(cp.meta_cols)})"
                )
        hits = hits.join(
            ix.doc_stats().select("doc_id", *src), "doc_id", "left"
        ).orderBy(F.desc("score"), F.asc("doc_id"))
    return hits


def _collect_inner_hits(q) -> list[tuple[str, str, dict, int]]:
    """Walk a query tree for ``nested`` clauses carrying an ``inner_hits``
    object → ``(column_name, path, inner_query, size)`` per request.
    Name defaults to the path (the ES default section name)."""
    out: list[tuple[str, str, dict, int]] = []

    def walk(node):
        if isinstance(node, dict):
            nv = node.get("nested")
            if (
                isinstance(nv, dict)
                and isinstance(nv.get("inner_hits"), dict)
                and isinstance(nv.get("path"), str)
                and isinstance(nv.get("query"), dict)
            ):
                ih = nv["inner_hits"]
                name = str(ih.get("name") or nv["path"])
                out.append(
                    (
                        f"inner_hits_{name}",
                        nv["path"],
                        nv["query"],
                        int(ih.get("size", 3)),
                    )
                )
            for vv in node.values():
                walk(vv)
        elif isinstance(node, (list, tuple)):
            for vv in node:
                walk(vv)

    walk(q)
    return out


def _scan_docs(cp: _Compiler, q: dict, op: str = "scan") -> DataFrame:
    """The unscored filter-context match set (``doc_id``) of a query
    clause — shared by :func:`count` and :func:`scan` (both evaluate in
    filter context: ES counts without scores and sorts scan by _doc)."""
    ix = cp.ix
    typ, spec = cp._clause(q)
    if typ == "match_all":
        return ix.doc_stats().select("doc_id")
    if cp.is_filterish(q):
        return ix.match_docs(filters=cp.compile_filter(q))
    if typ in _MATCHISH:
        f, v, _ = _field_spec(typ, spec)
        p = cp._match_params(typ, v)
        return ix.match_docs(
            str(p["query"]), mode=str(p.get("operator", "or")).lower(),
            field=cp._text_field(typ, f),
        )
    if typ == "bool":
        # must_not text legs become an exclusion doc-set (match_docs
        # subtracts it) rather than the aggs context's hard error
        spec2 = dict(spec)
        exclude = []
        kept_mn = []
        for c in _as_list(spec2.get("must_not")):
            if cp.is_filterish(c):
                kept_mn.append(c)
                continue
            t, s = cp._clause(c)
            if t not in _MATCHISH:
                raise DslError(
                    f"{op}: must_not supports match/term legs, got {t!r}"
                )
            f, v, _ = _field_spec(t, s)
            exclude.append(
                (str(cp._match_params(t, v)["query"]), cp._text_field(t, f))
            )
        spec2["must_not"] = kept_mn
        qs, field, filters = _agg_context(cp, {"bool": spec2})
        return ix.match_docs(qs, field=field, filters=filters,
                             exclude=exclude)
    raise DslError(
        f"{op}: unsupported clause {typ!r} (scored queries go through "
        f"search())"
    )


def scan_df(ix, body: dict | None = None) -> DataFrame:
    """The ES scroll/scan result set as ONE DataFrame: every live doc
    matching the body's query (filter context, unscored — ES scan sorts
    by _doc and disables scoring), with the ``_source`` columns
    projected. Pinned to a point-in-time snapshot opened at CALL time
    (pass a ``pit`` body key to reuse an existing snapshot), so deletes
    issued after the call never change the result — the ES scroll
    consistency contract. match_all and pure-filter bodies compile to a
    single pruned doc_stats scan, no join."""
    body = dict(body or {})
    ix = _apply_runtime(ix, body)
    ix = _apply_pit(ix, body, default_pin=True)
    cp = _Compiler(ix)
    q = body.get("query", {"match_all": {}})
    ds = ix.doc_stats()
    sl = body.get("slice")
    if sl is not None:
        # ES sliced scroll: slice i of m drains a disjoint ~1/m of the
        # result set — the parallel-export API (each worker opens its own
        # slice). Deterministic split: pmod on doc_id (the _id here IS a
        # dense long, so modulo is the honest hash) or on a named numeric
        # field. A pushed filter on the doc_stats scan — slices never
        # shuffle, and the m scans collectively read each row group once.
        try:
            sid, smax = int(sl["id"]), int(sl["max"])
        except (KeyError, TypeError, ValueError):
            raise DslError('slice: expected {"id": i, "max": m}')
        if not 0 <= sid < smax:
            raise DslError(f"slice: need 0 <= id < max, got id={sid} max={smax}")
        scol = sl.get("field", "doc_id")
        if scol != "doc_id" and scol not in ds.columns:
            raise DslError(f"slice: field {scol!r} is not a doc_stats column")
        ds = ds.filter(F.pmod(F.col(scol).cast("long"), F.lit(smax)) == sid)
    prot = getattr(ix, "_PROTECTED_COLS", frozenset({"doc_id", "seg", "dl"}))
    src = body.get("_source")
    if src is None or src is True:
        cols = [c for c in ds.columns if c not in prot]
    elif src is False:
        cols = []
    elif isinstance(src, (list, tuple)) and src:
        for c in src:
            if c not in cp.meta_cols:
                raise DslError(
                    f"_source: {c!r} is not a stored column "
                    f"({sorted(cp.meta_cols)})"
                )
        cols = list(src)
    else:
        raise DslError("_source: expected true/false or a column list")
    typ, _spec = cp._clause(q)
    if typ == "match_all":
        return ds.select("doc_id", *cols)
    if cp.is_filterish(q):
        return ds.filter(cp.compile_filter(q)).select("doc_id", *cols)
    docs = _scan_docs(cp, q)
    return docs.join(ds.select("doc_id", *cols), "doc_id")


def scan(ix, body: dict | None = None):
    """ES ``helpers.scan`` parity — the scroll iterator the reference
    drains whole indexes with (import_dart_data.py:562, test.py:72-80):
    returns an iterator of ``{"_id": ..., "_source": {...}}`` dicts, one
    per live doc matching the body, unscored, snapshot-pinned at call
    time. Spark-first transport: ONE job whose partitions stream to the
    driver lazily via ``toLocalIterator`` — a scroll page ≙ one
    partition fetch, so driver memory holds one partition at a time,
    never the corpus (ES's fixed-size scroll batches are an HTTP
    artifact; the partition is the batch here)."""
    rows = scan_df(ix, body)  # eager pin: snapshot opens NOW, not at next()
    src_cols = [c for c in rows.columns if c != "doc_id"]

    def _iter():
        for r in rows.toLocalIterator(prefetchPartitions=True):
            yield {"_id": r["doc_id"],
                   "_source": {c: r[c] for c in src_cols}}

    return _iter()


def render_template(source, params: dict | None):
    """ES ``_render/template``: resolve the mustache subset search
    templates actually use against ``params``, returning the concrete
    request body.

    Supported (the documented ES template idioms):
    - ``"{{name}}"`` as an ENTIRE string value substitutes the raw param
      (typed — numbers stay numbers, lists stay lists);
    - ``{{name}}`` inside a longer string interpolates ``str(value)``;
    - ``{{#toJson}}name{{/toJson}}`` embeds ``json.dumps(value)``;
    - ``{{var}}{{^var}}default{{/var}}`` — the inverted-section default
      for a missing/falsy param.

    A param still unresolved after defaults raises :class:`DslError`
    (ES renders empty string there, which silently corrupts queries —
    refusing beats mis-running). ``source`` may be a dict or a JSON
    string (both ES forms)."""
    import json as _json
    import re as _re

    params = dict(params or {})
    tojson = _re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
    inverted = _re.compile(r"\{\{\^(\w+)\}\}(.*?)\{\{/\1\}\}", _re.S)
    var = _re.compile(r"\{\{(\w+)\}\}")
    # the default idiom {{k}}{{^k}}default{{/k}} must resolve BEFORE the
    # strict pass (a missing k is exactly the case the default is for)
    combo = _re.compile(r"\{\{(\w+)\}\}\{\{\^\1\}\}(.*?)\{\{/\1\}\}", _re.S)

    def render_str(s: str):
        exact = var.fullmatch(s)
        if exact:  # whole-string substitution keeps the param's type
            name = exact.group(1)
            if name not in params:
                raise DslError(f"template: missing param {name!r}")
            return params[name]

        def sub_tojson(m):
            name = m.group(1)
            if name not in params:
                raise DslError(f"template: missing param {name!r}")
            return _json.dumps(params[name])

        s = tojson.sub(sub_tojson, s)
        s = combo.sub(
            lambda m: str(params[m.group(1)])
            if params.get(m.group(1)) else m.group(2),
            s,
        )
        s = inverted.sub(
            lambda m: "" if params.get(m.group(1)) else m.group(2), s
        )

        def sub_var(m):
            name = m.group(1)
            if name not in params:
                raise DslError(f"template: missing param {name!r}")
            return str(params[name])

        return var.sub(sub_var, s)

    def walk(node):
        if isinstance(node, str):
            return render_str(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    if isinstance(source, str):
        # ES's string form: mustache over the raw JSON text, then parse.
        # Only toJson/inverted/interpolation make sense here (a bare
        # {{k}} in JSON text must render a JSON literal, so substitute
        # json.dumps for unquoted-value positions conservatively via str)
        def need(name: str):
            if name not in params:
                raise DslError(f"template: missing param {name!r}")
            return params[name]

        def sub_all(m):
            v = need(m.group(1))
            return v if isinstance(v, str) else _json.dumps(v)

        s = tojson.sub(lambda m: _json.dumps(need(m.group(1))), source)
        s = combo.sub(
            lambda m: (
                params[m.group(1)]
                if isinstance(params.get(m.group(1)), str)
                else _json.dumps(params[m.group(1)])
            )
            if params.get(m.group(1)) else m.group(2),
            s,
        )
        s = inverted.sub(
            lambda m: "" if params.get(m.group(1)) else m.group(2), s
        )
        s = var.sub(sub_all, s)
        try:
            return _json.loads(s)
        except Exception as e:
            raise DslError(f"template: rendered source is not JSON: {e}")
    return walk(source)


def search_template(
    ix, body: dict, round_scores: int | None = None,
    emb: DataFrame | None = None, emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> DataFrame:
    """ES ``_search/template``: ``{"source": <template>, "params": {...}}``
    rendered by :func:`render_template`, then dispatched through
    :func:`search` — rendering is driver-side string work; the plan is
    whatever the concrete body compiles to. Stored-template ``id`` refs
    are not kept (there is no cluster state here) — pass the source
    inline; the error names that."""
    if not isinstance(body, dict) or "source" not in body:
        if isinstance(body, dict) and "id" in body:
            raise DslError(
                "search_template: stored-template ids are not supported — "
                "pass the template inline as {'source': ..., 'params': ...}"
            )
        raise DslError("search_template: body needs a 'source' key")
    rendered = render_template(body["source"], body.get("params"))
    if not isinstance(rendered, dict):
        raise DslError("search_template: source must render to a body dict")
    return search(
        ix, rendered, round_scores=round_scores,
        emb=emb, emb_id_col=emb_id_col, emb_vec_col=emb_vec_col,
    )


def validate(
    ix, body: dict,
    emb: DataFrame | None = None, emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> dict:
    """ES ``_validate/query`` (rewrite=true form): compile the body through
    the full dispatcher and force Catalyst analysis of the resulting plan
    — returns ``{"valid": bool, "explanation": ...}`` instead of raising,
    the ES response shape. ``emb`` is the same embedding table ``search``
    takes, so knn/retriever bodies validate against what would actually
    run. Like ES's rewrite pass this may execute BOUNDED driver-side
    pre-flight steps for scoring queries (per-term dictionary stats; the
    block-max threshold bootstrap over the rarest term's postings) but
    never a full scoring scan; the filter path's id-push probe is forced
    to its distributed fallback (budget 0) so no id set is collected."""
    import copy as _copy

    probe = _copy.copy(ix)
    probe.id_push_budget = 0  # take(1) instead of take(budget+1)
    try:
        df = search(
            probe, dict(body or {}),
            emb=emb, emb_id_col=emb_id_col, emb_vec_col=emb_vec_col,
        )
        df.schema  # force analysis; no result computation
        return {"valid": True, "explanation": None}
    except DslError as e:
        return {"valid": False, "explanation": str(e)}
    except (ValueError, KeyError) as e:
        return {"valid": False, "explanation": f"{type(e).__name__}: {e}"}
    except Exception as e:  # AnalysisException and friends
        msg = str(e)
        first = msg.splitlines()[0] if msg else type(e).__name__
        return {"valid": False, "explanation": f"{type(e).__name__}: {first}"}


def _msearch_batchable(cp: _Compiler, body: dict):
    """If ``body`` is a plain match query the batched msearch kernel can
    answer, return its (text, field, mode, size) — else None. Batchable =
    top-level keys within {query, size}, a single ``match`` clause with at
    most an ``operator`` option, on an indexed field."""
    if not isinstance(body, dict) or not (set(body) <= {"query", "size"}):
        return None
    q = body.get("query")
    if not isinstance(q, dict) or list(q.keys()) != ["match"]:
        return None
    m = q["match"]
    if not isinstance(m, dict) or len(m) != 1:
        return None
    ((f, v),) = m.items()
    if not cp.is_indexed(f):
        return None
    if isinstance(v, str):
        text, mode = v, "or"
    elif isinstance(v, dict) and set(v) <= {"query", "operator"}:
        text = v.get("query")
        mode = str(v.get("operator", "or")).lower()
    else:
        return None
    if not isinstance(text, str) or mode not in ("or", "and"):
        return None
    field = None if f == cp.ix.fields[0] else f
    return text, field, mode, int(body.get("size", 10))


def msearch(
    ix, bodies: dict[str, dict], round_scores: int | None = None,
) -> dict[str, DataFrame]:
    """ES ``_msearch``: N named request bodies, one response each (dict
    keyed like the input). Plain match bodies are answered by the engine's
    batched msearch kernel — grouped by (field, operator, size), each
    group is ONE pass over the union of its queries' postings (the
    scan-amortization that matters when a query log hits a 100-TB index;
    measured 3.9x at 10 queries). Anything else — bool, filters, aggs-free
    decorated shapes — falls back to one :func:`search` dispatch per body,
    exactly what ES does shard-side anyway. Each batch result is cached
    before being split per query so downstream consumers of the N
    DataFrames do not recompute the shared pass."""
    cp = _Compiler(ix)
    plans: dict[str, tuple] = {}
    groups: dict[tuple, dict[str, str]] = {}
    for qid, body in bodies.items():
        b = _msearch_batchable(cp, body)
        if b is not None:
            text, field, mode, size = b
            groups.setdefault((field, mode, size), {})[str(qid)] = text
            plans[qid] = ("batch", (field, mode, size))
        else:
            plans[qid] = ("single", body)
    batch_hits: dict[tuple, DataFrame] = {}
    for (field, mode, size), qs in groups.items():
        res = ix.msearch(
            qs, k=size, mode=mode, field=field, round_scores=round_scores,
        ).cache()
        batch_hits[(field, mode, size)] = res
    out: dict[str, DataFrame] = {}
    for qid, (kind, spec) in plans.items():
        if kind == "batch":
            out[qid] = (
                batch_hits[spec]
                .filter(F.col("query_id") == str(qid))
                .drop("query_id")
            )
        else:
            out[qid] = search(ix, spec, round_scores=round_scores)
    return out


def _decorated(
    cp: _Compiler, kind: str, body: dict, q: dict, size: int, round_scores
) -> DataFrame:
    """sort / collapse / highlight / rescore — each needs the query in
    match shape (they dispatch to the dedicated engine operator)."""
    ix = cp.ix
    typ, spec = cp._clause(q)
    filters = None
    if typ == "bool":
        # allow bool{must: [match], filter: [...]} under sort
        sub = _as_list(spec.get("must"))
        filt = [cp.compile_filter(c) for c in _as_list(spec.get("filter"))]
        for extra in ("should", "must_not"):
            if spec.get(extra):
                raise DslError(f"{kind}: bool {extra} not supported here")
        if len(sub) != 1:
            raise DslError(f"{kind}: need exactly one must clause")
        typ, spec = cp._clause(sub[0])
        filters = _and_all(filt)
    if typ == "match_all" and kind == "sort":
        query, field = None, None
    else:
        if typ not in _MATCHISH:
            raise DslError(f"{kind}: query must be match/term (got {typ!r})")
        f, v, _ = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        query = str(cp._match_params(typ, v)["query"])

    if kind == "sort":
        s = body["sort"]
        s = s[0] if isinstance(s, (list, tuple)) and s else s
        o = None
        if isinstance(s, str):
            by, order = s, "desc"
        elif isinstance(s, dict) and len(s) == 1:
            ((by, o),) = s.items()
            order = (
                o.get("order", "desc") if isinstance(o, dict) else str(o)
            )
        else:
            raise DslError(f"sort: unsupported spec {body['sort']!r}")
        if by == "_geo_distance":
            # ES geo_distance sort: nearest-first hits with the distance
            # as the sort value — the engine's geo_distance() IS this
            # (origin + an unbounded radius), so map onto it
            if not isinstance(o, dict):
                raise DslError(
                    "_geo_distance sort: need {<geo_field>: {lat, lon}}"
                )
            gf = [kk for kk in o if kk not in ("order", "unit")]
            if len(gf) != 1:
                raise DslError(
                    "_geo_distance sort: exactly one geo field expected"
                )
            if o.get("order", "asc") != "asc" or o.get("unit", "km") != "km":
                raise DslError(
                    "_geo_distance sort: only order=asc, unit=km supported"
                )
            latc, lonc = cp._geo_cols("_geo_distance", gf[0], None)
            pt = o[gf[0]]
            return ix.geo_distance(
                (float(pt["lat"]), float(pt["lon"])),
                float("inf"),
                lat=latc, lon=lonc, query=query, k=size,
                field=field, filters=filters,
            )
        if by == "_score":
            raise DslError("sort by _score is the default — omit 'sort'")
        if by not in cp.meta_cols:
            raise DslError(f"sort: {by!r} is not a stored column")
        return ix.sort_by(
            query, by=by, k=size, ascending=(order == "asc"),
            field=field, filters=filters,
        )
    if query is None:
        raise DslError(f"{kind}: match_all is only supported under sort")
    if kind == "collapse":
        _require_no_filters(kind, filters)
        return ix.collapse(
            query, by=body["collapse"]["field"], k=size, field=field,
            round_scores=round_scores,
        )
    if kind == "highlight":
        _require_no_filters(kind, filters)
        h = body["highlight"]
        hf = h.get("fields") or {}
        if len(hf) != 1:
            raise DslError("highlight: exactly one entry in 'fields'")
        ((col, hspec),) = hf.items()
        nfrag = int(
            hspec.get("number_of_fragments", h.get("number_of_fragments", 0))
        )
        fsize = int(hspec.get("fragment_size", h.get("fragment_size", 100)))
        return ix.highlight(
            query, k=size, text_col=col, field=field,
            pre_tag=_as_list(h.get("pre_tags", ["<em>"]))[0],
            post_tag=_as_list(h.get("post_tags", ["</em>"]))[0],
            round_scores=round_scores,
            number_of_fragments=nfrag, fragment_size=fsize,
        )
    # rescore
    _require_no_filters(kind, filters)
    r = body["rescore"]
    rq = r.get("query", {})
    rtyp, rspec = cp._clause(rq.get("rescore_query", {}))
    if rtyp != "match_phrase":
        raise DslError("rescore: rescore_query must be match_phrase")
    rf, rv, _ = _field_spec(rtyp, rspec)
    phrase = str(cp._match_params(rtyp, rv)["query"])
    return ix.rescore(
        query, phrase, k=size, window_size=int(r.get("window_size", 50)),
        weight=float(rq.get("rescore_query_weight", 1.0)),
        field=field, round_scores=round_scores,
    )


def _apply_runtime(ix, body: dict):
    """ES ``runtime_mappings`` section: compile each script.source — a
    Spark SQL expression in this engine, the documented stand-in for
    Painless — into a runtime-field view of the index
    (:meth:`InvertedIndex.with_runtime_fields`). Every downstream
    consumer of the body (filter context, aggs, sort, _source) then sees
    the runtime fields as ordinary doc_stats columns."""
    rm = (body or {}).get("runtime_mappings")
    if not rm:
        return ix
    if not isinstance(rm, dict):
        raise DslError("runtime_mappings must be a dict of field -> spec")
    mappings = {}
    for name, spec in rm.items():
        script = spec.get("script") if isinstance(spec, dict) else None
        src = script.get("source") if isinstance(script, dict) else script
        if not isinstance(src, str) or not src.strip():
            raise DslError(
                f"runtime_mappings {name!r}: need script.source — a Spark "
                f"SQL expression string (this engine's scripting dialect)"
            )
        mappings[str(name)] = src
    try:
        return ix.with_runtime_fields(mappings)
    except ValueError as e:
        raise DslError(str(e)) from e


def count(ix, body: dict) -> int:
    """ES ``_count`` with a request body — the size of the unscored
    filter-context match set :func:`_scan_docs` computes (scan and count
    are the same document set; one counts it, the other streams it)."""
    ix = _apply_runtime(ix, body)
    cp = _Compiler(ix)
    q = (body or {}).get("query", {"match_all": {}})
    return _scan_docs(cp, q, op="_count").count()


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------
def _agg_context(
    cp: _Compiler, q: dict
) -> tuple[str | None, str | None, Column | None]:
    """The query context an ES body applies to its aggs: -> (match query
    or None for match_all, field, filter Column)."""
    typ, spec = cp._clause(q)
    if typ == "match_all":
        return None, None, None
    if cp.is_filterish(q):
        return None, None, cp.compile_filter(q)
    if typ in _MATCHISH:
        f, v, _ = _field_spec(typ, spec)
        field = cp._text_field(typ, f)
        p = cp._match_params(typ, v)
        if str(p.get("operator", "or")).lower() != "or":
            raise DslError(
                "aggs: the match context must use the default OR operator "
                "(the aggregation family matches docs containing ANY term)"
            )
        return str(p["query"]), field, None
    if typ == "bool":
        must = _as_list(spec.get("must"))
        filt = [
            cp.compile_filter(c) for c in _as_list(spec.get("filter"))
        ]
        text = []
        for c in must:
            if cp.is_filterish(c):
                filt.append(cp.compile_filter(c))
            else:
                text.append(c)
        for c in _as_list(spec.get("must_not")):
            if not cp.is_filterish(c):
                raise DslError("aggs: bool must_not text legs unsupported")
            filt.append(_not_null_safe(cp.compile_filter(c)))
        if spec.get("should"):
            raise DslError("aggs: bool should legs unsupported")
        if len(text) > 1:
            raise DslError("aggs: at most one full-text clause in the body")
        if not text:
            return None, None, _and_all(filt)
        t, s = cp._clause(text[0])
        if t not in _MATCHISH:
            raise DslError(f"aggs: text context must be match/term ({t!r})")
        f, v, _ = _field_spec(t, s)
        field = cp._text_field(t, f)
        p = cp._match_params(t, v)
        return str(p["query"]), field, _and_all(filt)
    raise DslError(f"aggs: unsupported query context {typ!r}")


_DH_INTERVALS = {
    "1h": "hour", "hour": "hour", "1d": "day", "day": "day",
    "1w": "week", "week": "week", "1M": "month", "month": "month",
    "1q": "quarter", "quarter": "quarter", "1y": "year", "year": "year",
}


def _dh_interval(spec: dict) -> str:
    raw = (
        spec.get("calendar_interval")
        or spec.get("fixed_interval")
        or spec.get("interval")
        or "month"
    )
    if raw not in _DH_INTERVALS:
        raise DslError(
            f"date_histogram: unsupported interval {raw!r} "
            f"(supported: {sorted(set(_DH_INTERVALS))})"
        )
    return _DH_INTERVALS[raw]


def aggs(ix, body: dict) -> dict[str, DataFrame]:
    """Run the ``aggs`` section of an ES body: one DataFrame per named
    aggregation, each computed over the body's query context (match /
    match_all / bool{match + filter})."""
    ix = _apply_runtime(ix, body)
    cp = _Compiler(ix)
    spec = body.get("aggs", body.get("aggregations"))
    if not isinstance(spec, dict) or not spec:
        raise DslError("body has no 'aggs' section")
    query, field, filters = _agg_context(
        cp, body.get("query", {"match_all": {}})
    )
    out = {}
    for name, aspec in spec.items():
        out[name] = _one_agg(cp, name, aspec, query, field, filters)
    return out


def suggest(ix, body: dict) -> dict[str, DataFrame]:
    """Run the top-level ``suggest`` section of an ES body: one DataFrame
    per named suggester. Supported suggester kinds, mapped to the engine's
    pinned models:

    - ``term``: {"text": ..., "term": {"field", "size", "max_edits",
      "string_distance"?}} -> :meth:`InvertedIndex.suggest_terms`
      (Damerau by default; ``string_distance: "levenshtein"`` turns
      transpositions off, like ES's option).
    - ``phrase``: {"text": ..., "phrase": {"field", "size", "max_edits",
      "collate"?}} -> :meth:`InvertedIndex.suggest_phrase` (a ``collate``
      key — ES sends the collation query there — enables phrase-hit
      collation).
    - ``completion``: {"prefix": ..., "completion": {"field", "size",
      "fuzzy": {"fuzziness", "prefix_length"}?, "weight_field"?}} ->
      :meth:`InvertedIndex.suggest_completion` over the stored (or
      runtime) column; ``weight_field`` is the doc-valued reading of
      ES's index-time per-suggestion weight."""
    ix = _apply_runtime(ix, body)
    spec = body.get("suggest")
    if not isinstance(spec, dict) or not spec:
        raise DslError("body has no 'suggest' section")
    # ES global form: {"suggest": {"text": "...", "s1": {...}, ...}} —
    # the top-level text is inherited by every suggester that does not
    # set its own
    spec = dict(spec)
    global_text = spec.pop("text", None)
    if not spec:
        raise DslError("suggest: a global 'text' needs >= 1 suggester")
    out: dict[str, DataFrame] = {}
    for name, s in spec.items():
        if not isinstance(s, dict):
            raise DslError(f"suggest {name!r}: expected an object")
        if global_text is not None and "text" not in s:
            s = {**s, "text": global_text}
        kinds = [kk for kk in s if kk in ("term", "phrase", "completion")]
        if len(kinds) != 1:
            raise DslError(
                f"suggest {name!r}: expected exactly one of "
                f"term/phrase/completion, got {kinds}"
            )
        kind = kinds[0]
        opt = s[kind] or {}
        f = opt.get("field")
        if not f:
            raise DslError(f"suggest {name!r}: {kind}.field is required")
        size = int(opt.get("size", 5))
        if kind == "term":
            text = s.get("text")
            if not text:
                raise DslError(f"suggest {name!r}: 'text' is required")
            out[name] = ix.suggest_terms(
                text, k=size, max_dist=int(opt.get("max_edits", 2)),
                field=f,
                transpositions=(
                    opt.get("string_distance", "damerau_levenshtein")
                    != "levenshtein"
                ),
            )
        elif kind == "phrase":
            text = s.get("text")
            if not text:
                raise DslError(f"suggest {name!r}: 'text' is required")
            out[name] = ix.suggest_phrase(
                text, k=size, max_dist=int(opt.get("max_edits", 2)),
                field=f, collate="collate" in opt,
            )
        else:
            prefix = s.get("prefix")
            if not prefix:
                raise DslError(f"suggest {name!r}: 'prefix' is required")
            fz = opt.get("fuzzy")
            # ES semantics: absent or false -> no fuzziness; true / {}
            # -> fuzzy with the defaults; "AUTO" fuzziness -> the ES
            # AUTO ladder on the prefix length (0/1/2 at <3/<6/>=6)
            if fz is None or fz is False:
                fuzziness = 0
                fz = {}
            else:
                if fz is True:
                    fz = {}
                raw = fz.get("fuzziness", 1)
                if isinstance(raw, str) and raw.upper() == "AUTO":
                    n = len(str(prefix))
                    fuzziness = 0 if n < 3 else (1 if n < 6 else 2)
                else:
                    try:
                        fuzziness = int(raw)
                    except (TypeError, ValueError):
                        raise DslError(
                            f"suggest {name!r}: fuzzy.fuzziness must be "
                            f"an int or 'AUTO', got {raw!r}"
                        ) from None
            out[name] = ix.suggest_completion(
                prefix, on=f, k=size,
                weight=opt.get("weight_field"),
                fuzziness=fuzziness,
                fuzzy_prefix_length=int(fz.get("prefix_length", 1)),
            )
    return out


def _metric_on(cp: _Compiler, typ: str, spec: dict) -> str:
    f = spec.get("field")
    cp._meta_field(typ, f, None)
    return f


def _one_agg(
    cp: _Compiler, name: str, aspec: dict, query, field, filters
) -> DataFrame:
    ix = cp.ix
    sub = aspec.get("aggs", aspec.get("aggregations")) or {}
    kinds = [kk for kk in aspec if kk not in ("aggs", "aggregations", "meta")]
    if len(kinds) != 1:
        raise DslError(f"agg {name!r}: expected one agg type, got {kinds}")
    typ = kinds[0]
    spec = aspec[typ] or {}
    base = dict(query=query, field=field, filters=filters)

    if typ == "terms":
        by = _metric_on(cp, typ, spec)
        size = int(spec.get("size", 10))
        order = _terms_order_spec(spec.get("order"))
        if not sub:
            if order is not None and order[0] not in ("_count", "_key"):
                raise DslError(
                    f"terms order: {order[0]!r} names no sub-aggregation "
                    f"(this terms agg has none — use _count or _key)"
                )
            return ix.facet(
                by=by, k=size, order=order,
                missing=spec.get("missing"),
                min_doc_count=int(spec.get("min_doc_count", 1)), **base,
            )
        if "missing" in spec or "min_doc_count" in spec:
            # refusing beats silently-different buckets: the sub-agg
            # paths (facet_stats/top_hits/bucket pipelines) don't thread
            # these knobs yet
            raise DslError(
                "terms missing/min_doc_count: unsupported together with "
                "sub-aggregations"
            )
        return _terms_sub(cp, name, by, size, sub, base, order=order)

    if typ == "nested":
        # ES nested agg: switch the bucket stream to the ELEMENTS of an
        # array<struct> meta column; one terms sub-agg over `path.field`,
        # optionally carrying a reverse_nested sub-sub-agg (parent doc
        # counts). doc_count counts nested sub-documents, like ES.
        path = spec.get("path")
        if not isinstance(path, str):
            raise DslError(f"nested agg {name!r}: 'path' is required")
        if len(sub) != 1:
            raise DslError(
                f"nested agg {name!r}: expected exactly one terms "
                f"sub-aggregation, got {sorted(sub)}"
            )
        ((_sname, sspec),) = sub.items()
        stkinds = [
            kk for kk in sspec if kk not in ("aggs", "aggregations", "meta")
        ]
        if stkinds != ["terms"]:
            raise DslError(
                f"nested agg {name!r}: only a terms sub-aggregation is "
                f"supported (got {stkinds})"
            )
        tspec = sspec["terms"] or {}
        unsupported = sorted(set(tspec) - {"field", "size"})
        if unsupported:
            # refusing beats silently-different buckets: order /
            # min_doc_count / missing / shard_size are not implemented
            # for the nested bucket stream
            raise DslError(
                f"nested agg {name!r}: unsupported terms options "
                f"{unsupported} (supported: field, size)"
            )
        by = tspec.get("field")
        if isinstance(by, str) and by.startswith(path + "."):
            by = by[len(path) + 1:]
        ssub = sspec.get("aggs", sspec.get("aggregations")) or {}
        reverse = False
        if ssub:
            rkinds = [
                [k for k in s if k not in ("aggs", "aggregations", "meta")]
                for s in ssub.values()
            ]
            if len(ssub) != 1 or rkinds[0] != ["reverse_nested"]:
                raise DslError(
                    f"nested agg {name!r}: the terms sub-agg supports only "
                    f"a reverse_nested sub-aggregation (got {rkinds})"
                )
            ((_rname, rs),) = ssub.items()
            rspec = rs.get("reverse_nested") or {}
            if rspec:
                raise DslError(
                    f"nested agg {name!r}: reverse_nested options "
                    f"{sorted(rspec)} unsupported (bare climb-to-parent "
                    f"only)"
                )
            if rs.get("aggs") or rs.get("aggregations"):
                raise DslError(
                    f"nested agg {name!r}: sub-aggregations under "
                    f"reverse_nested are unsupported"
                )
            reverse = True
        try:
            return ix.nested_terms(
                path, by, k=int(tspec.get("size", 10)), reverse=reverse,
                **base,
            )
        except ValueError as e:
            raise DslError(str(e)) from None
    if typ == "multi_terms":
        by = [t["field"] for t in spec.get("terms", [])]
        for f in by:
            cp._meta_field(typ, f, None)
        return ix.multi_terms(by=by, k=int(spec.get("size", 10)), **base)
    if typ == "rare_terms":
        return ix.rare_terms(
            by=_metric_on(cp, typ, spec),
            max_doc_count=int(spec.get("max_doc_count", 1)), **base,
        )
    if typ == "significant_terms":
        if filters is not None:
            raise DslError("significant_terms: filtered context unsupported")
        if query is None:
            raise DslError("significant_terms needs a match query context")
        return ix.significant_terms(
            query, k=int(spec.get("size", 10)), field=field
        )
    if typ == "significant_text":
        if filters is not None:
            raise DslError("significant_text: filtered context unsupported")
        if query is None:
            raise DslError("significant_text needs a match query context")
        fld = spec.get("field", ix.fields[0])
        return ix.significant_text(
            query,
            k=int(spec.get("size", 10)),
            field=cp._text_field(typ, fld),
            min_doc_count=int(spec.get("min_doc_count", 3)),
            filter_duplicate_text=bool(
                spec.get("filter_duplicate_text", True)
            ),
            sample_size=(
                int(spec["sample_size"]) if "sample_size" in spec else None
            ),
        )
    if typ == "random_sampler":
        if len(sub or {}) != 1:
            raise DslError("random_sampler needs exactly one terms sub-agg")
        sub_spec = next(iter(sub.values()))
        if list(sub_spec.keys()) != ["terms"]:
            raise DslError(
                "random_sampler: only a terms sub-aggregation is supported"
            )
        if "probability" not in spec:
            # ES rejects a random_sampler without probability; silently
            # sampling at some default would return approximate counts
            # the caller never asked for
            raise DslError("random_sampler: 'probability' is required")
        by = _metric_on(cp, typ, sub_spec["terms"])
        return ix.random_sampler_agg(
            by=by,
            probability=float(spec["probability"]),
            seed=int(spec.get("seed", 0)),
            k=int(sub_spec["terms"].get("size", 10)),
            **base,
        )
    if typ in ("sampler", "diversified_sampler"):
        if filters is not None:
            raise DslError(f"{typ}: filtered context unsupported")
        if query is None:
            raise DslError(f"{typ} needs a match query context")
        if len(sub or {}) != 1:
            raise DslError(f"{typ} needs exactly one terms sub-aggregation")
        sub_spec = next(iter(sub.values()))
        if list(sub_spec.keys()) != ["terms"]:
            raise DslError(f"{typ}: only a terms sub-aggregation is supported")
        by = _metric_on(cp, typ, sub_spec["terms"])
        kwargs = dict(
            by=by,
            shard_size=int(spec.get("shard_size", 100)),
            k=int(sub_spec["terms"].get("size", 10)),
            field=field,
        )
        if typ == "diversified_sampler":
            dv = spec.get("field")
            if not dv:
                raise DslError("diversified_sampler needs 'field'")
            cp._meta_field(typ, dv, None)
            kwargs.update(
                diversify_on=dv,
                max_docs_per_value=int(spec.get("max_docs_per_value", 1)),
            )
        return ix.sampler_agg(query, **kwargs)
    if typ == "histogram":
        by = _metric_on(cp, typ, spec)
        interval = spec.get("interval")
        if interval is None:
            raise DslError("histogram: need 'interval'")
        if int(spec.get("min_doc_count", 1)) == 0:
            eb = spec.get("extended_bounds")
            bounds = (eb["min"], eb["max"]) if eb else None
            return ix.histogram_filled(
                by=by, interval=int(interval), bounds=bounds, **base
            )
        return ix.histogram(by=by, interval=float(interval), **base)
    if typ == "date_histogram":
        on = _metric_on(cp, typ, spec)
        interval = _dh_interval(spec)
        if sub:
            return _dh_sub(cp, name, on, interval, sub, base)
        if int(spec.get("min_doc_count", 1)) == 0:
            eb = spec.get("extended_bounds")
            bounds = (eb["min"], eb["max"]) if eb else None
            return ix.date_histogram_filled(
                on=on, interval=interval, bounds=bounds, **base
            )
        return ix.date_histogram(on=on, interval=interval, **base)
    if typ == "auto_date_histogram":
        return ix.auto_date_histogram(
            on=_metric_on(cp, typ, spec),
            target_buckets=int(spec.get("buckets", 10)), **base,
        )
    if typ == "range":
        rs = [
            (r.get("from"), r.get("to")) for r in spec.get("ranges", [])
        ]
        return ix.range_agg(on=_metric_on(cp, typ, spec), ranges=rs, **base)
    if typ == "date_range":
        rs = [
            (r.get("from"), r.get("to")) for r in spec.get("ranges", [])
        ]
        return ix.date_range_agg(
            on=_metric_on(cp, typ, spec), ranges=rs, **base
        )
    if typ == "ip_range":
        return ix.ip_range_agg(
            on=_metric_on(cp, typ, spec),
            ranges=list(spec.get("ranges", [])), **base,
        )
    if typ == "ip_prefix":
        if "prefix_length" not in spec:
            raise DslError("ip_prefix agg: prefix_length is required")
        return ix.ip_prefix_agg(
            on=_metric_on(cp, typ, spec),
            prefix_length=int(spec["prefix_length"]),
            min_doc_count=int(spec.get("min_doc_count", 1)),
            append_prefix_length=bool(
                spec.get("append_prefix_length", False)
            ),
            **base,
        )
    if typ == "filters":
        named = spec.get("filters")
        if not isinstance(named, dict) or not named:
            raise DslError("filters agg: need named filters dict")
        cols: set = set()
        compiled = {
            nm: cp.compile_filter(c, cols) for nm, c in named.items()
        }
        cols.discard("doc_id")
        return ix.filters_agg(
            query, compiled, sorted(cols), field=field, doc_filters=filters
        )
    if typ == "adjacency_matrix":
        named = spec.get("filters")
        if not isinstance(named, dict) or not named:
            raise DslError("adjacency_matrix: need named filters dict")
        if filters is not None or query is not None:
            raise DslError("adjacency_matrix: runs over the whole index")
        sets = {}
        for nm, c in named.items():
            t, s = cp._clause(c)
            if t != "terms":
                raise DslError(
                    "adjacency_matrix filters must be terms clauses over "
                    "an indexed field"
                )
            f, v, _ = _field_spec(t, s)
            cp._text_field(t, f)
            sets[nm] = list(v)
        return ix.adjacency_matrix(sets)
    if typ == "missing":
        return ix.missing_agg(on=_metric_on(cp, typ, spec), **base)
    if typ == "global":
        mtypes = [
            (mt, ms) for a in sub.values()
            for mt, ms in a.items() if mt != "aggs"
        ]
        if len(mtypes) != 1 or mtypes[0][0] not in (
            "stats", "avg", "min", "max", "sum"
        ):
            raise DslError("global: need exactly one stats-family sub-agg")
        return ix.global_agg(
            on=_metric_on(cp, "global", mtypes[0][1]), **base
        )
    if typ == "cardinality":
        return ix.cardinality(on=_metric_on(cp, typ, spec), **base)
    if typ == "percentiles":
        # same DSL default as the under-terms form (one body shape, one
        # output shape at every nesting level)
        percents = [float(x) for x in spec.get("percents") or
                    (25.0, 50.0, 75.0, 95.0)]
        return ix.percentiles(
            on=_metric_on(cp, typ, spec), percents=percents, **base
        )
    if typ == "percentile_ranks":
        return ix.percentile_ranks(
            on=_metric_on(cp, typ, spec),
            values=[float(x) for x in spec.get("values", [])], **base,
        )
    if typ in ("stats", "extended_stats"):
        m = (
            ix.stats_agg if typ == "stats" else ix.extended_stats_agg
        )
        return m(on=_metric_on(cp, typ, spec), **base)
    if typ in ("avg", "min", "max", "sum"):
        on = _metric_on(cp, typ, spec)
        return ix.stats_agg(on=on, **base).select(
            F.col(typ).alias("value")
        )
    if typ == "value_count":
        return ix.value_count(on=_metric_on(cp, typ, spec), **base)
    if typ == "weighted_avg":
        v = (spec.get("value") or {}).get("field")
        w = (spec.get("weight") or {}).get("field")
        cp._meta_field(typ, v, None)
        cp._meta_field(typ, w, None)
        return ix.weighted_avg(value=v, weight=w, **base)
    if typ == "boxplot":
        return ix.boxplot(on=_metric_on(cp, typ, spec), **base)
    if typ == "median_absolute_deviation":
        return ix.median_absolute_deviation(
            on=_metric_on(cp, typ, spec), **base
        )
    if typ == "string_stats":
        return ix.string_stats(on=_metric_on(cp, typ, spec), **base)
    if typ == "top_metrics":
        metrics = _as_list(spec.get("metrics"))
        if len(metrics) != 1:
            raise DslError("top_metrics: exactly one metric supported")
        m = metrics[0]["field"]
        s = spec.get("sort")
        s = s[0] if isinstance(s, (list, tuple)) and s else s
        if isinstance(s, dict) and len(s) == 1:
            ((sf, so),) = s.items()
            asc = (
                so.get("order", "desc") if isinstance(so, dict) else str(so)
            ) == "asc"
        else:
            raise DslError("top_metrics: need sort {field: order}")
        cp._meta_field(typ, m, None)
        cp._meta_field(typ, sf, None)
        return ix.top_metrics(metric=m, sort=sf, ascending=asc, **base)
    if typ == "t_test":
        a, b = spec.get("a") or {}, spec.get("b") or {}
        ttype = str(spec.get("type", "heteroscedastic"))
        fa, fb = a.get("field"), b.get("field")
        if not fa or not fb:
            raise DslError("t_test: both a.field and b.field are required")
        cp._meta_field(typ, fa, None)
        if fa != fb:
            # two-field form: two numeric columns on the same docs, no
            # per-side filters allowed; only the paired type is served
            # (ES also allows unpaired across two fields — refusing beats
            # silently treating it as paired)
            cp._meta_field(typ, fb, None)
            if a.get("filter") or b.get("filter"):
                raise DslError(
                    "t_test: per-side filters need a.field == b.field "
                    "(paired compares two fields on the same docs)"
                )
            if ttype != "paired":
                raise DslError(
                    "t_test: two different fields need type: 'paired' "
                    "(unpaired two-field tests are unsupported)"
                )
            return ix.t_test(
                on=fa, on_b=fb, test_type="paired", **base
            )
        ta, tb = a.get("filter") or {}, b.get("filter") or {}
        if list(ta) != ["term"] or list(tb) != ["term"]:
            raise DslError(
                "t_test unpaired: each side needs a term filter "
                "({a: {field, filter: {term: {col: v}}}, b: ...})"
            )
        ((ca, va),) = ta["term"].items()
        ((cb, vb),) = tb["term"].items()
        if ca != cb:
            raise DslError(
                f"t_test: side filters must split ONE column ({ca!r} vs "
                f"{cb!r})"
            )
        cp._meta_field(typ, ca, None)
        if ttype not in ("heteroscedastic", "homoscedastic"):
            raise DslError(
                f"t_test type {ttype!r}: heteroscedastic/homoscedastic/"
                "paired"
            )
        return ix.t_test(
            on=fa, by=ca, group_a=va, group_b=vb, test_type=ttype, **base
        )
    if typ == "matrix_stats":
        fl = spec.get("fields") or []
        if len(fl) != 2:
            raise DslError("matrix_stats: exactly two fields supported")
        for f in fl:
            cp._meta_field(typ, f, None)
        return ix.matrix_stats(col_a=fl[0], col_b=fl[1], **base)
    if typ == "composite":
        sources = []
        names = []
        for s in spec.get("sources", []):
            ((nm, sdef),) = s.items()
            if "date_histogram" in sdef:
                dh = sdef["date_histogram"]
                src_f = dh.get("field")
                cp._meta_field(typ, src_f, None)
                sources.append((nm, src_f, _dh_interval(dh)))
                names.append(nm)
            else:
                src_f = (sdef.get("terms") or {}).get("field")
                cp._meta_field(typ, src_f, None)
                sources.append(src_f)
                names.append((nm, src_f))
        after = spec.get("after")

        def _after_key(n):
            # ES keys after by the SOURCE NAME; bodies in the wild (and
            # this repo's r03 gate row) often name sources by the field
            nm_, f_ = n if isinstance(n, tuple) else (n, n)
            if nm_ in after:
                return after[nm_]
            if f_ in after:
                return after[f_]
            raise DslError(f"composite after: missing key {nm_!r}")

        after_t = (
            tuple(_after_key(n) for n in names) if isinstance(after, dict)
            else tuple(after) if after is not None else None
        )
        return ix.composite_agg(
            sources=sources, size=int(spec.get("size", 10)),
            after=after_t, **base,
        )
    if typ == "filter":
        # ES single-filter bucket: narrow the aggregation context with one
        # more filter clause, then run the (single) sub-agg inside it —
        # compiles to the same pruned scan with one more pushed predicate
        extra = cp.compile_filter(spec)
        narrowed = dict(base)
        narrowed["filters"] = (
            extra if base["filters"] is None else (base["filters"] & extra)
        )
        if not sub:
            j = ix._match_meta(
                narrowed["query"], narrowed["field"], [], narrowed["filters"]
            )
            return j.agg(F.count("*").alias("doc_count"))
        if len(sub) != 1:
            raise DslError("filter agg: one sub-aggregation supported")
        ((sname, sspec),) = sub.items()
        return _one_agg(
            cp, sname, sspec, narrowed["query"], narrowed["field"],
            narrowed["filters"],
        )
    if typ == "geotile_grid":
        f = spec.get("field")
        latc, lonc = cp._geo_cols(typ, f, None)
        return ix.geotile_grid(
            int(spec.get("precision", 7)), lat=latc, lon=lonc,
            # ES grid aggs default to 10,000 buckets, not the terms-agg 10
            k=int(spec.get("size", 10000)), **base,
        )
    if typ == "geo_line":
        pt = (spec.get("point") or {}).get("field")
        srt = (spec.get("sort") or {}).get("field")
        if not pt or not srt:
            raise DslError(
                "geo_line: point.field and sort.field are required"
            )
        latc, lonc = cp._geo_cols(typ, pt, None)
        cp._meta_field(typ, srt, None)
        return ix.geo_line(
            sort=srt, lat=latc, lon=lonc,
            size=int(spec.get("size", 10000)),
            sort_order=str(spec.get("sort_order", "asc")).lower(),
            include_sort=bool(spec.get("include_sort", False)),
            **base,
        )
    if typ == "geo_centroid":
        latc, lonc = cp._geo_cols(typ, spec.get("field"), None)
        return ix.geo_centroid(lat=latc, lon=lonc, **base)
    if typ == "geo_bounds":
        if spec.get("wrap_longitude"):
            raise DslError(
                "geo_bounds: wrap_longitude (dateline-crossing minimal "
                "boxes) is not supported — the box would differ from ES"
            )
        latc, lonc = cp._geo_cols(typ, spec.get("field"), None)
        return ix.geo_bounds(lat=latc, lon=lonc, **base)
    if typ == "geohash_grid":
        latc, lonc = cp._geo_cols(typ, spec.get("field"), None)
        return ix.geohash_grid(
            int(spec.get("precision", 5)), lat=latc, lon=lonc,
            # ES grid aggs default to 10,000 buckets, not the terms-agg 10
            k=int(spec.get("size", 10000)), **base,
        )
    if typ == "scripted_metric":
        # ES ships Painless source strings here; there is no Painless
        # runtime on Spark, and silently mis-running a script would be
        # worse than refusing. The same four-phase contract is available
        # as Python callables (vectorized per Arrow batch) via
        # InvertedIndex.scripted_metric(init_fn, map_fn, combine_fn,
        # reduce_fn).
        raise DslError(
            "scripted_metric: Painless scripts are not executable on this "
            "engine — pass Python callables to "
            "InvertedIndex.scripted_metric(query, cols, init_fn, map_fn, "
            "combine_fn, reduce_fn) instead"
        )
    raise DslError(f"unsupported aggregation type: {typ!r}")


def _parse_distance_km(d) -> float:
    """ES distance strings -> km. Bare numbers are meters (ES default)."""
    if isinstance(d, (int, float)):
        return float(d) / 1000.0
    s = str(d).strip().lower()
    for suffix, factor in (
        ("km", 1.0), ("kilometers", 1.0), ("mi", 1.609344),
        ("miles", 1.609344), ("m", 0.001), ("meters", 0.001),
    ):
        if s.endswith(suffix):
            return float(s[: -len(suffix)]) * factor
    return float(s) / 1000.0


_PARAMS_RE = re.compile(r"params\.([A-Za-z_][A-Za-z0-9_]*)")


def _pipeline_script(spec: dict, agg_names: set, what: str) -> str:
    """ES bucket_script/bucket_selector spec -> a Spark SQL expression:
    buckets_path vars validated against the sibling agg names ('_count'
    -> doc_count), then each ``params.X`` in the script source replaced
    by its mapped column. Simple-arithmetic Painless sources run
    verbatim; anything beyond stays the engine's Spark SQL dialect."""
    paths = spec.get("buckets_path") or {}
    mapped = {}
    for var, path in paths.items():
        col = "doc_count" if path == "_count" else str(path)
        if col != "doc_count" and col not in agg_names:
            raise DslError(
                f"{what}: buckets_path {path!r} names no sibling "
                f"aggregation (have: {sorted(agg_names)})"
            )
        mapped[var] = col
    src = spec.get("script")
    if isinstance(src, dict):
        src = src.get("source")
    if not isinstance(src, str) or not src:
        raise DslError(f"{what}: need a script source")

    def repl(m):
        var = m.group(1)
        if var not in mapped:
            raise DslError(
                f"{what}: script references params.{var} but buckets_path "
                f"defines {sorted(mapped)}"
            )
        return mapped[var]

    return _PARAMS_RE.sub(repl, src)


def _terms_pipeline(cp, name, by, size, sub, base) -> DataFrame:
    """terms parent whose sub-aggs include bucket_script /
    bucket_selector: metric siblings become the engine's named aggs,
    pipeline siblings become computed columns / the having filter."""
    ix = cp.ix
    metric_fns = {"sum", "avg", "min", "max"}
    aggs: dict = {}
    script_specs: list[tuple[str, dict]] = []
    having = None
    for sname, sspec in sub.items():
        stypes = [kk for kk in sspec if kk not in ("aggs", "aggregations")]
        if len(stypes) != 1:
            raise DslError(f"sub-agg {sname!r}: expected one type")
        st, ss = stypes[0], sspec[stypes[0]] or {}
        if st in metric_fns:
            aggs[sname] = (st, _metric_on(cp, st, ss))
        elif st == "value_count":
            _metric_on(cp, st, ss)
            aggs[sname] = ("count", ss.get("field"))
        elif st == "bucket_script":
            script_specs.append((sname, ss))
        elif st == "bucket_selector":
            if having is not None:
                raise DslError("one bucket_selector per terms agg")
            having = ss
        else:
            raise DslError(
                f"sub-agg {sname!r}: {st!r} cannot combine with "
                f"bucket_script/bucket_selector here"
            )
    names = set(aggs)
    scripts: dict = {}
    for sname, ss in script_specs:
        scripts[sname] = _pipeline_script(ss, names, "bucket_script")
        names.add(sname)
    hav = (
        _pipeline_script(having, names, "bucket_selector")
        if having is not None else None
    )
    return ix.bucket_script(
        by=by, aggs=aggs, scripts=scripts or None, having=hav,
        k=size, **base,
    )


def _terms_order_spec(o) -> tuple[str, str] | None:
    """ES order spec ({key: dir} or [{key: dir}]) -> (key, dir)."""
    if o is None:
        return None
    if isinstance(o, (list, tuple)):
        if len(o) != 1:
            raise DslError("terms order: one order key supported")
        o = o[0]
    if not isinstance(o, dict) or len(o) != 1:
        raise DslError("terms order: expected {key: 'asc'|'desc'}")
    ((key, direction),) = o.items()
    return str(key), str(direction)


def _terms_sub(cp, name, by, size, sub, base, order=None) -> DataFrame:
    """terms agg with ONE sub-agg: stats-family -> facet_stats,
    top_hits -> top_hits, bucket_sort -> bucket_sort. Sub-agg sets
    containing bucket_script/bucket_selector take the pipeline path."""
    ix = cp.ix
    all_types = {
        st for a in sub.values()
        for st in a if st not in ("aggs", "aggregations")
    }
    if all_types & {"bucket_script", "bucket_selector"}:
        if order is not None:
            raise DslError(
                "terms order: unsupported with bucket_script/bucket_selector"
            )
        return _terms_pipeline(cp, name, by, size, sub, base)
    if len(sub) != 1:
        raise DslError(f"agg {name!r}: one sub-agg under terms supported")
    ((sname, sspec),) = sub.items()
    stypes = [kk for kk in sspec if kk not in ("aggs", "aggregations")]
    if len(stypes) != 1:
        raise DslError(f"sub-agg {sname!r}: expected one type")
    st = stypes[0]
    ss = sspec[st] or {}
    if st == "terms":
        if order is not None:
            raise DslError(
                "terms order: unsupported with a nested terms sub-agg"
            )
        return ix.facet_nested(
            by=by,
            then_by=_metric_on(cp, st, ss),
            k=size,
            k_inner=int(ss.get("size", 5)),
            **base,
        )
    if st == "percentiles":
        if order is not None:
            raise DslError(
                "terms order: unsupported with a percentiles sub-agg"
            )
        # one DSL default for percentiles at every nesting level —
        # the engine methods keep their own (gate-pinned) defaults
        percents = [float(x) for x in ss.get("percents") or
                    (25.0, 50.0, 75.0, 95.0)]
        return ix.facet_percentiles(
            by=by, on=_metric_on(cp, st, ss), k=size,
            percents=percents, **base
        )
    if st in ("stats", "avg", "min", "max", "sum"):
        if order is not None:
            key, direction = order
            if key == sname and st != "stats":
                key = st  # order: {<single-value sub name>: dir}
            elif key.startswith(f"{sname}."):
                sm = key.split(".", 1)[1]
                if sm == "count":
                    # ES stats.count is the VALUE count (non-null); our
                    # bucket table carries doc_count — refusing beats a
                    # silently different order on sparse columns
                    raise DslError(
                        "terms order: '<stats>.count' orders by value "
                        "count in ES, which this bucket table does not "
                        "carry — order by _count for document count"
                    )
                if sm not in ("min", "max", "sum", "avg"):
                    raise DslError(f"terms order: unknown sub-metric {key!r}")
                key = sm
            elif key not in ("_count", "_key"):
                raise DslError(
                    f"terms order: {key!r} names no sub-aggregation "
                    f"(have {sname!r})"
                )
            order = (key, direction)
        return ix.facet_stats(
            by=by, on=_metric_on(cp, st, ss), k=size, order=order, **base
        )
    if st == "top_hits":
        if order is not None:
            raise DslError("terms order: unsupported with a top_hits sub-agg")
        if base["filters"] is not None:
            raise DslError("top_hits: filtered context unsupported")
        if base["query"] is None:
            raise DslError("top_hits needs a match query context")
        return ix.top_hits(
            base["query"], by=by, size=int(ss.get("size", 3)),
            field=base["field"],
        )
    if st == "bucket_sort":
        if order is not None:
            raise DslError(
                "terms order: unsupported with a bucket_sort sub-agg "
                "(bucket_sort IS the ordering)"
            )
        s = _as_list(ss.get("sort"))
        sort_on, asc = "doc_count", False
        if s:
            ((sf, so),) = s[0].items()
            sort_on = sf
            asc = (
                so.get("order", "desc") if isinstance(so, dict) else str(so)
            ) == "asc"
        return ix.bucket_sort(
            by=by, sort_on=sort_on, ascending=asc,
            size=int(ss.get("size", 10)), offset=int(ss.get("from", 0)),
            **base,
        )
    raise DslError(f"unsupported sub-agg under terms: {st!r}")


def _dh_sub(cp, name, on, interval, sub, base) -> DataFrame:
    """date_histogram with pipeline sub-aggs: cumulative_sum / derivative
    / moving_fn -> the pipeline bundle; serial_diff -> serial_diff;
    avg/min/max/sum_bucket -> the sibling bucket-stats bundle."""
    ix = cp.ix
    stypes = {
        st for a in sub.values()
        for st in a if st not in ("aggs", "aggregations")
    }
    if stypes <= {
        "cumulative_sum", "derivative", "moving_fn", "moving_avg", "sum"
    } and stypes - {"sum"}:
        window = 3
        sum_name, sum_field = None, None
        paths: set = set()
        for nm2, a in sub.items():
            for st, ss in a.items():
                if st in ("aggs", "aggregations"):
                    continue
                if st in ("moving_fn", "moving_avg") and ss.get("window"):
                    window = int(ss["window"])
                if st == "sum":
                    sum_name = nm2
                    sum_field = (ss or {}).get("field")
                    cp._meta_field("sum", sum_field, None)
                else:
                    bp = (ss or {}).get("buckets_path")
                    if bp is not None:
                        paths.add(str(bp))
        # resolve the pipelines' series: an explicit buckets_path wins
        # ("_count" = doc_count even when a sum sibling exists; the sum
        # sibling's name = its metric); absent, the legacy default keeps
        # the sum sibling (else doc_count). Disagreeing or dangling paths
        # refuse — silently-different series are worse than an error.
        if len(paths) > 1:
            raise DslError(
                f"pipeline buckets_path disagree: {sorted(paths)} — "
                f"run them as separate aggregation requests"
            )
        bp = next(iter(paths)) if paths else None
        if bp is None:
            value = sum_field
        elif bp == "_count":
            value = None
        elif sum_name is not None and bp == sum_name:
            value = sum_field
        else:
            raise DslError(
                f"buckets_path {bp!r} names no sibling here (have "
                f"'_count'{' and %r' % sum_name if sum_name else ''})"
            )
        return ix.date_histogram_pipeline(
            on=on, interval=interval, window=window, value=value, **base
        )
    if stypes == {"serial_diff"}:
        ((_, a),) = sub.items()
        lag = int((a.get("serial_diff") or {}).get("lag", 1))
        return ix.serial_diff(on=on, interval=interval, lag=lag, **base)
    if stypes == {"top_hits"}:
        ((_, a),) = sub.items()
        ss = a.get("top_hits") or {}
        if base["filters"] is not None:
            raise DslError("top_hits: filtered context unsupported")
        if base["query"] is None:
            raise DslError("top_hits needs a match query context")
        return ix.top_hits(
            base["query"], by=on, size=int(ss.get("size", 3)),
            field=base["field"], interval=interval,
        )
    if stypes == {"terms"}:
        ((_, a),) = sub.items()
        ss = a.get("terms") or {}
        return ix.date_terms_nested(
            on=on,
            then_by=_metric_on(cp, "terms", ss),
            interval=interval,
            k_inner=int(ss.get("size", 5)),
            **base,
        )
    if stypes == {"rate"}:
        ((_, a),) = sub.items()
        ss = a.get("rate") or {}
        value = ss.get("field")
        if value is not None:
            cp._meta_field("rate", value, None)
        return ix.rate_agg(
            on=on, interval=interval,
            unit=str(ss.get("unit", interval)), value=value, **base,
        )
    if stypes == {"bucket_correlation", "sum"} or stypes == {
        "bucket_correlation"
    }:
        value = None
        for a in sub.values():
            for st, ss in a.items():
                if st == "sum":
                    value = (ss or {}).get("field")
                elif st == "bucket_correlation":
                    value = (ss or {}).get("field", value)
        if not value:
            raise DslError(
                "bucket_correlation: need the metric field (a sum sibling "
                "with 'field', or 'field' directly)"
            )
        cp._meta_field("bucket_correlation", value, None)
        return ix.bucket_correlation(
            on=on, value=value, interval=interval, **base
        )
    if stypes == {"cumulative_cardinality"} or stypes == {
        "cumulative_cardinality", "cardinality"
    }:
        # ES shape: a cardinality sibling + cumulative_cardinality
        # referencing it via buckets_path; the entity field comes from
        # either the sibling or a direct 'field'
        entity = None
        for a in sub.values():
            for st, ss in a.items():
                if st in ("cardinality", "cumulative_cardinality"):
                    entity = (ss or {}).get("field", entity)
        if not entity:
            raise DslError(
                "cumulative_cardinality: need the entity field (a "
                "cardinality sibling with 'field', or 'field' directly)"
            )
        cp._meta_field("cumulative_cardinality", entity, None)
        return ix.cumulative_cardinality(
            on=on, entity=entity, interval=interval, **base
        )
    if stypes <= {
        "avg_bucket", "min_bucket", "max_bucket", "sum_bucket",
        "stats_bucket",
    }:
        # stats_bucket = the whole bundle in one sibling agg (ES returns
        # min/max/avg/sum/count of the bucket series — exactly these cols)
        return ix.bucket_stats_pipeline(on=on, interval=interval, **base)
    if stypes == {"extended_stats_bucket"}:
        ss = next(iter(next(iter(sub.values())).values())) or {}
        return ix.extended_stats_bucket(
            on=on, interval=interval,
            sigma=float(ss.get("sigma", 2.0)), **base,
        )
    if stypes == {"bucket_count_ks_test"}:
        ss = next(iter(next(iter(sub.values())).values())) or {}
        alts = ss.get("alternative", "two_sided")
        if isinstance(alts, (list, tuple)):
            if len(alts) != 1:
                raise DslError(
                    "bucket_count_ks_test: exactly one alternative "
                    f"(one row per call), got {list(alts)}"
                )
            alts = alts[0]
        return ix.bucket_count_ks_test(
            on=on, interval=interval,
            fractions=ss.get("fractions"),
            alternative=str(alts), **base,
        )
    raise DslError(
        f"unsupported date_histogram sub-aggs: {sorted(stypes)}"
    )

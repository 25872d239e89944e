"""ES|QL — Elasticsearch's ``_query`` pipe language — compiled to Spark.

The reference's users query Elasticsearch; since 8.11 the primary ad-hoc
surface there is ES|QL (``POST /_query {"query": "FROM idx | WHERE ... |
STATS ... BY ..."}``).  This module gives the engine that surface: a
recursive-descent parser for the public ES|QL grammar and a compiler that
turns each pipe command into DataFrame transformations, so the WHOLE query
becomes one Catalyst plan (filter pushdown, column pruning and partial
aggregation all apply — nothing is evaluated driver-side).

Spark-first mapping, command by command:

===============  ==========================================================
``FROM``         named table (or index pattern) -> the relation; an
                 ``InvertedIndex`` source exposes ``doc_id`` + its stored
                 meta columns (the ES ``_source`` model)
``WHERE``        ``df.filter(<Column>)``; full-text predicates
                 (``MATCH``/``MATCH_PHRASE``/``QSTR``) are extracted from
                 the top-level AND
                 chain and become bucket-pruned postings scans joined back
                 as doc_id semi/anti-joins — the 100-TB shape: the posting
                 scan touches only the query terms' buckets, never the
                 corpus
``EVAL``         sequential ``withColumn`` projections (pure Catalyst)
``STATS .. BY``  ``groupBy(keys).agg(...)`` — map-side partial agg for
                 free; per-aggregate ``WHERE`` filters (8.16) become
                 ``F.when(cond, input)`` inside the same single agg
``INLINESTATS``  window aggregate partitioned by the BY keys (appends the
                 aggregate without collapsing rows)
``CHANGE_POINT`` step-change split via cumulative window sums (marks the
                 max-SSE-gain boundary; no driver loop)
``FORK``         branch sub-pipelines over one shared input, unioned by
                 name with a ``_fork`` discriminator
``FUSE``         rank fusion of FORK branches (ES 8.19): per-branch rank
                 window on the rounded ``_score``, one groupBy(doc_id) —
                 RRF (``1/(60+rank)`` summed) or ``linear`` (score sum)
``RERANK``       second-stage scoring (ES 8.18): a registered inference
                 callable runs as an Arrow-batched pandas UDF; without one
                 a DETERMINISTIC token-overlap scorer (pure Catalyst)
                 stands in for Elastic's default rerank model
``COMPLETION``   prompt -> text column (ES 8.18): registered callable via
                 Arrow-batched pandas UDF; the builtin ``stub`` id echoes
                 deterministically (declared stand-in — no LLM here)
``SORT/LIMIT``   ``orderBy`` + ``limit`` -> TakeOrderedAndProject
``KEEP/DROP``    column pruning, wildcard patterns expanded in order
``RENAME``       ``withColumnRenamed``
``MV_EXPAND``    ``explode_outer`` (null-preserving, like ES|QL)
``DISSECT``      one anchored regex compiled from the dissect pattern;
                 per-key ``regexp_extract`` (no Python row path)
``GROK``         same machinery over ``%{SYNTAX:name:type}`` patterns
``ENRICH``       broadcast left join against the registered policy table
``LOOKUP JOIN``  broadcast left join on field equality (lookup columns
                 replace same-named input columns, as in ES|QL)
``ROW``          single-row literal relation (``spark.range(1)`` + select)
===============  ==========================================================

``METADATA _score`` attaches the BM25 score of the positive ``MATCH``
predicates (sum over multiple, like ES|QL) via the engine's scored match
path — rank- and score-identical to :meth:`InvertedIndex.topk`.

``KNN(field, [q...], k)`` in WHERE keeps the rows whose ``array<float>``
column is among the k nearest to the query vector by exact cosine — the
ES|QL KNN function (the 3rd argument replaces ES's options map, which
this grammar has no ``{...}`` literal for). Two-pass plan, never a global
sort: per-partition top-k merge (TakeOrderedAndProject, k rows to the
driver) yields the k-th similarity, then one narrow ``sim >= threshold``
filter — boundary TIES ARE INCLUDED (rank() <= k semantics; determinism
over ES's arbitrary k-cut). With ``METADATA _score`` the similarity is
added to ``_score``, like ES.

Deviations from ES|QL, documented rather than silent (the repo rule: raise
on divergence, never return different-from-ES results quietly):

- integer ``/`` follows Spark/SQL double division (ES|QL truncates INT/INT);
  cast explicitly (``::LONG``) where it matters.
- ``PERCENTILE``/``MEDIAN`` are EXACT (ES|QL uses t-digest approximations);
  exactness is what the DuckDB gate oracles verify.
- full-text functions must be top-level AND conjuncts of a ``WHERE`` on the
  index source (ES|QL has the same placement restriction; we additionally
  reject OR-composition with relational predicates instead of mis-scoring).
- ``MV_MEDIAN`` matches ES values (even-count integral inputs round the
  middle-pair average DOWN) but always returns double — ES preserves the
  input's integer type; a static output type can't depend on it here.
- IP functions (``TO_IP`` / ``CIDR_MATCH`` / ``IP_PREFIX``) are IPv4-only:
  IPv6 input yields null (ES handles both families); ``IP_PREFIX``'s v6
  bit-count argument is accepted for signature parity and ignored.
- TS ``RATE`` is the sum of positive consecutive deltas within each
  series-bucket divided by the bucket span in seconds — counter resets
  handled via the next positive delta, no PromQL-style extrapolation
  (ES does not publish its extrapolation rule to replication precision);
  it requires a unit-span BUCKET on the timestamp in BY.

Reference parity: the reference exposes its data through Elasticsearch
queries (QueryDART.md; Running-ELK.md:112-294); ES|QL is the modern form of
that surface.
"""

from __future__ import annotations

import fnmatch
import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class EsqlError(ValueError):
    """Parse or compile error for an ES|QL query."""


# --------------------------------------------------------------------------
# Lexer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<bq>`[^`]*`)
  | (?P<ident>[A-Za-z_@][A-Za-z0-9_.]*)
  | (?P<op>==|!=|<=|>=|::|[|,()\[\]+\-*/%<>=])
    """,
    re.VERBOSE | re.DOTALL,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


@dataclass
class _Tok:
    typ: str  # num / str / ident / op / eof
    val: str
    pos: int


def _lex(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise EsqlError(f"ES|QL: cannot tokenize at {text[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        v = m.group()
        if kind == "str":
            body = v[1:-1]
            out, j = [], 0
            while j < len(body):
                if body[j] == "\\" and j + 1 < len(body):
                    out.append(_ESCAPES.get(body[j + 1], body[j + 1]))
                    j += 2
                else:
                    out.append(body[j])
                    j += 1
            toks.append(_Tok("str", "".join(out), m.start()))
        elif kind == "bq":
            toks.append(_Tok("ident", v[1:-1], m.start()))
        else:
            toks.append(_Tok(kind, v, m.start()))
    toks.append(_Tok("eof", "", len(text)))
    return toks


# --------------------------------------------------------------------------
# Parser -> AST (plain tuples; first element is the node kind)
# --------------------------------------------------------------------------

_DUR_UNITS = {
    "millisecond": "millisecond", "milliseconds": "millisecond", "ms": "millisecond",
    "second": "second", "seconds": "second", "sec": "second", "s": "second",
    "minute": "minute", "minutes": "minute", "min": "minute",
    "hour": "hour", "hours": "hour", "h": "hour",
    "day": "day", "days": "day", "d": "day",
    "week": "week", "weeks": "week", "w": "week",
    "month": "month", "months": "month", "mo": "month",
    "quarter": "quarter", "quarters": "quarter", "q": "quarter",
    "year": "year", "years": "year", "yr": "year", "y": "year",
}

_CAST_TYPES = {
    "integer": "int", "int": "int", "long": "long", "double": "double",
    "keyword": "string", "string": "string", "text": "string",
    "boolean": "boolean", "bool": "boolean", "datetime": "timestamp",
    "date": "date", "float": "float", "unsigned_long": "long",
}

_COMMANDS = {
    "where", "eval", "stats", "sort", "limit", "keep", "drop", "rename",
    "mv_expand", "dissect", "enrich", "grok", "lookup", "inlinestats",
    "change_point", "fork", "sample", "fuse", "rerank", "completion",
}


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = _lex(text)
        self.i = 0

    # -- token helpers -----------------------------------------------------
    def peek(self, off: int = 0) -> _Tok:
        return self.toks[min(self.i + off, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        if t.typ != "eof":
            self.i += 1
        return t

    def kw(self, word: str) -> bool:
        t = self.peek()
        if t.typ == "ident" and t.val.lower() == word:
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.kw(word):
            raise EsqlError(f"ES|QL: expected {word.upper()} at {self._at()}")

    def op(self, sym: str) -> bool:
        t = self.peek()
        if t.typ == "op" and t.val == sym:
            self.i += 1
            return True
        return False

    def expect_op(self, sym: str) -> None:
        if not self.op(sym):
            raise EsqlError(f"ES|QL: expected {sym!r} at {self._at()}")

    def _at(self) -> str:
        t = self.peek()
        return f"position {t.pos} ({self.text[t.pos:t.pos+20]!r})"

    # -- query := source (| command)* --------------------------------------
    def parse(self) -> list[tuple]:
        cmds = [self.parse_source()]
        while self.op("|"):
            cmds.append(self.parse_command())
        if self.peek().typ != "eof":
            raise EsqlError(f"ES|QL: trailing input at {self._at()}")
        return cmds

    def parse_source(self) -> tuple:
        if self.kw("from"):
            names = [self.ident("index name")]
            while self.op(","):
                names.append(self.ident("index name"))
            meta: list[str] = []
            if self.kw("metadata"):
                meta.append(self.ident("metadata field"))
                while self.op(","):
                    meta.append(self.ident("metadata field"))
            return ("from", names, meta)
        if self.kw("row"):
            items = self.parse_assignments(require_name=True)
            return ("row", items)
        if self.kw("ts"):
            # ES|QL 8.19 time-series mode: like FROM, but the source must
            # be TS-registered (dimensions + timestamp) and STATS gains
            # the *_over_time / RATE per-series aggregates
            name = self.ident("time-series source name")
            return ("ts", name)
        raise EsqlError(
            f"ES|QL: query must start with FROM, ROW or TS, at {self._at()}"
        )

    def ident(self, what: str) -> str:
        t = self.peek()
        if t.typ != "ident":
            raise EsqlError(f"ES|QL: expected {what} at {self._at()}")
        self.i += 1
        # index patterns may continue with '*' / '-' glued on (logs-*)
        name = t.val
        end = t.pos + len(t.val)
        while True:
            nt = self.peek()
            if nt.pos != end:
                break
            if nt.typ == "op" and nt.val in ("*", "-"):
                name += nt.val
            elif nt.typ in ("ident", "num"):
                name += nt.val
            else:
                break
            end = nt.pos + len(nt.val)
            self.i += 1
        return name

    def parse_command(self) -> tuple:
        t = self.peek()
        if t.typ != "ident" or t.val.lower() not in _COMMANDS:
            raise EsqlError(f"ES|QL: expected a command at {self._at()}")
        cmd = self.next().val.lower()
        if cmd == "where":
            return ("where", self.parse_expr())
        if cmd == "eval":
            return ("eval", self.parse_assignments(require_name=False))
        if cmd in ("stats", "inlinestats"):
            items = self.parse_assignments(require_name=False, allow_where=True)
            by: list[tuple[str | None, tuple]] = []
            if self.kw("by"):
                by = self.parse_assignments(require_name=False)
            return (cmd, items, by)
        if cmd == "fork":
            branches: list[list[tuple]] = []
            while self.op("("):
                sub = [self.parse_command()]
                while self.op("|"):
                    sub.append(self.parse_command())
                self.expect_op(")")
                branches.append(sub)
            if len(branches) < 2:
                raise EsqlError(
                    "ES|QL: FORK needs at least two (branch) pipelines"
                )
            return ("fork", branches)
        if cmd == "change_point":
            value = self.ident("value column")
            self.expect_kw("on")
            key = self.ident("key column")
            names = ("type", "gain")
            if self.kw("as"):
                a = self.ident("type column")
                self.expect_op(",")
                b = self.ident("gain column")
                names = (a, b)
            return ("change_point", value, key, names)
        if cmd == "sort":
            keys = [self.parse_sort_key()]
            while self.op(","):
                keys.append(self.parse_sort_key())
            return ("sort", keys)
        if cmd == "limit":
            t = self.next()
            if t.typ != "num" or "." in t.val:
                raise EsqlError("ES|QL: LIMIT takes an integer")
            return ("limit", int(t.val))
        if cmd == "sample":
            t = self.next()
            if t.typ != "num":
                raise EsqlError("ES|QL: SAMPLE takes a probability")
            p = float(t.val)
            if not 0.0 < p < 1.0:
                raise EsqlError("ES|QL: SAMPLE probability must be in (0, 1)")
            seed = 0
            if self.op(","):
                st = self.next()
                if st.typ != "num" or "." in st.val:
                    raise EsqlError("ES|QL: SAMPLE seed must be an integer")
                seed = int(st.val)
            return ("sample", p, seed)
        if cmd in ("keep", "drop"):
            pats = [self.parse_name_pattern()]
            while self.op(","):
                pats.append(self.parse_name_pattern())
            return (cmd, pats)
        if cmd == "rename":
            pairs = []
            while True:
                old = self.ident("column")
                self.expect_kw("as")
                new = self.ident("column")
                pairs.append((old, new))
                if not self.op(","):
                    break
            return ("rename", pairs)
        if cmd == "mv_expand":
            return ("mv_expand", self.ident("column"))
        if cmd in ("dissect", "grok"):
            col = self.ident("column")
            t = self.next()
            if t.typ != "str":
                raise EsqlError(f"ES|QL: {cmd.upper()} needs a quoted pattern")
            return (cmd, col, t.val)
        if cmd == "lookup":
            self.expect_kw("join")
            table = self.ident("lookup index")
            self.expect_kw("on")
            key = self.ident("join field")
            return ("lookup", table, key)
        if cmd == "rerank":
            # RERANK [target =] "query" ON field [WITH inference_id]
            target = "_score"
            if (
                self.peek().typ == "ident"
                and self.peek(1).typ == "op"
                and self.peek(1).val == "="
            ):
                target = self.next().val
                self.next()  # '='
            t = self.next()
            if t.typ != "str":
                raise EsqlError('ES|QL: RERANK [target =] "query text" ON field')
            query = t.val
            self.expect_kw("on")
            field = self.ident("rerank field")
            if self.op(","):
                raise EsqlError(
                    "ES|QL: RERANK supports a single ON field "
                    "(concatenate with EVAL first)"
                )
            iid = None
            if self.kw("with"):
                w = self.next()
                if w.typ not in ("ident", "str"):
                    raise EsqlError("ES|QL: RERANK WITH <inference_id>")
                iid = w.val
            return ("rerank", target, query, field, iid)
        if cmd == "completion":
            # COMPLETION [target =] prompt_expr WITH inference_id
            target = "completion"
            if (
                self.peek().typ == "ident"
                and self.peek(1).typ == "op"
                and self.peek(1).val == "="
            ):
                target = self.next().val
                self.next()  # '='
            prompt = self.parse_expr()
            self.expect_kw("with")
            w = self.next()
            if w.typ not in ("ident", "str"):
                raise EsqlError("ES|QL: COMPLETION ... WITH <inference_id>")
            return ("completion", target, prompt, w.val)
        if cmd == "fuse":
            method = "rrf"
            t = self.peek()
            if t.typ == "ident" and t.val.lower() not in _COMMANDS:
                method = self.next().val.lower()
                if method not in ("rrf", "linear"):
                    raise EsqlError(
                        f"ES|QL: FUSE method {method!r} (rrf or linear); "
                        "SCORE/KEY/GROUP BY and WITH options are not "
                        "supported — defaults are score _score, key doc_id, "
                        "group _fork, rank_constant 60"
                    )
            return ("fuse", method)
        if cmd == "enrich":
            policy = self.ident("policy")
            on = None
            if self.kw("on"):
                on = self.ident("match field")
            withs: list[tuple[str, str]] = []
            if self.kw("with"):
                while True:
                    a = self.ident("field")
                    if self.op("="):
                        withs.append((a, self.ident("field")))
                    else:
                        withs.append((a, a))
                    if not self.op(","):
                        break
            return ("enrich", policy, on, withs)
        raise EsqlError(f"ES|QL: {cmd.upper()} is not supported")

    def parse_name_pattern(self) -> str:
        # KEEP/DROP patterns: identifiers and '*' glued together (a.b*, *)
        parts: list[str] = []
        last_end = None
        while True:
            t = self.peek()
            glued = last_end is None or t.pos == last_end
            if t.typ == "ident" and glued:
                parts.append(t.val)
            elif t.typ == "op" and t.val == "*" and glued:
                parts.append("*")
            else:
                break
            last_end = t.pos + len(t.val)
            self.i += 1
        if not parts:
            raise EsqlError(f"ES|QL: expected a column pattern at {self._at()}")
        return "".join(parts)

    def parse_sort_key(self) -> tuple:
        e = self.parse_expr()
        asc = True
        if self.kw("desc"):
            asc = False
        else:
            self.kw("asc")
        nulls = None
        if self.kw("nulls"):
            if self.kw("first"):
                nulls = "first"
            elif self.kw("last"):
                nulls = "last"
            else:
                raise EsqlError("ES|QL: NULLS must be FIRST or LAST")
        return (e, asc, nulls)

    def parse_assignments(
        self, require_name: bool, allow_where: bool = False
    ) -> list[tuple]:
        """(name, expr) pairs; with ``allow_where`` (STATS/INLINESTATS),
        (name, expr, cond|None) triples — ES|QL 8.16 per-aggregate
        ``WHERE`` filters."""
        items: list[tuple] = []
        while True:
            start = self.peek().pos
            name = None
            if (
                self.peek().typ == "ident"
                and self.peek(1).typ == "op"
                and self.peek(1).val == "="
            ):
                name = self.next().val
                self.next()  # '='
                start = self.peek().pos
            elif require_name:
                raise EsqlError(f"ES|QL: expected name = expr at {self._at()}")
            e = self.parse_expr()
            if allow_where:
                cond = self.parse_expr() if self.kw("where") else None
                if name is None:
                    # ES|QL default column name = the item's full source
                    # text INCLUDING any per-aggregate WHERE, so two
                    # filtered copies of the same aggregate stay distinct
                    name = self.text[start:self.peek().pos].strip()
                items.append((name, e, cond))
            else:
                if name is None:
                    # ES|QL default column name = the expression's source text
                    name = self.text[start:self.peek().pos].strip()
                items.append((name, e))
            if not self.op(","):
                break
        return items

    # -- expressions --------------------------------------------------------
    def parse_expr(self) -> tuple:
        return self.parse_or()

    def parse_or(self) -> tuple:
        e = self.parse_and()
        while self.kw("or"):
            e = ("or", e, self.parse_and())
        return e

    def parse_and(self) -> tuple:
        e = self.parse_not()
        while self.kw("and"):
            e = ("and", e, self.parse_not())
        return e

    def parse_not(self) -> tuple:
        if self.kw("not"):
            return ("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> tuple:
        e = self.parse_additive()
        t = self.peek()
        if t.typ == "op" and t.val in ("==", "!=", "<", "<=", ">", ">="):
            self.i += 1
            return ("bin", t.val, e, self.parse_additive())
        neg = False
        if t.typ == "ident" and t.val.lower() == "not" and self.peek(1).typ == "ident" \
                and self.peek(1).val.lower() in ("in", "like", "rlike"):
            self.i += 1
            neg = True
            t = self.peek()
        if t.typ == "ident" and t.val.lower() == "in":
            self.i += 1
            self.expect_op("(")
            vals = [self.parse_expr()]
            while self.op(","):
                vals.append(self.parse_expr())
            self.expect_op(")")
            return ("in", e, vals, neg)
        if t.typ == "ident" and t.val.lower() in ("like", "rlike"):
            kind = t.val.lower()
            self.i += 1
            pt = self.next()
            if pt.typ != "str":
                raise EsqlError(f"ES|QL: {kind.upper()} needs a quoted pattern")
            return (kind, e, pt.val, neg)
        if t.typ == "ident" and t.val.lower() == "is":
            self.i += 1
            isneg = self.kw("not")
            if not self.kw("null"):
                raise EsqlError("ES|QL: IS must be followed by [NOT] NULL")
            return ("isnull", e, isneg)
        return e

    def parse_additive(self) -> tuple:
        e = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.typ == "op" and t.val in ("+", "-"):
                self.i += 1
                e = ("bin", t.val, e, self.parse_multiplicative())
            else:
                return e

    def parse_multiplicative(self) -> tuple:
        e = self.parse_unary()
        while True:
            t = self.peek()
            if t.typ == "op" and t.val in ("*", "/", "%"):
                self.i += 1
                e = ("bin", t.val, e, self.parse_unary())
            else:
                return e

    def parse_unary(self) -> tuple:
        if self.op("-"):
            return ("neg", self.parse_unary())
        if self.op("+"):
            return self.parse_unary()
        e = self.parse_primary()
        while self.op("::"):
            ty = self.ident("type").lower()
            if ty not in _CAST_TYPES:
                raise EsqlError(f"ES|QL: unknown cast type {ty!r}")
            e = ("cast", e, _CAST_TYPES[ty])
        return e

    def parse_primary(self) -> tuple:
        t = self.peek()
        if t.typ == "num":
            self.i += 1
            nxt = self.peek()
            if nxt.typ == "ident" and nxt.val.lower() in _DUR_UNITS and "." not in t.val:
                self.i += 1
                return ("dur", int(t.val), _DUR_UNITS[nxt.val.lower()])
            return ("num", float(t.val) if "." in t.val or "e" in t.val.lower()
                    else int(t.val))
        if t.typ == "str":
            self.i += 1
            return ("str", t.val)
        if self.op("("):
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if self.op("["):
            elems = [self.parse_expr()]
            while self.op(","):
                elems.append(self.parse_expr())
            self.expect_op("]")
            return ("list", elems)
        if t.typ == "ident":
            low = t.val.lower()
            if low in ("true", "false"):
                self.i += 1
                return ("bool", low == "true")
            if low == "null":
                self.i += 1
                return ("null",)
            # function call?
            if self.peek(1).typ == "op" and self.peek(1).val == "(":
                name = self.next().val.lower()
                self.next()  # '('
                args: list[tuple] = []
                if not self.op(")"):
                    if name == "count" and self.peek().typ == "op" \
                            and self.peek().val == "*":
                        self.next()
                        args.append(("star",))
                    else:
                        args.append(self.parse_expr())
                    while self.op(","):
                        args.append(self.parse_expr())
                    self.expect_op(")")
                return ("call", name, args)
            self.i += 1
            return ("col", t.val)
        raise EsqlError(f"ES|QL: unexpected token at {self._at()}")


# --------------------------------------------------------------------------
# Compiler
# --------------------------------------------------------------------------

def _like_to_regex(pat: str) -> str:
    """ES|QL LIKE: '*' any chars, '?' one char, full-string anchored."""
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^(?:" + "".join(out) + ")$"


def _interval(n: int, unit: str) -> Column:
    kw = {
        "year": dict(years=n), "quarter": dict(months=3 * n),
        "month": dict(months=n), "week": dict(weeks=n), "day": dict(days=n),
        "hour": dict(hours=n), "minute": dict(mins=n), "second": dict(secs=n),
        "millisecond": dict(secs=n / 1000.0),
    }[unit]
    args = {k: F.lit(v) for k, v in kw.items()}
    return F.make_interval(**args)


_AGG_FNS = {
    "count", "count_distinct", "sum", "avg", "min", "max", "median",
    "median_absolute_deviation", "percentile", "std_dev", "weighted_avg",
    "values",
}

_FT_FNS = {"match", "match_phrase", "qstr", "knn"}

# time-series (TS source) per-series aggregates, ES|QL 8.19
_TS_FNS = {
    "max_over_time", "min_over_time", "avg_over_time", "sum_over_time",
    "count_over_time", "first_over_time", "last_over_time", "rate",
}

_TS_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _subst_ts_calls(node: tuple, found: list) -> tuple:
    """Replace every *_over_time / RATE call in an expression tree with a
    placeholder column reference ('col', '__tsN'), appending (placeholder,
    fn, args) to ``found`` — the inner per-series aggregates the TS STATS
    path computes first."""
    if not isinstance(node, tuple):
        return node
    if node[0] == "call" and node[1] in _TS_FNS:
        ph = f"__ts{len(found)}"
        found.append((ph, node[1], node[2]))
        return ("col", ph)
    out = [node[0]]
    for part in node[1:]:
        if isinstance(part, tuple):
            out.append(_subst_ts_calls(part, found))
        elif isinstance(part, list):
            out.append([
                _subst_ts_calls(c, found) if isinstance(c, tuple) else c
                for c in part
            ])
        else:
            out.append(part)
    return tuple(out)


def _contains_ts_fn(node: tuple) -> bool:
    if not isinstance(node, tuple):
        return False
    if node[0] == "call" and node[1] in _TS_FNS:
        return True
    return any(
        _contains_ts_fn(c) for c in node[1:] if isinstance(c, tuple)
    ) or any(
        _contains_ts_fn(c)
        for part in node[1:] if isinstance(part, list)
        for c in part if isinstance(c, tuple)
    )


def _agg_args_reference(node: tuple, cols: set[str]) -> bool:
    """True when every aggregate call in the tree references at least one
    of ``cols`` in its arguments (the TS validation: an outer aggregate
    must consume per-series values, not raw rows)."""
    ok = True
    if node[0] == "call" and node[1] in _AGG_FNS:
        refs = set()
        for a in node[2]:
            if isinstance(a, tuple):
                refs |= _collect_cols(a)
        if not (refs & cols):
            return False
    for part in node[1:]:
        if isinstance(part, tuple):
            ok = ok and _agg_args_reference(part, cols)
        elif isinstance(part, list):
            for c in part:
                if isinstance(c, tuple):
                    ok = ok and _agg_args_reference(c, cols)
    return ok


_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])$"
)


def _ipv4_valid(c: Column) -> Column:
    """Strict dotted-quad IPv4 (no leading zeros), as a boolean Column."""
    return c.rlike(_IPV4_RE)


def _ipv4_long(c: Column) -> Column:
    """IPv4 string -> 32-bit value as long (null when not IPv4)."""
    p = F.split(c, r"\.")
    val = (
        p[0].cast("long") * 16777216 + p[1].cast("long") * 65536
        + p[2].cast("long") * 256 + p[3].cast("long")
    )
    return F.when(_ipv4_valid(c), val)


def _contains_agg(node: tuple) -> bool:
    if node[0] == "call" and node[1] in _AGG_FNS:
        return True
    return any(
        _contains_agg(c) for c in node[1:] if isinstance(c, tuple)
    ) or any(
        _contains_agg(c)
        for part in node[1:] if isinstance(part, list)
        for c in part if isinstance(c, tuple)
    )


def _contains_ft(node: tuple) -> bool:
    if node[0] == "call" and node[1] in _FT_FNS:
        return True
    return any(
        _contains_ft(c) for c in node[1:] if isinstance(c, tuple)
    ) or any(
        _contains_ft(c)
        for part in node[1:] if isinstance(part, list)
        for c in part if isinstance(c, tuple)
    )


class _Compiler:
    """Expression AST -> pyspark Column. ``allow_agg`` gates STATS items;
    ``agg_filter`` is a STATS ``WHERE`` condition applied to every
    aggregate INPUT (``F.when(cond, x)`` — aggregates skip nulls, which is
    exactly SQL's ``FILTER (WHERE ...)``)."""

    def __init__(self, allow_agg: bool = False, agg_filter: Column | None = None):
        self.allow_agg = allow_agg
        self.agg_filter = agg_filter

    def col(self, node: tuple) -> Column:
        kind = node[0]
        if kind == "num":
            return F.lit(node[1])
        if kind == "str":
            return F.lit(node[1])
        if kind == "bool":
            return F.lit(node[1])
        if kind == "null":
            return F.lit(None)
        if kind == "col":
            return F.col(node[1])
        if kind == "list":
            return F.array(*[self.col(c) for c in node[1]])
        if kind == "dur":
            return _interval(node[1], node[2])
        if kind == "neg":
            return -self.col(node[1])
        if kind == "not":
            return ~self.col(node[1])
        if kind == "and":
            return self.col(node[1]) & self.col(node[2])
        if kind == "or":
            return self.col(node[1]) | self.col(node[2])
        if kind == "isnull":
            c = self.col(node[1])
            return c.isNotNull() if node[2] else c.isNull()
        if kind == "in":
            c = self.col(node[1])
            vals = [self.col(v) for v in node[2]]
            r = c.isin(*vals)
            return ~r if node[3] else r
        if kind == "like":
            r = self.col(node[1]).rlike(_like_to_regex(node[2]))
            return ~r if node[3] else r
        if kind == "rlike":
            r = self.col(node[1]).rlike("^(?:" + node[2] + ")$")
            return ~r if node[3] else r
        if kind == "cast":
            return self.col(node[1]).cast(node[2])
        if kind == "bin":
            op, lhs, rhs = node[1], node[2], node[3]
            # timestamp +/- duration
            if op in ("+", "-") and rhs[0] == "dur":
                iv = _interval(rhs[1], rhs[2])
                base = self.col(lhs)
                return base + iv if op == "+" else base - iv
            le, rc = self.col(lhs), self.col(rhs)
            return {
                "+": lambda: le + rc, "-": lambda: le - rc,
                "*": lambda: le * rc, "/": lambda: le / rc,
                "%": lambda: le % rc,
                "==": lambda: le == rc, "!=": lambda: le != rc,
                "<": lambda: le < rc, "<=": lambda: le <= rc,
                ">": lambda: le > rc, ">=": lambda: le >= rc,
            }[op]()
        if kind == "call":
            return self.call(node[1], node[2])
        if kind == "star":
            raise EsqlError("ES|QL: '*' only valid inside COUNT(*)")
        raise EsqlError(f"ES|QL: cannot compile node {kind!r}")

    # -- functions ----------------------------------------------------------
    def call(self, name: str, args: list[tuple]) -> Column:
        if name in _FT_FNS:
            raise EsqlError(
                f"ES|QL: {name.upper()}() must be a top-level AND conjunct of "
                "a WHERE on the index source (it compiles to a postings scan,"
                " not a per-row predicate)"
            )
        if name in _AGG_FNS:
            if not self.allow_agg:
                raise EsqlError(
                    f"ES|QL: aggregate {name.upper()}() only valid in STATS"
                )
            return self.agg(name, args)
        a = [self.col(x) for x in args]
        n = len(a)

        def arity(*ok: int) -> None:
            if n not in ok:
                raise EsqlError(f"ES|QL: {name.upper()} takes {ok} args, got {n}")

        if name == "abs":
            arity(1); return F.abs(a[0])
        if name == "round":
            arity(1, 2)
            if n == 1:
                return F.round(a[0], 0)
            d = args[1]
            if d[0] != "num" or not float(d[1]).is_integer():
                raise EsqlError("ES|QL: ROUND decimals must be an integer literal")
            return F.round(a[0], int(d[1]))
        if name == "floor":
            arity(1); return F.floor(a[0])
        if name in ("ceil", "ceiling"):
            arity(1); return F.ceil(a[0])
        if name == "sqrt":
            arity(1); return F.sqrt(a[0])
        if name == "pow":
            arity(2); return F.pow(a[0], a[1])
        if name == "exp":
            arity(1); return F.exp(a[0])
        if name == "log":
            arity(1, 2)
            return F.log(a[0]) if n == 1 else F.log(a[1]) / F.log(a[0])
        if name == "log10":
            arity(1); return F.log10(a[0])
        if name == "signum":
            arity(1); return F.signum(a[0])
        if name in ("sin", "cos", "tan", "asin", "acos", "atan",
                    "sinh", "cosh", "tanh", "cbrt"):
            arity(1); return getattr(F, name)(a[0])
        if name == "atan2":
            arity(2); return F.atan2(a[0], a[1])
        if name == "hypot":
            arity(2); return F.hypot(a[0], a[1])
        if name == "to_radians":
            arity(1); return F.radians(a[0])
        if name == "to_degrees":
            arity(1); return F.degrees(a[0])
        if name == "now":
            # query-time constant, like ES|QL NOW() — non-deterministic
            # across runs, so keep it out of oracle-checked entries
            arity(0); return F.current_timestamp()
        if name == "date_diff":
            # DATE_DIFF("unit", start, end) — ES|QL argument order
            arity(3)
            if args[0][0] != "str":
                raise EsqlError('ES|QL: DATE_DIFF("unit", start, end)')
            unit = args[0][1].lower()
            secs = {
                "seconds": 1, "second": 1, "s": 1,
                "minutes": 60, "minute": 60, "m": 60,
                "hours": 3600, "hour": 3600, "h": 3600,
                "days": 86400, "day": 86400, "d": 86400,
            }.get(unit)
            if secs is None:
                raise EsqlError(
                    f"ES|QL: DATE_DIFF unit {unit!r} (seconds/minutes/"
                    "hours/days; calendar units need DATE_TRUNC arithmetic)"
                )
            return (
                (a[2].cast("timestamp").cast("double")
                 - a[1].cast("timestamp").cast("double")) / F.lit(secs)
            ).cast("long")
        if name == "reverse":
            arity(1); return F.reverse(a[0])
        if name == "repeat":
            arity(2); return F.repeat(a[0], a[1].cast("int"))
        if name == "space":
            arity(1); return F.repeat(F.lit(" "), a[0].cast("int"))
        if name == "bit_length":
            arity(1); return F.bit_length(a[0])
        if name == "byte_length":
            arity(1); return F.octet_length(a[0])
        if name == "md5":
            arity(1); return F.md5(a[0])
        if name == "sha1":
            arity(1); return F.sha1(a[0])
        if name == "sha256":
            arity(1); return F.sha2(a[0], 256)
        if name == "hash":
            # HASH("algorithm", input), ES|QL 8.17
            arity(2)
            if args[0][0] != "str":
                raise EsqlError('ES|QL: HASH("md5|sha1|sha256", input)')
            alg = args[0][1].lower()
            if alg == "md5":
                return F.md5(a[1])
            if alg == "sha1":
                return F.sha1(a[1])
            if alg == "sha256":
                return F.sha2(a[1], 256)
            raise EsqlError(f"ES|QL: HASH algorithm {alg!r} not supported")
        if name == "to_base64":
            arity(1); return F.base64(F.encode(a[0], "utf-8"))
        if name == "from_base64":
            arity(1); return F.decode(F.unbase64(a[0]), "utf-8")
        if name == "to_ip":
            # IPv4 only (documented): the strict dotted-quad or null —
            # ES's conversion functions also yield null (+ warning) on
            # unconvertible input
            arity(1)
            return F.when(_ipv4_valid(a[0]), a[0])
        if name == "cidr_match":
            # CIDR_MATCH(ip, "block", ...): true when the ip falls in ANY
            # literal IPv4 block; non-IPv4 input yields null
            if n < 2:
                raise EsqlError('ES|QL: CIDR_MATCH(ip, "a.b.c.d/n", ...)')
            ip_l = _ipv4_long(a[0])
            cond = F.lit(False)
            for blk in args[1:]:
                if blk[0] != "str" or "/" not in blk[1]:
                    raise EsqlError(
                        "ES|QL: CIDR_MATCH blocks must be literal "
                        '"a.b.c.d/n" strings (IPv4)'
                    )
                net_s, bits_s = blk[1].rsplit("/", 1)
                bits = int(bits_s)
                if not (0 <= bits <= 32):
                    raise EsqlError(f"ES|QL: CIDR prefix /{bits_s} out of range")
                octs = net_s.split(".")
                if len(octs) != 4 or not all(
                    o.isdigit() and 0 <= int(o) <= 255 for o in octs
                ):
                    raise EsqlError(f"ES|QL: bad CIDR network {net_s!r}")
                net = (int(octs[0]) << 24 | int(octs[1]) << 16
                       | int(octs[2]) << 8 | int(octs[3]))
                shift = 32 - bits
                cond = cond | (
                    F.floor(ip_l / F.lit(float(1 << shift)))
                    == F.lit(net >> shift)
                )
            return F.when(_ipv4_valid(a[0]), cond)
        if name == "ip_prefix":
            # IP_PREFIX(ip, v4_bits, v6_bits): keep the first v4_bits and
            # zero the rest (IPv4 only; the v6 arg is accepted for ES
            # signature parity and ignored)
            arity(3)
            if args[1][0] != "num" or not isinstance(args[1][1], int):
                raise EsqlError("ES|QL: IP_PREFIX v4 bit count must be a "
                                "literal integer")
            bits = args[1][1]
            if not (0 <= bits <= 32):
                raise EsqlError(f"ES|QL: IP_PREFIX /{bits} out of range")
            shift = 32 - bits
            masked = F.floor(_ipv4_long(a[0]) / F.lit(float(1 << shift))) \
                * F.lit(1 << shift) if bits < 32 else _ipv4_long(a[0])
            parts = [
                (F.floor(masked / F.lit(float(d))) % 256).cast("int")
                for d in (16777216, 65536, 256, 1)
            ]
            return F.when(
                _ipv4_valid(a[0]), F.concat_ws(".", *parts)
            )
        if name == "mv_median":
            arity(1)
            s = F.array_sort(a[0])
            sz = F.size(a[0])
            lo = F.try_element_at(s, ((sz + 1) / 2).cast("int"))
            hi = F.try_element_at(s, (sz / 2 + 1).cast("int"))
            # ES: even-count median = average of the middle two, rounded
            # DOWN when the input type is integral (value parity; the
            # output is widened to double — documented deviation)
            avg = (lo.cast("double") + hi.cast("double")) / 2
            is_int = F.typeof(lo).isin("tinyint", "smallint", "int", "bigint")
            even = F.when(is_int, F.floor(avg).cast("double")).otherwise(avg)
            return F.when(sz % 2 == 1, lo.cast("double")).otherwise(even)
        if name == "mv_append":
            arity(2); return F.concat(a[0], a[1])
        if name == "mv_zip":
            arity(2, 3)
            sep = a[2] if n == 3 else F.lit(",")
            # ES: when one side runs out, the longer side's value stands
            # alone (no separator)
            return F.zip_with(
                a[0], a[1],
                lambda x, y: F.when(x.isNull(), y)
                .when(y.isNull(), x)
                .otherwise(F.concat(x, sep, y)),
            )
        if name == "length":
            arity(1); return F.length(a[0])
        if name == "concat":
            return F.concat(*a)
        if name == "to_lower":
            arity(1); return F.lower(a[0])
        if name == "to_upper":
            arity(1); return F.upper(a[0])
        if name == "trim":
            arity(1); return F.trim(a[0])
        if name == "ltrim":
            arity(1); return F.ltrim(a[0])
        if name == "rtrim":
            arity(1); return F.rtrim(a[0])
        if name == "substring":
            arity(2, 3)
            ln = a[2] if n == 3 else F.length(a[0])
            return F.substring(a[0], a[1], ln)
        if name == "left":
            arity(2); return F.substring(a[0], F.lit(1), a[1])
        if name == "right":
            arity(2)
            return F.when(
                F.length(a[0]) <= a[1], a[0]
            ).otherwise(F.substring(a[0], -a[1].cast("int"), a[1]))
        if name == "starts_with":
            arity(2); return a[0].startswith(a[1])
        if name == "ends_with":
            arity(2); return a[0].endswith(a[1])
        if name == "replace":
            arity(3); return F.regexp_replace(a[0], a[1], a[2])
        if name == "split":
            arity(2)
            d = args[1]
            if d[0] != "str":
                raise EsqlError("ES|QL: SPLIT delimiter must be a string literal")
            return F.split(a[0], re.escape(d[1]))
        if name == "locate":
            arity(2)
            s = args[1]
            if s[0] != "str":
                raise EsqlError("ES|QL: LOCATE substring must be a literal")
            return F.locate(s[1], a[0])
        if name == "coalesce":
            return F.coalesce(*a)
        if name == "greatest":
            return F.greatest(*a)
        if name == "least":
            return F.least(*a)
        if name == "case":
            if n < 2:
                raise EsqlError("ES|QL: CASE needs cond, value pairs")
            pairs, default = a, None
            if n % 2 == 1:
                pairs, default = a[:-1], a[-1]
            c = F.when(pairs[0], pairs[1])
            for j in range(2, len(pairs), 2):
                c = c.when(pairs[j], pairs[j + 1])
            return c.otherwise(default) if default is not None else c
        if name == "bucket":
            # ES|QL BUCKET: the histogram idiom of STATS ... BY.
            # BUCKET(ts, 1 day) -> date_trunc; BUCKET(n, 50) -> floor-align.
            # The 4-arg "nice width from a target bucket count" form picks
            # widths heuristically — refuse rather than silently diverge.
            if n == 4:
                raise EsqlError(
                    "ES|QL: 4-arg BUCKET (target count + range) picks "
                    "human-nice widths; use the explicit-span 2-arg form"
                )
            arity(2)
            span = args[1]
            if span[0] == "dur":
                if span[1] != 1:
                    raise EsqlError(
                        "ES|QL: BUCKET time span must be a unit span (1 day)"
                    )
                return F.date_trunc(span[2], a[0])
            return F.floor(a[0] / a[1]) * a[1]
        if name == "date_trunc":
            arity(2)
            d = args[0]
            if d[0] != "dur" or d[1] != 1:
                raise EsqlError("ES|QL: DATE_TRUNC needs a unit span like 1 day")
            return F.date_trunc(d[2], a[1])
        if name == "date_format":
            arity(2)
            f0 = args[0]
            if f0[0] != "str":
                raise EsqlError("ES|QL: DATE_FORMAT pattern must be a literal")
            return F.date_format(a[1], f0[1])
        if name == "date_parse":
            # same DateTimeFormatter pattern language on both engines;
            # unparseable input yields null (ES: null + warning header)
            arity(2)
            f0 = args[0]
            if f0[0] != "str":
                raise EsqlError("ES|QL: DATE_PARSE pattern must be a literal")
            # try_ variant: unparseable input -> null (ANSI mode would
            # throw), matching ES's null + warning
            return F.try_to_timestamp(a[1], F.lit(f0[1]))
        if name == "date_extract":
            arity(2)
            f0 = args[0]
            if f0[0] != "str":
                raise EsqlError("ES|QL: DATE_EXTRACT part must be a literal")
            part = f0[1].lower()
            parts = {
                "year": F.year, "month_of_year": F.month, "day_of_month":
                F.dayofmonth, "hour_of_day": F.hour, "minute_of_hour":
                F.minute, "second_of_minute": F.second,
                "day_of_week": F.dayofweek, "day_of_year": F.dayofyear,
            }
            if part not in parts:
                raise EsqlError(f"ES|QL: unknown DATE_EXTRACT part {part!r}")
            return parts[part](a[1]).cast("long")
        if name == "to_datetime":
            arity(1); return a[0].cast("timestamp")
        if name == "to_string":
            arity(1); return a[0].cast("string")
        if name in ("to_integer", "to_int"):
            arity(1); return a[0].cast("int")
        if name == "to_long":
            arity(1); return a[0].cast("long")
        if name == "to_double":
            arity(1); return a[0].cast("double")
        if name == "to_boolean":
            arity(1); return a[0].cast("boolean")
        if name == "mv_count":
            arity(1); return F.size(a[0])
        if name == "mv_min":
            arity(1); return F.array_min(a[0])
        if name == "mv_max":
            arity(1); return F.array_max(a[0])
        if name == "mv_sum":
            arity(1); return F.aggregate(
                a[0], F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        if name == "mv_avg":
            arity(1)
            return F.aggregate(
                a[0], F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ) / F.size(a[0])
        if name == "mv_dedupe":
            arity(1); return F.array_distinct(a[0])
        if name == "mv_sort":
            arity(1); return F.sort_array(a[0])
        if name in ("mv_concat", "mv_join"):
            # MV_CONCAT is the ES|QL name; MV_JOIN kept as an alias
            arity(2)
            d = args[1]
            if d[0] != "str":
                raise EsqlError(
                    "ES|QL: MV_CONCAT delimiter must be a literal"
                )
            return F.array_join(a[0], d[1])
        if name == "mv_median_absolute_deviation":
            # per-row MAD of a multivalue: median(|x - median(xs)|), both
            # medians with the same even-count average rule as MV_MEDIAN
            # for double inputs (ES computes MAD over the widened values)
            arity(1)

            def _arr_median(arr: Column) -> Column:
                s = F.array_sort(arr)
                sz = F.size(arr)
                lo = F.try_element_at(s, ((sz + 1) / 2).cast("int")).cast(
                    "double")
                hi = F.try_element_at(s, (sz / 2 + 1).cast("int")).cast(
                    "double")
                return F.when(sz % 2 == 1, lo).otherwise((lo + hi) / 2)

            med = _arr_median(a[0])
            dev = F.transform(
                a[0], lambda x: F.abs(x.cast("double") - med)
            )
            return _arr_median(dev)
        if name == "mv_percentile":
            # ES|QL MV_PERCENTILE: linear interpolation over the sorted
            # multivalue (the documented calculation)
            arity(2)
            if args[1][0] != "num":
                raise EsqlError("ES|QL: MV_PERCENTILE(field, p) literal p")
            p = float(args[1][1])
            if not (0.0 <= p <= 100.0):
                raise EsqlError("ES|QL: MV_PERCENTILE p must be in [0, 100]")
            s = F.array_sort(a[0])
            sz = F.size(a[0])
            # rank r = p/100 * (n-1), 0-based; interpolate floor/ceil
            r = F.lit(p / 100.0) * (sz - 1).cast("double")
            flo = F.floor(r).cast("int")
            frac = r - flo.cast("double")
            lo = F.try_element_at(s, flo + 1).cast("double")
            hi = F.try_element_at(s, flo + 2).cast("double")
            return F.when(sz == 0, F.lit(None)).otherwise(
                lo + frac * (F.coalesce(hi, lo) - lo)
            )
        if name == "mv_first":
            arity(1); return F.element_at(a[0], 1)
        if name == "mv_last":
            arity(1); return F.element_at(a[0], -1)
        if name == "mv_slice":
            arity(3)
            # ES|QL is 0-based inclusive; Spark slice is 1-based + length
            s, e = args[1], args[2]
            if s[0] != "num" or e[0] != "num":
                raise EsqlError("ES|QL: MV_SLICE bounds must be literals")
            start, end = int(s[1]), int(e[1])
            if start < 0 or end < start:
                raise EsqlError("ES|QL: MV_SLICE needs 0 <= start <= end")
            return F.slice(a[0], start + 1, end - start + 1)
        if name == "pi":
            arity(0); return F.lit(3.141592653589793)
        if name == "e":
            arity(0); return F.lit(2.718281828459045)
        if name == "tau":
            arity(0); return F.lit(6.283185307179586)
        if name == "categorize":
            # ES|QL CATEGORIZE (STATS BY grouping fn): the SAME shared
            # key expression the engine's categorize_text agg groups on —
            # one definition, no drift
            arity(1)
            from .engine import categorize_key

            return categorize_key(a[0], 5)
        raise EsqlError(f"ES|QL: unknown function {name.upper()}()")

    # -- aggregates (STATS items) -------------------------------------------
    def agg(self, name: str, args: list[tuple]) -> Column:
        gf = self.agg_filter

        def g(c: Column) -> Column:
            return F.when(gf, c) if gf is not None else c

        if name == "count":
            if len(args) == 0 or args[0][0] == "star":
                return F.count(g(F.lit(1)))
            return F.count(g(self.col(args[0])))
        a = [g(self.col(x)) for x in args]
        n = len(a)
        if name == "count_distinct":
            return F.countDistinct(*a)
        if name == "sum":
            return F.sum(a[0])
        if name == "avg":
            return F.avg(a[0])
        if name == "min":
            return F.min(a[0])
        if name == "max":
            return F.max(a[0])
        if name == "median":
            return F.median(a[0])
        if name == "median_absolute_deviation":
            raise EsqlError(
                "ES|QL: MEDIAN_ABSOLUTE_DEVIATION needs two passes — use the "
                "engine's median_absolute_deviation agg"
            )
        if name == "percentile":
            if n != 2 or args[1][0] != "num":
                raise EsqlError("ES|QL: PERCENTILE(field, p) with literal p")
            return F.percentile(a[0], F.lit(float(args[1][1]) / 100.0))
        if name == "std_dev":
            return F.stddev_pop(a[0])
        if name == "weighted_avg":
            if n != 2:
                raise EsqlError("ES|QL: WEIGHTED_AVG(value, weight)")
            return F.sum(a[0] * a[1]) / F.sum(a[1])
        if name == "values":
            return F.sort_array(F.collect_set(a[0]))
        raise EsqlError(f"ES|QL: unknown aggregate {name.upper()}()")


# --------------------------------------------------------------------------
# Full-text predicate extraction
# --------------------------------------------------------------------------

def _collect_cols(node: tuple) -> set[str]:
    """Bare column names referenced by an expression AST."""
    out: set[str] = set()
    if node[0] == "col":
        out.add(node[1])
    for part in node[1:]:
        if isinstance(part, tuple):
            out |= _collect_cols(part)
        elif isinstance(part, list):
            for c in part:
                if isinstance(c, tuple):
                    out |= _collect_cols(c)
    return out


def _split_ft(node: tuple) -> tuple[list[tuple], tuple | None]:
    """Split a WHERE expression's top-level AND chain into full-text
    predicates (('ft', call_node, negated)) and the residual relational
    expression (None when everything was full-text). MATCH/QSTR anywhere
    else (under OR, inside arithmetic) raises — ES|QL has the same
    placement restriction, and silently mis-composing scores is worse
    than refusing."""
    fts: list[tuple] = []

    def walk_and(n: tuple) -> tuple | None:
        if n[0] == "and":
            l = walk_and(n[1])
            r = walk_and(n[2])
            if l is None:
                return r
            if r is None:
                return l
            return ("and", l, r)
        if n[0] == "call" and n[1] in _FT_FNS:
            fts.append(("ft", n, False))
            return None
        if n[0] == "not" and n[1][0] == "call" and n[1][1] in _FT_FNS:
            fts.append(("ft", n[1], True))
            return None
        if _contains_ft(n):
            raise EsqlError(
                "ES|QL: MATCH()/QSTR() must be top-level AND conjuncts of "
                "WHERE (cannot appear under OR or inside expressions)"
            )
        return n

    residual = walk_and(node)
    return fts, residual


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------

@dataclass
class _Rel:
    df: DataFrame
    index: object | None = None  # InvertedIndex when the source is an index
    score_requested: bool = False
    score_attached: bool = False
    score_has_match: bool = False  # a positive MATCH contributed BM25
    where_seen: bool = False
    ts_spec: object | None = None  # TsSpec when the source command was TS


@dataclass
class TsSpec:
    """A time-series-enabled source for ES|QL ``TS``: the table plus what
    an ES TSDB index declares in its mapping — the dimension fields
    (``time_series_dimension: true``; together they form the ``_tsid``)
    and the ``@timestamp`` column. ``FROM`` on a TsSpec-registered name
    reads the plain table; ``TS`` enables *_over_time / RATE in STATS."""

    df: DataFrame
    dimensions: tuple[str, ...]
    timestamp: str = "ts"


class EsqlEngine:
    """Run ES|QL text against registered tables / inverted indexes.

    ``sources`` maps index names to either a DataFrame or an
    ``InvertedIndex`` (whose relation is ``doc_id`` + stored meta columns,
    the ES ``_source`` view). ``enrich`` maps ENRICH policy names to
    ``(table, match_field)`` — applied as a BROADCAST left join (ES|QL's
    enrich is exactly a small-dimension lookup; at 100 TB the policy table
    is the broadcastable side by construction)."""

    def __init__(
        self,
        spark: SparkSession,
        sources: dict[str, object],
        enrich: dict[str, tuple[DataFrame, str]] | None = None,
        pushdown: bool = True,
        inference: dict[str, object] | None = None,
    ):
        self.spark = spark
        self.sources = sources
        self.enrich = enrich or {}
        self.pushdown = pushdown
        # inference endpoints (ES _inference API analogue) for RERANK /
        # COMPLETION: id -> callable. rerank: (query: str, texts:
        # pd.Series) -> pd.Series[float]; completion: (prompts:
        # pd.Series) -> pd.Series[str]. Applied as Arrow-batched pandas
        # UDFs — the shape a real cross-encoder/LLM client needs.
        self.inference = inference or {}
        # True when the last query() took the pruned top-k path —
        # read by tests/plan audits, never by query logic
        self.last_pushdown = False

    # -- public -------------------------------------------------------------
    def query(self, text: str) -> DataFrame:
        cmds = _Parser(text).parse()
        self.last_pushdown = False
        self._sample_ordinal = 0
        rewritten = self._try_topk_pushdown(cmds) if self.pushdown else None
        if rewritten is not None:
            rel, rest = rewritten
            self.last_pushdown = True
        else:
            rel = self._source(cmds[0])
            rest = cmds[1:]
        for cmd in rest:
            rel = self._apply(rel, cmd)
        return rel.df

    # -- top-k pushdown --------------------------------------------------------
    _ROW_PRESERVING = frozenset(
        {"eval", "keep", "drop", "rename", "grok", "dissect", "enrich",
         "lookup"}
    )

    def _try_topk_pushdown(self, cmds: list[tuple]):
        """Rewrite ``FROM idx METADATA _score | WHERE MATCH(f, q) [AND
        relational...] | <row-preserving>* | SORT _score DESC [, doc_id
        ASC] | LIMIT n`` to the engine's PRUNED top-k: the relational
        conjuncts become topk's doc_stats ``filters`` (gating commutes
        with per-doc scoring, so filter-then-topk(n) is rank-identical
        to score-all-filter-sort-limit), the LIMIT becomes ``k``, and
        block-max pruning applies — at 100 TB this is the difference
        between scoring the term's whole match set and the WAND-bounded
        fraction. Returns (relation, remaining commands) or None when the
        shape doesn't match (the general path stays correct, just
        unpruned — the cost ES itself pays for non-top-k sorts)."""
        if len(cmds) < 4 or cmds[0][0] != "from":
            return None
        _, patterns, metadata = cmds[0]
        if metadata != ["_score"] or len(patterns) != 1:
            return None
        if patterns[0] not in self.sources or isinstance(
            self.sources[patterns[0]], DataFrame
        ):
            return None
        if cmds[1][0] != "where":
            return None
        try:
            fts, residual = _split_ft(cmds[1][1])
        except EsqlError:
            return None
        if len(fts) != 1 or fts[0][2] or fts[0][1][1] != "match":
            return None
        call = fts[0][1]
        if len(call[2]) != 2 or call[2][0][0] != "col" or call[2][1][0] != "str":
            return None
        # locate SORT _score DESC [, doc_id ASC] immediately followed by LIMIT,
        # with only row-preserving commands in between
        i = 2
        while i < len(cmds) and cmds[i][0] in self._ROW_PRESERVING:
            # any command that could (re)bind _score/doc_id before the SORT
            # makes the sort keys mean something else — too clever to
            # chase; bail to the general path
            introduced: set[str] = set()
            c = cmds[i]
            if c[0] == "eval":
                introduced = {nm for nm, _ in c[1]}
            elif c[0] == "rename":
                introduced = {old for old, _ in c[1]} | {new for _, new in c[1]}
            elif c[0] == "dissect":
                introduced = set(re.findall(r"%\{([^}]*)\}", c[2]))
            elif c[0] == "grok":
                introduced = {
                    body.split(":")[1]
                    for body in re.findall(r"%\{([^}]*)\}", c[2])
                    if ":" in body
                }
            elif c[0] == "lookup":
                src = self.sources.get(c[1])
                introduced = set(src.columns) if isinstance(src, DataFrame) else set()
            elif c[0] == "enrich":
                pol = self.enrich.get(c[1])
                introduced = (
                    {dst for dst, _ in c[3]}
                    if c[3]
                    else (set(pol[0].columns) if pol else set())
                )
            if introduced & {"_score", "doc_id"}:
                return None
            i += 1
        if i + 1 >= len(cmds) or cmds[i][0] != "sort" or cmds[i + 1][0] != "limit":
            return None
        keys = cmds[i][1]
        if keys[0][0] != ("col", "_score") or keys[0][1]:  # must be _score DESC
            return None
        if len(keys) > 1 and (
            len(keys) > 2 or keys[1][0] != ("col", "doc_id") or not keys[1][1]
        ):
            return None
        k = cmds[i + 1][1]
        # residual must be a pure doc_stats predicate (no _score reference)
        rel = self._source(cmds[0])
        idx = rel.index
        filt = None
        if residual is not None:
            cols = _collect_cols(residual)
            if "_score" in cols or not cols <= set(rel.df.columns):
                return None
            filt = _Compiler().col(residual)
        scored = idx.topk(
            call[2][1][1], k=k, filters=filt, field=call[2][0][1]
        ).select("doc_id", F.col("score").alias("__s"))
        rel.df = (
            rel.df.join(F.broadcast(scored), "doc_id")
            .withColumn("_score", F.col("_score") + F.col("__s"))
            .drop("__s")
        )
        rel.score_has_match = True
        rel.where_seen = True
        # the original SORT/LIMIT still run (cheap: ≤k rows) so ordering
        # and any trailing commands behave identically to the general path
        return rel, cmds[2:]

    # -- source -------------------------------------------------------------
    def _resolve(self, pattern: str) -> list[str]:
        if pattern in self.sources:
            return [pattern]
        names = sorted(n for n in self.sources if fnmatch.fnmatch(n, pattern))
        if not names:
            raise EsqlError(f"ES|QL: unknown index {pattern!r}")
        return names

    def _relation(self, name: str) -> tuple[DataFrame, object | None]:
        src = self.sources[name]
        if isinstance(src, TsSpec):
            # FROM on a TS index reads the plain table (ES allows standard
            # queries over TSDB indices); only TS enables the series fns
            return src.df, None
        if isinstance(src, DataFrame):
            return src, None
        # InvertedIndex: doc_id + key + stored meta columns, tombstones out
        ds = src.doc_stats()
        meta = src.meta
        cols = list(
            dict.fromkeys(
                ["doc_id", *meta.get("doc_key_cols", []),
                 *meta.get("meta_cols", [])]
            )
        )
        return ds.select(*[c for c in cols if c in ds.columns]), src

    def _source(self, cmd: tuple) -> _Rel:
        if cmd[0] == "row":
            df = self.spark.range(1)
            comp = _Compiler()
            cols = [comp.col(e).alias(nm) for nm, e in cmd[1]]
            return _Rel(df.select(*cols))
        if cmd[0] == "ts":
            name = cmd[1]
            if name not in self.sources:
                raise EsqlError(f"ES|QL: unknown source {name!r}")
            spec = self.sources[name]
            if not isinstance(spec, TsSpec):
                raise EsqlError(
                    f"ES|QL: TS needs a TsSpec-registered source "
                    f"(dimensions + timestamp); {name!r} is a plain table "
                    "— register EsqlEngine(sources={..: TsSpec(df, dims, ts)})"
                )
            missing = [
                c for c in (*spec.dimensions, spec.timestamp)
                if c not in spec.df.columns
            ]
            if missing:
                raise EsqlError(f"ES|QL: TS source {name!r} lacks {missing}")
            return _Rel(spec.df, ts_spec=spec)
        _, patterns, metadata = cmd
        for m in metadata:
            if m != "_score":
                raise EsqlError(f"ES|QL: unsupported METADATA field {m!r}")
        names = [n for p in patterns for n in self._resolve(p)]
        rels = [self._relation(n) for n in names]
        if len(rels) == 1:
            df, idx = rels[0]
        else:
            idx = None  # cross-index MATCH would need merged stats; refuse
            df = rels[0][0]
            for other, _ in rels[1:]:
                df = df.unionByName(other, allowMissingColumns=True)
        score = bool(metadata)
        if score:
            # filter-context base score: 0.0 (MATCH adds BM25 onto it) —
            # attached up front so _score resolves in every later command
            df = df.withColumn("_score", F.lit(0.0))
        return _Rel(df, index=idx, score_requested=score, score_attached=score)

    # -- commands -----------------------------------------------------------
    def _apply(self, rel: _Rel, cmd: tuple) -> _Rel:
        kind = cmd[0]
        if kind == "where":
            return self._where(rel, cmd[1])
        if kind == "eval":
            comp = _Compiler()
            df = rel.df
            for nm, e in cmd[1]:
                df = df.withColumn(nm, comp.col(e))
            rel.df = df
            return rel
        if kind == "stats":
            return self._stats(rel, cmd[1], cmd[2])
        if kind == "inlinestats":
            return self._inlinestats(rel, cmd[1], cmd[2])
        if kind == "fork":
            return self._fork(rel, cmd[1])
        if kind == "fuse":
            return self._fuse(rel, cmd[1])
        if kind == "rerank":
            return self._rerank(rel, cmd[1], cmd[2], cmd[3], cmd[4])
        if kind == "completion":
            return self._completion(rel, cmd[1], cmd[2], cmd[3])
        if kind == "change_point":
            return self._change_point(rel, cmd[1], cmd[2], cmd[3])
        if kind == "sort":
            comp = _Compiler()
            keys = []
            for e, asc, nulls in cmd[1]:
                c = comp.col(e)
                if asc:
                    c = c.asc_nulls_first() if nulls == "first" else \
                        c.asc_nulls_last() if nulls == "last" else c.asc()
                else:
                    c = c.desc_nulls_first() if nulls == "first" else \
                        c.desc_nulls_last() if nulls == "last" else c.desc()
                keys.append(c)
            rel.df = rel.df.orderBy(*keys)
            return rel
        if kind == "limit":
            rel.df = rel.df.limit(cmd[1])
            return rel
        if kind == "sample":
            # ES|QL SAMPLE keeps each row with probability p (random per
            # shard in ES). Here membership is a content hash with the
            # seed mixed in — same distribution, but deterministic and
            # partitioning-independent (reruns and resumes agree), zero
            # shuffle. Identical rows share a verdict, the one honest
            # deviation from iid sampling.
            p, seed = cmd[1], cmd[2]
            # mix the command's ordinal into the seed: two chained SAMPLE
            # commands with the same seed must be INDEPENDENT draws (ES
            # keeps p1*p2) — on the same hash they would be a no-op pair
            ordinal = getattr(self, "_sample_ordinal", 0)
            self._sample_ordinal = ordinal + 1
            h = F.pmod(
                F.xxhash64(
                    F.lit(seed), F.lit(ordinal),
                    *[F.col(c) for c in rel.df.columns],
                ),
                F.lit(1_000_003),
            )
            rel.df = rel.df.filter(h < int(p * 1_000_003))
            return rel
        if kind in ("keep", "drop"):
            cols = rel.df.columns
            hit: list[str] = []
            for pat in cmd[1]:
                matched = [c for c in cols if fnmatch.fnmatch(c, pat)]
                if not matched and "*" not in pat and "?" not in pat:
                    raise EsqlError(f"ES|QL: unknown column {pat!r}")
                hit.extend(m for m in matched if m not in hit)
            if kind == "keep":
                rel.df = rel.df.select(*hit)
            else:
                rel.df = rel.df.drop(*hit)
            return rel
        if kind == "rename":
            df = rel.df
            for old, new in cmd[1]:
                if old not in df.columns:
                    raise EsqlError(f"ES|QL: unknown column {old!r}")
                df = df.withColumnRenamed(old, new)
            rel.df = df
            return rel
        if kind == "mv_expand":
            col = cmd[1]
            if col not in rel.df.columns:
                raise EsqlError(f"ES|QL: unknown column {col!r}")
            rel.df = rel.df.withColumn(col, F.explode_outer(col))
            return rel
        if kind == "dissect":
            return self._dissect(rel, cmd[1], cmd[2])
        if kind == "grok":
            return self._grok(rel, cmd[1], cmd[2])
        if kind == "lookup":
            return self._lookup(rel, cmd[1], cmd[2])
        if kind == "enrich":
            return self._enrich(rel, cmd[1], cmd[2], cmd[3])
        raise EsqlError(f"ES|QL: unhandled command {kind!r}")

    # -- WHERE with full-text extraction --------------------------------------
    def _where(self, rel: _Rel, expr: tuple) -> _Rel:
        fts, residual = _split_ft(expr)
        knns = [f for f in fts if f[1][1] == "knn"]
        fts = [f for f in fts if f[1][1] != "knn"]
        if knns and fts:
            # a pre-filtered knn (k nearest AMONG the lexical matches) and
            # ES's global-knn-then-intersect give different row sets; the
            # honest hybrid is FORK (lexical) (knn) | FUSE
            raise EsqlError(
                "ES|QL: KNN cannot share a WHERE with MATCH/QSTR — "
                "use FORK branches + FUSE for hybrid retrieval"
            )
        if knns and residual is not None:
            # ES|QL applies same-clause conjuncts as PRE-filters to the knn
            # search (k nearest AMONG the filtered rows), not as a post-
            # intersection with the global k-nearest — so filter first
            rel.df = rel.df.filter(_Compiler().col(residual))
            residual = None
        for _, call, negated in knns:
            rel = self._knn(rel, call[2], negated)
        if fts and rel.index is None:
            raise EsqlError(
                "ES|QL: MATCH()/QSTR() need a single index source "
                "(FROM one registered InvertedIndex)"
            )
        if fts and rel.where_seen:
            raise EsqlError(
                "ES|QL: full-text WHERE must be the first command after FROM"
            )
        idx = rel.index
        for _, call, negated in fts:
            name, args = call[1], call[2]
            if name == "match_phrase":
                # ES|QL MATCH_PHRASE (8.18): exact-phrase filter; with
                # METADATA _score, the Lucene PhraseQuery BM25 frame
                if len(args) != 2 or args[0][0] != "col" or args[1][0] != "str":
                    raise EsqlError('ES|QL: MATCH_PHRASE(field, "text")')
                fieldname, qtext = args[0][1], args[1][1]
                terms = idx._analyze(qtext, fieldname)
                if negated:
                    docs = idx._live(
                        idx._phrase_doc_set(terms, idx._fid(fieldname), 0)
                    )
                    rel.df = rel.df.join(docs, "doc_id", "left_anti")
                elif rel.score_requested:
                    sc = idx._phrase_scores(qtext, idx._fid(fieldname))
                    if sc is None:
                        rel.df = rel.df.limit(0)
                    else:
                        scored = idx._live(sc).select(
                            "doc_id", F.col("score").alias("__s")
                        )
                        rel.df = (
                            rel.df.join(scored, "doc_id")
                            .withColumn(
                                "_score", F.col("_score") + F.col("__s")
                            )
                            .drop("__s")
                        )
                    rel.score_has_match = True
                else:
                    docs = idx._live(
                        idx._phrase_doc_set(terms, idx._fid(fieldname), 0)
                    )
                    rel.df = rel.df.join(docs, "doc_id", "left_semi")
            elif name == "match":
                if len(args) != 2 or args[0][0] != "col" or args[1][0] != "str":
                    raise EsqlError('ES|QL: MATCH(field, "query text")')
                fieldname, qtext = args[0][1], args[1][1]
                if negated:
                    docs = idx.match_docs(qtext, mode="or", field=fieldname)
                    rel.df = rel.df.join(docs, "doc_id", "left_anti")
                elif rel.score_requested:
                    scored = idx.topk(
                        qtext, k=None, prune=False, field=fieldname
                    ).select("doc_id", F.col("score").alias("__s"))
                    rel.df = (
                        rel.df.join(scored, "doc_id")
                        .withColumn("_score", F.col("_score") + F.col("__s"))
                        .drop("__s")
                    )
                    rel.score_has_match = True
                else:
                    docs = idx.match_docs(qtext, mode="or", field=fieldname)
                    rel.df = rel.df.join(docs, "doc_id", "left_semi")
            else:  # qstr
                if len(args) != 1 or args[0][0] != "str":
                    raise EsqlError('ES|QL: QSTR("query string")')
                ast = idx.parse_query_string(args[0][1], "or")
                if ast is None:
                    from ..functions.localrel import local_df
                    docs = local_df(self.spark, [], "doc_id long")
                else:
                    docs = idx._qs_doc_set(ast, idx._fid(None), 50)
                how = "left_anti" if negated else "left_semi"
                rel.df = rel.df.join(docs, "doc_id", how)
                if rel.score_requested and not negated and not rel.score_has_match:
                    # ES|QL scores QSTR too; we pin filter-context 0.0 and
                    # raise only when the caller will read a misleading score
                    raise EsqlError(
                        "ES|QL: METADATA _score with QSTR is not supported "
                        "(use MATCH for scored retrieval)"
                    )
        if residual is not None:
            rel.df = rel.df.filter(_Compiler().col(residual))
        rel.where_seen = True
        return rel

    # -- KNN ----------------------------------------------------------------
    def _knn(self, rel: _Rel, args: list[tuple], negated: bool) -> _Rel:
        """``KNN(field, [floats...], k)``: keep rows whose vector is among
        the k nearest to the query by exact cosine (boundary ties
        included — rank() <= k, so the row set is deterministic).

        Scale shape: similarity is a narrow JVM expression (zip_with +
        aggregate, no UDF); the k-th similarity comes from a per-partition
        top-k merge (TakeOrderedAndProject — k rows reach the driver, no
        global sort), then one ``sim >= threshold`` filter streams the
        relation once more. Swap in an ANN-index probe (IvfAnnIndex /
        LshAnnIndex serve the DSL knn body) where an index exists; this
        function is the exact path."""
        if (
            len(args) != 3
            or args[0][0] != "col"
            or args[1][0] != "list"
            or args[2][0] != "num"
            or not isinstance(args[2][1], int)
        ):
            raise EsqlError("ES|QL: KNN(field, [v0, v1, ...], k)")
        field = args[0][1]
        if field not in rel.df.columns:
            raise EsqlError(f"ES|QL: unknown column {field!r}")
        qv: list[float] = []
        for e in args[1][1]:
            if e[0] == "num":
                qv.append(float(e[1]))
            elif e[0] == "neg" and e[1][0] == "num":
                qv.append(-float(e[1][1]))
            else:
                raise EsqlError("ES|QL: KNN query vector must be numeric literals")
        k = args[2][1]
        if k <= 0:
            raise EsqlError("ES|QL: KNN k must be positive")
        from ..functions.localrel import lit_double_array
        from ..operators.similarity import _cosine

        sim = _cosine(F.col(field), lit_double_array(qv))
        thr = (
            rel.df.select(sim.alias("__knn_sim"))
            .orderBy(F.desc("__knn_sim"))
            .limit(k)
            .agg(F.min("__knn_sim"))
            .first()[0]
        )
        if thr is None:  # empty relation or all-null vectors: nothing is near
            # negated keeps every row (incl. null vectors — same contract as
            # the main path's ~coalesce(matched, false)); positive keeps none
            rel.df = rel.df.filter(F.lit(negated))
            return rel
        matched = sim >= F.lit(float(thr))
        if negated:
            rel.df = rel.df.filter(~F.coalesce(matched, F.lit(False)))
        else:
            rel.df = rel.df.filter(matched)
            if rel.score_requested:
                rel.df = rel.df.withColumn("_score", F.col("_score") + sim)
                rel.score_has_match = True
        return rel

    # -- FUSE ---------------------------------------------------------------
    def _fuse(self, rel: _Rel, method: str) -> _Rel:
        """ES|QL FUSE (8.19): merge FORK branches into one ranked result.
        Per-branch rank = row_number over (ROUND(_score, 6) desc, doc_id
        asc) — ranking on the rounded score pins rank identity across
        engines, exactly like :meth:`InvertedIndex.hybrid_rrf`. Fused
        score: ``rrf`` sums 1/(60 + rank); ``linear`` sums the raw branch
        scores. Non-score columns keep the values of each doc's first
        (branch-order, rank) row; ``_fork`` is consumed. Rows a branch
        left unscored (null ``_score``, e.g. a STATS branch) are refused.

        Scale shape: ES fuses on the coordinator over each branch's top-k;
        here the rank window partitions by ``_fork`` (few partitions, so
        bound branch size with SORT/LIMIT exactly as ES's ``size`` does),
        then ONE groupBy(doc_id) — no self-joins, no per-branch jobs."""
        df = rel.df
        for need in ("_fork", "_score", "doc_id"):
            if need not in df.columns:
                hint = (
                    "FUSE must follow FORK"
                    if need == "_fork"
                    else "FUSE needs METADATA _score and a doc_id column"
                )
                raise EsqlError(f"ES|QL: missing {need!r} — {hint}")
        from pyspark.sql.window import Window

        branch = F.regexp_extract("_fork", r"(\d+)", 1).cast("int")
        w = Window.partitionBy("_fork").orderBy(
            F.desc(F.round("_score", 6)), F.asc("doc_id")
        )
        rank = F.row_number().over(w)
        contrib = (
            F.lit(1.0) / (F.lit(60) + rank) if method == "rrf" else F.col("_score")
        )
        # lazy in-plan guard (an eager count() here would execute the whole
        # FORK pipeline twice): any null _score/doc_id row — a STATS or
        # otherwise unscored branch — fails the job when evaluated
        contrib = F.when(
            F.col("_score").isNull() | F.col("doc_id").isNull(),
            F.raise_error(F.lit(
                "ES|QL: FUSE branches must all carry non-null _score and "
                "doc_id (a STATS/unscored branch cannot be fused)"
            )).cast("double"),
        ).otherwise(contrib)
        ranked = df.withColumn("__c", contrib).withColumn(
            "__ord", F.struct(branch.alias("b"), rank.alias("r"))
        )
        others = [c for c in df.columns if c not in ("_score", "_fork", "doc_id")]
        rel.df = ranked.groupBy("doc_id").agg(
            F.sum("__c").alias("_score"),
            *[F.min_by(c, "__ord").alias(c) for c in others],
        ).select(*[c for c in df.columns if c != "_fork"])
        rel.score_attached = True
        return rel

    # -- RERANK / COMPLETION --------------------------------------------------
    def _rerank(
        self, rel: _Rel, target: str, query: str, field: str, iid: str | None
    ) -> _Rel:
        """ES|QL RERANK (8.18): second-stage scoring of the current rows.

        With a registered inference id the callable scores (query, texts)
        in Arrow batches — the real cross-encoder plumbing (batch size =
        Arrow batch, executor-parallel, never a driver loop). Without one,
        a DETERMINISTIC stand-in for Elastic's default rerank model: the
        pinned-tokenizer overlap ratio |q ∩ doc| / |q| over DISTINCT
        tokens, pure Catalyst. The new score lands in ``target`` (default
        ``_score``, like ES); ordering is left to an explicit SORT —
        deterministic beats ES's implicit resort.

        ES parity: RERANK runs on the fetched window in ES too (rerank
        after retrieval + LIMIT) — apply it after a topk cut, not on the
        corpus."""
        if field not in rel.df.columns:
            raise EsqlError(f"ES|QL: unknown column {field!r}")
        if iid is not None and iid in self.inference:
            fn = self.inference[iid]
            scorer = F.pandas_udf(
                lambda s: fn(query, s), "double"
            )
            rel.df = rel.df.withColumn(target, scorer(F.col(field)))
        elif iid is not None:
            raise EsqlError(
                f"ES|QL: inference id {iid!r} is not registered "
                "(pass EsqlEngine(..., inference={id: callable}))"
            )
        else:
            from ..functions.tokenizer import tokenize_col, tokenize_text

            qtoks = sorted(set(tokenize_text(query)))
            if not qtoks:
                raise EsqlError("ES|QL: RERANK query analyzes to no tokens")
            overlap = F.size(
                F.array_intersect(
                    F.array_distinct(tokenize_col(F.col(field))),
                    F.array(*[F.lit(t) for t in qtoks]),
                )
            )
            rel.df = rel.df.withColumn(
                target, overlap.cast("double") / F.lit(float(len(qtoks)))
            )
        if target == "_score":
            rel.score_attached = True
        return rel

    def _completion(
        self, rel: _Rel, target: str, prompt: tuple, iid: str
    ) -> _Rel:
        """ES|QL COMPLETION (8.18): prompt expression -> generated text
        column. A registered inference callable runs as an Arrow-batched
        pandas UDF (the LLM-client shape: one RPC per Arrow batch, not per
        row). The builtin ``stub`` id is a DECLARED deterministic
        stand-in (no model in this environment): ``[stub] `` + the first
        64 chars of the prompt, pure Catalyst — swap a real client in via
        ``inference={"my-llm": fn}``."""
        pcol = _Compiler().col(prompt)
        if iid in self.inference:
            fn = self.inference[iid]
            gen = F.pandas_udf(lambda s: fn(s), "string")
            rel.df = rel.df.withColumn(target, gen(pcol))
        elif iid == "stub":
            rel.df = rel.df.withColumn(
                target,
                F.concat(F.lit("[stub] "), F.substring(pcol, 1, 64)),
            )
        else:
            raise EsqlError(
                f"ES|QL: inference id {iid!r} is not registered "
                '(builtin: "stub"; or EsqlEngine(..., inference={id: fn}))'
            )
        return rel

    # -- STATS ----------------------------------------------------------------
    def _stats(
        self,
        rel: _Rel,
        items: list[tuple[str | None, tuple]],
        by: list[tuple[str | None, tuple]],
    ) -> _Rel:
        if any(_contains_ts_fn(e) for _, e, _ in items):
            if rel.ts_spec is None:
                raise EsqlError(
                    "ES|QL: *_over_time / RATE need a TS source "
                    "(start the query with TS <name>)"
                )
            return self._stats_ts(rel, items, by)
        aggs = []
        for nm, e, cond in items:
            if not _contains_agg(e):
                raise EsqlError(
                    f"ES|QL: STATS item {nm!r} has no aggregate function"
                )
            fcol = _Compiler().col(cond) if cond is not None else None
            comp = _Compiler(allow_agg=True, agg_filter=fcol)
            aggs.append(comp.col(e).alias(nm))
        key_comp = _Compiler()
        keys = [key_comp.col(e).alias(nm) for nm, e in by]
        if keys:
            rel.df = rel.df.groupBy(*keys).agg(*aggs)
        else:
            rel.df = rel.df.agg(*aggs)
        # a plain STATS consumes the per-series grain exactly like the TS
        # form does — clear ts_spec so a chained STATS with *_over_time
        # errors ("need a TS source") instead of silently running the
        # two-level TS aggregation over already-aggregated rows
        rel.ts_spec = None
        rel.score_attached = "_score" in rel.df.columns
        return rel

    # -- TS STATS (time-series two-level aggregation) ------------------------
    def _stats_ts(
        self,
        rel: _Rel,
        items: list[tuple[str | None, tuple]],
        by: list[tuple[str | None, tuple]],
    ) -> _Rel:
        """ES|QL 8.19 TS STATS: items containing ``*_over_time``/``RATE``
        aggregate in TWO levels — the inner call per time series (all
        dimension columns, plus the BY bucket when present), the outer
        aggregate across series per BY group. Compiled as two chained
        partial-aggregated groupBys (one extra shuffle — exactly the
        per-``_tsid`` reduction ES runs before the coordinator combine);
        items WITHOUT a series function aggregate over raw rows as in
        plain STATS and join back on the group keys (a ≤|groups|-row
        join).

        RATE deviation (documented, not silent): per series-bucket it is
        the sum of positive consecutive deltas divided by the bucket span
        in seconds — counter resets contribute the post-reset value via
        the next positive delta, and there is no PromQL-style window
        extrapolation. Requires a unit-span BUCKET on the timestamp in BY
        (the span is the denominator) and no per-aggregate WHERE."""
        from pyspark.sql.window import Window

        spec = rel.ts_spec
        dims = list(spec.dimensions)
        df = rel.df
        key_comp = _Compiler()
        by_names: list[str] = []
        bucket_span: int | None = None
        for nm, e in by:
            ok_dim = e[0] == "col" and e[1] in dims
            is_bucket = (
                e[0] == "call" and e[1] in ("bucket", "date_trunc")
            )
            if is_bucket:
                # the bucket must be over the TS timestamp — a numeric
                # BUCKET on a metric column would silently split series
                # by value
                tgt = e[2][0] if e[1] == "bucket" else e[2][1]
                if not (tgt[0] == "col" and tgt[1] == spec.timestamp):
                    raise EsqlError(
                        f"ES|QL: TS STATS BY bucket must be over the "
                        f"timestamp column {spec.timestamp!r}"
                    )
            if not (ok_dim or is_bucket):
                raise EsqlError(
                    f"ES|QL: TS STATS BY key {nm!r} must be a dimension "
                    f"column ({dims}) or a BUCKET on the timestamp"
                )
            if is_bucket:
                span = e[2][1] if e[1] == "bucket" else e[2][0]
                if span[0] == "dur" and span[2] in _TS_UNIT_SECONDS:
                    bucket_span = _TS_UNIT_SECONDS[span[2]]
            if nm == spec.timestamp:
                # BY ts = BUCKET(ts, ...) would overwrite the raw
                # timestamp BEFORE the RATE/FIRST/LAST windows order by
                # it, silently randomizing the within-series order —
                # refuse the collision instead
                raise EsqlError(
                    f"ES|QL: TS STATS BY key {nm!r} collides with the "
                    f"timestamp column — alias the bucket (e.g. BY "
                    f"b = BUCKET({nm}, ...))"
                )
            df = df.withColumn(nm, key_comp.col(e))
            by_names.append(nm)

        ts_items, plain_items = [], []
        all_found: list = []  # shared: placeholder names number globally
        for nm, e, cond in items:
            start = len(all_found)
            e2 = _subst_ts_calls(e, all_found)
            found = all_found[start:]
            if found:
                if not _contains_agg(e2):
                    raise EsqlError(
                        f"ES|QL: TS STATS item {nm!r} — wrap the series "
                        "value in an outer aggregate (e.g. "
                        "MAX(MAX_OVER_TIME(x)))"
                    )
                phs = {ph for ph, _, _ in found}
                if not _agg_args_reference(e2, phs):
                    raise EsqlError(
                        f"ES|QL: TS STATS item {nm!r} mixes a raw-row "
                        "aggregate with a series function — split them "
                        "into separate items"
                    )
                ts_items.append((nm, e2, cond, found))
            else:
                plain_items.append((nm, e, cond))

        # inner per-series aggregates
        inner_keys = list(dict.fromkeys(dims + by_names))
        inner_aggs: list[Column] = []
        n_rate = 0
        tscol = F.col(spec.timestamp)
        for nm, _, cond, found in ts_items:
            fcol = _Compiler().col(cond) if cond is not None else None

            def g(c: Column) -> Column:
                return F.when(fcol, c) if fcol is not None else c

            for ph, fn, args in found:
                if fn == "rate":
                    if cond is not None:
                        raise EsqlError(
                            "ES|QL: RATE with a per-aggregate WHERE is "
                            "unsupported (the delta chain would change "
                            "meaning)"
                        )
                    if bucket_span is None:
                        raise EsqlError(
                            "ES|QL: RATE needs a unit-span BUCKET on the "
                            "timestamp in BY (second/minute/hour/day — "
                            "the span is the rate denominator)"
                        )
                    if len(args) != 1:
                        raise EsqlError("ES|QL: RATE(counter_field)")
                    arg = _Compiler().col(args[0]).cast("double")
                    dcol = f"__d_{ph}"
                    w = Window.partitionBy(
                        *[F.col(k) for k in inner_keys]
                    ).orderBy(tscol)
                    df = df.withColumn(
                        dcol, arg - F.lag(arg).over(w)
                    )
                    n_rate += 1
                    inner_aggs.append(
                        (
                            F.sum(F.greatest(F.col(dcol), F.lit(0.0)))
                            / F.lit(float(bucket_span))
                        ).alias(ph)
                    )
                    continue
                if len(args) != 1:
                    raise EsqlError(f"ES|QL: {fn.upper()}(field)")
                arg = _Compiler().col(args[0])
                if fn == "count_over_time":
                    inner = F.count(g(arg))
                elif fn == "first_over_time":
                    inner = F.min_by(arg, F.when(
                        fcol, tscol) if fcol is not None else tscol)
                elif fn == "last_over_time":
                    inner = F.max_by(arg, F.when(
                        fcol, tscol) if fcol is not None else tscol)
                else:
                    spark_fn = {
                        "max_over_time": F.max, "min_over_time": F.min,
                        "avg_over_time": F.avg, "sum_over_time": F.sum,
                    }[fn]
                    inner = spark_fn(g(arg))
                inner_aggs.append(inner.alias(ph))
        series = df.groupBy(*inner_keys).agg(*inner_aggs)

        # outer across-series aggregates (per-agg WHERE was consumed by
        # the inner level; raw columns are gone here by design)
        outer_comp = _Compiler(allow_agg=True)
        outer_aggs = [
            outer_comp.col(e2).alias(nm) for nm, e2, _, _ in ts_items
        ]
        if by_names:
            out = series.groupBy(*by_names).agg(*outer_aggs)
        else:
            out = series.agg(*outer_aggs)

        if plain_items:
            paggs = []
            for nm, e, cond in plain_items:
                if not _contains_agg(e):
                    raise EsqlError(
                        f"ES|QL: STATS item {nm!r} has no aggregate function"
                    )
                fcol = _Compiler().col(cond) if cond is not None else None
                comp = _Compiler(allow_agg=True, agg_filter=fcol)
                paggs.append(comp.col(e).alias(nm))
            if by_names:
                praw = rel.df
                kc = _Compiler()
                for nm, e in by:
                    praw = praw.withColumn(nm, kc.col(e))
                plain = praw.groupBy(*by_names).agg(*paggs)
                # null-safe key join: a null dimension value is a real
                # group on both sides (a plain equi-join would split it
                # into two half-null rows)
                cond = None
                for k in by_names:
                    c = out[k].eqNullSafe(plain[k])
                    cond = c if cond is None else (cond & c)
                joined = out.join(plain, cond, "full_outer")
                out = joined.select(
                    *[F.coalesce(out[k], plain[k]).alias(k)
                      for k in by_names],
                    *[out[nm] for nm, _, _, _ in ts_items],
                    *[plain[nm] for nm, _, _ in plain_items],
                )
            else:
                out = out.crossJoin(rel.df.agg(*paggs))
            # restore the declared item order (join appended plain cols)
            out = out.select(*by_names, *[nm for nm, _, _ in items])
        rel.df = out
        rel.ts_spec = None  # aggregated: series grain is consumed
        rel.score_attached = "_score" in rel.df.columns
        return rel

    # -- FORK --------------------------------------------------------------------
    def _fork(self, rel: _Rel, branches: list[list[tuple]]) -> _Rel:
        """ES|QL FORK: run each (branch) sub-pipeline over the SAME input
        relation and union the results with a ``_fork`` discriminator
        (fork1, fork2, ... — ES's scheme). The input plan is shared; each
        branch is its own Catalyst subtree, so Spark's common-subplan
        reuse (and AQE) handles the fan-out. Schemas may diverge across
        branches (a STATS branch next to a row branch); the union aligns
        by name and null-fills."""
        parts: list[DataFrame] = []
        attached = []
        for i, sub in enumerate(branches, start=1):
            b = _Rel(
                df=rel.df,
                index=rel.index,
                score_requested=rel.score_requested,
                score_attached=rel.score_attached,
                score_has_match=rel.score_has_match,
                where_seen=rel.where_seen,
                ts_spec=rel.ts_spec,
            )
            for c in sub:
                if c[0] == "fork":
                    raise EsqlError("ES|QL: FORK cannot nest")
                b = self._apply(b, c)
            parts.append(b.df.withColumn("_fork", F.lit(f"fork{i}")))
            attached.append(b.score_attached)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        return _Rel(
            df,
            index=None,
            score_requested=rel.score_requested,
            score_attached=all(attached),
            score_has_match=rel.score_has_match,
            where_seen=True,
        )

    # -- INLINESTATS -------------------------------------------------------------
    def _inlinestats(
        self,
        rel: _Rel,
        items: list[tuple[str | None, tuple]],
        by: list[tuple[str | None, tuple]],
    ) -> _Rel:
        """ES|QL INLINESTATS: STATS that APPENDS the aggregate as a column
        instead of collapsing rows — a window aggregate partitioned by the
        BY keys (map-side partial agg + one broadcast-back per partition
        key; no row explosion). Each item must be a bare aggregate call —
        wrap it with EVAL afterwards (``.over()`` binds to the aggregate,
        not to scalar wrappers)."""
        from pyspark.sql.window import Window

        for nm, e, _ in items:
            if e[0] != "call" or e[1] not in _AGG_FNS:
                raise EsqlError(
                    "ES|QL: INLINESTATS items must be bare aggregates "
                    f"(got {nm!r}); apply scalar functions in a following EVAL"
                )
            if e[1] == "count_distinct":
                raise EsqlError(
                    "ES|QL: COUNT_DISTINCT is not available in INLINESTATS "
                    "(no exact distinct window aggregate); use STATS"
                )
            if by and e[1] in ("weighted_avg", "values"):
                # these compile to composite expressions WRAPPING
                # aggregates (sum/sum, sort_array(collect_set)) which
                # .over() rejects — refuse instead of an opaque Spark
                # AnalysisException (the global form works: it aggregates
                # to one row, no window)
                raise EsqlError(
                    f"ES|QL: {e[1].upper()} is not available in "
                    f"INLINESTATS ... BY (not a single window aggregate); "
                    f"use STATS + a join, or drop the BY"
                )

        def comp_for(cond: tuple | None) -> _Compiler:
            fcol = _Compiler().col(cond) if cond is not None else None
            return _Compiler(allow_agg=True, agg_filter=fcol)

        df = rel.df
        if by:
            key_comp = _Compiler()
            w = Window.partitionBy(*[key_comp.col(e) for _, e in by])
            for nm, e, cond in items:
                df = df.withColumn(nm, comp_for(cond).agg(e[1], e[2]).over(w))
        else:
            # global INLINESTATS: an unpartitioned window would move EVERY
            # row to one task — aggregate to one row and broadcast it back
            # instead (partial agg + a zero-shuffle join)
            one = df.agg(
                *[comp_for(cond).agg(e[1], e[2]).alias(nm)
                  for nm, e, cond in items]
            )
            # an item named after an existing column REPLACES it (the BY
            # branch's withColumn contract) — drop before the join or the
            # output carries an ambiguous duplicate
            shadowed = [nm for nm, _, _ in items if nm in df.columns]
            df = df.drop(*shadowed).crossJoin(F.broadcast(one))
        rel.df = df
        return rel

    # -- CHANGE_POINT --------------------------------------------------------------
    def _change_point(
        self, rel: _Rel, value: str, key: str, names: tuple[str, str]
    ) -> _Rel:
        """ES|QL CHANGE_POINT in its deterministic core (the same framing
        as the engine's change_point agg): order by ``key``, pick the
        step-change boundary maximizing the between-segment sum-of-squares
        gain via cumulative window sums — no driver loop. Appends
        ``type`` ('step_change' on the first right-segment row, null
        elsewhere) and ``gain`` (the SSE reduction; ES reports a p-value
        from the same split statistic — we report the statistic itself,
        under a different column name so the divergence is loud)."""
        for c in (value, key):
            if c not in rel.df.columns:
                raise EsqlError(f"ES|QL: unknown column {c!r}")
        # ES|QL CHANGE_POINT itself refuses series over 1000 points, and
        # that cap is what makes the global ordered windows below safe —
        # the whole (bounded) series lands in one task, like ES's own
        # single-node change-point pass. Enforce it instead of silently
        # funneling an unbounded relation through one partition.
        if len(rel.df.limit(1001).tail(1001)) > 1000:
            raise EsqlError(
                "ES|QL: CHANGE_POINT takes at most 1000 points (the ES "
                "limit) — aggregate first (e.g. STATS ... BY BUCKET(ts, "
                "...)) to reduce the series"
            )
        from pyspark.sql.window import Window

        w = Window.orderBy(key)
        wall = w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        v = F.coalesce(F.col(value).cast("double"), F.lit(0.0))
        cand = (
            rel.df.withColumn("__i", F.row_number().over(w))
            .withColumn("__cum", F.sum(v).over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wall))
            .withColumn("__tot", F.sum(v).over(wall))
        )
        nl = (F.col("__i") - 1).cast("double")
        nr = (F.col("__n") - F.col("__i") + 1).cast("double")
        suml = F.col("__cum") - v
        sumr = F.col("__tot") - F.col("__cum") + v
        gain = F.when(
            (nl > 0) & (nr > 0),
            suml * suml / nl + sumr * sumr / nr
            - F.col("__tot") * F.col("__tot") / F.col("__n"),
        )
        cand = cand.withColumn("__gain", gain)
        pick = F.row_number().over(
            Window.orderBy(F.desc_nulls_last("__gain"), F.asc(key))
        )
        cand = cand.withColumn("__pick", pick)
        tcol, gcol = names
        rel.df = cand.withColumn(
            tcol, F.when(F.col("__pick") == 1, F.lit("step_change"))
        ).withColumn(
            gcol, F.when(F.col("__pick") == 1, F.round(F.col("__gain"), 6))
        ).drop("__i", "__cum", "__n", "__tot", "__gain", "__pick")
        return rel

    # -- DISSECT ---------------------------------------------------------------
    def _dissect(self, rel: _Rel, col: str, pattern: str) -> _Rel:
        if col not in rel.df.columns:
            raise EsqlError(f"ES|QL: unknown column {col!r}")
        # %{name} keys; %{} skip; modifiers (+, ->) unsupported -> raise
        parts = re.split(r"(%\{[^}]*\})", pattern)
        regex, keys = [], []
        for p in parts:
            if not p:
                continue
            if p.startswith("%{") and p.endswith("}"):
                key = p[2:-1]
                if any(ch in key for ch in "+/->*&?"):
                    raise EsqlError(
                        f"ES|QL: dissect modifier in {p!r} not supported"
                    )
                if key:
                    keys.append(key)
                    regex.append("(.*?)")
                else:
                    regex.append(".*?")
            else:
                regex.append(re.escape(p))
        rx = "^" + "".join(regex) + "$"
        matched = F.col(col).rlike(rx)
        df = rel.df
        for gi, key in enumerate(keys, start=1):
            df = df.withColumn(
                key,
                F.when(matched, F.regexp_extract(F.col(col), rx, gi)),
            )
        rel.df = df
        return rel

    # -- GROK --------------------------------------------------------------------
    _GROK_PATTERNS = {
        "WORD": r"\w+",
        "NOTSPACE": r"\S+",
        "SPACE": r"\s+",
        "DATA": r".*?",
        "GREEDYDATA": r".*",
        "INT": r"[+-]?\d+",
        "NUMBER": r"[+-]?\d+(?:\.\d+)?",
        "IP": r"\d{1,3}(?:\.\d{1,3}){3}",
        "LOGLEVEL": r"TRACE|DEBUG|INFO|WARN|ERROR|FATAL",
        "USERNAME": r"[a-zA-Z0-9._-]+",
    }
    _GROK_TYPES = {"int": "long", "long": "long", "float": "double",
                   "double": "double", "boolean": "boolean",
                   "keyword": "string", "string": "string"}

    def _grok(self, rel: _Rel, col: str, pattern: str) -> _Rel:
        """ES|QL GROK: one anchor-matched regex built from the %{SYNTAX:
        name[:type]} pattern; per-key regexp_extract, null on non-match
        (like DISSECT — all JVM-side)."""
        if col not in rel.df.columns:
            raise EsqlError(f"ES|QL: unknown column {col!r}")
        parts = re.split(r"(%\{[^}]*\})", pattern)
        regex: list[str] = []
        keys: list[tuple[str, str | None]] = []  # (name, cast type)
        n_groups = 0
        group_of: dict[str, int] = {}
        for p in parts:
            if not p:
                continue
            if p.startswith("%{") and p.endswith("}"):
                body = p[2:-1].split(":")
                syntax = body[0]
                if syntax not in self._GROK_PATTERNS:
                    raise EsqlError(
                        f"ES|QL: unknown grok pattern %{{{syntax}}} "
                        f"(known: {sorted(self._GROK_PATTERNS)})"
                    )
                sub = self._GROK_PATTERNS[syntax]
                if len(body) >= 2 and body[1]:
                    name = body[1]
                    typ = None
                    if len(body) >= 3:
                        if body[2] not in self._GROK_TYPES:
                            raise EsqlError(
                                f"ES|QL: unknown grok type {body[2]!r}"
                            )
                        typ = self._GROK_TYPES[body[2]]
                    n_groups += 1
                    group_of[name] = n_groups
                    keys.append((name, typ))
                    regex.append(f"({sub})")
                else:
                    regex.append(f"(?:{sub})")
            else:
                regex.append(re.escape(p))
        rx = "^" + "".join(regex) + "$"
        matched = F.col(col).rlike(rx)
        df = rel.df
        for name, typ in keys:
            c = F.when(matched, F.regexp_extract(F.col(col), rx, group_of[name]))
            if typ and typ != "string":
                c = c.cast(typ)
            df = df.withColumn(name, c)
        rel.df = df
        return rel

    # -- LOOKUP JOIN -------------------------------------------------------------
    def _lookup(self, rel: _Rel, table: str, key: str) -> _Rel:
        """ES|QL LOOKUP JOIN: left join against a registered lookup index
        on field equality. The lookup side is broadcast — ES restricts
        lookup indexes to one shard for the same reason (small dimension
        by construction)."""
        if table not in self.sources or not isinstance(
            self.sources[table], DataFrame
        ):
            raise EsqlError(
                f"ES|QL: LOOKUP JOIN needs a registered TABLE source "
                f"named {table!r}"
            )
        if key not in rel.df.columns:
            raise EsqlError(f"ES|QL: join field {key!r} not in input")
        lk = self.sources[table]
        if key not in lk.columns:
            raise EsqlError(f"ES|QL: join field {key!r} not in {table!r}")
        # ES|QL semantics: lookup columns REPLACE same-named input columns
        clobbered = [c for c in lk.columns if c != key and c in rel.df.columns]
        rel.df = rel.df.drop(*clobbered).join(F.broadcast(lk), key, "left")
        return rel

    # -- ENRICH ------------------------------------------------------------------
    def _enrich(
        self, rel: _Rel, policy: str, on: str | None, withs: list[tuple[str, str]]
    ) -> _Rel:
        if policy not in self.enrich:
            raise EsqlError(f"ES|QL: unknown enrich policy {policy!r}")
        table, match_field = self.enrich[policy]
        key = on or match_field
        if key not in rel.df.columns:
            raise EsqlError(f"ES|QL: enrich match field {key!r} not in input")
        picked = withs or [
            (c, c) for c in table.columns if c != match_field
        ]
        proj = table.select(
            F.col(match_field).alias("__ek"),
            *[F.col(src).alias(dst) for dst, src in picked],
        )
        # ES enrich fields REPLACE same-named input columns (same contract
        # as LOOKUP JOIN) — drop collisions before the join so the output
        # never carries ambiguous duplicate names. A policy field may be
        # named like the join key itself: join on a renamed copy of the
        # base key so even that column can be replaced (unmatched rows get
        # NULL, like any other enrich field)
        clobbered = [dst for dst, _ in picked if dst in rel.df.columns]
        base = rel.df.withColumn("__ekey", F.col(key)).drop(*clobbered)
        rel.df = base.join(
            F.broadcast(proj), base["__ekey"] == proj["__ek"], "left"
        ).drop("__ek", "__ekey")
        return rel


def esql(
    spark: SparkSession,
    text: str,
    sources: dict[str, object],
    enrich: dict[str, tuple[DataFrame, str]] | None = None,
    inference: dict[str, object] | None = None,
) -> DataFrame:
    """One-shot helper: ``esql(spark, "FROM t | ...", {"t": df})``."""
    return EsqlEngine(spark, sources, enrich, inference=inference).query(text)

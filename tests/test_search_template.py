"""ES ``_search/template``: the mustache subset search templates actually
use, rendered driver-side then dispatched through the normal body
dispatcher — rendering must be typed (numbers stay numbers), defaults
must work for MISSING params, and anything unresolved must refuse rather
than mis-run (ES renders empty string there, silently corrupting the
query)."""

from __future__ import annotations

import json

import pytest

from dart_importer_spark.query.dsl import (
    DslError,
    render_template,
    search_template,
)


def test_render_typed_and_interpolated():
    src = {
        "query": {"match": {"text": "{{q}}"}},
        "size": "{{k}}",
        "note": "asked for {{q}} with k={{k}}",
    }
    out = render_template(src, {"q": "the and", "k": 7})
    assert out["size"] == 7  # whole-string substitution keeps the type
    assert out["query"]["match"]["text"] == "the and"
    assert out["note"] == "asked for the and with k=7"


def test_render_tojson_and_lists():
    src = {"query": {"terms": {"role": "{{#toJson}}roles{{/toJson}}"}}}
    out = render_template(src, {"roles": ["user", "tool"]})
    assert out["query"]["terms"]["role"] == '["user", "tool"]'
    # whole-string {{name}} with a list param keeps the list itself
    out2 = render_template(
        {"query": {"terms": {"role": "{{roles}}"}}},
        {"roles": ["user", "tool"]},
    )
    assert out2["query"]["terms"]["role"] == ["user", "tool"]


def test_render_default_sections():
    src = {"size": "{{k}}{{^k}}10{{/k}}"}
    assert render_template(src, {"k": 3})["size"] == "3"
    assert render_template(src, {})["size"] == "10"
    # plain inverted section without a leading var
    src2 = {"q": "{{^lang}}any{{/lang}}"}
    assert render_template(src2, {})["q"] == "any"
    assert render_template(src2, {"lang": "en"})["q"] == ""


def test_render_missing_param_refuses():
    with pytest.raises(DslError, match="missing param 'q'"):
        render_template({"query": {"match": {"text": "{{q}}"}}}, {})
    with pytest.raises(DslError, match="missing param"):
        render_template({"x": "{{#toJson}}v{{/toJson}}"}, {})


def test_render_string_source():
    src = '{"query": {"match": {"text": "{{q}}"}}, "size": {{k}}}'
    out = render_template(src, {"q": "the", "k": 5})
    assert out == {"query": {"match": {"text": "the"}}, "size": 5}
    # defaults work in the string form too
    src2 = '{"size": {{k}}{{^k}}10{{/k}}}'
    assert render_template(src2, {}) == {"size": 10}
    assert render_template(src2, {"k": 3}) == {"size": 3}
    with pytest.raises(DslError, match="not JSON"):
        render_template('{"size": {{k}}', {"k": 1})


def test_search_template_end_to_end(built_index):
    body = {
        "source": {
            "query": {"bool": {
                "must": [{"match": {"text": "{{q}}"}}],
                "filter": [{"term": {"role": "{{role}}"}}],
            }},
            "size": "{{k}}",
        },
        "params": {"q": "the and", "role": "user", "k": 8},
    }
    got = search_template(built_index, body, round_scores=6)
    want = built_index.search({
        "query": {"bool": {
            "must": [{"match": {"text": "the and"}}],
            "filter": [{"term": {"role": "user"}}],
        }},
        "size": 8,
    }, round_scores=6)
    assert [tuple(r) for r in got.collect()] == \
        [tuple(r) for r in want.collect()]
    with pytest.raises(DslError, match="stored-template"):
        search_template(built_index, {"id": "t1", "params": {}})
    with pytest.raises(DslError, match="source"):
        search_template(built_index, {"params": {}})


def test_cli_template_params(spark, built_index, capsys):
    from dart_importer_spark.cli import main

    src = json.dumps({"query": {"match": {"text": "{{q}}"}}, "size": "{{k}}"})
    assert main(["dsl", "--index", built_index.dir, "--body", src,
                 "--params", json.dumps({"q": "the", "k": 4})]) == 0
    hits = [json.loads(s) for s in
            capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(hits) <= 4 and {"doc_id", "score"} <= set(hits[0])

"""ES ``indices.create`` parity: the reference's mapping bodies
(import_dart_data.py:337-468) compile to a build plan — field types map
to indexed/stored columns, search_as_you_type grows its 2/3-gram
subfields, date formats parse schema-on-read, number_of_shards sets the
segment count, and the mapping round-trips through GET _mapping."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dart_importer_spark.index.ddl import compile_mappings, create_index
from dart_importer_spark.query.engine import InvertedIndex

REF_STYLE_MAPPINGS = {
    # the corp_code shape from the reference, over transcript columns
    "properties": {
        "text": {"type": "search_as_you_type"},
        "role": {"type": "keyword"},
        "ts": {"type": "date", "format": "strict_date_optional_time"},
        "turn_idx": {"type": "integer"},
    }
}


def test_compile_mappings(spark):
    text_cols, shingles, meta_cols, exprs = compile_mappings(
        REF_STYLE_MAPPINGS, ["text", "role", "ts", "turn_idx", "extra"]
    )
    assert text_cols == ["text"]
    assert shingles == [("text", 2), ("text", 3)]
    assert sorted(meta_cols) == ["role", "ts", "turn_idx"]
    assert set(exprs) == {"ts", "turn_idx"}


def test_compile_mappings_errors(spark):
    with pytest.raises(ValueError, match="unsupported type"):
        compile_mappings(
            {"properties": {"text": {"type": "geo_point"}}}, ["text"]
        )
    with pytest.raises(ValueError, match="not a column"):
        compile_mappings(
            {"properties": {"nope": {"type": "text"}}}, ["text"]
        )
    with pytest.raises(ValueError, match="at least one text"):
        compile_mappings(
            {"properties": {"role": {"type": "keyword"}}}, ["role"]
        )


@pytest.fixture(scope="module")
def mapped_index(spark, transcripts_df, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ddl") / "idx")
    m = create_index(
        spark,
        transcripts_df,
        out,
        mappings=REF_STYLE_MAPPINGS,
        settings={"number_of_shards": 3},
    )
    assert m["n_docs"] > 0
    return InvertedIndex(spark, out), out, m


def test_create_index_layout(mapped_index):
    ix, out, m = mapped_index
    # number_of_shards -> n_segments; sayt subfields present
    assert ix.meta["n_segments"] == 3
    assert ix.meta["fields"] == ["text", "text._2gram", "text._3gram"]
    assert ix.meta["store_positions"] is True
    # date parsed schema-on-read into a timestamp doc_stats column
    t = dict(ix.doc_stats().dtypes)["ts"]
    assert t.startswith("timestamp")


def test_mapped_index_queries(mapped_index):
    ix, out, m = mapped_index
    # the type's promise: sayt prefix search + phrase + keyword filter
    assert ix.search_as_you_type("th").count() > 0
    assert ix.match_phrase("the data", k=5).count() >= 0
    hits = ix.topk("the", k=5, filters=F.col("role") == "user")
    assert hits.count() > 0


def test_mapping_roundtrip_and_resume(mapped_index, spark, transcripts_df):
    ix, out, m = mapped_index
    got = ix.mapping()
    assert got["mappings"] == REF_STYLE_MAPPINGS
    assert got["settings"] == {"number_of_shards": 3}
    # ignore_status=400 flow: same body resumes, builds nothing
    m2 = create_index(
        spark, transcripts_df, out,
        mappings=REF_STYLE_MAPPINGS, settings={"number_of_shards": 3},
    )
    assert m2["built_segments"] == []
    # a LAYOUT change without force raises (ES: mapping conflict)
    with pytest.raises(ValueError, match="layout config changed"):
        create_index(
            spark, transcripts_df, out,
            mappings={"properties": {"text": {"type": "text"}}},
            settings={"number_of_shards": 3},
        )


def test_synthesized_mapping(built_index):
    # an index built directly (no mapping.json) still answers _mapping
    got = built_index.mapping()
    props = got["mappings"]["properties"]
    assert props.get("text", {}).get("type") in ("text", "search_as_you_type")
    assert got["settings"]["number_of_shards"] == built_index.meta["n_segments"]


def test_cli_create_and_mapping(spark, transcripts_df, tmp_path, capsys):
    from dart_importer_spark.cli import main

    inp = str(tmp_path / "tx_ddl")
    transcripts_df.write.parquet(inp)
    idx = str(tmp_path / "idx_ddl")
    bf = tmp_path / "create.json"
    bf.write_text(json.dumps(
        {"mappings": REF_STYLE_MAPPINGS, "settings": {"number_of_shards": 2}}
    ))
    assert main(["create", "--input", inp, "--index", idx,
                 "--body-file", str(bf)]) == 0
    out1 = capsys.readouterr().out
    assert json.loads(out1.strip().splitlines()[-1])["n_docs"] > 0
    assert main(["mapping", "--index", idx]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got["mappings"] == REF_STYLE_MAPPINGS


def test_index_templates(spark, transcripts_df, tmp_path):
    from dart_importer_spark.index.ddl import TemplateError, TemplateRegistry
    from dart_importer_spark.query.engine import InvertedIndex

    reg = TemplateRegistry(str(tmp_path / "indexes"))
    reg.put("dart", ["dart-*"], REF_STYLE_MAPPINGS,
            settings={"number_of_shards": 2}, priority=10)
    reg.put("catchall", ["*"], REF_STYLE_MAPPINGS, priority=0)
    # registry round-trips through its file
    reg2 = TemplateRegistry(str(tmp_path / "indexes"))
    assert set(reg2.get()) == {"dart", "catchall"}
    # highest priority wins; create applies its mappings + settings
    m = reg2.create_index(spark, transcripts_df, "dart-2024")
    assert m["n_docs"] > 0
    ix = InvertedIndex(spark, str(tmp_path / "indexes" / "dart-2024"))
    assert ix.mapping()["mappings"] == REF_STYLE_MAPPINGS
    assert ix.mapping()["settings"]["number_of_shards"] == 2
    # sayt subfields from the template really exist
    assert ix.search_as_you_type("th").count() >= 0
    # equal-priority ambiguity raises (ES rejects it too)
    reg2.put("dup", ["dart-*"], REF_STYLE_MAPPINGS, priority=10)
    with pytest.raises(TemplateError, match="equal priority"):
        reg2.resolve("dart-2025")
    reg2.delete("dup")
    # no match -> explicit error, never a silent default layout
    regx = TemplateRegistry(str(tmp_path / "empty"))
    with pytest.raises(TemplateError, match="no index template matches"):
        regx.create_index(spark, transcripts_df, "other-1")
    # broken template body fails at PUT, not at create
    with pytest.raises(ValueError):
        reg2.put("bad", ["b-*"], {"properties": {"x": {"type": "nope"}}})

"""Zipped-XML source (S2/S3 — reference download_corp_code zip + CORPCODE.xml
parse, import_dart_data.py:107-111,194-216)."""

from __future__ import annotations

import zipfile

from dart_importer_spark.sources.xmlzip import read_zipped_xml

XML_A = (
    "<result><list><corp_code>001</corp_code><corp_name>알파</corp_name>"
    "<stock_code>A01</stock_code></list>"
    "<list><corp_code>002</corp_code><corp_name>beta</corp_name></list></result>"
)
XML_B = (
    "<result><list><corp_code>003</corp_code><corp_name>gamma</corp_name>"
    "<stock_code>C03</stock_code></list></result>"
)


def test_read_zipped_xml(spark, tmp_path):
    d = tmp_path / "zips"
    d.mkdir()
    with zipfile.ZipFile(d / "a.zip", "w") as zf:
        zf.writestr("CORPCODE.xml", XML_A)
        zf.writestr("README.txt", "not xml, must be skipped")
    with zipfile.ZipFile(d / "b.zip", "w") as zf:
        zf.writestr("CORPCODE.xml", XML_B)

    out = read_zipped_xml(
        spark, str(d), "list", ("corp_code", "corp_name", "stock_code")
    )
    rows = {r["corp_code"]: r for r in out.collect()}
    assert set(rows) == {"001", "002", "003"}
    assert rows["001"]["corp_name"] == "알파"
    assert rows["002"]["stock_code"] is None  # missing child -> null
    assert rows["003"]["corp_name"] == "gamma"
    assert rows["001"]["src_file"].endswith("a.zip")
    assert rows["003"]["src_file"].endswith("b.zip")
    # one task per archive: parallelism = #zips
    assert out.rdd.getNumPartitions() >= 1

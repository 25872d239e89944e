from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dart_importer_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dart-importer-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from dart_importer_spark.datagen import generate_transcripts_pandas

    return generate_transcripts_pandas(200)


@pytest.fixture(scope="session")
def transcripts_df(spark):
    from dart_importer_spark.datagen import generate_transcripts

    return generate_transcripts(spark, 200)


@pytest.fixture(scope="session")
def built_index(spark, transcripts_df, tmp_path_factory):
    from dart_importer_spark.index.build import BuildConfig, build_index
    from dart_importer_spark.query.engine import InvertedIndex

    out = str(tmp_path_factory.mktemp("index") / "idx")
    metrics = build_index(
        spark, transcripts_df, out, BuildConfig(n_segments=4, n_buckets=8)
    )
    assert metrics["n_docs"] > 0
    return InvertedIndex(spark, out)

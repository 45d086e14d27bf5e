from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from geospatial_spark.session import get_spark

    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_transcripts_pd():
    from fixtures.datagen import gen_transcripts

    return gen_transcripts(20, seed=42)


@pytest.fixture(scope="session")
def small_transcripts_pd():
    from fixtures.datagen import gen_transcripts

    return gen_transcripts(300, seed=42)


@pytest.fixture(scope="session")
def tiny_transcripts(spark, tiny_transcripts_pd, tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "tiny.parquet"
    tiny_transcripts_pd.to_parquet(p, index=False)
    from geospatial_spark.sources.transcripts import read_transcripts

    return read_transcripts(spark, str(p))


@pytest.fixture(scope="session")
def small_transcripts(spark, small_transcripts_pd, tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "small.parquet"
    small_transcripts_pd.to_parquet(p, index=False)
    from geospatial_spark.sources.transcripts import read_transcripts

    return read_transcripts(spark, str(p))


@pytest.fixture(scope="session")
def small_oracle(small_transcripts_pd):
    from oracle.oracle import OracleIndex

    rows = list(
        zip(
            small_transcripts_pd["conv_id"],
            small_transcripts_pd["turn_idx"],
            small_transcripts_pd["text"],
        )
    )
    return OracleIndex.build(rows)


QUERIES = [
    "deploy the spark job",
    "spark",
    "the",                      # hottest term — WAND threshold stress
    "zzz-not-in-corpus",        # absent term → empty
    "index scan merge token",
    "the the the spark",        # duplicate query terms — no idf double count
    "singleton",
    "duplicate turn text across convs",  # tie-break exerciser
    "w100 w200 w5",
    "query table join agg shuffle data run test",
]

from __future__ import annotations

import pytest

from tika_addons_spark.fixtures import generate_transcripts
from tika_addons_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # with_jdbc: the JDBC round-trip tests share this session, and the
    # driver jar can only be attached at session build time.
    s = get_spark(
        app_name="tests", master="local[4]", shuffle_partitions=4,
        with_jdbc=True,
    )
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    # sf-smoke: ~50 convs incl. the whale (~1200 turns)
    return generate_transcripts(n_convs=30, seed=42)


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from tika_addons_spark.fixtures import write_transcripts_parquet

    p = tmp_path_factory.mktemp("data") / "transcripts.parquet"
    return write_transcripts_parquet(str(p), n_convs=30, seed=42)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_path):
    from tika_addons_spark.sources.catalog import read_transcripts

    return read_transcripts(spark, transcripts_path)

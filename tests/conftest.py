from __future__ import annotations

import pytest

from smos_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[8]", app_name="smos_spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts(spark):
    """Small deterministic transcripts table (FIXTURES.md §1 unit size)."""
    from smos_spark.synth import synth_transcripts

    df = synth_transcripts(spark, n_conv=60, seed=42)
    df = df.cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def transcripts_pdf(transcripts):
    return transcripts.toPandas()

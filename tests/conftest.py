import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ditto_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ditto_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from ditto_spark.synth import generate_transcripts

    df = generate_transcripts(spark, n_base=50, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def small_transcripts(spark):
    from ditto_spark.synth import generate_transcripts

    df = generate_transcripts(spark, n_base=300, seed=42).cache()
    df.count()
    return df

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peregrine_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    # Small-core session for test speed; scale behavior is exercised by
    # bench.py at local[8]/local[32] on the bench-scale input.
    s = get_spark(
        master="local[4]",
        app_name="peregrine-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def tiny_repo_files(spark):
    from peregrine_spark.sources.synth import synth_repo_files

    pdf = synth_repo_files(200, seed=42)
    return spark.createDataFrame(pdf)

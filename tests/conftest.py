from __future__ import annotations

import os

import pytest

from xf_spark.session import get_spark

# hermetic tests: never read or write the user's real config file
# (tests that exercise config set XF_SPARK_CONFIG themselves)
os.environ.setdefault(
    "XF_SPARK_CONFIG", f"/tmp/xf_spark_tests_config_{os.getpid()}.json"
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xf_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()

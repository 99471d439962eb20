from __future__ import annotations

import os

import pytest

from xf_spark.session import get_spark

# hermetic tests: never read or write the user's real config file —
# force-set (not setdefault: a developer-exported XF_SPARK_CONFIG
# would otherwise leak real config into CLI subprocesses). Tests that
# exercise config re-point XF_SPARK_CONFIG themselves. XF_LIMIT would
# silently change search defaults, so drop it too.
os.environ["XF_SPARK_CONFIG"] = f"/tmp/xf_spark_tests_config_{os.getpid()}.json"
os.environ.pop("XF_LIMIT", None)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xf_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()

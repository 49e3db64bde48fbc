from __future__ import annotations

import os

import pytest

# this sandbox's disk throttles concurrent writers — opt in to tmpfs scratch
# (production deployments leave spark.local.dir to the resource manager)
os.environ.setdefault("DHR_SHM_SCRATCH", "1")

from dhr_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="dhr_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()

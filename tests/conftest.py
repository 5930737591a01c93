from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_bifrost_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
SF01_DIR = "/root/testdata/sf0.01"

# The suite drives ~760 tests through ONE long-lived JVM; at the
# default 8g the 40-minute mark leaves storage/execution memory
# fragmented enough that a cache-materializing query (the pgoutput
# bridge) measured 19.5 s in-suite vs 8.3 s in a fresh session with
# ZERO code difference (r11). 16g keeps the perf gate measuring plans,
# not JVM residue; explicit SPARK_GRAFT_DRIVER_MEM still wins.
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="pg_bifrost_spark_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf01_dir():
    return SF01_DIR

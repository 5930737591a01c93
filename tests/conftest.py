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
# not JVM residue — but only where the host can afford it (a 16g -Xmx
# on a small CI runner would OOM a suite that ran fine at 8g);
# explicit SPARK_GRAFT_DRIVER_MEM always wins.
try:
    _phys_gb = (
        os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") / (1 << 30)
    )
except (ValueError, OSError, AttributeError):
    _phys_gb = 0
if _phys_gb >= 32:
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

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ome_arrow_spark.session import get_spark

# The FULL suite (mega-image tests + the 275-query oracle-parity sweep)
# exhausts an 8g driver JVM in one shared session — the sweep dies
# ~155 parity cases in with mass "connection refused" (observed twice,
# deterministically, as the registry grew past ~270). 24g gives the
# single-JVM lane the same headroom a real cluster driver would have;
# an explicit SPARK_DRIVER_MEMORY still wins.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ome-arrow-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def sf_small():
    return SF_SMALL

from __future__ import annotations

import os

import pytest

from spotify_tracks_spark.session import get_spark

# Fixture root: the driver-generated set by default (TESTDATA.md); CI and
# portable runs point SPARK_GRAFT_DATA_ROOT at a dir produced by
# scripts/gen_testdata.py (schema-identical synthetic tables).
DATA_ROOT = os.environ.get("SPARK_GRAFT_DATA_ROOT", "/root/testdata")
SF_SMOKE = f"{DATA_ROOT}/sf0.001"
SF_T2 = f"{DATA_ROOT}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()

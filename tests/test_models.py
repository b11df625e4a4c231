"""Q1–Q8 golden harness (Spark vs DuckDB oracle) + the reference's four
unique/not_null schema tests, at sf0.001 (t1 smoke tier)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from spotify_tracks_spark.checks import run_reference_checks
from spotify_tracks_spark.pipeline import run_models

from .conftest import SF_SMOKE
from .harness import compare

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", [k for k in QUERIES if k.startswith("q")])
def test_query_matches_oracle(spark, name):
    assert name in ORACLES, f"{name} missing oracle"
    ok, msg = compare(QUERIES[name](spark, SF_SMOKE), ORACLES[name], SF_SMOKE)
    assert ok, f"{name}: {msg}"


def test_reference_schema_checks(spark):
    models = run_models(spark, SF_SMOKE)
    for res in run_reference_checks(models):
        assert res.passed, res


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"track_name", "artists", "album", "plays", "minutes_played"} == set(df.columns)

"""Driver-mimic: every declared query must match its DuckDB oracle.

Runs at sf0.001 (fast); the driver's gate runs the same comparison at
sf0.01 — see tests/test_oracle_parity_sf001.py marker for the larger run.
"""

from __future__ import annotations

import pytest

from kassette_server_spark.oracle import compare
from kassette_server_spark.queries import all_specs

from conftest import SF_SMOKE

SPECS = all_specs()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity(spark, name):
    res = compare(spark, SPECS[name], SF_SMOKE)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0

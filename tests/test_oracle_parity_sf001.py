"""Driver-mimic at the DRIVER'S scale: every declared query must match
its DuckDB oracle at sf0.01, not just the fast sf0.001 smoke slice.

Scale-sensitive mismatches (empty-at-smoke edge cases going non-empty,
overflow/width issues appearing only with more rows) surface here
before the driver's CORRECTNESS gate sees them. Deselect with
``-m "not sf_correct"`` for a quick loop.
"""

from __future__ import annotations

import pytest

from kassette_server_spark.oracle import compare
from kassette_server_spark.queries import all_specs

from conftest import SF_CORRECT

SPECS = all_specs()


@pytest.mark.sf_correct
@pytest.mark.parametrize("name", sorted(SPECS))
def test_oracle_parity_sf_correct(spark, name):
    res = compare(spark, SPECS[name], SF_CORRECT)
    assert res.ok, f"{name}: {res.detail}"
    assert res.spark_rows >= 0

"""Engine facade + plan-audit utility tests."""

from __future__ import annotations

from conftest import SF_SMOKE

from kassette_server_spark.engine import Engine
from kassette_server_spark.plans import (
    count_shuffles,
    has_broadcast_join,
    pushed_filters,
    read_schema,
    uses_python_eval,
)


def test_engine_facade(spark):
    eng = Engine(sf_dir=SF_SMOKE, spark=spark)
    assert eng.sql("SELECT count(*) AS n FROM lineitem").collect()[0].n == 6000
    assert eng.table("region").count() == 5
    assert len(eng.queries()) >= 50
    assert eng.query("q09_count_distinct").collect()[0].u > 0


def test_plan_audit_utilities(spark):
    eng = Engine(sf_dir=SF_SMOKE, spark=spark)
    q01 = eng.query("q01_scan_filter")
    assert any("l_quantity" in f for f in pushed_filters(q01))
    assert set(read_schema(q01)) <= {"l_orderkey", "l_extendedprice", "l_quantity", "l_shipdate"}
    assert count_shuffles(q01) == 0  # pure scan+filter: no exchange
    assert not uses_python_eval(q01)
    q04 = eng.query("q04_multiway_broadcast_join")
    assert has_broadcast_join(q04)
    assert count_shuffles(q04) == 1  # only the final aggregation

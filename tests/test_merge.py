"""Upsert / SCD2 emulation tests (reference K3 primary_key upsert)."""

from __future__ import annotations

from datetime import datetime

from kassette_server_spark.operators.merge import scd2_apply, upsert


def test_upsert_updates_win_and_survivors_kept(spark):
    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, name string, v long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40), (2, "B2", 201)], "id long, name string, v long"
    )
    out = {r.id: (r.name, r.v) for r in upsert(target, updates, ["id"]).collect()}
    assert out[1] == ("a", 10) and out[3] == ("c", 30)  # survivors
    assert out[4] == ("d", 40)  # insert
    assert out[2] == ("B2", 201)  # dup within updates → deterministic max
    assert len(out) == 4


def test_scd2_closes_and_opens_versions(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 6, 1)
    target = spark.createDataFrame(
        [(1, "old", t0, None, True), (2, "keep", t0, None, True)],
        "id long, attr string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "new", t1)], "id long, attr string, valid_from timestamp"
    )
    rows = scd2_apply(target, updates, ["id"]).collect()
    by = {(r.id, r.attr): r for r in rows}
    assert by[(1, "old")].is_current is False and by[(1, "old")].valid_to == t1
    assert by[(1, "new")].is_current is True and by[(1, "new")].valid_to is None
    assert by[(2, "keep")].is_current is True

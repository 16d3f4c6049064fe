"""Static oracle hygiene sweep (VERDICT r7 "Next round" #2).

DuckDB widens a window ``SUM(BIGINT)`` to HUGEINT; pandas materializes
HUGEINT as float64 while the Spark side emits int64 — numerically equal
values, divergent driver hash (r7's single red row, q143). ``DESCRIBE``
is static (no execution), so this sweeps every registered oracle's
output column types and kills the whole failure class: any future
forgotten cast fails here in milliseconds instead of at the driver.
"""

from __future__ import annotations

import pytest

from kassette_server_spark.oracle import duckdb_connection
from kassette_server_spark.queries import all_specs

from conftest import SF_SMOKE

SPECS = all_specs()
ORACLED = sorted(n for n, s in SPECS.items() if s.oracle is not None)

FORBIDDEN = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_SMOKE)
    yield c
    c.close()


def test_dtype_gate_catches_prefix_q143(con, spark):
    """The local mirror must fail the way the driver fails: r7's q143
    oracle (pre-CAST) compares value-equal but hash-divergent
    (float64 vs int64). With the r8 driver-fidelity dtype gate
    (oracle._hash_dtype), the pre-fix form is red LOCALLY."""
    import dataclasses

    from kassette_server_spark.oracle import compare

    s = SPECS["q143_weighted_median"]
    prefix = dataclasses.replace(
        s, oracle=s.oracle.replace("CAST(MIN(tot) AS BIGINT)", "MIN(tot)")
    )
    assert prefix.oracle != s.oracle, "fixture drifted: CAST not found"
    res = compare(spark, prefix, SF_SMOKE)
    assert not res.ok and "dtype mismatch" in res.detail
    assert compare(spark, s, SF_SMOKE).ok


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_no_hugeint_outputs(con, name):
    desc = con.execute(f"DESCRIBE {SPECS[name].oracle}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(f in typ.upper() for f in FORBIDDEN)
    ]
    assert not bad, (
        f"{name}: oracle emits {bad} — pandas renders HUGEINT as float64 "
        f"while Spark emits int64, so the driver hash diverges even when "
        f"values match (q143 r7). CAST the aggregate output to BIGINT."
    )


def test_bench_composed_tier_names_are_registered():
    """bench.py's COMPOSED tier membership is a name list: a spec
    rename would silently shift the core/composed band split instead
    of failing. Lock every tier name to the live registry."""
    import bench

    missing = sorted(bench.COMPOSED - set(SPECS))
    assert not missing, f"COMPOSED tier names not in registry: {missing}"


def test_bench_codec_tier_names_are_registered():
    """Same lock for the CODEC band (VERDICT r11 #2): a rename or
    retirement of a codec spec must fail here, not silently move its
    cost between bands. Also pin the tiers disjoint — a spec counted
    in two bands would double-subtract from core."""
    import bench

    missing = sorted(bench.CODEC - set(SPECS))
    assert not missing, f"CODEC tier names not in registry: {missing}"
    assert not (bench.CODEC & bench.COMPOSED)


def test_bench_outlier_recheck_rule():
    """VERDICT r14 #2: the recheck selector trips only on >ratio x the
    committed reference AND above the absolute floor, ranks worst
    ratio first, caps the list, and never flags specs without a
    reference row (new this round)."""
    import bench

    ref = {"a": 1.0, "b": 0.1, "c": 2.0, "d": 0.05}
    timings = {
        "a": 3.5,   # 3.5x ref, above floor -> outlier
        "b": 0.4,   # 4x ref but under the 0.5s floor -> noise, skip
        "c": 40.0,  # 20x ref -> outlier, ranked first
        "d": 0.6,   # 12x ref and above floor -> outlier
        "e": 99.0,  # no reference row -> never an outlier
    }
    got = bench.select_outliers(timings, ref)
    assert [n for n, _, _ in got] == ["c", "d", "a"]
    assert got[0] == ("c", 40.0, 2.0)
    # the cap bounds added sweep time
    big = {f"q{i}": 10.0 for i in range(50)}
    capped = bench.select_outliers(big, {k: 1.0 for k in big})
    assert len(capped) == bench.RECHECK_MAX


def test_bench_reference_loader_tolerates_absence(tmp_path):
    import bench

    assert bench.load_reference_timings(str(tmp_path / "missing.json")) == {}
    p = tmp_path / "garbage.json"
    p.write_text("{not json")
    assert bench.load_reference_timings(str(p)) == {}
    q = tmp_path / "ok.json"
    q.write_text('{"queries": {"a": 1.5, "bad": "x", "zero": 0}}')
    assert bench.load_reference_timings(str(q)) == {"a": 1.5}


def test_bench_reference_prefers_recheck_readings(tmp_path):
    """A spec the previous sweep adjudicated must contribute its
    RECHECK reading as the next round's reference — the hot sweep
    value would set the outlier bar at 3x the transient."""
    import bench

    p = tmp_path / "full.json"
    p.write_text(
        '{"queries": {"a": 15.5, "b": 1.0},'
        ' "rechecks": {"a": {"sweep": 15.5, "ref": 2.3, "recheck": 0.68},'
        '              "zz": {"recheck": 1.0}}}'
    )
    got = bench.load_reference_timings(str(p))
    assert got == {"a": 0.68, "b": 1.0}


def test_bench_reference_prefers_fresh_subprocess_over_recheck(tmp_path):
    """VERDICT r15 #3: when a recheck escalated to a fresh-subprocess
    re-run, THAT is the most isolated prior reading and becomes the
    reference; a failed escalation (null) falls back to the recheck."""
    import bench

    p = tmp_path / "full.json"
    p.write_text(
        '{"queries": {"a": 15.5, "b": 4.1, "c": 1.0},'
        ' "rechecks": {'
        '   "a": {"sweep": 15.5, "ref": 2.3, "recheck": 3.9,'
        '         "fresh_subprocess": 1.04},'
        '   "b": {"sweep": 4.1, "ref": 1.0, "recheck": 2.8,'
        '         "fresh_subprocess": null}}}'
    )
    got = bench.load_reference_timings(str(p))
    assert got == {"a": 1.04, "b": 2.8, "c": 1.0}


def test_bench_compact_doc_fits_capture_window_worst_case():
    """VERDICT r15 "What's wrong" #1: the r15 compact stdout doc
    embedded the full 16-entry rechecks map, overflowed the driver's
    ~2.3 KB stdout tail capture, and the round recorded parsed:null —
    the exact r6 failure the code comments warned about. Lock the doc
    under COMPACT_DOC_MAX at WORST-CASE inputs: a full-registry-sized
    timing map with the longest real spec names, the recheck list at
    its RECHECK_MAX cap, every top-3 entry carrying a fresh_subprocess
    reading, and five sentinel samples on both axes."""
    import json

    import bench

    long_names = sorted(SPECS, key=len, reverse=True)
    timings = {n: 123.4567 for n in long_names}
    rechecks = {
        n: {
            "sweep": 123.4567,
            "ref": 1.2345,
            "recheck": 12.3456,
            "sentinel_at_recheck": 0.3148,
            "py_sentinel_at_recheck": 0.1234,
            "fresh_subprocess": 1.0412,
        }
        for n in long_names[: bench.RECHECK_MAX]
    }
    doc = bench.build_compact_doc(
        timings=timings,
        total=12345.6789,
        core_total=1234.5678,
        n_core=214,
        composed_total=123.4567,
        n_composed=17,
        codec_total=123.4567,
        n_codec=28,
        sentinel="q14_topk",
        sentinel_samples=[0.4297, 0.3148, 0.2099, 0.1304, 0.1244],
        py_sentinel_samples=[0.1234, 0.1234, 0.1234, 0.1234, 0.1234],
        rechecks=rechecks,
        sf=0.1,
    )
    assert len(doc) < bench.COMPACT_DOC_MAX
    parsed = json.loads(doc)
    assert parsed["rechecks"]["count"] == bench.RECHECK_MAX
    assert len(parsed["rechecks"]["top3"]) == 3
    assert len(parsed["queries"]) == 10
    # every top3 entry carries the escalated reading when present
    for rc in parsed["rechecks"]["top3"].values():
        assert rc["fresh"] == 1.0412


def test_bench_window_has_video_tier_first_rows():
    """VERDICT r15 #2: q259/q260 must be inside the 50-spec driver
    window this round (first driver rows the round after birth)."""
    from kassette_server_spark.queries import _WINDOW

    assert "q259_mjpeg_avi_frames" in _WINDOW
    assert "q260_mjpeg_avi_resample" in _WINDOW
    assert len(_WINDOW) == 50

"""Third-implementation checks: seeded-random inputs run through the
Spark operator AND an independent pure-Python model of the same
deterministic algorithm, compared EXACTLY.

The DuckDB oracles already give engine-vs-engine parity; these models
are deliberately written from the algorithm's definition (not from the
operator's code shape), so a bug mirrored into both SQL texts — the
failure mode oracle parity can't see — still gets caught.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def test_zorder_random_roundtrip(spark):
    from kassette_server_spark.operators.layout import zorder_key

    rng = random.Random(42)
    pts = [(rng.randrange(1 << 10), rng.randrange(1 << 10)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x int, y int")
    rows = df.select("x", "y", zorder_key(F.col("x"), F.col("y"), 10).alias("z")).collect()

    def model(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r.z == model(r.x, r.y)


def _py_priority(doc_id, w):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:13], 16)
    u = (h + 1) / float(1 << 52)
    return w / u


def test_priority_sample_matches_python_model(spark):
    from kassette_server_spark.operators.sampling import priority_sample

    rng = random.Random(7)
    rows = [(i, rng.randrange(1, 500)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = [(r.id, r.priority) for r in priority_sample(df, "id", "w", 30).collect()]
    want = sorted(
        ((i, _py_priority(i, w)) for i, w in rows),
        key=lambda t: (-t[1], t[0]),
    )[:30]
    assert got == want  # bit-exact, including the division


def test_pagerank_matches_python_model(spark):
    from kassette_server_spark.operators.graph import (
        DEFAULT_DAMPING_PPM,
        SCALE,
        pagerank_fixedpoint,
    )

    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.rank for r in pagerank_fixedpoint(df, iters=3).collect()}

    nodes = {s for s, _ in edges} | {d for _, d in edges}
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: SCALE for n in nodes}
    for _ in range(3):
        inflow: dict[int, int] = {}
        for s, d in edges:
            inflow[d] = inflow.get(d, 0) + (rank[s] * DEFAULT_DAMPING_PPM) // (
                outdeg[s] * SCALE
            )
        rank = {n: (SCALE - DEFAULT_DAMPING_PPM) + inflow.get(n, 0) for n in nodes}
    assert got == rank


def test_hierarchy_closure_matches_python_model(spark):
    from kassette_server_spark.operators.graph import hierarchy_closure

    rng = random.Random(3)
    # random forest: node i's parent is a strictly-smaller id (or root)
    nodes = [(0, None)] + [
        (i, rng.randrange(i) if rng.random() < 0.8 else None) for i in range(1, 120)
    ]
    df = spark.createDataFrame(nodes, "id long, parent long")
    got = {r.id: (r.root, r.depth, r.path_sum) for r in hierarchy_closure(df).collect()}

    par = dict(nodes)
    for i, _ in nodes:
        depth, psum, a = 0, i, i
        while par[a] is not None:
            a = par[a]
            depth += 1
            psum += a
        assert got[i] == (a, depth, psum)
    assert len(got) == len(nodes)


def test_winsorized_stats_matches_python_model(spark):
    from kassette_server_spark.operators.stats import winsorized_stats

    rng = random.Random(5)
    rows = [(g, round(rng.uniform(0, 50), 2)) for g in (1, 2, 3) for _ in range(150)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r.grp: r for r in winsorized_stats(df, "g", "v").collect()}

    for g in (1, 2, 3):
        vals = sorted(
            int(round(v * 100)) for gg, v in rows if gg == g
        )
        n = len(vals)

        def qbound(num, den):
            # smallest value whose cumulative count reaches ceil(q*n):
            # index = ceil(n*num/den) in 1-based order statistics
            k = -(-n * num // den)
            return vals[k - 1]

        lo, hi = qbound(5, 100), qbound(95, 100)
        clipped = [min(max(v, lo), hi) for v in vals]
        r = got[g]
        assert (r.n, r.lo, r.hi) == (n, lo, hi)
        assert r.n_clipped_low == sum(1 for v in vals if v < lo)
        assert r.n_clipped_high == sum(1 for v in vals if v > hi)
        assert r.wsum == sum(clipped)


def test_hll_estimate_matches_python_model(spark):
    from kassette_server_spark.operators.sketches import hll_count_distinct

    rng = random.Random(13)
    ids = [rng.randrange(10_000) for _ in range(3_000)]
    df = spark.createDataFrame([(i,) for i in ids], "v long")
    got = hll_count_distinct(df, "v", p=9).collect()[0]

    # independent model: md5 60-bit hash, register = h mod 512,
    # rank = scale - bitlength(h div 512) (scale = 60-9+1)
    m, scale = 1 << 9, 60 - 9 + 1
    regs: dict[int, int] = {}
    for v in set(ids):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        reg, rest = h % m, h // m
        rank = scale if rest == 0 else scale - rest.bit_length()
        regs[reg] = max(regs.get(reg, 0), rank)
    # the operator's exact formulation: raw HLL (no small-range
    # correction — documented), integer scaled harmonic sum, one
    # float division, floor
    import math

    present = sum(1 << (scale - r) for r in regs.values())
    nreg = len(regs)
    denom = present + (m - nreg) * (1 << scale)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = math.floor(alpha * m * m * float(1 << scale) / denom)
    assert got.approx_distinct == est
    assert got.zero_registers == m - nreg
    assert got.scaled_sum == denom


def test_grouped_ols_matches_python_model(spark):
    from kassette_server_spark.operators.stats import grouped_ols

    rng = random.Random(17)
    rows = [(g, rng.randrange(1, 60), rng.randrange(1, 9000)) for g in (1, 2) for _ in range(80)]
    df = spark.createDataFrame(rows, "g int, x int, y int")
    got = {r.grp: r for r in grouped_ols(df, "g", F.col("x"), F.col("y")).collect()}

    for g in (1, 2):
        xs = [(x, y) for gg, x, y in rows if gg == g]
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs)
        sxy = sum(x * y for x, y in xs)
        syy = sum(y * y for _, y in xs)
        # identical double expression tree (python float ops are the
        # same IEEE ops)
        cov_n = float(n) * float(sxy) - float(sx) * float(sy)
        var_x = float(n) * float(sxx) - float(sx) * float(sx)
        var_y = float(n) * float(syy) - float(sy) * float(sy)
        slope = cov_n / var_x
        assert got[g].slope == slope
        assert got[g].intercept == (float(sy) - slope * float(sx)) / float(n)
        assert got[g].r2 == (cov_n * cov_n) / (var_x * var_y)


def test_peak_concurrency_matches_python_model(spark):
    from kassette_server_spark.operators.funnel import peak_concurrency

    rng = random.Random(23)
    rows = [("g", s := rng.randrange(1000), s + rng.randrange(1, 120)) for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = peak_concurrency(df, "g", F.col("s"), F.col("e")).first()

    points = sorted(
        [(s, 1) for _, s, _ in rows] + [(e, -1) for _, _, e in rows]
    )
    peak = cur = 0
    i = 0
    while i < len(points):  # RANGE-frame semantics: tied points together
        j = i
        while j < len(points) and points[j][0] == points[i][0] and points[j][1] == points[i][1]:
            cur += points[j][1]
            j += 1
        peak = max(peak, cur)
        i = j
    assert (got.n_intervals, got.peak) == (300, peak)


def test_copurchase_matches_python_model(spark):
    from itertools import combinations

    from kassette_server_spark.operators.affinity import copurchase_pairs

    rng = random.Random(29)
    rows = [(rng.randrange(60), rng.randrange(25)) for _ in range(400)]
    df = spark.createDataFrame(rows, "basket int, item int")
    got = {(r.item_a, r.item_b): r.support
           for r in copurchase_pairs(df, "basket", "item", 1).collect()}

    baskets: dict[int, set] = {}
    for b, it in rows:
        baskets.setdefault(b, set()).add(it)
    want: dict[tuple, int] = {}
    for items in baskets.values():
        for a, b in combinations(sorted(items), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_mad_outliers_matches_python_model(spark):
    import statistics

    from kassette_server_spark.operators.stats import mad_outliers

    rng = random.Random(31)
    rows = [(1, round(rng.uniform(0, 100), 2)) for _ in range(201)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = mad_outliers(df, "g", "v", c=3.0).first()

    vals = [v for _, v in rows]
    med = statistics.median(vals)
    adev = [abs(v - med) for v in vals]
    mad = statistics.median(adev)
    assert got.med == med and got.mad == mad
    assert got.n_outliers == sum(1 for d in adev if d > 3.0 * mad)
    assert got.max_abs_dev == max(adev)


def test_hierarchy_jump_equals_chase_and_model(spark):
    from kassette_server_spark.operators.graph import (
        hierarchy_closure,
        hierarchy_closure_jump,
    )

    rng = random.Random(19)
    # deep chain (0←1←2←...←63) plus a random shallow forest
    nodes = [(0, None)] + [(i, i - 1) for i in range(1, 64)] + [
        (100 + i, (100 + rng.randrange(i)) if rng.random() < 0.7 else None)
        for i in range(1, 60)
    ] + [(100, None)]
    df = spark.createDataFrame(nodes, "id long, parent long")
    chase = {r.id: (r.root, r.depth, r.path_sum)
             for r in hierarchy_closure(df, max_depth=70).collect()}
    jump = {r.id: (r.root, r.depth, r.path_sum)
            for r in hierarchy_closure_jump(df, max_depth=70).collect()}
    assert jump == chase
    # spot-check the deep chain against the closed form
    assert jump[63] == (0, 63, sum(range(64)))


def test_gini_matches_python_model(spark):
    from kassette_server_spark.operators.stats import gini_by_group

    rng = random.Random(37)
    rows = [(g, e, round(rng.uniform(0, 500), 2)) for g in (1, 2) for e in range(40)]
    df = spark.createDataFrame(rows, "g int, ent int, v double")
    got = {r.grp: r for r in gini_by_group(df, "g", "ent", "v").collect()}

    for g in (1, 2):
        per = sorted(
            (int(round(v * 100)), e) for gg, e, v in rows if gg == g
        )
        n = len(per)
        sx = sum(x for x, _ in per)
        six = sum((i + 1) * x for i, (x, _) in enumerate(per))
        want = float(2 * six - (n + 1) * sx) / float(n * sx)
        assert got[g].gini == want and got[g].n == n and got[g].total == sx


def test_ewma_matches_python_model(spark):
    from kassette_server_spark.operators.textstats import ewma_by_group

    rng = random.Random(41)
    rows = [(1, o, float(rng.randrange(1, 100))) for o in range(50)]
    df = spark.createDataFrame(rows, "g int, o int, x double")
    got = ewma_by_group(df, "g", "o", F.col("x"), alpha=0.3).first()

    vals = [x for _, _, x in sorted(rows)]
    acc = vals[0]
    for x in vals[1:]:
        acc = 0.3 * x + 0.7 * acc  # same IEEE ops, same order
    assert got.ewma == round(acc, 6)
    assert got.last_value == vals[-1]


def test_snapshot_diff_matches_python_model(spark):
    from kassette_server_spark.operators.merge import snapshot_diff

    rng = random.Random(43)
    old = [(k, f"s{rng.randrange(5)}", rng.randrange(100)) for k in range(80)]
    new = [
        (k, (s if rng.random() < 0.7 else f"s{rng.randrange(5)}"), v)
        for k, s, v in old
        if rng.random() < 0.9
    ] + [(100 + k, "x", k) for k in range(5)]
    odf = spark.createDataFrame(old, "k long, s string, v long")
    ndf = spark.createDataFrame(new, "k long, s string, v long")
    got = {r.k: r.change for r in snapshot_diff(odf, ndf, ["k"]).collect()}

    om = {k: (s, v) for k, s, v in old}
    nm = {k: (s, v) for k, s, v in new}
    want = {}
    for k in om.keys() | nm.keys():
        if k not in om:
            want[k] = "added"
        elif k not in nm:
            want[k] = "removed"
        elif om[k] != nm[k]:
            want[k] = "changed"
    assert got == want


def test_timed_funnel_matches_python_model(spark):
    from kassette_server_spark.operators.funnel import timed_funnel

    rng = random.Random(47)
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    steps = ("view", "click", "purchase")
    window_us = 3600 * 1_000_000
    rows = []
    eid = 0
    for u in range(30):
        for _ in range(rng.randrange(1, 9)):
            eid += 1
            rows.append(
                (eid, f"u{u}", t0 + dt.timedelta(seconds=rng.randrange(0, 20000)),
                 rng.choice(steps))
            )
    df = spark.createDataFrame(
        rows, "event_id int, user_id string, ts timestamp, event_type string"
    )
    got = {r.user_id: r.stage for r in
           timed_funnel(df, steps, window_us).collect()}

    # model: per user, min view time; then conditional mins per step
    from collections import defaultdict

    by_user = defaultdict(list)
    for _, u, ts, et in rows:
        by_user[u].append((int(ts.timestamp() * 1_000_000), et))
    want = {}
    for u, evs in by_user.items():
        t1 = min((t for t, e in evs if e == "view"), default=None)
        if t1 is None:
            continue
        stage, prev = 1, t1
        for k, step in enumerate(steps[1:], start=2):
            nxt = min(
                (t for t, e in evs if e == step and prev < t <= prev + window_us),
                default=None,
            )
            if nxt is None:
                break
            stage, prev = k, nxt
        want[u] = stage
    assert got == want


def test_point_in_time_join_matches_python_model(spark):
    """Random version histories + random facts vs a brute-force scan
    model (for each fact: the max version_ts <= fact_ts per key)."""
    from kassette_server_spark.operators.merge import point_in_time_join

    rng = random.Random(1106)
    versions = []
    for k in range(20):
        for ts in sorted(rng.sample(range(1000), rng.randrange(1, 8))):
            versions.append((k, ts, f"v{k}-{ts}"))
    facts = [(i, rng.randrange(22), rng.randrange(1100)) for i in range(500)]

    vdf = spark.createDataFrame(versions, "k long, vf long, tag string")
    fdf = spark.createDataFrame(facts, "fid long, k long, ts long")
    got = {
        r.fid: (r.vf, r.tag)
        for r in point_in_time_join(fdf, vdf, ["k"], "ts", "vf").collect()
    }

    by_key: dict[int, list[tuple[int, str]]] = {}
    for k, ts, tag in versions:
        by_key.setdefault(k, []).append((ts, tag))
    want = {}
    for fid, k, ts in facts:
        eligible = [(vts, tag) for vts, tag in by_key.get(k, []) if vts <= ts]
        if eligible:
            want[fid] = max(eligible)
    assert got == want


def test_dataset_split_matches_python_model(spark):
    from kassette_server_spark.operators.sampling import dataset_split

    fractions = {"train": 0.7, "val": 0.2, "test": 0.1}
    df = spark.range(3000).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r.split for r in dataset_split(df, "doc_id", fractions, salt="m").collect()}

    def model(i):
        h = int(hashlib.md5(f"m:{i}".encode()).hexdigest()[:13], 16)
        u = h / float(1 << 52)
        cum = 0.0
        names = list(fractions)
        for name in names[:-1]:
            cum += fractions[name]
            if u < cum:
                return name
        return names[-1]

    assert got == {i: model(i) for i in range(3000)}

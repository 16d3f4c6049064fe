"""Round-17 optimization parity tests: pin the restructured operators
bit-for-bit against brute-force spellings of the original definitions.
"""
from __future__ import annotations

import math

from kassette_server_spark.operators.evaluation import spearman_by
from kassette_server_spark.operators.pq import (
    _collect_seed_rows,
    _floored_mean,
    _raw,
    _seed_codebook,
    _update_book,
    _update_frame,
)


def _two_ranks(vals):
    """Twice-midrank per row, the definitional row-level spelling."""
    return [
        2 * sum(1 for w in vals if w < v) + sum(1 for w in vals if w == v) + 1
        for v in vals
    ]


def _rho(pairs):
    n = len(pairs)
    xs = _two_ranks([p[0] for p in pairs])
    ys = _two_ranks([p[1] for p in pairs])
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(float(n * syy - sy * sy))
    return (num / den) if den else None


def test_spearman_joint_window_tie_dense_parity(spark):
    """The r17 joint-frame window spelling (2·cume − peers + 1 ranks,
    count-weighted moments) must be bit-identical to the row-level
    definition on a tie-dense multi-group frame with duplicate
    (g, x, y) rows — the exact case the joint count weighting folds."""
    rows = []
    data = {
        "a": [(1, 5), (1, 5), (1, 7), (2, 5), (2, 9), (3, 9), (3, 9), (1, 5)],
        "b": [(4, 1), (4, 1), (4, 1), (4, 2), (5, 2), (6, 2), (6, 3)],
        "c": [(1, 1), (2, 4), (2, 4), (3, 2), (5, 8), (5, 8), (5, 8), (9, 9)],
    }
    for g, pairs in data.items():
        rows += [(g, x, y) for x, y in pairs]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: (r.n, r.rho) for r in spearman_by(df, "g", "x", "y").collect()}
    for g, pairs in data.items():
        n, rho = got[g]
        assert n == len(pairs)
        expected = _rho(pairs)
        if expected is None:
            assert rho is None
        else:
            assert rho == expected, f"group {g}: {rho} != {expected}"


def _vec_frame(spark, n=60, dim=8, seed=7):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_update_book_matches_in_frame_aggregate(spark):
    """The r17 driver-side partial fold (_update_book) must produce
    the exact codebook the in-frame groupBy aggregate produces —
    same clusters, same floored-mean integer centroids."""
    dim, m, k = 8, 2, 4
    d = dim // m
    df = _vec_frame(spark, n=60, dim=dim)
    vdf = _raw(df, "vec_id", "embedding", "_pid").repartition(5)
    book0 = _seed_codebook(vdf, m, k, dim, quantize=True)
    got = _update_book(vdf, book0, m, d, quantize=True)
    rows = _update_frame(vdf, book0, m, d, quantize=True).collect()
    want = {mi: [] for mi in range(m)}
    for r in sorted(rows, key=lambda r: (r["m"], r["cid"])):
        coords = tuple(
            _floored_mean(int(r[f"s_{j}"]), int(r["n"])) for j in range(d)
        )
        want[int(r["m"])].append((int(r["cid"]), coords))
    assert got == want


def test_seed_rows_prefix_slicing(spark):
    """A max(kc, k)-row seed collect sliced to kc rows must seed the
    identical coarse codebook as a direct kc-row collect."""
    dim = 8
    df = _vec_frame(spark, n=40, dim=dim)
    vdf = _raw(df, "vec_id", "embedding", "_pid")
    rows16 = _collect_seed_rows(vdf, 16)
    direct = _seed_codebook(vdf, 1, 4, dim, quantize=True)
    sliced = _seed_codebook(vdf, 1, 4, dim, quantize=True, rows=rows16)
    assert direct == sliced

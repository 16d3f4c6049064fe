"""Round-17 optimization parity tests: pin the restructured operators
bit-for-bit against brute-force spellings of the original definitions.
"""
from __future__ import annotations

import math

from kassette_server_spark.operators.evaluation import spearman_by


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

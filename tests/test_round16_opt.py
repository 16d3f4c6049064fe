"""Round-16 optimization parity locks.

The r16 optimization round moved per-element math off interpreted
Catalyst HOFs into Arrow-batched numpy kernels (guide §4.2). These
tests pin the BIT-level equivalence arguments those swaps rest on, on
adversarial values (half-way ties, negatives, zero vectors, subnormal
scales) that the oracle fixtures may never hit.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kassette_server_spark.operators.pq import _quantize_np
from kassette_server_spark.operators.similarity import (
    _ordered_dot_np,
    _ordered_norm_np,
    dot,
    norm,
    quantize_int8,
)


VECS = [
    # exact binary halves: HALF_UP must round away from zero
    [1.0, 0.5, -0.5, 2.5, -2.5, 63.5, -63.5, 127.0],
    # values that stress the floor/frac split near ties
    [0.4999999999999999, -0.4999999999999999, 1.5000000000000002, -1.0, 0.0, 3.0, -127.0, 126.9999],
    # tiny scale (max|x| subnormal-ish) and sign mixes
    [1e-300, -1e-300, 5e-301, -5e-301, 2e-300, 0.0, 1e-301, -2e-300],
    # all-zero vector: quantizes to zeros (Spark's NaN→0 long cast)
    [0.0] * 8,
    # negatives only
    [-3.25, -1.75, -0.25, -64.0, -127.0, -0.125, -2.0, -1.0],
]


def test_quantize_np_matches_catalyst_bitwise(spark):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(VECS)], "vec_id long, embedding array<double>"
    )
    qvec, _ = quantize_int8("embedding")
    want = {
        r["vec_id"]: list(r["qv"])
        for r in df.select("vec_id", qvec.alias("qv")).collect()
    }
    for i, v in enumerate(VECS):
        got = _quantize_np(np.array([v], dtype=np.float64))[0].tolist()
        # Catalyst yields NULL elements only for the all-zero vector's
        # NaN path on some spellings; the engine contract (non-ANSI
        # cast) is 0 — accept either spelling for that row only
        w = [0 if x is None else x for x in want[i]]
        assert got == w, (i, got, w)


def test_ordered_dot_and_norm_match_catalyst_fold(spark):
    rng = np.random.RandomState(7)
    A = rng.randn(6, 16) * rng.choice([1e-3, 1.0, 1e3], size=(6, 1))
    B = rng.randn(4, 16)
    df = spark.createDataFrame(
        [
            (int(i), int(j), A[i].tolist(), B[j].tolist())
            for i in range(len(A))
            for j in range(len(B))
        ],
        "i long, j long, a array<double>, b array<double>",
    )
    rows = df.select(
        "i",
        "j",
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("na"),
    ).collect()
    D = _ordered_dot_np(A, B)
    NA = _ordered_norm_np(A)
    for r in rows:
        # bit-identical, not approximately equal
        assert D[r["i"], r["j"]] == r["d"], (r["i"], r["j"])
        assert NA[r["i"]] == r["na"]


def test_exact_int8_matmul_identity():
    # c·c − 2c·q + q·q over int64 == the elementwise fold, exactly
    rng = np.random.RandomState(11)
    C = rng.randint(-127, 128, size=(50, 64)).astype(np.int64)
    Q = rng.randint(-127, 128, size=(7, 64)).astype(np.int64)
    direct = ((C[:, None, :] - Q[None, :, :]) ** 2).sum(axis=2)
    via_matmul = (C * C).sum(axis=1)[:, None] + (Q * Q).sum(axis=1)[None, :] - 2 * (C @ Q.T)
    assert np.array_equal(direct, via_matmul)


def test_brute_force_fused_equals_crossjoin_path(spark):
    from kassette_server_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(3)
    vecs = [(int(i), rng.randn(8).tolist()) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 10 == 0)
    fused = brute_force_topk(df, q, k=5).collect()
    old = brute_force_topk(df, q, k=5, max_query_broadcast_rows=None).collect()
    key = lambda r: (r["query_id"], r["rank"])
    fused_m = {key(r): (r["neighbor_id"], r["cos"]) for r in fused}
    old_m = {key(r): (r["neighbor_id"], r["cos"]) for r in old}
    assert fused_m == old_m


def test_exact_int8_l2_fused_equals_fallback(spark):
    from kassette_server_spark.operators.pq import exact_int8_l2_topk

    rng = np.random.RandomState(5)
    vecs = [(int(i), rng.randn(16).tolist()) for i in range(80)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") % 20 == 0)
    fused = exact_int8_l2_topk(df, q, topk=5).collect()
    old = exact_int8_l2_topk(df, q, topk=5, max_query_rows=None).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert {key(r): (r["neighbor_id"], r["l2_dist"]) for r in fused} == {
        key(r): (r["neighbor_id"], r["l2_dist"]) for r in old
    }


@pytest.mark.parametrize("dim,out_dim", [(8, 4), (64, 16)])
def test_jl_project_vec_kernel_matches_long_form(spark, dim, out_dim):
    from kassette_server_spark.operators.similarity import jl_project, jl_project_vec

    rng = np.random.RandomState(13)
    df = spark.createDataFrame(
        [(0, rng.randn(dim).tolist()), (1, (rng.randn(dim) * 1e-6).tolist())],
        "vec_id long, embedding array<double>",
    )
    long = {
        (r["vec_id"], r["k"]): r["proj"]
        for r in jl_project(df, in_dim=dim, out_dim=out_dim).collect()
    }
    for r in jl_project_vec(df, in_dim=dim, out_dim=out_dim).collect():
        for k, x in enumerate(r["sketch"]):
            assert x == long[(r["vec_id"], k)]

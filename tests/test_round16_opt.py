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


# -- text/dedup tier: codegen respellings of interpreted HOF builds ----------
#
# r16 also replaced interpreted transform(...) lambdas with arrays_zip
# sliding windows (positional_kgrams, the bigram gram stream) and made
# remove_duplicated_spans rebuild cleaned text ROW-LOCALLY from the
# covered-position set instead of re-aggregating every exploded token.
# These tests pin the equivalences on adversarial shapes (short docs,
# empty strings, consecutive spaces, full-coverage removals) that the
# sf fixtures may not contain.

ADVERSARIAL_DOCS = [
    (0, "a b c d e f g h i j"),          # normal, longer than k
    (1, "a b c d e f g h"),              # exactly k tokens (one gram)
    (2, "a b c"),                        # shorter than k: no grams
    (3, ""),                             # empty text -> [''] token
    (4, "x  y"),                         # consecutive spaces -> '' token
    (5, "a b c d e f g h i j"),          # exact dup of doc 0
    (6, "z z z z z z z z z z z z"),      # within-doc repetition
    (7, "q r s a b c d e f g h i j t"),  # contains doc 0 as a span
]


def _kgrams_reference(spark, df, k):
    """The pre-r16 transform(sequence, slice) spelling, kept inline as
    the reference the zip build must reproduce."""
    from kassette_server_spark.operators.dedup import tokens

    toks = tokens("_txt")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(
        F.col("id"), F.posexplode(grams).alias("pos0", "gram")
    ).select("id", (F.col("pos0") + 1).alias("pos"), "gram")


@pytest.mark.parametrize("k", [2, 8])
def test_positional_kgrams_zip_matches_reference(spark, k):
    from kassette_server_spark.operators.dedup import positional_kgrams

    df = spark.createDataFrame(
        [(i, t) for i, t in ADVERSARIAL_DOCS], "id long, _txt string"
    )
    got = positional_kgrams(df, "_txt", "id", k).collect()
    want = _kgrams_reference(spark, df, k).collect()
    key = lambda r: (r["id"], r["pos"])
    assert {key(r): r["gram"] for r in got} == {key(r): r["gram"] for r in want}
    assert len(got) == len(want)


def test_remove_duplicated_spans_row_local_rebuild(spark):
    from kassette_server_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in ADVERSARIAL_DOCS], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(df, k=8).collect()}
    # doc 0 is the keeper (min id): untouched
    assert out[0]["n_removed"] == 0
    assert out[0]["cleaned_text"] == "a b c d e f g h i j"
    # doc 5 duplicates doc 0 entirely: every position covered
    assert out[5]["n_removed"] == out[5]["n_tokens"] == 10
    assert out[5]["cleaned_text"] == ""
    # doc 7 contains doc 0's grams as an interior span: the covered
    # span [4, 13] is cut, the flanks survive in order
    assert out[7]["cleaned_text"] == "q r s t"
    assert out[7]["n_removed"] == 10
    # short/empty/multi-space docs pass through untouched
    for i in (2, 3, 4):
        assert out[i]["n_removed"] == 0
    assert out[3]["cleaned_text"] == ""
    assert out[4]["cleaned_text"] == "x  y"
    # n_tokens is the whitespace token count (split keeps empties)
    assert out[3]["n_tokens"] == 1
    assert out[4]["n_tokens"] == 3


def test_bigram_gram_stream_zip_matches_reference(spark):
    from kassette_server_spark.operators.dedup import tokens
    from kassette_server_spark.operators.textstats import bigram_logprob_by_doc

    df = spark.createDataFrame(
        [(i, t) for i, t in ADVERSARIAL_DOCS], "doc_id long, text string"
    )
    # reference gram stream: the pre-r16 transform/element_at spelling
    toks = tokens("text")
    ref = (
        df.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                    lambda w, i: F.struct(
                        w.alias("w1"), F.element_at(toks, i + 2).alias("w2")
                    ),
                )
            ).alias("pos", "g"),
        ).select("doc_id", "pos", "g.w1", "g.w2")
    )
    n_bi = F.greatest(F.size(toks) - 1, F.lit(0))
    got = (
        df.select(
            "doc_id",
            F.posexplode(
                F.arrays_zip(F.slice(toks, 1, n_bi), F.slice(toks, 2, n_bi))
            ).alias("pos", "g"),
        ).select(
            "doc_id", "pos",
            F.col("g")["0"].alias("w1"), F.col("g")["1"].alias("w2"),
        )
    )
    assert got.exceptAll(ref).count() == 0 and ref.exceptAll(got).count() == 0
    # end-to-end: the scored frame on the adversarial corpus is stable
    rows = bigram_logprob_by_doc(df).collect()
    assert {r["doc_id"] for r in rows} == {i for i, t in ADVERSARIAL_DOCS if len(t.split(" ")) >= 2}


def test_zipimporter_invalidate_stat_guard(tmp_path):
    """The worker daemon's zipimporter patch: an UNCHANGED archive's
    invalidate_caches() becomes a stat-only no-op (the per-task cost
    every Python worker paid re-parsing pyspark.zip's central
    directory), while a REPLACED archive is re-read exactly like
    upstream — new modules become importable, removed ones vanish."""
    import os
    import sys
    import zipfile
    import zipimport

    # importing the daemon module applies the class patch
    import kassette_server_spark.worker_daemon  # noqa: F401

    zp = str(tmp_path / "mods.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("modA.py", "VALUE = 1\n")
    imp = zipimport.zipimporter(zp)
    assert imp.find_spec("modA") is not None

    # unchanged archive: invalidate is a no-op (stamp survives)
    imp.invalidate_caches()
    stamp = imp._kss_zip_stat
    assert stamp == (os.stat(zp).st_mtime_ns, os.stat(zp).st_size)
    imp.invalidate_caches()
    assert imp._kss_zip_stat == stamp

    # replaced archive: re-read picks up the new directory
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("modB.py", "VALUE = 2\n")
    os.utime(zp, (os.path.getmtime(zp) + 2, os.path.getmtime(zp) + 2))
    imp.invalidate_caches()
    assert imp.find_spec("modB") is not None
    assert imp.find_spec("modA") is None
    assert imp._kss_zip_stat != stamp
    sys.modules.pop("modA", None)
    sys.modules.pop("modB", None)


def test_hash_spread_and_roundrobin_fallback(spark, tmp_path):
    """ensure_scan_parallelism (r16): a too-narrow hashable input
    spreads via the content-hash repartition (deterministic under
    retry, no sort-before-repartition pass, REPARTITION_BY_NUM so AQE
    keeps the width); a frame whose every column is unhashable
    (map-typed) falls back to the round-robin spelling; and the
    spread actually yields the target partition count."""
    from pyspark.sql import functions as F

    from kassette_server_spark.operators.layout import ensure_scan_parallelism

    path = str(tmp_path / "narrow")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism

    spread = ensure_scan_parallelism(df)
    plan = spread._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression [xxhash64(" in plan
    assert spread.rdd.getNumPartitions() == target
    # rows unchanged
    assert spread.count() == 100

    # all-unhashable frame: round-robin fallback
    mdf = df.select(F.create_map(F.lit("k"), F.col("id")).alias("m"))
    fallback = ensure_scan_parallelism(mdf)
    fplan = fallback._jdf.queryExecution().analyzed().toString()
    assert "RepartitionByExpression" not in fplan
    assert f"Repartition {target}, true" in fplan

    # idempotence: a second wrap detects the hash spread and no-ops
    again = ensure_scan_parallelism(spread)
    assert again is spread


def test_relation_cache_reuses_plan_and_sees_rewrites(spark, tmp_path):
    """catalog.load (r16): the resolved relation is reused within a
    session (plan-only — every action still scans parquet), and a
    REWRITTEN table re-resolves so new data is visible."""
    import shutil

    from kassette_server_spark import catalog

    sfd = str(tmp_path / "sfx")
    import os

    os.makedirs(sfd)
    spark.range(5).withColumnRenamed("id", "r_regionkey").write.parquet(
        catalog.table_path(sfd, "region")
    )
    d1 = catalog.load(spark, sfd, "region")
    d2 = catalog.load(spark, sfd, "region")
    assert d2 is d1  # same resolved plan object
    assert d1.count() == 5

    # rewrite the table: the stamp changes, load re-resolves, new rows
    shutil.rmtree(catalog.table_path(sfd, "region"))
    spark.range(7).withColumnRenamed("id", "r_regionkey").write.parquet(
        catalog.table_path(sfd, "region")
    )
    d3 = catalog.load(spark, sfd, "region")
    assert d3 is not d1
    assert d3.count() == 7


def test_ivf_assign_fused_equals_join_path(spark):
    """ivf_assign (r16): the fused Arrow-kernel assignment is
    row-identical to the broadcast-join + max_by fallback, including
    ties (duplicate centroids at different ids pick the LOWEST id) and
    a zero-norm vector (NaN sims)."""
    from kassette_server_spark.operators.similarity import ivf_assign

    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.0, 1.0]),
            (3, [0.7, 0.7]),
            (4, [0.0, 0.0]),  # zero norm: all sims NaN
            (5, [-1.0, -1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),
            (11, [0.0, 1.0]),
            (12, [1.0, 0.0]),  # duplicate of 10: ties must pick 10
        ],
        "vec_id long, embedding array<double>",
    )
    fused = ivf_assign(vecs, cents).orderBy("vec_id").collect()
    joined = ivf_assign(
        vecs, cents, max_centroid_broadcast_rows=0
    ).orderBy("vec_id").collect()
    assert len(fused) == len(joined) == 5
    for a, b in zip(fused, joined):
        assert (a.vec_id, a.centroid_id, a.vv) == (b.vec_id, b.centroid_id, b.vv)
        assert a.vn == b.vn  # exact fold parity
    assert {r.vec_id: r.centroid_id for r in fused}[1] == 10  # tie -> lowest cid

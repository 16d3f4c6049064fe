"""Differential fuzzing: seeded random queries over a portable SQL
subset, executed as the IDENTICAL text by Spark SQL and DuckDB, results
diffed exactly.

The declared specs pin hand-chosen shapes; this harness sweeps the
combinatorial space around them (random projections, predicates, FK
joins, integer aggregates, window functions with explicit frames,
ROLLUP/CUBE/GROUPING SETS, string functions, sort orders, correlated
scalar subqueries, [NOT] EXISTS / [NOT] IN on single-table and join
shapes, and nested INTERSECT/EXCEPT/UNION) and would
surface semantic divergences none of the fixed oracles happen to cover
— cast widths, predicate tri-state logic, join duplicate semantics,
grouped-aggregate edge cases, window frame defaults and null ordering
(the areas where Spark/DuckDB dialect divergence actually bites,
per VERDICT r5 #5).

Grammar constraints that keep the subset genuinely portable:
- integer/string/date columns only — no doubles (float summation order
  is engine-dependent), no division;
- every query ends with a total ORDER BY over all selected columns
  with explicit NULLS FIRST (Spark ASC defaults nulls-first, DuckDB
  nulls-last — the one syntax-compatible trap found while building
  this);
- aggregates are count/sum/min/max over integer columns, sum cast to
  BIGINT on both sides by construction (inputs are int32/int64);
- literals are sampled from the actual column domains with a fixed
  seed, so predicates are selective but not degenerate.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from conftest import SF_CORRECT, SF_SMOKE

from kassette_server_spark.catalog import load

SEED = 20260813
N_QUERIES = 640  # raised r15 (600 → 640, VERDICT r14 #7), adding a
# NEW correlated-under-outer-join / EXISTS-in-CASE family (correlated
# count(*)/sum/min/max whose correlation key is an outer join's
# null-extended side — the classic COUNT bug — plus EXISTS and NOT
# EXISTS as CASE values in the select list, grouped and ungrouped;
# decorrelation under null-extension is the divergence class the
# other families don't reach) at 6% density.
# Prior raise r14 (560 → 600, VERDICT r13 #7), adding a
# NEW distinct-aggregates-under-join-fan-out family (count(DISTINCT),
# sum(DISTINCT), count(DISTINCT CASE WHEN ...) grouped by a join-side
# key, inner and LEFT joins — duplicate elimination after fan-out,
# NULL exclusion from DISTINCT sets, NULL-key groups) at 5% density.
# Prior raise r13 (520 → 560, VERDICT r12 #9): a NEW
# grouping-sets-over-window family (ROLLUP/CUBE/GROUPING SETS
# aggregating a windowed subquery's rank/dense_rank/RANGE-sum column —
# window evaluation before grouping-set expansion) at 6% density
# (r12 raise: 460 → 520, VERDICT r11 #8): a NEW
# correlated-aggregate-over-interval family (the q105/q144 value-offset
# RANGE-frame shapes composed with [NOT] EXISTS — semi/anti join decides
# frame membership before the window runs; plus a variant with a second
# EXISTS over the windowed output) at 6% density, and the FK-pair share
# rebalanced
# (r11 raise: 400 → 460, VERDICT r10 #8): the three
# r10-born families (window-over-window, per-group order-statistic
# cut, keep-first anti-join span) promoted from 4% to full core
# density (6% each ≈ 28 queries/seed) and a NEW outer-join-over-window
# family (the q184/TPC-H Q13 LEFT-join-preserving-empty-groups pattern
# composed with rank filters / count histograms / dense_rank argmax)
# added at the same density
# (r10 raise: 280 → 400, VERDICT r9 #7; r9 raise: window-over-
# aggregate / share-pair / double-EXISTS-residual)

# (table, integer cols, string cols, date cols) — doubles deliberately
# excluded (float summation order is engine-dependent)
TABLES = {
    "customer": (["c_custkey", "c_nationkey"], ["c_name", "c_mktsegment"], []),
    "orders": (["o_orderkey", "o_custkey"], ["o_orderstatus", "o_orderpriority"], ["o_orderdate"]),
    "nation": (["n_nationkey", "n_regionkey"], ["n_name"], []),
    "region": (["r_regionkey"], ["r_name"], []),
    "part": (["p_partkey", "p_size"], ["p_brand", "p_type"], []),
    "lineitem": (
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        ["l_returnflag", "l_linestatus"],
        ["l_shipdate"],
    ),
    # events: integer/string columns only — ts is TIMESTAMP(NANOS) in the
    # raw parquet (engine-side normalization is catalog.load's job, and
    # DuckDB reads the nanos directly: deliberately out of fuzz scope),
    # value is a double (excluded like all doubles)
    "events": (["event_id", "user_id"], ["event_type"], []),
}
# FK joins with join-key names per side
JOINS = [
    ("customer", "orders", "c_custkey", "o_custkey"),
    ("nation", "customer", "n_nationkey", "c_nationkey"),
    ("region", "nation", "r_regionkey", "n_regionkey"),
    ("part", "lineitem", "p_partkey", "l_partkey"),
    ("orders", "lineitem", "o_orderkey", "l_orderkey"),
]
# dim → fact → fact chains for 3-way joins
CHAINS = [
    ("customer", "orders", "lineitem", "c_custkey", "o_custkey", "o_orderkey", "l_orderkey"),
    ("nation", "customer", "orders", "n_nationkey", "c_nationkey", "c_custkey", "o_custkey"),
]


def _domains(sf_dir: str) -> dict:
    """Sample literal pools per column from the real data (seeded)."""
    con = duckdb.connect()
    out = {}
    for t, (ints, strs, dates) in TABLES.items():
        for c in ints + strs + dates:
            rows = con.execute(
                f"SELECT DISTINCT {c} FROM read_parquet('{sf_dir}/{t}.parquet') "
                f"ORDER BY {c} LIMIT 200"
            ).fetchall()
            out[(t, c)] = [r[0] for r in rows if r[0] is not None]
    con.close()
    return out


def _lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if hasattr(v, "isoformat") and not hasattr(v, "hour"):
        return f"DATE '{v.isoformat()}'"
    if hasattr(v, "isoformat"):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    return str(v)


def _predicate(rng: random.Random, t: str, alias: str, domains: dict) -> str:
    ints, strs, dates = TABLES[t]
    col_type = rng.choice(["int", "str"] + (["date"] if dates else []))
    if col_type == "int":
        c = rng.choice(ints)
        v = rng.choice(domains[(t, c)])
        if rng.random() < 0.2:
            v2 = rng.choice(domains[(t, c)])
            lo, hi = sorted((v, v2))
            return f"{alias}.{c} BETWEEN {_lit(lo)} AND {_lit(hi)}"
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{alias}.{c} {op} {_lit(v)}"
    if col_type == "date":
        c = rng.choice(dates)
        v = rng.choice(domains[(t, c)])
        return f"{alias}.{c} {rng.choice(['<', '>='])} {_lit(v)}"
    c = rng.choice(strs)
    pool = domains[(t, c)]
    kind = rng.choice(["eq", "in", "like"])
    if kind == "eq":
        return f"{alias}.{c} = {_lit(rng.choice(pool))}"
    if kind == "in":
        vals = rng.sample(pool, min(3, len(pool)))
        return f"{alias}.{c} IN ({', '.join(_lit(v) for v in vals)})"
    prefix = str(rng.choice(pool))[:2].replace("'", "''").replace("%", "").replace("_", "")
    return f"{alias}.{c} LIKE '{prefix}%'"


def _subquery_predicate(rng: random.Random, t: str, alias: str, domains: dict) -> str | None:
    """Semi/anti-join shape via [NOT] IN (SELECT fk ...) or correlated
    [NOT] EXISTS — the two decorrelation paths engines plan differently."""
    for lt, rt, lk, rk in JOINS:
        if lt == t:
            inner_pred = _predicate(rng, rt, "s", domains)
            neg = "NOT " if rng.random() < 0.3 else ""
            if rng.random() < 0.4:
                # orders→lineitem additionally carries a correlated
                # DATE-ARITHMETIC residual (the TPC-H Q4/Q21 lateness
                # shape, q203/q187): a non-equi predicate on the semi/
                # anti join exercises a decorrelation path the pure
                # equi-correlation never does (the residual cannot
                # become part of the hash key)
                residual = ""
                if lt == "orders" and rt == "lineitem" and rng.random() < 0.5:
                    days = rng.choice((30, 60, 90))
                    op = rng.choice((">", "<="))
                    residual = (
                        f" AND s.l_shipdate {op} "
                        f"{alias}.o_orderdate + INTERVAL {days} DAY"
                    )
                return (
                    f"{neg}EXISTS (SELECT 1 FROM {rt} s "
                    f"WHERE s.{rk} = {alias}.{lk} AND {inner_pred}{residual})"
                )
            return (
                f"{alias}.{lk} {neg}IN "
                f"(SELECT s.{rk} FROM {rt} s WHERE {inner_pred})"
            )
    return None


# unique sort key per table (total order tiebreaker for row_number)
UNIQUE_KEY = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "part": "p_partkey",
    "lineitem": None,  # (l_orderkey, l_linenumber) — handled below
    "events": "event_id",
}


def _gen_window_query(rng: random.Random, domains: dict) -> str:
    """Window shapes that stay deterministic under ties:
    - row_number / lag / lead / first_value over a provably-unique
      total order (pk tiebreaker);
    - rank / dense_rank over the sort key alone (rank depends only on
      key values, never on tie order);
    - sum with the default RANGE frame (peers aggregate together, so
      tie order cannot matter) and with an explicit ROWS frame over the
      unique order.
    Frame-default semantics and window null ordering are classic
    engine-divergence areas — every ORDER BY inside OVER() carries an
    explicit NULLS FIRST (Spark ASC defaults nulls-first, DuckDB
    nulls-last; with a RANGE/ROWS frame that changes the VALUES, not
    just the order)."""
    t = rng.choice([x for x in TABLES if UNIQUE_KEY[x]])
    ints, strs, dates = TABLES[t]
    pk = UNIQUE_KEY[t]
    part = rng.choice(strs + ints)
    ordc = rng.choice(ints + dates)
    uniq = f"ORDER BY {ordc} NULLS FIRST, {pk} NULLS FIRST"
    kind = rng.choice(
        ["row_number", "sum_range", "lag", "lead", "rank", "dense_rank",
         "rows_frame", "first_value", "range_frame", "range_following"]
    )
    acol = rng.choice(ints)
    if kind == "row_number":
        win = f"row_number() OVER (PARTITION BY {part} {uniq})"
    elif kind == "sum_range":
        win = (
            f"CAST(sum({acol}) OVER (PARTITION BY {part} "
            f"ORDER BY {ordc} NULLS FIRST) AS BIGINT)"
        )
    elif kind == "lag":
        win = f"lag({acol}) OVER (PARTITION BY {part} {uniq})"
    elif kind == "lead":
        win = f"lead({acol}) OVER (PARTITION BY {part} {uniq})"
    elif kind == "rank":
        win = f"rank() OVER (PARTITION BY {part} ORDER BY {ordc} NULLS FIRST)"
    elif kind == "dense_rank":
        win = f"dense_rank() OVER (PARTITION BY {part} ORDER BY {ordc} NULLS FIRST)"
    elif kind == "rows_frame":
        n = rng.choice([1, 2, 5])
        win = (
            f"CAST(sum({acol}) OVER (PARTITION BY {part} {uniq} "
            f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT)"
        )
    elif kind == "range_frame":
        # explicit value-offset RANGE frame (r7 surface: the drift/ECDF
        # family lives on RANGE semantics) — peers and near-peers
        # aggregate by VALUE distance, so tie order cannot matter; the
        # order column must be a single numeric (both engines require
        # that for value offsets, and int cols here are non-null keys)
        n = rng.choice([1, 5, 100])
        oc = rng.choice(ints)
        win = (
            f"CAST(sum({acol}) OVER (PARTITION BY {part} "
            f"ORDER BY {oc} NULLS FIRST "
            f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT)"
        )
    elif kind == "range_following":
        n = rng.choice([1, 5, 100])
        oc = rng.choice(ints)
        win = (
            f"CAST(sum({acol}) OVER (PARTITION BY {part} "
            f"ORDER BY {oc} NULLS FIRST "
            f"RANGE BETWEEN CURRENT ROW AND {n} FOLLOWING) AS BIGINT)"
        )
    else:  # first_value over the unique total order
        win = (
            f"first_value({acol}) OVER (PARTITION BY {part} {uniq} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
    pred = _predicate(rng, t, "t0", domains)
    return (
        f"SELECT t0.{pk} AS pk, {win} AS w FROM {t} t0 WHERE {pred} "
        f"ORDER BY pk NULLS FIRST, w NULLS FIRST"
    )


def _gen_rank_filter_query(rng: random.Random, domains: dict) -> str:
    """Rank-then-filter (the q147/q42 WindowGroupLimit shape, VERDICT r7
    #7): rn <= k over a partitioned rank. row_number uses the provably
    unique total order; rank/dense_rank depend only on key values so
    the qualifying SET is tie-order-proof either way."""
    t = rng.choice([x for x in TABLES if UNIQUE_KEY[x]])
    ints, strs, dates = TABLES[t]
    pk = UNIQUE_KEY[t]
    part = rng.choice(strs + ints)
    ordc = rng.choice(ints + dates)
    fn = rng.choice(["row_number", "rank", "dense_rank"])
    if fn == "row_number":
        order = f"ORDER BY {ordc} NULLS FIRST, {pk} NULLS FIRST"
    else:
        order = f"ORDER BY {ordc} NULLS FIRST"
    k = rng.choice([1, 2, 5])
    pred = _predicate(rng, t, "t0", domains)
    return (
        f"SELECT pk, rn FROM ("
        f"SELECT t0.{pk} AS pk, {fn}() OVER (PARTITION BY {part} {order}) AS rn "
        f"FROM {t} t0 WHERE {pred}) z WHERE rn <= {k} "
        f"ORDER BY pk NULLS FIRST, rn NULLS FIRST"
    )


def _gen_conditional_agg_query(rng: random.Random, domains: dict) -> str:
    """Conditional aggregates (the q155 contract / q156 share-shift
    shape, VERDICT r7 #7): FILTER (WHERE ...) and CASE-sum rule
    predicates sharing one aggregate pass, optionally compared in
    HAVING. Empty-group semantics are the divergence corner: count
    FILTER is 0, sum/min/max FILTER are NULL — in both engines."""
    t = rng.choice(list(TABLES))
    ints, strs, _dates = TABLES[t]
    gcol = rng.choice(strs + ints)
    acol = rng.choice(ints)
    p1 = _predicate(rng, t, "t0", domains)
    p2 = _predicate(rng, t, "t0", domains)
    aggs = [
        f"CAST(count(*) FILTER (WHERE {p1}) AS BIGINT) AS c1",
        f"CAST(sum(CASE WHEN {p2} THEN 1 ELSE 0 END) AS BIGINT) AS c2",
        f"CAST(sum(t0.{acol}) FILTER (WHERE {p1}) AS BIGINT) AS s1",
        f"min(t0.{acol}) FILTER (WHERE {p2}) AS m1",
        f"max(t0.{acol}) FILTER (WHERE {p1}) AS m2",
        f"CAST(count(DISTINCT t0.{acol}) FILTER (WHERE {p2}) AS BIGINT) AS d1",
    ]
    sel = rng.sample(aggs, rng.randrange(2, 5))
    names = [s.rsplit(" AS ", 1)[1] for s in sel]
    having = ""
    if rng.random() < 0.4:
        having = f" HAVING count(*) FILTER (WHERE {p1}) >= {rng.choice([0, 1, 3])}"
    order = ", ".join(f"{n} NULLS FIRST" for n in ["g"] + names)
    return (
        f"SELECT t0.{gcol} AS g, {', '.join(sel)} FROM {t} t0 "
        f"GROUP BY t0.{gcol}{having} ORDER BY {order}"
    )


def _gen_scalar_subquery_query(rng: random.Random, domains: dict) -> str:
    """Correlated scalar-aggregate subqueries (the q26 shape, where
    decorrelation bugs live — VERDICT r6 #6): a per-outer-row aggregate
    over an FK-correlated inner table, placed either in the SELECT list
    or compared in WHERE. COUNT over an empty correlated group is 0 in
    both engines; max/min yield NULL (NULLS FIRST ordering pins it, and
    a NULL comparison in WHERE is three-valued false in both)."""
    lt, rt, lk, rk = rng.choice(JOINS)
    pk = UNIQUE_KEY[lt]
    inner_pred = _predicate(rng, rt, "s", domains)
    outer_pred = _predicate(rng, lt, "t0", domains)
    if rng.random() < 0.5:  # scalar in SELECT: count / min / max
        agg = rng.choice(
            ["CAST(count(*) AS BIGINT)", f"max(s.{rk})", f"min(s.{rk})"]
        )
        scalar = f"(SELECT {agg} FROM {rt} s WHERE s.{rk} = t0.{lk} AND {inner_pred})"
        return (
            f"SELECT t0.{pk} AS pk, {scalar} AS sub FROM {lt} t0 "
            f"WHERE {outer_pred} ORDER BY pk NULLS FIRST, sub NULLS FIRST"
        )
    # scalar compared in WHERE: count keeps the comparison non-null
    scalar = (
        f"(SELECT CAST(count(*) AS BIGINT) FROM {rt} s "
        f"WHERE s.{rk} = t0.{lk} AND {inner_pred})"
    )
    op = rng.choice([">", ">=", "=", "<"])
    thresh = rng.choice([0, 1, 2, 5])
    return (
        f"SELECT t0.{pk} AS pk FROM {lt} t0 "
        f"WHERE {outer_pred} AND {scalar} {op} {thresh} "
        f"ORDER BY pk NULLS FIRST"
    )


def _gen_window_over_agg_query(rng: random.Random, domains: dict) -> str:
    """Window OVER an aggregate frame (the TPC-H Q15/Q11 shape the r8
    completion wave pinned as q185/q208, swept here across random
    tables/filters): aggregate first, then a frame-wide window on the
    aggregate output, then a filter against the windowed value. The
    divergence corners: empty-over-() windows, ties at the max, and
    integer comparison of a group value against a global total."""
    t = rng.choice(list(TABLES))
    ints, strs, _dates = TABLES[t]
    g = rng.choice(strs + ints)
    a = rng.choice(ints)
    p = _predicate(rng, t, "t0", domains)
    inner = (
        f"SELECT t0.{g} AS g, CAST(sum(t0.{a}) AS BIGINT) AS s, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM {t} t0 "
        f"WHERE {p} GROUP BY t0.{g}"
    )
    variant = rng.random()
    if variant < 0.35:
        # Q15: rows tied at the frame-wide max of the aggregate
        return (
            f"SELECT g, s FROM (SELECT g, s, max(s) OVER () AS mx "
            f"FROM ({inner}) agg) w WHERE s = mx "
            f"ORDER BY g NULLS FIRST, s NULLS FIRST"
        )
    if variant < 0.7:
        # Q11: groups holding more than 1/K of the global total
        # (integer cross-multiplication, no division)
        k = rng.choice((20, 50, 100))
        return (
            f"SELECT g, s, tot FROM (SELECT g, s, "
            f"CAST(sum(s) OVER () AS BIGINT) AS tot FROM ({inner}) agg) w "
            f"WHERE s * {k} > tot "
            f"ORDER BY g NULLS FIRST, s NULLS FIRST, tot NULLS FIRST"
        )
    # top-N of the aggregate by total-order row_number
    n = rng.choice((1, 3, 5))
    return (
        f"SELECT g, s, cnt FROM (SELECT g, s, cnt, row_number() OVER "
        f"(ORDER BY s DESC NULLS LAST, g NULLS FIRST) AS rn "
        f"FROM ({inner}) agg) w WHERE rn <= {n} "
        f"ORDER BY g NULLS FIRST, s NULLS FIRST, cnt NULLS FIRST"
    )


def _gen_share_pair_query(rng: random.Random, domains: dict) -> str:
    """Numerator/denominator share pairs (the TPC-H Q8/Q14 shape,
    q206/q210): a conditional sum and its unconditional total from ONE
    aggregate pass, emitted as an integer pair instead of a division
    (the declared specs' determinism recipe), grouped by a date part
    or category, over a join when one is available."""
    lt, rt, lk, rk = rng.choice(JOINS)
    aliases = [(lt, "t0"), (rt, "t1")]
    from_sql = f"{lt} t0 JOIN {rt} t1 ON t0.{lk} = t1.{rk}"
    # share predicate on either side; group by the other side when
    # possible so the CASE crosses the join boundary
    pt, pa = rng.choice(aliases)
    p = _predicate(rng, pt, pa, domains)
    gt, ga = rng.choice(aliases)
    ints_g, strs_g, dates_g = TABLES[gt]
    if dates_g and rng.random() < 0.5:
        part = rng.choice(("year", "month"))
        gcol = f"CAST({part}({ga}.{rng.choice(dates_g)}) AS INTEGER)"
    else:
        gcol = f"{ga}.{rng.choice(strs_g + ints_g)}"
    at, aa = rng.choice(aliases)
    acol = f"{aa}.{rng.choice(TABLES[at][0])}"
    num_den = [
        f"CAST(sum(CASE WHEN {p} THEN {acol} ELSE 0 END) AS BIGINT) AS num",
        f"CAST(sum({acol}) AS BIGINT) AS den",
        f"CAST(count(*) FILTER (WHERE {p}) AS BIGINT) AS ncnt",
        f"CAST(count(*) AS BIGINT) AS dcnt",
    ]
    sel = num_den[:2] if rng.random() < 0.5 else num_den
    names = [s.rsplit(" AS ", 1)[1] for s in sel]
    order = ", ".join(f"{n} NULLS FIRST" for n in ["g"] + names)
    return (
        f"SELECT {gcol} AS g, {', '.join(sel)} FROM {from_sql} "
        f"GROUP BY {gcol} ORDER BY {order}"
    )


def _gen_double_exists_query(rng: random.Random, domains: dict) -> str:
    """EXISTS + NOT EXISTS on the SAME correlated table with
    date-arithmetic residuals (the TPC-H Q21 waiting-supplier shape,
    q187): the two decorrelated semi/anti joins must compose on one
    outer row set, each carrying a non-equi residual the hash key
    cannot absorb. Output is a grouped count so result size stays
    bounded at every SF."""
    days1, days2 = rng.choice((30, 60, 90)), rng.choice((15, 45, 120))
    op1, op2 = rng.choice((">", "<=")), rng.choice((">", "<="))
    p_outer = _predicate(rng, "orders", "t0", domains)
    p1 = _predicate(rng, "lineitem", "s1", domains)
    p2 = _predicate(rng, "lineitem", "s2", domains)
    g = rng.choice(("o_orderstatus", "o_orderpriority"))
    return (
        f"SELECT t0.{g} AS g, CAST(count(*) AS BIGINT) AS cnt "
        f"FROM orders t0 WHERE {p_outer} "
        f"AND EXISTS (SELECT 1 FROM lineitem s1 "
        f"WHERE s1.l_orderkey = t0.o_orderkey AND {p1} "
        f"AND s1.l_shipdate {op1} t0.o_orderdate + INTERVAL {days1} DAY) "
        f"AND NOT EXISTS (SELECT 1 FROM lineitem s2 "
        f"WHERE s2.l_orderkey = t0.o_orderkey AND {p2} "
        f"AND s2.l_shipdate {op2} t0.o_orderdate + INTERVAL {days2} DAY) "
        f"GROUP BY t0.{g} ORDER BY g NULLS FIRST, cnt NULLS FIRST"
    )


def _gen_window_over_window_query(rng: random.Random, domains: dict) -> str:
    """Composed window-over-window (the q217 packing seam, VERDICT r9
    #7): a running sum in window one, then a SECOND window — rank,
    partition max, or lag delta — computed over the first window's
    output. The divergence corners: frame defaults on the composed
    column, rank ties on a derived value, lag at partition heads."""
    t = rng.choice([t for t in TABLES if UNIQUE_KEY[t]])
    ints, strs, _dates = TABLES[t]
    uk = UNIQUE_KEY[t]
    g = rng.choice(strs)
    a = rng.choice(ints)
    p = _predicate(rng, t, "t0", domains)
    inner = (
        f"SELECT t0.{g} AS g, t0.{uk} AS k, "
        f"CAST(sum(t0.{a}) OVER (PARTITION BY t0.{g} ORDER BY t0.{uk} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rs "
        f"FROM {t} t0 WHERE {p}"
    )
    variant = rng.random()
    if variant < 0.4:
        # rank over the running sum, then a group-limit filter
        n = rng.choice((1, 2, 5))
        return (
            f"SELECT g, k, rs FROM (SELECT g, k, rs, row_number() OVER "
            f"(PARTITION BY g ORDER BY rs DESC, k) AS rn FROM ({inner}) w1) w2 "
            f"WHERE rn <= {n} "
            f"ORDER BY g NULLS FIRST, k NULLS FIRST, rs NULLS FIRST"
        )
    if variant < 0.7:
        # rows at the partition max of the running sum (ties possible
        # when the summed column is zero/negative-free prefix-equal)
        return (
            f"SELECT g, k, rs FROM (SELECT g, k, rs, max(rs) OVER "
            f"(PARTITION BY g) AS mx FROM ({inner}) w1) w2 WHERE rs = mx "
            f"ORDER BY g NULLS FIRST, k NULLS FIRST, rs NULLS FIRST"
        )
    # lag delta of the running sum — recovers the per-row contribution;
    # null at partition heads exercises default-vs-explicit lag nulls
    return (
        f"SELECT g, k, rs, rs - lag(rs) OVER (PARTITION BY g ORDER BY k) "
        f"AS delta FROM ({inner}) w1 "
        f"ORDER BY g NULLS FIRST, k NULLS FIRST, rs NULLS FIRST, "
        f"delta NULLS FIRST"
    )


def _gen_group_order_statistic_query(rng: random.Random, domains: dict) -> str:
    """Per-group order-statistic cuts (the q225/q159/q181 family,
    VERDICT r9 #7): cumulative counts over the DISTINCT-value frame,
    then the smallest value whose cumulative count reaches a rational
    cut of the group total — integer cross-multiplication, never
    division. Divergence corners: cumulative frames over grouped
    output, CASE-min interaction, groups smaller than the cut."""
    t = rng.choice(list(TABLES))
    ints, strs, _dates = TABLES[t]
    g = rng.choice(strs)
    a = rng.choice(ints)
    p = _predicate(rng, t, "t0", domains)
    k, j = rng.choice(((10, 1), (10, 3), (4, 1), (2, 1), (5, 2)))
    return (
        f"WITH cts AS (SELECT t0.{g} AS g, t0.{a} AS v, "
        f"CAST(count(*) AS BIGINT) AS cnt FROM {t} t0 WHERE {p} "
        f"GROUP BY t0.{g}, t0.{a}), "
        f"cum AS (SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c, "
        f"CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT) AS n FROM cts) "
        f"SELECT g, min(CASE WHEN c * {k} >= n * {j} THEN v END) AS cutoff, "
        f"CAST(max(n) AS BIGINT) AS n FROM cum GROUP BY g "
        f"ORDER BY g NULLS FIRST, cutoff NULLS FIRST, n NULLS FIRST"
    )


def _gen_keep_first_anti_join_query(rng: random.Random, domains: dict) -> str:
    """Keep-first anti-join span algebra (the q215 substring-removal
    shape, VERDICT r9 #7): a row survives iff NO earlier row (strictly
    smaller unique key) claims the same group value — the Lee et al.
    keep-first rule as a correlated anti join with an INEQUALITY
    residual the hash key cannot absorb. Also generated as the
    equivalent min-owner join, so the two decorrelations cross-check
    each other through the shared seed sweep."""
    t = rng.choice([t for t in TABLES if UNIQUE_KEY[t]])
    ints, strs, _dates = TABLES[t]
    uk = UNIQUE_KEY[t]
    key = rng.choice(strs + [c for c in ints if c != uk])
    g = rng.choice(strs)
    p = _predicate(rng, t, "t0", domains)
    if rng.random() < 0.5:
        # anti-join formulation: an earlier same-key row exists → drop
        return (
            f"SELECT t0.{g} AS g, CAST(count(*) AS BIGINT) AS kept "
            f"FROM {t} t0 WHERE {p} AND NOT EXISTS ("
            f"SELECT 1 FROM {t} s WHERE s.{key} = t0.{key} "
            f"AND s.{uk} < t0.{uk}) "
            f"GROUP BY t0.{g} ORDER BY g NULLS FIRST, kept NULLS FIRST"
        )
    # min-owner formulation of the same rule (owner computed over the
    # UNFILTERED table, so the filter composes after ownership — the
    # ordering trap q215's oracle pins)
    return (
        f"SELECT t0.{g} AS g, CAST(count(*) AS BIGINT) AS kept "
        f"FROM {t} t0 JOIN (SELECT {key} AS k, min({uk}) AS owner "
        f"FROM {t} GROUP BY {key}) own "
        f"ON t0.{key} = own.k AND t0.{uk} = own.owner "
        f"WHERE {p} "
        f"GROUP BY t0.{g} ORDER BY g NULLS FIRST, kept NULLS FIRST"
    )


def _gen_outer_join_window_query(rng: random.Random, domains: dict) -> str:
    """Outer-join-over-window (VERDICT r10 #8): the q184/TPC-H Q13
    LEFT-join-preserving-empty-groups pattern COMPOSED with a window
    cut over the per-key counts. The fact-side predicate goes in the
    ON clause (a WHERE would delete the empty matches the outer join
    exists to keep), count(fact_col) yields 0 — not NULL, not a lost
    row — for customers/nations/parts with no matches, and THEN a
    rank/histogram/argmax layer runs over a column whose zeros only
    exist if both engines preserved them. Divergence corners: zero
    groups competing in rank ties, the histogram's n=0 bucket, and
    dense_rank over a derived count."""
    lt, rt, lk, rk = rng.choice(JOINS)
    uk = UNIQUE_KEY[lt]  # every JOINS left side joins on its PK
    strs = TABLES[lt][1]
    g = rng.choice(strs)
    fact_int = rng.choice(TABLES[rt][0])
    on = f"t0.{lk} = t1.{rk}"
    if rng.random() < 0.7:  # the ON-clause trap, most of the time
        on = f"{on} AND {_predicate(rng, rt, 't1', domains)}"
    dim_where = (
        f" WHERE {_predicate(rng, lt, 't0', domains)}"
        if rng.random() < 0.4
        else ""
    )
    per = (
        f"SELECT t0.{uk} AS k, t0.{g} AS g, "
        f"CAST(count(t1.{fact_int}) AS BIGINT) AS n "
        f"FROM {lt} t0 LEFT JOIN {rt} t1 ON {on}{dim_where} "
        f"GROUP BY t0.{uk}, t0.{g}"
    )
    variant = rng.random()
    if variant < 0.4:
        # rank filter over the counts: zero-match keys must compete
        lim = rng.choice((1, 3, 5))
        order = rng.choice((f"n DESC, k", f"n ASC, k"))
        return (
            f"SELECT g, k, n FROM (SELECT g, k, n, row_number() OVER "
            f"(PARTITION BY g ORDER BY {order}) AS rn FROM ({per}) p) x "
            f"WHERE rn <= {lim} "
            f"ORDER BY g NULLS FIRST, k NULLS FIRST, n NULLS FIRST"
        )
    if variant < 0.7:
        # the Q13 histogram proper: distribution of counts incl. n=0
        return (
            f"SELECT n, CAST(count(*) AS BIGINT) AS keys_at "
            f"FROM ({per}) p GROUP BY n "
            f"ORDER BY n NULLS FIRST, keys_at NULLS FIRST"
        )
    # dense_rank argmax with ties kept: every key at the group's
    # min/max count survives (no arbitrary tie-break — determinism
    # comes from returning ALL tied rows)
    dirn = rng.choice(("DESC", "ASC"))
    return (
        f"SELECT g, k, n FROM (SELECT g, k, n, dense_rank() OVER "
        f"(PARTITION BY g ORDER BY n {dirn}) AS dr FROM ({per}) p) x "
        f"WHERE dr = 1 "
        f"ORDER BY g NULLS FIRST, k NULLS FIRST, n NULLS FIRST"
    )


def _gen_correlated_range_exists_query(rng: random.Random, domains: dict) -> str:
    """Correlated-aggregate-over-interval (VERDICT r11 #8): the
    q105/q144 value-offset RANGE-frame shapes COMPOSED with [NOT]
    EXISTS. The semi/anti join decides WHICH rows exist before the
    window runs, so frame contents depend on the correlation — the
    divergence corners are RANGE peers at the semi-join boundary
    (a row admitted by EXISTS whose frame neighbors were rejected),
    NULL ordering inside the frame, and the decorrelation rewrite
    interacting with the window's required sort. All aggregates are
    exact-integer; ties aggregate together under RANGE so tie order
    cannot matter."""
    lt, rt, lk, rk = rng.choice(JOINS)
    ints, strs, _dates = TABLES[lt]
    pk = UNIQUE_KEY[lt]
    acol = rng.choice(ints)
    oc = rng.choice(ints)
    part = rng.choice(strs)
    quant = rng.choice(("EXISTS", "NOT EXISTS"))
    p_fact = _predicate(rng, rt, "s1", domains)
    p_dim = (
        f"{_predicate(rng, lt, 't0', domains)} AND " if rng.random() < 0.4 else ""
    )
    n = rng.choice((1, 5, 100))
    variant = rng.random()
    if variant < 0.4:
        frame = f"RANGE BETWEEN {n} PRECEDING AND CURRENT ROW"
        win = f"CAST(sum(t0.{acol}) OVER (PARTITION BY t0.{part} ORDER BY t0.{oc} NULLS FIRST {frame}) AS BIGINT)"
    elif variant < 0.7:
        frame = f"RANGE BETWEEN CURRENT ROW AND {n} FOLLOWING"
        win = f"CAST(count(*) OVER (PARTITION BY t0.{part} ORDER BY t0.{oc} NULLS FIRST {frame}) AS BIGINT)"
    else:
        frame = f"RANGE BETWEEN {n} PRECEDING AND {n} FOLLOWING"
        agg = rng.choice(("min", "max"))
        win = f"{agg}(t0.{acol}) OVER (PARTITION BY t0.{part} ORDER BY t0.{oc} NULLS FIRST {frame})"
    inner = (
        f"SELECT t0.{pk} AS k, t0.{part} AS g, t0.{oc} AS o, {win} AS w "
        f"FROM {lt} t0 WHERE {p_dim}{quant} "
        f"(SELECT 1 FROM {rt} s1 WHERE s1.{rk} = t0.{lk} AND {p_fact})"
    )
    if rng.random() < 0.3:
        # a second correlated quantifier OVER the windowed result: the
        # outer EXISTS sees a derived column the optimizer must not
        # push below the window
        return (
            f"SELECT k, g, o, w FROM ({inner}) x "
            f"WHERE EXISTS (SELECT 1 FROM {rt} s2 WHERE s2.{rk} = x.k) "
            f"ORDER BY k NULLS FIRST, g NULLS FIRST, o NULLS FIRST, w NULLS FIRST"
        )
    return (
        f"SELECT k, g, o, w FROM ({inner}) x "
        f"ORDER BY k NULLS FIRST, g NULLS FIRST, o NULLS FIRST, w NULLS FIRST"
    )


def _gen_setop_query(rng: random.Random, domains: dict) -> str:
    """INTERSECT / EXCEPT nesting (VERDICT r6 #6): set-op DISTINCT
    semantics and duplicate elimination order are engine-internal; the
    explicit parens pin associativity so only semantics can diverge."""
    t = rng.choice(list(TABLES))
    ints, strs, _dates = TABLES[t]
    c = rng.choice(ints + strs)

    def leg() -> str:
        p = _predicate(rng, t, "t0", domains)
        return f"SELECT t0.{c} AS v FROM {t} t0 WHERE {p}"

    ops = ["INTERSECT", "EXCEPT", "UNION"]
    if rng.random() < 0.5:
        body = f"({leg()} {rng.choice(ops)} {leg()})"
    else:  # nested: ((A op B) op C)
        body = f"(({leg()} {rng.choice(ops)} {leg()}) {rng.choice(ops)} {leg()})"
    return f"SELECT v FROM {body} u ORDER BY v NULLS FIRST"


def _gen_grouping_sets_over_window_query(rng: random.Random, domains: dict) -> str:
    """r13 family (VERDICT r12 #9): GROUPING SETS / ROLLUP / CUBE over
    a WINDOWED subquery — the super-aggregate rows aggregate a column
    that was itself produced by a window function, so the engines must
    agree on window evaluation BEFORE grouping-set expansion AND on
    the null-row semantics afterwards (the q62 grouping surface
    composed with the q11/q217 window seam). Window kinds restricted
    to the tie-deterministic set: rank / dense_rank / default-RANGE
    sum (peers aggregate together) / row_number over a pk-tiebroken
    unique order."""
    t = rng.choice([x for x in TABLES if UNIQUE_KEY[x]])
    ints, strs, dates = TABLES[t]
    pk = UNIQUE_KEY[t]
    g1 = rng.choice(strs + ints)
    g2 = rng.choice([c for c in strs + ints if c != g1])
    ordc = rng.choice(ints + dates)
    acol = rng.choice(ints)
    kind = rng.choice(["rank", "dense_rank", "sum_range", "row_number"])
    if kind == "rank":
        win = f"rank() OVER (PARTITION BY t0.{g1} ORDER BY t0.{ordc} NULLS FIRST)"
    elif kind == "dense_rank":
        win = (
            f"dense_rank() OVER (PARTITION BY t0.{g1} "
            f"ORDER BY t0.{ordc} NULLS FIRST)"
        )
    elif kind == "sum_range":
        win = (
            f"CAST(sum(t0.{acol}) OVER (PARTITION BY t0.{g1} "
            f"ORDER BY t0.{ordc} NULLS FIRST) AS BIGINT)"
        )
    else:
        win = (
            f"row_number() OVER (PARTITION BY t0.{g1} "
            f"ORDER BY t0.{ordc} NULLS FIRST, t0.{pk} NULLS FIRST)"
        )
    pred = _predicate(rng, t, "t0", domains)
    gs = rng.choice(
        [
            "ROLLUP (g1, g2)",
            "CUBE (g1, g2)",
            "GROUPING SETS ((g1, g2), (g1), ())",
            "GROUPING SETS ((g1), (g2), ())",
        ]
    )
    return (
        f"SELECT g1, g2, CAST(count(*) AS BIGINT) AS cnt, "
        f"CAST(sum(w) AS BIGINT) AS sw, min(w) AS mnw, max(w) AS mxw "
        f"FROM (SELECT t0.{g1} AS g1, t0.{g2} AS g2, {win} AS w "
        f"FROM {t} t0 WHERE {pred}) v "
        f"GROUP BY {gs} "
        f"ORDER BY g1 NULLS FIRST, g2 NULLS FIRST, cnt NULLS FIRST, "
        f"sw NULLS FIRST, mnw NULLS FIRST, mxw NULLS FIRST"
    )


def _gen_distinct_agg_join_query(rng: random.Random, domains: dict) -> str:
    """r14 family (VERDICT r13 #7 raise): DISTINCT aggregates under
    join fan-out. An FK join duplicates one side's rows per matching
    row of the other, so the engines must agree on duplicate
    elimination AFTER the join, on NULL exclusion from the DISTINCT
    set, and on the conditional count(DISTINCT CASE WHEN ... END)
    form (a non-matching row yields NULL, which the DISTINCT count
    must NOT count — and a LEFT JOIN's unmatched rows put the whole
    group under a NULL key)."""
    lt, rt, lk, rk = rng.choice(JOINS)
    how = rng.choice(["JOIN", "LEFT JOIN"])
    g = rng.choice(TABLES[rt][1] + TABLES[rt][0])
    dcol = rng.choice(TABLES[lt][0])
    cpred = _predicate(rng, lt, "t0", domains)
    where = (
        f" WHERE {_predicate(rng, lt, 't0', domains)}"
        if rng.random() < 0.6
        else ""
    )
    return (
        f"SELECT t1.{g} AS g, "
        f"CAST(count(DISTINCT t0.{dcol}) AS BIGINT) AS cd, "
        f"CAST(sum(DISTINCT t0.{dcol}) AS BIGINT) AS sd, "
        f"CAST(count(DISTINCT CASE WHEN {cpred} THEN t0.{dcol} END) "
        f"AS BIGINT) AS ccd, "
        f"CAST(count(*) AS BIGINT) AS cnt "
        f"FROM {lt} t0 {how} {rt} t1 ON t0.{lk} = t1.{rk}{where} "
        f"GROUP BY t1.{g} "
        f"ORDER BY g NULLS FIRST, cd NULLS FIRST, sd NULLS FIRST, "
        f"ccd NULLS FIRST, cnt NULLS FIRST"
    )


def _gen_correlated_under_outer_join_query(
    rng: random.Random, domains: dict
) -> str:
    """r15 family (VERDICT r14 #7): correlated subqueries evaluated
    over the NULL-EXTENDED side of an outer join, and EXISTS used as a
    VALUE (inside CASE in the select list) rather than a WHERE
    predicate — the two places where decorrelation must preserve
    null-extension semantics, the classic cross-engine divergence the
    other families don't reach. Variants:

    - the COUNT-bug shape: a correlated count(*) whose correlation key
      comes from the preserved-row side — an unmatched row correlates
      on NULL, the subquery is empty, and the count must be 0 via the
      empty aggregate, never null-extended away (a naive decorrelation
      to LEFT JOIN + count(col) yields NULL — the textbook bug);
    - a correlated scalar sum/min/max over the same null-extended key
      (empty group → NULL, surfaced through coalesce so the total
      order is stable);
    - EXISTS-in-CASE as a grouped value: the CASE distinguishes
      unmatched rows (key IS NULL) from matched-but-EXISTS-false, so a
      decorrelation that conflates the two flips the grouped sum;
    - NOT EXISTS in CASE over an ungrouped projection.

    The outer join's ON clause carries an extra right-side predicate
    half the time to fabricate unmatched rows at real density."""
    a, b, c, k1l, k1r, k2l, k2r = rng.choice(CHAINS)
    on = f"t0.{k1l} = t1.{k1r}"
    if rng.random() < 0.5:
        on += f" AND {_predicate(rng, b, 't1', domains)}"
    spred = (
        f" AND {_predicate(rng, c, 's', domains)}"
        if rng.random() < 0.5
        else ""
    )
    variant = rng.random()
    if variant < 0.3:
        sub = (
            f"(SELECT CAST(count(*) AS BIGINT) FROM {c} s "
            f"WHERE s.{k2r} = t1.{k2l}{spred})"
        )
        body = (
            f"SELECT t0.{k1l} AS k, t1.{k1r} AS jk, {sub} AS sub_cnt "
            f"FROM {a} t0 LEFT JOIN {b} t1 ON {on}"
        )
        order = ["k", "jk", "sub_cnt"]
    elif variant < 0.55:
        agg = rng.choice(["sum", "min", "max"])
        icol = rng.choice(TABLES[c][0])
        sub = (
            f"(SELECT CAST({agg}(s.{icol}) AS BIGINT) FROM {c} s "
            f"WHERE s.{k2r} = t1.{k2l}{spred})"
        )
        body = (
            f"SELECT t0.{k1l} AS k, t1.{k1r} AS jk, "
            f"coalesce({sub}, -1) AS sub_v "
            f"FROM {a} t0 LEFT JOIN {b} t1 ON {on}"
        )
        order = ["k", "jk", "sub_v"]
    elif variant < 0.85:
        g = rng.choice(TABLES[a][1])
        flag = (
            f"CASE WHEN t1.{k2l} IS NULL THEN -1 "
            f"WHEN EXISTS (SELECT 1 FROM {c} s "
            f"WHERE s.{k2r} = t1.{k2l}{spred}) THEN 1 ELSE 0 END"
        )
        body = (
            f"SELECT t0.{g} AS g, CAST(sum({flag}) AS BIGINT) AS f_sum, "
            f"count(*) AS cnt FROM {a} t0 LEFT JOIN {b} t1 ON {on} "
            f"GROUP BY t0.{g}"
        )
        order = ["g", "f_sum", "cnt"]
    else:
        flag = (
            f"CASE WHEN NOT EXISTS (SELECT 1 FROM {c} s "
            f"WHERE s.{k2r} = t1.{k2l}{spred}) THEN 'none' ELSE 'some' END"
        )
        body = (
            f"SELECT t0.{k1l} AS k, t1.{k1r} AS jk, {flag} AS tag "
            f"FROM {a} t0 LEFT JOIN {b} t1 ON {on}"
        )
        order = ["k", "jk", "tag"]
    ordsql = ", ".join(f"{x} NULLS FIRST" for x in order)
    return f"{body} ORDER BY {ordsql}"


def _gen_query(rng: random.Random, domains: dict) -> str:
    shape = rng.random()
    if shape < 0.055:  # INTERSECT/EXCEPT/UNION nesting
        return _gen_setop_query(rng, domains)
    if shape < 0.125:  # correlated scalar subqueries (q26 shape)
        return _gen_scalar_subquery_query(rng, domains)
    if shape < 0.215:  # window functions over a single table
        return _gen_window_query(rng, domains)
    if shape < 0.272:  # rank-then-filter (WindowGroupLimit shape)
        return _gen_rank_filter_query(rng, domains)
    if shape < 0.329:  # conditional aggregates (contract predicates)
        return _gen_conditional_agg_query(rng, domains)
    if shape < 0.386:  # window over aggregate (Q15/Q11 — q185/q208)
        return _gen_window_over_agg_query(rng, domains)
    if shape < 0.443:  # num/den share pairs (Q8/Q14 — q206/q210)
        return _gen_share_pair_query(rng, domains)
    if shape < 0.481:  # EXISTS + NOT EXISTS residuals (Q21 — q187)
        return _gen_double_exists_query(rng, domains)
    # the three r10-born families at full core density (VERDICT r10 #8)
    if shape < 0.538:  # window over window (q217 packing seam)
        return _gen_window_over_window_query(rng, domains)
    if shape < 0.595:  # per-group order-statistic cut (q225/q159/q181)
        return _gen_group_order_statistic_query(rng, domains)
    if shape < 0.652:  # keep-first anti-join span algebra (q215)
        return _gen_keep_first_anti_join_query(rng, domains)
    if shape < 0.709:  # outer-join-over-window (q184/Q13 + rank cut)
        return _gen_outer_join_window_query(rng, domains)
    if shape < 0.766:  # correlated RANGE-frame + EXISTS (r12, q105/q144)
        return _gen_correlated_range_exists_query(rng, domains)
    if shape < 0.823:  # grouping sets over window (r13, VERDICT r12 #9)
        return _gen_grouping_sets_over_window_query(rng, domains)
    if shape < 0.873:  # DISTINCT aggregates under join fan-out (r14)
        return _gen_distinct_agg_join_query(rng, domains)
    if shape < 0.933:  # correlated-under-outer-join / EXISTS-in-CASE (r15)
        return _gen_correlated_under_outer_join_query(rng, domains)
    if shape < 0.955:  # single table
        t = rng.choice(list(TABLES))
        aliases = [(t, "t0")]
        from_sql = f"{t} t0"
    elif shape < 0.978:  # FK pair
        lt, rt, lk, rk = rng.choice(JOINS)
        how = rng.choice(["JOIN", "LEFT JOIN", "LEFT JOIN", "FULL OUTER JOIN"])
        aliases = [(lt, "t0"), (rt, "t1")]
        on = f"t0.{lk} = t1.{rk}"
        # the q184/TPC-H Q13 trap: a filter on the preserved-row side
        # belongs in the OUTER join's ON clause (a WHERE would delete
        # the very empty matches the outer join exists to keep) — the
        # engines must agree on join-predicate vs post-filter semantics
        if how != "JOIN" and rng.random() < 0.5:
            on = f"{on} AND {_predicate(rng, rt, 't1', domains)}"
        from_sql = f"{lt} t0 {how} {rt} t1 ON {on}"
    else:  # 3-way chain
        a, b, c, k1l, k1r, k2l, k2r = rng.choice(CHAINS)
        aliases = [(a, "t0"), (b, "t1"), (c, "t2")]
        from_sql = (
            f"{a} t0 JOIN {b} t1 ON t0.{k1l} = t1.{k1r} "
            f"JOIN {c} t2 ON t1.{k2l} = t2.{k2r}"
        )

    preds = [
        _predicate(rng, t, a, domains)
        for t, a in aliases
        for _ in range(rng.randrange(0, 2))
    ]
    # [NOT] EXISTS / [NOT] IN against t0 — on join shapes too, where the
    # decorrelated semi/anti-join has to compose with the explicit joins
    if rng.random() < 0.25:
        sub = _subquery_predicate(rng, aliases[0][0], aliases[0][1], domains)
        if sub:
            preds.append(sub)
    where = f" WHERE {' AND '.join(preds)}" if preds else ""

    if rng.random() < 0.5:  # grouped aggregate (sometimes with HAVING)
        gt, ga = rng.choice(aliases)
        ints, strs, _ = TABLES[gt]
        dates = TABLES[gt][2]
        # date-part grouping (the TPC-H Q7/Q8/Q9/Q14 bucket shape):
        # year()/month() return INT in Spark but BIGINT in DuckDB, so
        # the shared text must carry the INTEGER cast — exactly the
        # recipe the declared specs use; the fuzzer sweeps it across
        # random join/filter contexts
        if dates and rng.random() < 0.3:
            part = rng.choice(("year", "month"))
            gcol = f"CAST({part}({ga}.{rng.choice(dates)}) AS INTEGER)"
        else:
            gcol = f"{ga}.{rng.choice(strs + ints)}"
        at, aa = rng.choice(aliases)
        acol = f"{aa}.{rng.choice(TABLES[at][0])}"
        aggs = [
            "count(*) AS cnt",
            f"CAST(sum({acol}) AS BIGINT) AS s",
            f"min({acol}) AS mn",
            f"max({acol}) AS mx",
            f"CAST(count(DISTINCT {acol}) AS BIGINT) AS dv",
        ]
        sel = [f"{gcol} AS g"] + rng.sample(aggs, rng.randrange(1, 4))
        having = (
            f" HAVING count(*) > {rng.choice([1, 3, 10])}"
            if rng.random() < 0.3
            else ""
        )
        g2_pool = [
            f"{a}.{c}" for t2, a in aliases for c in TABLES[t2][1]
            # a DUPLICATE grouping expression in ROLLUP(x, x) is
            # genuinely ambiguous (which instance is nulled at level 1?)
            # and the engines disagree — found by this fuzzer; keep the
            # grammar to distinct expressions
            if f"{a}.{c}" != gcol
        ]
        if rng.random() < 0.35 and g2_pool:
            # grouping sets: super-aggregate null rows are a classic
            # cross-engine divergence area (null vs grouping flags).
            # ROLLUP / CUBE / explicit GROUPING SETS all exercised; the
            # explicit form always includes () so the empty-input
            # divergence checker's one-grand-total-row shape holds for
            # every variant.
            g2 = rng.choice(g2_pool)
            gs = rng.choice(
                [
                    f"ROLLUP ({gcol}, {g2})",
                    f"CUBE ({gcol}, {g2})",
                    f"GROUPING SETS (({gcol}, {g2}), ({gcol}), ())",
                    f"GROUPING SETS (({gcol}), ({g2}), ())",
                ]
            )
            sel = [f"{gcol} AS g", f"{g2} AS g2"] + sel[1:]
            body = (
                f"SELECT {', '.join(sel)} FROM {from_sql}{where} "
                f"GROUP BY {gs}{having}"
            )
            order_cols = ["g", "g2"]
        else:
            body = (
                f"SELECT {', '.join(sel)} FROM {from_sql}{where} "
                f"GROUP BY {gcol}{having}"
            )
            order_cols = ["g"]
    else:  # projection (sometimes a UNION ALL of two predicate slices)
        cols = []
        for t, a in aliases:
            ints, strs, dates = TABLES[t]
            for c in rng.sample(ints, min(rng.randrange(0, 3), len(ints))):
                # scalar fns over ints: abs / arithmetic (null-safe in
                # both engines: null in -> null out)
                expr = rng.choice(
                    [f"{a}.{c}", f"abs({a}.{c} - {rng.randrange(100)})",
                     f"{a}.{c} + {rng.randrange(10)}", f"{a}.{c} % 7",
                     f"{a}.{c} & {rng.randrange(1, 64)}",
                     f"{a}.{c} | {rng.randrange(1, 64)}",
                     f"CASE WHEN {a}.{c} % 2 = 0 THEN {a}.{c} ELSE -{a}.{c} END",
                     f"coalesce(nullif({a}.{c}, {rng.randrange(50)}), -1)"]
                )
                cols.append(f"{expr} AS {a}_{c}")
            for c in rng.sample(strs, min(rng.randrange(0, 3), len(strs))):
                # portable string fns only: identical name+semantics in
                # Spark and DuckDB (position via the ANSI `IN` form;
                # int-returning fns cast to BIGINT on both sides by
                # construction since Spark returns INT, DuckDB BIGINT)
                expr = rng.choice(
                    [f"{a}.{c}", f"upper({a}.{c})", f"lower({a}.{c})",
                     f"CAST(length({a}.{c}) AS BIGINT)",
                     f"substr({a}.{c}, 1, {rng.randrange(1, 6)})",
                     f"{a}.{c} || '#' || {a}.{c}",
                     f"replace({a}.{c}, 'a', '@')",
                     f"trim(substr({a}.{c}, 1, {rng.randrange(2, 8)}))",
                     f"reverse({a}.{c})",
                     f"lpad({a}.{c}, {rng.randrange(5, 15)}, '.')",
                     f"rpad({a}.{c}, {rng.randrange(5, 15)}, '.')",
                     f"repeat(substr({a}.{c}, 1, 2), {rng.randrange(1, 4)})",
                     f"CAST(position('{rng.choice('aeiou')}' IN {a}.{c}) AS BIGINT)",
                     f"concat_ws('-', {a}.{c}, {a}.{c})",
                     f"ltrim(rtrim({a}.{c}))"]
                )
                cols.append(f"{expr} AS {a}_{c}")
            for c in rng.sample(dates, min(rng.randrange(0, 2), len(dates))):
                expr = rng.choice(
                    [f"{a}.{c}", f"CAST(year({a}.{c}) AS BIGINT)",
                     f"CAST(month({a}.{c}) AS BIGINT)"]
                )
                cols.append(f"{expr} AS {a}_{c}")
        if not cols:  # ensure at least one column
            t, a = aliases[0]
            c = TABLES[t][0][0]
            cols.append(f"{a}.{c} AS {a}_{c}")
        body = f"SELECT {', '.join(cols)} FROM {from_sql}{where}"
        order_cols = [c.rsplit(" AS ", 1)[1] for c in cols]
        if len(aliases) == 1 and rng.random() < 0.2:
            t, a = aliases[0]
            p2 = _predicate(rng, t, a, domains)
            body = (
                f"SELECT * FROM ({body} UNION ALL "
                f"SELECT {', '.join(cols)} FROM {from_sql} WHERE {p2}) u"
            )

    order = ", ".join(f"{c} NULLS FIRST" for c in order_cols)
    limit = f" LIMIT {rng.choice([50, 500])}" if rng.random() < 0.3 else ""
    return f"{body} ORDER BY {order}{limit}"


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def _make_env(spark, sf_dir: str):
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _is_known_rollup_empty_divergence(
    sql: str, got: pd.DataFrame, want: pd.DataFrame
) -> bool:
    """GROUP BY ROLLUP over an EMPTY input: the SQL standard's ()
    grouping set aggregates globally and yields ONE grand-total row
    (DuckDB and PostgreSQL do this); Spark yields NOTHING. Found by
    this fuzzer (seed 55001177); treated as a documented engine
    divergence, not a failure.

    DIRECTION MATTERS (ADVICE r5): the divergence is specifically
    Spark-empty / DuckDB-one-grand-total-row. A Spark regression
    emitting a spurious all-null row where DuckDB correctly returns
    nothing must FAIL, not be classified as known.

    Applies to every grouping-set spelling whose set list includes the
    () set: ROLLUP, CUBE, and the explicit GROUPING SETS form (the
    grammar always includes () there)."""
    if not any(k in sql for k in ("ROLLUP", "CUBE", "GROUPING SETS")):
        return False
    if len(got) != 0 or len(want) != 1:  # got=Spark, want=DuckDB
        return False
    row = want.iloc[0]
    # the grand-total row: every group key null-ish, every count zero
    return all(str(v) in ("None", "nan", "NaT", "<NA>", "0", "0.0") for v in row)


def _run_fuzz(spark, sf_dir: str, n_queries: int, seed: int) -> None:
    con = _make_env(spark, sf_dir)
    try:
        rng = random.Random(seed)
        domains = _domains(sf_dir)
        failures = []
        known = 0
        for i in range(n_queries):
            sql = _gen_query(rng, domains)
            got = _normalize(spark.sql(sql).toPandas())
            want = _normalize(con.execute(sql).fetch_df())
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                if _is_known_rollup_empty_divergence(sql, got, want):
                    known += 1
                    continue
                failures.append((i, sql, str(e).splitlines()[0]))
        assert not failures, "\n".join(
            f"[{i}] {sql}\n    {err}" for i, sql, err in failures[:5]
        ) + f"\n({len(failures)}/{n_queries} diverged, {known} known-divergent)"
    finally:
        con.close()


def test_differential_fuzz(spark):
    _run_fuzz(spark, SF_SMOKE, N_QUERIES, SEED)


def test_differential_fuzz_sf001(spark):
    """A second, independently-seeded sweep at 10x the data (sf0.01):
    tie-heavy groups, wider value domains, and fuller join fan-out
    reach divergence classes (overflow promotion, tie ordering under
    LIMIT-free total sorts) that the sf0.001 corpus can't populate."""
    _run_fuzz(spark, SF_CORRECT, 40, SEED + 1)

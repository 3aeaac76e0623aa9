"""Property-based tests (hypothesis): the custom join operators against
brute-force reference implementations on arbitrary inputs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from airflow_etl_spark.operators import joins

_key = st.sampled_from(["k1", "k2", "k3"])
_ts = st.integers(min_value=0, max_value=50)


@st.composite
def _asof_case(draw):
    left = draw(st.lists(st.tuples(_key, _ts), min_size=0, max_size=12))
    # right rows must be unique per (key, ts) — the operator's contract
    right = draw(
        st.lists(st.tuples(_key, _ts), min_size=0, max_size=12, unique=True)
    )
    return left, right


def _brute_asof(left, right, strict):
    out = []
    for k, t in left:
        cands = [
            rt for rk, rt in right if rk == k and (rt < t if strict else rt <= t)
        ]
        out.append((k, t, max(cands) if cands else None))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(case=_asof_case(), strict=st.booleans())
def test_asof_join_matches_brute_force(spark, case, strict):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)] or [("zz", -1, -1)],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [(k, t, float(t)) for k, t in right_rows] or [("zz", -99, 0.0)],
        "k string, t long, rv double",
    )
    got = sorted(
        (r.k, r.t, r.as_of_ts)
        for r in joins.asof_join(
            left, right, ["k"], "t", "t", strict=strict, how="left"
        ).collect()
    )
    want = _brute_asof(
        [(k, t) for k, t, _ in left.collect()],
        [(k, t) for k, t, _ in right.collect()],
        strict,
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False), max_size=15
    ),
    ranges=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
            st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
        ),
        max_size=5,
    ),
    width=st.sampled_from([7.0, 25.0, 120.0]),
)
def test_range_join_matches_brute_force(spark, points, ranges, width):
    pdf = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(points)] or [(-1.0, -1)],
        "v double, pid long",
    )
    rdf = spark.createDataFrame(
        [(f"r{i}", min(lo, hi), max(lo, hi)) for i, (lo, hi) in enumerate(ranges)]
        or [("rz", -5.0, -4.0)],
        "band string, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.band)
        for r in joins.range_join_bucketed(pdf, rdf, "v", "lo", "hi", width).collect()
    )
    want = sorted(
        (i, f"r{j}")
        for i, v in enumerate(points)
        for j, (lo, hi) in enumerate(ranges)
        if min(lo, hi) <= v < max(lo, hi)
    )
    assert got == want

"""Property test for the shared integer-Lloyd kernel (operators/kmeans.py).

The ANN codebooks and the k-means battery query both ride this kernel,
and every downstream oracle assumes its determinism contract: integer
squared-distance argmin with lowest-cid tie-breaks, half-up integer-mean
updates over a non-negative domain, and emptied clusters carrying their
previous centroid. A pure-Python replay of that contract on
hypothesis-generated corpora must match the Spark result exactly —
independent of DuckDB, so a bug that broke BOTH engine twins the same
way would still be caught here.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wd2sql_spark.operators.kmeans import lloyd_centroids


def _py_lloyd(vecs: dict[int, list[int]], seeds: dict[int, list[int]], iters: int):
    cent = {cid: list(c) for cid, c in seeds.items()}
    dim = len(next(iter(vecs.values())))
    for _ in range(iters):
        members: dict[int, list[int]] = {}
        for vid in sorted(vecs):
            iv = vecs[vid]
            best = None
            for cid in sorted(cent):
                d = sum((a - b) * (a - b) for a, b in zip(iv, cent[cid]))
                if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                    best = (d, cid)
            members.setdefault(best[1], []).append(vid)
        new = {}
        for cid in cent:
            vids = members.get(cid)
            if not vids:
                new[cid] = cent[cid]  # emptied cluster keeps its centroid
                continue
            new[cid] = [
                (2 * sum(vecs[v][d] for v in vids) + len(vids)) // (2 * len(vids))
                for d in range(dim)
            ]
        cent = new
    return cent


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.lists(st.integers(min_value=0, max_value=2_000_000), min_size=4, max_size=4),
        min_size=2,
        max_size=12,
    ),
    k=st.integers(min_value=1, max_value=4),
    iters=st.integers(min_value=1, max_value=3),
)
def test_lloyd_matches_python_reference(_spark, data, k, iters):
    spark = _spark
    vecs = {i: v for i, v in enumerate(data)}
    k = min(k, len(vecs))
    seeds = {i: list(vecs[i]) for i in range(k)}

    vdf = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, iv array<bigint>"
    )
    sdf = spark.createDataFrame(
        [(i, v) for i, v in seeds.items()], "cid long, c array<bigint>"
    )
    got = {
        int(r["cid"]): [int(x) for x in r["c"]]
        for r in lloyd_centroids(vdf, sdf, iters).collect()
    }
    want = _py_lloyd(vecs, seeds, iters)
    assert got == want

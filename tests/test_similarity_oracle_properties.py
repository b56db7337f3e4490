"""Random-input property pin for the similarity family's core numeric
idiom: the floor-scaled exact dot product (sum of FLOOR(x*y*1e12) as
int64, /1e12) behind sim_cosine_topk and every recall audit built on it.

DuckDB-only (no Spark): the registered oracle runs over a hypothesis-
generated embeddings table and must equal a pure-python recompute of the
identical arithmetic — int conversion below 2^53 is exact, sqrt and
division are correctly-rounded IEEE doubles in both engines, and the
top-k tiebreak (cosine DESC, neighbor_id) is deterministic, so full
bitwise agreement is the PASS condition, not a tolerance."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vena_etl_tool_spark.operators.similarity import N_QUERIES, TOP_K
from vena_etl_tool_spark.registry import all_specs

_SPECS = all_specs()

_DIM = 4
# quarter-grid values keep products interesting (exact ties possible via
# duplicate vectors) while staying far from the 2^53 scaled-int ceiling
_component = st.sampled_from([-1.5, -1.0, -0.75, -0.5, 0.0, 0.25, 0.5, 1.0, 1.25])
_vector = st.lists(_component, min_size=_DIM, max_size=_DIM).filter(
    lambda v: any(x != 0.0 for x in v)
)
_corpus = st.lists(_vector, min_size=2, max_size=12)


def _dot_scaled(a: list[float], b: list[float]) -> float:
    return sum(math.floor(x * y * 1e12) for x, y in zip(a, b)) / 1e12


@given(vecs=_corpus)
@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cosine_topk_oracle_matches_python_bitwise(vecs):
    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "vec_id": range(len(vecs)),
            "label": [f"l{i % 3}" for i in range(len(vecs))],
            "embedding": [list(map(float, v)) for v in vecs],
        }
    ).astype({"vec_id": "int64"})
    con.register("embeddings", df)
    got = sorted(
        tuple(r)
        for r in con.execute(_SPECS["sim_cosine_topk"].oracle).fetchall()
    )

    sq = {i: _dot_scaled(v, v) for i, v in enumerate(vecs)}
    expected = []
    for q in range(min(N_QUERIES, len(vecs))):
        scored = []
        for c, v in enumerate(vecs):
            if c == q:
                continue
            cos = _dot_scaled(vecs[q], v) / (math.sqrt(sq[q]) * math.sqrt(sq[c]))
            scored.append((cos, c))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rk, (cos, c) in enumerate(scored[:TOP_K], 1):
            expected.append((q, c, f"l{c % 3}", round(cos, 6), rk))
    # ids, labels and ranks must agree exactly; the rounded cosine to 5e-7
    # (ROUND half-tie conventions may differ; the RANK already proves the
    # unrounded doubles agreed)
    assert [(r[0], r[1], r[2], r[4]) for r in got] == [
        (e[0], e[1], e[2], e[4]) for e in sorted(expected)
    ]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[3] - e[3]) <= 5e-7

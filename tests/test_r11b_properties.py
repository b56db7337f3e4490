"""Property tests pinning the SNM / winnowing ORACLE SQL itself against a
pure-python recompute on hypothesis-generated corpora (DuckDB only — no
Spark session, so these run on arbitrary inputs in milliseconds).

The fixture-based tests (test_r11b_ops.py) close the triangle
Spark == oracle == python on the shipped corpora; these verify the
oracle's semantics hold on ANY corpus: tiny vocabularies (hash ties,
shared k-grams everywhere), sub-k documents, exact duplicates, and
hypothesis-derived prefix clones."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vena_etl_tool_spark.operators.dedup import (
    _SNM_ORACLE,
    _WINNOW_ORACLE,
    SNM_MATCH_PPM,
    SNM_PREFIX_CHARS,
    SNM_SHINGLE_K,
    SNM_WINDOW,
    WINNOW_DF_CAP,
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
)

_VOCAB = ["aa", "ab", "ba", "bb", "ca"]

_doc_strategy = st.lists(
    st.sampled_from(_VOCAB), min_size=1, max_size=24
).map(lambda toks: " ".join(toks))

_corpus_strategy = st.lists(_doc_strategy, min_size=1, max_size=14)

# indices of docs to clone with one appended token (prefix-clone maker)
_clones_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=13), st.sampled_from(_VOCAB)),
    max_size=4,
)

_settings = settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run_oracle(sql: str, texts: list[str]) -> list[tuple]:
    con = duckdb.connect()
    df = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    ).astype({"doc_id": "int64"})
    con.register("documents", df)
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def _build_corpus(texts: list[str], clones) -> list[str]:
    out = list(texts)
    for idx, tok in clones:
        if idx < len(texts):
            out.append(texts[idx] + " " + tok)
    return out


@given(texts=_corpus_strategy, clones=_clones_strategy)
@_settings
def test_snm_oracle_matches_python_on_random_corpora(texts, clones):
    texts = _build_corpus(texts, clones)
    got = _run_oracle(_SNM_ORACLE, texts)

    k = SNM_SHINGLE_K
    sh = {
        i: {
            " ".join(t.split(" ")[j : j + k])
            for j in range(len(t.split(" ")) - k + 1)
        }
        for i, t in enumerate(texts)
    }
    blocks: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for i, t in enumerate(texts):
        blocks[t[:SNM_PREFIX_CHARS]].append((t, i))
    expected = []
    for lst in blocks.values():
        lst.sort()
        for i, (_, da) in enumerate(lst):
            for j in range(i + 1, min(i + SNM_WINDOW, len(lst))):
                db = lst[j][1]
                a, b = sh[da], sh[db]
                uni = len(a | b)
                ppm = len(a & b) * 1_000_000 // uni if uni else 0
                expected.append((da, db, j - i, ppm, ppm >= SNM_MATCH_PPM))
    assert got == sorted(expected)


def _winnow_fps(text: str) -> set[str]:
    toks = text.split(" ")
    kg = [
        hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()
        for i in range(len(toks) - WINNOW_K + 1)
    ]
    return {min(kg[i : i + WINNOW_W]) for i in range(len(kg) - WINNOW_W + 1)}


@given(texts=_corpus_strategy, clones=_clones_strategy)
@_settings
def test_winnowing_oracle_matches_python_on_random_corpora(texts, clones):
    texts = _build_corpus(texts, clones)
    got = _run_oracle(_WINNOW_ORACLE, texts)

    fps = {i: _winnow_fps(t) for i, t in enumerate(texts)}
    df = defaultdict(int)
    for s in fps.values():
        for fp in s:
            df[fp] += 1
    keep = {fp for fp, n in df.items() if 2 <= n <= WINNOW_DF_CAP}
    shared = defaultdict(int)
    by_fp = defaultdict(list)
    for i in sorted(fps):
        for fp in fps[i]:
            if fp in keep:
                by_fp[fp].append(i)
    for members in by_fp.values():
        for x, da in enumerate(members):
            for db in members[x + 1 :]:
                shared[(da, db)] += 1
    expected = [
        (
            da,
            db,
            n,
            len(fps[da]),
            len(fps[db]),
            n * 1_000_000 // min(len(fps[da]), len(fps[db])),
        )
        for (da, db), n in shared.items()
        if n >= WINNOW_MIN_SHARED
    ]
    assert got == sorted(expected)

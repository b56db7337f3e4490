"""Invariant tests for the second r11 work session's operators
(dedup_sorted_neighborhood, dedup_winnowing). Oracle hash checks run in
test_oracle.py / the driver; these recompute BOTH operators end-to-end in
pure python (a third engine) and pin the semantics the hash can't see."""

from __future__ import annotations

import hashlib
from collections import defaultdict

import duckdb

from vena_etl_tool_spark.operators.dedup import (
    SNM_MATCH_PPM,
    SNM_PREFIX_CHARS,
    SNM_SHINGLE_K,
    SNM_WINDOW,
    WINNOW_DF_CAP,
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    dedup_sorted_neighborhood,
    dedup_winnowing,
)


def _docs(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    k = SNM_SHINGLE_K
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_snm_reproduces_from_pure_python(spark, sf_dir):
    """Full-row equality with an independent python recompute: per-block
    sort, sliding window of SNM_WINDOW ranks, exact 4-gram Jaccard ppm."""
    got = {
        (r.doc_a, r.doc_b): (r.rank_gap, r.jaccard_ppm, r.is_match)
        for r in dedup_sorted_neighborhood(spark, sf_dir).collect()
    }
    docs = _docs(sf_dir)
    sh = {did: _shingles(text) for did, text in docs}
    blocks: dict[str, list[tuple[str, int]]] = defaultdict(list)
    for did, text in docs:
        blocks[text[:SNM_PREFIX_CHARS]].append((text, did))
    expected = {}
    for lst in blocks.values():
        lst.sort()
        for i, (_, da) in enumerate(lst):
            for j in range(i + 1, min(i + SNM_WINDOW, len(lst))):
                db = lst[j][1]
                a, b = sh[da], sh[db]
                uni = len(a | b)
                ppm = len(a & b) * 1_000_000 // uni if uni else 0
                expected[(da, db)] = (j - i, ppm, ppm >= SNM_MATCH_PPM)
    assert got == expected
    # candidate volume is bounded by construction: n * (w - 1)
    assert len(got) <= len(docs) * (SNM_WINDOW - 1)


def test_snm_catches_every_seeded_clone_pair(spark, sf_dir):
    """Recall vs the blocking-free truth: every pair whose FULL 4-gram
    Jaccard clears the match threshold must appear in the SNM output as a
    verified match (the clones share long prefixes, so the text sort key
    seats them within the window — the op's recall argument, asserted)."""
    matches = {
        (r.doc_a, r.doc_b)
        for r in dedup_sorted_neighborhood(spark, sf_dir).collect()
        if r.is_match
    }
    docs = _docs(sf_dir)
    sh = {did: _shingles(text) for did, text in docs}
    ids = sorted(sh)
    truth = set()
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            a, b = sh[da], sh[db]
            uni = len(a | b)
            if uni and len(a & b) * 1_000_000 // uni >= SNM_MATCH_PPM:
                truth.add((da, db))
    assert truth, "fixture lost its seeded near-dup clones"
    # SNM emits (lower-rank, higher-rank); truth is (lower-id, higher-id)
    norm = {tuple(sorted(p)) for p in matches}
    assert truth <= norm


def _winnow_fps(text: str) -> set[str]:
    toks = text.split(" ")
    kg = [
        hashlib.md5(" ".join(toks[i : i + WINNOW_K]).encode()).hexdigest()
        for i in range(len(toks) - WINNOW_K + 1)
    ]
    return {min(kg[i : i + WINNOW_W]) for i in range(len(kg) - WINNOW_W + 1)}


def test_winnowing_reproduces_from_pure_python(spark, sf_dir):
    """Full-row equality with an independent python recompute of the MOSS
    pipeline: k-gram md5, window minima over FULL windows only, df cap,
    pair counts, containment ppm."""
    got = {
        (r.doc_a, r.doc_b): (r.n_shared, r.fp_a, r.fp_b, r.containment_ppm)
        for r in dedup_winnowing(spark, sf_dir).collect()
    }
    fps = {did: _winnow_fps(text) for did, text in _docs(sf_dir)}
    df = defaultdict(int)
    for s in fps.values():
        for fp in s:
            df[fp] += 1
    keep = {fp for fp, n in df.items() if 2 <= n <= WINNOW_DF_CAP}
    shared = defaultdict(int)
    ids = sorted(fps)
    by_fp = defaultdict(list)
    for did in ids:
        for fp in fps[did]:
            if fp in keep:
                by_fp[fp].append(did)
    for members in by_fp.values():
        for i, da in enumerate(members):
            for db in members[i + 1 :]:
                shared[(da, db)] += 1
    expected = {
        (da, db): (
            n,
            len(fps[da]),
            len(fps[db]),
            n * 1_000_000 // min(len(fps[da]), len(fps[db])),
        )
        for (da, db), n in shared.items()
        if n >= WINNOW_MIN_SHARED
    }
    assert got == expected
    assert expected, "fixture has no winnowing-detectable near-dup pairs"


def test_winnowing_theorem_on_fixture_clones(spark, sf_dir):
    """The winnowing guarantee: documents sharing a token run of length
    >= k + w - 1 select at least one common fingerprint. The seeded clones
    share prefixes far longer than that, so every clone pair's fingerprint
    sets must intersect (checked via the pure-python helper, which the
    equality test above ties to the operator)."""
    docs = dict(_docs(sf_dir))
    fps = {did: _winnow_fps(text) for did, text in docs.items()}
    ids = sorted(docs)
    run = WINNOW_K + WINNOW_W - 1
    n_clone_pairs = 0
    for i, da in enumerate(ids):
        ta = docs[da].split(" ")
        for db in ids[i + 1 :]:
            tb = docs[db].split(" ")
            pref = 0
            while pref < min(len(ta), len(tb)) and ta[pref] == tb[pref]:
                pref += 1
            if pref >= run:
                n_clone_pairs += 1
                assert fps[da] & fps[db], (da, db, pref)
    assert n_clone_pairs > 0

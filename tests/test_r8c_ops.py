"""Round-8 third session: LSH recall audit, BPE fertility, DSIR weights.

The differential gate hash-proves each against DuckDB at 3 SFs; these
tests add the guarantees the oracle can't: the audit's BLOCKED truth is
compared against a brute-force UNBLOCKED all-pairs truth (the blocking
loss must be zero on the fixtures), fertility is cross-checked against
text_bpe_apply's per-document tokenization (two independent consumers of
the trained vocabulary must agree), and DSIR is rebuilt in pure Python.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import pandas as pd

from vena_etl_tool_spark.operators.dedup import (
    LSH_AUDIT_THRESHOLD,
    dedup_lsh_recall_audit,
)
from vena_etl_tool_spark.operators.textanalysis import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    dsir_importance_weights,
    text_bpe_apply,
    text_bpe_fertility,
)


def _md5_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingle_sets(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    reps = docs.sort_values("doc_id").drop_duplicates("text", keep="first")
    sets = {}
    for r in reps.itertuples():
        w = r.text.split(" ")
        if len(w) < 3:
            continue
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        sets[r.doc_id] = {_md5_h60(s) for s in sh}
    return sets


def test_lsh_audit_blocked_truth_equals_unblocked_bruteforce(spark, sf_dir):
    sets = _shingle_sets(sf_dir)
    ids = sorted(sets)
    n_truth = 0
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if jac >= LSH_AUDIT_THRESHOLD:
                n_truth += 1
    row = dedup_lsh_recall_audit(spark, sf_dir).collect()[0]
    assert row.n_truth == n_truth  # zero blocking loss on the fixture
    # verified pairs are exact >= threshold, so they are a subset of truth
    assert row.n_hits == row.n_verified
    assert row.n_verified <= row.n_candidates
    if row.n_truth:
        assert row.recall_milli == row.n_hits * 1000 // row.n_truth


def test_fertility_agrees_with_bpe_apply(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    per_doc = {
        r.doc_id: (r.n_tok_chars, r.n_tok_bpe)
        for r in text_bpe_apply(spark, sf_dir).collect()
    }
    expect = defaultdict(lambda: [0, 0, 0])
    for r in docs.itertuples():
        chars, bpe = per_doc[r.doc_id]
        agg = expect[(r.lang, r.source)]
        agg[0] += len(r.text.split(" "))
        agg[1] += chars
        agg[2] += bpe
    got = {
        (r.lang, r.source): r for r in text_bpe_fertility(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for k, (n_words, n_chars, n_bpe) in expect.items():
        r = got[k]
        assert (r.n_words, r.n_chars, r.n_bpe_tokens) == (n_words, n_chars, n_bpe)
        assert r.fertility_milli == n_bpe * 1000 // n_words
        assert r.chars_per_token_milli == n_chars * 1000 // n_bpe


def test_dsir_matches_python_reconstruction(spark, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok_rows = []
    for r in docs.itertuples():
        for w in r.text.split(" "):
            tok_rows.append((r.doc_id, r.lang, _md5_h60(w) % DSIR_BUCKETS))
    c_raw = Counter(b for _, _, b in tok_rows)
    c_tgt = Counter(b for _, lg, b in tok_rows if lg == DSIR_TARGET_LANG)
    n_raw = sum(c_raw.values()) + DSIR_BUCKETS
    n_tgt = sum(c_tgt.values()) + DSIR_BUCKETS
    k = n_raw * 1_000_000 // n_tgt
    dev = {
        b: (c_tgt.get(b, 0) + 1) * k // (c_raw[b] + 1) - 1_000_000
        for b in c_raw
    }
    expect = defaultdict(lambda: [0, 0])
    for d, _, b in tok_rows:
        expect[d][0] += 1
        expect[d][1] += dev[b]
    got = {
        r.doc_id: (r.n_tokens, r.weight_ppm, r.ppm_per_token)
        for r in dsir_importance_weights(spark, sf_dir).collect()
    }
    assert set(got) == set(expect)
    for d, (n, w) in expect.items():
        sign = -1 if w < 0 else 1
        assert got[d] == (n, w, sign * (abs(w) // n))
    # the target-language documents should, in aggregate, score higher
    lang = dict(zip(docs.doc_id, docs.lang))
    en = [got[d][2] for d in got if lang[d] == DSIR_TARGET_LANG]
    other = [got[d][2] for d in got if lang[d] != DSIR_TARGET_LANG]
    assert sum(en) / len(en) > sum(other) / len(other)

"""Random-input property pins for the third-r11-session oracles —
DuckDB-only, no Spark session (the test_oracle_properties.py pattern).

The driver gate proves Spark == oracle on the shipped fixtures; these
prove the oracle SQL == the intended mathematics on ANY input, by
brute-force python recompute over hypothesis-generated tables. The span
metric / trim pair additionally asserts the complement identity (kept +
covered = all positions) on every generated corpus."""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from vena_etl_tool_spark.operators.dedup import (
    SNM_MATCH_PPM,
    SNM_PREFIX_CHARS,
    SNM_SHINGLE_K,
    SNM_WINDOW,
    SPAN_K,
)
from vena_etl_tool_spark.operators.analytics import (
    ABC_A_PPM,
    ABC_B_PPM,
    BASKET_CAP,
    BASKET_MIN_SUPPORT,
)
from vena_etl_tool_spark.operators.aggregates import EQD_TILES
from vena_etl_tool_spark.operators.textanalysis import RAKE_TOP_K, STOPWORDS
from vena_etl_tool_spark.registry import all_specs

_SPECS = all_specs()

_settings = settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Tiny vocabulary → long shared runs arise naturally in random docs, so
# the >= SPAN_K-token span machinery and the SNM windows actually bind.
_VOCAB = ["aa", "ab", "ba"]
_doc = st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=24).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=12)

# RAKE needs delimiter tokens interleaved with content words.
_RAKE_VOCAB = ["x", "y", "zz"] + list(STOPWORDS[:3])
_rake_doc = st.lists(st.sampled_from(_RAKE_VOCAB), min_size=1, max_size=20).map(
    " ".join
)
_rake_corpus = st.lists(_rake_doc, min_size=1, max_size=10)


def _run_docs_oracle(name: str, texts: list[str]) -> list[tuple]:
    con = duckdb.connect()
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts}).astype(
        {"doc_id": "int64"}
    )
    con.register("documents", df)
    return [tuple(r) for r in con.execute(_SPECS[name].oracle).fetchall()]


def _covered(texts: list[str]) -> dict[int, tuple[set[int], int]]:
    """Per doc: (covered 0-based positions, matched-gram starts) under the
    exact >= SPAN_K shared-run rule."""
    grams: dict[tuple, set[int]] = defaultdict(set)
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    for i, ws in toks.items():
        for j in range(len(ws) - SPAN_K + 1):
            grams[tuple(ws[j : j + SPAN_K])].add(i)
    out = {}
    for i, ws in toks.items():
        cov: set[int] = set()
        starts = 0
        for j in range(len(ws) - SPAN_K + 1):
            if len(grams[tuple(ws[j : j + SPAN_K])]) >= 2:
                starts += 1
                cov.update(range(j, j + SPAN_K))
        out[i] = (cov, starts)
    return out


@_settings
@given(_corpus)
def test_span_metric_oracle_matches_interval_union(texts):
    rows = {r[0]: r for r in _run_docs_oracle("text_substring_dedup_spans", texts)}
    cov = _covered(texts)
    assert set(rows) == set(range(len(texts)))
    for i, t in enumerate(texts):
        n_tok = len(t.split(" "))
        covered, starts = cov[i]
        assert rows[i] == (
            i,
            n_tok,
            starts,
            len(covered),
            len(covered) * 1_000_000 // n_tok,
        )


@_settings
@given(_corpus)
def test_span_trim_oracle_is_exact_complement(texts):
    rows = {r[0]: r for r in _run_docs_oracle("text_substring_dedup_trim", texts)}
    cov = _covered(texts)
    for i, t in enumerate(texts):
        ws = t.split(" ")
        covered, _ = cov[i]
        kept = [w for j, w in enumerate(ws) if j not in covered]
        assert rows[i] == (i, len(ws), len(kept), " ".join(kept))
        # complement identity on every corpus
        assert len(kept) + len(covered) == len(ws)


def _snm_pass(keyed: list[tuple[str, int]]) -> set[tuple[int, int]]:
    blocks: dict[str, list[int]] = defaultdict(list)
    for key, doc_id in sorted(keyed):
        blocks[key[:SNM_PREFIX_CHARS]].append(doc_id)
    out: set[tuple[int, int]] = set()
    for ids in blocks.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1 : i + SNM_WINDOW]:
                out.add((min(a, b), max(a, b)))
    return out


@_settings
@given(_corpus)
def test_snm_multipass_oracle_matches_brute_force(texts):
    rows = {
        (r[0], r[1]): r for r in _run_docs_oracle("dedup_snm_multipass", texts)
    }
    p1 = _snm_pass([(t, i) for i, t in enumerate(texts)])
    p2 = _snm_pass([(t[::-1], i) for i, t in enumerate(texts)])
    assert set(rows) == p1 | p2
    sh = {}
    for i, t in enumerate(texts):
        ws = t.split(" ")
        sh[i] = (
            {
                " ".join(ws[j : j + SNM_SHINGLE_K])
                for j in range(len(ws) - SNM_SHINGLE_K + 1)
            }
            if len(ws) >= SNM_SHINGLE_K
            else set()
        )
    for (a, b), r in rows.items():
        inter = len(sh[a] & sh[b])
        uni = len(sh[a] | sh[b])
        jac = inter * 1_000_000 // uni if uni else 0
        assert r[2:] == ((a, b) in p1, (a, b) in p2, jac, jac >= SNM_MATCH_PPM)


@_settings
@given(_rake_corpus)
def test_rake_oracle_matches_greedy_recompute(texts):
    got: dict[int, list[tuple]] = defaultdict(list)
    for r in _run_docs_oracle("text_rake_keywords", texts):
        got[r[0]].append(r)
    for rs in got.values():
        rs.sort(key=lambda r: r[1])
    stop = set(STOPWORDS)
    for i, t in enumerate(texts):
        phrases: list[list[str]] = []
        cur: list[str] = []
        for w in t.split(" "):
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        freq: Counter = Counter()
        deg: Counter = Counter()
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p) - 1
        wscore = {w: deg[w] * 1000 // freq[w] for w in freq}
        cand: dict[str, list[int]] = {}
        for p in phrases:
            key = " ".join(p)
            if key in cand:
                cand[key][1] += 1
            else:
                cand[key] = [len(p), 1, sum(wscore[w] for w in p)]
        top = sorted(cand.items(), key=lambda kv: (-kv[1][2], kv[0]))[:RAKE_TOP_K]
        expect = [
            (i, rank, phrase, n_words, n_occ, score)
            for rank, (phrase, (n_words, n_occ, score)) in enumerate(top, start=1)
        ]
        assert got.get(i, []) == expect


_basket_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # l_orderkey
        st.integers(min_value=1, max_value=10),  # l_partkey
    ),
    min_size=1,
    max_size=60,
)


@_settings
@given(_basket_rows)
def test_market_basket_oracle_matches_brute_force(rows_in):
    con = duckdb.connect()
    df = pd.DataFrame(rows_in, columns=["l_orderkey", "l_partkey"]).astype("int64")
    con.register("lineitem", df)
    got = {
        (r[0], r[1]): r
        for r in con.execute(_SPECS["orders_market_basket"].oracle).fetchall()
    }
    baskets: dict[int, set[int]] = defaultdict(set)
    for ok, pk in rows_in:
        baskets[ok].add(pk)
    baskets = {ok: ps for ok, ps in baskets.items() if len(ps) <= BASKET_CAP}
    n_orders = len(baskets)
    item_cnt: Counter = Counter()
    pair_cnt: Counter = Counter()
    for ps in baskets.values():
        srt = sorted(ps)
        item_cnt.update(srt)
        for i, a in enumerate(srt):
            for b in srt[i + 1 :]:
                pair_cnt[(a, b)] += 1
    expect = {p: c for p, c in pair_cnt.items() if c >= BASKET_MIN_SUPPORT}
    assert set(got) == set(expect)
    for (a, b), c_ab in expect.items():
        c_a, c_b = item_cnt[a], item_cnt[b]
        assert got[(a, b)] == (
            a,
            b,
            c_ab,
            c_a,
            c_b,
            c_ab * 1_000_000 // n_orders,
            c_ab * 1_000_000 // c_a,
            c_ab * 1_000_000 // c_b,
            c_ab * n_orders * 1_000_000 // (c_a * c_b),
        )


_orders_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5_000_000),  # price in cents
        st.integers(min_value=1, max_value=10_000),  # o_orderkey
    ),
    min_size=EQD_TILES,
    max_size=60,
    unique_by=lambda t: t[1],
)


@_settings
@given(_orders_rows)
def test_equidepth_oracle_matches_direct_selection(rows_in):
    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "o_totalprice": [c / 100.0 for c, _ in rows_in],
            "o_orderkey": [k for _, k in rows_in],
        }
    ).astype({"o_orderkey": "int64"})
    con.register("orders", df)
    got = sorted(
        con.execute(_SPECS["profile_histogram_equidepth"].oracle).fetchall()
    )
    vals = sorted((c / 100.0, k) for c, k in rows_in)
    n = len(vals)
    expect = []
    for t in range(1, EQD_TILES):
        k = n * t // EQD_TILES
        price, okey = vals[k - 1]
        expect.append((t, k, int(price // 25_000.0), price, okey))
    assert got == sorted(expect)


@_settings
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=12),  # l_partkey
            st.integers(min_value=0, max_value=800_000),  # extendedprice cents
            st.integers(min_value=0, max_value=10),  # discount percent
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pareto_abc_oracle_matches_textbook_recompute(rows_in):
    con = duckdb.connect()
    df = pd.DataFrame(
        {
            "l_partkey": [p for p, _, _ in rows_in],
            "l_extendedprice": [c / 100.0 for _, c, _ in rows_in],
            "l_discount": [d / 100.0 for _, _, d in rows_in],
        }
    ).astype({"l_partkey": "int64"})
    con.register("lineitem", df)
    got = {r[0]: r for r in con.execute(_SPECS["orders_pareto_abc"].oracle).fetchall()}
    # per-part revenue via the same cast chain (duckdb), ranking/cumulative
    # logic in python — the window algebra is what's under test
    rev = [
        (pk, int(r))
        for pk, r in con.execute(
            """SELECT l_partkey,
                      SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4)) * 10000 AS BIGINT))
               FROM lineitem GROUP BY 1"""
        ).fetchall()
    ]
    rev.sort(key=lambda t: (-t[1], t[0]))
    total = sum(r for _, r in rev)
    cum = 0
    for rnk, (pk, r_e4) in enumerate(rev, start=1):
        cum += r_e4
        # zero-total corpora are the documented degenerate convention:
        # cum_ppm 0 (guarded division), hence class 'A' everywhere
        ppm = cum * 1_000_000 // total if total else 0
        cls = "A" if ppm <= ABC_A_PPM else ("B" if ppm <= ABC_B_PPM else "C")
        assert got[pk] == (pk, rnk, r_e4, cum, ppm, cls)

"""Invariant tests for the third round-11 work session's operators
(oracle hash checks run in test_oracle.py / the driver; these pin the
semantics the hash can't see)."""

from __future__ import annotations

import hashlib

import pytest


def _sdiv(num: int, den: int) -> int:
    """Sign-safe integral division (the operators' tau_milli convention)."""
    if den == 0:
        return 0
    mag = abs(num) // den
    return mag if num >= 0 else -mag


def _ab_variant(uid: int) -> str:
    h = int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:12], 16)
    return "A" if h % 2 == 0 else "B"


def test_did_reproduces_from_pure_python(spark, sf_dir):
    """Recompute the whole DiD readout with exact python ints from the
    same parquet (a third engine) and require equality with every emitted
    cell — plus the defining DiD identity: the lift row's estimate equals
    ((dB)*nA - (dA)*nB) * 1000 / (nA*nB) with exact integer deltas."""
    import duckdb

    from vena_etl_tool_spark.operators.analytics import events_did_readout

    rows = {r.variant: r for r in events_did_readout(spark, sf_dir).collect()}
    assert set(rows) == {"A", "B", "B-A"}

    con = duckdb.connect()
    per_user = con.execute(
        f"""
        WITH b AS (SELECT (CAST(floor(epoch(MIN(ts))) AS BIGINT)
                           + CAST(floor(epoch(MAX(ts))) AS BIGINT)) // 2 AS mid_s
                   FROM '{sf_dir}/events.parquet')
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(floor(epoch(ts)) AS BIGINT) <= b.mid_s
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0),
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                    AND CAST(floor(epoch(ts)) AS BIGINT) > b.mid_s
                    THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) END), 0)
        FROM '{sf_dir}/events.parquet' CROSS JOIN b
        GROUP BY user_id, b.mid_s
        """
    ).fetchall()

    stats: dict[str, tuple[int, int, int]] = {}
    for v in ("A", "B"):
        grp = [(x, y) for uid, x, y in per_user if _ab_variant(uid) == v]
        n_v = len(grp)
        sx_v = sum(x for x, _ in grp)
        sy_v = sum(y for _, y in grp)
        stats[v] = (n_v, sx_v, sy_v)
        r = rows[v]
        assert (r.n_users, r.pre_cents, r.post_cents) == (n_v, sx_v, sy_v)
        assert r.pre_per_user_cents == sx_v // n_v
        assert r.post_per_user_cents == sy_v // n_v
        assert r.delta_per_user_milli == _sdiv((sy_v - sx_v) * 1000, n_v)

    n_a, sx_a, sy_a = stats["A"]
    n_b, sx_b, sy_b = stats["B"]
    lift = rows["B-A"]
    assert lift.n_users == n_b - n_a
    assert lift.pre_cents == sx_b - sx_a
    assert lift.post_cents == sy_b - sy_a
    did = _sdiv(((sy_b - sx_b) * n_a - (sy_a - sx_a) * n_b) * 1000, n_a * n_b)
    assert lift.delta_per_user_milli == did
    # discriminating power at the gate SF: both periods carry real money
    assert sx_a + sx_b > 0 and sy_a + sy_b > 0


def test_did_agrees_with_cuped_population(spark, sf_dir):
    """The two experiment readouts share the assignment and the split:
    per-variant user counts and (pre, post) cents totals must agree with
    events_cuped_adjust's (x, y) columns row for row."""
    from vena_etl_tool_spark.operators.analytics import (
        events_cuped_adjust,
        events_did_readout,
    )

    did = {r.variant: r for r in events_did_readout(spark, sf_dir).collect()}
    cuped = {r.variant: r for r in events_cuped_adjust(spark, sf_dir).collect()}
    for v in ("A", "B", "B-A"):
        assert did[v].n_users == cuped[v].n_users
        assert did[v].pre_cents == cuped[v].x_cents
        assert did[v].post_cents == cuped[v].y_cents


def test_market_basket_reproduces_from_pure_python(spark, sf_dir):
    """Recompute the full rule table with exact python ints from the same
    parquet (a third engine): basket universe, per-item counts, pair
    supports, and every ppm ratio must match cell for cell."""
    import duckdb

    from vena_etl_tool_spark.operators.analytics import (
        BASKET_CAP,
        BASKET_MIN_SUPPORT,
        orders_market_basket,
    )

    rows = orders_market_basket(spark, sf_dir).collect()
    assert rows

    con = duckdb.connect()
    items = con.execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM '{sf_dir}/lineitem.parquet'"
    ).fetchall()
    from collections import Counter, defaultdict

    baskets: dict[int, set[int]] = defaultdict(set)
    for ok, pk in items:
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
    assert {(r.part_a, r.part_b) for r in rows} == set(expect)
    for r in rows:
        c_ab = expect[(r.part_a, r.part_b)]
        c_a, c_b = item_cnt[r.part_a], item_cnt[r.part_b]
        assert (r.basket_cnt, r.cnt_a, r.cnt_b) == (c_ab, c_a, c_b)
        assert r.support_ppm == c_ab * 1_000_000 // n_orders
        assert r.conf_a_to_b_ppm == c_ab * 1_000_000 // c_a
        assert r.conf_b_to_a_ppm == c_ab * 1_000_000 // c_b
        assert r.lift_ppm == c_ab * n_orders * 1_000_000 // (c_a * c_b)


def test_market_basket_rule_algebra(spark, sf_dir):
    """Structural rule algebra the hash can't articulate: pairs are
    canonically ordered, support never exceeds either item count,
    confidence dominates support, and a lift above 1e6 (positive
    association) appears for at least one rule at the gate SF."""
    from vena_etl_tool_spark.operators.analytics import orders_market_basket

    rows = orders_market_basket(spark, sf_dir).collect()
    assert all(r.part_a < r.part_b for r in rows)
    for r in rows:
        assert r.basket_cnt <= min(r.cnt_a, r.cnt_b)
        assert r.conf_a_to_b_ppm >= r.support_ppm
        assert r.conf_b_to_a_ppm >= r.support_ppm
        assert 0 < r.conf_a_to_b_ppm <= 1_000_000
        assert 0 < r.conf_b_to_a_ppm <= 1_000_000
    assert any(r.lift_ppm > 1_000_000 for r in rows)


def test_equidepth_boundaries_reproduce_from_pure_python(spark, sf_dir):
    """Sort the raw column in python and pick the k-th element directly —
    the distributed two-phase selection must return exactly those rows,
    and the boundary sequence must be monotone in the total order."""
    import duckdb

    from vena_etl_tool_spark.operators.aggregates import (
        EQD_TILES,
        profile_histogram_equidepth,
    )

    rows = sorted(
        profile_histogram_equidepth(spark, sf_dir).collect(), key=lambda r: r.tile
    )
    assert [r.tile for r in rows] == list(range(1, EQD_TILES))

    con = duckdb.connect()
    vals = con.execute(
        f"SELECT o_totalprice, o_orderkey FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    vals.sort()
    n = len(vals)
    for r in rows:
        k = n * r.tile // EQD_TILES
        assert r.boundary_rank == k
        price, okey = vals[k - 1]  # k is a 1-based rank
        assert (r.boundary_price, r.boundary_orderkey) == (price, okey)
    bounds = [(r.boundary_price, r.boundary_orderkey) for r in rows]
    assert bounds == sorted(bounds)
    # equi-depth property: the boundaries split the table into tiles
    # whose sizes differ by at most 1 (rank arithmetic, no duplicates
    # under the unique (price, orderkey) order)
    ranks = [0] + [r.boundary_rank for r in rows] + [n]
    depths = [b - a for a, b in zip(ranks, ranks[1:])]
    assert max(depths) - min(depths) <= 1


def test_substring_spans_reproduce_from_pure_python(spark, sf_dir):
    """Recompute the duplicated-span coverage with a direct python
    interval union over the same parquet (a third engine, no islands
    idiom: literally mark covered positions in a set) and require
    equality on every row — plus the bounds the metric promises."""
    import duckdb
    from collections import defaultdict

    from vena_etl_tool_spark.operators.dedup import (
        SPAN_K,
        text_substring_dedup_spans,
    )

    rows = {r.doc_id: r for r in text_substring_dedup_spans(spark, sf_dir).collect()}

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    grams: dict[tuple, set[int]] = defaultdict(set)
    tok_lists = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        tok_lists[doc_id] = toks
        for i in range(len(toks) - SPAN_K + 1):
            grams[tuple(toks[i : i + SPAN_K])].add(doc_id)
    assert len(rows) == len(docs)
    any_cov = any_zero = False
    for doc_id, toks in tok_lists.items():
        covered: set[int] = set()
        starts = 0
        for i in range(len(toks) - SPAN_K + 1):
            if len(grams[tuple(toks[i : i + SPAN_K])]) >= 2:
                starts += 1
                covered.update(range(i, i + SPAN_K))
        r = rows[doc_id]
        assert r.n_tok == len(toks)
        assert r.n_matched_grams == starts
        assert r.covered_tok == len(covered)
        assert r.coverage_ppm == len(covered) * 1_000_000 // len(toks)
        assert 0 <= r.covered_tok <= r.n_tok
        any_cov |= r.covered_tok > 0
        any_zero |= r.covered_tok == 0
    # discriminating power at the gate SF: the fixture's seeded clones
    # give nonzero coverage, and non-clones stay at zero
    assert any_cov and any_zero


def test_snm_multipass_reproduces_from_pure_python(spark, sf_dir):
    """Recompute both SNM passes, the union and the verification scores
    in pure python over the same parquet and require cell equality."""
    import duckdb
    from collections import defaultdict

    from vena_etl_tool_spark.operators.dedup import (
        SNM_MATCH_PPM,
        SNM_PREFIX_CHARS,
        SNM_SHINGLE_K,
        SNM_WINDOW,
        dedup_snm_multipass,
    )

    rows = {
        (r.doc_a, r.doc_b): r for r in dedup_snm_multipass(spark, sf_dir).collect()
    }

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def pass_pairs(keyed: list[tuple[str, int]]) -> set[tuple[int, int]]:
        blocks: dict[str, list[int]] = defaultdict(list)
        for key, doc_id in sorted(keyed):
            blocks[key[:SNM_PREFIX_CHARS]].append(doc_id)
        out: set[tuple[int, int]] = set()
        for ids in blocks.values():
            for i, a in enumerate(ids):
                for b in ids[i + 1 : i + SNM_WINDOW]:
                    out.add((min(a, b), max(a, b)))
        return out

    p1 = pass_pairs([(text, doc_id) for doc_id, text in docs])
    p2 = pass_pairs([(text[::-1], doc_id) for doc_id, text in docs])
    assert set(rows) == p1 | p2

    sh = {
        doc_id: {
            " ".join(toks[i : i + SNM_SHINGLE_K])
            for i in range(len(toks) - SNM_SHINGLE_K + 1)
        }
        if len(toks := text.split(" ")) >= SNM_SHINGLE_K
        else set()
        for doc_id, text in docs
    }
    for (a, b), r in rows.items():
        assert r.in_pass1 == ((a, b) in p1)
        assert r.in_pass2 == ((a, b) in p2)
        inter = len(sh[a] & sh[b])
        uni = len(sh[a] | sh[b])
        jac = inter * 1_000_000 // uni if uni else 0
        assert r.jaccard_ppm == jac
        assert r.is_match == (jac >= SNM_MATCH_PPM)
    # the multi-pass mechanism earns its keep at the gate SF: each pass
    # contributes pairs the other misses
    assert any(r.in_pass1 and not r.in_pass2 for r in rows.values())
    assert any(r.in_pass2 and not r.in_pass1 for r in rows.values())


def test_snm_multipass_contains_single_pass(spark, sf_dir):
    """Pass 1 of the multi-pass operator IS the registered single-pass
    operator's candidate set (canonicalized), with identical verdicts —
    the union can only ADD recall, never change a pass-1 score."""
    from vena_etl_tool_spark.operators.dedup import (
        dedup_snm_multipass,
        dedup_sorted_neighborhood,
    )

    single = {
        (min(r.doc_a, r.doc_b), max(r.doc_a, r.doc_b)): (r.jaccard_ppm, r.is_match)
        for r in dedup_sorted_neighborhood(spark, sf_dir).collect()
    }
    multi = {
        (r.doc_a, r.doc_b): (r.jaccard_ppm, r.is_match)
        for r in dedup_snm_multipass(spark, sf_dir).collect()
        if r.in_pass1
    }
    assert multi == single


def test_rake_reproduces_from_pure_python(spark, sf_dir):
    """Full RAKE recompute in pure python per document (segmentation,
    deg/freq, floored word scores, phrase sums, top-k under the total
    order) — every emitted row must match."""
    import duckdb
    from collections import Counter, defaultdict

    from vena_etl_tool_spark.operators.textanalysis import (
        RAKE_TOP_K,
        STOPWORDS,
        text_rake_keywords,
    )

    got = defaultdict(list)
    for r in text_rake_keywords(spark, sf_dir).collect():
        got[r.doc_id].append(r)
    for rs in got.values():
        rs.sort(key=lambda r: r.rank)

    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    stop = set(STOPWORDS)
    n_docs_with_rows = 0
    for doc_id, text in docs:
        toks = text.split(" ")
        phrases: list[list[str]] = []
        cur: list[str] = []
        for t in toks:
            if t in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
        freq: Counter = Counter()
        deg: Counter = Counter()
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p) - 1
        wscore = {w: deg[w] * 1000 // freq[w] for w in freq}
        cand: dict[str, tuple[int, int, int]] = {}
        for p in phrases:
            key = " ".join(p)
            score = sum(wscore[w] for w in p)
            if key in cand:
                n_words, n_occ, s = cand[key]
                cand[key] = (n_words, n_occ + 1, s)
            else:
                cand[key] = (len(p), 1, score)
        top = sorted(cand.items(), key=lambda kv: (-kv[1][2], kv[0]))[:RAKE_TOP_K]
        rows = got.get(doc_id, [])
        assert len(rows) == len(top)
        if rows:
            n_docs_with_rows += 1
        for rank, (r, (phrase, (n_words, n_occ, score))) in enumerate(
            zip(rows, top), start=1
        ):
            assert (r.rank, r.phrase, r.n_words, r.n_occurrences, r.score_milli) == (
                rank,
                phrase,
                n_words,
                n_occ,
                score,
            )
    assert n_docs_with_rows > 0


def test_hnsw_layered_walk_reproduces_from_pure_python(spark, sf_dir):
    """Recompute the level rule, the layer-0 greedy descent from each
    emitted layer-1 seed, the truth argmax and the final cosine in pure
    python (scaled-integer dot fold), and require equality with every
    emitted row."""
    import math

    import duckdb

    from vena_etl_tool_spark.operators.similarity import (
        HNSW_L0_HOPS,
        HNSW_SKIP,
        N_QUERIES,
        _mutual_graph_persisted,
        sim_ann_hnsw_greedy_layered,
    )

    rows = sim_ann_hnsw_greedy_layered(spark, sf_dir).collect()
    assert len(rows) == N_QUERIES

    con = duckdb.connect()
    emb = {
        vec_id: e
        for vec_id, e in con.execute(
            f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchall()
    }

    def sq(v) -> float:
        return sum(int(math.floor(float(x) * float(x) * 1e12)) for x in v) / 1e12

    def cos(qi: int, ci: int) -> float:
        q, c = emb[qi], emb[ci]
        dot = sum(
            int(math.floor(float(x) * float(y) * 1e12)) for x, y in zip(q, c)
        ) / 1e12
        return dot / (math.sqrt(sq(q)) * math.sqrt(sq(c)))

    def is_l1(vec_id: int) -> bool:
        return int(hashlib.md5(f"lvl:{vec_id}".encode()).hexdigest()[:12], 16) % HNSW_SKIP == 0

    # layer-1 nodes live at the dedup'd representative grain
    reps: dict[tuple, int] = {}
    for vec_id, e in emb.items():
        key = tuple(e)
        reps[key] = min(reps.get(key, vec_id), vec_id)
    l1_nodes = {v for v in reps.values() if is_l1(v)}
    assert l1_nodes
    entry = min(l1_nodes)

    adj: dict[int, set[int]] = {}
    for r in _mutual_graph_persisted(spark, sf_dir).select("vec_a", "vec_b").collect():
        adj.setdefault(r.vec_a, set()).add(r.vec_b)
        adj.setdefault(r.vec_b, set()).add(r.vec_a)
    graph_nodes = set(adj)

    for r in rows:
        assert r.entry_node == entry
        assert r.l1_seed in l1_nodes  # the layer-1 walk stays on layer 1
        # layer-0 descent from the emitted seed, recomputed in python
        cur = r.l1_seed
        for _ in range(HNSW_L0_HOPS):
            cands = ({cur} | adj.get(cur, set())) - {r.query_id}
            cur = max(cands, key=lambda c: (cos(r.query_id, c), -c))
        assert r.final_node == cur
        truth = max(
            graph_nodes - {r.query_id}, key=lambda c: (cos(r.query_id, c), -c)
        )
        assert r.truth_node == truth
        assert r.hit_top1 == int(r.final_node == r.truth_node)
        assert r.final_cosine == pytest.approx(
            round(cos(r.query_id, r.final_node), 6), abs=0
        )
    # the hierarchy must navigate better than chance at the gate SF
    assert sum(r.hit_top1 for r in rows) > 0


def test_substring_trim_agrees_with_span_metric(spark, sf_dir):
    """The trim is the metric's complement, row for row: kept_tok =
    n_tok - covered_tok; the trimmed text has exactly kept_tok tokens;
    zero-coverage documents come back verbatim; and re-splitting the
    trimmed text reproduces the python interval-union keep set."""
    import duckdb
    from collections import defaultdict

    from vena_etl_tool_spark.operators.dedup import (
        SPAN_K,
        text_substring_dedup_spans,
        text_substring_dedup_trim,
    )

    spans = {r.doc_id: r for r in text_substring_dedup_spans(spark, sf_dir).collect()}
    trims = {r.doc_id: r for r in text_substring_dedup_trim(spark, sf_dir).collect()}
    assert set(spans) == set(trims)

    con = duckdb.connect()
    docs = dict(
        con.execute(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    )
    grams: dict[tuple, set[int]] = defaultdict(set)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        for i in range(len(toks) - SPAN_K + 1):
            grams[tuple(toks[i : i + SPAN_K])].add(doc_id)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        covered: set[int] = set()
        for i in range(len(toks) - SPAN_K + 1):
            if len(grams[tuple(toks[i : i + SPAN_K])]) >= 2:
                covered.update(range(i, i + SPAN_K))
        expect = " ".join(t for i, t in enumerate(toks) if i not in covered)
        t, s = trims[doc_id], spans[doc_id]
        assert t.kept_tok == s.n_tok - s.covered_tok
        assert t.trimmed_text == expect
        if s.covered_tok == 0:
            assert t.trimmed_text == text
        if t.kept_tok:
            assert len(t.trimmed_text.split(" ")) == t.kept_tok
        else:
            assert t.trimmed_text == ""


def test_correlation_matrix_reproduces_from_pure_python(spark, sf_dir):
    """Recompute every pairwise correlation with exact python ints (and
    one final float sqrt/division, as specced) over the same parquet and
    require equality — plus the Pearson bounds and the known TPC-H
    structure (quantity drives extendedprice; discount/tax are
    independent draws, near-zero corr)."""
    import math

    import duckdb

    from vena_etl_tool_spark.operators.aggregates import (
        profile_correlation_matrix,
    )

    rows = {(r.col_a, r.col_b): r for r in profile_correlation_matrix(spark, sf_dir).collect()}
    assert len(rows) == 6

    con = duckdb.connect()
    data = con.execute(
        f"""SELECT CAST(l_quantity AS BIGINT),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM '{sf_dir}/lineitem.parquet'"""
    ).fetchall()
    cols = list(zip(*data))
    names = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    n = len(data)
    for i in range(4):
        for j in range(i + 1, 4):
            x, y = cols[i], cols[j]
            sx, sy = sum(x), sum(y)
            sxx = sum(v * v for v in x)
            syy = sum(v * v for v in y)
            sxy = sum(a * b for a, b in zip(x, y))
            num = n * sxy - sx * sy
            dx, dy = n * sxx - sx * sx, n * syy - sy * sy
            expect = round(float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))), 6)
            r = rows[(names[i], names[j])]
            assert r.n_rows == n
            assert r.corr == pytest.approx(expect, abs=0)
            assert -1.0 <= r.corr <= 1.0
    # structural sanity: the fixture's numeric columns are independent
    # draws (unlike real TPC-H, extendedprice does NOT derive from
    # quantity here), so every pair sits near zero — but the six exact
    # values still differ, so the hash gate has discriminating power
    assert all(abs(r.corr) < 0.2 for r in rows.values())
    assert len({r.corr for r in rows.values()}) == 6


def test_pareto_abc_reproduces_from_pure_python(spark, sf_dir):
    """Recompute the whole ABC table in pure python (exact e-4 revenue,
    global sort, inclusive cumulative, ppm shares, class cuts) and
    require equality — the two-phase band decomposition must equal the
    textbook global formulation exactly."""
    import duckdb

    from vena_etl_tool_spark.operators.analytics import (
        ABC_A_PPM,
        ABC_B_PPM,
        orders_pareto_abc,
    )

    rows = {r.l_partkey: r for r in orders_pareto_abc(spark, sf_dir).collect()}

    con = duckdb.connect()
    rev = con.execute(
        f"""SELECT l_partkey,
                   SUM(CAST(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4)) * 10000 AS BIGINT))
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
    ).fetchall()
    rev = [(pk, int(r)) for pk, r in rev]
    rev.sort(key=lambda t: (-t[1], t[0]))
    total = sum(r for _, r in rev)
    assert len(rows) == len(rev)
    cum = 0
    for rnk, (pk, r_e4) in enumerate(rev, start=1):
        cum += r_e4
        ppm = cum * 1_000_000 // total
        cls = "A" if ppm <= ABC_A_PPM else ("B" if ppm <= ABC_B_PPM else "C")
        r = rows[pk]
        assert (r.rnk, r.rev_e4, r.cum_rev_e4, r.cum_ppm, r.abc_class) == (
            rnk,
            r_e4,
            cum,
            ppm,
            cls,
        )
    # all three classes appear and ranks are a permutation of 1..n
    assert {r.abc_class for r in rows.values()} == {"A", "B", "C"}
    assert sorted(r.rnk for r in rows.values()) == list(range(1, len(rev) + 1))

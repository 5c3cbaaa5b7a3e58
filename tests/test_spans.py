"""Span query family (engine/spans.py) — algebra unit tests against an
in-memory fake segment + brute-force oracles, and end-to-end driver-entry
checks vs DuckDB at sf0.001."""

import numpy as np
import pytest

from engine.spans import (
    SpanNear,
    SpanNot,
    SpanOr,
    SpanTerm,
    eval_spans,
    span_first,
    span_freqs,
    span_terms,
)


class _TI:
    pos_blob = b"\x01"


class FakeSeg:
    """Serves term_info/postings/positions from {doc_id: [tokens]}."""

    def __init__(self, docs: dict[int, list[str]]):
        self.docs = docs

    def term_info(self, t):
        return _TI() if any(t in tk for tk in self.docs.values()) else None

    def _docs_of(self, t):
        return sorted(d for d, tk in self.docs.items() if t in tk)

    def postings(self, t):
        ds = self._docs_of(t)
        return (
            np.array(ds, dtype=np.int64),
            np.array([self.docs[d].count(t) for d in ds], dtype=np.int64),
        )

    def positions(self, t):
        return [
            np.flatnonzero(np.array(self.docs[d], dtype=object) == t).astype(
                np.int64
            )
            for d in self._docs_of(t)
        ]


VOCAB = ["a", "b", "c", "d", "e"]


def _rand_corpus(rng, n_docs=40, max_len=30):
    return {
        d: [VOCAB[i] for i in rng.integers(0, len(VOCAB), rng.integers(1, max_len))]
        for d in range(n_docs)
    }


def test_term_spans_are_positions():
    seg = FakeSeg({0: ["a", "b", "a"], 1: ["b"]})
    m = eval_spans(seg, SpanTerm("a"))
    assert list(m) == [0]
    assert m[0].tolist() == [[0, 1, 0], [2, 3, 0]]


def test_near_ordered_matches_brute_force():
    rng = np.random.default_rng(7)
    corpus = _rand_corpus(rng)
    seg = FakeSeg(corpus)
    for slop in (0, 1, 3):
        q = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=slop, in_order=True)
        m = eval_spans(seg, q)
        for d, toks in corpus.items():
            pa_ = [i for i, t in enumerate(toks) if t == "a"]
            pb = [i for i, t in enumerate(toks) if t == "b"]
            # greedy: p1 matches iff some p2 in (p1, p1+1+slop]
            exp = sum(
                1 for p1 in pa_ if any(p1 < p2 <= p1 + 1 + slop for p2 in pb)
            )
            got = len(m[d]) if d in m else 0
            assert got == exp, (d, slop, toks)


def test_near_ordered_three_clause_greedy():
    """Independent re-derivation of stretchToOrder for 3 unit clauses."""
    rng = np.random.default_rng(11)
    corpus = _rand_corpus(rng, n_docs=60)
    seg = FakeSeg(corpus)
    slop = 2
    q = SpanNear(
        (SpanTerm("a"), SpanTerm("b"), SpanTerm("c")), slop=slop, in_order=True
    )
    m = eval_spans(seg, q)
    for d, toks in corpus.items():
        pos = {
            t: [i for i, x in enumerate(toks) if x == t] for t in ("a", "b", "c")
        }
        exp = 0
        if all(pos[t] for t in ("a", "b", "c")):
            for p1 in pos["a"]:
                p2 = next((p for p in pos["b"] if p >= p1 + 1), None)
                if p2 is None:
                    break  # oneExhaustedInCurrentDoc
                p3 = next((p for p in pos["c"] if p >= p2 + 1), None)
                if p3 is None:
                    break
                if (p2 - (p1 + 1)) + (p3 - (p2 + 1)) <= slop:
                    exp += 1
        got = len(m[d]) if d in m else 0
        assert got == exp, (d, toks)


def test_near_unordered_doc_membership():
    rng = np.random.default_rng(13)
    corpus = _rand_corpus(rng)
    seg = FakeSeg(corpus)
    for slop in (0, 2):
        q = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=slop, in_order=False)
        m = eval_spans(seg, q)
        for d, toks in corpus.items():
            pa_ = [i for i, t in enumerate(toks) if t == "a"]
            pb = [i for i, t in enumerate(toks) if t == "b"]
            exp = any(abs(x - y) - 1 <= slop for x in pa_ for y in pb)
            assert (d in m) == exp, (d, slop, toks)


def test_span_or_merges_sorted():
    seg = FakeSeg({0: ["a", "b", "a", "c"]})
    m = eval_spans(seg, SpanOr((SpanTerm("a"), SpanTerm("b"))))
    assert m[0][:, 0].tolist() == [0, 1, 2]  # start-sorted union


def test_span_not_brute_force():
    rng = np.random.default_rng(17)
    corpus = _rand_corpus(rng)
    seg = FakeSeg(corpus)
    inc = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=2, in_order=True)
    for pre, post in ((0, 0), (1, 2)):
        q = SpanNot(inc, SpanTerm("c"), pre=pre, post=post)
        m_inc = eval_spans(seg, inc)
        m = eval_spans(seg, q)
        for d, spans in m_inc.items():
            pc = [i for i, t in enumerate(corpus[d]) if t == "c"]
            kept = [
                (st, en)
                for st, en, _w in spans.tolist()
                if not any(e + 1 > st - pre and e < en + post for e in pc)
            ]
            got = m[d][:, :2].tolist() if d in m else []
            assert [list(x) for x in kept] == got, (d, pre, post)


def test_span_first_filters_by_end():
    seg = FakeSeg({0: ["a", "b", "a", "a"], 1: ["b", "a"]})
    m = eval_spans(seg, span_first(SpanTerm("a"), 2))
    assert m[0][:, 0].tolist() == [0]  # position 2 and 3 have end > 2
    assert m[1][:, 0].tolist() == [1]


def test_nested_near_of_near():
    """near(near(a, b, 0), c, slop) — composite clause spans flow through
    with their real widths and (start, end) extents."""
    seg = FakeSeg({0: ["a", "b", "d", "c"], 1: ["a", "b", "c"], 2: ["a", "c", "b"]})
    inner = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=0, in_order=True)
    q = SpanNear((inner, SpanTerm("c")), slop=1, in_order=True)
    m = eval_spans(seg, q)
    # doc 0: (a b) at (0,2), c at 3 -> gap 1 <= 1 matches
    # doc 1: (a b) at (0,2), c at 2 -> gap 0 matches
    # doc 2: no (a b) adjacency
    assert sorted(m) == [0, 1]
    assert m[0].tolist() == [[0, 4, 1]]
    assert m[1].tolist() == [[0, 3, 0]]


def test_span_freqs_term_equals_tf_and_f32_accum():
    seg = FakeSeg({0: ["a", "a", "b", "a"], 1: ["a"]})
    docs, freqs, counts = span_freqs(seg, SpanTerm("a"))
    assert docs.tolist() == [0, 1]
    assert counts.tolist() == [3, 1]
    assert freqs.dtype == np.float32
    assert freqs.tolist() == [3.0, 1.0]  # width 0 -> 1.0 per match
    # ordered near with slop: freq = f32 accumulation of 1/(1+width)
    seg2 = FakeSeg({0: ["a", "x", "b", "a", "b"]})
    q = SpanNear((SpanTerm("a"), SpanTerm("b")), slop=1, in_order=True)
    docs2, freqs2, counts2 = span_freqs(seg2, q)
    assert counts2.tolist() == [2]  # widths 1 (0->2) and 0 (3->4)
    exp = np.float32(np.float64(np.float32(1.0 / 2.0)) + 1.0)
    assert freqs2[0] == exp


def test_span_terms_collects_tree():
    q = SpanNot(
        SpanNear((SpanTerm("a"), SpanOr((SpanTerm("b"), SpanTerm("c")))), 1),
        SpanTerm("d"),
    )
    assert span_terms(q) == ["a", "b", "c"]  # exclude terms not scored


@pytest.mark.usefixtures("ray_session")
def test_span_entries_match_duckdb_sf0001():
    import duckdb

    import __ray_entry__ as e

    qs, sql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    for name in (
        "span_near_match_docs",
        "span_unordered_match_docs",
        "span_first_match_docs",
        "span_not_match_docs",
        "span_containing_docs",
        "span_within_docs",
        "span_or_near_docs",
    ):
        got = qs[name]("/root/testdata/sf0.001").to_pandas()
        exp = con.execute(sql[name]).fetchdf()
        got = got[sorted(got.columns)].sort_values(list(sorted(got.columns)))
        exp = exp[sorted(exp.columns)].sort_values(list(sorted(exp.columns)))
        assert got.reset_index(drop=True).equals(
            exp.reset_index(drop=True).astype(got.dtypes.to_dict())
        ), name
        assert len(got) > 0, f"{name} matched nothing at sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_span_near_topk_scores():
    from engine.pipelines import span_near_topk

    out = span_near_topk("/root/testdata/sf0.001", k=10).to_pandas()
    assert len(out) > 0
    s = out["score"].to_numpy()
    assert s.dtype == np.float32
    assert (np.diff(s) <= 0).all()
    assert out["rank"].tolist() == list(range(len(out)))


def test_contain_within_walks_brute_force():
    """SpanContaining/SpanWithin greedy walks (ContainSpans.java +
    SpanContainingQuery.java:98-116 / SpanWithinQuery.java:98-118) equal
    exists-containment for unit littles, on random position sets."""
    from engine.spans import _contain_walk, _within_walk

    rng = np.random.default_rng(7)
    for _ in range(200):
        nb, nl = rng.integers(1, 8), rng.integers(1, 8)
        starts = np.sort(rng.integers(0, 30, nb))
        widths = rng.integers(1, 5, nb)
        big = np.stack([starts, starts + widths, widths - 1], axis=1).astype(np.int64)
        # keep (start, end) lexicographic emission order
        big = big[np.lexsort((big[:, 1], big[:, 0]))]
        lp = np.sort(rng.integers(0, 34, nl))
        little = np.stack([lp, lp + 1, np.zeros(nl, dtype=np.int64)], axis=1)

        got_c = _contain_walk(big, little)
        exp_c = [
            i
            for i in range(len(big))
            if any(big[i, 0] <= q and q + 1 <= big[i, 1] for q in lp)
        ]
        np.testing.assert_array_equal(got_c, big[exp_c])

        # within needs ends non-decreasing too (the ordered-near shape)
        bw = big[np.argsort(big[:, 1], kind="stable")]
        bw = bw[np.lexsort((bw[:, 1], bw[:, 0]))]
        if np.all(np.diff(bw[:, 1]) >= 0):
            got_w = _within_walk(bw, little)
            exp_w = [
                j
                for j in range(len(little))
                if any(b[0] <= lp[j] and lp[j] + 1 <= b[1] for b in bw)
            ]
            np.testing.assert_array_equal(got_w, little[exp_w])


def test_contain_walk_greedy_divergence_pinned():
    """With a MULTI-WIDTH little whose first start-qualifying span is too
    long, the reference's monotone pointer rejects the big even though a
    later little would fit (SpanContainingQuery.java:104-111 checks only
    the current little) — pin that, don't 'fix' it to exists-semantics."""
    from engine.spans import _contain_walk

    big = np.array([[2, 5, 2]], dtype=np.int64)
    little = np.array([[2, 9, 6], [3, 4, 0]], dtype=np.int64)  # (start, end) order
    assert len(_contain_walk(big, little)) == 0


def test_span_containing_within_nodes_end_to_end():
    """Containing/within over the fake segment: phrase-within-window and
    window-containing-term shapes."""
    from engine.spans import SpanContaining, SpanWithin

    seg = FakeSeg(
        {
            1: ["data", "x", "the", "join", "z"],   # window [0,4) contains 'the'@2
            2: ["data", "join", "merge"],            # window [0,2), no 'the'
            3: ["the", "data", "x", "join"],         # 'the'@0 outside [1,4)
        }
    )
    big = SpanNear((SpanTerm("data"), SpanTerm("join")), slop=4, in_order=True)
    out = eval_spans(seg, SpanContaining(big, SpanTerm("the")))
    assert sorted(out) == [1]
    np.testing.assert_array_equal(out[1], np.array([[0, 4, 2]]))

    out_w = eval_spans(seg, SpanWithin(big, SpanTerm("merge")))
    assert sorted(out_w) == []  # merge@2 not inside window [0,2)
    seg2 = FakeSeg({5: ["data", "merge", "join"]})
    out_w2 = eval_spans(seg2, SpanWithin(big, SpanTerm("merge")))
    np.testing.assert_array_equal(out_w2[5], np.array([[1, 2, 0]]))

    # span_terms covers both sides
    assert span_terms(SpanContaining(big, SpanTerm("the"))) == [
        "data", "join", "the",
    ]


def test_span_multiterm_wrapper():
    """SpanMultiTermQueryWrapper: the wildcard expands to a SpanOr whose
    near-matches equal the union over per-term nears' candidate starts."""
    from engine.pipelines import span_near_wildcard_docs, get_index
    from engine.checkpoint import load_merge_manifest
    from engine.search import IndexSearcher

    sf = "/root/testdata/sf0.01"
    out = span_near_wildcard_docs(sf, "the", "s*", slop=1).to_pandas()
    assert len(out) > 0 and (out["matches"] > 0).all()
    # empty expansion -> empty result
    empty = span_near_wildcard_docs(sf, "the", "zzq*", slop=1).to_pandas()
    assert len(empty) == 0
    # the expansion really is multi-term on this vocabulary
    idx = get_index(sf)
    s = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    assert len(s.expand_prefix("s")) >= 5

"""Analyzer semantics: lowercase, stop, max-token-length skip
(StandardAnalyzer.java:39-88 contract notes)."""

import numpy as np

from engine.analyze import Analyzer, analyze_batch, compute_norms, tokenize


def test_tokenize_basic():
    assert tokenize("Hello, World! 42x") == ["hello", "world", "42x"]
    assert tokenize("") == []
    assert tokenize("---") == []


def test_long_token_skipped_not_counted():
    long_tok = "a" * 256
    ok_tok = "b" * 255
    toks = tokenize(f"x {long_tok} y {ok_tok}")
    assert toks == ["x", "y", ok_tok]
    flat, lengths = analyze_batch([f"x {long_tok} y"])
    assert flat == ["x", "y"]
    assert lengths.tolist() == [2]  # skipped token does not count toward norm length


def test_stopwords():
    an = Analyzer(stopwords=frozenset({"the", "of"}))
    assert tokenize("The rise OF machines", an) == ["rise", "machines"]
    # default stopword set is EMPTY (StandardAnalyzer.java:51-53)
    assert tokenize("the of") == ["the", "of"]


def test_analyze_batch_flat_layout():
    flat, lengths = analyze_batch(["a b c", "", "d e"])
    assert flat == ["a", "b", "c", "d", "e"]
    assert lengths.tolist() == [3, 0, 2]


def test_norms_quantized():
    norms = compute_norms(np.array([0, 5, 39, 40, 41, 10_000]))
    assert norms.dtype == np.uint8
    assert norms.tolist()[:5] == [0, 5, 39, 40, 40]


def test_position_increment_gaps():
    """StopFilter (StopFilter.java:28) and over-long tokens
    (StandardTokenizer.java:152-175) leave POSITION GAPS: removed tokens
    advance the counter, so a phrase spanning one never matches
    adjacently."""
    import numpy as np

    from engine.analyze import Analyzer, analyze_batch_with_positions

    stop_an = Analyzer(stopwords=frozenset({"the", "of"}))
    flat, lengths, pos = analyze_batch_with_positions(
        ["queen of the hill", "no stops here"], stop_an
    )
    assert flat == ["queen", "hill", "no", "stops", "here"]
    assert lengths.tolist() == [2, 3]
    # 'hill' keeps position 3 (gap over 'of the'), second doc dense
    assert pos.tolist() == [0, 3, 0, 1, 2]
    # long-token skip gaps too
    long_tok = "x" * 300
    flat2, lengths2, pos2 = analyze_batch_with_positions([f"a {long_tok} b"])
    assert flat2 == ["a", "b"]
    assert lengths2.tolist() == [2]
    assert pos2.tolist() == [0, 2]


def test_phrase_does_not_match_across_removed_stopword(tmp_path):
    """End to end: with a stopword analyzer, '"queen hill"' must NOT match
    'queen of the hill' at slop 0 but MUST within slop 2."""
    import numpy as np

    from engine.analyze import Analyzer
    from engine.build import invert_to_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.queryparse import parse_query
    from engine.search import IndexSearcher

    stop_an = Analyzer(stopwords=frozenset({"the", "of"}))
    texts = ["queen of the hill", "queen hill stands", "other words"]
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(
        np.arange(3, dtype=np.int64), texts, seg_dir, analyzer=stop_an
    )
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    m = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(m, algorithm="taat")
    exact, _ = s.search(parse_query('"queen hill"', stop_an), 10)
    assert exact.tolist() == [1]  # gap in doc 0 blocks the adjacent match
    sloppy, _ = s.search(parse_query('"queen hill"~3', stop_an), 10)
    assert set(sloppy.tolist()) == {0, 1}


import pytest


def test_analyze_batch_indexing_synonym_stacking():
    """SynonymGraphFilter semantics: stacked tokens at posIncr 0, norms
    discount overlaps (BM25Similarity discountOverlaps default), emitted
    counts include them, positions stay sorted, (term, pos) deduped."""
    import numpy as np

    from engine.analyze import Analyzer, analyze_batch_indexing

    an = Analyzer(synonyms=(("fast", ("quick", "rapid")), ("row", ("row",))))
    flat, emit, norm_len, pos = analyze_batch_indexing(
        ["fast row scan", "no syn here"], an
    )
    # doc 0: fast(0)+quick(0)+rapid(0), row(1) (self-synonym deduped), scan(2)
    assert emit.tolist() == [5, 3]
    assert norm_len.tolist() == [3, 3]  # discountOverlaps
    d0 = list(zip(flat[:5], pos[:5].tolist()))
    assert d0 == [
        ("fast", 0), ("quick", 0), ("rapid", 0), ("row", 1), ("scan", 2)
    ]
    # positions monotone per doc
    assert (np.diff(pos[:5]) >= 0).all()
    # no synonyms -> identical to the positions path
    an2 = Analyzer()
    f2, e2, n2, p2 = analyze_batch_indexing(["fast row"], an2)
    assert e2.tolist() == n2.tolist() == [2] and f2 == ["fast", "row"]


@pytest.mark.usefixtures("ray_session")
def test_synonym_index_end_to_end():
    """Index-time graph: single-term 'quick' == 'fast' doc set; stacked
    token participates in phrases; norms unchanged (discounted)."""
    import numpy as np

    from engine.checkpoint import load_merge_manifest
    from engine.pipelines import get_index, get_synonym_index
    from engine.search import IndexSearcher

    syn = IndexSearcher(
        load_merge_manifest(get_synonym_index("/root/testdata/sf0.001")["index_dir"])
    )
    plain = IndexSearcher(
        load_merge_manifest(get_index("/root/testdata/sf0.001")["index_dir"])
    )
    dq, _ = syn.search("quick", syn.doc_count)
    df_fast = plain.global_term_stats("fast")[0]
    assert len(dq) == df_fast  # every fast doc matches quick
    # norms discounted: byte-norm of any doc equals the plain index's
    seg_s, seg_p = syn.segments[0], plain.segments[0]
    ids = np.array(sorted(dq[:20]), dtype=np.int64)
    assert np.array_equal(seg_s.norm_of(ids), seg_p.norm_of(ids))


def test_common_grams_indexing_stack():
    """CommonGramsFilter contract (commongrams/CommonGramsFilter.java):
    'w1_w2' stacked at w1's position for stream-adjacent pairs touching
    the common set; emit counts grams, norms do not (discountOverlaps)."""
    from engine.analyze import Analyzer, analyze_batch_indexing

    an = Analyzer(common_grams=("the",))
    flat, emit, norm, pos = analyze_batch_indexing(
        ["the data joins the table", "no common words here"], an
    )
    n0 = int(emit[0])
    toks0 = list(zip(flat[:n0], pos[:n0].tolist()))
    # grams: the_data @0, joins_the @2 (right side common), the_table @3
    assert ("the_data", 0) in toks0
    assert ("joins_the", 2) in toks0
    assert ("the_table", 3) in toks0
    assert ("data_joins", 1) not in toks0  # neither side common
    assert int(norm[0]) == 5 and n0 == 8  # 5 words + 3 stacked grams
    # doc without common words is untouched
    assert int(emit[1]) == int(norm[1]) == 4
    # positions stay monotone per doc (delta-codec requirement)
    assert all(b >= a for a, b in zip(pos[:n0].tolist(), pos[1:n0].tolist()))


def test_keyword_repeat_filter():
    """KeywordRepeat + Porter + RemoveDuplicates: original + stem stacked
    at the same position when they differ, single copy when identical;
    norm length counts only posIncr>=1 originals (discountOverlaps)."""
    import numpy as np

    from engine.analyze import Analyzer, analyze_batch_indexing

    a = Analyzer(filters=("porter",), keyword_repeat=True)
    flat, emit, norm, pos = analyze_batch_indexing(
        ["Query DATA tables value", "", "merge merge"], a
    )
    assert flat == [
        "query", "queri", "data", "tables", "tabl", "value", "valu",
        "merge", "merg", "merge", "merg",
    ]
    assert emit.tolist() == [7, 0, 4]
    assert norm.tolist() == [4, 0, 2]  # originals only
    assert pos.tolist() == [0, 0, 1, 2, 2, 3, 3, 0, 0, 1, 1]
    # without keyword_repeat the stream is stems only
    b = Analyzer(filters=("porter",))
    flat2, _e2, _n2, _p2 = analyze_batch_indexing(["Query DATA tables"], b)
    assert flat2 == ["queri", "data", "tabl"]

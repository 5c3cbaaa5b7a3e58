"""UNICODE_ANALYZER: the UAX#29 CJK subset of StandardTokenizer
(StandardTokenizerImpl token types — IDEOGRAPHIC/HIRAGANA singles,
KATAKANA/HANGUL runs, ALPHANUM runs) as an Analyzer extension."""

import numpy as np

from engine.analyze import DEFAULT_ANALYZER, UNICODE_ANALYZER, tokenize

GOLDENS = [
    # Han ideographs: one token per character (IDEOGRAPHIC)
    ("漢字辞典", ["漢", "字", "辞", "典"]),
    # hiragana singles, katakana runs (HIRAGANA / KATAKANA types)
    ("ひらがなとカタカナ", ["ひ", "ら", "が", "な", "と", "カタカナ"]),
    # hangul runs per word
    ("한국어 단어 분리", ["한국어", "단어", "분리"]),
    # latin + accents lowercased, digits joined (ALPHANUM)
    ("Café au Lait 2024", ["café", "au", "lait", "2024"]),
    # cyrillic + greek runs
    ("Привет мир αβγ", ["привет", "мир", "αβγ"]),
    # mixed script boundaries split between classes
    ("abc漢def", ["abc", "漢", "def"]),
    ("ascii only words 42", ["ascii", "only", "words", "42"]),
    # punctuation never tokenizes
    ("!@# $%^", []),
]


def test_unicode_goldens():
    for text, expect in GOLDENS:
        assert tokenize(text, UNICODE_ANALYZER) == expect, text


def test_ascii_subset_agrees_with_default():
    """On pure-ASCII web text the unicode analyzer must emit exactly the
    default analyzer's tokens (so swapping analyzers never changes the
    index for the oracle corpus)."""
    texts = [
        "the quick brown fox 123",
        "Data JOIN merge SORT batch",
        "a1b2c3 under_score splits here",
    ]
    for t in texts:
        uni = tokenize(t, UNICODE_ANALYZER)
        # default splits on '_' too ([a-z0-9]+); unicode uses [^\W_]
        assert uni == tokenize(t, DEFAULT_ANALYZER), t


def test_cjk_index_and_search_end_to_end(tmp_path):
    """Build a segment over CJK docs with the unicode analyzer and search
    it: per-ideograph postings, correct df/norms."""
    from engine.build import invert_to_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.search import IndexSearcher

    docs = [
        "数据 处理 引擎",          # zh with spaces
        "数据处理很快",            # zh no spaces: per-char tokens
        "カタカナ データ",         # ja katakana runs
        "plain english data",
    ]
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(
        np.arange(4, dtype=np.int64), docs, seg_dir, analyzer=UNICODE_ANALYZER
    )
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    manifest = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(manifest, algorithm="taat")
    seg = s.segments[0]
    # 数 appears in docs 0 and 1 (per-ideograph token)
    d, f = seg.postings("数")
    assert d.tolist() == [0, 1]
    # katakana run token
    d2, _ = seg.postings("カタカナ")
    assert d2.tolist() == [2]
    # query path: BoolQuery built with the same analyzer
    from engine.queryparse import parse_query

    q = parse_query("数 据", analyzer=UNICODE_ANALYZER)
    docs_hit, scores = s.search(q, 10)
    assert set(docs_hit.tolist()) == {0, 1}
    assert scores.dtype == np.float32

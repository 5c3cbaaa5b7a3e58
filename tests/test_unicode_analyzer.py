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
    """On plain-ASCII web text (no '_' or digit-punctuation compounds) the
    unicode analyzer must emit exactly the default analyzer's tokens (so
    swapping analyzers never changes the index for the oracle corpus).
    Documented divergences, faithful to UAX#29 where the default's
    [a-z0-9]+ subset is not: '_' JOINS runs (ExtendNumLet WB13a/13b) and
    [.,] continues digit runs (MidNum WB11/12)."""
    texts = [
        "the quick brown fox 123",
        "Data JOIN merge SORT batch",
        "a1b2c3 plain words here",
    ]
    for t in texts:
        uni = tokenize(t, UNICODE_ANALYZER)
        assert uni == tokenize(t, DEFAULT_ANALYZER), t
    # the documented divergences
    assert tokenize("under_score", UNICODE_ANALYZER) == ["under_score"]
    assert tokenize("under_score", DEFAULT_ANALYZER) == ["under", "score"]


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


def test_emoji_token_classes():
    """UTS#51 EMOJI subset (StandardTokenizerImpl EMOJI type): flags as RI
    pairs, keycaps, ZWJ sequences and skin-tone modifiers each emit ONE
    token; emoji adjacent to words never merge into them."""
    from engine.analyze import UNICODE_ANALYZER, tokenize

    assert tokenize("go 🇺🇸 now", UNICODE_ANALYZER) == ["go", "🇺🇸", "now"]
    assert tokenize("press 1️⃣ or #️⃣", UNICODE_ANALYZER) == ["press", "1️⃣", "or", "#️⃣"]
    assert tokenize("fam 👨‍👩‍👧!", UNICODE_ANALYZER) == [
        "fam",
        "👨‍👩‍👧",
    ]
    assert tokenize("ok👍🏽yes", UNICODE_ANALYZER) == ["ok", "👍🏽", "yes"]
    assert tokenize("star⭐2", UNICODE_ANALYZER) == ["star", "⭐", "2"]
    # two flags back to back = two RI pairs
    assert tokenize("🇺🇸🇩🇪", UNICODE_ANALYZER) == ["🇺🇸", "🇩🇪"]


def test_numeric_compound_token_classes():
    """UAX#29 NUM compounds: MidNum [.,] continues digit×digit (WB11/12),
    '_' joins alnum runs (ExtendNumLet WB13a/13b); letter.letter splits."""
    from engine.analyze import UNICODE_ANALYZER, tokenize

    assert tokenize("pi=3.14", UNICODE_ANALYZER) == ["pi", "3.14"]
    assert tokenize("1,000,000 rows", UNICODE_ANALYZER) == ["1,000,000", "rows"]
    assert tokenize("a.b c,d", UNICODE_ANALYZER) == ["a", "b", "c", "d"]
    assert tokenize("foo_bar x_1 _lead trail_", UNICODE_ANALYZER) == [
        "foo_bar",
        "x_1",
        "lead",
        "trail",
    ]
    # trailing MidNum does not attach (3. → '3')
    assert tokenize("v3. done ,7", UNICODE_ANALYZER) == ["v3", "done", "7"]
    # version-ish chains keep going while digits flank every separator
    assert tokenize("2.4.9", UNICODE_ANALYZER) == ["2.4.9"]


def test_emoji_numeric_index_end_to_end(tmp_path):
    """Emoji and numeric-compound tokens index and search end-to-end with
    the unicode analyzer (phrase positions included)."""
    import numpy as np

    from engine.analyze import UNICODE_ANALYZER
    from engine.build import invert_to_segment
    from engine.checkindex import check_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.queryparse import parse_query
    from engine.search import IndexSearcher
    from engine.segment import Segment

    texts = [
        "price 3.14 👍 great",
        "price 1,000 meh",
        "flags 🇺🇸 and 🇩🇪 fly",
        "compound foo_bar here",
    ]
    root = str(tmp_path / "emojidx")
    meta = invert_to_segment(
        np.arange(4, dtype=np.int64),
        texts,
        root + "/partitions/p000000000000",
        analyzer=UNICODE_ANALYZER,
    )
    seg_dir = root + "/partitions/p000000000000"
    check_segment(Segment(seg_dir))
    manifest = finalize_build_manifest(
        root,
        [
            {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
            | {"seg_dir": seg_dir}
        ],
    )
    s = IndexSearcher(manifest, algorithm="taat")
    d, _ = s.execute(parse_query("👍", UNICODE_ANALYZER), 10)
    assert d.tolist() == [0]
    d, _ = s.execute(parse_query("3.14", UNICODE_ANALYZER), 10)
    assert d.tolist() == [0]
    d, _ = s.execute(parse_query("🇩🇪", UNICODE_ANALYZER), 10)
    assert d.tolist() == [2]
    d, _ = s.execute(parse_query("foo_bar", UNICODE_ANALYZER), 10)
    assert d.tolist() == [3]

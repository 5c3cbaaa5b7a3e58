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

"""Edge-case hardening: empty/degenerate inputs through the full chain."""

import numpy as np
import pytest

from engine.analyze import analyze_batch
from engine.build import invert_to_segment
from engine.checkpoint import finalize_build_manifest
from engine.extract import extract_batch
from engine.search import IndexSearcher


def test_empty_and_none_html_cells():
    import pyarrow as pa

    batch = pa.table(
        {
            "doc_id": [0, 1, 2],
            "html": pa.array([b"", None, b"<html><body><p>ok text</p></body></html>"], type=pa.binary()),
        }
    )
    out = extract_batch(batch)
    assert out.column("text").to_pylist()[:2] == ["", ""]
    assert "ok text" in out.column("text").to_pylist()[2]
    assert out.column("rejected").to_pylist() == [False, False, False]


def test_build_with_empty_docs(tmp_path):
    """Docs that analyze to zero tokens get norm byte 0 and no postings;
    the segment still round-trips and searches."""
    texts = ["", "   ", "!!! ???", "real tokens here", ""]
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(np.arange(5, dtype=np.int64), texts, seg_dir)
    assert meta["n_docs"] == 5
    assert meta["sum_ttf"] == 3
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    m = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(m, algorithm="taat")
    d, sc = s.search("tokens", 10)
    assert d.tolist() == [3]
    # k larger than corpus, k = 0, and empty query string
    d2, _ = s.search("real tokens here", 100)
    assert d2.tolist() == [3]
    d3, _ = s.search("real", 0)
    assert len(d3) == 0
    d4, _ = s.search("", 10)
    assert len(d4) == 0
    d5, _ = s.search("absentterm", 10)
    assert len(d5) == 0


def test_all_empty_partition(tmp_path):
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(np.arange(3, dtype=np.int64), ["", "", ""], seg_dir)
    assert meta["n_terms"] == 0 and meta["sum_ttf"] == 0
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    m = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(m, algorithm="taat")
    d, _ = s.search("anything", 10)
    assert len(d) == 0
    # match-all over empty-token docs still matches every doc at 1.0f
    d2, s2 = s.search("*", 10)
    assert d2.tolist() == [0, 1, 2]
    assert set(s2.tolist()) == {1.0}


def test_analyze_batch_long_token_skip():
    long_tok = "a" * 300
    flat, lengths = analyze_batch([f"ok {long_tok} fine"])
    assert flat == ["ok", "fine"]
    assert lengths.tolist() == [2]

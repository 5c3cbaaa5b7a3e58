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


def test_expression_empty_and_constant():
    """Expression edge cases: constant-only expression, empty columns."""
    import numpy as np

    from engine.expressions import compile_expression

    fn = compile_expression("1.5 + 2.5", [])
    assert fn({}) == 4.0
    fn2 = compile_expression("a * 2.0", ["a"])
    out = fn2({"a": np.array([], dtype=np.float64)})
    assert len(out) == 0


def test_polygon_mask_degenerate():
    """Degenerate polygons: all-collinear vertices match nothing; a
    triangle containing the query point matches."""
    import numpy as np

    from engine.geo import point_in_polygon_mask

    lat = np.array([0, 50_000], dtype=np.int64)
    lon = np.array([0, 50_000], dtype=np.int64)
    line = [(0, 0), (10_000, 10_000), (20_000, 20_000)]
    assert not point_in_polygon_mask(lat, lon, line).any()
    tri = [(-10_000, -10_000), (-10_000, 10_000), (20_000, 0)]
    m = point_in_polygon_mask(lat, lon, tri)
    assert m.tolist() == [True, False]


def test_lev_range_bound_properties():
    """The fuzzy shard bound is admissible: it never exceeds the true
    distance to any term in the range (spot-checked by construction)."""
    from engine.search import _edit_distance_le, _lev_range_lower_bound

    import random
    import string

    rng = random.Random(5)
    for _ in range(200):
        base = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 8)))
        t = "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 8)))
        # a range containing exactly t: bound must admit t's true distance
        b = _lev_range_lower_bound(base, t, t)
        for k in range(0, 4):
            if _edit_distance_le(base, t, k):
                assert b <= k
                break

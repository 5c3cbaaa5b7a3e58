"""SPIMI build: fixture gen → invert → segment invariants → Ray pipeline."""

import os

import numpy as np
import pyarrow as pa
import pytest

from engine.analyze import analyze_batch
from engine.build import build_index, invert_to_segment
from engine.checkindex import check_index, check_segment
from engine.extract import extract
from engine.fixtures import make_pages, pages_from_documents, write_pages
from engine.segment import Segment

SF_DIR = "/root/testdata/sf0.001"


def test_fixture_pages_byte_identity(tmp_path):
    pages = pages_from_documents(SF_DIR)
    assert pages.num_rows == 500
    # the binding invariant: re-extracting html reproduces text byte-identically
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    for h, t in zip(htmls[:100], texts[:100]):
        assert extract(h).body == t


def test_fixture_token_multiset_matches_documents():
    import pyarrow.parquet as pq

    pages = pages_from_documents(SF_DIR)
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    ptoks, _ = analyze_batch(pages.column("text").to_pylist())
    dtoks, _ = analyze_batch(docs.column("text").to_pylist())
    assert sorted(ptoks) == sorted(dtoks)


def test_synthetic_pages_deterministic():
    a = make_pages(50, seed=42)
    b = make_pages(50, seed=42)
    assert a.equals(b)
    assert extract(a.column("html")[7].as_py()).body == a.column("text")[7].as_py()


def test_invert_to_segment_roundtrip(tmp_path):
    texts = ["a b a c", "b b d", "", "a e e e"]
    doc_ids = np.arange(100, 104)
    seg_dir = str(tmp_path / "p0")
    meta = invert_to_segment(doc_ids, texts, seg_dir)
    assert meta["n_docs"] == 4
    assert meta["sum_ttf"] == 11
    seg = Segment(seg_dir)
    docs, freqs = seg.postings("a")
    np.testing.assert_array_equal(docs, [100, 103])
    np.testing.assert_array_equal(freqs, [2, 1])
    docs, freqs = seg.postings("e")
    np.testing.assert_array_equal(docs, [103])
    np.testing.assert_array_equal(freqs, [3])
    assert seg.term_stats("b") == (2, 3)
    assert seg.term_stats("zzz") == (0, 0)
    assert seg.norm_of(np.array([100, 102])).tolist() == [4, 0]
    check_segment(seg)


def test_invert_idempotent_resume(tmp_path):
    seg_dir = str(tmp_path / "p0")
    m1 = invert_to_segment(np.arange(2), ["x y", "y z"], seg_dir)
    m2 = invert_to_segment(np.arange(2), ["x y", "y z"], seg_dir)  # no-op rewrite
    assert m1 == m2


def test_invert_heavy_term_blocks(tmp_path):
    # a term in >128 docs exercises full FOR blocks + skip arrays
    n = 300
    texts = [f"common u{i:04d}" for i in range(n)]
    seg_dir = str(tmp_path / "p0")
    invert_to_segment(np.arange(n), texts, seg_dir)
    seg = Segment(seg_dir)
    ti = seg.term_info("common")
    assert ti.df == n
    assert len(ti.last_docs) == 3  # 2 full blocks + tail
    check_segment(seg)


@pytest.mark.usefixtures("ray_session")
def test_build_index_ray_pipeline(tmp_path):
    pages = pages_from_documents(SF_DIR)
    data_dir = str(tmp_path / "pages")
    write_pages(pages, data_dir, n_files=4)
    index_dir = str(tmp_path / "index")
    manifest = build_index(data_dir, index_dir, partition_docs=128, from_html=True)
    assert manifest["doc_count"] == 500
    assert len(manifest["partitions"]) >= 4
    check_index(manifest)
    # resume: second call loads the committed manifest, no rebuild
    manifest2 = build_index(data_dir, index_dir, partition_docs=128, from_html=True)
    assert manifest2 == manifest
    # cross-check stats vs a direct tokenization of the corpus
    _, lengths = analyze_batch(pages.column("text").to_pylist())
    assert manifest["sum_ttf"] == int(lengths.sum())


def test_wide_rows_multi_mb_html(tmp_path):
    # SURVEY §7.5 hard part 6: multi-MB html cells must build correctly
    from engine.extract import extract_batch
    import pyarrow as pa

    big_body = ("lorem ipsum dolor sit amet " * 40000).strip()  # ~1 MB
    html = f"<html><head><title>big</title></head><body><p>{big_body}</p></body></html>".encode()
    tbl = pa.table({"doc_id": [0, 1], "html": [html, b"<html><body>tiny doc</body></html>"]})
    ex = extract_batch(tbl)
    seg_dir = str(tmp_path / "wide")
    meta = invert_to_segment(
        ex.column("doc_id").to_numpy(), ex.column("text").to_pylist(), seg_dir
    )
    assert meta["sum_ttf"] == 200000 + 2
    seg = Segment(seg_dir)
    assert seg.term_stats("lorem") == (1, 40000)
    check_segment(seg)


def test_offsets_indexed_end_to_end(tmp_path):
    """index_offsets=True: spans round-trip through invert -> segment ->
    checkindex; every (start, end) span of a term slices exactly that
    term's text in the source doc (OffsetAttribute contract)."""
    import numpy as np

    from engine.build import invert_to_segment
    from engine.checkindex import check_segment
    from engine.segment import Segment

    texts = [
        "Quick brown fox jumps over the lazy dog",
        "the quick    QUICK brown-fox",
        "",
        "punctuation, everywhere! quick... dog?",
    ]
    seg_dir = str(tmp_path / "offseg")
    invert_to_segment(
        np.arange(len(texts), dtype=np.int64), texts, seg_dir, index_offsets=True
    )
    seg = Segment(seg_dir)
    check_segment(seg)  # includes the offsets invariants
    for term in ["quick", "brown", "fox", "dog", "the"]:
        off = seg.offsets(term)
        assert off is not None, term
        docs, freqs = seg.postings(term)
        s_lists, e_lists = off
        assert len(s_lists) == len(docs)
        for d, f, sl, el in zip(docs, freqs, s_lists, e_lists):
            assert len(sl) == f
            low = texts[int(d)].lower()
            for a, b in zip(sl.tolist(), el.tolist()):
                assert low[a:b] == term, (term, d, a, b, low[a:b])


def test_offsets_default_off(tmp_path):
    import numpy as np

    from engine.build import invert_to_segment
    from engine.segment import Segment

    seg_dir = str(tmp_path / "nooffseg")
    invert_to_segment(
        np.arange(2, dtype=np.int64), ["alpha beta", "beta gamma"], seg_dir
    )
    seg = Segment(seg_dir)
    assert seg.offsets("beta") is None
    assert seg.meta["index_options"] == "docs_freqs_positions"

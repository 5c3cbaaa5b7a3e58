"""Merge paths: k-way tree (Path A) and salted groupby-term shuffle (Path B)
must preserve every posting and keep search rank-identical; resume reuses
completed nodes."""

import json
import os

import numpy as np
import pytest

from engine.build import invert_to_segment
from engine.checkindex import check_segment
from engine.checkpoint import finalize_build_manifest, load_merge_manifest
from engine.fixtures import make_pages
from engine.merge import MergedIndex, merge_by_term, merge_segments, merge_tree, plan_merge_tree
from engine.search import IndexSearcher
from engine.segment import Segment

N_DOCS = 1200
N_SEGS = 8

QUERIES = [
    "the00",
    "the19 the03",
    "t00000 t00123",
    "+t00000 +t00001",
    "tiekey",
    "s000300",
    '"the00 the01"',  # phrase: prox streams must survive both merge paths
    '"t00000 t00001"',
]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("mergeidx")
    pages = make_pages(N_DOCS, seed=7)
    texts = pages.column("text").to_pylist()
    rows = []
    per = N_DOCS // N_SEGS
    for s in range(N_SEGS):
        lo, hi = s * per, (s + 1) * per if s < N_SEGS - 1 else N_DOCS
        seg_dir = str(root / f"partitions/p{lo:012d}")
        meta = invert_to_segment(np.arange(lo, hi, dtype=np.int64), texts[lo:hi], seg_dir)
        rows.append({k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")} | {"seg_dir": seg_dir})
    manifest = finalize_build_manifest(str(root), rows)
    return {"root": str(root), "manifest": manifest}


def _all_postings(index_like, terms):
    return {t: tuple(map(tuple, map(np.ndarray.tolist, index_like.postings(t)))) for t in terms}


def test_merge_segments_kway(built, tmp_path):
    m = built["manifest"]
    dirs = [r["seg_dir"] for r in m["partitions"][:3]]
    out = str(tmp_path / "m0")
    meta = merge_segments(dirs, out)
    assert meta["n_docs"] == sum(r["n_docs"] for r in m["partitions"][:3])
    seg = Segment(out)
    check_segment(seg)
    # postings equality vs inputs
    segs = [Segment(d) for d in dirs]
    for t in ["the00", "t00000", "tiekey"]:
        exp_docs = np.concatenate([s.postings(t)[0] for s in segs])
        exp_freqs = np.concatenate([s.postings(t)[1] for s in segs])
        got_docs, got_freqs = seg.postings(t)
        np.testing.assert_array_equal(got_docs, exp_docs)
        np.testing.assert_array_equal(got_freqs, exp_freqs)


def test_plan_merge_tree_deterministic(built):
    rows = built["manifest"]["partitions"]
    p1 = plan_merge_tree(rows, fan_in=3)
    p2 = plan_merge_tree(rows, fan_in=3)
    assert json.dumps(p1, default=str) == json.dumps(p2, default=str)
    assert len(p1) == 2  # 8 -> 3 -> 1


@pytest.mark.usefixtures("ray_session")
def test_merge_tree_and_rank_identity(built):
    m = built["manifest"]
    mm = merge_tree(m, built["root"], fan_in=3)
    assert len(mm["segments"]) == 1
    merged_seg = Segment(mm["segments"][0]["seg_dir"])
    check_segment(merged_seg)
    base = IndexSearcher(m, algorithm="taat")
    merged = IndexSearcher(mm, algorithm="taat")
    merged_wand = IndexSearcher(mm, algorithm="wand")
    for q in QUERIES:
        bd, bs = base.search(q, 20)
        md, ms = merged.search(q, 20)
        wd, ws = merged_wand.search(q, 20)
        np.testing.assert_array_equal(md, bd, err_msg=q)
        np.testing.assert_array_equal(ms, bs, err_msg=q)
        np.testing.assert_array_equal(wd, bd, err_msg=q)
        np.testing.assert_array_equal(ws, bs, err_msg=q)


@pytest.mark.usefixtures("ray_session")
def test_merge_tree_resume_reuses_nodes(built, tmp_path):
    m = built["manifest"]
    root = built["root"]
    # pre-complete the first L1 node out-of-band; merge_tree must adopt it
    g0 = [r["seg_dir"] for r in m["partitions"][:3]]
    pre_dir = os.path.join(root, "merged", "L1", f"m{m['partitions'][0]['doc_base']:012d}")
    pre_meta = merge_segments(g0, pre_dir)
    mm = merge_tree(m, root, fan_in=3)  # may already be committed by prior test
    # the committed manifest's level-1 node reused the pre-completed segment
    with open(os.path.join(pre_dir, "meta.json")) as f:
        assert json.load(f)["wall_ms"] == pre_meta["wall_ms"]
    assert load_merge_manifest(root) == mm


@pytest.mark.usefixtures("ray_session")
def test_merge_by_term_salted(built, tmp_path_factory):
    m = built["manifest"]
    root = str(tmp_path_factory.mktemp("bt"))
    # low threshold so the stop band (df 60-95% of 1200) is genuinely salted
    mm = merge_by_term(m, root, salt_threshold=400, n_salts=4)
    assert mm["kind"] == "merge-by-term"
    assert mm["n_heavy_terms"] >= 15  # the00..the19 band
    assert any("shard-heavy" in s["path"] for s in mm["shards"])
    mi = MergedIndex(root)
    # every posting preserved for light, salted and singleton terms
    segs = [Segment(r["seg_dir"]) for r in m["partitions"]]
    for t in ["the00", "the19", "t00000", "t00777", "tiekey", "s000300"]:
        exp_docs = np.concatenate([s.postings(t)[0] for s in segs])
        exp_freqs = np.concatenate([s.postings(t)[1] for s in segs])
        got_docs, got_freqs = mi.postings(t)
        np.testing.assert_array_equal(got_docs, exp_docs, err_msg=t)
        np.testing.assert_array_equal(got_freqs, exp_freqs, err_msg=t)
    # term count conservation
    all_terms = set()
    for s in segs:
        all_terms.update(s._terms)
    assert sum(sh["n_terms"] for sh in mm["shards"]) == len(all_terms)
    # rank identity through the searcher on the merged-by-term index
    base = IndexSearcher(m, algorithm="taat")
    merged = IndexSearcher(mm, algorithm="taat")
    merged_wand = IndexSearcher(mm, algorithm="wand")
    for q in QUERIES:
        bd, bs = base.search(q, 20)
        md, ms = merged.search(q, 20)
        wd, ws = merged_wand.search(q, 20)
        np.testing.assert_array_equal(md, bd, err_msg=q)
        np.testing.assert_array_equal(ms, bs, err_msg=q)
        np.testing.assert_array_equal(wd, bd, err_msg=q)
        np.testing.assert_array_equal(ws, bs, err_msg=q)
    # resume: second call returns the committed manifest untouched
    assert merge_by_term(m, root) == mm


def test_concat_decoded_reorders_positions():
    # interleaved (non-contiguous) runs force the decode+reorder path for
    # the prox stream; result must equal a straight re-encode
    import numpy as np

    from engine.codec import decode_positions, encode_positions
    from engine.merge import _concat_decoded

    run1 = (
        np.array([5, 20]),
        np.array([2, 1]),
        np.array([3, 3], dtype=np.uint8),
        encode_positions(np.array([1, 4, 0]), np.array([2, 1])),
    )
    run2 = (
        np.array([10]),
        np.array([3]),
        np.array([7], dtype=np.uint8),
        encode_positions(np.array([2, 5, 9]), np.array([3])),
    )
    docs, freqs, norms, blob, off_blob, pay_blob = _concat_decoded([run1, run2])
    assert off_blob == b""  # no offsets shipped in these runs
    assert pay_blob == b""  # no payloads shipped in these runs
    assert docs.tolist() == [5, 10, 20]
    assert freqs.tolist() == [2, 3, 1]
    assert norms.tolist() == [3, 7, 3]
    out = decode_positions(blob, freqs)
    assert [o.tolist() for o in out] == [[1, 4], [2, 5, 9], [0]]


@pytest.mark.usefixtures("ray_session")
def test_sorted_dictionary_level(built, tmp_path_factory):
    """The merged index's dict level (BlockTreeTermsWriter.java:200-217
    role): disjoint sorted term-range files; prefix/range/fuzzy expansion
    reads ONLY overlapping dict files, and the cap keeps the
    lexicographically-first terms deterministically."""
    m = built["manifest"]
    root = str(tmp_path_factory.mktemp("dictlvl"))
    mm = merge_by_term(m, root, salt_threshold=400, n_salts=4)
    assert mm["dict_files"], "dict level missing from manifest"
    # disjoint + sorted ranges covering every term exactly once
    ranges = [(r["term_min"], r["term_max"]) for r in mm["dict_files"]]
    assert ranges == sorted(ranges)
    for (_, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b
    assert sum(r["n_terms"] for r in mm["dict_files"]) == sum(
        s["n_terms"] for s in mm["shards"]
    )
    mi = MergedIndex(root)
    segs = [Segment(r["seg_dir"]) for r in m["partitions"]]
    all_terms = sorted({t for s in segs for t in s._terms})

    # expansion correctness + deterministic lexicographic cap
    exp = [t for t in all_terms if t.startswith("the0")]
    assert mi.expand_prefix("the0", 1024) == exp
    assert mi.expand_prefix("the0", 3) == exp[:3]
    lo, hi = "t00100", "t00200"
    exp_r = [t for t in all_terms if lo <= t <= hi]
    assert mi.expand_range(lo, hi, 1024) == exp_r
    assert mi.expand_range(lo, hi, 5) == exp_r[:5]

    # pruned I/O: only dict files overlapping the prefix interval are read
    import engine.merge as merge_mod

    reads = []
    orig = merge_mod.pq.read_table

    def counting_read(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    merge_mod.pq.read_table = counting_read
    try:
        mi2 = MergedIndex(root)
        reads.clear()
        mi2.expand_prefix("the0", 1024)
    finally:
        merge_mod.pq.read_table = orig
    overlapping = [
        r["path"]
        for r in mm["dict_files"]
        if not (r["term_max"] < "the0" or r["term_min"] > "the0" + chr(0x10FFFF))
    ]
    assert set(reads) <= set(overlapping)
    assert len(reads) < len(mm["dict_files"]) or len(mm["dict_files"]) == 1

    # fuzzy expansion enumerates via pruned dict reads and matches a scan
    from engine.search import FUZZY_DICT_STATS, _fuzzy_expand

    got = _fuzzy_expand(mi, "the00", 1, 50)
    exp_f = [t for t in all_terms if _ed_le(t, "the00", 1)][:50]
    assert sorted(got) == sorted(exp_f)
    # automaton-style shard seek: only dict files whose term-range
    # Levenshtein lower bound admits a match are read (FuzzyQuery.java:247
    # / LevenshteinAutomata.java:33 at file granularity)
    if len(mm["dict_files"]) > 1:
        assert 0 < FUZZY_DICT_STATS["files_read"] < FUZZY_DICT_STATS["files_total"]
    # the range bound is admissible: every skipped file truly has no match
    from engine.search import _lev_range_lower_bound

    for r in mm["dict_files"]:
        if _lev_range_lower_bound("the00", r["term_min"], r["term_max"]) > 1:
            import pyarrow.parquet as _pq

            terms_in = (
                _pq.read_table(r["path"], columns=["term"]).column("term").to_pylist()
            )
            assert not any(_ed_le(t, "the00", 1) for t in terms_in)


def _ed_le(a, b, k):
    from engine.search import _edit_distance_le

    return _edit_distance_le(a, b, k)


@pytest.mark.usefixtures("ray_session")
def test_checkindex_validates_dict_level(built, tmp_path_factory):
    from engine.checkindex import check_merged_index

    root = str(tmp_path_factory.mktemp("cidict"))
    mm = merge_by_term(built["manifest"], root, salt_threshold=400, n_salts=4)
    out = check_merged_index(MergedIndex(root))
    assert out["ok"] and out["n_terms"] == sum(s["n_terms"] for s in mm["shards"])


@pytest.mark.usefixtures("ray_session")
def test_merged_index_norms_lazy(built, tmp_path_factory):
    """Opening a MergedIndex must read NO norm shard (doc bounds come from
    manifest metadata); shards load lazily per doc-range on first query —
    the per-leaf-mmap norms role (Lucene80NormsFormat.java:30-78). At
    10^10 docs a dense whole-corpus load is 10+ GB per searcher worker."""
    m = built["manifest"]
    root = str(tmp_path_factory.mktemp("lazynorms"))
    mm = merge_by_term(m, root, salt_threshold=400, n_salts=4, parts_per_shard=2)
    assert len(mm["norm_shards"]) >= 3, "fixture must produce multiple norm shards"

    import engine.merge as merge_mod

    reads = []
    orig = merge_mod.pq.read_table

    def counting_read(path, *a, **kw):
        reads.append(str(path))
        return orig(path, *a, **kw)

    norm_paths = set(mm["norm_files"])
    merge_mod.pq.read_table = counting_read
    try:
        mi = MergedIndex(root)
        assert not (set(reads) & norm_paths), "open read a norm shard"
        span = mi.norm_span  # metadata-only
        assert not (set(reads) & norm_paths)
        # a single-shard doc range touches exactly one shard file
        reads.clear()
        lo = mm["norm_shards"][0]["doc_lo"]
        one = mi.norm_of(np.array([lo, lo + 1]))
        touched = set(reads) & norm_paths
        assert touched == {mm["norm_shards"][0]["path"]}
    finally:
        merge_mod.pq.read_table = orig

    # values identical to the source segments across every shard boundary
    segs = [Segment(r["seg_dir"]) for r in m["partitions"]]
    all_docs = np.arange(m["doc_count"], dtype=np.int64)
    rng = np.random.default_rng(3)
    probe = rng.permutation(all_docs)[:500]  # unsorted, spans shards
    exp = np.concatenate([s._norms for s in segs])[probe]
    np.testing.assert_array_equal(mi.norm_of(probe), exp)
    assert span == m["doc_count"]
    # search results bit-identical to the segment searcher
    base = IndexSearcher(m, algorithm="taat")
    merged = IndexSearcher(mm, algorithm="taat")
    for q in QUERIES:
        bd, bs = base.search(q, 20)
        md, ms = merged.search(q, 20)
        np.testing.assert_array_equal(md, bd, err_msg=q)
        np.testing.assert_array_equal(ms, bs, err_msg=q)


@pytest.mark.usefixtures("ray_session")
def test_offsets_survive_both_merge_paths(tmp_path_factory):
    """Offsets streams (..._AND_OFFSETS) must byte-concatenate correctly
    through the k-way merge tree AND the salted groupby-term shuffle:
    every merged (start, end) span still slices its term from the source
    doc."""
    import numpy as np

    from engine.checkindex import check_merged_index, check_segment

    root = tmp_path_factory.mktemp("offmerge")
    pages = make_pages(400, seed=23)
    texts = pages.column("text").to_pylist()
    rows = []
    for s in range(4):
        lo, hi = s * 100, (s + 1) * 100
        seg_dir = str(root / f"partitions/p{lo:012d}")
        meta = invert_to_segment(
            np.arange(lo, hi, dtype=np.int64),
            texts[lo:hi],
            seg_dir,
            index_offsets=True,
        )
        rows.append(
            {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
            | {"seg_dir": seg_dir}
        )
    manifest = finalize_build_manifest(str(root), rows)

    def check_spans(reader, terms):
        for term in terms:
            off = reader.offsets(term)
            assert off is not None, term
            docs, freqs = reader.postings(term)
            s_lists, e_lists = off
            assert len(s_lists) == len(docs)
            for d, f, sl, el in zip(docs, freqs, s_lists, e_lists):
                assert len(sl) == f, term
                low = texts[int(d)].lower()
                for a, b in zip(sl.tolist(), el.tolist()):
                    assert low[a:b] == term, (term, int(d))

    probe = ["the00", "the19", "t00000", "tiekey"]
    # Path A: k-way merge tree
    out_a = str(root / "treeseg")
    merge_segments([r["seg_dir"] for r in rows], out_a)
    seg_a = Segment(out_a)
    check_segment(seg_a)
    check_spans(seg_a, probe)
    # Path B: salted shuffle (the00 band genuinely salted)
    root_b = str(tmp_path_factory.mktemp("offmergeb"))
    merge_by_term(manifest, root_b, salt_threshold=150, n_salts=4)
    mi = MergedIndex(root_b)
    check_merged_index(mi)
    check_spans(mi, probe)


def test_offsets_highlighter_fragments():
    """make_snippet_offsets renders original-text fragments around index
    spans — punctuation preserved, all in-window matches marked."""
    from engine.textops import make_snippet_offsets

    text = "Alpha, beta! GAMMA delta; alpha again (beta)."
    # spans of 'alpha' and 'beta' occurrences in lowercased text
    spans = [(0, 5), (7, 11), (26, 31), (39, 43)]
    snip = make_snippet_offsets(text, spans, pad=12, max_fragments=2)
    assert "**Alpha**" in snip and "**beta**" in snip
    assert "GAMMA" in snip  # original casing/punctuation preserved
    # no-span fallback: leading text
    assert make_snippet_offsets(text, [], pad=5) == text[:10]


def test_analyze_offsets_consistent_with_positions():
    from engine.analyze import (
        Analyzer,
        analyze_batch_with_offsets,
        analyze_batch_with_positions,
    )

    texts = ["The quick? brown fox", "", "a " + "x" * 300 + " b"]
    an = Analyzer(stopwords=frozenset({"the"}))
    f1, l1, p1 = analyze_batch_with_positions(texts, an)
    f2, l2, p2, s2, e2 = analyze_batch_with_offsets(texts, an)
    assert f1 == f2 and l1.tolist() == l2.tolist() and p1.tolist() == p2.tolist()
    # spans slice the tokens out of the lowered text
    i = 0
    for t, ln in zip(texts, l2):
        low = t.lower()
        for _ in range(int(ln)):
            assert low[s2[i] : e2[i]] == f2[i]
            i += 1


@pytest.mark.usefixtures("ray_session")
def test_compute_heavy_terms_distributed_tail(built):
    """Above max_driver_rows the candidate sum finishes as a Dataset
    groupby (the driver sees only the heavy set); the result must equal
    the driver-side path exactly."""
    from engine.merge import compute_heavy_terms

    dirs = [r["seg_dir"] for r in built["manifest"]["partitions"]]
    local = compute_heavy_terms(dirs, salt_threshold=400)
    dist = compute_heavy_terms(dirs, salt_threshold=400, max_driver_rows=1)
    assert local == dist
    assert len(local) >= 15  # the00..the19 stop band


def test_bloom_sidecar(built, tmp_path_factory):
    """BloomFilteringPostingsFormat role: the merged dictionary's Bloom
    sidecar proves definite misses with zero shard-file reads, never
    false-negatives an indexed term, and survives reopen from disk."""
    m = built["manifest"]
    root = str(tmp_path_factory.mktemp("bloom"))
    mm = merge_by_term(m, root, salt_threshold=400, n_salts=4)
    assert mm["bloom"] is not None and mm["bloom"]["k"] == 1
    assert os.path.getsize(mm["bloom"]["path"]) == mm["bloom"]["m"] // 8

    mi = MergedIndex(root)
    # no false negatives: every indexed term passes the bloom
    segs = [Segment(r["seg_dir"]) for r in m["partitions"]]
    all_terms = set()
    for s in segs:
        all_terms.update(s._terms)
    for t in all_terms:
        assert not mi._bloom_definite_miss(t), t
    # a definite miss answers (0, 0) without loading ANY shard table
    assert len(mi._tables) == 0
    n_skipped = 0
    for probe in (f"zz-absent-{i}" for i in range(50)):
        if mi._bloom_definite_miss(probe):
            n_skipped += 1
            assert mi.term_stats(probe) == (0, 0)
    assert len(mi._tables) == 0  # bloom-proved misses read nothing
    assert n_skipped >= 40  # ~10% FPR at 10 bits/term, 1 hash
    # present terms still resolve identically through the bloom path
    seg_df = {}
    for t in ["the00", "t00000", "tiekey"]:
        df = sum(s.term_stats(t)[0] for s in segs)
        ttf = sum(s.term_stats(t)[1] for s in segs)
        assert mi.term_stats(t) == (df, ttf), t

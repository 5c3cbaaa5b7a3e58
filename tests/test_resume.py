"""Checkpoint/resume: crash mid-merge and mid-build; completed nodes are
reused, re-runs converge to the same index (the pending_segments_N →
segments_N two-phase-commit model, SURVEY §4)."""

import json
import os
import shutil

import numpy as np
import pytest

from engine.build import build_index, invert_to_segment
from engine.checkindex import check_index, check_segment
from engine.checkpoint import load_manifest, load_merge_manifest
from engine.fixtures import make_pages, write_pages
from engine.merge import merge_segments, merge_tree
from engine.search import IndexSearcher
from engine.segment import Segment


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = tmp_path_factory.mktemp("resume")
    pages = make_pages(600, seed=3)
    data_dir = str(root / "pages")
    write_pages(pages, data_dir, n_files=6)
    return {"root": str(root), "data_dir": data_dir}


@pytest.mark.usefixtures("ray_session")
def test_build_resume_skips_completed_partitions(built):
    index_dir = os.path.join(built["root"], "idx")
    m1 = build_index(built["data_dir"], index_dir, partition_docs=100, from_html=True)
    # crash simulation: manifest lost, partitions intact
    os.remove(os.path.join(index_dir, "manifest.json"))
    m2 = build_index(built["data_dir"], index_dir, partition_docs=100, from_html=True)
    # identical structure AND identical wall_ms per partition => the work
    # was not redone (per-partition meta untouched on resume)
    assert m1 == m2
    check_index(m2)


@pytest.mark.usefixtures("ray_session")
def test_merge_tree_resume_mid_merge(built):
    index_dir = os.path.join(built["root"], "idx")
    manifest = load_manifest(index_dir)
    mm1 = merge_tree(manifest, index_dir, fan_in=2)
    final_dir = mm1["segments"][0]["seg_dir"]
    # crash simulation: final merge level + manifest destroyed, L1 intact
    os.remove(os.path.join(index_dir, "merged", "manifest.json"))
    shutil.rmtree(final_dir)
    l1 = sorted(
        d
        for d in os.listdir(os.path.join(index_dir, "merged", "L1"))
        if not d.startswith(".")
    )
    l1_meta_before = {
        d: json.load(open(os.path.join(index_dir, "merged", "L1", d, "meta.json")))
        for d in l1
    }
    mm2 = merge_tree(manifest, index_dir, fan_in=2)
    # L1 nodes reused byte-for-byte (same wall_ms), final level rebuilt
    for d, meta in l1_meta_before.items():
        now = json.load(open(os.path.join(index_dir, "merged", "L1", d, "meta.json")))
        assert now == meta
    assert mm2["segments"][0]["seg_dir"] == final_dir
    assert mm2["doc_count"] == mm1["doc_count"]
    check_segment(final_dir)
    # the resumed index answers queries identically to the partition index
    base = IndexSearcher(manifest, algorithm="taat")
    merged = IndexSearcher(mm2, algorithm="taat")
    for q in ["the00", "t00000 t00001", "tiekey"]:
        bd, bs = base.search(q, 10)
        md, ms = merged.search(q, 10)
        np.testing.assert_array_equal(md, bd)
        np.testing.assert_array_equal(ms, bs)


def test_retry_idempotence_under_concurrent_write(tmp_path):
    # two "retries" writing the same partition: second is a no-op, content identical
    texts = ["a b c", "d e"]
    d1 = str(tmp_path / "p0")
    m1 = invert_to_segment(np.arange(2), texts, d1)
    m2 = invert_to_segment(np.arange(2), texts, d1)
    assert m1 == m2
    seg = Segment(d1)
    assert seg.term_stats("a") == (1, 1)


def test_resumable_parquet_sink_skips_finished_buckets(ray_session, tmp_path):
    """The data-sink resume contract: a second run skips every finished
    bucket (files untouched — same inode mtime), a deleted bucket is
    rebuilt byte-stably, and the read-back equals the input."""
    import os
    import time

    import pyarrow.parquet as pq
    import ray.data

    from engine.textops import resumable_write_parquet

    out = str(tmp_path / "sink")
    rows = [{"doc_id": i, "v": i * 3} for i in range(200)]
    m1 = resumable_write_parquet(ray.data.from_items(rows), out, n_buckets=6)
    st1 = dict(zip(m1.column("bucket").to_pylist(), m1.column("status").to_pylist()))
    assert set(st1.values()) == {"written"} and len(st1) == 6

    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    time.sleep(0.05)
    m2 = resumable_write_parquet(ray.data.from_items(rows), out, n_buckets=6)
    assert set(m2.column("status").to_pylist()) == {"skipped"}
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == t  # untouched

    # delete one bucket -> only it is rebuilt, byte-stable content
    victim = sorted(mtimes)[2]
    old_bytes = open(os.path.join(out, victim), "rb").read()
    os.remove(os.path.join(out, victim))
    m3 = resumable_write_parquet(ray.data.from_items(rows), out, n_buckets=6)
    st3 = dict(zip(m3.column("bucket").to_pylist(), m3.column("status").to_pylist()))
    assert list(st3.values()).count("written") == 1
    assert open(os.path.join(out, victim), "rb").read() == old_bytes

    back = pq.read_table(out + "/").to_pandas().sort_values("doc_id")
    assert list(back["doc_id"]) == list(range(200))
    assert list(back["v"]) == [i * 3 for i in range(200)]

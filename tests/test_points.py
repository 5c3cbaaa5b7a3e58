"""Numeric points index — the 1-D BKD-tree role (util/bkd/BKDWriter.java
leaf blocks; document/LongPoint.java newRangeQuery INCLUSIVE bounds;
codecs/lucene86/Lucene86PointsFormat .kdd/.kdi/.kdm split): value-sorted
per-segment leaves, row-group stats as the inner tree, CELL_INSIDE /
CELL_CROSSES / CELL_OUTSIDE visiting."""

import numpy as np
import pyarrow as pa
import pytest

from engine.build import invert_to_segment
from engine.checkpoint import finalize_build_manifest
from engine.points import build_points, range_docs, range_docs_file


@pytest.fixture(scope="module")
def pts_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("ptsidx")
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 10_000, 900).astype(np.int64)
    rows = []
    for s in range(3):
        lo, hi = s * 300, (s + 1) * 300
        ids = np.arange(lo, hi, dtype=np.int64)
        seg_dir = str(root / f"partitions/p{lo:012d}")
        dv = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_chars": pa.array(vals[lo:hi], type=pa.int64()),
            }
        )
        texts = ["w%d" % (v % 11) for v in vals[lo:hi]]
        meta = invert_to_segment(ids, texts, seg_dir, doc_values=dv)
        rows.append(
            {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
            | {"seg_dir": seg_dir}
        )
    manifest = finalize_build_manifest(str(root), rows)
    return {"manifest": manifest, "root": str(root), "vals": vals}


@pytest.fixture(scope="module")
def pts_manifest(pts_corpus, ray_session):
    # tiny leaves so one file has many row groups and pruning is observable
    return build_points(
        pts_corpus["manifest"], pts_corpus["root"], "n_chars", rows_per_leaf=32
    )


@pytest.mark.usefixtures("ray_session")
def test_points_range_exact(pts_corpus, pts_manifest):
    vals = pts_corpus["vals"]
    for lo, hi in [(0, 10_000), (2_000, 4_000), (0, 0), (9_999, 10_000), (5_000, 4_000)]:
        got = range_docs(pts_manifest, lo, hi).column("doc_id").to_numpy()
        exp = np.flatnonzero((vals >= lo) & (vals <= hi))  # INCLUSIVE bounds
        np.testing.assert_array_equal(got, exp)


def test_points_leaf_prune(pts_manifest, pts_corpus):
    """A narrow range must read only the overlapping leaf row groups,
    never the whole file (the BKD inner-node prune)."""
    f = pts_manifest["files"][0]
    docs, n_read, n_total = range_docs_file(f["path"], 3_000, 3_200)
    assert n_total >= 8  # 300 rows / 32-leaf => ~10 groups
    assert 0 < n_read < n_total  # pruned, not a full scan
    vals = pts_corpus["vals"][:300]
    np.testing.assert_array_equal(
        np.sort(docs), np.flatnonzero((vals >= 3_000) & (vals <= 3_200))
    )


def test_points_file_level_prune(pts_manifest):
    """Files whose [min,max] misses the range are skipped entirely
    (CELL_OUTSIDE_QUERY at the file level)."""
    for f in pts_manifest["files"]:
        docs, n_read, _ = range_docs_file(f["path"], 100_000, 200_000)
        assert n_read == 0 and len(docs) == 0


@pytest.mark.usefixtures("ray_session")
def test_points_build_idempotent(pts_corpus, pts_manifest):
    """Re-running build_points reuses the manifest (write-once resume)."""
    again = build_points(
        pts_corpus["manifest"], pts_corpus["root"], "n_chars", rows_per_leaf=32
    )
    assert again == pts_manifest


def test_points_inside_cell_fast_path(pts_manifest, pts_corpus):
    """A range covering everything takes every doc with zero boundary
    masking (CELL_INSIDE_QUERY visitDocIDs path) — result still exact."""
    f = pts_manifest["files"][1]
    docs, n_read, n_total = range_docs_file(f["path"], -1, 1 << 40)
    assert n_read == n_total
    assert len(docs) == 300

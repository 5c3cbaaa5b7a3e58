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


# ---------------------------------------------------------------------------
# 2-D points (k-d BKD role: alternating median splits, 2-D leaf pruning)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def points2d(tmp_path_factory, ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.points import build_points_2d

    rng = np.random.default_rng(7)
    n = 5000
    x = rng.integers(0, 1000, n, dtype=np.int64)
    y = rng.integers(0, 1000, n, dtype=np.int64)
    src = str(tmp_path_factory.mktemp("pts2dsrc") / "src.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        ),
        src,
        row_group_size=1250,
    )
    out = str(tmp_path_factory.mktemp("pts2d"))
    man = build_points_2d(
        src, out, fields=("x", "y"), rows_per_leaf=128, rows_per_file=2500
    )
    return man, x, y


@pytest.mark.usefixtures("ray_session")
def test_points2d_box_vs_brute_force(points2d):
    from engine.points import box_docs_2d

    man, x, y = points2d
    assert len(man["files"]) == 2  # rows_per_file split the source spans
    for box in [(100, 300, 400, 700), (0, 999, 0, 999), (500, 400, 0, 10),
                (990, 999, 990, 999)]:
        got = np.sort(
            np.array(
                [r["doc_id"] for r in box_docs_2d(man, *box).take_all()],
                dtype=np.int64,
            )
        )
        exp = np.flatnonzero(
            (x >= box[0]) & (x <= box[1]) & (y >= box[2]) & (y <= box[3])
        )
        np.testing.assert_array_equal(got, exp)


def test_points2d_leaf_prune_both_dims(points2d):
    """A narrow box reads only a fraction of the kd leaves — the
    alternating-dim splits give BOTH dims pruning power, unlike a 1-D
    sort where the second dim's stats are useless."""
    from engine.points import box_docs_2d_file

    man, _x, _y = points2d
    f = man["files"][0]
    _docs, n_read, n_total = box_docs_2d_file(f["path"], 100, 200, 100, 200)
    assert n_total >= 15
    assert n_read < n_total / 2


def test_points2d_build_idempotent(points2d):
    from engine.points import build_points_2d

    man, _x, _y = points2d
    src_dir = man["files"][0]["path"].rsplit("/", 1)[0]
    again = build_points_2d(
        "unused", src_dir, fields=("x", "y"), rows_per_leaf=128
    )
    assert again == man


def test_index_or_dv_cost_paths():
    """IndexOrDocValuesQuery role: both strategies return the identical
    doc set, and the footer-stats estimate orders the costs sensibly."""
    from engine.pipelines import get_points, index_or_dv_filter_docs
    from engine.points import range_docs, range_estimate

    sf = "/root/testdata/sf0.01"
    _idx, pts = get_points(sf)
    # estimate is an upper bound of the true count and prunes to 0
    # outside the value domain
    true_n = range_docs(pts, 150, 400).num_rows
    est = range_estimate(pts, 150, 400)
    assert est >= true_n > 0
    assert range_estimate(pts, 10**9, 2 * 10**9) == 0
    # a wide range makes the term lead (dvQuery path); a degenerate range
    # makes the points side lead (indexQuery path) — same result set as
    # the generic two-funnel intersection either way
    from engine.pipelines import term_points_filter_docs

    wide = index_or_dv_filter_docs(sf, "data", 0, 10**9)
    wide_ref = term_points_filter_docs(sf, "data", 0, 10**9)
    assert wide.column("doc_id").to_pylist() == wide_ref.column("doc_id").to_pylist()
    mid = index_or_dv_filter_docs(sf, "data", 150, 400)
    mid_ref = term_points_filter_docs(sf, "data", 150, 400)
    assert mid.column("doc_id").to_pylist() == mid_ref.column("doc_id").to_pylist()


def test_range_field_relations():
    """RangeFieldQuery: intersect set + WITHIN/CONTAINS/CROSSES
    classification equals brute recomputation; equal ranges -> WITHIN."""
    import numpy as np
    import pyarrow.parquet as pq

    from engine.pipelines import range_field_match_docs
    from engine.points import synth_ranges

    sf = "/root/testdata/sf0.01"
    out = (
        range_field_match_docs(sf, 3000, 6000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    lo, hi = synth_ranges(ids)
    inter = (hi >= 3000) & (lo <= 6000)
    assert out["doc_id"].tolist() == ids[inter].tolist()
    within = (lo >= 3000) & (hi <= 6000)
    contains = (lo <= 3000) & (hi >= 6000)
    exp = np.where(within, "WITHIN", np.where(contains, "CONTAINS", "CROSSES"))
    assert out["relation"].tolist() == exp[inter].tolist()
    assert {"WITHIN", "CROSSES"} <= set(out["relation"])  # both occur
    # a query equal to one doc's range classifies WITHIN
    one = range_field_match_docs(sf, int(lo[7]), int(hi[7])).to_pandas()
    assert one.loc[one.doc_id == 7, "relation"].iloc[0] == "WITHIN"

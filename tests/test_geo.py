"""Geo point index — LatLonPoint role (document/LatLonPoint.java
newBoxQuery/newDistanceQuery; geo/Rectangle.java fromPointDistance;
util/SloppyMath.java haversin on GeoUtils.EARTH_MEAN_RADIUS_METERS):
2-D leaves sorted by lat, box/distance/nearest-k all checked against
brute force over the deterministic coordinate fixture."""

import numpy as np
import pytest

from engine.geo import (
    box_docs,
    box_docs_file,
    build_geo,
    distance_docs,
    haversin_meters,
    nearest_k,
    synth_latlon,
)

N_DOCS = 1200


def _doc_ids(ds):
    """Collect a (bounded, test-sized) doc_id Dataset to a sorted array."""
    rows = ds.take_all()
    return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))



@pytest.fixture(scope="module")
def geo_manifest(tmp_path_factory, ray_session):
    root = str(tmp_path_factory.mktemp("geoidx"))
    manifest = {
        "partitions": [
            {"doc_base": s * 400, "n_docs": 400, "seg_dir": "unused"}
            for s in range(3)
        ]
    }
    return build_geo(manifest, root, rows_per_leaf=64)


@pytest.fixture(scope="module")
def coords():
    lat, lon = synth_latlon(np.arange(N_DOCS, dtype=np.int64))
    return lat, lon


@pytest.mark.usefixtures("ray_session")
def test_box_query_exact(geo_manifest, coords):
    lat, lon = coords
    for b in [(-30000, 30000, -60000, 90000), (-90000, 89999, -180000, 179999),
              (0, 0, -180000, 179999), (50000, 40000, 0, 1000)]:
        got = _doc_ids(box_docs(geo_manifest, *b))
        exp = np.flatnonzero(
            (lat >= b[0]) & (lat <= b[1]) & (lon >= b[2]) & (lon <= b[3])
        )
        np.testing.assert_array_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_box_query_dateline_crossing(geo_manifest, coords):
    """min_lon > max_lon crosses the dateline: lon >= min OR lon <= max."""
    lat, lon = coords
    got = _doc_ids(box_docs(geo_manifest, -90000, 90000, 150000, -150000))
    exp = np.flatnonzero((lon >= 150000) | (lon <= -150000))
    np.testing.assert_array_equal(got, exp)


def test_box_leaf_prune(geo_manifest):
    """A narrow lat band reads only overlapping leaf groups (files are
    lat-sorted, so most groups are outside)."""
    f = geo_manifest["files"][0]
    _docs, n_read, n_total = box_docs_file(f["path"], 0, 5000, -180000, 179999)
    assert n_total >= 5
    assert 0 < n_read < n_total


@pytest.mark.usefixtures("ray_session")
def test_distance_query_vs_brute_force(geo_manifest, coords):
    lat, lon = coords
    for (qlat, qlon, r) in [(10.0, 20.0, 2_000_000.0), (89.0, 0.0, 500_000.0),
                            (0.0, 179.9, 3_000_000.0)]:
        got = _doc_ids(distance_docs(geo_manifest, qlat, qlon, r))
        d = haversin_meters(lat / 1000.0, lon / 1000.0, qlat, qlon)
        exp = np.flatnonzero(d <= r)
        np.testing.assert_array_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_nearest_k_vs_brute_force(geo_manifest, coords):
    lat, lon = coords
    d = haversin_meters(lat / 1000.0, lon / 1000.0, 10.0, 20.0)
    exp = np.lexsort((np.arange(N_DOCS), d))[:10]
    got = nearest_k(geo_manifest, 10.0, 20.0, 10)
    np.testing.assert_array_equal(got.column("doc_id").to_numpy(), exp)
    # emitted distances are the scalar-libm oracle op order (round-4
    # exactness promotion): bit-equal to the scalar recompute, within
    # ulp noise of the vectorized reference
    import math

    def scalar_d(la, lo):
        t1 = math.sin(math.radians(10.0 - la) / 2.0)
        t2 = math.sin(math.radians(20.0 - lo) / 2.0)
        h = t1 * t1 + math.cos(math.radians(la)) * math.cos(
            math.radians(10.0)
        ) * (t2 * t2)
        return 2.0 * 6371008.7714 * math.asin(min(1.0, math.sqrt(h)))

    exp_scalar = [scalar_d(lat[i] / 1000.0, lon[i] / 1000.0) for i in exp]
    np.testing.assert_array_equal(got.column("dist_m").to_numpy(), exp_scalar)
    np.testing.assert_allclose(got.column("dist_m").to_numpy(), d[exp], rtol=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_geo_build_idempotent(geo_manifest, tmp_path_factory):
    root = geo_manifest["files"][0]["path"].rsplit("/geo_points/", 1)[0]
    manifest = {
        "partitions": [
            {"doc_base": s * 400, "n_docs": 400, "seg_dir": "unused"}
            for s in range(3)
        ]
    }
    assert build_geo(manifest, root, rows_per_leaf=64) == geo_manifest


def test_haversin_known_value():
    """Paris→London ≈ 343-344 km on the mean-radius sphere."""
    d = haversin_meters(np.array([48.8566]), np.array([2.3522]), 51.5074, -0.1278)
    assert 340_000 < d[0] < 348_000


@pytest.mark.usefixtures("ray_session")
def test_polygon_query_vs_brute_force(geo_manifest, coords):
    """Polygon interior (even-odd integer parity) vs an independent
    matplotlib-free reference: the shoelace-free crossing count computed
    per point in pure Python."""
    from engine.geo import point_in_polygon_mask, polygon_docs

    lat, lon = coords
    poly = [(-40000, -120000), (45000, -90000), (60000, 30000),
            (0, 100000), (-55000, 20000)]

    def ref_inside(py, px):
        inside = False
        n = len(poly)
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py):
                t = (px - x1) * (y2 - y1) - (x2 - x1) * (py - y1)
                if (t < 0) if y2 > y1 else (t > 0):
                    inside = not inside
        return inside

    exp = np.array([ref_inside(int(a), int(o)) for a, o in zip(lat, lon)])
    got_mask = point_in_polygon_mask(lat, lon, poly)
    np.testing.assert_array_equal(got_mask, exp)
    got = _doc_ids(polygon_docs(geo_manifest, poly))
    np.testing.assert_array_equal(got, np.flatnonzero(exp))
    # a polygon is not its bounding box: the mask must differ from it
    bbox = (lat >= -55000) & (lat <= 60000) & (lon >= -120000) & (lon <= 100000)
    assert got_mask.sum() < bbox.sum()


def test_shape_box_relations():
    """LatLonShape box query: INTERSECTS vs WITHIN agree with a brute
    recomputation over all docs, and boundary diamonds classify right."""
    import numpy as np

    from engine.geo import synth_latlon, synth_shape_arm
    from engine.pipelines import shape_box_match_docs

    sf = "/root/testdata/sf0.01"
    b = (-30_000, 30_000, -60_000, 90_000)
    out = (
        shape_box_match_docs(sf, *b)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    lat, lon = synth_latlon(ids)
    arm = synth_shape_arm(ids)
    ax = np.maximum(0, np.maximum(b[2] - lon, lon - b[3]))
    ay = np.maximum(0, np.maximum(b[0] - lat, lat - b[1]))
    inter = (ax + ay) <= arm
    within = (
        (lat - arm >= b[0]) & (lat + arm <= b[1])
        & (lon - arm >= b[2]) & (lon + arm <= b[3])
    )
    assert out["doc_id"].tolist() == ids[inter].tolist()
    exp_rel = np.where(within[inter], "WITHIN", "INTERSECTS")
    assert out["relation"].tolist() == exp_rel.tolist()
    # a crossing diamond exists whenever the box edge cuts one (both
    # relations occur at this box on this corpus)
    assert set(out["relation"]) == {"WITHIN", "INTERSECTS"}


def test_heatmap_facet_counts():
    """Heatmap faceting: cell counts conserve the box match count and
    equal a brute per-cell recomputation."""
    import numpy as np
    import pyarrow.parquet as pq

    from engine.pipelines import geo_box_match_docs, geo_heatmap_facet
    from engine.geo import synth_latlon

    sf = "/root/testdata/sf0.01"
    b = (-60_000, 60_000, -120_000, 120_000)
    out = geo_heatmap_facet(sf, *b, grid=8).to_pandas()
    n_box = geo_box_match_docs(sf, *b).to_pandas().shape[0]
    assert out["cnt"].sum() == n_box  # conservation
    n = pq.read_metadata(f"{sf}/documents.parquet").num_rows
    ids = np.arange(n, dtype=np.int64)
    lat, lon = synth_latlon(ids)
    m = (lat >= b[0]) & (lat <= b[1]) & (lon >= b[2]) & (lon <= b[3])
    row = ((lat[m] - b[0]) * 8) // (b[1] - b[0] + 1)
    col = ((lon[m] - b[2]) * 8) // (b[3] - b[2] + 1)
    brute = np.zeros(64, dtype=np.int64)
    np.add.at(brute, row * 8 + col, 1)
    got = np.zeros(64, dtype=np.int64)
    got[out["cell_row"] * 8 + out["cell_col"]] = out["cnt"]
    np.testing.assert_array_equal(got, brute)

"""FeatureField: encode/decode bit semantics, score-function op order,
auto-pivot, sidecar build + range-routed reads (document/FeatureField.java)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from engine.feature import (
    MAX_FREQ,
    FeatureReader,
    build_feature_sidecar,
    compute_pivot,
    decode_feature_values,
    encode_feature_values,
    log_scores,
    saturation_scores,
    sigmoid_scores,
)


def _bits(v: float) -> int:
    """Java Float.floatToIntBits for finite values."""
    return struct.unpack(">I", struct.pack(">f", v))[0]


def _from_bits(b: int) -> float:
    return struct.unpack(">f", struct.pack(">I", b & 0xFFFFFFFF))[0]


def test_encode_matches_float_to_int_bits():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            rng.uniform(1e-30, 1e30, 200).astype(np.float32),
            np.array([1.0, 2.0, 0.5, 3.3e38, np.finfo(np.float32).tiny], np.float32),
        ]
    )
    freqs = encode_feature_values(vals)
    for v, f in zip(vals, freqs):
        assert int(f) == _bits(float(v)) >> 15


def test_decode_is_truncation_and_max_freq_guard():
    rng = np.random.default_rng(4)
    vals = rng.uniform(1e-3, 1e6, 300).astype(np.float32)
    dec = decode_feature_values(encode_feature_values(vals))
    for v, d in zip(vals, dec):
        expected = _from_bits((_bits(float(v)) >> 15) << 15)
        assert float(d) == expected
        assert d <= v  # mantissa truncation never rounds up
        assert (v - d) / v < 2 ** -8  # documented relative precision
    # freq > MAX_FREQ -> Float.MAX_VALUE (FeatureField.java:202-207)
    big = decode_feature_values(np.array([MAX_FREQ + 1], dtype=np.int64))
    assert big[0] == np.finfo(np.float32).max


def test_encode_rejects_illegal_values():
    for bad in [0.0, -1.0, np.nan, np.inf, float(np.finfo(np.float32).tiny) / 2]:
        with pytest.raises(ValueError):
            encode_feature_values(np.array([1.0, bad], dtype=np.float32))


def test_saturation_scalar_op_order_and_monotonicity():
    freqs = encode_feature_values(
        np.array([1.0, 3.0, 7.5, 100.0, 54321.0], np.float32)
    )
    pivot = np.float32(7584.0)
    got = saturation_scores(freqs, 0.75, pivot)
    s = decode_feature_values(freqs)
    for i in range(len(s)):
        t1 = np.float32(s[i] + pivot)
        t2 = np.float32(pivot / t1)
        t3 = np.float32(np.float32(1.0) - t2)
        assert got[i] == np.float32(np.float32(0.75) * t3)
    # 1 - k/(f+k) form: never decreases with f despite rounding
    many = np.arange(1, 5000, dtype=np.int64) + int(
        encode_feature_values(np.array([1.0], np.float32))[0]
    )
    sc = saturation_scores(many, 1.0, pivot)
    assert np.all(np.diff(sc) >= 0)


def test_log_and_sigmoid_scalar_op_order():
    freqs = encode_feature_values(np.array([1.0, 99.0, 1234.5], np.float32))
    s = decode_feature_values(freqs)
    lg = log_scores(freqs, 1.5, 1.0)
    for i in range(len(s)):
        assert lg[i] == np.float32(
            float(np.float32(1.5)) * math.log(float(np.float32(np.float32(1.0) + s[i])))
        )
    pivot = np.float32(42.0)
    sg = sigmoid_scores(freqs, 2.0, pivot, 0.6)
    a = float(np.float32(0.6))
    ppa = math.pow(float(pivot), a)
    for i in range(len(s)):
        assert sg[i] == np.float32(
            float(np.float32(2.0)) * (1.0 - ppa / (math.pow(float(s[i]), a) + ppa))
        )


def test_compute_pivot_truncates_avg_freq():
    freqs = encode_feature_values(np.array([2.0, 3.0, 1000.0], np.float32))
    df, ttf = 3, int(freqs.sum())
    avg = np.float32(np.float64(ttf) / df)
    expected = _from_bits((int(avg) << 15) & 0xFFFFFFFF)
    assert compute_pivot(df, ttf) == np.float32(expected)
    assert compute_pivot(0, 0) == np.float32(1.0)  # df=0 -> legal dummy


def test_sidecar_build_and_range_routed_reads(ray_session, tmp_path):
    n = 1000
    src = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), type=pa.int64()),
                "n_chars": pa.array((np.arange(n) * 7) % 4096, type=pa.int64()),
            }
        ),
        src,
    )
    out = str(tmp_path / "feat")
    manifest = build_feature_sidecar(str(src), out)
    expected_freq = encode_feature_values(
        (1 + (np.arange(n) * 7) % 4096).astype(np.float32)
    )
    assert manifest["df"] == n
    assert manifest["ttf"] == int(expected_freq.sum())
    assert manifest["max_freq"] == int(expected_freq.max())
    rdr = FeatureReader(out, manifest)
    probe = np.array([0, 17, 999, 500, 123456], dtype=np.int64)  # last: absent
    got = rdr.freq_for(probe)
    assert list(got[:4]) == [int(expected_freq[d]) for d in probe[:4]]
    assert got[4] == 0  # absent doc -> freq 0 (not a legal encode)


def test_feature_field_topk_matches_independent_combination(ray_session):
    """End-to-end on sf0.001: the entry's combined score must equal an
    independent recombination from the searcher's raw scores and the
    scalar-path feature math."""
    from engine import pipelines
    from engine.checkpoint import load_merge_manifest
    from engine.feature import load_feature_manifest
    from engine.search import IndexSearcher

    sf = "/root/testdata/sf0.001"
    out = pipelines.feature_field_topk(sf, k=10)
    assert out.num_rows > 0
    idx = pipelines.get_index(sf)
    import os

    feat_dir = os.path.join(os.path.dirname(idx["index_dir"]), "features", "pagerank")
    manifest = load_feature_manifest(feat_dir)
    rdr = FeatureReader(feat_dir, manifest)
    searcher = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    docs, scores = searcher.search("data join", k=searcher.doc_count)
    pivot = compute_pivot(manifest["df"], manifest["ttf"])
    by_doc = dict(zip(docs.tolist(), scores.tolist()))
    for r in out.to_pylist():
        f = rdr.freq_for(np.array([r["doc_id"]], dtype=np.int64))
        satu = saturation_scores(f, 1.0, pivot)[0]
        exp = np.float32(np.float64(np.float32(by_doc[r["doc_id"]])) + np.float64(satu))
        assert np.float32(r["score"]) == exp


def test_distance_feature_scalar_op_order_and_saturation():
    from engine.feature import distance_feature_scores

    vals = np.array([0, 500, 1000, 1500, 10**6], dtype=np.int64)
    got = distance_feature_scores(vals, origin=1000, pivot_distance=500, boost=1.5)
    for i, v in enumerate(vals):
        d = abs(int(v) - 1000)
        assert got[i] == np.float32(
            float(np.float32(1.5)) * (500.0 / (500.0 + float(d)))
        )
    # long-overflow saturation -> Long.MAX_VALUE distance (score ~ 0)
    sat = distance_feature_scores(
        np.array([2**62], dtype=np.int64), origin=-(2**62) - 10, pivot_distance=5
    )
    assert sat[0] == np.float32(5.0 / (5.0 + float(2**63 - 1)))
    with pytest.raises(ValueError):
        distance_feature_scores(vals, 0, 0)

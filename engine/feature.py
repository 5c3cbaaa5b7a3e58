"""FeatureField: query-independent static scoring factors (pagerank-style)
stored as term frequencies and fused with BM25 at query time.

Reference semantics (document/FeatureField.java, FeatureQuery.java):

- A feature value ``S`` (positive, finite, normal float32) is encoded as
  the pseudo term frequency ``floatToIntBits(S) >>> 15`` — the sign+
  exponent+top-8-mantissa bits (FeatureField.java:150-158), i.e. values
  are kept with 2^-8 relative precision. ``decodeFeatureValue`` is the
  exact inverse ``intBitsToFloat(tf << 15)`` with the ``freq > MAX_FREQ``
  saturation guard (FeatureField.java:200-212).
- Three score shapes over the decoded value (FeatureField.java:70-90):
  ``log``  : (float)(w * Math.log(a + S))          — f32 add, f64 log/mul
  ``satu`` : w * (1 - pivot / (S + pivot))          — all-float32 chain
             (written 1 - k/(f+k) so rounding never makes it decrease
             with f, FeatureField.java:314-325)
  ``sigm`` : (float)(w * (1 - pivot^a / (S^a + pivot^a))) — f64 pow chain
- Auto-pivot (computePivotFeatureValue, FeatureField.java:511-523):
  ``decodeFeatureValue((float)((double) totalTermFreq / docFreq))`` — an
  approximate geometric mean because the exponent rides the high bits.
- Putting the feature query as a SHOULD clause next to a BM25 query
  combines them linearly: BooleanQuery accumulates clause scores in
  double and casts once (the engine's existing bool-sum op order).

Engine layout (Ray-Data-first, not a port): one parquet sidecar per
feature under ``<root>/features/<name>/`` — rows ``(doc_id, freq)`` in
doc order, one file per input batch with its ``[doc_lo, doc_hi]`` range
in the manifest for candidate-pruned lookups, plus ``{df, ttf}``
persisted at WRITE time so the auto-pivot (the TermStates.build role)
costs zero I/O at query time. The build is a streaming ``map_batches``
over the pruned source columns; nothing materializes on the driver but
the per-batch manifest rows. Residual for 100x: the reference stores
features as postings so block-max impacts (max freq per block) feed
WAND skipping; the sidecar keeps per-file max freq in the manifest for
the same upper-bound role but the WAND planner does not consume feature
clauses yet.
"""

from __future__ import annotations

import json
import math
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .rayenv import read_parquet_clean, remote_args

#: floatToIntBits(Float.MAX_VALUE) >>> 15 (FeatureField.java:200)
MAX_FREQ = int(np.float32(np.finfo(np.float32).max).view(np.uint32)) >> 15
#: Float.MIN_NORMAL — smallest legal feature value (FeatureField.java:139)
MIN_NORMAL = float(np.finfo(np.float32).tiny)


def encode_feature_values(values: np.ndarray) -> np.ndarray:
    """float32 feature values -> pseudo term frequencies (int64).

    Validates the reference's contract: finite, positive, normal
    (FeatureField.java:134-145) — subnormals/zero/negatives/NaN/inf all
    raise, loudly, exactly like setFeatureValue."""
    v = np.asarray(values, dtype=np.float32)
    if len(v) and (not np.all(np.isfinite(v)) or np.any(v < MIN_NORMAL)):
        bad = v[~(np.isfinite(v) & (v >= MIN_NORMAL))][:3]
        raise ValueError(
            f"featureValue must be a positive normal finite float, got {bad}"
        )
    return (v.view(np.uint32) >> np.uint32(15)).astype(np.int64)


def decode_feature_values(freqs: np.ndarray) -> np.ndarray:
    """Pseudo term frequencies -> float32 feature values, with the
    freq > MAX_FREQ -> Float.MAX_VALUE guard (FeatureField.java:202-207)."""
    tf = np.asarray(freqs, dtype=np.int64)
    out = (tf.astype(np.uint32) << np.uint32(15)).view(np.float32).copy()
    out[tf > MAX_FREQ] = np.finfo(np.float32).max
    return out


def compute_pivot(df: int, ttf: int) -> np.float32:
    """computePivotFeatureValue (FeatureField.java:511-523): decode of
    the float-cast average freq; 1.0 when the feature is absent."""
    if df == 0:
        return np.float32(1.0)
    avg = np.float32(np.float64(ttf) / np.float64(df))
    return decode_feature_values(np.array([int(avg)], dtype=np.int64))[0]


def log_scores(freqs: np.ndarray, weight: float, scaling: float) -> np.ndarray:
    """(float)(w * Math.log(a + S)) — a+S in float32, log/mul in float64
    (FeatureField.java:248-253). scaling must be >= 1."""
    s = decode_feature_values(freqs)
    t = (np.float32(scaling) + s).astype(np.float32)
    return (np.float64(np.float32(weight)) * np.log(t.astype(np.float64))).astype(
        np.float32
    )


def saturation_scores(
    freqs: np.ndarray, weight: float, pivot: np.float32
) -> np.ndarray:
    """w * (1 - pivot / (S + pivot)) — the all-float32 chain of
    SaturationFunction.scorer (FeatureField.java:314-325)."""
    s = decode_feature_values(freqs)
    p = np.float32(pivot)
    t1 = (s + p).astype(np.float32)
    t2 = (p / t1).astype(np.float32)
    t3 = (np.float32(1.0) - t2).astype(np.float32)
    return (np.float32(weight) * t3).astype(np.float32)


def sigmoid_scores(
    freqs: np.ndarray, weight: float, pivot: np.float32, exp: float
) -> np.ndarray:
    """(float)(w * (1 - pivot^a / (S^a + pivot^a))) — pivot^a computed
    once at scorer build, pow/div in float64 (FeatureField.java:374-382);
    the float params promote to double exactly as in Java."""
    s = decode_feature_values(freqs).astype(np.float64)
    a = float(np.float32(exp))
    pivot_pa = math.pow(float(np.float32(pivot)), a)
    return (
        np.float64(np.float32(weight))
        * (1.0 - pivot_pa / (np.power(s, a) + pivot_pa))
    ).astype(np.float32)


def build_feature_sidecar(
    source_parquet: str,
    out_dir: str,
    feature: str = "pagerank",
    source_col: str = "n_chars",
) -> dict:
    """Stream the source table (pruned to doc_id + source_col) through an
    encode map_batches and write the per-feature sidecar: one file per
    batch with its doc range + per-file df/ttf/max_freq manifest rows
    (the write-time TermStates). Feature value = float32(1 + source_col)
    (FeatureField's guidance: store positively-correlated factors only).

    Returns the manifest dict; atomic via tmp+rename on the manifest."""
    os.makedirs(out_dir, exist_ok=True)

    def _encode_write(b: pa.Table) -> pa.Table:
        doc_ids = b.column("doc_id").to_numpy()
        raw = b.column(source_col).to_numpy()
        vals = (1 + raw).astype(np.float32)
        freq = encode_feature_values(vals)
        name = f"feat-{uuid.uuid4().hex[:12]}.parquet"
        tmp = os.path.join(out_dir, "." + name)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(doc_ids, type=pa.int64()),
                    "freq": pa.array(freq, type=pa.int64()),
                }
            ),
            tmp,
        )
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table(
            {
                "file": pa.array([name]),
                "doc_lo": pa.array([int(doc_ids.min())], type=pa.int64()),
                "doc_hi": pa.array([int(doc_ids.max())], type=pa.int64()),
                "df": pa.array([len(freq)], type=pa.int64()),
                "ttf": pa.array([int(freq.sum())], type=pa.int64()),
                "max_freq": pa.array([int(freq.max())], type=pa.int64()),
            }
        )

    ds = read_parquet_clean(source_parquet, columns=["doc_id", source_col])
    rows = sorted(
        ds.map_batches(_encode_write, batch_format="pyarrow", **remote_args())
        .take_all(),  # bounded: one manifest row per batch
        key=lambda r: r["doc_lo"],
    )
    for a, b in zip(rows, rows[1:]):  # range routing needs disjoint files
        assert a["doc_hi"] < b["doc_lo"], "feature sidecar doc ranges overlap"
    manifest = {
        "feature": feature,
        "source_col": source_col,
        "df": int(sum(r["df"] for r in rows)),
        "ttf": int(sum(r["ttf"] for r in rows)),
        "max_freq": max((int(r["max_freq"]) for r in rows), default=0),
        "files": rows,
    }
    tmp = os.path.join(out_dir, ".manifest.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest


def load_feature_manifest(out_dir: str) -> dict | None:
    p = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


class FeatureReader:
    """Doc-range-routed lazy freq lookup over the sidecar files (the
    TermScorer advance of FeatureQuery) — a worker touches only the
    files its candidate docs hit; touched files stay cached."""

    def __init__(self, out_dir: str, manifest: dict):
        rows = sorted(manifest["files"], key=lambda r: int(r["doc_lo"]))
        self._dir = out_dir
        self._lo = np.array([int(r["doc_lo"]) for r in rows], dtype=np.int64)
        self._files = [r["file"] for r in rows]
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def freq_for(self, doc_ids: np.ndarray) -> np.ndarray:
        """Pseudo freqs aligned with doc_ids; 0 (= feature absent, never
        a legal encode of a normal float) where the doc has no value."""
        docs = np.asarray(doc_ids, dtype=np.int64)
        out = np.zeros(len(docs), dtype=np.int64)
        if len(docs) == 0:
            return out
        idx = np.searchsorted(self._lo, docs, side="right") - 1
        for j in np.unique(idx):
            if j < 0:
                continue
            hit = self._cache.get(int(j))
            if hit is None:
                tbl = pq.read_table(os.path.join(self._dir, self._files[j]))
                hit = (
                    tbl.column("doc_id").to_numpy(),
                    tbl.column("freq").to_numpy(),
                )
                self._cache[int(j)] = hit
            r_docs, r_freq = hit
            m = idx == j
            pos = np.clip(np.searchsorted(r_docs, docs[m]), 0, len(r_docs) - 1)
            ok = r_docs[pos] == docs[m]
            sel = np.flatnonzero(m)
            out[sel[ok]] = r_freq[pos[ok]]
        return out


def distance_feature_scores(
    values: np.ndarray, origin: int, pivot_distance: int, boost: float = 1.0
) -> np.ndarray:
    """LongDistanceFeatureQuery scoring (document/LongDistanceFeatureQuery
    .java:110-116, the FeatureField.newDistanceFeatureQuery family —
    recency/proximity decay over a numeric doc value): distance =
    max(v, origin) - min(v, origin) in exact long arithmetic saturating to
    Long.MAX_VALUE on overflow, then
    score = (float)(boost * (pivotDistance / (pivotDistance + (double) d)))
    with pivotDistance > 0 required."""
    if pivot_distance <= 0:
        raise ValueError(f"pivotDistance must be > 0, got {pivot_distance}")
    v = np.asarray(values, dtype=np.int64)
    big = np.maximum(v, np.int64(origin))
    small = np.minimum(v, np.int64(origin))
    with np.errstate(over="ignore"):
        d = big - small
    d = np.where(d < 0, np.iinfo(np.int64).max, d)  # long-overflow saturation
    return (
        np.float64(np.float32(boost))
        * (np.float64(pivot_distance) / (np.float64(pivot_distance) + d.astype(np.float64)))
    ).astype(np.float32)

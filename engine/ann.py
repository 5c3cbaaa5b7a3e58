"""Similarity search over embedding columns.

- ``brute_force_topk_ds``: exact cosine top-k — the query matrix is
  broadcast once with ray.put, each map_batches task does one numpy matmul
  per batch against it (vectorized, zero-copy from the Arrow list column),
  emits per-batch partial top-k rows, and a tiny groupby(query) reduce
  keeps the global top-k (the partial-topk-then-merge pattern: only
  k rows per (query, batch) ever shuffle).
- ``ivf_topk_ds``: the scale path — k-means-lite coarse quantizer built on
  a sample (driver-side, deterministic), vectors bucketed by nearest
  centroid via map_batches, queries probe the ``n_probe`` nearest buckets
  only. Exactness is traded for touching ~n_probe/n_clusters of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .rayenv import remote_args as _rargs


def _batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk_ds(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10):
    """Dataset (vec_id, embedding) × query matrix → (query_id, rank,
    neighbor_id, cosine) exact top-k by cosine, ties broken on vec_id asc."""
    import pandas as pd
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)
    qid_list = [int(q) for q in query_ids]

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch))
        ids = batch.column("vec_id").to_numpy()
        sims = q @ m.T  # (n_queries, n_batch)
        kk = min(k, sims.shape[1])
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi in range(sims.shape[0]):
            s = sims[qi]
            top = np.lexsort((ids, -s))[:kk]
            rows["query_id"].extend([qid_list[qi]] * kk)
            rows["neighbor_id"].extend(ids[top].tolist())
            rows["cosine"].extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], type=pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], type=pa.int64()),
                "cosine": pa.array(rows["cosine"], type=pa.float64()),
            }
        )

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas", **_rargs())
    )


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8, seed: int = 13) -> np.ndarray:
    """Deterministic small k-means on normalized vectors (cosine ≈ dot)."""
    rng = np.random.default_rng(seed)
    s = _normalize(np.asarray(sample, dtype=np.float64))
    cent = s[rng.choice(len(s), size=min(n_clusters, len(s)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ cent.T, axis=1)
        for c in range(len(cent)):
            members = s[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_topk_ds(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample_limit: int = 2048,
):
    """IVF-style ANN: coarse centroids from a driver-side sample, vectors
    bucketed by nearest centroid, queries scan only n_probe buckets."""
    import pandas as pd
    import ray

    sample_tbl = ds.limit(sample_limit).to_pandas()
    sample = np.stack(sample_tbl["embedding"].to_numpy())
    cent = kmeans_lite(sample, n_clusters)
    cent_ref = ray.put(cent)
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_of_query = {int(q): set(map(int, probes[i])) for i, q in enumerate(query_ids)}
    q_ref = ray.put((qn, [int(q) for q in query_ids], probe_of_query))

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(_batch_matrix(batch))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign))

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", **_rargs())

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qn_, qids_, probe_of = ray.get(q_ref)
        bucket = int(g["bucket"].iloc[0])
        m = _normalize(np.stack(g["embedding"].to_numpy()))
        ids = g["vec_id"].to_numpy()
        out = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi, qid in enumerate(qids_):
            if bucket not in probe_of[qid]:
                continue
            s = m @ qn_[qi]
            kk = min(k, len(s))
            top = np.lexsort((ids, -s))[:kk]
            out["query_id"].extend([qid] * kk)
            out["neighbor_id"].extend(ids[top].tolist())
            out["cosine"].extend(s[top].tolist())
        return pd.DataFrame(out)

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(len(g), dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cosine"]]

    return (
        bucketed.groupby("bucket")
        .map_groups(scan_bucket, batch_format="pandas", **_rargs())
        .groupby("query_id")
        .map_groups(reduce_topk, batch_format="pandas", **_rargs())
    )


def embedding_near_dups(ds, threshold: float = 0.95, k: int = 5):
    """Embedding-cosine near-duplicate pairs: each vector queries the rest
    (self-join via brute-force top-k against the full set, self-match
    dropped), keep pairs above the cosine threshold."""
    import pandas as pd

    tbl = ds.to_pandas()
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_numpy())
    res = brute_force_topk_ds(ds, mat, ids, k=k)

    def to_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[(df["query_id"] != df["neighbor_id"]) & (df["cosine"] >= threshold)]
        a = np.minimum(df["query_id"], df["neighbor_id"])
        b = np.maximum(df["query_id"], df["neighbor_id"])
        out = pd.DataFrame({"doc_a": a, "doc_b": b, "cosine": df["cosine"]})
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = res.map_batches(to_pairs, batch_format="pyarrow", **_rargs())

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["doc_a", "doc_b"]).map_groups(dedupe, batch_format="pandas", **_rargs())

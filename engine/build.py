"""SPIMI index build: read_parquet → extract → invert per batch → segments.

The Ray-Data shape of the reference ingest chain (SURVEY §3.1):

    reference                                   here
    ---------                                   ----
    IndexWriter.addDocument → DWPT              one map_batches task/batch
      (private in-RAM segment per thread,       (private in-memory inversion
       DocumentsWriterPerThreadPool.java:48)     per Arrow batch — SPIMI)
    DefaultIndexingChain.processField           vectorized dictionary-encode
      → TermsHashPerField.add                    + lexsort + run-length
      (BytesRefHash interning, byte slices)      (no per-row Python loop)
    DocumentsWriterPerThread.flush              write_segment (atomic rename)
    publish into SegmentInfos + commit          manifest.json (checkpoint.py)

Global docIDs are assigned deterministically at ingest (the ``doc_id``
column = row position in the input corpus), replacing Lucene's
segment-local-docID + docBase remap (index/MergeState.java:152-196): a
partition's docBase is simply its minimum doc_id, stable under task
retries — which is what makes rank tie-breaks and resume deterministic.

Inversion is fully vectorized per batch: Arrow dictionary_encode interns
term bytes (the BytesRefHash role), ``np.unique`` over a (term, doc) key
produces the per-term (doc, freq) runs (the FreqProxTermsWriter role), and
the per-term numpy codec (engine/codec.py) writes FOR/VInt blocks.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analyze import DEFAULT_ANALYZER, Analyzer, analyze_batch, compute_norms
from .codec import encode_term_postings
from .extract import extract_batch
from .segment import TERMS_SCHEMA, write_segment

PARTITIONS_SUBDIR = "partitions"


def invert_to_segment(
    doc_ids: np.ndarray,
    texts: list[str],
    out_dir: str,
    analyzer: Analyzer = DEFAULT_ANALYZER,
    lineage: dict | None = None,
) -> dict:
    """Invert one partition worth of documents into a segment directory.

    Returns the manifest row (segment meta)."""
    t0 = time.perf_counter()
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    n_docs = len(doc_ids)
    order = np.argsort(doc_ids, kind="stable")
    if not np.array_equal(order, np.arange(n_docs)):
        doc_ids = doc_ids[order]
        texts = [texts[i] for i in order]
    flat, lengths = analyze_batch(texts, analyzer)
    norms = compute_norms(lengths)

    # --- vectorized inversion (TermsHash + FreqProx analogue) -------------
    if flat:
        enc = pc.dictionary_encode(pa.array(flat, type=pa.string()))
        term_idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dictionary = enc.dictionary.to_pylist()
        tok_doc = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)
        key = term_idx * n_docs + tok_doc
        pair_key, pair_freq = np.unique(key, return_counts=True)
        pair_term = pair_key // n_docs
        pair_doc = pair_key % n_docs
        # per-dict-term slice boundaries (pair_key sorted => grouped by term)
        n_terms = len(dictionary)
        starts = np.searchsorted(pair_term, np.arange(n_terms))
        ends = np.searchsorted(pair_term, np.arange(n_terms) + 1)
        sorted_tids = sorted(range(n_terms), key=dictionary.__getitem__)
    else:
        dictionary, sorted_tids = [], []

    cols: dict[str, list] = {k.name: [] for k in TERMS_SCHEMA}
    for tid in sorted_tids:
        s, e = int(starts[tid]), int(ends[tid])
        docs_local = pair_doc[s:e]
        freqs = pair_freq[s:e].astype(np.int64)
        docs = doc_ids[docs_local]
        df = e - s
        cols["term"].append(dictionary[tid])
        cols["df"].append(df)
        cols["ttf"].append(int(freqs.sum()))
        if df == 1:
            # singleton pulse (Lucene84PostingsFormat.java:159-161)
            cols["singleton_doc"].append(int(docs[0]))
            cols["blob"].append(b"")
            cols["last_docs"].append([int(docs[0])])
            cols["offsets"].append([])
            cols["imp_freq"].append([int(freqs[0])])
            cols["imp_norm"].append([int(norms[docs_local[0]])])
            cols["imp_start"].append([0, 1])
        else:
            tp = encode_term_postings(docs, freqs, norms[docs_local])
            cols["singleton_doc"].append(-1)
            cols["blob"].append(tp.blob)
            cols["last_docs"].append(tp.block_last_doc.tolist())
            cols["offsets"].append(tp.block_offset.tolist())
            cols["imp_freq"].append(tp.imp_freq.tolist())
            cols["imp_norm"].append(tp.imp_norm.tolist())
            cols["imp_start"].append(tp.imp_start.tolist())

    meta = {
        "kind": "partition",
        "field": "body",
        "doc_base": int(doc_ids.min()) if n_docs else 0,
        "n_docs": n_docs,
        "sum_ttf": int(lengths.sum()),
        "n_terms": len(dictionary),
        "lineage": lineage or {},
        "wall_ms": None,  # filled below
    }
    meta["wall_ms"] = round((time.perf_counter() - t0) * 1000.0, 3)
    return write_segment(out_dir, pa.table(cols, schema=TERMS_SCHEMA), doc_ids, norms, meta)


def make_inverter(
    index_dir: str, analyzer: Analyzer = DEFAULT_ANALYZER, from_html: bool = False
):
    """Batch fn for ``ds.map_batches(...)``: one Arrow batch → one partition
    segment on disk → one manifest row out (tiny — the heavy data never
    leaves the task)."""

    def _invert(batch: pa.Table) -> pa.Table:
        import json

        doc_ids = batch.column("doc_id").to_numpy()
        base = int(doc_ids.min()) if len(doc_ids) else 0
        out_dir = os.path.join(index_dir, PARTITIONS_SUBDIR, f"p{base:012d}")
        meta_path = os.path.join(out_dir, "meta.json")
        if os.path.exists(meta_path):
            # resume: partition already built (atomic rename completed) —
            # skip extraction + inversion entirely
            with open(meta_path) as f:
                meta = json.load(f)
            return pa.table(
                {
                    "seg_dir": [out_dir],
                    "doc_base": [meta["doc_base"]],
                    "n_docs": [meta["n_docs"]],
                    "sum_ttf": [meta["sum_ttf"]],
                    "n_terms": [meta["n_terms"]],
                    "wall_ms": [meta["wall_ms"]],
                }
            )
        if from_html:
            batch = extract_batch(batch)
        texts = batch.column("text").to_pylist()
        lineage = {
            "row_range": [int(doc_ids.min()), int(doc_ids.max())] if len(doc_ids) else [],
            "n_rows": len(doc_ids),
        }
        meta = invert_to_segment(doc_ids, texts, out_dir, analyzer, lineage)
        row = {
            "seg_dir": out_dir,
            "doc_base": meta["doc_base"],
            "n_docs": meta["n_docs"],
            "sum_ttf": meta["sum_ttf"],
            "n_terms": meta["n_terms"],
            "wall_ms": meta["wall_ms"],
        }
        return pa.table({k: [v] for k, v in row.items()})

    return _invert


def build_index(
    input_paths: str | list[str],
    index_dir: str,
    partition_docs: int = 4096,
    analyzer: Analyzer = DEFAULT_ANALYZER,
    from_html: bool = True,
) -> dict:
    """Driver for the build pipeline (Ray must already be initialised).

    read_parquet (pruned columns) → [extract] → invert per batch → manifest.
    Returns the build manifest (also written to <index_dir>/manifest.json).
    """
    import ray.data

    from .checkpoint import finalize_build_manifest, load_manifest

    existing = load_manifest(index_dir)
    if existing is not None:
        return existing

    # one task per input file: each task reads its shard (pruned columns)
    # and inverts it in partition_docs chunks — fully independent tasks, no
    # cross-file ordering constraints, perfect horizontal scaling (each
    # input file is a contiguous doc_id range by construction). This is the
    # resumable-output layout: partition dirs keyed by doc_base, reruns
    # skip finished ones.
    import glob as _glob

    if isinstance(input_paths, str):
        if os.path.isdir(input_paths):
            files = sorted(_glob.glob(os.path.join(input_paths, "*.parquet")))
        else:
            files = [input_paths]
    else:
        files = sorted(input_paths)
    columns = ["doc_id", "html"] if from_html else ["doc_id", "text"]
    inverter = make_inverter(index_dir, analyzer, from_html=from_html)

    def _invert_file(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        out = []
        for spec in batch.to_pylist():
            tbl = pq.read_table(spec["path"], columns=columns)
            for off in range(0, tbl.num_rows, partition_docs):
                out.append(inverter(tbl.slice(off, partition_docs)))
        return pa.concat_tables(out)

    rows = (
        ray.data.from_items([{"path": p} for p in files])
        .map_batches(_invert_file, batch_size=1, batch_format="pyarrow")
        .take_all()
    )  # manifest rows only: O(#partitions), tiny
    return finalize_build_manifest(index_dir, rows)

"""Near-real-time add + reopen — the IndexWriter.addDocuments /
DirectoryReader.openIfChanged lifecycle (core/index/IndexWriter.java:
1414; index/DirectoryReader.java:78; ControlledRealTimeReopenThread).

Lucene's NRT view = the big committed segments plus small freshly
flushed ones, visible after a cheap reader reopen without any merge.
Engine analogue: new documents invert into fresh partition segments
under ``<index>/nrt/`` (the DWPT-flush role, content-addressed and
idempotent), registered in ``nrt/segments.json`` (atomic replace — the
reopen "commit point"); ``nrt_reader`` opens the merged index PLUS the
NRT segments as one mixed searcher with summed collection stats —
exactly the MultiReader-over-leaves shape. Merging the NRT tail back
into the big index is the normal merge_by_term rebuild (the background
merge role)."""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

__all__ = ["nrt_add_documents", "nrt_reader", "nrt_segments"]


def _reg_path(index_dir: str) -> str:
    return os.path.join(index_dir, "nrt", "segments.json")


def nrt_segments(index_dir: str) -> list[dict]:
    p = _reg_path(index_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def nrt_add_documents(
    index_dir: str, doc_ids: np.ndarray, texts: list[str]
) -> dict:
    """Flush one batch of new documents as an NRT segment. Doc ids must
    be fresh (beyond every existing range). Content-addressed and
    idempotent: re-adding the same batch is a no-op."""
    from .build import invert_to_segment

    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tag = hashlib.md5(
        doc_ids.tobytes() + "\x00".join(t or "" for t in texts).encode()
    ).hexdigest()[:12]
    seg_dir = os.path.join(index_dir, "nrt", f"seg-{tag}")
    rows = nrt_segments(index_dir)
    for r in rows:
        if r.get("seg_dir") == seg_dir:
            return r
    os.makedirs(os.path.dirname(seg_dir), exist_ok=True)
    row = dict(invert_to_segment(doc_ids, texts, seg_dir))
    row["seg_dir"] = seg_dir
    rows.append(row)
    p = _reg_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rows, f)
    os.replace(tmp, p)
    return row


def nrt_reader(index_dir: str):
    """Reopen: merged index + NRT tail as one searcher with summed
    stats (openIfChanged — cheap, no merge)."""
    from .checkpoint import load_merge_manifest
    from .search import IndexSearcher
    from .segment import Segment

    mm = load_merge_manifest(index_dir)
    base = IndexSearcher(mm)
    tail_rows = nrt_segments(index_dir)
    if not tail_rows:
        return base
    tail = [Segment(r["seg_dir"]) for r in tail_rows]
    return IndexSearcher.from_segments(
        base.segments + tail,
        base.doc_count + sum(int(r["n_docs"]) for r in tail_rows),
        base.sum_ttf + sum(int(r["sum_ttf"]) for r in tail_rows),
    )

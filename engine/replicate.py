"""Index replication — the lucene/replicator module's revision-sync role.

Reference shape (replicator/IndexReplicationHandler.java,
IndexRevision.java): a publisher exposes a committed revision (the
segment files + the commit point); a replica compares the revision's
file list against what it already has, copies ONLY missing/changed
files, and installs the commit point LAST so a crashed sync never
exposes a partial index.

Engine analogue: the index directory tree (partitions/, merged/,
fields/) is the revision's file set; every data file is a write-once
two-phase output (tmp + rename, engine/segment.py), so (relative path,
size) identity is a sound revision check — a same-name same-size file
can only be the same content. The manifests (manifest.json files) play
the commit-point role: they are rewritten (absolute path prefixes
src -> dst) and atomically installed AFTER all data files land, in
bottom-up order (merged/fields manifests before the root), so a reader
of the replica never sees a manifest naming files that aren't there
yet.
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = ["replicate_index"]

_MANIFEST = "manifest.json"


def _atomic_copy(src: str, dst: str) -> int:
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + ".tmp"
    shutil.copyfile(src, tmp)
    os.replace(tmp, dst)
    return os.path.getsize(dst)


def _rewrite(obj, src_prefix: str, dst_prefix: str):
    if isinstance(obj, str):
        return obj.replace(src_prefix, dst_prefix) if src_prefix in obj else obj
    if isinstance(obj, list):
        return [_rewrite(x, src_prefix, dst_prefix) for x in obj]
    if isinstance(obj, dict):
        return {k: _rewrite(v, src_prefix, dst_prefix) for k, v in obj.items()}
    return obj


def replicate_index(src_index_dir: str, dst_index_dir: str) -> dict:
    """Sync ``dst`` to the committed revision at ``src``. Returns
    {"files_copied", "bytes_copied", "files_skipped", "manifests"}.
    Incremental: a second call against an up-to-date replica copies
    nothing. Safe under crash: data files land before any manifest."""
    src_index_dir = os.path.abspath(src_index_dir)
    dst_index_dir = os.path.abspath(dst_index_dir)
    copied = skipped = nbytes = 0
    manifest_rel: list[str] = []
    for root, _dirs, files in os.walk(src_index_dir):
        for name in files:
            sp = os.path.join(root, name)
            rel = os.path.relpath(sp, src_index_dir)
            if name == _MANIFEST:
                manifest_rel.append(rel)
                continue
            dp = os.path.join(dst_index_dir, rel)
            if (
                os.path.exists(dp)
                and os.path.getsize(dp) == os.path.getsize(sp)
            ):
                skipped += 1
                continue
            nbytes += _atomic_copy(sp, dp)
            copied += 1
    # commit points last, deepest first (root manifest is the final gate)
    manifest_rel.sort(key=lambda r: -r.count(os.sep))
    for rel in manifest_rel:
        with open(os.path.join(src_index_dir, rel)) as f:
            doc = json.load(f)
        doc = _rewrite(doc, src_index_dir, dst_index_dir)
        dp = os.path.join(dst_index_dir, rel)
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        tmp = dp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, dp)
    return {
        "files_copied": copied,
        "bytes_copied": nbytes,
        "files_skipped": skipped,
        "manifests": len(manifest_rel),
    }

"""Replicator (engine/replicate.py): incremental sync, crash-safety
ordering, and replica search identity."""

import os

import numpy as np
import pytest

from engine.replicate import replicate_index


@pytest.mark.usefixtures("ray_session")
def test_replicate_identity_and_incremental(tmp_path):
    from engine.checkpoint import load_merge_manifest
    from engine.pipelines import get_index
    from engine.search import IndexSearcher

    idx = get_index("/root/testdata/sf0.001")
    replica = str(tmp_path / "replica")
    stats = replicate_index(idx["index_dir"], replica)
    assert stats["files_copied"] > 0 and stats["manifests"] >= 2

    # replica manifests reference replica paths only
    mm = load_merge_manifest(replica)
    assert all(s["path"].startswith(replica) for s in mm["shards"])

    # search identity: replica results bit-equal to the primary
    primary = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    rep = IndexSearcher(mm)
    for q in ("data join", '"data join"', "+hash -dup", "jo*"):
        d1, s1 = primary.search(q, 10)
        d2, s2 = rep.search(q, 10)
        assert d1.tolist() == d2.tolist()
        assert np.array_equal(s1, s2)

    # incremental: second sync copies nothing
    stats2 = replicate_index(idx["index_dir"], replica)
    assert stats2["files_copied"] == 0
    assert stats2["files_skipped"] == stats["files_copied"]

    # a lost data file is re-fetched, everything else skipped
    victim = mm["shards"][0]["path"]
    os.remove(victim)
    stats3 = replicate_index(idx["index_dir"], replica)
    assert stats3["files_copied"] == 1
    assert os.path.exists(victim)

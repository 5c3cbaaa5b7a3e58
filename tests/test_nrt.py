"""NRT add + reopen (engine/nrt.py)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_nrt_add_and_reopen(tmp_path):
    from engine.nrt import nrt_add_documents, nrt_reader, nrt_segments
    from engine.pipelines import get_index
    from engine.replicate import replicate_index

    idx = get_index("/root/testdata/sf0.001")
    replica = str(tmp_path / "replica")
    replicate_index(idx["index_dir"], replica)

    before = nrt_reader(replica)
    d0, _ = before.search("newtokenxyz", before.doc_count)
    assert len(d0) == 0

    new_ids = np.array([10_000, 10_001], dtype=np.int64)
    texts = ["newtokenxyz data join", "plain filler data"]
    row = nrt_add_documents(replica, new_ids, texts)
    assert row["n_docs"] == 2
    # idempotent re-add
    assert nrt_add_documents(replica, new_ids, texts)["seg_dir"] == row["seg_dir"]
    assert len(nrt_segments(replica)) == 1

    after = nrt_reader(replica)
    assert after.doc_count == before.doc_count + 2
    d1, _ = after.search("newtokenxyz", after.doc_count)
    assert d1.tolist() == [10_000]
    # old + new docs both match a shared term; stats are summed
    d2, _ = after.search("data", after.doc_count)
    assert {10_000, 10_001} <= set(d2.tolist())
    df_after = after.global_term_stats("data")[0]
    df_before = before.global_term_stats("data")[0]
    assert df_after == df_before + 2
    # a second fresh batch lands as another NRT segment
    nrt_add_documents(replica, np.array([10_002]), ["newtokenxyz again"])
    assert len(nrt_segments(replica)) == 2
    d3, _ = nrt_reader(replica).search("newtokenxyz", 100)
    assert sorted(d3.tolist()) == [10_000, 10_002]

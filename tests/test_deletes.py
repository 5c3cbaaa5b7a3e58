"""deleteDocuments + liveDocs (engine/deletes.py, IndexSearcher._live)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_delete_by_term_masks_hits_keeps_stats(tmp_path):
    import duckdb

    from engine.checkpoint import load_merge_manifest
    from engine.deletes import delete_by_term, deleted_docs
    from engine.pipelines import get_index
    from engine.replicate import replicate_index
    from engine.search import IndexSearcher

    idx = get_index("/root/testdata/sf0.001")
    replica = str(tmp_path / "replica")
    replicate_index(idx["index_dir"], replica)

    primary = IndexSearcher(load_merge_manifest(idx["index_dir"]))
    n = delete_by_term(replica, "dup")
    assert n > 0
    # idempotent: re-deleting the same term changes nothing
    assert delete_by_term(replica, "dup") == n
    dset = set(deleted_docs(replica).tolist())
    assert len(dset) == n

    rep = IndexSearcher(load_merge_manifest(replica))
    # every query type's hits exclude deleted docs; scores of survivors
    # are bit-identical to the primary's (stats unchanged pre-merge)
    for q in ("data", "data join", '"data join"', "+data -key", "da*"):
        pd_, ps = primary.search(q, primary.doc_count)
        rd, rs = rep.search(q, rep.doc_count)
        assert not (set(rd.tolist()) & dset), q
        keep = ~np.isin(pd_, np.array(sorted(dset), dtype=np.int64))
        assert rd.tolist() == pd_[keep].tolist(), q
        assert np.array_equal(rs, ps[keep]), q

    # stats keep counting deleted docs (pre-merge Lucene contract)
    assert rep.doc_count == primary.doc_count
    assert rep.global_term_stats("dup") == primary.global_term_stats("dup")

    # oracle cross-check for the deleted set itself
    exp = duckdb.sql("""
        SELECT doc_id FROM read_parquet(
            '/root/testdata/sf0.001/documents.parquet')
        WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                            'dup') ORDER BY doc_id
    """).fetchdf()
    assert sorted(dset) == exp["doc_id"].tolist()

    # deleting an absent term is a no-op
    assert delete_by_term(replica, "zzznothere") == n


def test_delete_by_query(tmp_path):
    """deleteDocuments(Query): boolean-query deletes union into liveDocs
    idempotently and mask exactly the matching docs."""
    import numpy as np

    from engine.checkpoint import load_merge_manifest
    from engine.deletes import delete_by_query, deleted_docs
    from engine.pipelines import get_index
    from engine.replicate import replicate_index
    from engine.search import IndexSearcher

    sf = "/root/testdata/sf0.01"
    idx = get_index(sf)
    replica = str(tmp_path / "delq")
    replicate_index(idx["index_dir"], replica)
    n1 = delete_by_query(replica, "+dup +slow")
    assert n1 == len(deleted_docs(replica)) > 0
    # idempotent re-delete
    assert delete_by_query(replica, "+dup +slow") == n1
    # masked search excludes exactly the deleted docs
    s = IndexSearcher(load_merge_manifest(replica))
    docs, _ = s.search("data", k=s.doc_count)
    assert not set(docs.tolist()) & set(deleted_docs(replica).tolist())
    # a second query unions more deletions
    n2 = delete_by_query(replica, "dup")
    assert n2 >= n1

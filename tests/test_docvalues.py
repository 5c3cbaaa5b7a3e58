"""DocValues sidecar (index/DocValuesType.java NUMERIC/SORTED; the
.dvd/.dvm per-segment column store): written under the atomic segment
rename, point-fetched by doc range for sort-by-field, scanned as a
Dataset for facets — the source row store is never read."""

import numpy as np
import pyarrow as pa
import pytest

from engine.build import invert_to_segment
from engine.checkpoint import finalize_build_manifest
from engine.docvalues import DocValuesReader, doc_values_path, facet_counts


@pytest.fixture(scope="module")
def dv_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("dvidx")
    rng = np.random.default_rng(9)
    texts, langs = [], []
    for i in range(300):
        texts.append(" ".join(f"w{int(x):02d}" for x in rng.integers(0, 40, 5 + i % 7)))
        langs.append(["en", "de", "zh"][i % 3])
    rows = []
    for s in range(3):
        lo, hi = s * 100, (s + 1) * 100
        ids = np.arange(lo, hi, dtype=np.int64)
        seg_dir = str(root / f"partitions/p{lo:012d}")
        dv = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_chars": pa.array(
                    [len(t) for t in texts[lo:hi]], type=pa.int64()
                ),
                "lang": pa.array(langs[lo:hi], type=pa.string()),
            }
        )
        meta = invert_to_segment(ids, texts[lo:hi], seg_dir, doc_values=dv)
        assert meta["doc_values"] == ["lang", "n_chars"]
        rows.append(
            {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
            | {"seg_dir": seg_dir}
        )
    manifest = finalize_build_manifest(str(root), rows)
    return {"manifest": manifest, "texts": texts, "langs": langs}


def test_dv_sidecar_written_atomically(dv_corpus):
    import os

    for r in dv_corpus["manifest"]["partitions"]:
        assert os.path.exists(doc_values_path(r["seg_dir"]))


def test_dv_point_fetch_across_ranges(dv_corpus):
    dv = DocValuesReader(dv_corpus["manifest"]["partitions"])
    assert dv.columns() == ["n_chars", "lang"]
    rng = np.random.default_rng(1)
    probe = rng.permutation(300)[:120]  # unsorted, spans all 3 ranges
    got = dv.values_for(probe, "n_chars")
    exp = np.array([len(dv_corpus["texts"][d]) for d in probe])
    np.testing.assert_array_equal(got, exp)
    got_l = dv.values_for(probe, "lang")
    assert [str(x) for x in got_l] == [dv_corpus["langs"][d] for d in probe]


@pytest.mark.usefixtures("ray_session")
def test_dv_facet_counts(dv_corpus):
    t = facet_counts(dv_corpus["manifest"], "lang")
    got = dict(zip(t.column("lang").to_pylist(), t.column("cnt").to_pylist()))
    assert got == {"en": 100, "de": 100, "zh": 100}
    # order: count desc, value asc
    assert t.column("lang").to_pylist() == ["de", "en", "zh"]


@pytest.mark.usefixtures("ray_session")
def test_sort_by_field_uses_dv_not_source(tmp_path_factory):
    """term_filter_sort_by_field must resolve n_chars from the DV sidecar:
    results identical to a brute-force sort over the raw values, and the
    reader touches only DV files."""
    from engine.pipelines import term_filter_sort_by_field

    out = term_filter_sort_by_field("/root/testdata/sf0.001").to_pandas()
    import duckdb

    exp = duckdb.sql("""
        SELECT (row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) - 1) AS rank,
               doc_id, n_chars
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'), 'data')
        ORDER BY rank LIMIT 20
    """).fetchdf()
    assert out["doc_id"].tolist() == exp["doc_id"].tolist()
    assert out["n_chars"].tolist() == exp["n_chars"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_dv_facet_distributed_tail(dv_corpus):
    """Above max_driver_rows the facet sum finishes as a Dataset groupby;
    result identical to the driver-side path."""
    a = facet_counts(dv_corpus["manifest"], "lang")
    b = facet_counts(dv_corpus["manifest"], "lang", max_driver_rows=1)
    assert a.to_pylist() == b.to_pylist()


@pytest.mark.usefixtures("ray_session")
def test_dv_range_facet_counts(dv_corpus):
    """Range facet (LongRangeFacetCounts): overlapping ranges each count
    every containing doc; totals recomputed from the raw values."""
    from engine.docvalues import range_facet_counts

    vals = np.array([len(t) for t in dv_corpus["texts"]])
    ranges = [("lo", 0, 25), ("hi", 25, 1000), ("overlap", 10, 30), ("empty", 900, 901)]
    out = range_facet_counts(dv_corpus["manifest"], "n_chars", ranges).to_pandas()
    assert out["label"].tolist() == ["lo", "hi", "overlap", "empty"]
    for _, r in out.iterrows():
        assert r["cnt"] == int(((vals >= r["lo"]) & (vals < r["hi"])).sum()), r["label"]
    assert out[out["label"] == "empty"]["cnt"].iloc[0] == 0
    # overlap proves a doc can be counted twice across ranges
    assert out["cnt"].iloc[:2].sum() == len(vals)


def test_dv_reader_update_overlay(dv_corpus):
    m = dv_corpus["manifest"]
    base = DocValuesReader(m["partitions"])
    docs = np.array([5, 105, 205, 299], dtype=np.int64)
    orig = base.values_for(docs, "n_chars").astype(np.int64)
    upd = {
        "n_chars": (
            np.array([105, 299], dtype=np.int64),
            np.array([7777, 8888], dtype=np.int64),
        )
    }
    over = DocValuesReader(m["partitions"], updates=upd)
    got = over.values_for(docs, "n_chars").astype(np.int64)
    assert got.tolist() == [int(orig[0]), 7777, int(orig[2]), 8888]
    # untouched column unaffected
    assert (over.values_for(docs, "lang") == base.values_for(docs, "lang")).all()


@pytest.mark.usefixtures("ray_session")
def test_update_numeric_docvalue_generations(tmp_path):
    import duckdb

    from engine.checkpoint import load_merge_manifest
    from engine.docvalues import (
        DocValuesReader,
        dv_update_map,
        update_numeric_docvalue,
    )
    from engine.pipelines import get_index
    from engine.replicate import replicate_index
    from engine.search import IndexSearcher

    idx = get_index("/root/testdata/sf0.001")
    replica = str(tmp_path / "replica")
    replicate_index(idx["index_dir"], replica)

    n = update_numeric_docvalue(replica, "dup", field="n_chars", value=9999)
    assert n > 0
    # idempotent re-apply
    assert update_numeric_docvalue(replica, "dup", field="n_chars", value=9999) == n

    dup_docs = duckdb.sql("""
        SELECT doc_id FROM read_parquet(
            '/root/testdata/sf0.001/documents.parquet')
        WHERE list_contains(regexp_extract_all(lower(text), '[a-z0-9]+'),
                            'dup') ORDER BY doc_id
    """).fetchdf()["doc_id"].to_numpy()
    assert n == len(dup_docs)

    dv = DocValuesReader(
        idx["build_manifest"]["partitions"], updates=dv_update_map(replica)
    )
    got = dv.values_for(dup_docs, "n_chars").astype(np.int64)
    assert (got == 9999).all()

    # latest-wins: a second update over an OVERLAPPING set ('data' docs)
    searcher = IndexSearcher(load_merge_manifest(replica))
    update_numeric_docvalue(replica, "data", field="n_chars", value=1111)
    data_docs = np.concatenate(
        [seg.postings("data")[0] for seg in searcher.segments]
    )
    dv2 = DocValuesReader(
        idx["build_manifest"]["partitions"], updates=dv_update_map(replica)
    )
    both = np.intersect1d(dup_docs, data_docs)
    only_dup = np.setdiff1d(dup_docs, data_docs)
    if len(both):
        assert (dv2.values_for(both, "n_chars").astype(np.int64) == 1111).all()
    if len(only_dup):
        assert (dv2.values_for(only_dup, "n_chars").astype(np.int64) == 9999).all()
    # the primary index's sidecars are untouched
    base = DocValuesReader(idx["build_manifest"]["partitions"])
    assert (base.values_for(dup_docs, "n_chars").astype(np.int64) != 9999).any()

"""Index sorting + early termination (engine/sortindex.py)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_sorted_layout_and_early_termination(tmp_path):
    import duckdb

    from engine.sortindex import build_sorted_layout, sorted_topk

    layout = build_sorted_layout(
        "/root/testdata/sf0.001", col="n_chars", n_parts=8,
        cache_root=str(tmp_path),
    )
    parts = layout["parts"]
    assert len(parts) >= 2
    # parts ordered by ascending lo; total rows = corpus
    los = [p["lo"] for p in parts]
    assert los == sorted(los)
    assert sum(p["n_rows"] for p in parts) == 500

    # unfiltered descending top-10: must NOT scan every part
    out, scanned = sorted_topk(layout, 10, descending=True)
    assert scanned < len(parts)
    exp = duckdb.sql("""
        SELECT doc_id, n_chars FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')
        ORDER BY n_chars DESC, doc_id ASC LIMIT 10
    """).fetchdf()
    assert out.column("doc_id").to_pylist() == exp["doc_id"].tolist()
    assert out.column("n_chars").to_pylist() == exp["n_chars"].tolist()

    # ascending too
    out2, scanned2 = sorted_topk(layout, 10, descending=False)
    exp2 = duckdb.sql("""
        SELECT doc_id, n_chars FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')
        ORDER BY n_chars ASC, doc_id ASC LIMIT 10
    """).fetchdf()
    assert out2.column("doc_id").to_pylist() == exp2["doc_id"].tolist()
    assert scanned2 < len(parts)

    # k > corpus: full scan, all rows, still exact order
    out3, scanned3 = sorted_topk(layout, 10**6, descending=True)
    assert out3.num_rows == 500 and scanned3 == len(parts)

    # filtered: doc_id pushdown returns only filter rows
    filt = np.array(sorted([1, 5, 9, 400, 499]), dtype=np.int64)
    out4, _ = sorted_topk(layout, 3, descending=True, filter_docs=filt)
    assert set(out4.column("doc_id").to_pylist()) <= set(filt.tolist())
    exp4 = duckdb.sql("""
        SELECT doc_id FROM
        read_parquet('/root/testdata/sf0.001/documents.parquet')
        WHERE doc_id IN (1, 5, 9, 400, 499)
        ORDER BY n_chars DESC, doc_id ASC LIMIT 3
    """).fetchdf()
    assert out4.column("doc_id").to_pylist() == exp4["doc_id"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_sorted_layout_resume_idempotent(tmp_path):
    from engine.sortindex import build_sorted_layout

    a = build_sorted_layout(
        "/root/testdata/sf0.001", n_parts=4, cache_root=str(tmp_path)
    )
    b = build_sorted_layout(
        "/root/testdata/sf0.001", n_parts=4, cache_root=str(tmp_path)
    )
    assert a == b  # second call served from the layout manifest

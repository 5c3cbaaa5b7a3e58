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


@pytest.mark.usefixtures("ray_session")
def test_sorted_merge_of_unsorted_sources(tmp_path):
    """Merge-time index sort (index/Sorter.java DocMap-in-SegmentMerger
    role): a second UNSORTED source (an NRT-tail stand-in with fresh
    doc_ids) merges into ONE range-ordered layout; sorted top-k over the
    merged layout equals the brute-force order over the union."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.sortindex import build_sorted_layout, sorted_topk

    rng = np.random.default_rng(3)
    n = 200
    extra = pa.table(
        {
            "doc_id": pa.array(np.arange(10_000, 10_000 + n, dtype=np.int64)),
            "text": pa.array(["x"] * n, type=pa.string()),
            "lang": pa.array(["en"] * n, type=pa.string()),
            "source": pa.array(["tail"] * n, type=pa.string()),
            "n_chars": pa.array(rng.integers(0, 2000, n, dtype=np.int64)),
        }
    )
    extra_path = str(tmp_path / "tail.parquet")
    pq.write_table(extra, extra_path)

    layout = build_sorted_layout(
        "/root/testdata/sf0.001", col="n_chars", n_parts=8,
        cache_root=str(tmp_path), extra_sources=[extra_path],
    )
    assert sum(p["n_rows"] for p in layout["parts"]) == 500 + n

    out, scanned = sorted_topk(layout, 15, descending=True)
    assert scanned < len(layout["parts"])
    exp = duckdb.sql(f"""
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars FROM
                read_parquet('/root/testdata/sf0.001/documents.parquet')
            UNION ALL
            SELECT doc_id, n_chars FROM read_parquet('{extra_path}')
        ) ORDER BY n_chars DESC, doc_id ASC LIMIT 15
    """).fetchdf()
    assert out.column("doc_id").to_pylist() == exp["doc_id"].tolist()
    assert out.column("n_chars").to_pylist() == exp["n_chars"].tolist()

"""MoreLikeThis term selection (queries/mlt/MoreLikeThis.java createQueue)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_mlt_terms_match_sql_oracle():
    import duckdb

    from engine.pipelines import more_like_this_terms

    out = more_like_this_terms("/root/testdata/sf0.001", doc_id=7).to_pandas()
    exp = duckdb.sql("""
        WITH docs AS (SELECT * FROM read_parquet('/root/testdata/sf0.001/documents.parquet')),
        tdoc AS (
            SELECT t AS term, count(*) AS tf FROM (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
                FROM docs WHERE doc_id = 7
            ) GROUP BY t HAVING count(*) >= 2
        ),
        tdf AS (
            SELECT term, count(*) AS df FROM (
                SELECT doc_id, t AS term FROM (
                    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
                    FROM docs
                ) GROUP BY doc_id, t
            ) GROUP BY term
        ),
        scored AS (
            SELECT tdoc.term, tdoc.tf, tdf.df,
                   tdoc.tf * (ln(((SELECT count(*) FROM docs) + 1) / (tdf.df + 1.0)) + 1) AS score
            FROM tdoc JOIN tdf USING (term) WHERE tdf.df >= 5
        )
        SELECT term, tf, df,
               row_number() OVER (ORDER BY score DESC, term ASC) - 1 AS rank
        FROM scored ORDER BY rank LIMIT 10
    """).fetchdf()
    assert out["term"].tolist() == exp["term"].tolist()
    assert out["tf"].tolist() == exp["tf"].tolist()
    assert out["df"].tolist() == exp["df"].tolist()
    assert out["rank"].tolist() == exp["rank"].tolist()
    assert len(out) > 0


@pytest.mark.usefixtures("ray_session")
def test_mlt_gates_and_topk():
    from engine.mlt import select_like_terms
    from engine.pipelines import get_index, more_like_this_topk

    idx = get_index("/root/testdata/sf0.001")
    mm = idx["merge_manifest"]
    # tf gate: every selected term appears >= 2x in the example text
    sel = select_like_terms(mm, "data data join join join zz zz unseen", min_doc_freq=1)
    terms = [t for t, _, _, _ in sel]
    assert "unseen" not in terms  # tf=1 fails minTermFreq=2
    assert "zz" not in terms  # not in the index dictionary (df=0)
    assert set(terms) == {"data", "join"}
    tf = dict((t, c) for t, c, _, _ in sel)
    assert tf == {"data": 2, "join": 3}
    # df gate
    assert select_like_terms(mm, "data data", min_doc_freq=10**9) == []
    # full search: the example doc itself ranks first
    hits = more_like_this_topk("/root/testdata/sf0.001", doc_id=7, k=10).to_pandas()
    assert hits["doc_id"].iloc[0] == 7
    s = hits["score"].to_numpy()
    assert (np.diff(s) <= 0).all()

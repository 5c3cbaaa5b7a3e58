"""Classification module (engine/classify.py): NB math vs hand
computation, kNN vote rule, and end-to-end label agreement vs a DuckDB
recomputation at sf0.001."""

import math

import numpy as np
import pytest

from engine.classify import knn_vote, nb_score_doc


def test_nb_score_hand_computed():
    """Tiny corpus, every quantity hand-derived from
    SimpleNaiveBayesClassifier.java:142-268."""
    # class a: docs {x y}, {x}; class b: docs {y z}
    model = {
        "classes": {"a": 2, "b": 1},
        "hits": {
            ("x", "a"): 2,
            ("y", "a"): 1,
            ("y", "b"): 1,
            ("z", "b"): 1,
        },
        "avg_uniq": (2 + 1 + 2) / 3,  # sumDocFreq / docCount
        "n_classed": 3,
    }
    tokens = ["x", "x", "y"]  # occurrences count, not unique
    den_a = model["avg_uniq"] * 2 + 3
    den_b = model["avg_uniq"] * 1 + 3
    exp_a = (
        math.log(2) - math.log(3)
        + math.log(3 / den_a) + math.log(3 / den_a) + math.log(2 / den_a)
    )
    exp_b = (
        math.log(1) - math.log(3)
        + math.log(1 / den_b) + math.log(1 / den_b) + math.log(2 / den_b)
    )
    cls, score = nb_score_doc(model, tokens)
    assert cls == ("a" if exp_a >= exp_b else "b")
    assert score == pytest.approx(max(exp_a, exp_b), abs=0, rel=0)
    # unseen token: +1 smoothing keeps scores finite
    cls2, score2 = nb_score_doc(model, ["unseen"])
    assert math.isfinite(score2)


def test_knn_vote_rule():
    # 3 neighbors of 'a' (scores 10, 8, 2), 2 of 'b' (9, 7), k=5
    scores = [10.0, 9.0, 8.0, 7.0, 2.0]
    classes = ["a", "b", "a", "b", "a"]
    cls, s = knn_vote(scores, classes, k=5)
    sa = (10 / 10 + 8 / 10 + 2 / 10) / 5
    sb = (9 / 10 + 7 / 10) / 5
    assert cls == ("a" if sa >= sb else "b")
    assert s == pytest.approx(max(sa, sb), rel=0, abs=0)
    # correction branch: only 2 neighbors returned for k=5
    cls3, s3 = knn_vote([4.0, 3.0], ["b", "a"], k=5)
    exp_b = ((4 / 4) / 5) * 5 / 2
    exp_a = ((3 / 4) / 5) * 5 / 2
    assert cls3 == "b" and s3 == pytest.approx(exp_b, rel=0, abs=0)
    assert knn_vote([], [], k=5) == (None, 0.0)


@pytest.mark.usefixtures("ray_session")
def test_nb_classify_matches_duckdb_argmax():
    """End-to-end: engine labels == a from-scratch DuckDB/Python
    recomputation of the NB argmax at sf0.001."""
    import duckdb

    from engine.pipelines import nb_classify

    got = nb_classify("/root/testdata/sf0.001").to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    tok = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    hits = con.execute(f"""
        SELECT lang, t, count(*) AS h FROM (
            SELECT DISTINCT doc_id, lang, unnest({tok}) AS t
            FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        ) GROUP BY lang, t
    """).fetchall()
    stats = con.execute(f"""
        SELECT lang, count(*) AS docs, sum(nu) AS uniq FROM (
            SELECT doc_id, lang, count(DISTINCT t) AS nu FROM (
                SELECT doc_id, lang, unnest({tok}) AS t
                FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
            ) GROUP BY doc_id, lang
        ) GROUP BY lang
    """).fetchall()
    toks = con.execute(f"""
        SELECT doc_id, {tok} AS ts
        FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
    """).fetchall()
    classes = {r[0]: int(r[1]) for r in stats}
    n_classed = sum(classes.values())
    avg_uniq = sum(int(r[2]) for r in stats) / n_classed
    hmap = {(t, c): int(h) for c, t, h in hits}
    model = {
        "classes": classes,
        "hits": hmap,
        "avg_uniq": avg_uniq,
        "n_classed": n_classed,
    }
    exp = {did: nb_score_doc(model, ts)[0] for did, ts in toks}
    assert got["assigned_class"].tolist() == [
        exp[d] for d in got["doc_id"].tolist()
    ]
    # the sf fixture's 31-token vocabulary is lang-independent, so NB
    # correctly collapses to the majority-prior class — assert exactly
    # that, so a fixture change that adds signal will surface here
    majority = max(classes, key=lambda c: (classes[c], c))
    assert set(got["assigned_class"]) == {majority}


@pytest.mark.usefixtures("ray_session")
def test_knn_classify_deterministic_and_labeled():
    from engine.pipelines import knn_classify

    a = knn_classify("/root/testdata/sf0.001", n_examples=5).to_pandas()
    b = knn_classify("/root/testdata/sf0.001", n_examples=5).to_pandas()
    assert a.equals(b)
    assert a["doc_id"].tolist() == list(range(5))
    assert (a["assigned_class"] != "").all()


@pytest.mark.usefixtures("ray_session")
def test_nb_train_feature_caps():
    """min_hits floors the (class, term) table; max_features keeps the
    top-N terms by total hits (term-asc tie) — the bounded-model path a
    web-scale vocabulary requires. Capped features score as unseen."""
    from engine.classify import nb_train

    full = nb_train("/root/testdata/sf0.001")
    floored = nb_train("/root/testdata/sf0.001", min_hits=50)
    assert set(floored["hits"]) == {
        k for k, v in full["hits"].items() if v >= 50
    }
    assert 0 < len(floored["hits"]) < len(full["hits"])
    # class stats are untouched by feature selection
    assert floored["classes"] == full["classes"]
    assert floored["avg_uniq"] == full["avg_uniq"]

    capped = nb_train("/root/testdata/sf0.001", max_features=5)
    tot: dict[str, int] = {}
    for (t, _c), h in full["hits"].items():
        tot[t] = tot.get(t, 0) + h
    exp_terms = set(
        sorted(tot, key=lambda t: (-tot[t], t))[:5]
    )
    assert {t for t, _c in capped["hits"]} == exp_terms

"""Analysis-chain token filters: Porter stemmer (PorterStemFilter.java role),
ASCII folding (ASCIIFoldingFilter.java role), and the ShingleFilter-role
shingle operator."""

import numpy as np
import pyarrow as pa

from engine.analyze import Analyzer, analyze_batch_with_positions, tokenize
from engine.filters import apply_filters, fold_ascii, porter_stem

# sample pairs from the published algorithm (Porter 1980, "An algorithm for
# suffix stripping" — the examples given per step) plus tartarus voc goldens
PORTER_GOLDENS = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat",
    # step 1b (+ cleanup rules)
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "homologou": "homolog", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
    # multi-step compositions
    "generalization": "gener", "oscillators": "oscil", "running": "run",
}


def test_porter_goldens():
    for w, s in PORTER_GOLDENS.items():
        assert porter_stem(w) == s, (w, porter_stem(w), s)


def test_porter_short_tokens_unchanged():
    for w in ("a", "is", "by", "42", "x9"):
        assert porter_stem(w) == w


def test_fold_ascii_goldens():
    assert fold_ascii("mühléïsen") == "muhleisen"
    assert fold_ascii("œuvre") == "oeuvre"
    assert fold_ascii("straße") == "strasse"
    assert fold_ascii("łódź") == "lodz"
    assert fold_ascii("ñoño") == "nono"
    assert fold_ascii("ÆON") == "AEON"
    assert fold_ascii("þorn") == "thorn"
    # ASCII fast path: identity (same object, no work)
    s = "already-ascii"
    assert fold_ascii(s) is s


def test_filter_chain_order_and_memo():
    # fold THEN stem: "générales" -> "generales" -> "gener"... (stemmed)
    out = apply_filters(["générales", "générales", "running"],
                        ("asciifold", "porter"))
    assert out[0] == out[1]
    assert out[2] == "run"


def test_analyzer_filters_in_tokenize_and_batch():
    an = Analyzer(filters=("porter",))
    assert tokenize("running runs ran", an) == ["run", "run", "ran"]
    flat, lengths, positions = analyze_batch_with_positions(
        ["the running dogs", ""], an
    )
    # 1:1 filters: lengths and positions are the tokenizer's, text stemmed
    assert flat == ["the", "run", "dog"]
    assert lengths.tolist() == [3, 0]
    assert positions.tolist() == [0, 1, 2]


def test_stemmed_index_end_to_end(tmp_path):
    """Index with a stemming analyzer: 'running' and 'runs' collapse to one
    term, and a query analyzed the same way matches across inflections."""
    from engine.build import invert_to_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.queryparse import parse_query
    from engine.search import IndexSearcher

    an = Analyzer(filters=("porter",))
    docs = [
        "the dog was running fast",
        "many dogs run in the park",
        "a cat sat quietly",
    ]
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(
        np.arange(3, dtype=np.int64), docs, seg_dir, analyzer=an
    )
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    manifest = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(manifest, algorithm="taat")
    d, f = s.segments[0].postings("run")
    assert d.tolist() == [0, 1]  # running + run collapse
    docs_hit, _scores = s.search(parse_query("runs", analyzer=an), k=10)
    assert set(docs_hit.tolist()) == {0, 1}


def test_shingle_count_batch():
    from engine.textops import shingle_count_batch

    batch = pa.table({"text": ["a b c a b", "b c", "", None, "solo"]})
    t = shingle_count_batch(batch)
    got = dict(zip(t.column("shingle").to_pylist(), t.column("cnt").to_pylist()))
    assert got == {"a b": 2, "b c": 2, "c a": 1}


def test_shingle_top_counts_dataset(ray_session):
    import ray.data

    from engine.textops import shingle_top_counts

    ds = ray.data.from_items(
        [{"text": "x y z"}, {"text": "x y"}, {"text": "y z w"}]
    )
    out = shingle_top_counts(ds, size=2, k=2).to_pandas()
    assert list(out["shingle"]) == ["x y", "y z"]
    assert list(out["cnt"]) == [2, 2]


def test_stemmed_top_terms_dataset(ray_session):
    import ray.data

    from engine.textops import stemmed_top_terms

    ds = ray.data.from_items(
        [{"text": "running dogs"}, {"text": "dog runs"}, {"text": "cats"}]
    )
    out = stemmed_top_terms(ds, k=10).to_pandas()
    got = dict(zip(out["term"], out["df"]))
    assert got == {"dog": 2, "run": 2, "cat": 1}


def test_soundex_goldens():
    from engine.filters import soundex

    golden = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Jackson": "J250", "Washington": "W252",
        "Lee": "L000", "Gutierrez": "G362", "Gauss": "G200",
        "Ghosh": "G200", "Hilbert": "H416", "Heilbronn": "H416",
        "Knuth": "K530", "Kant": "K530", "Lloyd": "L300", "Ladd": "L300",
        "Lukasiewicz": "L222", "Lissajous": "L222",
    }
    for w, code in golden.items():
        assert soundex(w) == code, (w, soundex(w), code)
    # non-letter tokens pass through (the filter only encodes words)
    assert soundex("42") == "42"
    assert soundex("") == ""


def test_soundex_index_end_to_end(tmp_path):
    """Phonetic index: 'smith' and 'smyth' collapse to one S530 term, so a
    soundex-analyzed query matches across spellings."""
    from engine.analyze import Analyzer
    from engine.build import invert_to_segment
    from engine.checkpoint import finalize_build_manifest
    from engine.queryparse import parse_query
    from engine.search import IndexSearcher

    an = Analyzer(filters=("soundex",))
    docs = ["mr smith went home", "ms smyth stayed out", "jones left early"]
    seg_dir = str(tmp_path / "partitions/p000000000000")
    meta = invert_to_segment(
        np.arange(3, dtype=np.int64), docs, seg_dir, analyzer=an
    )
    rows = [
        {k: meta[k] for k in ("doc_base", "n_docs", "sum_ttf", "n_terms", "wall_ms")}
        | {"seg_dir": seg_dir}
    ]
    manifest = finalize_build_manifest(str(tmp_path), rows)
    s = IndexSearcher(manifest, algorithm="taat")
    hits, _ = s.search(parse_query("smith", analyzer=an), k=10)
    assert set(hits.tolist()) == {0, 1}


def test_edge_and_full_ngram_batches():
    from engine.textops import edge_ngram_count_batch, ngram_count_batch

    batch = pa.table({"text": ["hello help", None, "ab"]})
    e = edge_ngram_count_batch(batch, min_gram=2, max_gram=4)
    got = dict(zip(e.column("gram").to_pylist(), e.column("cnt").to_pylist()))
    assert got == {"he": 2, "hel": 2, "hell": 1, "help": 1, "ab": 1}
    n = ngram_count_batch(batch, min_gram=3, max_gram=3)
    got = dict(zip(n.column("gram").to_pylist(), n.column("cnt").to_pylist()))
    assert got == {"hel": 2, "ell": 1, "llo": 1, "elp": 1}


def test_soundex_term_groups_dataset(ray_session):
    import ray.data

    from engine.textops import soundex_term_groups

    ds = ray.data.from_items(
        [{"text": "smith smyth"}, {"text": "smith jones"}]
    )
    out = soundex_term_groups(ds, k=10).to_pandas()
    got = dict(zip(out["code"], out["n_terms"]))
    # distinct terms: smith, smyth (both S530), jones (J520)
    assert got == {"S530": 2, "J520": 1}


def test_word_delimiter_graph_parts():
    """WordDelimiterGraphFilter semantics (WordDelimiterIterator.java
    isBreak table + bufferWordParts emission): camelCase, acronym+digit,
    possessives, delimiter trimming, and the catenation dedup rules."""
    from engine.filters import word_delimiter_parts as w

    # splitting table
    assert w("PowerShot") == ["Power", "Shot"]
    assert w("SD500") == ["SD", "500"]
    assert w("TransAM") == ["Trans", "AM"]  # lower->UPPER splits, UPPER run sticks
    assert w("O'Neil's") == ["O", "Neil"]
    assert w("Shot's") == ["Shot"]  # single word + possessive
    assert w("SHOT'S") == ["SHOT"]  # uppercase possessive s
    assert w("super-duper-XL500-42-AutoCoder!") == [
        "super", "duper", "XL", "500", "42", "Auto", "Coder",
    ]
    # no-delimiter passthrough (:146-151) and all-delimiter drop (:158-166)
    assert w("hello") == ["hello"]
    assert w("hello", preserve_original=True) == ["hello"]
    assert w("---") == []
    assert w("---", preserve_original=True) == ["---"]
    # bounds trimming + preserve
    assert w("-foo-", preserve_original=True) == ["-foo-", "foo"]
    # split flags off => no delimiters seen => passthrough
    assert w("PowerShot", split_on_case_change=False) == ["PowerShot"]
    assert w("SD500", split_on_numerics=False) == ["SD500"]
    # catenations: flush on type change, subwordCount-1 dedup vs parts
    assert w("PowerShot", catenate_words=True) == ["Power", "Shot", "PowerShot"]
    assert w("foo-500", catenate_words=True) == ["foo", "500"]  # 1-part concat == part
    assert w("foo-500", generate_word_parts=False, catenate_words=True) == ["foo", "500"]
    assert w("500-42", catenate_numbers=True) == ["500", "42", "50042"]
    # catenate_all: skipped when identical to the last flushed concat
    assert w("PowerShot", catenate_words=True, catenate_all=True) == [
        "Power", "Shot", "PowerShot",
    ]
    assert w("PowerShot500", catenate_words=True, catenate_all=True) == [
        "Power", "Shot", "PowerShot", "500", "PowerShot500",
    ]
    # the driver-entry template
    assert w(
        "Wi-Fi5PowerShot's",
        catenate_words=True,
        catenate_all=True,
        preserve_original=True,
    ) == [
        "Wi-Fi5PowerShot's", "Wi", "Fi", "WiFi", "5",
        "Power", "Shot", "PowerShot", "WiFi5PowerShot",
    ]


def test_porter_sql_oracle_matches_engine_fuzz():
    """The stemmed_top_terms oracle's Porter CTE chain equals
    engine.filters.porter_stem on a suffix-heavy fuzz battery (the SQL
    replay is independent: cv-pattern fold + substr measure conditions)."""
    import random

    import duckdb

    import __ray_entry__ as e
    from engine.filters import porter_stem

    # extract the CTE chain from the oracle by stemming a custom vocab
    sql = e.oracle_sql()["stemmed_top_terms"]
    start = sql.index("t1 AS (")
    end = sql.index("sdf AS (")
    chain = sql[start:end].rstrip().rstrip(",")

    rng = random.Random(3)
    words = {"caresses", "ponies", "agreed", "motoring", "hopping", "happy",
             "relational", "vietnamization", "decisiveness", "triplicate",
             "adjustable", "replacement", "adoption", "controll", "roll",
             "dying", "lying", "sky", "oed", "by"}
    for _ in range(1500):
        n = rng.randint(1, 10)
        words.add("".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n)))
    for _ in range(800):
        base = "".join(rng.choice("bcdfglmnprstvzaeiouaeiou") for _ in range(rng.randint(1, 6)))
        words.add(base + rng.choice(
            ["ational", "enci", "izer", "ization", "ousness", "biliti",
             "icate", "ative", "ful", "ness", "ed", "ing", "eed", "ies",
             "sses", "s", "y", "e", "ement", "ion", "ll", "at", "bl", "iz"]))
    words = sorted(words)
    con = duckdb.connect()
    con.execute("CREATE TABLE vocab(w VARCHAR)")
    con.executemany("INSERT INTO vocab VALUES (?)", [(w,) for w in words])
    got = dict(con.execute(f"WITH {chain} SELECT w, stem FROM pstem").fetchall())
    bad = [(w, porter_stem(w), got[w]) for w in words if got[w] != porter_stem(w)]
    assert not bad, bad[:10]

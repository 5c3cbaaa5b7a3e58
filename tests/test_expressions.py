"""Expression compiler (lucene/expressions JavascriptCompiler role)."""

import numpy as np
import pytest

from engine.expressions import ExpressionError, compile_expression


def test_compile_arithmetic_and_functions():
    fn = compile_expression(
        "a / 1000.0 + sqrt(b) - ln(c + 1)", ["a", "b", "c"]
    )
    cols = {
        "a": np.array([1000.0, 2000.0]),
        "b": np.array([4.0, 9.0]),
        "c": np.array([0.0, np.e - 1]),
    }
    got = fn(cols)
    exp = cols["a"] / 1000.0 + np.sqrt(cols["b"]) - np.log(cols["c"] + 1)
    np.testing.assert_array_equal(got, exp)
    # two-arg functions + unary minus + mod
    fn2 = compile_expression("max(a, b) * -min(a, 2.0) % 7.0", ["a", "b"])
    got2 = fn2({"a": np.array([3.0]), "b": np.array([5.0])})
    np.testing.assert_array_equal(got2, (5.0 * -2.0) % 7.0)


def test_compile_rejects_unsafe():
    for bad in [
        "__import__('os')",
        "a.attr",
        "a[0]",
        "open('x')",
        "lambda: 1",
        "unknowncol + 1",
        "min(a)",
        "sqrt(a, a)",
        "a if b else 0",
    ]:
        with pytest.raises(ExpressionError):
            compile_expression(bad, ["a", "b"])


@pytest.mark.usefixtures("ray_session")
def test_expression_topk_matches_brute_force():
    import duckdb

    from engine.pipelines import EXPRESSION_SRC, expression_score_topk

    out = expression_score_topk("/root/testdata/sf0.001", k=10)
    exp = duckdb.sql(f"""
        SELECT o_orderkey,
               o_totalprice / 1000.0 + sqrt(o_orderkey) - ln(o_custkey + 1)
                   AS score
        FROM read_parquet('/root/testdata/sf0.001/orders.parquet')
        ORDER BY score DESC, o_orderkey ASC LIMIT 10
    """).fetchdf()
    assert out.column("o_orderkey").to_pylist() == exp["o_orderkey"].tolist()
    np.testing.assert_array_equal(
        out.column("score").to_numpy(), exp["score"].to_numpy()
    )


@pytest.mark.usefixtures("ray_session")
def test_frange_docs_margin_and_set():
    """{!frange}: the doc set equals a brute recomputation, and no value
    sits near the bounds (the margin that makes the doc set robust to
    the np.log-vs-libm 1-ulp drift documented in CLAUDE.md)."""
    import numpy as np
    import pyarrow.parquet as pq

    from engine.pipelines import frange_docs

    sf = "/root/testdata/sf0.01"
    out = frange_docs(sf, 100.0, 200.0).to_pandas()
    t = pq.read_table(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    v = (
        t.column("o_totalprice").to_numpy() / 1000.0
        + np.sqrt(t.column("o_orderkey").to_numpy())
        - np.log(t.column("o_custkey").to_numpy() + 1)
    )
    ok = t.column("o_orderkey").to_numpy()
    exp = set(ok[(v >= 100.0) & (v <= 200.0)].tolist())
    assert set(out["o_orderkey"].tolist()) == exp
    margin = min(np.abs(v - 100.0).min(), np.abs(v - 200.0).min())
    assert margin > 1e-6, margin  # ulp drift cannot flip membership

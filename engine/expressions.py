"""Expression compiler — the lucene/expressions module role.

Reference: `expressions/src/java/org/apache/lucene/expressions/js/
JavascriptCompiler.java:73-120` compiles a JS-like arithmetic source
over named DoubleValuesSource bindings into a scoring function;
`expressions/Expression.java:55-60` evaluates it per document.

This engine compiles the same surface (arithmetic + - * / %, unary
minus, a math-function whitelist, field references) through Python's
`ast` into a VECTORIZED numpy function over Arrow batch columns —
one compile per query, per-batch array evaluation, no per-row Python.
All math is float64 in source order, so a DuckDB oracle replays the
expression bit-exactly (same-libm ln/sqrt lore, CLAUDE.md).

Security note: the AST is whitelist-validated (no attributes, no
subscripts, no calls outside FUNCS, no names outside the binding set),
never `eval`'d as raw Python.
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

__all__ = ["compile_expression", "expression_topk_dataset"]

# the JavascriptCompiler function table subset that maps 1:1 onto numpy
FUNCS = {
    "sqrt": np.sqrt,
    "ln": np.log,
    "log10": np.log10,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
    "floor": np.floor,
    "ceil": np.ceil,
    "exp": np.exp,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.divide,
    ast.Mod: np.mod,
}


class ExpressionError(ValueError):
    pass


def compile_expression(src: str, bindings: list[str]):
    """Compile an arithmetic expression over the named ``bindings``
    (column names) into ``fn(cols: dict[str, np.ndarray]) -> np.ndarray``
    (float64). Raises ExpressionError on anything outside the JS-like
    arithmetic surface."""
    try:
        tree = ast.parse(src, mode="eval")
    except SyntaxError as e:
        raise ExpressionError(f"unparsable expression: {e}") from None
    allowed = set(bindings)

    def build(node):
        if isinstance(node, ast.Expression):
            return build(node.body)
        if isinstance(node, ast.BinOp) and type(node.op) in _BINOPS:
            op = _BINOPS[type(node.op)]
            left, right = build(node.left), build(node.right)
            return lambda c: op(left(c), right(c))
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
            sub = build(node.operand)
            return lambda c: np.negative(sub(c))
        if isinstance(node, ast.Call):
            if (
                not isinstance(node.func, ast.Name)
                or node.func.id not in FUNCS
                or node.keywords
            ):
                raise ExpressionError(f"function not allowed: {ast.dump(node)[:60]}")
            fn = FUNCS[node.func.id]
            args = [build(a) for a in node.args]
            if node.func.id in ("min", "max", "pow") and len(args) != 2:
                raise ExpressionError(f"{node.func.id} takes 2 arguments")
            if node.func.id not in ("min", "max", "pow") and len(args) != 1:
                raise ExpressionError(f"{node.func.id} takes 1 argument")
            return lambda c: fn(*(a(c) for a in args))
        if isinstance(node, ast.Name):
            if node.id not in allowed:
                raise ExpressionError(f"unknown binding: {node.id}")
            name = node.id
            return lambda c: c[name]
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            v = float(node.value)
            return lambda c: v
        raise ExpressionError(f"disallowed syntax: {type(node).__name__}")

    fn = build(tree)

    def run(cols: dict[str, np.ndarray]) -> np.ndarray:
        out = fn({k: np.asarray(v, dtype=np.float64) for k, v in cols.items()})
        return np.asarray(out, dtype=np.float64)

    return run


def expression_topk_dataset(ds, expr: str, bindings: list[str], id_col: str, k: int):
    """Top-k rows of a Dataset by a compiled expression (the
    ExpressionSortField / FunctionScoreQuery-over-bindings shape):
    per-batch vectorized evaluation + per-batch partial top-k combiner,
    driver-small k-row reduce. (id, score) tie-break (score desc, id asc).
    Returns a pa.Table (rank, {id_col}, score)."""
    from .rayenv import remote_args as _rargs

    fn = compile_expression(expr, bindings)

    def _partial(batch: pa.Table) -> pa.Table:
        cols = {b: batch.column(b).to_numpy(zero_copy_only=False) for b in bindings}
        score = fn(cols)
        ids = batch.column(id_col).to_numpy()
        if len(score) > k:
            part = np.argpartition(-score, k - 1)[:k]
            score, ids = score[part], ids[part]
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "score": pa.array(score, type=pa.float64()),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", **_rargs())
        .take_all()
    )
    ids = np.fromiter((r[id_col] for r in rows), dtype=np.int64, count=len(rows))
    sc = np.fromiter((r["score"] for r in rows), dtype=np.float64, count=len(rows))
    order = np.lexsort((ids, -sc))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(order)), type=pa.int64()),
            id_col: pa.array(ids[order], type=pa.int64()),
            "score": pa.array(sc[order], type=pa.float64()),
        }
    )


def expression_range_dataset(
    ds, expr: str, bindings: list[str], id_col: str, lo: float, hi: float
):
    """FunctionRangeQuery role (queries/function/FunctionRangeQuery.java;
    Solr {!frange l= u=}): keep rows whose compiled-expression value lies
    in the INCLUSIVE [lo, hi]. Pure streamed map_batches filter — the
    match set never collects on the driver; callers reduce or take when
    known-bounded. Returns a Dataset of (id_col) only: numpy's
    vectorized ln differs from scalar libm by 1 ulp on ~19% of inputs
    (measured), so the raw f64 values are NOT cross-engine exact — the
    doc SET is, provided no value sits within an ulp of a bound (the
    geo_distance boundary-margin precedent; asserted in tests for the
    driver entry's bounds)."""
    from .rayenv import remote_args as _rargs

    fn = compile_expression(expr, bindings)

    def _filt(batch: pa.Table) -> pa.Table:
        cols = {b: batch.column(b).to_numpy(zero_copy_only=False) for b in bindings}
        v = fn(cols)
        m = (v >= lo) & (v <= hi)
        return pa.table(
            {
                id_col: pa.array(batch.column(id_col).to_numpy()[m], type=pa.int64()),
            }
        )

    return ds.map_batches(_filt, batch_format="pyarrow", **_rargs())

"""Relational operators — Solr streaming-expression analogues on Ray Data.

The reference ships a full relational dataflow DSL over shards
(solr/solrj/.../io/stream/: RollupStream, HashJoinStream, RankStream,
UniqueStream, TimeSeriesStream, SelectStream, ParallelStream...). Each
function here is the Ray-Data-native expression of one of those operators
over the driver's TPC-H-ish tables (SURVEY §2.7 mapping table), used by the
driver-checked `queries()` entries.

Patterns on display:
- partial aggregation inside map_batches before the groupby (RollupStream
  with a combiner) — only one row per key per batch shuffles;
- broadcast hash join (HashJoinStream): dimension side via ray.put once,
  lookup per batch — no shuffle of the fact table;
- semi-join via broadcast key set (FetchStream/JoinUtil semi-join);
- top-k via per-batch prefilter + small global sort (RankStream);
- distinct via groupby-first (UniqueStream);
- date-bucketed aggregate (TimeSeriesStream).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .rayenv import remote_args as _rargs
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def rollup_lineitem(sf_dir: str):
    """RollupStream analogue (TPC-H Q1 shape): per (returnflag, linestatus)
    count + sum(qty) + avg(qty), pre-aggregated per batch before the
    groupby so only partials shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(n=("l_quantity", "size"), sum_qty=("l_quantity", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n"] = df["n"].astype(np.int64)
        df["avg_qty"] = df["sum_qty"] / df["n"]
        return pa.Table.from_pandas(
            df[["l_returnflag", "l_linestatus", "n", "sum_qty", "avg_qty"]],
            preserve_index=False,
        )

    return agg.map_batches(finish, batch_format="pyarrow", **_rargs())


def orders_per_nation(sf_dir: str):
    """HashJoinStream analogue: orders ⋈ customer ⋈ nation with both
    dimension sides broadcast (ray.put once), partial counts per batch,
    tiny groupby-sum of partials."""
    import ray
    from ray.data.aggregate import Sum

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_of_cust = dict(
        zip(
            cust["c_custkey"].to_numpy(),
            nation.set_index("n_nationkey")["n_name"].reindex(cust["c_nationkey"]).to_numpy(),
        )
    )
    lookup_ref = ray.put(nation_of_cust)

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        keys = batch.column("o_custkey").to_numpy()
        names = pd.Series([lookup.get(int(k)) for k in keys], name="n_name")
        g = names.groupby(names).size().rename("n_orders").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        orders.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby("n_name")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


def top_orders(sf_dir: str, k: int = 10):
    """RankStream analogue: global top-k orders by totalprice (tie:
    o_orderkey asc) via per-batch top-k prefilter + small driver sort."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    parts = ds.map_batches(partial_topk, batch_format="pyarrow", **_rargs()).to_pandas()
    out = parts.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(k)
    out = out.reset_index(drop=True)
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return pa.Table.from_pandas(out[["rank", "o_orderkey", "o_totalprice"]], preserve_index=False)


def unique_event_types(sf_dir: str):
    """UniqueStream analogue: distinct event_type (groupby-first)."""
    ds = _read(sf_dir, "events", ["event_type"])
    return ds.groupby("event_type").count().select_columns(["event_type"])


def events_timeseries(sf_dir: str):
    """TimeSeriesStream analogue: events per (event_type, day)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # keep microsecond unit so the schema matches DuckDB's date_trunc
        df["day"] = df["ts"].dt.floor("D").astype("datetime64[us]")
        g = df.groupby(["event_type", "day"], as_index=False).size()
        g = g.rename(columns={"size": "n_events"})
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", **_rargs())
        .groupby(["event_type", "day"])
        .aggregate(Sum("n_events", alias_name="n_events"))
    )


def orders_semi_join(sf_dir: str, nation_name: str = "NATION_7"):
    """Semi-join via broadcast key set (JoinUtil.createJoinQuery shape):
    orders whose customer is in the given nation."""
    import ray

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nk = nation.loc[nation["n_name"] == nation_name, "n_nationkey"]
    if len(nk) == 0:
        keys: set[int] = set()
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
        keys = set(cust.loc[cust["c_nationkey"] == int(nk.iloc[0]), "c_custkey"].tolist())
    keys_ref = ray.put(keys)

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        mask = pa.array([int(c) in ks for c in batch.column("o_custkey").to_pylist()])
        return batch.filter(mask).select(["o_orderkey", "o_custkey"])

    return orders.map_batches(filt, batch_format="pyarrow", **_rargs())


def top_orders_per_priority(sf_dir: str, per_group: int = 2):
    """Grouping-module analogue (two-pass grouping collector): top-N orders
    by totalprice within each orderpriority."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])

    def topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(per_group)
        g = g.reset_index(drop=True)
        g["grp_rank"] = np.arange(len(g), dtype=np.int64)
        return g[["o_orderpriority", "grp_rank", "o_orderkey", "o_totalprice"]]

    return ds.groupby("o_orderpriority").map_groups(topn, batch_format="pandas", **_rargs())


def lang_facet(sf_dir: str):
    """FacetStream / facet-module analogue: doc counts per lang over the
    documents table."""
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def lineitem_revenue_expr(sf_dir: str):
    """Expressions-module analogue (lucene/expressions: compiled scalar
    expressions over doc-value columns): revenue = extendedprice * (1 -
    discount), vectorized per Arrow batch."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def expr(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": batch.column("l_linenumber"),
                "revenue": rev,
            }
        )

    return ds.map_batches(expr, batch_format="pyarrow", **_rargs())


def orders_sample(sf_dir: str, fraction: float = 0.1, seed: int = 7):
    """RandomStream / sampling analogue: seeded bernoulli sample."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return ds.random_sample(fraction, seed=seed)

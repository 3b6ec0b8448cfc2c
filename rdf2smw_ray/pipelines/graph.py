"""Graph analytics over the extracted KG — iterative distributed
PageRank.

Power iteration where every step is a Dataset op: the edge list is
joined with the current rank vector (stages/join.py bucketed
co-shuffle), contributions aggregate by destination, and the damping
base term re-enters through a left join against the node set. No
driver-side structure is ∝ node or edge count. Fixed iteration count
(the oracle unrolls the same number of steps in SQL).

Dangling nodes (no out-edges) follow the "lost mass" formulation —
PR(v) = (1-d)/N + d·Σ_{u→v} PR(u)/outdeg(u) — which the SQL oracle
states verbatim.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank(edges_ds, *, src_col: str = "src", dst_col: str = "dst",
             iters: int = 3, damping: float = 0.85):
    """(node, pr) after ``iters`` power iterations over the DISTINCT
    edge set."""
    from rdf2smw_ray.stages.join import bucketed_join

    edges = (
        edges_ds.groupby([src_col, dst_col]).count()
        .select_columns([src_col, dst_col])
        .map_batches(
            lambda t: pa.table({"src": t[src_col], "dst": t[dst_col]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
                )
            }
        )

    nodes = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node").count().select_columns(["node"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda t: pa.table(
                {"node": pa.array([], pa.string()), "pr": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )
    base = (1.0 - damping) / n_nodes

    deg = (
        edges.groupby("src").count()
        .map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "outdeg": t[[c for c in t.column_names if "count" in c][0]].cast(
                        pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    edges_deg = bucketed_join(
        edges, deg, key="src", how="inner", right_cols={"outdeg": "outdeg"}
    ).materialize()

    pr = nodes.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "pr": pa.array(np.full(len(t), 1.0 / n_nodes))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        contrib = bucketed_join(
            edges_deg, pr, key="src", right_key="node",
            right_cols={"pr": "pr"}, how="inner",
        )
        msgs = contrib.map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "w": pa.array(
                        t["pr"].to_numpy(zero_copy_only=False)
                        / t["outdeg"].to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = msgs.groupby("node").sum("w").map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "w": t[[c for c in t.column_names if "w" in c][0]].cast(
                        pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined = bucketed_join(
            nodes, sums, key="node", how="left", right_cols={"w": "w"}
        )
        pr = joined.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "pr": pa.array(
                        base
                        + damping
                        * np.nan_to_num(t["w"].to_numpy(zero_copy_only=False), nan=0.0)
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
    return pr


def _canon_undirected(edges_ds, src_col: str, dst_col: str):
    """Distinct undirected edge set, canonically oriented (a < b
    lexicographically, self-loops dropped) — one groupby-distinct."""
    import pyarrow.compute as pc

    def canon(batch: pa.Table) -> pa.Table:
        u, v = batch[src_col], batch[dst_col]
        keep = pc.invert(pc.equal(u, v))
        u, v = u.filter(keep), v.filter(keep)
        lt = pc.less(u, v)
        return pa.table(
            {
                "a": pc.if_else(lt, u, v),
                "b": pc.if_else(lt, v, u),
            }
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )


_PAIR_SEP = "\x1f"


def triangle_count(edges_ds, *, src_col: str = "src", dst_col: str = "dst") -> int:
    """Exact triangle count over the distinct undirected edge set.

    Canonical orientation (a < b) means every triangle a<b<c is
    produced exactly once: wedge join (a,b)⋈(b,c) via the bucketed
    co-shuffle with multiplicity='all', then a semi join of the wedge's
    (a,c) pair key against the edge set closes it. No adjacency list is
    ever held on one node; the wedge explosion is bounded per hash
    bucket (degree-skewed hubs land in one bucket whose width scales
    with input via tuning.auto_buckets)."""
    from rdf2smw_ray.stages.join import bucketed_join

    edges = _canon_undirected(edges_ds, src_col, dst_col)

    wedges = bucketed_join(
        edges, edges, key="b", right_key="a", right_cols={"b": "c"},
        multiplicity="all",
    )

    def wedge_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"pk": pc.binary_join_element_wise(batch["a"], batch["c"], _PAIR_SEP)}
        )

    def edge_key(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"pk": pc.binary_join_element_wise(batch["a"], batch["b"], _PAIR_SEP)}
        )

    closed = bucketed_join(
        wedges.map_batches(wedge_key, batch_format="pyarrow"),
        edges.map_batches(edge_key, batch_format="pyarrow"),
        key="pk",
        how="semi",
    )
    return closed.count()


def bfs_distances(
    edges_ds, seed: str, *, src_col: str = "src", dst_col: str = "dst",
    max_hops: int = 4,
):
    """Shortest hop distance from ``seed`` over the undirected distinct
    edge set, capped at ``max_hops`` — iterative BFS where every step
    is a Dataset op: frontier ⋈ edges (bucketed co-shuffle) expands,
    groupby(node).min(dist) contracts. The frontier at level h is
    exactly the nodes whose min distance is h, so each edge is expanded
    at most twice overall."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min

    from rdf2smw_ray.stages.join import bucketed_join

    canon = _canon_undirected(edges_ds, src_col, dst_col)
    # both orientations for traversal
    edges = canon.map_batches(
        lambda t: pa.table(
            {
                "u": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "v": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    dist = rd.from_items([{"node": seed, "dist": 0}]).materialize()
    frontier = dist
    for h in range(1, max_hops + 1):
        reached = bucketed_join(
            frontier.select_columns(["node"]),
            edges,
            key="node",
            right_key="u",
            right_cols={"v": "nbr"},
            multiplicity="all",
        ).map_batches(
            lambda t, h=h: pa.table(
                {
                    "node": t["nbr"],
                    "dist": pa.array(
                        np.full(len(t), h, dtype=np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        dist = (
            dist.union(reached)
            .groupby("node")
            .aggregate(Min("dist", alias_name="dist"))
            .materialize()
        )
        frontier = dist.map_batches(
            lambda t, h=h: t.filter(pc.equal(t["dist"], pa.scalar(h, pa.int64()))),
            batch_format="pyarrow",
        ).materialize()
        if frontier.count() == 0:
            break
    return dist

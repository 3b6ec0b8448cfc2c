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

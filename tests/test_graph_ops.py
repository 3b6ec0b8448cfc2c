"""graph.triangle_count / graph.bfs_distances vs brute-force references
on small random graphs."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pytest


def _rand_edges(n_nodes=40, n_edges=160, seed=3):
    rng = np.random.RandomState(seed)
    u = rng.randint(0, n_nodes, n_edges)
    v = rng.randint(0, n_nodes, n_edges)
    return pd.DataFrame({"src": [f"n{a}" for a in u], "dst": [f"n{b}" for b in v]})


def _adj(df):
    adj = {}
    for a, b in zip(df["src"], df["dst"]):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


@pytest.mark.parametrize("seed", [3, 11])
def test_triangle_count_matches_bruteforce(ray_session, seed):
    import ray.data as rd

    from rdf2smw_ray.pipelines.graph import triangle_count

    df = _rand_edges(seed=seed)
    adj = _adj(df)
    want = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    got = triangle_count(rd.from_pandas(df))
    assert got == want


def test_bfs_distances_matches_bruteforce(ray_session):
    import ray.data as rd

    from rdf2smw_ray.pipelines.graph import bfs_distances

    df = _rand_edges(n_nodes=60, n_edges=80, seed=5)
    adj = _adj(df)
    seed_node = "n1"
    # reference BFS capped at 4 hops
    want = {seed_node: 0}
    frontier = [seed_node]
    for h in range(1, 5):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in want:
                    want[v] = h
                    nxt.append(v)
        frontier = nxt
    got = bfs_distances(rd.from_pandas(df), seed_node, max_hops=4).to_pandas()
    got_map = dict(zip(got["node"], got["dist"].astype(int)))
    assert got_map == want

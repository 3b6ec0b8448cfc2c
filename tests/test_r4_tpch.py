"""Round-4 TPC-H shapes: block-split robustness + guard rails.

The sf0.001 oracle-parity run lives in test_queries_duckdb.py; these
tests target the failure modes a single-block happy path cannot see."""

import numpy as np
import pandas as pd
import pytest


def test_waiting_suppliers_split_across_blocks(ray_session):
    """An order's lineitems split across MANY blocks must still yield
    the same sole-returner verdict: the per-batch dedup partials are
    re-merged inside the coarse bucket (np.maximum.reduceat over the
    (order, supplier) pairs), so a supplier whose R-flag and non-R
    rows land in different blocks is neither lost nor double-counted."""
    from ray.data import DataContext

    from rdf2smw_ray.pipelines.relational import waiting_suppliers

    sf = "/root/testdata/sf0.001"
    base = waiting_suppliers(sf)

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024  # 4 KiB: guarantees splits
    try:
        split = waiting_suppliers(sf)
    finally:
        ctx.target_max_block_size = old
    pd.testing.assert_frame_equal(base, split)


def test_waiting_suppliers_per_bucket_kernel():
    """Direct kernel check on a hand-built bucket: duplicated pairs,
    multi-supplier orders with 0/1/2 returners, single-supplier order."""
    from rdf2smw_ray.pipelines.relational import waiting_suppliers  # noqa: F401

    # rebuild the same frame the bucket sees and run the inner logic via
    # the public function on a synthetic parquet dir
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # order 1: suppliers 5 (R, split into two partial rows) and 7 (no R)
        (1, 5, "R"), (1, 5, "N"), (1, 7, "N"),
        # order 2: two returners -> excluded (nr=2)
        (2, 3, "R"), (2, 4, "R"),
        # order 3: single supplier with R -> excluded (ns=1)
        (3, 9, "R"),
        # order 4: suppliers 2 and 8, supplier 8 returns -> hit for 8
        (4, 2, "N"), (4, 8, "R"), (4, 8, "R"),
    ]
    li = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    supp = pa.table(
        {
            "s_suppkey": pa.array([2, 3, 4, 5, 7, 8, 9], pa.int64()),
            "s_name": pa.array([f"Supplier#{i}" for i in [2, 3, 4, 5, 7, 8, 9]], pa.string()),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(li, os.path.join(d, "lineitem.parquet"))
        pq.write_table(supp, os.path.join(d, "supplier.parquet"))
        out = waiting_suppliers(d)
    want = pd.DataFrame(
        {"s_name": ["Supplier#5", "Supplier#8"], "numwait": np.int64([1, 1])}
    )
    pd.testing.assert_frame_equal(out, want)


def test_cheapest_supplier_packing_guard(ray_session):
    """Out-of-range units must raise, not silently wrap the packed
    argmin."""
    import tempfile, os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf2smw_ray.pipelines.relational import cheapest_supplier_per_part

    li = pa.table(
        {
            "l_partkey": pa.array([1], pa.int64()),
            "l_suppkey": pa.array([1], pa.int64()),
            "l_extendedprice": pa.array([3e8], pa.float64()),  # $300M -> units >= 2^31
            "l_discount": pa.array([0.0], pa.float64()),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(li, os.path.join(d, "lineitem.parquet"))
        with pytest.raises(Exception, match="packing range"):
            cheapest_supplier_per_part(d)

"""Data-quality validation suite: constraint-violation counts over an
ingest — the audit pass a 100-TB pipeline runs before anything else
(null keys, domain violations, range checks, duplicate primary keys,
referential orphans).

Each rule is shaped for its cost class:

- row-local predicates (nulls, ranges, domains) are ONE combined
  ``map_batches`` counter pass — one scan of each table produces ALL
  per-batch partial counts, summed by a tiny final groupby;
- duplicate-PK detection is combiner-first: per-batch (key, n)
  partials, one groupby(key) sum, then a second counter pass over the
  keys with n > 1 — the corpus never re-shuffles;
- referential orphans ride the bucketed/broadcast anti join
  (``stages.join.bucketed_join``) on the child table's key column.

Violations are synthesized deterministically (key-arithmetic, mirrored
in the SQL oracle — the ``pii_redact`` injection pattern) so the gate
checks non-zero counts: parents with ``o_orderkey % 97 == 0`` are
dropped before the orphan check, and orders with
``o_orderkey % 101 == 0`` are re-appended to fake duplicate PKs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_ALLOWED_STATUS = ("F", "O", "P")


def dq_violations(sf_dir: str) -> pd.DataFrame:
    """(rule, n_bad) — one row per validation rule, exact BIGINT
    counts."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.pipelines.io_cache import cached_table
    from rdf2smw_ray.stages.join import bucketed_join

    orders = cached_table(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"]
    )
    lineitem = cached_table(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def order_rules(batch: pa.Table) -> pa.Table:
        cust = batch["o_custkey"]
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        status = pd.Series(batch["o_orderstatus"].to_pylist(), dtype=object)
        rules = {
            "null_custkey": int(cust.null_count),
            "nonpositive_price": int((price <= 0).sum()),
            # NULL status is NOT a violation: SQL's NOT IN yields NULL
            # (not TRUE) for NULL, so the oracle never counts it —
            # exclude nulls here so both engines agree by construction
            "bad_status": int((~status.isin(_ALLOWED_STATUS) & status.notna()).sum()),
        }
        return pa.table(
            {
                "rule": pa.array(list(rules), pa.string()),
                "n_bad": pa.array(
                    np.array(list(rules.values()), dtype=np.int64), pa.int64()
                ),
            }
        )

    def lineitem_rules(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        bad = int(((qty < 1) | (qty > 50)).sum()) + int(np.isnan(qty).sum())
        return pa.table(
            {
                "rule": pa.array(["qty_out_of_range"], pa.string()),
                "n_bad": pa.array(np.array([bad], dtype=np.int64), pa.int64()),
            }
        )

    def _key_mod_filter(mod: int, keep_hits: bool):
        def f(batch: pa.Table) -> pa.Table:
            k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            mask = (k % mod == 0) == keep_hits
            return batch.filter(pa.array(mask))

        return f

    # duplicate PKs: re-append keys % 101 == 0, then combiner-first
    # (key, n) partials -> groupby(key) sum -> count keys with n > 1
    injected = orders.select_columns(["o_orderkey"]).union(
        orders.map_batches(
            _key_mod_filter(101, True), batch_format="pyarrow"
        ).select_columns(["o_orderkey"])
    )

    def key_partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(
            batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ).value_counts()
        return pa.table(
            {
                "o_orderkey": pa.array(vc.index.to_numpy(), pa.int64()),
                "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    def dup_count(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rule": pa.array(["dup_orderkeys"], pa.string()),
                "n_bad": pa.array(
                    np.array([int((n > 1).sum())], dtype=np.int64), pa.int64()
                ),
            }
        )

    dups = (
        injected.map_batches(key_partial, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(dup_count, batch_format="pyarrow")
    )

    # referential orphans: drop parents with key % 97 == 0, anti-join
    # the child key column against the surviving parents
    parents = orders.map_batches(
        _key_mod_filter(97, False), batch_format="pyarrow"
    ).select_columns(["o_orderkey"])
    orphans = bucketed_join(
        lineitem.select_columns(["l_orderkey"]),
        parents,
        key="l_orderkey",
        right_key="o_orderkey",
        how="anti",
    )

    # each branch reduces to a bounded frame (≤ a few rows per block);
    # merging them on the driver avoids fusing four unrelated lineages
    # into one union DAG (measured 12.4s fused vs ~5s decomposed at
    # sf0.1 — Ray schedules the fused union's branches serially)
    frames = [
        orders.map_batches(order_rules, batch_format="pyarrow").to_pandas(),
        lineitem.map_batches(lineitem_rules, batch_format="pyarrow").to_pandas(),
        dups.to_pandas(),
        pd.DataFrame({"rule": ["orphan_lineitems"], "n_bad": [orphans.count()]}),
    ]
    out = (
        pd.concat(frames, ignore_index=True)
        .groupby("rule", as_index=False)["n_bad"]
        .sum()
    )
    # rules whose every partial was filtered away still report 0
    all_rules = [
        "bad_status",
        "dup_orderkeys",
        "nonpositive_price",
        "null_custkey",
        "orphan_lineitems",
        "qty_out_of_range",
    ]
    out = (
        out.set_index("rule")
        .reindex(all_rules, fill_value=0)
        .reset_index()
    )
    out["n_bad"] = out["n_bad"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)


DQ_VIOLATIONS_SQL = """
SELECT rule, n_bad FROM (
  SELECT 'null_custkey' AS rule,
         CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS n_bad
  FROM orders
  UNION ALL
  SELECT 'nonpositive_price',
         CAST(COUNT(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'bad_status',
         CAST(COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('F','O','P')) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'dup_orderkeys', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT o_orderkey FROM (
      SELECT o_orderkey FROM orders
      UNION ALL
      SELECT o_orderkey FROM orders WHERE o_orderkey % 101 = 0
    ) GROUP BY 1 HAVING COUNT(*) > 1
  )
  UNION ALL
  SELECT 'qty_out_of_range',
         CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50
                               OR l_quantity IS NULL) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orphan_lineitems', CAST(COUNT(*) AS BIGINT)
  FROM lineitem WHERE l_orderkey NOT IN
    (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 <> 0)
) ORDER BY rule
"""


def k_anonymity_audit(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Privacy DQ audit: quasi-identifier groups smaller than k — the
    k-anonymity check run before releasing a dataset (a group of
    fewer than k customers sharing (nation, market segment) is
    re-identifiable). Combiner-first: per-batch partial counts over
    the QI pair, ONE groupby over at most |nations| × |segments|
    rows, HAVING on the driver-side tiny result."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.pipelines.io_cache import cached_table

    ds = cached_table(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["c_nationkey", "c_mktsegment"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "c_nationkey": pa.array(
                    g["c_nationkey"].to_numpy().astype(np.int64), pa.int64()
                ),
                "c_mktsegment": pa.array(g["c_mktsegment"], pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["c_nationkey", "c_mktsegment"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if counts.empty or "n" not in counts.columns:
        # all-empty upstream drops the aggregate column (project gotcha)
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype="int64"),
                "c_mktsegment": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
    out = counts[counts["n"] < k].copy()
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["c_nationkey", "c_mktsegment"]).reset_index(drop=True)


K_ANONYMITY_SQL = """
SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
FROM customer GROUP BY 1, 2 HAVING COUNT(*) < 10
ORDER BY 1, 2
"""

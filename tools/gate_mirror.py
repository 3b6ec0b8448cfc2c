"""Exact-hash mirror of the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` at a given
scale factor and compares rows / schema / an EXACT value hash (the
driver's comparison is a hash, not an atol — ``np.allclose`` passes
where the gate fails, see round-3 ``nation_pair_volume``).

Usage:
    python tools/gate_mirror.py [--sf /root/testdata/sf0.01]
        [--only name1,name2] [--cpus 32] [--repeat 2]

``--repeat 2`` runs the full set twice in ONE session and reports any
query whose value hash differs between runs (order-nondeterminism
detector — the exact failure mode a single green mirror cannot see).
DuckDB oracle tables are materialized ONCE per session (CREATE TABLE,
not VIEW) so repeated oracles don't re-scan parquet.
"""

import argparse
import hashlib
import json
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            # + 0.0 collapses -0.0 → 0.0 so '%.6f' can't hash a
            # spurious '-0.000000' against the oracle's '0.000000'
            df[c] = df[c].astype("float64").round(6) + 0.0
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif not pd.api.types.is_object_dtype(df[c]) and not pd.api.types.is_string_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    """Exact hash over the normalized frame (mimics the driver gate)."""
    h = hashlib.sha256()
    h.update(",".join(df.columns).encode())
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            # round(6) already applied; hash the decimal repr so
            # -0.0/0.0 and float noise below 1e-6 collapse
            vals = ["%.6f" % v if pd.notna(v) else "∅" for v in col]
        else:
            vals = [str(v) if pd.notna(v) else "∅" for v in col]
        h.update("\x1e".join(vals).encode())
    return h.hexdigest()[:16]


def to_pd(res):
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from rdf2smw_ray.pipelines.queries import all_oracle_sql, all_queries

    con = duckdb.connect()
    for t in TABLES:
        # materialize once per session: repeated / heavy oracles
        # (recursive CTEs) never re-scan parquet
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    q, osql = all_queries(), all_oracle_sql()
    names = sorted(q)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    oracle_hash: dict[str, str] = {}
    run_hashes: list[dict[str, str]] = []
    fails: list[tuple[str, str]] = []
    t_start = time.monotonic()
    for rep in range(args.repeat):
        hashes: dict[str, str] = {}
        for name in names:
            t0 = time.monotonic()
            try:
                rdf = norm(to_pd(q[name](args.sf)))
                hashes[name] = value_hash(rdf)
                if name in osql:
                    if name not in oracle_hash:
                        sdf = norm(con.execute(osql[name]).fetchdf())
                        if list(rdf.columns) != list(sdf.columns):
                            raise AssertionError(
                                f"cols {list(rdf.columns)} vs {list(sdf.columns)}"
                            )
                        if len(rdf) != len(sdf):
                            raise AssertionError(f"rows {len(rdf)} vs {len(sdf)}")
                        oracle_hash[name] = value_hash(sdf)
                    tag = (
                        "ORACLE_OK"
                        if hashes[name] == oracle_hash[name]
                        else "HASH_FAIL"
                    )
                    if tag == "HASH_FAIL":
                        fails.append((name, f"rep{rep} value hash mismatch"))
                else:
                    tag = "ROWS_ONLY"
                print(
                    f"[rep{rep}] {name}: {tag} {len(rdf)} rows "
                    f"{time.monotonic() - t0:.1f}s",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001
                fails.append((name, f"rep{rep} {str(e)[:200]}"))
                print(f"[rep{rep}] {name}: FAIL {e}", flush=True)
        run_hashes.append(hashes)

    drift = []
    if args.repeat > 1:
        for name in names:
            hs = {h.get(name) for h in run_hashes}
            if len(hs) > 1:
                drift.append(name)

    summary = {
        "n": len(names),
        "oracle_checked": len(oracle_hash),
        "fails": fails,
        "drift": drift,
        "wall_s": round(time.monotonic() - t_start, 1),
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 1 if (fails or drift) else 0


if __name__ == "__main__":
    raise SystemExit(main())

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
    ap.add_argument(
        "--no-overlap",
        action="store_true",
        help="run DuckDB oracles inline instead of overlapped threads",
    )
    ap.add_argument(
        "--query-threads",
        type=int,
        default=1,
        help="concurrent Ray query legs within one session. Measured "
        "NET-NEGATIVE on this workload (A/B on a fixed 30-query subset: "
        "79.5 s at 1 thread, 85.3 s at 3, 137.6 s at 8) — per-query wall "
        "is driver-side task submission + GIL-held pandas, which threads "
        "serialize while adding scheduler thrash. Kept for re-measuring; "
        "use --procs for the real speedup.",
    )
    ap.add_argument(
        "--procs",
        type=int,
        default=1,
        help="shard the query set across N subprocesses, each with its "
        "own Ray session on cpus/N CPUs (the per-query wall is "
        "driver-serialized, so only processes parallelize it)",
    )
    ap.add_argument(
        "--json-out",
        default="",
        help="also write the summary JSON to this path (used by --procs "
        "parent to merge shard results)",
    )
    ap.add_argument(
        "--object-store-gb",
        type=float,
        default=0.0,
        help="explicit object store size for this session (sharded "
        "children must not each claim the default 30%% of RAM)",
    )
    args = ap.parse_args()

    if args.procs > 1:
        return _run_sharded(args)

    import ray

    if not ray.is_initialized():
        init_kw = {}
        if args.object_store_gb:
            init_kw["object_store_memory"] = int(args.object_store_gb * (1 << 30))
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
            **init_kw,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    # Ray's path resolution runs `from fsspec.implementations.http
    # import HTTPFileSystem` on EVERY read (path_util._is_http_filesystem),
    # expecting ModuleNotFoundError when absent. In this container the
    # import always fails mid-module (no aiohttp), so it never lands in
    # sys.modules and concurrent query threads race on the partially
    # initialized module — surfacing as a plain ImportError ("cannot
    # import name 'HTTPFileSystem'") that escapes Ray's handler. Pin a
    # stub module once, on the main thread: the import then resolves
    # instantly everywhere, and the stub class matches no isinstance
    # (we only ever read local paths).
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:  # noqa: BLE001
        import types

        import fsspec.implementations

        _stub = types.ModuleType("fsspec.implementations.http")

        class _StubHTTPFileSystem:  # pragma: no cover - never instantiated
            pass

        _stub.HTTPFileSystem = _StubHTTPFileSystem
        sys.modules["fsspec.implementations.http"] = _stub
        fsspec.implementations.http = _stub
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

    # Overlap (r4 VERDICT item #7): the DuckDB leg and the Ray leg
    # share no resources until compare, so every oracle runs in a
    # small thread pool (DuckDB releases the GIL; each thread gets its
    # own cursor on the shared materialized tables) WHILE the main
    # thread drives the Ray queries. Futures return only
    # (columns, row_count, value_hash) — frames are never retained.
    def oracle_job(sql: str):
        cur = con.cursor()
        try:
            sdf = norm(cur.execute(sql).fetchdf())
            return (list(sdf.columns), len(sdf), value_hash(sdf))
        finally:
            cur.close()

    oracle_fut = {}
    if not args.no_overlap:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=3)
        oracle_fut = {
            name: pool.submit(oracle_job, osql[name])
            for name in names
            if name in osql
        }

    from threading import Lock

    oracle_hash: dict[str, str] = {}
    oracle_trip: dict[str, tuple] = {}
    olock = Lock()
    run_hashes: list[dict[str, str]] = []
    fails: list[tuple[str, str]] = []
    t_start = time.monotonic()

    def oracle_triple(name: str) -> tuple:
        """(columns, rows, hash) of the oracle — computed once, any thread."""
        with olock:
            trip = oracle_trip.get(name)
        if trip is None:
            if name in oracle_fut:
                trip = oracle_fut[name].result()
            else:
                trip = oracle_job(osql[name])
            with olock:
                oracle_trip[name] = trip
                oracle_hash[name] = trip[2]
        return trip

    def run_query(rep: int, name: str):
        t0 = time.monotonic()
        try:
            rdf = norm(to_pd(q[name](args.sf)))
            h = value_hash(rdf)
            if name in osql:
                ocols, olen, ohash = oracle_triple(name)
                if list(rdf.columns) != ocols:
                    raise AssertionError(f"cols {list(rdf.columns)} vs {ocols}")
                if len(rdf) != olen:
                    raise AssertionError(f"rows {len(rdf)} vs {olen}")
                tag = "ORACLE_OK" if h == ohash else "HASH_FAIL"
            else:
                tag = "ROWS_ONLY"
            print(
                f"[rep{rep}] {name}: {tag} {len(rdf)} rows "
                f"{time.monotonic() - t0:.1f}s",
                flush=True,
            )
            return name, h, tag, None
        except Exception as e:  # noqa: BLE001
            print(f"[rep{rep}] {name}: FAIL {e}", flush=True)
            return name, None, "FAIL", str(e)[:200]

    for rep in range(args.repeat):
        # a small pool of concurrent Ray legs: each query leaves most
        # of the cluster idle (per-query orchestration dominates at
        # sf0.01), so overlapping a few amortizes the fixed costs;
        # queries are deterministic regardless of co-scheduling, which
        # --repeat's drift detector itself verifies
        if args.query_threads > 1:
            from concurrent.futures import ThreadPoolExecutor as _QP

            with _QP(max_workers=args.query_threads) as qpool:
                results = list(qpool.map(lambda n, r=rep: run_query(r, n), names))
        else:
            results = [run_query(rep, n) for n in names]
        hashes: dict[str, str] = {}
        for name, h, tag, err in results:
            if h is not None:
                hashes[name] = h
            if tag == "HASH_FAIL":
                fails.append((name, f"rep{rep} value hash mismatch"))
            elif tag == "FAIL":
                fails.append((name, f"rep{rep} {err}"))
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
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f)
    if oracle_fut:
        # cancel queued (never-compared) oracle jobs too — without
        # cancel_futures the interpreter-exit join still RUNS them,
        # delaying process exit long after the summary printed
        pool.shutdown(wait=False, cancel_futures=True)
    ray.shutdown()
    return 1 if (fails or drift) else 0


def _run_sharded(args) -> int:
    """Partition the query set over ``--procs`` subprocesses, each a
    full single-session mirror (own Ray cluster on a CPU slice, own
    materialized DuckDB tables, own in-process drift detection). The
    per-query wall is dominated by driver-serialized work (task
    submission + GIL-held pandas normalization), so processes are the
    only parallelism that shortens it — threads measured net-negative
    (see --query-threads help)."""
    import os
    import subprocess
    import tempfile

    sys.path.insert(0, "/root/repo")
    from rdf2smw_ray.pipelines.queries import all_queries

    names = sorted(all_queries())
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    # round-robin over the sorted list spreads the handful of heavy
    # queries (fuzzy_*, prefix_jaccard_pairs, corpus_report) across
    # shards instead of clustering them alphabetically in one
    shards = [names[i :: args.procs] for i in range(args.procs)]
    shards = [s for s in shards if s]
    child_cpus = max(4, args.cpus // len(shards))
    if child_cpus * len(shards) > args.cpus:
        print(
            f"WARNING: --procs {len(shards)} x {child_cpus} cpus oversubscribes "
            f"the --cpus {args.cpus} budget (4-cpu floor per shard); wall times "
            f"will reflect contention, not the claimed budget",
            file=sys.stderr,
        )
    t_start = time.monotonic()
    procs, outs = [], []
    for i, shard in enumerate(shards):
        out = tempfile.NamedTemporaryFile(
            mode="w", suffix=f"_mirror_shard{i}.json", delete=False
        )
        out.close()
        outs.append(out.name)
        cmd = [
            sys.executable,
            __file__,
            "--sf",
            args.sf,
            "--only",
            ",".join(shard),
            "--cpus",
            str(child_cpus),
            "--repeat",
            str(args.repeat),
            "--json-out",
            out.name,
            "--object-store-gb",
            str(args.object_store_gb or 4.0),
        ]
        if args.no_overlap:
            cmd.append("--no-overlap")
        if args.query_threads != 1:
            cmd += ["--query-threads", str(args.query_threads)]
        procs.append(subprocess.Popen(cmd))
    rcs = [p.wait() for p in procs]
    merged = {"n": 0, "oracle_checked": 0, "fails": [], "drift": []}
    for i, path in enumerate(outs):
        try:
            with open(path) as f:
                s = json.load(f)
        except Exception as e:  # noqa: BLE001 - child crashed before writing
            merged["fails"].append((f"shard{i}", f"no summary ({e}; rc={rcs[i]})"))
            continue
        finally:
            try:  # don't litter /tmp with per-shard summaries
                os.unlink(path)
            except OSError:
                pass
        merged["n"] += s["n"]
        merged["oracle_checked"] += s["oracle_checked"]
        merged["fails"].extend(s["fails"])
        merged["drift"].extend(s["drift"])
    merged["wall_s"] = round(time.monotonic() - t_start, 1)
    merged["procs"] = len(shards)
    print(json.dumps(merged))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(merged, f)
    return 1 if (merged["fails"] or merged["drift"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())

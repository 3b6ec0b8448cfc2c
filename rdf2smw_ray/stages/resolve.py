"""Entity linking / URI-to-title resolution — the per-triple half of
the reference's core transform.

Reproduces the per-triple work of
/root/reference/components/triplestowikipageconv.go:93-146 as a
stateful actor-pool ``map_batches`` stage: each actor receives the
broadcast sidecar once in ``__init__`` (``ray.put`` object ref, shared
zero-copy via the object store) and resolves whole Arrow batches with
vectorized pandas kernels. Output rows feed the groupby(subj) page
fold (stages/fold.py) and the property-page aggregation
(stages/properties.py); no operator-local accumulation survives a
batch — that is what makes the stage retryable and the pipeline
resumable.

For sidecars too large to broadcast (~>1-2 GB/node) use
``resolve_triples_join`` — a hash-partitioned equi-join on the lookup
URI instead of a broadcast dict.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.util import table_from_pandas

from rdf2smw_ray.functions.wikititle import (
    CATEGORY_PREDICATES,
    DATATYPE_TO_HAS_TYPE,
    clean_title_series,
    local_name_series,
    strip_namespace_suffixes_series,
)
from rdf2smw_ray.schemas import (
    OBJ_IRI,
    OBJ_LITERAL,
    RESOLVED_SCHEMA,
    URITYPE_UNDEFINED,
)


def _resolve_titles(uris: np.ndarray, title_dict: dict) -> dict[str, str]:
    """Map unique URIs → factTitle: sidecar hit, else cleaned local name
    (fallback path, triplestowikipageconv.go:214-221)."""
    u = pd.Series(uris, dtype=object)
    hit = u.map(title_dict)
    miss = hit.isna()
    if miss.any():
        hit[miss] = clean_title_series(local_name_series(u[miss].astype(str)))
    return dict(zip(uris, hit))


def resolve_batch(batch: pa.Table, lookup: dict[str, dict]) -> pa.Table:
    """Resolve one Arrow batch of triples → RESOLVED_SCHEMA rows.

    Factorized: every per-row lookup runs once per UNIQUE uri in the
    batch (subjects/predicates repeat heavily), then broadcast back by
    integer take."""
    df = batch.to_pandas()
    n = len(df)
    if n == 0:
        return RESOLVED_SCHEMA.empty_table()
    title_dict = lookup["title"]
    type_dict = lookup["uri_type"]
    depth_dict = lookup["depth"]

    kind = df["obj_kind"].to_numpy()
    is_iri = kind == OBJ_IRI
    is_lit = kind == OBJ_LITERAL

    subj_codes, subj_uniq = pd.factorize(df["subj"])
    pred_codes, pred_uniq = pd.factorize(df["pred"])
    obj_iri_series = df["obj"].where(is_iri, "")
    obj_codes, obj_uniq = pd.factorize(obj_iri_series)

    uniq = np.unique(np.concatenate([subj_uniq, pred_uniq, obj_uniq[obj_uniq != ""]]))
    tmap = _resolve_titles(uniq, title_dict)

    subj_title_u = np.array([tmap[u] for u in subj_uniq], dtype=object)
    subj_type_u = np.array(
        [type_dict.get(u, URITYPE_UNDEFINED) for u in subj_uniq], dtype=np.int32
    )
    prop_u = np.array([tmap[u] for u in pred_uniq], dtype=object)
    is_cat_u = np.array([p in CATEGORY_PREDICATES for p in pred_uniq])
    obj_title_u = np.array(
        [tmap.get(u, "") for u in obj_uniq], dtype=object
    )
    obj_depth_u = np.array([depth_dict.get(u, 0) for u in obj_uniq], dtype=np.int32)

    subj_title = subj_title_u[subj_codes]
    subj_type = subj_type_u[subj_codes]
    prop = pd.Series(prop_u[pred_codes], dtype=object)
    pred_title = "Property:" + prop
    is_cat = is_cat_u[pred_codes]

    # object value: IRI → resolved factTitle; literal → lexical value
    # with the namespace-suffix regexes applied
    # (triplestowikipageconv.go:104-117); blank → "" (falls through
    # both branches in the reference)
    lit_vals = strip_namespace_suffixes_series(df["obj"].astype(str))
    value = pd.Series(
        np.where(is_iri, obj_title_u[obj_codes], np.where(is_lit, lit_vals, "")),
        dtype=object,
    )

    depth = pd.Series(np.where(is_cat, obj_depth_u[obj_codes], 0)).astype("int32")

    has_type = pd.Series(
        np.where(
            is_iri, "Page", df["obj_datatype"].map(DATATYPE_TO_HAS_TYPE).fillna("")
        ),
        dtype=object,
    )

    return pa.Table.from_pydict(
        {
            "subj": pa.array(df["subj"], pa.string()),
            "seq": pa.array(df["seq"], pa.int64()),
            "subj_title": pa.array(subj_title, pa.string()),
            "subj_type": pa.array(subj_type, pa.int32()),
            "property": pa.array(prop, pa.string()),
            "pred_title": pa.array(pred_title, pa.string()),
            "value": pa.array(value, pa.string()),
            "is_cat": pa.array(is_cat, pa.bool_()),
            "depth": pa.array(depth, pa.int32()),
            "has_type": pa.array(has_type, pa.string()),
        },
        schema=RESOLVED_SCHEMA,
    )


class TripleResolver:
    """Actor-pool stage: broadcast sidecar in ``__init__`` (once per
    actor), vectorized resolution per batch."""

    def __init__(self, sidecar_ref=None, lookup: dict | None = None):
        if lookup is None:
            import ray

            lookup = ray.get(sidecar_ref)
        self.lookup = lookup

    def __call__(self, batch: pa.Table) -> pa.Table:
        return resolve_batch(batch, self.lookup)


_TASK_LOOKUP_CACHE: dict[str, dict] = {}


def _resolve_task(batch: pa.Table, ref) -> pa.Table:
    """Task-mode resolver: the broadcast lookup is fetched once per
    worker process and cached (warm workers are reused across tasks)."""
    import ray

    key = ref.hex()
    lookup = _TASK_LOOKUP_CACHE.get(key)
    if lookup is None:
        lookup = ray.get(ref)
        _TASK_LOOKUP_CACHE.clear()  # never hold more than one sidecar
        _TASK_LOOKUP_CACHE[key] = lookup
    return resolve_batch(batch, lookup)


# Below this many sidecar entries, task mode (per-process cached fetch)
# beats paying an actor-pool spawn burst; above it, dedicated actors
# amortize the deserialization of a giant dict.
_ACTOR_MODE_THRESHOLD = 2_000_000


def resolve_triples(
    triples,
    sidecar: pa.Table,
    *,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 64 * 1024,
    mode: str = "auto",  # "auto" | "task" | "actor"
):
    """triples Dataset → resolved Dataset using a broadcast sidecar.

    The sidecar dicts are ``ray.put`` once; every worker reads the same
    object-store copy (never re-shipped per batch). ``mode="task"``
    (auto-chosen for small sidecars) runs on Ray's warm task workers
    with a per-process cache; ``"actor"`` pins a pool that holds the
    deserialized dict for its lifetime — the right shape for sidecars
    with millions of entries.
    """
    import functools

    import ray

    from rdf2smw_ray.stages.sidecar import sidecar_lookup
    from rdf2smw_ray.util import pool

    ref = ray.put(sidecar_lookup(sidecar))
    if mode == "auto":
        mode = "task" if sidecar.num_rows < _ACTOR_MODE_THRESHOLD else "actor"
    if mode == "task":
        return triples.map_batches(
            functools.partial(_resolve_task, ref=ref),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return triples.map_batches(
        TripleResolver,
        fn_constructor_kwargs={"sidecar_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool(concurrency),
    )


def _bucket_of(values: pd.Series, num_partitions: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(values, index=False).to_numpy()
    return (h % num_partitions).astype(np.int32)


def _bucketed_left_lookup(left_ds, key: str, side_ds, out_cols: dict, num_partitions: int):
    """Explicit partitioned hash join (ray_guide "portable pattern"):
    tag both sides, co-shuffle on ``hash(key) % num_partitions``, merge
    each bucket with a pandas left-join. Avoids the experimental
    ``Dataset.join`` operator (its hash-shuffle aggregator actors stall
    intermittently at low CPU counts).

    ``out_cols``: sidecar column → output column name; joined columns
    are appended to the left rows (null where unmatched).
    """

    def tag_left(batch: pa.Table) -> pa.Table:
        b = batch.append_column(
            "__bucket",
            pa.array(_bucket_of(pd.Series(batch[key].to_pylist()), num_partitions)),
        )
        return b.append_column("__side", pa.array(np.zeros(len(batch), dtype=np.int8)))

    def tag_right(batch: pa.Table) -> pa.Table:
        # reshape the sidecar row to the combined schema: key + payload
        out = pa.table(
            {
                key: batch["uri"],
                **{dst: batch[src] for src, dst in out_cols.items()},
            }
        )
        b = out.append_column(
            "__bucket",
            pa.array(_bucket_of(pd.Series(out[key].to_pylist()), num_partitions)),
        )
        return b.append_column("__side", pa.array(np.ones(len(out), dtype=np.int8)))

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow")
    right_tagged = side_ds.map_batches(tag_right, batch_format="pyarrow")

    left_cols = None

    def merge(df: pd.DataFrame) -> pa.Table:
        right = df[df["__side"] == 1]
        left = df[df["__side"] == 0].drop(columns=["__bucket", "__side"])
        left = left.drop(columns=[c for c in out_cols.values() if c in left.columns])
        rcols = [key, *out_cols.values()]
        right = right[rcols].drop_duplicates(key)
        merged = left.merge(right, on=key, how="left")
        # stable dtypes across buckets (a fully-matched bucket would
        # otherwise keep int while others go float-with-NaN)
        for c in out_cols.values():
            if pd.api.types.is_numeric_dtype(merged[c]):
                merged[c] = merged[c].astype("float64")
            else:
                merged[c] = merged[c].astype(object).where(merged[c].notna(), None)
        return table_from_pandas(merged, preserve_index=False)

    # union needs one combined schema: pad each side with the other's
    # missing columns as typed nulls
    combined: dict[str, object] = {}
    for d in (left_tagged, right_tagged):
        sch = d.schema()
        for n, t in zip(sch.names, sch.types):
            combined.setdefault(n, t)
    all_cols = list(combined)

    def pad(batch: pa.Table) -> pa.Table:
        for c, t in combined.items():
            if c not in batch.column_names:
                batch = batch.append_column(c, pa.nulls(len(batch), type=t))
        return batch.select(all_cols)

    padded_l = left_tagged.map_batches(pad, batch_format="pyarrow")
    padded_r = right_tagged.map_batches(pad, batch_format="pyarrow")
    unioned = padded_l.union(padded_r)
    return unioned.groupby("__bucket").map_groups(merge, batch_format="pandas")


def resolve_triples_join(triples, sidecar_ds, *, num_partitions: int | None = None):
    """Large-sidecar path: explicit hash-partitioned lookups instead of
    broadcast — three co-shuffles of the triple stream (on ``subj``,
    ``pred``, IRI ``obj``), each a bucketed pandas merge. Use when the
    sidecar cannot be broadcast (see ``build_sidecar_ds``).

    ``num_partitions`` auto-sizes from the triple stream's estimated
    bytes (tuning.auto_buckets) so per-bucket frames stay bounded at
    any corpus size."""
    import ray.data as rd

    if num_partitions is None:
        from rdf2smw_ray.tuning import auto_buckets, dataset_est_bytes

        num_partitions = auto_buckets(dataset_est_bytes(triples))

    side = (
        rd.from_arrow(sidecar_ds) if isinstance(sidecar_ds, pa.Table) else sidecar_ds
    )

    step1 = _bucketed_left_lookup(
        triples,
        "subj",
        side,
        {"title": "title_s", "uri_type": "uri_type_s"},
        num_partitions,
    )
    step2 = _bucketed_left_lookup(
        step1, "pred", side, {"title": "title_p"}, num_partitions
    )
    step3 = _bucketed_left_lookup(
        step2, "obj", side, {"title": "title_o", "depth": "depth_o"}, num_partitions
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        lookup: dict[str, dict] = {"title": {}, "uri_type": {}, "depth": {}}
        for col, suffix in (("subj", "title_s"), ("pred", "title_p"), ("obj", "title_o")):
            t = df.get(suffix)
            if t is not None:
                mask = t.notna()
                lookup["title"].update(dict(zip(df[col][mask], t[mask])))
        ut = df.get("uri_type_s")
        if ut is not None:
            mask = ut.notna()
            lookup["uri_type"].update(
                dict(zip(df["subj"][mask], ut[mask].astype(int)))
            )
        dp = df.get("depth_o")
        if dp is not None:
            mask = dp.notna()
            lookup["depth"].update(dict(zip(df["obj"][mask], dp[mask].astype(int))))
        keep = [
            c
            for c in batch.column_names
            if c not in ("title_s", "title_p", "title_o", "uri_type_s", "depth_o")
        ]
        return resolve_batch(batch.select(keep), lookup)

    return step3.map_batches(finish, batch_format="pyarrow")

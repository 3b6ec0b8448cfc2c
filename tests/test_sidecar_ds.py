"""Distributed sidecar build parity: build_sidecar_ds (bucketed,
join-path) must equal build_sidecar (driver-reduced, broadcast-path)
row for row — and the join-path pipeline built from it must match the
broadcast pipeline end to end."""

import pandas as pd
import pytest

import ray.data as rd

from rdf2smw_ray.sources.fixtures import fixture_triples
from rdf2smw_ray.stages.sidecar import build_sidecar, build_sidecar_ds


def _sorted_df(t):
    df = t.to_pandas() if hasattr(t, "to_pandas") else t
    return df.sort_values("uri").reset_index(drop=True)


def test_sidecar_ds_equals_driver_build():
    fx = fixture_triples(head_facts=30)
    ds = rd.from_arrow(fx).repartition(4)
    a = _sorted_df(build_sidecar(ds))
    b = _sorted_df(build_sidecar_ds(ds).to_pandas())
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_sidecar_ds_on_kg_corpus():
    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples

    import pyarrow as pa

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": list(range(60)),
                "text": ["b"] * 60,
                "lang": ["en"] * 60,
            }
        )
    ).repartition(5)
    triples = extract_triples(extract_text(synth_web_pages(docs))).materialize()
    a = _sorted_df(build_sidecar(triples))
    b = _sorted_df(build_sidecar_ds(triples).to_pandas())
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_join_path_pipeline_with_sidecar_ds():
    """Full large-side path: distributed sidecar + hash-partitioned
    join resolve, folded and compared against the broadcast pipeline."""
    from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
    from rdf2smw_ray.stages.fold import fold_pages
    from rdf2smw_ray.stages.resolve import resolve_triples_join

    fx = fixture_triples(head_facts=20)
    ds = rd.from_arrow(fx)

    broadcast = rdf2smw_pipeline(ds, resolver_concurrency=2)
    sidecar_ds = build_sidecar_ds(ds)
    resolved = resolve_triples_join(ds, sidecar_ds, num_partitions=4)
    pages_join = fold_pages(resolved).to_pandas()
    pages_bcast = broadcast["pages"].to_pandas()

    def norm(df):
        return sorted(
            (
                r["subj"],
                r["title"],
                int(r["page_type"]),
                tuple((f["property"], f["value"]) for f in r["facts"]),
                tuple(r["categories"]),
                r["specific_category"],
            )
            for _, r in df.iterrows()
        )

    assert norm(pages_join) == norm(pages_bcast)

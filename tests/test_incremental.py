"""Incremental KG update ≡ full recompute (pipelines/incremental.py).

Corpus: synthetic web pages. The delta introduces NEW docs whose
entities are already referenced by base docs (the generator labels e1
per doc, and base docs reference e2 = next entity — so a delta
naturally RETITLES entities the base only knew by local name), the
exact cross-page invalidation the sidecar-diff logic exists for.
"""

import pandas as pd
import pyarrow as pa

import ray.data as rd

from rdf2smw_ray.pipelines.incremental import incremental_update, sidecar_changes
from rdf2smw_ray.sources.webpages import synth_web_pages
from rdf2smw_ray.stages.extract_text import extract_text
from rdf2smw_ray.stages.extract_triples import extract_triples
from rdf2smw_ray.stages.fold import fold_pages
from rdf2smw_ray.stages.render import render_pages
from rdf2smw_ray.stages.resolve import resolve_triples
from rdf2smw_ray.stages.sidecar import build_sidecar

import pyarrow.compute as pc

from rdf2smw_ray.schemas import URITYPE_PREDICATE


def _docs(lo: int, hi: int):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array([f"salad words {i}" for i in range(lo, hi)]),
                "lang": pa.array(["en"] * (hi - lo)),
            }
        )
    )


def _triples(lo: int, hi: int):
    return extract_triples(extract_text(synth_web_pages(_docs(lo, hi)))).materialize()


def _content_df(triples, sidecar) -> pd.DataFrame:
    resolved = resolve_triples(triples, sidecar, concurrency=2)
    pages = fold_pages(resolved).map_batches(
        lambda t: t.filter(pc.not_equal(t["page_type"], URITYPE_PREDICATE)),
        batch_format="pyarrow",
    )
    out = render_pages(pages).to_pandas()
    return out[["subj", "title", "wikitext", "xml"]].sort_values("subj").reset_index(
        drop=True
    )


def test_incremental_equals_full_recompute(ray_session):
    # base docs d ∈ [0, 60) reference (but don't label) e2 = 3d+1 mod
    # 1009; the generator labels e1 = 3d' mod 1009, and 3d' ≡ 3d+1
    # needs d' = d + 673 (673 = 3⁻¹ mod 1009) — so delta docs
    # [673, 703) RETITLE entities base docs [0, 30) only knew by local
    # name: the cross-page invalidation case.
    base = _triples(0, 60)
    delta = _triples(673, 703)
    prev_sidecar = build_sidecar(base)

    # ground truth: full recompute over the union
    union = base.union(delta).materialize()
    full_sidecar = build_sidecar(union)
    full = _content_df(union, full_sidecar)

    inc = incremental_update(base, delta, prev_sidecar, resolver_concurrency=2)
    upd = (
        inc["content"]
        .to_pandas()[["subj", "title", "wikitext", "xml"]]
        .sort_values("subj")
        .reset_index(drop=True)
    )

    # 1. every updated page is byte-identical to the full recompute's
    full_by_subj = full.set_index("subj")
    assert len(upd) > 0
    for r in upd.itertuples():
        f = full_by_subj.loc[r.subj]
        assert (r.title, r.wikitext, r.xml) == (f["title"], f["wikitext"], f["xml"]), r.subj

    # 2. completeness: every page the full recompute renders
    #    differently from the base run IS in the updated set
    base_pages = _content_df(base, prev_sidecar)
    base_by_subj = base_pages.set_index("subj")
    updated_subjects = set(upd["subj"])
    for r in full.itertuples():
        old = base_by_subj.loc[r.subj] if r.subj in base_by_subj.index else None
        changed = old is None or (
            old["title"] != r.title
            or old["wikitext"] != r.wikitext
            or old["xml"] != r.xml
        )
        if changed:
            assert r.subj in updated_subjects, r.subj

    # 3. untouched pages really are untouched (upsert of upd over the
    #    base store reproduces the full result exactly)
    merged = {r.subj: (r.title, r.wikitext, r.xml) for r in base_pages.itertuples()}
    for r in upd.itertuples():
        merged[r.subj] = (r.title, r.wikitext, r.xml)
    want = {r.subj: (r.title, r.wikitext, r.xml) for r in full.itertuples()}
    assert merged == want

    # 4. the delta genuinely retitled base-referenced entities
    #    (otherwise this test is not exercising cross-page invalidation)
    changed = inc["changed_uris"]
    assert any(u in set(base.to_pandas()["obj"]) for u in changed)
    assert inc["retracted_titles"]  # at least one superseded title


def test_sidecar_changes_detects_each_field(ray_session):
    t1 = pa.table(
        {
            "uri": ["a", "b", "c", "d"],
            "title": ["A", "B", "C", "D"],
            "uri_type": pa.array([0, 0, 0, 0], pa.int32()),
            "depth": pa.array([0, 1, 0, 0], pa.int32()),
        }
    )
    t2 = pa.table(
        {
            "uri": ["a", "b", "c", "e"],
            "title": ["A2", "B", "C", "E"],
            "uri_type": pa.array([0, 3, 0, 0], pa.int32()),
            "depth": pa.array([0, 1, 0, 0], pa.int32()),
        }
    )
    assert sidecar_changes(t1, t2) == {"a", "b", "d", "e"}

"""All three resolver modes (task / actor / join) produce identical
resolved rows."""

import pandas as pd
import pytest

import ray.data as rd

from rdf2smw_ray.sources.fixtures import fixture_triples
from rdf2smw_ray.stages.resolve import resolve_triples, resolve_triples_join
from rdf2smw_ray.stages.sidecar import build_sidecar, build_sidecar_ds


@pytest.fixture(scope="module")
def corpus():
    fx = fixture_triples(head_facts=25)
    ds = rd.from_arrow(fx).repartition(3)
    return ds, build_sidecar(ds)


def _norm(df):
    return df.sort_values(["subj", "seq"]).reset_index(drop=True)


def test_actor_mode_equals_task_mode(corpus):
    ds, sidecar = corpus
    task = _norm(resolve_triples(ds, sidecar, mode="task").to_pandas())
    actor = _norm(
        resolve_triples(ds, sidecar, mode="actor", concurrency=2).to_pandas()
    )
    pd.testing.assert_frame_equal(task, actor)


def test_join_mode_equals_task_mode(corpus):
    ds, sidecar = corpus
    task = _norm(resolve_triples(ds, sidecar, mode="task").to_pandas())
    joined = _norm(
        resolve_triples_join(ds, build_sidecar_ds(ds), num_partitions=3).to_pandas()
    )
    pd.testing.assert_frame_equal(task, joined[task.columns])

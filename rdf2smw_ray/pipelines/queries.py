"""Driver-contract queries: one callable per implemented operator
(SURVEY.md §2 + training-data ops), each over the parquet tables in an
``sf_dir``, plus the matching DuckDB oracle SQL.

Conventions for driver hash-parity (see __ray_entry__ docstring):
- every aggregate/computed column is explicitly named the same in the
  Ray code and the SQL;
- float results are rounded (2–6 decimals) on BOTH sides;
- counts/sums of ints are CAST to BIGINT in SQL to match int64;
- timestamps returned as strings (strftime) to dodge unit mismatches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.util import table_from_pandas
import pyarrow.parquet as pq

from rdf2smw_ray.pipelines import diff, dq, fuzzy, packing, ranking, relational, report, spans, windows
from rdf2smw_ray.pipelines.ann import (
    KNN_GRAPH_SQL,
    LABEL_CENTROID_NORM_SQL,
    ann_brute_topk,
    ann_lsh_topk,
    embedding_near_dup,
)
from rdf2smw_ray.pipelines.dedup import exact_dedup, minhash_dedup, simhashes
from rdf2smw_ray.pipelines.textstats import (
    STOPWORDS,
    TOP_TOKENS_PER_LANG_SQL,
    fingerprints,
    lang_id,
    quality_score,
    token_stats,
)
from rdf2smw_ray.stages.extract_triples import DEFAULT_GAZETTEER, GazetteerMentionExtractor

GAZ_PATTERN = r"\b(" + "|".join(DEFAULT_GAZETTEER) + r")\b"


def _docs(sf_dir: str, columns=None):
    from rdf2smw_ray.pipelines.io_cache import cached_table

    return cached_table(sf_dir, "documents", columns)


def _emb(sf_dir: str):
    from rdf2smw_ray.pipelines.io_cache import cached_table

    return cached_table(sf_dir, "embeddings")


def _events_cached(sf_dir: str, columns=None):
    from rdf2smw_ray.pipelines.io_cache import cached_table

    return cached_table(sf_dir, "events", columns)


# ---------------------------------------------------------------------------
# Self-certification helpers (shared by the approximate/rows-only
# queries — one implementation, five call sites)
# ---------------------------------------------------------------------------
def _parquet_nrows(path: str) -> int:
    """Row count from the parquet FOOTER only (no data pages read) —
    size-gates driver-side certifications BEFORE any full load, so the
    'certification skipped (too large)' path costs metadata, not data."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _md5_gate(v) -> bool:
    """Deterministic ~12.5% certification sample: md5(id) hex < '20'."""
    import hashlib

    return hashlib.md5(str(int(v)).encode()).hexdigest()[:2] < "20"


_UNIT_EMB_CACHE: dict = {}


def _unit_embedding_matrix(sf_dir: str):
    """Driver-side (sorted ids, unit-normalised row matrix) for cosine
    certifications. Callers MUST size-gate via _parquet_nrows first.
    Memoised per (path, mtime): two certifying queries in one gate run
    share one read + one normalisation instead of repeating them."""
    import os

    from rdf2smw_ray.pipelines.ann import _unit

    path = f"{sf_dir}/embeddings.parquet"
    key = (path, os.stat(path).st_mtime_ns)
    if key in _UNIT_EMB_CACHE:
        return _UNIT_EMB_CACHE[key]
    emb = pd.read_parquet(path, columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    if len(ids) == 0:  # np.asarray([]) is 1-D; _unit would AxisError
        mat = np.zeros((0, 1), dtype=np.float64)
    else:
        mat = _unit(np.asarray(emb["embedding"].tolist(), dtype=np.float64)[order])
    _UNIT_EMB_CACHE.clear()  # hold at most one corpus (≤4096 rows) at a time
    _UNIT_EMB_CACHE[key] = (ids, mat)
    return ids, mat


def _cosine_cert(sf_dir: str, pairs, threshold: float, *, keepers=None, name: str = ""):
    """Shared driver-matmul certification for the embedding-dedup
    family: every reported (flagged, partner) pair must have cosine ≥
    threshold with partner < flagged (and, when given, partner ∈
    keepers) — precision 1.0, any violation raises. Returns recall
    (int %) vs the exact flagged set, vacuously 100 when the corpus
    has no pair at or above threshold."""
    ids, mat = _unit_embedding_matrix(sf_dir)
    if len(ids) == 0:
        if pairs:
            raise AssertionError(f"{name}: pairs reported on an empty corpus")
        return np.int64(100)
    sims = mat @ mat.T
    pos = {int(v): i for i, v in enumerate(ids)}
    # The driver recomputes cosines with a different GEMM shape than
    # the worker (full n×n vs per-bucket tiles); BLAS summation order
    # can differ in the last ulp, so the precision check allows 1e-9
    # below threshold rather than spuriously failing a boundary pair.
    bad = [
        (a, b)
        for a, b in pairs
        if sims[pos[a], pos[b]] < threshold - 1e-9
        or not b < a
        or (keepers is not None and b not in keepers)
    ]
    if bad:
        raise AssertionError(f"{name} invalid duplicates: {bad[:5]}")
    exact_flagged = {
        int(ids[j]) for j in range(1, len(ids)) if (sims[j, :j] >= threshold).any()
    }
    got_flagged = {a for a, _ in pairs}
    return (
        np.int64(100)
        if not exact_flagged
        else np.int64(len(got_flagged & exact_flagged) * 100 // len(exact_flagged))
    )


# ---------------------------------------------------------------------------
# KG queries
# ---------------------------------------------------------------------------
def kg_mentions(sf_dir: str):
    """Dictionary-based mention detection (one row per occurrence)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = ds.map_batches(
        GazetteerMentionExtractor,
        fn_constructor_kwargs={"terms": list(DEFAULT_GAZETTEER)},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    return out.to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)


KG_MENTIONS_SQL = f"""
SELECT doc_id, unnest(regexp_extract_all(text, '{GAZ_PATTERN}', 1)) AS term
FROM documents ORDER BY doc_id, term
"""


def kg_mention_counts(sf_dir: str):
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    mentions = ds.map_batches(
        GazetteerMentionExtractor,
        fn_constructor_kwargs={"terms": list(DEFAULT_GAZETTEER)},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("term", sort=False).size().rename("n").reset_index()
        return table_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        mentions.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("term").reset_index(drop=True)


KG_MENTION_COUNTS_SQL = f"""
SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT unnest(regexp_extract_all(text, '{GAZ_PATTERN}', 1)) AS term FROM documents
) GROUP BY term ORDER BY term
"""


def kg_cooccur(sf_dir: str):
    """Adjacent gazetteer-term pairs per document (bigram graph edges).

    Pairs are formed INSIDE the extractor (``emit="pairs"``), which
    holds each whole document as one input row — a bigram can never
    straddle an output block split, unlike the previous per-batch
    ``shift(-1)`` over the mentions table (block-split-proof; see
    ``tests/test_r4_fixes.py``)."""
    ds = _docs(sf_dir, columns=["doc_id", "text"])
    pairs = ds.map_batches(
        GazetteerMentionExtractor,
        fn_constructor_kwargs={"terms": list(DEFAULT_GAZETTEER), "emit": "pairs"},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["term_a", "term_b"], sort=False).size().rename("n").reset_index()
        return table_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        pairs.map_batches(partial, batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["term_a", "term_b"]).reset_index(drop=True)


KG_COOCCUR_SQL = f"""
WITH m AS (
  SELECT doc_id, regexp_extract_all(text, '{GAZ_PATTERN}', 1) AS terms FROM documents
), u AS (
  SELECT doc_id, unnest(terms) AS term, generate_subscripts(terms, 1) AS idx FROM m
)
SELECT a.term AS term_a, b.term AS term_b, CAST(COUNT(*) AS BIGINT) AS n
FROM u a JOIN u b ON a.doc_id = b.doc_id AND b.idx = a.idx + 1
GROUP BY 1, 2 ORDER BY 1, 2
"""

# --- full front half: synth pages → extract_text → extract_triples --------
_ENT = "http://kg.example.org/entity/Entity_"
_CLS = "http://kg.example.org/class/Class_"
_PROP = "http://kg.example.org/prop/"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
_RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
_OWL_CLASS = "http://www.w3.org/2002/07/owl#Class"


def kg_extracted_triples(sf_dir: str):
    """The WHOLE front half under a value-checked oracle: documents →
    synthetic web pages → html → extract_text → pattern extraction,
    aggregated to (subj, pred, obj, n) counts. The SQL oracle derives
    the same multiset directly from doc_id arithmetic — any divergence
    in generator, html round-trip, or extractor rules shows up as a
    hash mismatch."""
    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    pages = synth_web_pages(docs)
    triples = extract_triples(extract_text(pages, concurrency=2), concurrency=2)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return table_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        triples.map_batches(partial, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def q_kg_degree_histogram(sf_dir: str):
    """Graph-shape analytics over the extracted KG: out-degree
    count-of-counts (how many subjects emit exactly d triples,
    multiset degree). Two-level aggregation — per-batch subject
    pre-count, groupby(subj) sum (the only wide shuffle; Entity_0's
    head-entity skew lands here as one big count, not one big group),
    then a TINY histogram groupby."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    triples = extract_triples(
        extract_text(synth_web_pages(docs), concurrency=2), concurrency=2
    )

    def subj_partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch["subj"].to_pylist(), dtype=object).value_counts()
        return pa.table(
            {
                "subj": pa.array(vc.index.to_numpy(), pa.string()),
                "deg": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    def hist_partial(batch: pa.Table) -> pa.Table:
        vc = pd.Series(batch["deg"].to_numpy()).value_counts()
        return pa.table(
            {
                "degree": pa.array(vc.index.to_numpy(), pa.int64()),
                "n_subjects": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    out = (
        triples.map_batches(subj_partial, batch_format="pyarrow")
        .groupby("subj")
        .aggregate(Sum("deg", alias_name="deg"))
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_subjects", alias_name="n_subjects"))
        .to_pandas()
    )
    out["degree"] = out["degree"].astype("int64")
    out["n_subjects"] = out["n_subjects"].astype("int64")
    return out.sort_values("degree").reset_index(drop=True)


KG_EXTRACTED_TRIPLES_SQL = f"""
WITH d AS (
  SELECT doc_id,
         (3*doc_id) % 1009 AS e1,
         (3*doc_id+1) % 1009 AS e2,
         ((3*doc_id) % 1009) % 8 AS k,
         doc_id % 11 AS c
  FROM documents
), t AS (
  SELECT '{_ENT}' || e1 AS subj, '{_RDFS_LABEL}' AS pred, 'Ent ' || e1 || ' Label' AS obj FROM d
  UNION ALL SELECT '{_ENT}' || e1, '{_RDF_TYPE}', '{_CLS}' || k FROM d
  UNION ALL SELECT '{_CLS}' || k, '{_RDF_TYPE}', '{_OWL_CLASS}' FROM d
  UNION ALL SELECT '{_ENT}' || e1, '{_PROP}works_with', '{_ENT}' || e2 FROM d
  UNION ALL SELECT '{_ENT}' || e1, '{_PROP}has_size', CAST(doc_id % 100 AS VARCHAR) FROM d
  UNION ALL SELECT '{_ENT}' || e1, '{_PROP}refers_to', '{_ENT}' || '0' FROM d
  UNION ALL SELECT '{_CLS}' || c, '{_RDFS_SUBCLASS}', '{_CLS}' || (c+1) FROM d WHERE c <= 6
  UNION ALL SELECT '{_CLS}' || c, '{_RDF_TYPE}', '{_OWL_CLASS}' FROM d WHERE c <= 6
  UNION ALL SELECT '{_CLS}' || (c+1), '{_RDF_TYPE}', '{_OWL_CLASS}' FROM d WHERE c <= 6
  UNION ALL SELECT '{_CLS}' || k, '{_RDFS_LABEL}', 'Klass ' || k FROM d WHERE doc_id % 20 = 0
  UNION ALL SELECT '{_ENT}' || '0', '{_RDFS_LABEL}', 'The Hub' FROM d WHERE doc_id % 50 = 0
  UNION ALL SELECT '{_ENT}' || '0', '{_RDF_TYPE}', '{_CLS}' || '0' FROM d WHERE doc_id % 50 = 0
  UNION ALL SELECT '{_CLS}' || '0', '{_RDF_TYPE}', '{_OWL_CLASS}' FROM d WHERE doc_id % 50 = 0
)
SELECT subj, pred, obj, CAST(COUNT(*) AS BIGINT) AS n
FROM t GROUP BY subj, pred, obj ORDER BY subj, pred, obj
"""

def q_kg_two_hop(sf_dir: str):
    """2-hop path counting over works_with edge OCCURRENCES — the
    multiplicity-preserving distributed self-join (bucketed_join
    multiplicity='all'): every (occurrence, occurrence) chain a→b→c
    counts, so a lookup-semantics join would undercount ~25×. n_pairs
    collapses to distinct (a, c) via a combiner-first pair groupby."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples
    from rdf2smw_ray.stages.join import bucketed_join

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    triples = extract_triples(
        extract_text(synth_web_pages(docs), concurrency=2), concurrency=2
    )

    def edges_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.equal(batch["pred"], _PROP + "works_with"))
        return pa.table({"a": t["subj"], "b": t["obj"]})

    edges = triples.map_batches(edges_batch, batch_format="pyarrow")
    # self-join: left (a, b) ⋈ right (a→key, b→c) on b == right.a
    paths = bucketed_join(
        edges,
        edges,
        key="b",
        right_key="a",
        right_cols={"b": "c"},
        multiplicity="all",
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["a", "c"], sort=False).size().rename("n").reset_index()
        return table_from_pandas(g, preserve_index=False)

    per_pair = (
        paths.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["a", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_paths": pd.Series([int(per_pair["n"].sum())], dtype="int64"),
            "n_pairs": pd.Series([len(per_pair)], dtype="int64"),
        }
    )


# edge multiset mirrors the works_with arm of the triple CTEs
KG_TWO_HOP_SQL = f"""
WITH d AS (
  SELECT (3*doc_id) % 1009 AS e1, (3*doc_id+1) % 1009 AS e2 FROM documents
), e AS (
  SELECT '{_ENT}' || e1 AS a, '{_ENT}' || e2 AS b FROM d
), p AS (
  SELECT x.a AS a, y.b AS c FROM e x JOIN e y ON x.b = y.a
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_paths,
       CAST((SELECT COUNT(*) FROM (SELECT DISTINCT a, c FROM p)) AS BIGINT) AS n_pairs
FROM p
"""


def _kg_edges(sf_dir: str, preds: tuple[str, ...]):
    """(src, dst) edge occurrences from the extracted-triple stream,
    filtered to the given predicate local names."""
    import pyarrow.compute as pc

    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    triples = extract_triples(
        extract_text(synth_web_pages(docs), concurrency=2), concurrency=2
    )
    wanted = [_PROP + p for p in preds]

    def edges_batch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch["pred"], value_set=pa.array(wanted)))
        return pa.table({"src": t["subj"], "dst": t["obj"]})

    return triples.map_batches(edges_batch, batch_format="pyarrow")


def q_kg_triangles(sf_dir: str):
    """Exact triangle count over the undirected works_with ∪ refers_to
    entity graph — wedge join + pair-key semi-join closure
    (graph.triangle_count), every step a bucketed Dataset op. The
    refers_to hub star × works_with chain produces real triangles
    (hub, i, i+1)."""
    from rdf2smw_ray.pipelines.graph import triangle_count

    n = triangle_count(_kg_edges(sf_dir, ("works_with", "refers_to")))
    return pd.DataFrame({"n_triangles": pd.Series([n], dtype="int64")})


KG_TRIANGLES_SQL = f"""
WITH d AS (
  SELECT (3*doc_id) % 1009 AS e1, (3*doc_id+1) % 1009 AS e2 FROM documents
), raw AS (
  SELECT '{_ENT}' || e1 AS u, '{_ENT}' || e2 AS v FROM d
  UNION ALL SELECT '{_ENT}' || e1, '{_ENT}' || '0' FROM d
), e AS (
  SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM raw WHERE u <> v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e x JOIN e y ON x.b = y.a JOIN e z ON z.a = x.a AND z.b = y.b
"""


def q_kg_bfs(sf_dir: str):
    """Shortest hop distances (≤4) from a seed entity over the
    undirected works_with graph — iterative frontier BFS where every
    step is a bucketed join + min-groupby (graph.bfs_distances); the
    oracle is a bounded recursive CTE taking MIN over enumerated
    walks."""
    from rdf2smw_ray.pipelines.graph import bfs_distances

    dist = bfs_distances(
        _kg_edges(sf_dir, ("works_with",)), _ENT + "2", max_hops=4
    ).to_pandas()
    dist["node"] = dist["node"].astype(str)
    dist["dist"] = dist["dist"].astype("int64")
    return dist.sort_values("node").reset_index(drop=True)


KG_BFS_SQL = f"""
WITH RECURSIVE d AS (
  SELECT (3*doc_id) % 1009 AS e1, (3*doc_id+1) % 1009 AS e2 FROM documents
), raw AS (
  SELECT '{_ENT}' || e1 AS u, '{_ENT}' || e2 AS v FROM d
), e0 AS (
  SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM raw WHERE u <> v
), e AS (
  SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
), walk AS (
  SELECT '{_ENT}2' AS node, 0 AS dist
  UNION ALL
  SELECT e.v, walk.dist + 1 FROM walk JOIN e ON e.u = walk.node
  WHERE walk.dist < 4
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
FROM walk GROUP BY 1 ORDER BY 1
"""


# same triple-multiset CTEs, different rollup: out-degree histogram
KG_DEGREE_HISTOGRAM_SQL = (
    KG_EXTRACTED_TRIPLES_SQL.split("SELECT subj, pred, obj, CAST")[0]
    + """, deg AS (SELECT subj, COUNT(*) AS d FROM t GROUP BY 1)
SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_subjects
FROM deg GROUP BY 1 ORDER BY 1
"""
)


def kg_extracted_triples_robust(sf_dir: str):
    """Same front half as :func:`kg_extracted_triples`, but the text is
    recovered from the html by the REAL-HTML tokenizer engine
    (``extract_text(engine="robust")``) instead of the byte-exact
    regex inverse. The pattern extractor is line-based and the robust
    engine's normalization only drops blank lines / collapses
    horizontal whitespace, so the extracted (subj, pred, obj) multiset
    must be IDENTICAL — the same doc_id-arithmetic oracle value-checks
    the whole robust front half end-to-end."""
    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    pages = synth_web_pages(docs)
    triples = extract_triples(
        extract_text(pages, concurrency=2, engine="robust"), concurrency=2
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["subj", "pred", "obj"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return table_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        triples.map_batches(partial, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def kg_page_facts(sf_dir: str):
    """The WHOLE flagship pipeline under a VALUE-checked oracle: web
    pages → triples → sidecar → resolve → fold, exploded to
    (title, property, value) fact rows (round-1 VERDICT item #7 —
    converts kg's back half from rows-only to hash-checked).

    Exclusion (documented, narrow): Entity_0 carries two distinct
    labels ("The Hub" / "Ent 0 Label"); first-wins resolution between
    them follows the deterministic blake2b-seq order, which SQL cannot
    replicate — so the hub's own page and the fact rows whose VALUE is
    the hub's title (`Refers_to` and the one works-with edge) are
    excluded on both sides. Everything else — label-vs-local-name
    title resolution, category titles, literal cleanup, Equivalent URI
    — is value-compared exactly."""
    from rdf2smw_ray.pipelines.kg import flagship

    hub_subj = _ENT + "0"
    hub_titles = {"The Hub", "Ent 0 Label", "Entity_0"}

    out = flagship(sf_dir, concurrency=2)

    def explode(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        t, p, v = [], [], []
        for subj, title, facts, cats in zip(
            df["subj"], df["title"], df["facts"], df["categories"]
        ):
            if subj == hub_subj:
                continue
            for f in facts:
                if f["property"] == "Refers_to" or (
                    f["property"] == "Works_with" and f["value"] in hub_titles
                ):
                    continue
                t.append(title)
                p.append(f["property"])
                v.append(f["value"])
            for c in cats:
                t.append(title)
                p.append("Category")
                v.append(c)
        return pa.table(
            {
                "title": pa.array(t, pa.string()),
                "property": pa.array(p, pa.string()),
                "value": pa.array(v, pa.string()),
            }
        )

    rows = out["pages"].map_batches(explode, batch_format="pyarrow").to_pandas()
    return rows.sort_values(["title", "property", "value"]).reset_index(drop=True)


# Derives the SAME fact multiset from doc_id arithmetic (valid while
# doc_id < 1009 keeps e1 injective — true at the correctness-gate
# scales; the generator and extractor rules are what is under test).
KG_PAGE_FACTS_SQL = f"""
WITH d AS (
  SELECT doc_id, (3*doc_id) % 1009 AS e1, (3*doc_id+1) % 1009 AS e2,
         ((3*doc_id) % 1009) % 8 AS k
  FROM documents
), e1set AS (
  SELECT DISTINCT e1 FROM d
), labeled_class AS (
  SELECT DISTINCT k FROM d WHERE doc_id % 20 = 0
), subclass_c AS (
  SELECT DISTINCT doc_id % 11 AS c FROM documents WHERE doc_id % 11 <= 6
), classes AS (
  SELECT DISTINCT k FROM (
    SELECT k FROM d
    UNION ALL SELECT c FROM subclass_c
    UNION ALL SELECT c + 1 FROM subclass_c
    UNION ALL SELECT 0
  )
), ctitle AS (
  SELECT k, CASE WHEN k IN (SELECT k FROM labeled_class)
                 THEN 'Klass ' || k ELSE 'Class_' || k END AS t
  FROM classes
), facts AS (
  -- entity pages (hub e1=0 excluded on both sides)
  SELECT 'Ent ' || e1 || ' Label' AS title, 'Label' AS property,
         'Ent ' || e1 || ' Label' AS value FROM d WHERE e1 <> 0
  UNION ALL
  SELECT 'Ent ' || e1 || ' Label', 'Works_with',
         CASE WHEN e2 IN (SELECT e1 FROM e1set)
              THEN 'Ent ' || e2 || ' Label' ELSE 'Entity_' || e2 END
  FROM d WHERE e1 <> 0 AND e2 <> 0
  UNION ALL
  SELECT 'Ent ' || e1 || ' Label', 'Has_size', CAST(doc_id % 100 AS VARCHAR)
  FROM d WHERE e1 <> 0
  UNION ALL
  SELECT 'Ent ' || e1 || ' Label', 'Equivalent URI',
         '{_ENT}' || e1 FROM d WHERE e1 <> 0
  UNION ALL
  SELECT 'Ent ' || e1 || ' Label', 'Category',
         (SELECT t FROM ctitle WHERE ctitle.k = d.k) FROM d WHERE e1 <> 0
  -- class pages
  UNION ALL
  SELECT 'Category:' || t, 'Label', 'Klass ' || k FROM ctitle
  WHERE k IN (SELECT k FROM labeled_class)
  UNION ALL
  SELECT 'Category:' || t, 'Equivalent URI', '{_CLS}' || k FROM ctitle
  UNION ALL
  SELECT 'Category:' || t, 'Category', 'Class' FROM ctitle
  UNION ALL
  SELECT 'Category:' || c1.t, 'Category', c2.t
  FROM subclass_c
  JOIN ctitle c1 ON c1.k = subclass_c.c
  JOIN ctitle c2 ON c2.k = subclass_c.c + 1
)
SELECT DISTINCT title, property, value FROM facts
ORDER BY title, property, value
"""


def kg_incremental(sf_dir: str):
    """Incremental KG update under the SAME arithmetic oracle as
    ``kg_page_facts``: build the KG from the even-doc_id half of the
    corpus, apply the odd half as a delta via
    ``pipelines/incremental.py`` (sidecar-diff invalidation → refold
    only affected subjects), upsert the delta output over the base
    page store, and explode to (title, property, value) fact rows —
    which must equal a FULL-corpus build exactly. The even/odd split
    guarantees cross-page invalidation: base doc d references entity
    e2=(3d+1)%1009, which delta doc d+673 (odd when d is even) labels,
    so the delta retitles entities base pages already render.

    The pandas upsert/explode here is the verification harness, not
    the operator — `incremental_update` itself streams, and a
    production upsert is a partitioned-parquet overwrite keyed by
    subj. Hub exclusions identical to kg_page_facts (blake2b
    first-wins between the hub's two labels is not SQL-expressible)."""
    import pyarrow.compute as pc

    from rdf2smw_ray.pipelines.incremental import incremental_update
    from rdf2smw_ray.schemas import URITYPE_PREDICATE
    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import extract_triples
    from rdf2smw_ray.stages.fold import fold_pages
    from rdf2smw_ray.stages.resolve import resolve_triples
    from rdf2smw_ray.stages.sidecar import build_sidecar

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def half(parity: int):
        part = docs.map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)
            ),
            batch_format="pyarrow",
        )
        return extract_triples(extract_text(synth_web_pages(part))).materialize()

    base_tr, delta_tr = half(0), half(1)
    prev_sidecar = build_sidecar(base_tr)

    # the base run's content-page store (what a prior full run persisted)
    base_pages = (
        fold_pages(resolve_triples(base_tr, prev_sidecar, concurrency=2))
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["page_type"], URITYPE_PREDICATE)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )

    inc = incremental_update(base_tr, delta_tr, prev_sidecar, resolver_concurrency=2)
    upd = inc["content"].to_pandas()

    cols = ["subj", "title", "facts", "categories"]
    store = {r.subj: r for r in base_pages[cols].itertuples()}
    store.update({r.subj: r for r in upd[cols].itertuples()})

    hub_subj = _ENT + "0"
    hub_titles = {"The Hub", "Ent 0 Label", "Entity_0"}
    t, p, v = [], [], []
    for r in store.values():
        if r.subj == hub_subj:
            continue
        for f in r.facts:
            if f["property"] == "Refers_to" or (
                f["property"] == "Works_with" and f["value"] in hub_titles
            ):
                continue
            t.append(r.title)
            p.append(f["property"])
            v.append(f["value"])
        for c in r.categories:
            t.append(r.title)
            p.append("Category")
            v.append(c)
    rows = pd.DataFrame({"title": t, "property": p, "value": v}).drop_duplicates()
    return rows.sort_values(["title", "property", "value"]).reset_index(drop=True)


def kg_category_filter(sf_dir: str):
    """CategoryFilterer under a value-checked oracle: keep pages whose
    categories intersect the allowlist {title(Class_0), title(Class_1)}
    — the allowlist itself is resolved from the folded class pages
    (2 rows, bounded by allowlist size), never hardcoded. The hub page
    is excluded on both sides (its title is first-wins ambiguous, see
    kg_page_facts)."""
    from rdf2smw_ray.pipelines.kg import flagship
    from rdf2smw_ray.stages.catfilter import filter_pages_by_categories

    out = flagship(sf_dir, concurrency=2)
    pages = out["pages"]

    def class_titles(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        m = df["subj"].isin([_CLS + "0", _CLS + "1"])
        t = df.loc[m, "title"].str.replace("Category:", "", n=1, regex=False)
        return pa.table({"t": pa.array(t.to_numpy(), pa.string())})

    allow = sorted(
        pages.map_batches(class_titles, batch_format="pyarrow").to_pandas()["t"]
    )
    kept = filter_pages_by_categories(pages, allow)

    def titles(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["subj"] != _ENT + "0"]
        return pa.table({"title": pa.array(df["title"].to_numpy(), pa.string())})

    res = kept.map_batches(titles, batch_format="pyarrow").to_pandas()
    return res.sort_values("title").reset_index(drop=True)


# derives the same kept-title set: pages whose Category list contains
# title(Class_0) or title(Class_1) — entity pages with k∈{0,1} plus the
# class pages whose super-class is 0 or 1 (subclass edge c→c+1 ⇒
# Class_0 only from... no c+1=0; Class_1 from c=0)
KG_CATEGORY_FILTER_SQL = """
WITH d AS (
  SELECT doc_id, (3*doc_id) % 1009 AS e1, ((3*doc_id) % 1009) % 8 AS k
  FROM documents
), labeled_class AS (
  SELECT DISTINCT k FROM d WHERE doc_id % 20 = 0
), subclass_c AS (
  SELECT DISTINCT doc_id % 11 AS c FROM documents WHERE doc_id % 11 <= 6
), classes AS (
  SELECT DISTINCT k FROM (
    SELECT k FROM d
    UNION ALL SELECT c FROM subclass_c
    UNION ALL SELECT c + 1 FROM subclass_c
    UNION ALL SELECT 0
  )
), ctitle AS (
  SELECT k, CASE WHEN k IN (SELECT k FROM labeled_class)
                 THEN 'Klass ' || k ELSE 'Class_' || k END AS t
  FROM classes
)
SELECT title FROM (
  -- entity pages categorized into Class_0 / Class_1
  SELECT 'Ent ' || e1 || ' Label' AS title FROM d WHERE k IN (0, 1) AND e1 <> 0
  UNION
  -- class pages whose super-class (c+1) is 0 or 1: only c=0 → Class_0's page
  SELECT 'Category:' || c1.t FROM subclass_c
  JOIN ctitle c1 ON c1.k = subclass_c.c
  WHERE subclass_c.c + 1 IN (0, 1)
) ORDER BY title
"""


def kg_pagerank(sf_dir: str):
    """Iterative graph analytics on the extracted KG: 3 PageRank power
    iterations over the distinct works_with edge set, every step a
    Dataset op — value-checked against an unrolled-iteration SQL
    oracle."""
    import pyarrow.compute as pc

    from rdf2smw_ray.pipelines.graph import pagerank
    from rdf2smw_ray.sources.webpages import synth_web_pages
    from rdf2smw_ray.stages.extract_text import extract_text
    from rdf2smw_ray.stages.extract_triples import PROP_NS, extract_triples

    docs = _docs(sf_dir, columns=["doc_id", "text", "lang"])
    triples = extract_triples(
        extract_text(synth_web_pages(docs), concurrency=2), concurrency=2
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["pred"], PROP_NS + "works_with"))
        subj = pd.Series(t["subj"].to_pylist(), dtype=object).str.rsplit("/", n=1).str[-1]
        obj = pd.Series(t["obj"].to_pylist(), dtype=object).str.rsplit("/", n=1).str[-1]
        return pa.table(
            {
                "src": pa.array(subj.to_numpy(), pa.string()),
                "dst": pa.array(obj.to_numpy(), pa.string()),
            }
        )

    pr = pagerank(triples.map_batches(to_edges, batch_format="pyarrow"), iters=3)
    out = pr.to_pandas().rename(columns={"node": "entity"})
    out["pr"] = out["pr"].round(6)
    return out.sort_values("entity").reset_index(drop=True)


KG_PAGERANK_SQL = """
WITH dd AS (
  SELECT DISTINCT (3*doc_id) % 1009 AS s, (3*doc_id+1) % 1009 AS t FROM documents
), nodes AS (
  SELECT DISTINCT n FROM (SELECT s AS n FROM dd UNION SELECT t FROM dd)
), nn AS (SELECT COUNT(*)::DOUBLE AS n FROM nodes),
deg AS (SELECT s, COUNT(*)::DOUBLE AS outdeg FROM dd GROUP BY s),
p0 AS (SELECT n AS node, 1.0/(SELECT n FROM nn) AS pr FROM nodes),
p1 AS (
  SELECT nodes.n AS node,
         0.15/(SELECT n FROM nn) + 0.85*COALESCE(SUM(p.pr/deg.outdeg), 0) AS pr
  FROM nodes LEFT JOIN dd ON dd.t = nodes.n
  LEFT JOIN p0 p ON p.node = dd.s
  LEFT JOIN deg ON deg.s = dd.s
  GROUP BY nodes.n
), p2 AS (
  SELECT nodes.n AS node,
         0.15/(SELECT n FROM nn) + 0.85*COALESCE(SUM(p.pr/deg.outdeg), 0) AS pr
  FROM nodes LEFT JOIN dd ON dd.t = nodes.n
  LEFT JOIN p1 p ON p.node = dd.s
  LEFT JOIN deg ON deg.s = dd.s
  GROUP BY nodes.n
), p3 AS (
  SELECT nodes.n AS node,
         0.15/(SELECT n FROM nn) + 0.85*COALESCE(SUM(p.pr/deg.outdeg), 0) AS pr
  FROM nodes LEFT JOIN dd ON dd.t = nodes.n
  LEFT JOIN p2 p ON p.node = dd.s
  LEFT JOIN deg ON deg.s = dd.s
  GROUP BY nodes.n
)
SELECT 'Entity_' || node AS entity, ROUND(pr, 6) AS pr FROM p3 ORDER BY entity
"""


def kg_pages(sf_dir: str):
    """Full flagship pipeline, scalar page columns (title, page_type,
    specific_category, subj) under a doc_id-arithmetic oracle —
    r4 VERDICT item #3, converting the last rows-only kg_* row to
    hash-checked. Nested fact lists and rendering stay pytest-covered
    (byte-parity in test_rdf2smw_pipeline.py).

    Exclusion (same as kg_page_facts, documented there): the hub
    entity carries two distinct labels whose first-wins resolution
    follows blake2b-seq order — not SQL-expressible — so its page row
    is excluded on both sides. Every other title, page_type,
    specific-category and subject is value-compared exactly."""
    from rdf2smw_ray.pipelines.kg import flagship

    hub_subj = _ENT + "0"
    out = flagship(sf_dir, concurrency=2)
    content = out["content"].to_pandas()
    props = out["properties"].to_pandas()
    cols = ["title", "page_type", "specific_category", "subj"]
    res = pd.concat([content[cols], props[cols]])
    res = res[res["subj"] != hub_subj]
    res["page_type"] = res["page_type"].astype("int64")
    return res.sort_values("title").reset_index(drop=True)


KG_PAGES_SQL = f"""
WITH d AS (
  SELECT doc_id, (3*doc_id) % 1009 AS e1, (3*doc_id+1) % 1009 AS e2,
         ((3*doc_id) % 1009) % 8 AS k, doc_id % 11 AS c
  FROM documents
), labeled_class AS (
  SELECT DISTINCT k FROM d WHERE doc_id % 20 = 0
), subclass_c AS (
  SELECT DISTINCT c FROM d WHERE c <= 6
), classes AS (
  SELECT DISTINCT x FROM (
    SELECT k AS x FROM d
    UNION ALL SELECT c FROM subclass_c
    UNION ALL SELECT c + 1 FROM subclass_c
    UNION ALL SELECT 0 FROM d WHERE doc_id % 50 = 0
  )
), ctitle AS (
  SELECT x AS k, CASE WHEN x IN (SELECT k FROM labeled_class)
                      THEN 'Klass ' || x ELSE 'Class_' || x END AS t
  FROM classes
), ents AS (
  SELECT DISTINCT e1, k FROM d WHERE e1 <> 0
), pages AS (
  -- entity pages (hub excluded on both sides)
  SELECT 'Ent ' || e1 || ' Label' AS title, 1 AS page_type,
         (SELECT t FROM ctitle WHERE ctitle.k = ents.k) AS specific_category,
         '{_ENT}' || e1 AS subj
  FROM ents
  UNION ALL
  -- class pages: specific category = parent class title when a
  -- subclass edge exists (the bare 'Class' category is never specific)
  SELECT 'Category:' || ct.t, 3,
         CASE WHEN ct.k IN (SELECT c FROM subclass_c)
              THEN (SELECT t FROM ctitle p WHERE p.k = ct.k + 1)
              ELSE '' END,
         '{_CLS}' || ct.k
  FROM ctitle ct
  UNION ALL
  -- property pages: one per predicate local name seen in the corpus
  SELECT 'Property:' || p, 2, '', '' FROM (
    SELECT unnest(['Label', 'Type', 'Works_with', 'Has_size', 'Refers_to']) AS p
    WHERE EXISTS (SELECT 1 FROM d)
    UNION ALL
    SELECT 'SubClassOf' WHERE EXISTS (SELECT 1 FROM subclass_c)
  )
)
SELECT title, CAST(page_type AS BIGINT) AS page_type, specific_category, subj
FROM pages ORDER BY title
"""


# ---------------------------------------------------------------------------
# Text-analysis queries
# ---------------------------------------------------------------------------
def q_token_stats(sf_dir: str):
    out = token_stats(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


TOKEN_STATS_SQL = r"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
FROM documents ORDER BY doc_id
"""


def q_robust_extract(sf_dir: str):
    """END-TO-END oracle for the REAL-HTML extractor
    (stages/html_text.py — the tolerant html.parser engine, NOT the
    byte-exact regex inverse): synthesize each doc's web-page envelope
    (nav/script/style/footer noise + escaped text inside <main>), run
    robust extraction, count the extracted lines. The DuckDB oracle
    recomputes the expected count from pure doc_id arithmetic (the
    generator's grammar-sentence formula) plus the document's own
    non-empty line count, so any tokenizer slip — content dropped,
    boilerplate kept, an entity mis-decoded, a blank line surviving —
    breaks the hash."""
    from rdf2smw_ray.sources.webpages import synth_batch
    from rdf2smw_ray.stages.html_text import robust_extract_text

    def extract_counts(batch: pa.Table) -> pa.Table:
        pages = synth_batch(batch)
        counts = [
            (rt.count("\n") + 1 if rt else 0)
            for rt in (
                robust_extract_text(h) for h in pages["html"].to_pylist()
            )
        ]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_lines": pa.array(counts, pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, columns=["doc_id", "text", "lang"])
        .map_batches(extract_counts, batch_format="pyarrow", batch_size=256)
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# grammar-line formula mirrors sources/webpages.py::grammar_sentences;
# trim set mirrors html_text._normalize's horizontal-whitespace class
ROBUST_EXTRACT_SQL = """
SELECT doc_id,
  (5 + CASE WHEN doc_id % 11 < 7 THEN 1 ELSE 0 END
     + CASE WHEN doc_id % 20 = 0 THEN 1 ELSE 0 END
     + CASE WHEN doc_id % 50 = 0 THEN 2 ELSE 0 END
     + length(list_filter(string_split(text, chr(10)),
         x -> trim(x, ' ' || chr(9) || chr(13) || chr(12) || chr(11)) <> ''))
  ) AS n_lines
FROM documents ORDER BY doc_id
"""


def q_bpe_token_stats(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import bpe_token_stats

    out = bpe_token_stats(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# same regex, escaped for SQL string context ('' for ')
BPE_SQL_PATTERN = r"''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"
BPE_TOKEN_STATS_SQL = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '{BPE_SQL_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def q_quality(sf_dir: str):
    out = quality_score(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_STOP_SQL = r"\b(" + "|".join(STOPWORDS) + r")\b"
QUALITY_SQL = f"""
SELECT doc_id,
       CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       ROUND((length(text) - length(regexp_extract_all(text, '\\s')))
             / GREATEST(length(regexp_extract_all(text, '\\S+')), 1)::DOUBLE, 6) AS avg_token_len,
       ROUND(length(regexp_extract_all(text, '{_STOP_SQL}'))
             / GREATEST(length(regexp_extract_all(text, '\\S+')), 1)::DOUBLE, 6) AS stop_ratio,
       ROUND(length(regexp_extract_all(text, '[.!?,;:]'))
             / GREATEST(length(text), 1)::DOUBLE, 6) AS punct_ratio
FROM documents ORDER BY doc_id
"""


def q_normalize_text(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import normalize_text

    out = normalize_text(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


NORMALIZE_SQL = r"""
SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text
FROM documents ORDER BY doc_id
"""


def q_stratified_sample(sf_dir: str):
    """Fixed-k deterministic sample per source stratum (k smallest
    md5(doc_id) per source) — the reservoir-per-group shape."""
    from rdf2smw_ray.pipelines.textstats import stratified_sample_k

    out = stratified_sample_k(
        _docs(sf_dir, columns=["doc_id", "source"]), k=5
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


STRATIFIED_SAMPLE_SQL = """
SELECT source, doc_id FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 5 ORDER BY source, doc_id
"""


def q_label_centroid_norm(sf_dir: str):
    """Per-label embedding centroid L2 norm — the vector-column
    aggregate (per-(label, dim) partial sums, norm on the centroid
    table)."""
    from rdf2smw_ray.pipelines.ann import label_centroid_norm

    return label_centroid_norm(_emb(sf_dir))


def q_token_chunks(sf_dir: str):
    """Fixed-window token chunking (context packing front half)."""
    from rdf2smw_ray.pipelines.packing import token_chunks

    out = token_chunks(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


def q_sequence_packing(sf_dir: str):
    """Linear sequence packing by cumulative token count — the
    distributed prefix scan."""
    from rdf2smw_ray.pipelines.packing import sequence_packing

    out = sequence_packing(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    out = out.astype({"doc_id": "int64", "seq_id": "int64"})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_sample_docs(sf_dir: str):
    """Deterministic ~20% sample (md5 hash gate on doc_id) — identical
    row set at any parallelism and in the SQL oracle."""
    from rdf2smw_ray.pipelines.textstats import deterministic_sample

    out = deterministic_sample(
        _docs(sf_dir, columns=["doc_id", "source"])
    ).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "source": pd.Series([], dtype=object)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


# fixed-width lowercase hex compares lexicographically == numerically
SAMPLE_DOCS_SQL = """
SELECT doc_id, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '33'
ORDER BY doc_id
"""


def q_pmi_top_bigrams(sf_dir: str):
    """Collocation mining: top-20 bigrams by PMI (min_count=5); both
    engines rank on ROUND(pmi,6) with bigram tie-break."""
    from rdf2smw_ray.pipelines.textstats import pmi_top_bigrams

    return pmi_top_bigrams(_docs(sf_dir, columns=["doc_id", "text"]), k=20, min_count=5)


PMI_TOP_BIGRAMS_SQL = r"""
WITH t AS (SELECT string_split_regex(text, '\s+') AS w FROM documents),
uni AS (SELECT unnest(w) AS token FROM t),
uc AS (SELECT token, COUNT(*) AS c FROM uni GROUP BY 1),
nu AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM uc),
bg AS (
  SELECT unnest([w[i] FOR i IN generate_series(1, len(w) - 1)]) AS a,
         unnest([w[i + 1] FOR i IN generate_series(1, len(w) - 1)]) AS b
  FROM t WHERE len(w) >= 2
),
bc AS (SELECT a, b, COUNT(*) AS cab FROM bg GROUP BY 1, 2),
nb AS (SELECT CAST(SUM(cab) AS DOUBLE) AS n FROM bc)
SELECT a || ' ' || b AS bigram,
       CAST(cab AS BIGINT) AS n,
       ROUND(ln((cab / (SELECT n FROM nb))
                / ((ua.c / (SELECT n FROM nu)) * (ub.c / (SELECT n FROM nu)))), 6) AS pmi
FROM bc JOIN uc ua ON ua.token = a JOIN uc ub ON ub.token = b
WHERE cab >= 5
ORDER BY pmi DESC, bigram LIMIT 20
"""


def q_token_count_histogram(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import token_count_histogram

    out = token_count_histogram(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    out["c"] = out["c"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values("c").reset_index(drop=True)


TOKEN_COUNT_HISTOGRAM_SQL = r"""
WITH tok AS (
  SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents
),
f AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1)
SELECT c, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM f GROUP BY c ORDER BY c
"""


def q_mixture_sample(sf_dir: str):
    """Source mixing: per-source deterministic downsample rates (the
    pretraining blend step) — 50% of src0-4, 20% of src5-9, 5% of the
    rest, all via the shared md5 gate."""
    from rdf2smw_ray.pipelines.textstats import mixture_sample

    rates = {f"src{i}": "80" for i in range(5)}
    rates.update({f"src{i}": "33" for i in range(5, 10)})
    out = mixture_sample(
        _docs(sf_dir, columns=["doc_id", "source"]), rates, default_hex="0d"
    ).to_pandas()
    if "doc_id" not in out.columns:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "source": pd.Series([], dtype=object)}
        )
    return out.sort_values("doc_id").reset_index(drop=True)


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN '80'
       WHEN source IN ('src5','src6','src7','src8','src9') THEN '33'
       ELSE '0d' END
ORDER BY doc_id
"""


def q_top_bigrams(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import top_bigrams

    return top_bigrams(_docs(sf_dir, columns=["doc_id", "text"]), k=20)


TOP_BIGRAMS_SQL = r"""
WITH t AS (SELECT string_split_regex(text, '\s+') AS w FROM documents)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w)-1)]) AS bigram
  FROM t WHERE len(w) >= 2
) GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
"""


def q_top_tokens_per_lang(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import top_tokens_per_lang

    return top_tokens_per_lang(_docs(sf_dir, columns=["lang", "text"]), k=3)


def q_token_doc_freq(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import token_doc_freq

    return token_doc_freq(_docs(sf_dir, columns=["doc_id", "text"]), k=50)


TOKEN_DOC_FREQ_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents)
SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM (
  SELECT doc_id, unnest(list_distinct(w)) AS token FROM t
) GROUP BY token ORDER BY df DESC, token LIMIT 50
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF terms: tf in-batch, df via combiner +
    groupby, tf⋈df on a bucketed token co-shuffle, per-doc top-k as
    combiner + coarse-bucketed final. N from parquet metadata (no
    extra Ray pass)."""
    from rdf2smw_ray.pipelines.textstats import tfidf_top_terms

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return tfidf_top_terms(_docs(sf_dir, columns=["doc_id", "text"]), n_docs, k=3)


TFIDF_TOP_TERMS_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(w) AS token FROM t) WHERE token <> ''
  GROUP BY 1, 2
),
df AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(list_distinct(w)) AS token FROM t)
  WHERE token <> '' GROUP BY 1
),
s AS (
  SELECT tf.doc_id, tf.token,
         ROUND(tf.tf * ln((SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) / df.df), 6) AS score
  FROM tf JOIN df USING (token)
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rn
  FROM s
)
SELECT doc_id, token, score FROM r WHERE rn <= 3 ORDER BY doc_id, token
"""


def q_repetition_stats(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import repetition_stats

    out = repetition_stats(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


REPETITION_STATS_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id, MAX(c) AS maxc, SUM(c) AS n, COUNT(*) AS nuniq FROM tc GROUP BY 1
),
g AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w)-1)]) AS gram
  FROM t WHERE len(w) >= 2
),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
gagg AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot
  FROM gc GROUP BY 1
)
SELECT a.doc_id,
       ROUND(maxc / CAST(n AS DOUBLE), 6) AS top_token_frac,
       ROUND(COALESCE(dup / CAST(tot AS DOUBLE), 0), 6) AS dup_2gram_frac,
       ROUND(nuniq / CAST(n AS DOUBLE), 6) AS unique_token_ratio
FROM agg a LEFT JOIN gagg USING (doc_id) ORDER BY doc_id
"""


def q_decontaminate_dist(sf_dir: str):
    """The no-broadcast decontamination path (bench grams semi-joined,
    never driver-collected) under the SAME oracle as the broadcast
    path — one SQL statement validates both engines' engine paths."""
    from rdf2smw_ray.pipelines.decontam import decontaminate_distributed

    out = decontaminate_distributed(
        _docs(sf_dir, columns=["doc_id", "text", "source"]),
        bench_source="src0",
        n=5,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_quality_filter(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import quality_filter

    out = quality_filter(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# same raw counters as REPETITION_STATS_SQL, but thresholds compare the
# UNROUNDED double ratios (identical IEEE division on both engines) and
# the output carries no floats — only the ordered first-fail decision.
QUALITY_FILTER_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id, MAX(c) AS maxc, SUM(c) AS n, COUNT(*) AS nuniq FROM tc GROUP BY 1
),
g AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w)-1)]) AS gram
  FROM t WHERE len(w) >= 2
),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY 1, 2),
gagg AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot
  FROM gc GROUP BY 1
),
r AS (
  SELECT a.doc_id, CASE
    WHEN n < 24 THEN 'too_short'
    WHEN maxc / CAST(n AS DOUBLE) > 0.125 THEN 'repetitive_token'
    WHEN COALESCE(dup, 0) > 0 AND dup / CAST(tot AS DOUBLE) > 0.12 THEN 'repetitive_2gram'
    WHEN nuniq / CAST(n AS DOUBLE) < 0.35 THEN 'low_diversity'
    ELSE '' END AS reject_reason
  FROM agg a LEFT JOIN gagg USING (doc_id)
)
SELECT doc_id, reject_reason = '' AS keep, reject_reason FROM r ORDER BY doc_id
"""


def q_unigram_logprob(sf_dir: str):
    from rdf2smw_ray.pipelines.textstats import unigram_logprob

    out = unigram_logprob(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    out = out.dropna(subset=["avg_logprob"])
    return out.sort_values("doc_id").reset_index(drop=True)


UNIGRAM_LOGPROB_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM freq)
SELECT doc_id, ROUND(AVG(ln(c / (SELECT n FROM tot))), 6) AS avg_logprob
FROM tok JOIN freq USING (token) GROUP BY doc_id ORDER BY doc_id
"""


def q_line_dedup(sf_dir: str):
    """Global first-wins line dedup over the synthetic page texts
    (grammar sentences repeat across docs — e.g. every doc 1009 apart
    shares its entity sentences, every 11th its subclass line — so the
    kept/dropped split is non-trivial). The oracle rebuilds the exact
    line list per doc from doc_id arithmetic and replays first-wins
    (min doc_id, then min position) over the same md5 keys."""
    from rdf2smw_ray.pipelines.linededup import line_dedup_counts
    from rdf2smw_ray.sources.webpages import page_texts

    out = line_dedup_counts(
        page_texts(_docs(sf_dir, columns=["doc_id", "text"]))
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# line formulas mirror sources/webpages.py::grammar_sentences
LINE_DEDUP_SQL = r"""
WITH base AS (
  SELECT doc_id,
    ['Entity_' || e1 || ' is known as "Ent ' || e1 || ' Label".',
     'Entity_' || e1 || ' is a Class_' || k || '.',
     'Entity_' || e1 || ' works with Entity_' || e2 || '.',
     'Entity_' || e1 || ' has size ' || (doc_id % 100) || '.',
     'Entity_' || e1 || ' refers to Entity_0.']
    || CASE WHEN doc_id % 11 < 7
         THEN ['Class_' || (doc_id % 11) || ' is a subtype of Class_' || (doc_id % 11 + 1) || '.']
         ELSE [] END
    || CASE WHEN doc_id % 20 = 0
         THEN ['Class_' || k || ' is known as "Klass ' || k || '".'] ELSE [] END
    || CASE WHEN doc_id % 50 = 0
         THEN ['Entity_0 is known as "The Hub".', 'Entity_0 is a Class_0.'] ELSE [] END
    || CASE WHEN text <> '' THEN [text] ELSE [] END
    AS lines
  FROM (SELECT doc_id, (3 * doc_id) % 1009 AS e1, (3 * doc_id + 1) % 1009 AS e2,
               ((3 * doc_id) % 1009) % 8 AS k, text
        FROM documents)
),
pos AS (
  SELECT doc_id, unnest(lines) AS line,
         unnest(generate_series(1, len(lines))) AS ln
  FROM base
),
win AS (
  SELECT md5(line) AS key, MIN(doc_id * 1048576 + ln) AS r
  FROM pos GROUP BY 1
),
kept AS (
  SELECT r // 1048576 AS doc_id, COUNT(*) AS n_kept FROM win GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(lines) - COALESCE(n_kept, 0) AS BIGINT) AS n_dropped
FROM base b LEFT JOIN kept k ON b.doc_id = k.doc_id
ORDER BY b.doc_id
"""


def q_bm25_topk(sf_dir: str):
    """Lexical retrieval: BM25 top-10 for a fixed 3-term query. Both
    engines rank on ROUND(score, 6) with doc_id tie-break, so the row
    SET is deterministic across numpy/DuckDB float noise."""
    from rdf2smw_ray.pipelines.search import bm25_topk

    return bm25_topk(
        _docs(sf_dir, columns=["doc_id", "text"]),
        ["data", "spark", "window"],
        k=10,
    )


BM25_TOPK_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         SUM(len(w)) / CAST(COUNT(*) AS DOUBLE) AS avgdl
  FROM t
),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
q AS (SELECT unnest(['data', 'spark', 'window']) AS term),
tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS c
  FROM tok JOIN q ON token = term GROUP BY 1, 2
),
df AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS d FROM tf GROUP BY 1),
dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM t),
sc AS (
  SELECT tf.doc_id,
         ROUND(SUM(ln((n_docs - d + 0.5) / (d + 0.5) + 1.0)
                   * (c * 2.2) / (c + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
  FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 10
"""


def q_props_k_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer field k out of the
    events.props JSON string (one vectorized C-regex per batch — no
    per-row json.loads) and roll it up per event_type. The oracle
    extracts with the same RE2-compatible pattern."""
    from ray.data.aggregate import Max, Min, Sum

    from rdf2smw_ray.pipelines.io_cache import cached_table

    events = cached_table(sf_dir, "events", ["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        k = (
            df["props"]
            .astype(str)
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        ok = k.notna()
        g = (
            pd.DataFrame({"event_type": df["event_type"][ok], "k": k[ok].astype("int64")})
            .groupby("event_type", sort=False)["k"]
            .agg(n="size", s="sum", mn="min", mx="max")
        )
        return pa.table(
            {
                "event_type": pa.array(g.index.to_numpy(), pa.string()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), pa.int64()),
                "s": pa.array(g["s"].to_numpy().astype(np.int64), pa.int64()),
                "mn": pa.array(g["mn"].to_numpy().astype(np.int64), pa.int64()),
                "mx": pa.array(g["mx"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    out = (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="s"),
            Min("mn", alias_name="mn"),
            Max("mx", alias_name="mx"),
        )
        .to_pandas()
    )
    out["avg_k"] = (out["s"] / out["n"]).round(6)
    for c in ("n", "mn", "mx"):
        out[c] = out[c].astype("int64")
    return (
        out[["event_type", "n", "avg_k", "mn", "mx"]]
        .rename(columns={"mn": "min_k", "mx": "max_k"})
        .sort_values("event_type")
        .reset_index(drop=True)
    )


PROPS_K_STATS_SQL = r"""
WITH x AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k
  FROM events
  WHERE regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(k) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM x GROUP BY event_type ORDER BY event_type
"""


def q_domain_stats(sf_dir: str):
    """Per-domain rollup over the synthetic crawl: the Ray side REALLY
    parses host/path out of the url strings; the oracle rebuilds both
    from the generator arithmetic (url = https://ex{d%10}.org/page/{d},
    warc_ts = epoch + d minutes)."""
    from rdf2smw_ray.pipelines.weburl import domain_stats
    from rdf2smw_ray.sources.webpages import synth_web_pages

    out = domain_stats(
        synth_web_pages(_docs(sf_dir, columns=["doc_id", "text", "lang"]))
    ).to_pandas()
    return out.sort_values("domain").reset_index(drop=True)


DOMAIN_STATS_SQL = """
WITH p AS (
  SELECT 'ex' || (doc_id % 10) || '.org' AS domain,
         '/page/' || doc_id AS path,
         1600000000000000 + doc_id * 60000000 AS ts
  FROM documents
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
       MIN(ts) AS first_ts_us,
       MAX(ts) AS last_ts_us
FROM p GROUP BY domain ORDER BY domain
"""


def q_curated_corpus(sf_dir: str):
    """Composed hygiene pass: quality filter → semi-join kept docs →
    page-text line dedup AMONG KEPT DOCS ONLY. The winners differ from
    the standalone line_dedup query (rejected docs no longer claim
    first occurrence), so this value-checks the stage interaction, not
    just each stage."""
    from rdf2smw_ray.pipelines.curation import curated_line_counts

    out = curated_line_counts(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


CURATED_CORPUS_SQL = r"""
WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents),
tok AS (SELECT doc_id, unnest(w) AS token FROM t),
tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
agg AS (
  SELECT doc_id, MAX(c) AS maxc, SUM(c) AS n, COUNT(*) AS nuniq FROM tc GROUP BY 1
),
g2 AS (
  SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN generate_series(1, len(w)-1)]) AS gram
  FROM t WHERE len(w) >= 2
),
gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
gagg AS (
  SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot
  FROM gc GROUP BY 1
),
kept AS (
  SELECT a.doc_id FROM agg a LEFT JOIN gagg USING (doc_id)
  WHERE n >= 24 AND maxc / CAST(n AS DOUBLE) <= 0.125
    AND NOT (COALESCE(dup, 0) > 0 AND dup / CAST(tot AS DOUBLE) > 0.12)
    AND nuniq / CAST(n AS DOUBLE) >= 0.35
),
base AS (
  SELECT doc_id,
    ['Entity_' || e1 || ' is known as "Ent ' || e1 || ' Label".',
     'Entity_' || e1 || ' is a Class_' || k || '.',
     'Entity_' || e1 || ' works with Entity_' || e2 || '.',
     'Entity_' || e1 || ' has size ' || (doc_id % 100) || '.',
     'Entity_' || e1 || ' refers to Entity_0.']
    || CASE WHEN doc_id % 11 < 7
         THEN ['Class_' || (doc_id % 11) || ' is a subtype of Class_' || (doc_id % 11 + 1) || '.']
         ELSE [] END
    || CASE WHEN doc_id % 20 = 0
         THEN ['Class_' || k || ' is known as "Klass ' || k || '".'] ELSE [] END
    || CASE WHEN doc_id % 50 = 0
         THEN ['Entity_0 is known as "The Hub".', 'Entity_0 is a Class_0.'] ELSE [] END
    || CASE WHEN text <> '' THEN [text] ELSE [] END
    AS lines
  FROM (SELECT d.doc_id, (3 * d.doc_id) % 1009 AS e1, (3 * d.doc_id + 1) % 1009 AS e2,
               ((3 * d.doc_id) % 1009) % 8 AS k, text
        FROM documents d JOIN kept USING (doc_id))
),
pos AS (
  SELECT doc_id, unnest(lines) AS line,
         unnest(generate_series(1, len(lines))) AS ln
  FROM base
),
win AS (
  SELECT md5(line) AS key, MIN(doc_id * 1048576 + ln) AS r
  FROM pos GROUP BY 1
),
keptl AS (
  SELECT r // 1048576 AS doc_id, COUNT(*) AS n_kept FROM win GROUP BY 1
)
SELECT b.doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept,
       CAST(len(lines) - COALESCE(n_kept, 0) AS BIGINT) AS n_dropped
FROM base b LEFT JOIN keptl k ON b.doc_id = k.doc_id
ORDER BY b.doc_id
"""


def q_pii_redact(sf_dir: str):
    """PII scrub over documents with synthetic PII injected by pure
    doc_id arithmetic (the corpus itself is PII-free word salad): every
    3rd doc gains an email, every 4th a phone, every 5th an IPv4 —
    mirrored exactly in the SQL oracle, so any counting or redaction
    slip breaks the hash. The operator itself (pipelines/pii.py) is
    injection-agnostic."""
    from rdf2smw_ray.pipelines.pii import pii_redact

    def inject(batch: pa.Table) -> pa.Table:
        d = pd.Series(batch["doc_id"].to_numpy(zero_copy_only=False))
        t = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        email = " contact user" + d.astype(str) + "@ex" + (d % 7).astype(str) + ".com now"
        phone = (
            " call 555-"
            + (d % 1000).astype(str).str.zfill(3)
            + "-"
            + (d % 10000).astype(str).str.zfill(4)
        )
        ip = (
            " from 10."
            + (d % 200).astype(str)
            + "."
            + (d % 250).astype(str)
            + "."
            + (d % 100).astype(str)
            + " up"
        )
        t = (
            t
            + email.where(d % 3 == 0, "")
            + phone.where(d % 4 == 0, "")
            + ip.where(d % 5 == 0, "")
        )
        return pa.table(
            {
                "doc_id": pa.array(d.to_numpy(), pa.int64()),
                "text": pa.array(t.to_numpy(), pa.string()),
            }
        )

    out = (
        pii_redact(
            _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
                inject, batch_format="pyarrow"
            )
        )
        .drop_columns(["text"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_REDACT_SQL = f"""
WITH aug AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@ex' || (doc_id % 7) || '.com now' ELSE '' END
    || CASE WHEN doc_id % 4 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 200) || '.' || (doc_id % 250) || '.' || (doc_id % 100) || ' up' ELSE '' END
    AS t
  FROM documents
)
SELECT doc_id,
  CAST(length(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
  CAST(length(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
  CAST(length(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS n_ipv4,
  regexp_replace(regexp_replace(regexp_replace(t,
      '{_PII_EMAIL}', '[EMAIL]', 'g'),
      '{_PII_PHONE}', '[PHONE]', 'g'),
      '{_PII_IP}', '[IP]', 'g') AS redacted
FROM aug ORDER BY doc_id
"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination with source 'src0' as the held-out
    eval set. n=5 (not the production 13) because the synthetic corpus
    is a ~30-word vocabulary: 13-grams never collide there, while
    5-grams produce a sparse non-trivial hit set — the operator takes
    n as a parameter."""
    from rdf2smw_ray.pipelines.decontam import decontaminate

    out = decontaminate(
        _docs(sf_dir, columns=["doc_id", "text", "source"]),
        bench_source="src0",
        n=5,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DECONTAMINATE_SQL = r"""
WITH t AS (SELECT doc_id, source, string_split_regex(text, '\s+') AS w FROM documents),
g AS (
  SELECT doc_id, source,
         [array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)] AS gs
  FROM t
),
bench AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE source = 'src0'),
hits AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM (SELECT doc_id, unnest(gs) AS gram FROM g WHERE source <> 'src0') tr
  JOIN bench USING (gram) GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') d
LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


def q_dup_ngram_stats(sf_dir: str):
    """Per-doc duplicated n-gram span fraction (n=5 for the same
    small-vocabulary reason as q_decontaminate — the operator takes n
    as a parameter)."""
    from rdf2smw_ray.pipelines.spans import dup_ngram_stats

    out = dup_ngram_stats(_docs(sf_dir, columns=["doc_id", "text"]), n=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_spans(sf_dir: str):
    """Exact-substring SPAN REMOVAL (Lee et al. 2022 intervention):
    tokens covered by any non-first occurrence of a 5-gram
    (corpus-wide (doc_id, pos) first-wins) are dropped and the kept
    text is reconstructed — the operator dup_ngram_stats only
    MEASURES; this one emits the deduplicated corpus."""
    from rdf2smw_ray.pipelines.spans import dedup_spans

    out = dedup_spans(_docs(sf_dir, columns=["doc_id", "text"]), n=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_docs_per_source(sf_dir: str):
    """Per-source corpus stats: partial per-batch reduce → tiny final
    groupby."""
    ds = _docs(sf_dir, columns=["doc_id", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby("source", sort=False)
            .agg(n=("doc_id", "size"), chars=("n_chars", "sum"))
            .reset_index()
        )
        return table_from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="n"), Sum("chars", alias_name="chars"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["avg_chars"] = (out["chars"] / out["n"]).round(4)
    out["chars"] = out["chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


DOCS_PER_SOURCE_SQL = """
SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       ROUND(CAST(SUM(n_chars) AS BIGINT) / COUNT(*)::DOUBLE, 4) AS avg_chars
FROM documents GROUP BY source ORDER BY source
"""


def q_lang_id(sf_dir: str):
    out = lang_id(_docs(sf_dir, columns=["doc_id", "text"]), concurrency=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _lang_id_sql() -> str:
    """DuckDB restatement of LangId: same profile regexes (RE2-safe),
    argmax with first-wins tie-break = ordered CASE chain."""
    from rdf2smw_ray.pipelines.textstats import LANG_PROFILES

    langs = list(LANG_PROFILES)  # dict order == np.argmax tie-break order
    counts = ",\n         ".join(
        f"len(regexp_extract_all(text, '\\b({'|'.join(words)})\\b')) AS {lang}"
        for lang, words in LANG_PROFILES.items()
    )
    all_zero = " AND ".join(f"{lang} = 0" for lang in langs)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        geq = " AND ".join(f"{lang} >= {other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {geq} THEN '{lang}'")
    case_chain = "\n              ".join(cases)
    return f"""
WITH c AS (
  SELECT doc_id,
         {counts}
  FROM documents
)
SELECT doc_id,
       CASE WHEN {all_zero} THEN 'und'
            {case_chain}
            ELSE '{langs[-1]}' END AS lang_pred
FROM c ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


def q_lang_confusion(sf_dir: str):
    """Classifier-evaluation at scale: the (declared lang × predicted
    lang) confusion matrix — lang_id predictions joined back to the
    stored label (size-gated join on doc_id), pre-counted per batch
    before a tiny pair groupby."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.stages.join import bucketed_join

    preds = lang_id(_docs(sf_dir, columns=["doc_id", "text"]), concurrency=2)
    joined = bucketed_join(
        preds,
        _docs(sf_dir, columns=["doc_id", "lang"]),
        key="doc_id",
        right_cols={"lang": "lang_true"},
    )

    def pair_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = (
            df.groupby(["lang_true", "lang_pred"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return table_from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(pair_counts, batch_format="pyarrow")
        .groupby(["lang_true", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(drop=True)


LANG_CONFUSION_SQL = f"""
WITH pred AS ({LANG_ID_SQL})
SELECT d.lang AS lang_true, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_fingerprints(sf_dir: str):
    """Winnowing document fingerprints, SELF-CERTIFYING like q_simhash:
    a ~12% md5-gated sample is re-verified in-query against the scalar
    reference kernel (textstats.fingerprint_text — the same kernel the
    vectorized-equality pytest pins) and any mismatch raises; verified
    rows are marked in a column. Size-gated to ≤20k docs — at scale the
    vectorized≡scalar pytest still covers the kernel."""
    from rdf2smw_ray.pipelines.textstats import fingerprint_text

    out = fingerprints(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)

    verified: set = set()
    if len(out) <= 20_000:
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        sample = d[d["doc_id"].map(_md5_gate)]
        got = out.set_index("doc_id")["fingerprint"]
        bad = []
        for r in sample.itertuples():
            v = got.get(int(r.doc_id))
            # a MISSING output row is a failure too (got.get → None)
            if v is None or np.uint64(v) != np.uint64(fingerprint_text(r.text or "", 4)):
                bad.append(int(r.doc_id))
        if bad:
            raise AssertionError(
                f"fingerprint sample verification failed for docs {bad[:5]}"
            )
        verified = set(sample["doc_id"].astype(int))
    out["in_verified_sample"] = out["doc_id"].astype(int).isin(verified)
    return out


# ---------------------------------------------------------------------------
# Dedup queries
# ---------------------------------------------------------------------------
def q_exact_dedup(sf_dir: str):
    out = exact_dedup(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    agg_col = next(c for c in out.columns if "doc_id" in c)
    out = out.rename(columns={agg_col: "kept_doc_id"})
    out["kept_doc_id"] = out["kept_doc_id"].astype("int64")
    return out.sort_values("text_hash").reset_index(drop=True)


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, CAST(MIN(doc_id) AS BIGINT) AS kept_doc_id
FROM documents GROUP BY md5(text) ORDER BY text_hash
"""


def q_minhash_dedup(sf_dir: str):
    """MinHash-LSH near-dup assignment, SELF-CERTIFYING: at gate
    scale (≤2000 docs) the exact flagged set — docs with an earlier
    5-shingle Jaccard ≥ 0.8 partner — is recomputed brute-force on
    the driver and the banding recall vs it is emitted as a column;
    the query raises below the 95% floor (the fixture's near-dups
    all have J ≥ 0.875, where a 16-band/4-row miss has probability
    ~7e-7). At corpus scale the certification is skipped; the LSH
    path itself is unchanged and fully distributed."""
    docs_ds = _docs(sf_dir, columns=["doc_id", "text"])
    out = minhash_dedup(docs_ds, concurrency=2).to_pandas()
    if "doc_id" not in out.columns:  # zero near-dup edges
        out = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
        )
    else:
        agg = next(c for c in out.columns if "dup_of" in c)
        out = out.rename(columns={agg: "dup_of"})
        out["dup_of"] = out["dup_of"].astype("int64")
    out = out.sort_values("doc_id").reset_index(drop=True)

    recall_pct = np.int64(-1)  # -1 = certification skipped (too large)
    if docs_ds.count() <= 2000:
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        sh = {
            int(r.doc_id): {
                " ".join(w[i : i + 5]) for i in range(len(w) - 4)
            }
            for r in d.itertuples()
            for w in [(r.text or "").split()]
        }
        ids = sorted(sh)
        flagged_exact = set()
        for i, a in enumerate(ids):
            sa = sh[a]
            for b in ids[:i]:
                sb = sh[b]
                if sa or sb:
                    if len(sa & sb) / len(sa | sb) >= 0.8:
                        flagged_exact.add(a)
                        break
        flagged_lsh = set(out["doc_id"].astype(int))
        # Vacuously 100 when the corpus has no exact near-dup at all —
        # 0*100 // 1 would read as 0% recall and trip the floor spuriously.
        recall_pct = (
            np.int64(100)
            if not flagged_exact
            else np.int64(len(flagged_lsh & flagged_exact) * 100 // len(flagged_exact))
        )
        if recall_pct < 95:
            raise AssertionError(
                f"minhash banding recall {recall_pct}% below the 95% floor "
                f"({len(flagged_exact)} exact near-dup docs)"
            )
    out["recall_vs_exact_pct"] = recall_pct
    return out


def q_jaccard_pairs(sf_dir: str):
    """Value-checked LSH: verified near-dup pairs must equal the exact
    all-pairs 5-shingle Jaccard ≥ 0.8 set (DuckDB computes it directly
    at sf0.01 scale; the Ray path is the scalable LSH + distributed
    verify)."""
    from rdf2smw_ray.pipelines.dedup import lsh_jaccard_pairs

    out = lsh_jaccard_pairs(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, concurrency=2
    ).to_pandas()
    if "doc_a" not in out.columns:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    out["doc_a"] = out["doc_a"].astype("int64")
    out["doc_b"] = out["doc_b"].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# the ::DOUBLE division mirrors the Python kernel's len(i)/len(u) so
# threshold comparisons agree bit-for-bit; w[i:i+4] is a 1-based
# INCLUSIVE slice in DuckDB → 5 tokens per shingle (k=5)
JACCARD_PAIRS_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)]) AS s
  FROM toks WHERE len(w) >= 5
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
ORDER BY doc_a, doc_b
"""


def q_prefix_jaccard_pairs(sf_dir: str):
    """EXACT prefix-filter set-similarity join — same contract and
    oracle as jaccard_pairs, but recall 1.0 by construction instead of
    by LSH banding probability (complementary algorithm, identical
    answer set)."""
    from rdf2smw_ray.pipelines.dedup import prefix_filter_pairs

    out = prefix_filter_pairs(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, concurrency=2
    ).to_pandas()
    if "doc_a" not in out.columns:
        return pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    out["doc_a"] = out["doc_a"].astype("int64")
    out["doc_b"] = out["doc_b"].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def q_incremental_near_dup(sf_dir: str):
    """Incremental ingestion dedup: even doc_ids play the existing
    corpus, odd doc_ids the incoming batch; verified cross-side pairs
    must equal the exact cross-pairs 5-shingle Jaccard ≥ 0.8 set."""
    from rdf2smw_ray.pipelines.dedup import cross_corpus_near_dup

    out = cross_corpus_near_dup(
        _docs(sf_dir, columns=["doc_id", "text"]),
        is_new=lambda ids: (np.asarray(ids, dtype=np.int64) % 2) == 1,
        threshold=0.8,
        concurrency=2,
    ).to_pandas()
    if "base_id" not in out.columns:
        return pd.DataFrame(
            {
                "base_id": pd.Series([], dtype="int64"),
                "new_id": pd.Series([], dtype="int64"),
            }
        )
    out["base_id"] = out["base_id"].astype("int64")
    out["new_id"] = out["new_id"].astype("int64")
    return out.sort_values(["base_id", "new_id"]).reset_index(drop=True)


INCREMENTAL_NEAR_DUP_SQL = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)]) AS s
  FROM toks WHERE len(w) >= 5
)
SELECT a.doc_id AS base_id, b.doc_id AS new_id
FROM sh a JOIN sh b ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
ORDER BY base_id, new_id
"""


def q_dedup_clusters(sf_dir: str):
    """Near-dup cluster assignment (LSH pairs → distributed connected
    components) vs an exact recursive-CTE reachability oracle."""
    from rdf2smw_ray.pipelines.dedup import dedup_clusters

    out = dedup_clusters(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, concurrency=2
    ).to_pandas()
    if "node" not in out.columns:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "cluster_id": pd.Series([], dtype="int64"),
            }
        )
    out = out.rename(columns={"node": "doc_id", "label": "cluster_id"})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["cluster_id"] = out["cluster_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


DEDUP_CLUSTERS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+4], ' ') FOR i IN generate_series(1, len(w)-4)]) AS s
  FROM toks WHERE len(w) >= 5
), pairs AS MATERIALIZED (
  -- MATERIALIZED: the recursive reach CTE below otherwise re-evaluates
  -- the O(n²) all-pairs Jaccard each iteration (33 s → 11 s at sf0.01)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(a.s || b.s)) >= 0.8
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS n FROM edges
), reach AS (
  SELECT n, n AS m FROM nodes
  UNION
  SELECT r.n, e.b AS m FROM reach r JOIN edges e ON e.a = r.m
)
SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id
FROM reach GROUP BY n ORDER BY doc_id
"""


def q_dedup_keep_best(sf_dir: str):
    from rdf2smw_ray.pipelines.dedup import dedup_keep_best

    out = dedup_keep_best(
        _docs(sf_dir, columns=["doc_id", "text"]), threshold=0.8, concurrency=2
    ).to_pandas()
    if "cluster_id" not in out.columns:
        return pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype="int64"),
                "kept_doc_id": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("cluster_id").reset_index(drop=True)


DEDUP_KEEP_BEST_SQL = (
    DEDUP_CLUSTERS_SQL.replace(
        "SELECT n AS doc_id, CAST(MIN(m) AS BIGINT) AS cluster_id\nFROM reach GROUP BY n ORDER BY doc_id",
        """SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(doc_id AS BIGINT) AS kept_doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens
FROM (
  SELECT r.cluster_id, r.doc_id,
         len(regexp_extract_all(d.text, '\\S+')) AS n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY r.cluster_id
           ORDER BY len(regexp_extract_all(d.text, '\\S+')) DESC, r.doc_id
         ) AS rn
  FROM (SELECT n AS doc_id, MIN(m) AS cluster_id FROM reach GROUP BY n) r
  JOIN documents d ON d.doc_id = r.doc_id
) WHERE rn = 1 ORDER BY cluster_id""",
    )
)


def q_simhash(sf_dir: str):
    """64-bit SimHash signatures, SELF-CERTIFYING: signatures are
    exact-deterministic (rows-only in the gate only because blake2b
    is not SQL-derivable), so the query re-verifies a ~12% hash-gated
    sample of documents against the scalar reference kernel
    (dedup.simhash_text — the same kernel the vectorized-equality
    pytest pins) and raises on any mismatch; the sampled rows are
    marked in a column so the evidence is visible in the output."""
    from rdf2smw_ray.pipelines.dedup import simhash_text

    out = simhashes(_docs(sf_dir, columns=["doc_id", "text"])).to_pandas()
    out["simhash"] = out["simhash"].astype("uint64").astype(str)
    out = out.sort_values("doc_id").reset_index(drop=True)

    # Size-gate the driver-side verification like the minhash/quantile
    # certifications: the scalar reference kernel is a per-doc Python
    # loop over the raw text, so only run it where the whole text
    # column fits comfortably on the driver.  At scale the signatures
    # are still covered by the vectorized≡scalar equality pytest.
    verified: set = set()
    if len(out) <= 20_000:
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        sample = d[d["doc_id"].map(_md5_gate)]
        got = out.set_index("doc_id")["simhash"]
        bad = [
            int(r.doc_id)
            for r in sample.itertuples()
            if got.get(int(r.doc_id)) != str(np.uint64(simhash_text(r.text or "")))
        ]
        # An empty md5-gated sample on a tiny corpus is vacuous, not a
        # failure — only an actual mismatch raises.
        if bad:
            raise AssertionError(f"simhash sample verification failed for docs {bad[:5]}")
        verified = set(sample["doc_id"].astype(int))
    out["in_verified_sample"] = out["doc_id"].astype(int).isin(verified)
    return out


# ---------------------------------------------------------------------------
# ANN queries
# ---------------------------------------------------------------------------
def _query_vec(sf_dir: str) -> np.ndarray:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    row = t.filter(pa.compute.equal(t["vec_id"], 0))
    return np.asarray(row["embedding"].to_pylist()[0], dtype=np.float64)


def q_embedding_norm_stats(sf_dir: str):
    from rdf2smw_ray.pipelines.ann import embedding_norm_stats

    out = embedding_norm_stats(_emb(sf_dir)).to_pandas()
    out["label"] = out["label"].astype("int64")
    return out.sort_values("label").reset_index(drop=True)


# per-element CAST to DOUBLE: the column is float32 and list_sum of raw
# FLOAT squares would accumulate in single precision
EMBEDDING_NORM_STATS_SQL = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       ROUND(SUM(sqrt(list_sum(list_transform(embedding,
             e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE))))) / COUNT(*), 6) AS mean_norm
FROM embeddings GROUP BY label ORDER BY label
"""


def q_ann_topk(sf_dir: str):
    out = ann_brute_topk(_emb(sf_dir), _query_vec(sf_dir), k=10, concurrency=2)
    out = out[["vec_id", "score"]].copy()
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


# CAST to DOUBLE before ROUND: DuckDB computes list_cosine_similarity
# in float32, and ROUND of a float32 returns a float32 whose widened
# double differs from the exact 4-decimal double our engine emits.
ANN_TOPK_SQL = """
SELECT vec_id,
       ROUND(CAST(list_cosine_similarity(embedding,
             (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE), 4) AS score
FROM embeddings
ORDER BY list_cosine_similarity(embedding,
         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC, vec_id
LIMIT 10
"""


def q_knn_graph(sf_dir: str):
    """All-pairs 3-NN graph over the embeddings table (tiled GEMM)."""
    from rdf2smw_ray.pipelines.ann import knn_graph

    return knn_graph(_emb(sf_dir), k=3, num_tiles=4)


def q_knn_graph_ivf(sf_dir: str):
    """IVF-pruned all-pairs 3-NN graph at FULL probe (nprobe ==
    n_lists) — probes everything, so the result equals the exact tiled
    graph and shares its SQL oracle; pruned-probe recall is
    pytest-asserted (tests/test_r4_fixes.py).

    ulp assumption (documented hazard, not observed): IVF buckets
    produce different GEMM shapes than the exact tiles, so a dot
    product could differ in the last ulp; the shared oracle ranks on
    ROUND(s, 6) with an id tie-break and reports ROUND(s, 4), so a
    flip requires a genuine rank tie landing exactly on a 1e-6
    rounding boundary AND two candidates within ~1e-16 of each other —
    never observed across the gate-mirror drift runs. If it ever
    fires, rank on int64(round(score * 1e6)) computed identically in
    both engines."""
    from rdf2smw_ray.pipelines.ann import knn_graph_ivf

    return knn_graph_ivf(_emb(sf_dir), k=3, n_lists=8, nprobe=8)


def q_ann_ivf_topk(sf_dir: str):
    """IVF top-k with full probe (nprobe = n_lists) — exercises the
    quantizer/assignment/probe machinery end-to-end while remaining
    exactly equal to the brute-force SQL oracle; partial-probe recall
    is pytest-asserted."""
    from rdf2smw_ray.pipelines.ann import ann_ivf_topk

    out = ann_ivf_topk(
        _emb(sf_dir), _query_vec(sf_dir), k=10, n_lists=16, nprobe=16, concurrency=2
    )
    out = out[["vec_id", "score"]].copy()
    out["score"] = out["score"].round(4)
    return out.reset_index(drop=True)


def q_ann_lsh(sf_dir: str):
    """Multiprobe LSH top-k, SELF-CERTIFYING (r4 VERDICT item #6):
    the query also runs the exact brute-force top-k and emits
    recall_vs_exact_pct and scan_frac_pct as columns, raising if
    recall falls below the floor — the gate row now carries its own
    approximation evidence instead of being run-only. On the
    near-isotropic synthetic embeddings (see ann_lsh_topk docstring)
    a correct LSH scanning X% of buckets recalls ~X% in expectation
    with k=10 sampling noise on top (measured: 60% at sf0.01, 30% at
    sf0.001, both at ~36% scan, deterministic fixed seed/planes), so
    the floor is RELATIVE — max(15, scan_frac/2) — which passes the
    honest noise band but fails a broken bucket mapping (recall ~0)."""
    from rdf2smw_ray.pipelines.ann import ann_brute_topk

    q = _query_vec(sf_dir)
    emb = _emb(sf_dir)
    scan_stats: dict = {}
    out = ann_lsh_topk(emb, q, k=10, multiprobe=3, concurrency=2, stats=scan_stats)
    exact = ann_brute_topk(emb, q, k=10, concurrency=2)
    hit = len(set(out["vec_id"]) & set(exact["vec_id"]))
    recall_pct = hit * 100 // max(len(exact), 1)
    scan_frac_pct = scan_stats["scanned"] * 100 // max(scan_stats["total"], 1)
    floor = max(15, scan_frac_pct // 2)
    if recall_pct < floor:
        raise AssertionError(
            f"ann_lsh recall {recall_pct}% below the {floor}% floor "
            f"(scan fraction {scan_frac_pct}%)"
        )
    out = out[["vec_id", "score"]].copy()
    out["score"] = out["score"].round(4)
    out["recall_vs_exact_pct"] = np.int64(recall_pct)
    out["scan_frac_pct"] = np.int64(scan_frac_pct)
    return out.reset_index(drop=True)


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup (LSH bucketed + in-bucket verify),
    SELF-CERTIFYING at gate scale (≤4096 vectors): the exact flagged
    set — vectors with an EARLIER cosine ≥ 0.9 partner — is recomputed
    by one driver matmul; every reported pair must verify exactly
    (precision 1.0, the operator's in-bucket cosine check makes false
    positives impossible — a violation raises) and banding recall vs
    the exact set rides along as a column (vacuously 100 when the
    corpus has no near-dup pair, as the synthetic fixture does)."""
    out = embedding_near_dup(_emb(sf_dir), threshold=0.9, concurrency=2).to_pandas()
    if "vec_id" not in out.columns:  # zero near-dup edges
        out = pd.DataFrame(
            {"vec_id": pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
        )
    else:
        agg = next(c for c in out.columns if "dup_of" in c)
        out = out.rename(columns={agg: "dup_of"})
        out["dup_of"] = out["dup_of"].astype("int64")
    out = out.sort_values("vec_id").reset_index(drop=True)

    recall_pct = np.int64(-1)  # -1 = certification skipped (too large)
    if _parquet_nrows(f"{sf_dir}/embeddings.parquet") <= 4096:
        pairs = [(int(r.vec_id), int(r.dup_of)) for r in out.itertuples()]
        recall_pct = _cosine_cert(sf_dir, pairs, 0.9, name="embedding_near_dup")
    out["recall_vs_exact_pct"] = recall_pct
    return out


def q_simhash_near_dup(sf_dir: str):
    """SimHash hamming-distance near-dup pairs, SELF-CERTIFYING by
    EQUALITY (not a floor): banding recall is 1.0 by pigeonhole and
    in-bucket xor-popcount verification makes precision 1.0, so at
    gate scale (≤2000 docs) the result must EQUAL the brute-force
    (scalar reference kernel signatures + full pairwise hamming,
    min earlier partner per doc) — any difference raises. Rows-only
    in the gate only because blake2b is not SQL-derivable."""
    from rdf2smw_ray.pipelines.dedup import _popcount64, simhash_near_dup, simhash_text

    out = simhash_near_dup(
        _docs(sf_dir, columns=["doc_id", "text"]), max_hamming=3
    ).to_pandas()
    if "doc_id" not in out.columns:
        out = pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
        )
    else:
        agg = next(c for c in out.columns if "dup_of" in c)
        out = out.rename(columns={agg: "dup_of"})
        out["dup_of"] = out["dup_of"].astype("int64")
    out = out.sort_values("doc_id").reset_index(drop=True)

    verified = False
    if _parquet_nrows(f"{sf_dir}/documents.parquet") <= 2000:
        d = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        d = d.sort_values("doc_id").reset_index(drop=True)
        ids = d["doc_id"].to_numpy().astype(np.int64)
        sig = np.array(
            [np.uint64(simhash_text(t or "")) for t in d["text"]], dtype=np.uint64
        )
        exact = {}
        for j in range(1, len(ids)):
            ham = _popcount64(sig[:j] ^ sig[j])
            hit = np.flatnonzero(ham <= 3)
            if len(hit):
                exact[int(ids[j])] = int(ids[hit].min())
        got = dict(zip(out["doc_id"].astype(int), out["dup_of"].astype(int)))
        if got != exact:
            extra = {k: v for k, v in got.items() if exact.get(k) != v}
            missing = {k: v for k, v in exact.items() if k not in got}
            raise AssertionError(
                f"simhash_near_dup != brute force: extra={list(extra.items())[:3]} "
                f"missing={list(missing.items())[:3]}"
            )
        verified = True
    out["verified_exact"] = verified
    return out


def q_cms_token_counts(sf_dir: str):
    """Count-Min frequency estimates for the exact top-20 tokens,
    SELF-CERTIFYING: the exact counts (already computed to pick the
    candidates) ride along as a column with the per-token overcount.
    overcount >= 0 (est >= exact) is structural and always hard-fails;
    the ceil(e/w * N) bound is probabilistic (per token, prob
    >= 1 - e^-d), so it is emitted as evidence (within_bound) and only
    a 2x excursion — per-token probability below 1e-3 — raises."""
    from ray.data.aggregate import Sum

    from rdf2smw_ray.pipelines.sketches import cms_token_counts

    docs = _docs(sf_dir, columns=["text"])

    def counts(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object).fillna("")
        toks = texts.str.split()
        if not toks.map(len).sum():
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        flat = np.concatenate([t for t in toks if t]).astype(object)
        vc = pd.Series(flat, dtype=object).value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.to_numpy(), pa.string()),
                "n": pa.array(vc.to_numpy().astype(np.int64), pa.int64()),
            }
        )

    full = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    top = full.sort_values(["n", "token"], ascending=[False, True]).head(20)
    out = cms_token_counts(docs, sorted(top["token"]))
    # SELF-CERTIFICATION: CMS error is one-sided (est >= exact) and
    # bounded by ceil(e/w * N) with w=2^14 counters per row — emit
    # exact and overcount columns, raise on a violation
    n_total = int(full["n"].sum())
    bound = int(np.ceil(np.e / (1 << 14) * n_total))
    out = out.merge(
        top[["token", "n"]].rename(columns={"n": "exact"}), on="token", how="left"
    )
    out["exact"] = out["exact"].astype("int64")
    out["overcount"] = (out["est"] - out["exact"]).astype("int64")
    # est >= exact is a STRUCTURAL CMS guarantee — always raise on it.
    # The eN/w bound is PROBABILISTIC (holds per token with prob
    # >= 1 - e^-d, d=4): a correct sketch can legitimately exceed it
    # ~1.8% of the time per token, so the 1x bound is emitted as
    # evidence (within_bound) while only a 2x excursion — per-token
    # probability <= (2e)^-4 ~ 1e-3 by Markov over all four rows —
    # hard-fails the row.
    out["within_bound"] = (out["overcount"] <= bound).astype("int64")
    if (out["overcount"] < 0).any() or (out["overcount"] > 2 * bound).any():
        raise AssertionError(
            f"CMS estimates violate the (0, 2*{bound}] overcount bound:\n{out}"
        )
    return out.sort_values("token").reset_index(drop=True)


def q_value_quantiles(sf_dir: str):
    """Approximate event-value quantiles from the mergeable histogram
    sketch, SELF-CERTIFYING: the sketch's documented bound is
    2 * value_range / num_bins; each estimate's absolute error vs the
    exact quantile is emitted as a column and the query raises on a
    violation (the same bound test_sketches pins). The exact side is
    a driver np.quantile over the single value column — a
    certification pass gated to ≤10M rows; at corpus scale the
    certification is sampled or skipped while the SKETCH (the scale
    path: one bincount vector per block) is unchanged."""
    from rdf2smw_ray.pipelines.sketches import approx_quantiles

    qs = [0.1, 0.5, 0.9, 0.99]
    num_bins = 4096
    ds = _events_cached(sf_dir, ["value"])
    vals = approx_quantiles(ds, "value", qs, num_bins=num_bins)
    if ds.count() <= 10_000_000:
        v = ds.to_pandas()["value"].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        tol = 2 * (v.max() - v.min()) / num_bins
        exact = np.quantile(v, qs)
        errs = np.abs(np.asarray(vals) - exact)
        if (errs > tol).any():
            raise AssertionError(
                f"quantile sketch errors {errs} exceed bound {tol}"
            )
        within = np.int64(1)
    else:  # pragma: no cover - gate scales are far below the cap
        errs = np.full(len(qs), -1.0)
        within = np.int64(0)
    return pd.DataFrame(
        {
            "q": qs,
            "value": [round(float(x), 4) for x in vals],
            "abs_err": [round(float(e), 4) for e in errs],
            "within_bound": np.full(len(qs), within),
        }
    )


def q_approx_distinct_users(sf_dir: str):
    """HLL approximate distinct users over events, SELF-CERTIFYING:
    the exact distinct count (per-batch unique combiner → tiny
    groupby) rides along as a column with the relative error in
    basis points; the query raises if the error exceeds the same 10%
    bound the accuracy pytest pins (p=12 registers → ~1.6% typical)."""
    import pyarrow.compute as pc

    from rdf2smw_ray.pipelines.sketches import approx_distinct

    ds = _events_cached(sf_dir, ["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = (
        ds.map_batches(
            lambda t: pa.table({"user_id": pc.unique(t["user_id"])}),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .count()
        .count()
    )
    rel_err_bp = abs(round(est) - exact) * 10_000 // max(exact, 1)
    if rel_err_bp > 1000:
        raise AssertionError(
            f"HLL estimate {est} vs exact {exact}: error {rel_err_bp}bp > 10%"
        )
    return pd.DataFrame(
        {
            "approx_users": pd.Series([round(est)], dtype="int64"),
            "exact_users": pd.Series([exact], dtype="int64"),
            "rel_err_bp": pd.Series([rel_err_bp], dtype="int64"),
        }
    )


def q_media_features(sf_dir: str):
    """Multimodal plumbing over synthetic media derived from the
    embeddings ids: synth → decode → resize/frame-sample → features.
    SELF-CERTIFYING: a ~12% md5-gated sample of ids is re-derived on
    the driver straight from the seed bytes — WITHOUT going through
    the BMP/WAV encoders or decoders — and the pooled mean/std/
    feat_dim/n_frames must match the operator's output exactly, so a
    codec round-trip or pooling defect fails the gate row. Size-gated
    to ≤20k items; at scale the codec round-trip pytests still pin
    the kernels."""
    from rdf2smw_ray.pipelines.multimodal import (
        _seed_bytes,
        _WAV_RATE,
        media_features,
        synth_media,
    )

    ids = _emb(sf_dir).select_columns(["vec_id"])
    out = media_features(synth_media(ids), concurrency=2).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)

    def _pool16(arr: np.ndarray) -> np.ndarray:
        h, w = arr.shape
        fh, fw = max(1, h // 16), max(1, w // 16)
        th, tw = h // fh * fh, w // fw * fw
        return arr[:th, :tw].reshape(th // fh, fh, tw // fw, fw).mean(axis=(1, 3))

    def _expected(i: int):
        kind = ("image", "audio", "video")[i % 3]
        w = 32 + (i % 8) * 16 if kind != "audio" else 0
        h = 32 + (i % 5) * 16 if kind != "audio" else 0
        d = (500 + i % 4000) if kind != "image" else 0
        if kind == "image":
            px = np.frombuffer(_seed_bytes(i, w * h), dtype=np.uint8).reshape(h, w)
            flat, nf = _pool16(px).ravel(), 1
        elif kind == "audio":
            n = d * (_WAV_RATE // 1000)
            samples = np.frombuffer(_seed_bytes(i, 2 * n), dtype="<i2")
            flat, nf = samples.astype(np.float64), 0
        else:  # video: fake-codec spec — body bytes tiled to (h, w)
            body = np.frombuffer(_seed_bytes(i, 256 + i % 128), dtype=np.uint8)
            reps = int(np.ceil(w * h / len(body)))
            arr = np.tile(body, reps)[: w * h].reshape(h, w)
            flat = np.concatenate(
                [_pool16(np.roll(arr, f)).ravel() for f in range(4)]
            )
            nf = 4
        return (
            float(np.round(flat.mean(), 4)),
            float(np.round(flat.std(), 4)),
            nf,
            len(flat),
        )

    verified: set = set()
    if len(out) <= 20_000:
        by_id = out.set_index("media_id")
        # Sample from the INPUT id set (the embeddings vec_ids), not
        # the operator's output — a defect that DROPS rows must fail
        # the certification, not shrink the sample around itself.
        input_ids = pd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
        )["vec_id"]
        sample = [int(i) for i in input_ids if _md5_gate(i)]
        bad = []
        for i in sample:
            if i not in by_id.index:
                bad.append((i, "MISSING", _expected(i)))
                continue
            row = by_id.loc[i]
            exp = _expected(i)
            got = (
                float(row["mean_val"]),
                float(row["std_val"]),
                int(row["n_frames"]),
                int(row["feat_dim"]),
            )
            if got != exp:
                bad.append((i, got, exp))
        if bad:
            raise AssertionError(f"media_features sample mismatch: {bad[:3]}")
        verified = set(sample)
    out["in_verified_sample"] = out["media_id"].astype(int).isin(verified)
    return out


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style cluster-then-dedup over the embeddings table,
    through the scale-safe DEFAULT path: n_lists='auto' derived from
    corpus count / target_cluster_size (64 here → 8 clusters at
    sf0.01's 500 rows). Rows-only in the gate (k-means is not
    SQL-expressible); the semantics are pytest-pinned instead:
    n_lists=1 reproduces the brute-force global first-wins rule
    exactly, the clustered path achieves full recall, and the
    chunked/tiled greedy is pinned bit-for-bit on PLANTED dense
    near-dup structure with chunk boundaries inside dup groups
    (tests/test_r4_webtext.py, tests/test_r5_fixes.py — the testdata
    embeddings themselves contain no pairs ≥ 0.95, so the planted
    fixture is what exercises the dup branch).

    SELF-CERTIFYING at gate scale (≤4096 vectors): one driver matmul
    recomputes all pairwise cosines; every reported duplicate must
    have cosine(vec_id, dup_of) ≥ threshold with dup_of an EARLIER
    KEEPER (precision 1.0 — a violation raises), and recall vs the
    global exact flagged set rides along as a column (SemDeDup recall
    is <100 by design when a dup pair straddles clusters, so the
    measured value is emitted without a floor; vacuously 100 on this
    fixture)."""
    from rdf2smw_ray.pipelines.ann import semantic_dedup

    out = semantic_dedup(
        _emb(sf_dir), threshold=0.95, target_cluster_size=64
    ).to_pandas()
    out["vec_id"] = out["vec_id"].astype("int64")
    out["dup_of"] = out["dup_of"].astype("int64")
    out = out.sort_values("vec_id").reset_index(drop=True)

    recall_pct = np.int64(-1)  # -1 = certification skipped (too large)
    if _parquet_nrows(f"{sf_dir}/embeddings.parquet") <= 4096:
        keepers = set(out.loc[out["keep"], "vec_id"].astype(int))
        pairs = [
            (int(r.vec_id), int(r.dup_of)) for r in out[~out["keep"]].itertuples()
        ]
        recall_pct = _cosine_cert(
            sf_dir, pairs, 0.95, keepers=keepers, name="semantic_dedup"
        )
    out["recall_vs_exact_pct"] = recall_pct
    return out


def q_heavy_hitters(sf_dir: str):
    """Exact heavy hitters over the corpus tokens via the two-pass
    Misra–Gries scheme — a SKETCH drives pass 1 (bounded memory
    regardless of vocabulary), yet the output is exact and
    oracle-checkable because pass 2 re-counts the ≤k candidates."""
    from rdf2smw_ray.pipelines.sketches import heavy_hitters

    return heavy_hitters(_docs(sf_dir, columns=["text"]), k=32)


HEAVY_HITTERS_SQL = """
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
c AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
t AS (SELECT SUM(cnt) AS total FROM c)
SELECT token, CAST(cnt AS BIGINT) AS cnt
FROM c, t WHERE cnt * 32 > total ORDER BY token
"""


def q_url_dedup(sf_dir: str):
    """Crawl dedup on canonical URLs. The raw crawl is synthesized by
    doc_id arithmetic (groups of 3 docs fetch the SAME page through 4
    messy variants — uppercase scheme/host, www. prefix, tracking
    query, fragment, trailing slash) and the SQL rebuilds the same raw
    strings, so the oracle value-checks the whole canonicalize → keep
    min doc_id → count chain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rdf2smw_ray.pipelines.weburl import url_dedup

    def messy(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy().astype(np.int64)
        base = d // 3 * 3
        b = pd.Series(base).astype(str)
        h = pd.Series(base % 10).astype(str)
        u0 = ("https://ex" + h + ".org/page/" + b).to_numpy(dtype=object)
        u1 = ("https://EX" + h + ".ORG/page/" + b + "/").to_numpy(dtype=object)
        u2 = ("https://www.ex" + h + ".org/page/" + b + "?utm_source=feed").to_numpy(
            dtype=object
        )
        u3 = ("HTTPS://ex" + h + ".org/page/" + b + "#frag").to_numpy(dtype=object)
        v = d % 4
        url = np.select([v == 0, v == 1, v == 2], [u0, u1, u2], u3)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "url": pa.array(url.astype(object), pa.string()),
            }
        )

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(messy, batch_format="pyarrow")
    out = url_dedup(pages).to_pandas()
    out["keeper_doc"] = out["keeper_doc"].astype("int64")
    out["n_dups"] = out["n_dups"].astype("int64")
    return out.sort_values("canonical_url").reset_index(drop=True)


URL_DEDUP_SQL = r"""
WITH raw AS (
  SELECT doc_id, (doc_id // 3) * 3 AS base, doc_id % 4 AS v FROM documents
), urls AS (
  SELECT doc_id,
    CASE v
      WHEN 0 THEN 'https://ex' || (base % 10) || '.org/page/' || base
      WHEN 1 THEN 'https://EX' || (base % 10) || '.ORG/page/' || base || '/'
      WHEN 2 THEN 'https://www.ex' || (base % 10) || '.org/page/' || base
                  || '?utm_source=feed'
      ELSE 'HTTPS://ex' || (base % 10) || '.org/page/' || base || '#frag'
    END AS url
  FROM raw
), s1 AS (
  SELECT doc_id, regexp_replace(regexp_replace(url, '#.*$', ''), '\?.*$', '') AS u
  FROM urls
), s2 AS (
  SELECT doc_id,
    CASE WHEN regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.\-]*://')
      THEN replace(lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\-]*://[^/]*)', 1)),
                   '://www.', '://')
           || regexp_replace(
                regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(.*)$', 1), '/$', '')
      ELSE u  -- scheme-less: pass through (mirrors canonicalize_urls)
    END AS canonical_url
  FROM s1
)
SELECT canonical_url, CAST(MIN(doc_id) AS BIGINT) AS keeper_doc,
       CAST(COUNT(*) AS BIGINT) AS n_dups
FROM s2 GROUP BY canonical_url ORDER BY canonical_url
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------
def all_queries():
    return {
        # KG construction
        "kg_mentions": kg_mentions,
        "kg_mention_counts": kg_mention_counts,
        "kg_cooccur": kg_cooccur,
        "kg_extracted_triples": kg_extracted_triples,
        "kg_extracted_triples_robust": kg_extracted_triples_robust,
        "kg_page_facts": kg_page_facts,
        "kg_incremental": kg_incremental,
        "kg_pagerank": kg_pagerank,
        "kg_triangles": q_kg_triangles,
        "kg_bfs": q_kg_bfs,
        "kg_category_filter": kg_category_filter,
        "kg_pages": kg_pages,
        # relational operator inventory
        "pricing_summary": relational.pricing_summary,
        "orders_per_nation": relational.orders_per_nation,
        "top_orders": relational.top_orders,
        "top_orders_with_ties": relational.top_orders_with_ties,
        "filter_highvalue": relational.filter_highvalue,
        "distinct_event_types": relational.distinct_event_types,
        "events_hourly": relational.events_hourly,
        "revenue_per_orderpriority": relational.revenue_per_orderpriority,
        "top_orders_per_nation": relational.top_orders_per_nation,
        "median_value_per_event_type": relational.median_value_per_event_type,
        "mad_value_per_event_type": relational.mad_value_per_event_type,
        "median_value_per_user_bucket": relational.median_value_per_user_bucket,
        "value_p90_per_event_type": relational.value_p90_per_event_type,
        "orders_price_tiers": relational.orders_price_tiers,
        "cust_urgent_low_outer": relational.cust_urgent_low_outer,
        "shipping_priority": relational.shipping_priority,
        "pareto_orders": relational.pareto_orders,
        "rollup_pricing": relational.rollup_pricing,
        "cube_order_stats": relational.cube_order_stats,
        "weighted_median_prices": relational.weighted_median_prices,
        "event_type_pivot": relational.event_type_pivot,
        "event_counts_long": relational.event_counts_long,
        "mode_event_type": relational.mode_event_type,
        "price_histogram": relational.price_histogram,
        "order_value_rank": ranking.order_value_rank,
        "order_rank_in_priority": ranking.order_rank_in_priority,
        "quantile_normalize": ranking.quantile_normalize,
        "quantity_dense_rank": ranking.quantity_dense_rank,
        "value_gini": ranking.value_gini,
        "nation_accounts": relational.nation_accounts,
        "trimmed_mean_value_per_event_type": relational.trimmed_mean_value_per_event_type,
        "local_supplier_volume": relational.local_supplier_volume,
        "nation_pair_volume": relational.nation_pair_volume,
        "promo_revenue_ratio": relational.promo_revenue_ratio,
        "customer_order_distribution": relational.customer_order_distribution,
        "rich_inactive_customers": relational.rich_inactive_customers,
        "order_priority_check": relational.order_priority_check,
        "returned_item_revenue": relational.returned_item_revenue,
        "late_lineitems_by_priority": relational.late_lineitems_by_priority,
        "large_volume_customers": relational.large_volume_customers,
        "bracket_revenue": relational.bracket_revenue,
        "profit_by_nation_year": relational.profit_by_nation_year,
        "important_parts": relational.important_parts,
        "part_supplier_counts": relational.part_supplier_counts,
        "waiting_suppliers": relational.waiting_suppliers,
        "cheapest_supplier_per_part": relational.cheapest_supplier_per_part,
        "value_quartiles_per_event_type": relational.value_quartiles_per_event_type,
        "distinct_users_per_hour": relational.distinct_users_per_hour,
        "market_share_by_year": relational.market_share_by_year,
        "widget_volume_suppliers": relational.widget_volume_suppliers,
        "small_quantity_revenue": relational.small_quantity_revenue,
        "forecast_revenue": relational.forecast_revenue,
        "top_supplier": relational.top_supplier,
        "fuzzy_part_pairs": fuzzy.fuzzy_part_pairs,
        "fuzzy_customer_pairs": fuzzy.fuzzy_customer_pairs,
        "dq_violations": dq.dq_violations,
        "k_anonymity_audit": dq.k_anonymity_audit,
        "fuzzy_part_canon": fuzzy.fuzzy_part_canon,
        "heavy_hitters": q_heavy_hitters,
        "url_dedup": q_url_dedup,
        "semantic_dedup": q_semantic_dedup,
        # text analysis
        "token_stats": q_token_stats,
        "bpe_token_stats": q_bpe_token_stats,
        "robust_extract": q_robust_extract,
        "quality_score": q_quality,
        "normalize_text": q_normalize_text,
        "docs_per_source": q_docs_per_source,
        "sample_docs": q_sample_docs,
        "stratified_sample": q_stratified_sample,
        "token_chunks": q_token_chunks,
        "sequence_packing": q_sequence_packing,
        "value_hour_corr": relational.value_hour_corr,
        "label_centroid_norm": q_label_centroid_norm,
        "top_bigrams": q_top_bigrams,
        "top_tokens_per_lang": q_top_tokens_per_lang,
        "token_doc_freq": q_token_doc_freq,
        "tfidf_top_terms": q_tfidf_top_terms,
        "repetition_stats": q_repetition_stats,
        "quality_filter": q_quality_filter,
        "pii_redact": q_pii_redact,
        "line_dedup": q_line_dedup,
        "curated_corpus": q_curated_corpus,
        "mixture_sample": q_mixture_sample,
        "token_count_histogram": q_token_count_histogram,
        "pmi_top_bigrams": q_pmi_top_bigrams,
        "kg_degree_histogram": q_kg_degree_histogram,
        "kg_two_hop": q_kg_two_hop,
        "props_k_stats": q_props_k_stats,
        "domain_stats": q_domain_stats,
        "bm25_topk": q_bm25_topk,
        "unigram_logprob": q_unigram_logprob,
        "decontaminate": q_decontaminate,
        "decontaminate_dist": q_decontaminate_dist,
        "dup_ngram_stats": q_dup_ngram_stats,
        "dedup_spans": q_dedup_spans,
        "corpus_diff": diff.corpus_diff_query,
        "corpus_report": report.corpus_report,
        "table_checksum": report.table_checksum,
        "lang_id": q_lang_id,
        "lang_confusion": q_lang_confusion,
        "fingerprints": q_fingerprints,
        # dedup
        "exact_dedup": q_exact_dedup,
        "minhash_dedup": q_minhash_dedup,
        "jaccard_pairs": q_jaccard_pairs,
        "incremental_near_dup": q_incremental_near_dup,
        "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_keep_best": q_dedup_keep_best,
        "simhash": q_simhash,
        "simhash_near_dup": q_simhash_near_dup,
        # similarity search
        "ann_topk": q_ann_topk,
        "knn_graph": q_knn_graph,
        "knn_graph_ivf": q_knn_graph_ivf,
        "embedding_norm_stats": q_embedding_norm_stats,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_topk": q_ann_lsh,
        "embedding_near_dup": q_embedding_near_dup,
        # stream-shaped / join variants
        "sessionize": windows.sessionize,
        "asof_click_before_purchase": windows.asof_click_before_purchase,
        "clicks_before_purchase_window": windows.clicks_before_purchase_window,
        "global_click_pressure": windows.global_click_pressure,
        "funnel_steps": windows.funnel_steps,
        "hopping_window_counts": windows.hopping_window_counts,
        "inter_event_gap_stats": windows.inter_event_gap_stats,
        "running_user_total": windows.running_user_total,
        "hopping_window_distinct_users": windows.hopping_window_distinct_users,
        "user_event_path": windows.user_event_path,
        "rolling_value_sum": windows.rolling_value_sum,
        "rolling_time_window": windows.rolling_time_window,
        "user_state_intervals": windows.user_state_intervals,
        "churned_users": windows.churned_users,
        "event_transitions": windows.event_transitions,
        "running_user_max": windows.running_user_max,
        "cohort_retention": windows.cohort_retention,
        "zscore_value_per_event_type": relational.zscore_value_per_event_type,
        "latest_event_per_user": windows.latest_event_per_user,
        "customers_without_orders": windows.customers_without_orders,
        "customers_without_orders_bloom": windows.customers_without_orders_bloom,
        "orders_from_europe": windows.orders_from_europe,
        # multimodal
        "media_features": q_media_features,
        # sketches
        "approx_distinct_users": q_approx_distinct_users,
        "value_quantiles": q_value_quantiles,
        "cms_token_counts": q_cms_token_counts,
    }


def all_oracle_sql():
    return {
        "kg_mentions": KG_MENTIONS_SQL,
        "kg_mention_counts": KG_MENTION_COUNTS_SQL,
        "kg_cooccur": KG_COOCCUR_SQL,
        "kg_extracted_triples": KG_EXTRACTED_TRIPLES_SQL,
        "kg_extracted_triples_robust": KG_EXTRACTED_TRIPLES_SQL,
        "kg_page_facts": KG_PAGE_FACTS_SQL,
        "kg_incremental": KG_PAGE_FACTS_SQL,  # upsert(base, delta) ≡ full build
        "kg_pagerank": KG_PAGERANK_SQL,
        "kg_triangles": KG_TRIANGLES_SQL,
        "kg_bfs": KG_BFS_SQL,
        "kg_category_filter": KG_CATEGORY_FILTER_SQL,
        "kg_pages": KG_PAGES_SQL,
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       ROUND(ROUND(SUM(l_quantity), 2) / COUNT(*), 4) AS avg_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "orders_per_nation": """
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS order_count,
       ROUND(SUM(o_totalprice), 2) AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
        "top_orders": """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
        "top_orders_with_ties": relational.TOP_ORDERS_WITH_TIES_SQL,
        "filter_highvalue": """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total
FROM orders WHERE o_totalprice > 400000.0
""",
        "distinct_event_types": """
SELECT DISTINCT event_type FROM events ORDER BY event_type
""",
        "events_hourly": """
SELECT user_id, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS total
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "revenue_per_orderpriority": """
SELECT o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
        "heavy_hitters": HEAVY_HITTERS_SQL,
        "url_dedup": URL_DEDUP_SQL,
        "token_stats": TOKEN_STATS_SQL,
        "bpe_token_stats": BPE_TOKEN_STATS_SQL,
        "robust_extract": ROBUST_EXTRACT_SQL,
        "quality_score": QUALITY_SQL,
        "normalize_text": NORMALIZE_SQL,
        "docs_per_source": DOCS_PER_SOURCE_SQL,
        "sample_docs": SAMPLE_DOCS_SQL,
        "stratified_sample": STRATIFIED_SAMPLE_SQL,
        "token_chunks": packing.TOKEN_CHUNKS_SQL,
        "sequence_packing": packing.SEQUENCE_PACKING_SQL,
        "value_hour_corr": relational.VALUE_HOUR_CORR_SQL,
        "label_centroid_norm": LABEL_CENTROID_NORM_SQL,
        "top_bigrams": TOP_BIGRAMS_SQL,
        "top_tokens_per_lang": TOP_TOKENS_PER_LANG_SQL,
        "token_doc_freq": TOKEN_DOC_FREQ_SQL,
        "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
        "repetition_stats": REPETITION_STATS_SQL,
        "quality_filter": QUALITY_FILTER_SQL,
        "pii_redact": PII_REDACT_SQL,
        "line_dedup": LINE_DEDUP_SQL,
        "curated_corpus": CURATED_CORPUS_SQL,
        "mixture_sample": MIXTURE_SAMPLE_SQL,
        "token_count_histogram": TOKEN_COUNT_HISTOGRAM_SQL,
        "pmi_top_bigrams": PMI_TOP_BIGRAMS_SQL,
        "kg_degree_histogram": KG_DEGREE_HISTOGRAM_SQL,
        "kg_two_hop": KG_TWO_HOP_SQL,
        "props_k_stats": PROPS_K_STATS_SQL,
        "domain_stats": DOMAIN_STATS_SQL,
        "bm25_topk": BM25_TOPK_SQL,
        "unigram_logprob": UNIGRAM_LOGPROB_SQL,
        "decontaminate": DECONTAMINATE_SQL,
        "decontaminate_dist": DECONTAMINATE_SQL,
        "dup_ngram_stats": spans.DUP_NGRAM_STATS_SQL,
        "dedup_spans": spans.DEDUP_SPANS_SQL,
        "corpus_diff": diff.CORPUS_DIFF_SQL,
        "corpus_report": report.corpus_report_sql(QUALITY_FILTER_SQL),
        "table_checksum": report.TABLE_CHECKSUM_SQL,
        "lang_id": LANG_ID_SQL,
        "lang_confusion": LANG_CONFUSION_SQL,
        # fingerprints, minhash_dedup, simhash(+near_dup), ann_lsh_topk,
        # embedding_near_dup: blake2b/seeded-plane-derived → rows-only;
        # value_quantiles, approx_distinct_users: approximate by design
        "exact_dedup": EXACT_DEDUP_SQL,
        "jaccard_pairs": JACCARD_PAIRS_SQL,
        "incremental_near_dup": INCREMENTAL_NEAR_DUP_SQL,
        "prefix_jaccard_pairs": JACCARD_PAIRS_SQL,
        "dedup_clusters": DEDUP_CLUSTERS_SQL,
        "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
        "ann_topk": ANN_TOPK_SQL,
        "knn_graph": KNN_GRAPH_SQL,
        "knn_graph_ivf": KNN_GRAPH_SQL,
        "embedding_norm_stats": EMBEDDING_NORM_STATS_SQL,
        "ann_ivf_topk": ANN_TOPK_SQL,  # full probe == exact
        "top_orders_per_nation": relational.TOPK_PER_NATION_SQL,
        "median_value_per_event_type": relational.MEDIAN_SQL,
        "mad_value_per_event_type": relational.MAD_SQL,
        "median_value_per_user_bucket": relational.MEDIAN_USER_BUCKET_SQL,
        "value_p90_per_event_type": relational.VALUE_P90_SQL,
        "orders_price_tiers": relational.PRICE_TIERS_SQL,
        "cust_urgent_low_outer": relational.CUST_URGENT_LOW_OUTER_SQL,
        "shipping_priority": relational.SHIPPING_PRIORITY_SQL,
        "pareto_orders": relational.PARETO_ORDERS_SQL,
        "rollup_pricing": relational.ROLLUP_PRICING_SQL,
        "cube_order_stats": relational.CUBE_ORDER_STATS_SQL,
        "weighted_median_prices": relational.WEIGHTED_MEDIAN_SQL,
        "event_type_pivot": relational.EVENT_TYPE_PIVOT_SQL,
        "event_counts_long": relational.EVENT_COUNTS_LONG_SQL,
        "mode_event_type": relational.MODE_EVENT_TYPE_SQL,
        "price_histogram": relational.PRICE_HISTOGRAM_SQL,
        "order_value_rank": ranking.ORDER_VALUE_RANK_SQL,
        "order_rank_in_priority": ranking.ORDER_RANK_IN_PRIORITY_SQL,
        "quantile_normalize": ranking.QUANTILE_NORMALIZE_SQL,
        "quantity_dense_rank": ranking.QUANTITY_DENSE_RANK_SQL,
        "value_gini": ranking.VALUE_GINI_SQL,
        "nation_accounts": relational.NATION_ACCOUNTS_SQL,
        "trimmed_mean_value_per_event_type": relational.TRIMMED_MEAN_SQL,
        "local_supplier_volume": relational.LOCAL_SUPPLIER_VOLUME_SQL,
        "nation_pair_volume": relational.NATION_PAIR_VOLUME_SQL,
        "promo_revenue_ratio": relational.PROMO_REVENUE_SQL,
        "customer_order_distribution": relational.CUSTOMER_ORDER_DIST_SQL,
        "rich_inactive_customers": relational.RICH_INACTIVE_SQL,
        "order_priority_check": relational.ORDER_PRIORITY_CHECK_SQL,
        "returned_item_revenue": relational.RETURNED_ITEM_REVENUE_SQL,
        "late_lineitems_by_priority": relational.LATE_LINEITEMS_SQL,
        "large_volume_customers": relational.LARGE_VOLUME_CUSTOMERS_SQL,
        "bracket_revenue": relational.BRACKET_REVENUE_SQL,
        "profit_by_nation_year": relational.PROFIT_BY_NATION_YEAR_SQL,
        "important_parts": relational.IMPORTANT_PARTS_SQL,
        "part_supplier_counts": relational.PART_SUPPLIER_COUNTS_SQL,
        "waiting_suppliers": relational.WAITING_SUPPLIERS_SQL,
        "cheapest_supplier_per_part": relational.CHEAPEST_SUPPLIER_SQL,
        "value_quartiles_per_event_type": relational.VALUE_QUARTILES_SQL,
        "distinct_users_per_hour": relational.DISTINCT_USERS_PER_HOUR_SQL,
        "market_share_by_year": relational.MARKET_SHARE_SQL,
        "widget_volume_suppliers": relational.WIDGET_VOLUME_SUPPLIERS_SQL,
        "small_quantity_revenue": relational.SMALL_QUANTITY_REVENUE_SQL,
        "forecast_revenue": relational.FORECAST_REVENUE_SQL,
        "top_supplier": relational.TOP_SUPPLIER_SQL,
        "fuzzy_part_pairs": fuzzy.FUZZY_PART_PAIRS_SQL,
        "fuzzy_customer_pairs": fuzzy.FUZZY_CUSTOMER_PAIRS_SQL,
        "dq_violations": dq.DQ_VIOLATIONS_SQL,
        "k_anonymity_audit": dq.K_ANONYMITY_SQL,
        "churned_users": windows.CHURNED_USERS_SQL,
        "fuzzy_part_canon": fuzzy.FUZZY_PART_CANON_SQL,
        "sessionize": windows.SESSIONIZE_SQL,
        "asof_click_before_purchase": windows.ASOF_SQL,
        "clicks_before_purchase_window": windows.WINDOW_COUNT_SQL,
        "global_click_pressure": windows.GLOBAL_CLICK_PRESSURE_SQL,
        "funnel_steps": windows.FUNNEL_SQL,
        "hopping_window_counts": windows.HOPPING_WINDOW_SQL,
        "inter_event_gap_stats": windows.INTER_EVENT_GAP_SQL,
        "running_user_total": windows.RUNNING_TOTAL_SQL,
        "hopping_window_distinct_users": windows.HOPPING_DISTINCT_SQL,
        "user_event_path": windows.USER_EVENT_PATH_SQL,
        "rolling_value_sum": windows.ROLLING_VALUE_SUM_SQL,
        "rolling_time_window": windows.ROLLING_TIME_WINDOW_SQL,
        "user_state_intervals": windows.USER_STATE_INTERVALS_SQL,
        "event_transitions": windows.EVENT_TRANSITIONS_SQL,
        "running_user_max": windows.RUNNING_USER_MAX_SQL,
        "cohort_retention": windows.COHORT_RETENTION_SQL,
        "zscore_value_per_event_type": relational.ZSCORE_SQL,
        "latest_event_per_user": windows.LATEST_EVENT_SQL,
        "customers_without_orders": windows.ANTI_JOIN_SQL,
        "customers_without_orders_bloom": windows.ANTI_JOIN_SQL,
        "orders_from_europe": windows.SEMI_JOIN_SQL,
        # media_features: fake-codec features → rows-only (pytest golden)
    }

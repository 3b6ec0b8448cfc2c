"""Property-based tests (hypothesis): kernel vectorization parity,
N-Triples round-trips, fold order-invariance, and a head-entity skew
case."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rdf2smw_ray.functions.wikititle import (
    clean_title,
    clean_title_series,
    escape_wiki_chars,
    escape_wiki_chars_series,
)
from rdf2smw_ray.sources.ntriples import (
    escape_literal,
    parse_ntriples_lines,
    unescape_literal,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=20))
def test_clean_title_vectorized_equals_scalar(strings):
    vec = clean_title_series(pd.Series(strings, dtype=object)).tolist()
    assert vec == [clean_title(s) for s in strings]


@settings(max_examples=200, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=20))
def test_escape_vectorized_equals_scalar(strings):
    vec = escape_wiki_chars_series(pd.Series(strings, dtype=object)).tolist()
    assert vec == [escape_wiki_chars(s) for s in strings]


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_literal_escape_roundtrip(s):
    assert unescape_literal(escape_literal(s)) == s


iri_strategy = st.from_regex(r"http://[a-z]{1,8}\.org/[A-Za-z0-9_]{1,12}", fullmatch=True)
lit_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=60
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(iri_strategy, iri_strategy, lit_strategy), min_size=1, max_size=15
    )
)
def test_ntriples_parse_roundtrip_random(rows):
    lines = pd.Series(
        [f'<{s}> <{p}> "{escape_literal(o)}" .' for s, p, o in rows]
    )
    t = parse_ntriples_lines(lines)
    assert t.num_rows == len(rows)
    got = list(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))
    assert got == rows


def _resolved_table(rows):
    """rows: (subj, seq, property, value, is_cat, depth)."""
    from rdf2smw_ray.schemas import RESOLVED_SCHEMA

    return pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "seq": [r[1] for r in rows],
            "subj_title": [r[0].rsplit("/", 1)[-1] for r in rows],
            "subj_type": [1 for _ in rows],
            "property": [r[2] for r in rows],
            "pred_title": ["Property:" + r[2] for r in rows],
            "value": [r[3] for r in rows],
            "is_cat": [r[4] for r in rows],
            "depth": [r[5] for r in rows],
            "has_type": ["" for _ in rows],
        },
        schema=RESOLVED_SCHEMA,
    )


@pytest.mark.parametrize("blocks", [1, 3, 7])
def test_fold_invariant_under_block_structure(blocks):
    """The fold result must not depend on how rows are split into
    blocks (combiner correctness), including duplicate keys spread
    across blocks."""
    import ray.data as rd

    from rdf2smw_ray.stages.fold import fold_pages

    rng = np.random.RandomState(7)
    rows = []
    for i in range(200):
        subj = f"http://e/s{i % 5}"
        prop = f"P{rng.randint(3)}"
        val = f"v{rng.randint(4)}"
        rows.append((subj, i, prop, val, bool(i % 11 == 0), int(i % 11 == 0) * (i % 3)))
    t = _resolved_table(rows)
    ds = rd.from_arrow(t).repartition(blocks)
    pages = fold_pages(ds).to_pandas().sort_values("subj").reset_index(drop=True)

    # sequential reference fold
    want = {}
    for subj, seq, prop, val, is_cat, depth in sorted(rows, key=lambda r: r[1]):
        page = want.setdefault(subj, {"facts": [], "cats": [], "spec": "", "top": 0})
        if is_cat:
            if depth > page["top"]:
                page["top"] = depth
                page["spec"] = val
            if val not in page["cats"]:
                page["cats"].append(val)
        else:
            if (prop, val) not in page["facts"]:
                page["facts"].append((prop, val))
    for subj, page in want.items():
        if ("Equivalent URI", subj) not in page["facts"]:
            page["facts"].append(("Equivalent URI", subj))

    for _, r in pages.iterrows():
        w = want[r["subj"]]
        assert [(f["property"], f["value"]) for f in r["facts"]] == w["facts"], r["subj"]
        assert list(r["categories"]) == w["cats"]
        assert r["specific_category"] == w["spec"]


def test_head_entity_skew_fold():
    """One subject with 50k facts across 16 blocks: the combiner must
    bound the shuffle (≤1 packed row per subject per block) and the
    result must match first-wins dedup."""
    import ray.data as rd

    from rdf2smw_ray.stages.fold import _pack_batch, fold_pages

    n = 50_000
    rows = [
        (f"http://e/head", i, f"P{i % 13}", f"v{i % 97}", False, 0) for i in range(n)
    ]
    t = _resolved_table(rows)

    # combiner bound: one packed row per subject per batch
    packed = _pack_batch(t)
    assert packed.num_rows == 1

    ds = rd.from_arrow(t).repartition(16)
    pages = fold_pages(ds).to_pandas()
    assert len(pages) == 1
    facts = [(f["property"], f["value"]) for f in pages.iloc[0]["facts"]]
    # 13 × 97 distinct (prop, value) combos? P(i%13), v(i%97): pairs where
    # i mod 13 == a and i mod 97 == b exist for all (a, b) (13·97 < n, coprime)
    assert len(facts) == 13 * 97 + 1  # + Equivalent URI
    # first-wins order: first occurrence of each pair by seq
    seen = set()
    expected = []
    for i in range(n):
        k = (f"P{i % 13}", f"v{i % 97}")
        if k not in seen:
            seen.add(k)
            expected.append(k)
    expected.append(("Equivalent URI", "http://e/head"))
    assert facts == expected

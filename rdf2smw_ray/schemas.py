"""Arrow schemas for every logical table in the engine.

The data model restates the reference's Go structs
(/root/reference/components/iptypes.go:13-47) as columnar Arrow
schemas (SURVEY.md §1.4). All strings are UTF-8; nested page payloads
use Arrow list/struct types so batches stay ``batch_format="pyarrow"``
end to end.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# URI type enum — integer values match the reference's iota enum
# (/root/reference/components/triplestowikipageconv.go:47-53) so page
# records are directly comparable.
# ---------------------------------------------------------------------------
URITYPE_UNDEFINED = 1
URITYPE_PREDICATE = 2
URITYPE_CLASS = 3
URITYPE_TEMPLATE = 4

# MediaWiki namespace ids per page type
# (/root/reference/components/mwxmlcreator.go:45-50).
PAGE_TYPE_TO_MW_NAMESPACE = {
    URITYPE_CLASS: 14,
    URITYPE_TEMPLATE: 10,
    URITYPE_PREDICATE: 102,
    URITYPE_UNDEFINED: 0,
}

# ---------------------------------------------------------------------------
# web_pages — pipeline entry table (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
WEB_PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# triples — the canonical triple table (one row per (subj, pred, obj)
# statement). ``seq`` is a deterministic 64-bit ordering key that
# preserves within-subject statement order (the reference relies on
# input-file order — /root/reference/components/tripleaggregator.go:25).
# ``obj_kind`` discriminates the three RDF term kinds the reference
# switches on (/root/reference/components/triplestowikipageconv.go:104,112;
# blank nodes fall through both branches).
# ---------------------------------------------------------------------------
OBJ_IRI = "iri"
OBJ_LITERAL = "literal"
OBJ_BLANK = "blank"

TRIPLES_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_is_iri", pa.bool_()),
        pa.field("obj_kind", pa.string()),  # "iri" | "literal" | "blank"
        pa.field("obj_datatype", pa.string()),  # full datatype IRI or ""
        pa.field("obj_lang", pa.string()),  # language tag or ""
        pa.field("seq", pa.int64()),
        pa.field("src", pa.string()),  # provenance: source url / file
    ]
)

# ---------------------------------------------------------------------------
# sidecar — the distributed dictionary replacing the reference's
# whole-dataset resource index (/root/reference/components/residxcreator.go:18-23).
# One row per subject that carries at least one title-deciding or
# type/subclass triple. ``title`` is the fully canonicalized factTitle
# (no "Property:"/"Category:" prefix); ``depth`` is the
# super-category-chain depth used for SpecificCategory selection
# (/root/reference/components/triplestowikipageconv.go:278-292).
# ---------------------------------------------------------------------------
SIDECAR_SCHEMA = pa.schema(
    [
        pa.field("uri", pa.string()),
        pa.field("title", pa.string()),
        pa.field("uri_type", pa.int32()),
        pa.field("depth", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# resolved — per-triple output of the entity-linking / title-resolution
# stage; input to the groupby(subj) page fold.
# ---------------------------------------------------------------------------
RESOLVED_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("seq", pa.int64()),
        pa.field("subj_title", pa.string()),  # canonical factTitle of subj
        pa.field("subj_type", pa.int32()),
        pa.field("property", pa.string()),  # predicate factTitle (no prefix)
        pa.field("pred_title", pa.string()),  # "Property:" + factTitle
        pa.field("value", pa.string()),
        pa.field("is_cat", pa.bool_()),  # pred ∈ {rdf:type, rdfs:subClassOf}
        pa.field("depth", pa.int32()),  # super-category depth of the object
        pa.field("has_type", pa.string()),  # "Page"|"Text"|"Number"|""
    ]
)

# ---------------------------------------------------------------------------
# pages — per-subject page records (reference WikiPage,
# /root/reference/components/iptypes.go:31-47).
# ---------------------------------------------------------------------------
FACT_TYPE = pa.struct([("property", pa.string()), ("value", pa.string())])

PAGES_SCHEMA = pa.schema(
    [
        pa.field("title", pa.string()),
        pa.field("page_type", pa.int32()),
        pa.field("facts", pa.list_(FACT_TYPE)),
        pa.field("categories", pa.list_(pa.string())),
        pa.field("specific_category", pa.string()),  # "" when none
        pa.field("subj", pa.string()),  # originating subject URI, "" if none
    ]
)

RENDERED_SCHEMA = pa.schema(
    list(PAGES_SCHEMA)
    + [
        pa.field("wikitext", pa.string()),
        pa.field("xml", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    """An empty Arrow table with the given schema."""
    return schema.empty_table()

"""URI → canonical wiki-title kernels (scalar + vectorized).

Semantics match the reference's title pipeline char-for-char:
- vocab constants: /root/reference/components/triplestowikipageconv.go:12-45
- title chain:     /root/reference/components/triplestowikipageconv.go:200-306
- value escaping:  /root/reference/components/iptypes.go:103-111 and
                   mwxmlcreator.go:160-173

Pure functions over Python strings / pandas Series — no Ray, no I/O —
so they are usable inside ``map_batches`` bodies and unit-testable in
isolation. Vectorized variants (`*_series`) operate on pandas string
Series; hot paths should factorize to unique values first.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Vocabulary constants (triplestowikipageconv.go:12-45)
# ---------------------------------------------------------------------------
TITLE_PROPERTIES: list[str] = [
    "http://semantic-mediawiki.org/swivt/1.0#page",
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://purl.org/dc/elements/1.1/title",
    "http://purl.org/dc/terms/title",
    "http://www.w3.org/2004/02/skos/core#preferredLabel",
    "http://xmlns.com/foaf/0.1/name",
]

PROPERTY_TYPES: list[str] = [
    "http://www.w3.org/2002/07/owl#AnnotationProperty",
    "http://www.w3.org/2002/07/owl#DatatypeProperty",
    "http://www.w3.org/2002/07/owl#ObjectProperty",
]

CATEGORY_TYPES: list[str] = [
    "http://www.w3.org/2002/07/owl#Class",
]

TYPE_PROPERTY_URI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
SUBCLASS_PROPERTY_URI = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
CATEGORY_PREDICATES = (TYPE_PROPERTY_URI, SUBCLASS_PROPERTY_URI)

DATATYPE_STRING = "http://www.w3.org/2001/XMLSchema#string"
DATATYPE_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
DATATYPE_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
DATATYPE_FLOAT = "http://www.w3.org/2001/XMLSchema#float"

# datatype IRI → SMW "Has type" value (triplestowikipageconv.go:123-132)
DATATYPE_TO_HAS_TYPE = {
    DATATYPE_STRING: "Text",
    DATATYPE_LANGSTRING: "Text",
    DATATYPE_INTEGER: "Number",
    DATATYPE_FLOAT: "Number",
}

# cleanup regexes (triplestowikipageconv.go:71-74) — strip
# " (ns:local)" / " [ns:local]" namespace-ish suffixes. Applied to
# titles AND to literal fact values (:116-117, :239-241).
CLEANUP_REGEXES = [
    re.compile(r" [(][^)]*:[^)]*[)]"),
    re.compile(r" [\[][^\]]*:[^\]]*[\]]"),
]

# character replacement chain (triplestowikipageconv.go:224-236) —
# order matters; applied to titles only, never to literal values.
TITLE_CHAR_REPLACEMENTS: list[tuple[str, str]] = [
    ("[", "("),
    ("]", ")"),
    ("{", "("),
    ("}", ")"),
    ("|", " "),
    ("#", " "),
    ("<", "less than"),
    (">", "greater than"),
    ("?", " "),
    ("&", " "),
    (",", " "),
    (".", " "),
    ("=", "-"),
]

# fact-value escaping for rendering (iptypes.go:103-111 ==
# mwxmlcreator.go:165-173 — the reference duplicates it verbatim).
WIKI_ESCAPE_REPLACEMENTS: list[tuple[str, str]] = [
    ("[", "("),
    ("]", ")"),
    ("|", ","),
    ("=", "-"),
    ("<", "&lt;"),
    (">", "&gt;"),
]

MAX_TITLE_LEN = 250  # triplestowikipageconv.go:245


# ---------------------------------------------------------------------------
# Scalar kernels
# ---------------------------------------------------------------------------
def local_name(uri: str) -> str:
    """Local part of a URI: substring after the last '#', then the last
    '/' (triplestowikipageconv.go:216-221)."""
    return uri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]


def strip_namespace_suffixes(value: str) -> str:
    """Apply the two cleanup regexes (the only transform literals get
    before escaping — triplestowikipageconv.go:116-117)."""
    for rx in CLEANUP_REGEXES:
        value = rx.sub("", value)
    return value


def _truncate_title(title: str) -> str:
    """Shorten to <250 chars by removing trailing whitespace-separated
    words; append " ..." when shortened (triplestowikipageconv.go:244-252)."""
    shortened = False
    while len(title) >= MAX_TITLE_LEN:
        title = " ".join(title.split(" ")[:-1])
        shortened = True
    if shortened:
        title += " ..."
    return title


def upper_case_first(s: str) -> str:
    """Uppercase the first character (triplestowikipageconv.go:294-300;
    the Go code slices the first byte — identical for ASCII, we use the
    first character for valid-UTF-8 sanity)."""
    return s[:1].upper() + s[1:] if s else s


def clean_title(raw: str) -> str:
    """The full factTitle cleanup chain (triplestowikipageconv.go:223-254):
    char replacements → cleanup regexes → truncation → ucfirst.
    ``raw`` is either a title-property value or a URI local name."""
    for old, new in TITLE_CHAR_REPLACEMENTS:
        raw = raw.replace(old, new)
    raw = strip_namespace_suffixes(raw)
    raw = _truncate_title(raw)
    return upper_case_first(raw)


def fact_title_for_uri(uri: str) -> str:
    """factTitle for a URI with no sidecar entry (fallback path:
    local name → cleanup chain)."""
    return clean_title(local_name(uri))


def page_title(fact_title: str, uri_type: int) -> str:
    """Prefix by page type (triplestowikipageconv.go:256-262)."""
    from rdf2smw_ray.schemas import URITYPE_CLASS, URITYPE_PREDICATE

    if uri_type == URITYPE_PREDICATE:
        return "Property:" + fact_title
    if uri_type == URITYPE_CLASS:
        return "Category:" + fact_title
    return fact_title


def escape_wiki_chars(value: str) -> str:
    """Escape a fact value for wikitext (iptypes.go:103-111)."""
    for old, new in WIKI_ESCAPE_REPLACEMENTS:
        value = value.replace(old, new)
    return value


def spaces_to_underscores(s: str) -> str:
    """mwxmlcreator.go:160-162."""
    return s.replace(" ", "_")


# ---------------------------------------------------------------------------
# Vectorized kernels (pandas Series in / Series out)
# ---------------------------------------------------------------------------
def local_name_series(uris: pd.Series) -> pd.Series:
    out = uris.str.split("#").str[-1]
    return out.str.split("/").str[-1]


def strip_namespace_suffixes_series(values: pd.Series) -> pd.Series:
    for rx in CLEANUP_REGEXES:
        values = values.str.replace(rx, "", regex=True)
    return values


def clean_title_series(raw: pd.Series) -> pd.Series:
    """Vectorized ``clean_title``. The truncation loop only runs on the
    rare ≥250-char rows."""
    out = raw
    for old, new in TITLE_CHAR_REPLACEMENTS:
        out = out.str.replace(old, new, regex=False)
    out = strip_namespace_suffixes_series(out)
    long_mask = out.str.len() >= MAX_TITLE_LEN
    if long_mask.any():
        out = out.copy()
        out[long_mask] = out[long_mask].map(_truncate_title)
    # ucfirst, guarding empties
    first = out.str[:1].str.upper()
    rest = out.str[1:]
    return (first + rest).fillna("")


def fact_title_for_uri_series(uris: pd.Series) -> pd.Series:
    return clean_title_series(local_name_series(uris))


def escape_wiki_chars_series(values: pd.Series) -> pd.Series:
    out = values
    for old, new in WIKI_ESCAPE_REPLACEMENTS:
        out = out.str.replace(old, new, regex=False)
    return out


def page_title_series(fact_titles: pd.Series, uri_types: pd.Series) -> pd.Series:
    from rdf2smw_ray.schemas import URITYPE_CLASS, URITYPE_PREDICATE

    prefix = np.where(
        uri_types.to_numpy() == URITYPE_PREDICATE,
        "Property:",
        np.where(uri_types.to_numpy() == URITYPE_CLASS, "Category:", ""),
    )
    return pd.Series(prefix, index=fact_titles.index) + fact_titles

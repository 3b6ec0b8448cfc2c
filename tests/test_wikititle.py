"""Unit tests for the title canonicalization kernels — semantics
checked char-for-char against the reference chain
(/root/reference/components/triplestowikipageconv.go:200-306)."""

import pandas as pd
import pytest

from rdf2smw_ray.functions.wikititle import (
    clean_title,
    clean_title_series,
    escape_wiki_chars,
    fact_title_for_uri,
    local_name,
    page_title,
    spaces_to_underscores,
    strip_namespace_suffixes,
    upper_case_first,
)
from rdf2smw_ray.schemas import URITYPE_CLASS, URITYPE_PREDICATE, URITYPE_UNDEFINED


def test_local_name():
    assert local_name("http://example.org/foo/Bar") == "Bar"
    assert local_name("http://example.org/ns#Baz") == "Baz"
    # '#' split happens before '/' split
    assert local_name("http://example.org/a#b/c") == "c"
    assert local_name("noslashes") == "noslashes"


def test_char_replacements():
    assert clean_title("a[b]c{d}e") == "A(b)c(d)e"
    assert clean_title("a|b#c") == "A b c"
    assert clean_title("a<b>c") == "Aless thanbgreater thanc"
    assert clean_title("a?b&c,d.e=f") == "A b c d e-f"


def test_cleanup_regexes():
    # " (ns:x)" and " [ns:x]" suffixes stripped — but only with the
    # leading space and a colon inside
    assert strip_namespace_suffixes("Niacin (ns:compound)") == "Niacin"
    assert strip_namespace_suffixes("Alt [ns:alt]") == "Alt"
    assert strip_namespace_suffixes("keep (nocolon)") == "keep (nocolon)"
    assert strip_namespace_suffixes("nospace(ns:x)") == "nospace(ns:x)"


def test_cleanup_regex_applies_after_char_replacement():
    # chars are replaced FIRST (so "[a:b]" becomes "(a:b)" and then the
    # paren regex strips it, exactly like the reference order :224-241)
    assert clean_title("Title [x:y]") == "Title"


def test_truncation():
    long = "word " * 60  # 300 chars
    t = clean_title(long.strip())
    assert len(t) < 250 + 4
    assert t.endswith(" ...")
    # content preserved up to the cut
    assert t.startswith("Word word word")


def test_truncation_exact_boundary():
    s = "x" * 249
    assert clean_title(s) == "X" + "x" * 248  # 249 < 250 → untouched
    s250 = "ab " + "x" * 247  # 250 chars, no internal split of last word
    out = clean_title(s250)
    assert out.endswith(" ...")


def test_upper_case_first():
    assert upper_case_first("") == ""
    assert upper_case_first("abc") == "Abc"
    assert upper_case_first("Abc") == "Abc"


def test_page_title_prefixes():
    assert page_title("Foo", URITYPE_PREDICATE) == "Property:Foo"
    assert page_title("Foo", URITYPE_CLASS) == "Category:Foo"
    assert page_title("Foo", URITYPE_UNDEFINED) == "Foo"


def test_escape_wiki_chars():
    assert escape_wiki_chars("a[b]c|d=e<f>g") == "a(b)c,d-e&lt;f&gt;g"


def test_spaces_to_underscores():
    assert spaces_to_underscores("a b c") == "a_b_c"


def test_vectorized_matches_scalar():
    cases = [
        "plain",
        "a[b]{c}|d#e<f>g?h&i,j.k=l",
        "Niacin (ns:compound)",
        "word " * 60,
        "",
        "x" * 300,
        "Ünïcode tïtle",
    ]
    vec = clean_title_series(pd.Series(cases, dtype=object)).tolist()
    assert vec == [clean_title(c) for c in cases]


def test_fact_title_for_uri():
    assert fact_title_for_uri("http://example.org/foo/barBaz") == "BarBaz"
    assert (
        fact_title_for_uri("http://example.org/weird#chars[a]{b}")
        == "Chars(a)(b)"
    )

"""Independent pure-Python restatement of the reference semantics.

TEST ORACLE ONLY — deliberately sequential, dict-and-loop code
transcribed statement-by-statement from the reference Go sources
(/root/reference/components/triplestowikipageconv.go,
mwxmlcreator.go, iptypes.go, tripleaggregator.go), sharing NO kernels
with the engine so a bug in the engine's vectorized code cannot hide
in a shared helper. Used by tests to compute the golden
(title, property, value) fact set for the P/R ≥ 0.95 gate.

Input: list of triple dicts with keys subj, pred, obj, obj_kind
("iri"|"literal"|"blank"), obj_datatype. Aggregates are processed in
first-appearance order (a deterministic stand-in for the reference's
Go-map iteration order — only emission ORDER differs, never the fact
set).
"""

from __future__ import annotations

import re

_TITLE_PROPS = [
    "http://semantic-mediawiki.org/swivt/1.0#page",
    "http://www.w3.org/2000/01/rdf-schema#label",
    "http://purl.org/dc/elements/1.1/title",
    "http://purl.org/dc/terms/title",
    "http://www.w3.org/2004/02/skos/core#preferredLabel",
    "http://xmlns.com/foaf/0.1/name",
]
_PROPERTY_TYPES = [
    "http://www.w3.org/2002/07/owl#AnnotationProperty",
    "http://www.w3.org/2002/07/owl#DatatypeProperty",
    "http://www.w3.org/2002/07/owl#ObjectProperty",
]
_CATEGORY_TYPES = ["http://www.w3.org/2002/07/owl#Class"]
_TYPE_URI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_SUBCLASS_URI = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
_DT_STRING = "http://www.w3.org/2001/XMLSchema#string"
_DT_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
_DT_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
_DT_FLOAT = "http://www.w3.org/2001/XMLSchema#float"

UNDEFINED, PREDICATE, CLASS, TEMPLATE = 1, 2, 3, 4

_CLEANUP = [re.compile(r" [(][^)]*:[^)]*[)]"), re.compile(r" \[[^\]]*:[^\]]*\]")]


def _determine_type(triples):
    if triples:
        for tr in triples:
            for pt in _PROPERTY_TYPES:
                if tr["pred"] == _TYPE_URI and tr["obj"] == pt:
                    return PREDICATE
            for ct in _CATEGORY_TYPES:
                if tr["pred"] == _TYPE_URI and tr["obj"] == ct:
                    return CLASS
    return UNDEFINED


def _find_title(triples):
    for tp in _TITLE_PROPS:
        for tr in triples:
            if tr["pred"] == tp:
                return tr["obj"]
    return ""


def _remove_last_word(s):
    bits = s.split(" ")
    return " ".join(bits[:-1])


def _uri_to_title(uri, uri_type, index):
    aggr = index.get(uri)
    fact_title = ""
    if aggr is not None:
        fact_title = _find_title(aggr)
    if fact_title == "":
        bits = uri.split("#")
        last = bits[-1]
        bits = last.split("/")
        last = bits[-1]
        fact_title = last
    fact_title = fact_title.replace("[", "(").replace("]", ")")
    fact_title = fact_title.replace("{", "(").replace("}", ")")
    fact_title = fact_title.replace("|", " ").replace("#", " ")
    fact_title = fact_title.replace("<", "less than").replace(">", "greater than")
    fact_title = fact_title.replace("?", " ").replace("&", " ")
    fact_title = fact_title.replace(",", " ").replace(".", " ")
    fact_title = fact_title.replace("=", "-")
    for rx in _CLEANUP:
        fact_title = rx.sub("", fact_title)
    shortened = False
    while len(fact_title) >= 250:
        fact_title = _remove_last_word(fact_title)
        shortened = True
    if shortened:
        fact_title += " ..."
    if fact_title != "":
        fact_title = fact_title[0].upper() + fact_title[1:]
    if uri_type == PREDICATE:
        page_title = "Property:" + fact_title
    elif uri_type == CLASS:
        page_title = "Category:" + fact_title
    else:
        page_title = fact_title
    return page_title, fact_title


def _count_super_categories(tr, index, memo=None):
    """Depth of the super-category chain from tr's object
    (triplestowikipageconv.go:278-292). The reference recurses without
    memoization — exponential on dense graphs and non-terminating on
    cycles; memoized here with re-entrant lookups seeing 0 (the same
    cycle semantics as the engine's stages/sidecar.py::compute_depths,
    identical to the reference on acyclic data)."""
    if memo is None:
        memo = {}
    obj = tr["obj"]
    if obj in memo:
        return memo[obj]
    memo[obj] = 0  # cycle guard: re-entrant lookups see 0
    cat = index.get(obj)
    top = 0
    if cat is not None:
        for sub in cat:
            if sub["pred"] in (_TYPE_URI, _SUBCLASS_URI):
                c = _count_super_categories(sub, index, memo) + 1
                if c > top:
                    top = c
    memo[obj] = min(top, 64)
    return memo[obj]


def _new_page(title, ptype):
    return {
        "title": title,
        "type": ptype,
        "facts": [],
        "categories": [],
        "specific": None,
        "subj": "",
    }


def _add_fact_unique(page, prop, val):
    for p, v in page["facts"]:
        if p == prop and v == val:
            return
    page["facts"].append((prop, val))


def _add_cat_unique(page, name):
    if name not in page["categories"]:
        page["categories"].append(name)


def convert(triples, use_templates=True, timestamp="2015-01-01T00:00:00Z"):
    """Full conversion. Returns dict with content_pages,
    property_pages, template_pages (rendered)."""
    index: dict[str, list] = {}
    order: list[str] = []
    for tr in triples:
        s = tr["subj"]
        if s not in index:
            index[s] = []
            order.append(s)
        index[s].append(tr)

    pred_pages: dict[str, dict] = {}
    content_pages: list[dict] = []
    depth_memo: dict[str, int] = {}

    for s in order:
        aggr = index[s]
        ptype = _determine_type(aggr)
        ptitle, _ = _uri_to_title(s, ptype, index)
        page = _new_page(ptitle, ptype)
        page["subj"] = s
        top = 0
        for tr in aggr:
            pred_title, prop_str = _uri_to_title(tr["pred"], PREDICATE, index)
            if pred_title not in pred_pages:
                pred_pages[pred_title] = _new_page(pred_title, PREDICATE)
            if tr["obj_kind"] == "iri":
                v_aggr = index.get(tr["obj"])
                v_type = _determine_type(v_aggr)
                _, value = _uri_to_title(tr["obj"], v_type, index)
                _add_fact_unique(pred_pages[pred_title], "Has type", "Page")
            elif tr["obj_kind"] == "literal":
                value = tr["obj"]
                for rx in _CLEANUP:
                    value = rx.sub("", value)
                dt = tr.get("obj_datatype", "")
                if dt in (_DT_STRING, _DT_LANGSTRING):
                    _add_fact_unique(pred_pages[pred_title], "Has type", "Text")
                elif dt in (_DT_INTEGER, _DT_FLOAT):
                    _add_fact_unique(pred_pages[pred_title], "Has type", "Number")
            else:
                value = ""
            if tr["pred"] in (_TYPE_URI, _SUBCLASS_URI):
                _add_cat_unique(page, value)
                cnt = _count_super_categories(tr, index, depth_memo)
                if cnt > top:
                    top = cnt
                    page["specific"] = value
            else:
                _add_fact_unique(page, prop_str, value)
        _add_fact_unique(page, "Equivalent URI", s)
        if ptype == PREDICATE:
            existing = pred_pages.get(page["title"])
            if existing is not None:
                for p, v in page["facts"]:
                    _add_fact_unique(existing, p, v)
                for c in page["categories"]:
                    _add_cat_unique(existing, c)
                existing["subj"] = s
            else:
                pred_pages[page["title"]] = page
        else:
            content_pages.append(page)

    property_pages = list(pred_pages.values())
    tpl_idx = _render_all(content_pages + property_pages, use_templates, timestamp)
    template_pages = _render_templates(tpl_idx, timestamp)
    return {
        "content_pages": content_pages,
        "property_pages": property_pages,
        "template_pages": template_pages,
    }


_XML_TPL = (
    "\n\t<page>\n\t\t<title>%s</title>\n\t\t<ns>%d</ns>\n\t\t<revision>\n"
    "\t\t\t<timestamp>%s</timestamp>\n\t\t\t<contributor>\n\t\t\t\t<ip>127.0.0.1</ip>\n"
    "\t\t\t</contributor>\n\t\t\t<comment>Page created by RDF2SMW commandline tool</comment>\n"
    "\t\t\t<model>wikitext</model>\n\t\t\t<format>text/x-wiki</format>\n"
    '\t\t\t<text xml:space="preserve">\n%s</text>\n\t\t</revision>\n\t</page>\n'
)
_NS = {CLASS: 14, TEMPLATE: 10, PREDICATE: 102, UNDEFINED: 0}


def _escape(v):
    return (
        v.replace("[", "(").replace("]", ")").replace("|", ",").replace("=", "-")
        .replace("<", "&lt;").replace(">", "&gt;")
    )


def _render_all(pages, use_templates, timestamp):
    tpl_idx: dict[str, dict] = {}
    for page in pages:
        text = ""
        if use_templates and page["categories"]:
            if page["specific"] is not None and page["specific"] != "":
                tpl_name = page["specific"]
            else:
                tpl_name = page["categories"][-1]
            tpl_title = "Template:" + tpl_name
            if tpl_title not in tpl_idx:
                tpl_idx[tpl_title] = {}
            text += "{{" + tpl_name + "\n"
            last_prop = None
            for p, v in page["facts"]:
                val = _escape(v)
                if p == last_prop:
                    text += "," + val + "\n"
                else:
                    text += "|" + p.replace(" ", "_") + "=" + val + "\n"
                last_prop = p
                tpl_idx[tpl_title][p] = 1
            text += "|Categories="
            for i, c in enumerate(page["categories"]):
                text += c if i == 0 else "," + c
            text += "\n}}"
        else:
            for p, v in page["facts"]:
                text += "[[" + p + "::" + _escape(v) + "]]\n"
            for c in page["categories"]:
                text += "[[Category:" + c + "]]\n"
        page["wikitext"] = text
        page["xml"] = _XML_TPL % (page["title"], _NS[page["type"]], timestamp, text)
    return tpl_idx


def _render_templates(tpl_idx, timestamp):
    out = []
    for tpl_title in tpl_idx:
        name = tpl_title.replace("Template:", "")
        text = '{|class="wikitable smwtable"\n!colspan="2"| ' + name + ": {{PAGENAMEE}}\n"
        for prop in sorted(tpl_idx[tpl_title]):
            arg = prop.replace(" ", "_")
            text += "|-\n!%s\n|{{#arraymap:{{{%s|}}}|,|x|[[%s::x]]|,}}\n" % (prop, arg, prop)
        text += "|}\n\n"
        text += "{{#arraymap:{{{Categories}}}|,|x|[[Category:x]]|}}\n"
        out.append(
            {
                "title": tpl_title,
                "type": TEMPLATE,
                "properties": sorted(tpl_idx[tpl_title]),
                "wikitext": text,
                "xml": _XML_TPL % (tpl_title, _NS[TEMPLATE], timestamp, text),
            }
        )
    return out


def fact_triple_set(result) -> set[tuple[str, str, str]]:
    """The emitted (title, property, value) set for P/R comparison."""
    out = set()
    for page in result["content_pages"] + result["property_pages"]:
        for p, v in page["facts"]:
            out.add((page["title"], p, v))
        for c in page["categories"]:
            out.add((page["title"], "Category", c))
    return out

"""Rendering — page records → wikitext + MediaWiki XML.

Reproduces /root/reference/components/mwxmlcreator.go:27-158 as
stateless ``map_batches`` stages:

- template-call wikitext when ``use_templates`` and the page has ≥1
  category (:66-113), with the adjacent-same-property multi-value merge
  (:87-101) and the last-category fallback for a missing
  SpecificCategory (:69-75 — where the reference nil-panics, we fall
  back);
- bare ``[[P::V]]`` / ``[[Category:C]]`` wikitext otherwise
  (:114-126, iptypes.go:99-101,127-129);
- the XML ``<page>`` envelope verbatim (:27-43) — title deliberately
  NOT XML-escaped (reference quirk), namespace from the page type map
  (:45-50), timestamp INJECTED as a pipeline parameter (the reference
  stamps wall-clock ``time.Now()`` at :128,154 — nondeterministic);
- template pages: per template name, the distinct set of contributing
  fact properties (``tplPropertyIdx``, :53,100,140-157) — a small
  keyed aggregation here instead of operator state. The reference
  emits properties in Go-map order (nondeterministic); we sort them
  for byte-stable output.

File framing (``<mediawiki>`` header/footer, :59-60,137-140,157) is
applied by the XML sink (state/checkpoint.py), not per page.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from rdf2smw_ray.functions.wikititle import (
    escape_wiki_chars,
    spaces_to_underscores,
)
from rdf2smw_ray.schemas import (
    PAGE_TYPE_TO_MW_NAMESPACE,
    RENDERED_SCHEMA,
    URITYPE_TEMPLATE,
)

# verbatim structure of wikiXmlTpl (mwxmlcreator.go:27-43)
XML_PAGE_TEMPLATE = (
    "\n\t<page>\n"
    "\t\t<title>{title}</title>\n"
    "\t\t<ns>{ns}</ns>\n"
    "\t\t<revision>\n"
    "\t\t\t<timestamp>{ts}</timestamp>\n"
    "\t\t\t<contributor>\n"
    "\t\t\t\t<ip>127.0.0.1</ip>\n"
    "\t\t\t</contributor>\n"
    "\t\t\t<comment>Page created by RDF2SMW commandline tool</comment>\n"
    "\t\t\t<model>wikitext</model>\n"
    "\t\t\t<format>text/x-wiki</format>\n"
    '\t\t\t<text xml:space="preserve">\n'
    "{text}</text>\n"
    "\t\t</revision>\n"
    "\t</page>\n"
)

DEFAULT_TIMESTAMP = "2015-01-01T00:00:00Z"


def template_name_for_page(categories: list[str], specific_category: str) -> str:
    """Template = SpecificCategory, else last category
    (mwxmlcreator.go:68-75)."""
    if specific_category:
        return specific_category
    return categories[-1]


def render_wikitext(
    facts: list[dict],
    categories: list[str],
    specific_category: str,
    use_templates: bool,
) -> str:
    if use_templates and categories:
        name = template_name_for_page(categories, specific_category)
        parts = ["{{" + name + "\n"]
        last_property = ""
        for f in facts:
            val = escape_wiki_chars(f["value"])
            if f["property"] == last_property:
                parts.append("," + val + "\n")
            else:
                parts.append("|" + spaces_to_underscores(f["property"]) + "=" + val + "\n")
            last_property = f["property"]
        parts.append("|Categories=" + ",".join(categories))
        parts.append("\n}}")
        return "".join(parts)
    parts = []
    for f in facts:
        parts.append("[[" + f["property"] + "::" + escape_wiki_chars(f["value"]) + "]]\n")
    for c in categories:
        parts.append("[[Category:" + c + "]]\n")
    return "".join(parts)


def render_xml(title: str, page_type: int, wikitext: str, timestamp: str) -> str:
    return XML_PAGE_TEMPLATE.format(
        title=title,
        ns=PAGE_TYPE_TO_MW_NAMESPACE.get(page_type, 0),
        ts=timestamp,
        text=wikitext,
    )


def render_batch(
    batch: pa.Table, *, use_templates: bool = True, timestamp: str = DEFAULT_TIMESTAMP
) -> pa.Table:
    """Stateless map_batches body adding wikitext + xml columns."""
    df = batch.to_pandas()
    wikitexts = [
        render_wikitext(f, list(c), s, use_templates)
        for f, c, s in zip(df["facts"], df["categories"], df["specific_category"])
    ]
    xmls = [
        render_xml(t, int(pt), w, timestamp)
        for t, pt, w in zip(df["title"], df["page_type"], wikitexts)
    ]
    out = batch.append_column("wikitext", pa.array(wikitexts, pa.string()))
    return out.append_column("xml", pa.array(xmls, pa.string()))


def render_pages(pages, *, use_templates: bool = True, timestamp: str = DEFAULT_TIMESTAMP):
    import functools

    return pages.map_batches(
        functools.partial(
            render_batch, use_templates=use_templates, timestamp=timestamp
        ),
        batch_format="pyarrow",
    )


def _contrib_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (template_name, property) contributions; the ""
    property row records template existence even with zero facts
    (tplPropertyIdx entry created unconditionally, mwxmlcreator.go:79-81)."""
    df = batch.to_pandas()
    names: list[str] = []
    props: list[str] = []
    for f, c, s in zip(df["facts"], df["categories"], df["specific_category"]):
        cats = list(c)
        if not cats:
            continue
        name = template_name_for_page(cats, s)
        names.append(name)
        props.append("")
        for fact in f:
            names.append(name)
            props.append(fact["property"])
    return pa.table(
        {"template_name": pa.array(names, pa.string()), "property": pa.array(props, pa.string())}
    )


def render_template_wikitext(name: str, properties: list[str]) -> str:
    """mwxmlcreator.go:142-153, property order made deterministic
    (sorted; the reference iterates a Go map)."""
    text = '{|class="wikitable smwtable"\n!colspan="2"| ' + name + ": {{PAGENAMEE}}\n"
    for prop in properties:
        arg = spaces_to_underscores(prop)
        text += "|-\n!%s\n|{{#arraymap:{{{%s|}}}|,|x|[[%s::x]]|,}}\n" % (prop, arg, prop)
    text += "|}\n\n"
    text += "{{#arraymap:{{{Categories}}}|,|x|[[Category:x]]|}}\n"
    return text


def build_template_pages(pages_list, *, timestamp: str = DEFAULT_TIMESTAMP):
    """pages Datasets (content + property streams) → rendered template
    pages Dataset (RENDERED_SCHEMA). Small output: one row per distinct
    template (≈ distinct specific categories)."""
    import ray.data as rd

    contribs = None
    for ds in pages_list:
        c = ds.map_batches(_contrib_batch, batch_format="pyarrow")
        contribs = c if contribs is None else contribs.union(c)

    def _fold_template(df: pd.DataFrame) -> pa.Table:
        name = df["template_name"].iat[0]
        props = sorted(p for p in set(df["property"]) if p)
        title = "Template:" + name
        wikitext = render_template_wikitext(name, props)
        xml = render_xml(title, URITYPE_TEMPLATE, wikitext, timestamp)
        return pa.Table.from_pydict(
            {
                "title": [title],
                "page_type": [URITYPE_TEMPLATE],
                "facts": [[]],
                "categories": [[]],
                "specific_category": [""],
                "subj": [""],
                "wikitext": [wikitext],
                "xml": [xml],
            },
            schema=RENDERED_SCHEMA,
        )

    return contribs.groupby("template_name").map_groups(
        _fold_template, batch_format="pandas"
    )

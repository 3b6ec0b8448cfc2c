"""Turtle (subset) reader → triples Dataset.

The reference wires knakk/rdf's streaming Turtle decoder even though
its README claims N-Triples support (ttlfilereader.go:53,
README.md:76-77) — so real users feed it simple Turtle. This module
parses the commonly used subset:

- ``@prefix p: <iri> .`` / SPARQL-style ``PREFIX p: <iri>``
- prefixed names (``ex:thing``) in any position, ``a`` → rdf:type
- predicate lists (``;``) and object lists (``,``)
- IRIs, blank nodes, literals with ``^^`` datatype / ``@lang``
- ``#`` comments, multi-line statements

Not supported (raises ``ValueError`` listed in the manifest instead of
crashing the job, unlike the reference's log.Fatal): collections
``( )``, blank-node property lists ``[ ]``, multiline ``\"\"\"``
literals, ``@base``.

Parallelism: one Ray task per file (Turtle is stateful via @prefix, so
a file is the parallel unit — same contract as the reference's one
decoder per file). ``seq`` = file_index * 2^40 + statement_index.
"""

from __future__ import annotations

import re

import pyarrow as pa

from rdf2smw_ray.schemas import OBJ_BLANK, OBJ_IRI, OBJ_LITERAL, TRIPLES_SCHEMA
from rdf2smw_ray.sources.ntriples import _FILE_SEQ_STRIDE, unescape_literal

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<prefix_kw>@prefix\b|\bPREFIX\b)
  | (?P<iri><[^>]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<langtag>@[A-Za-z][A-Za-z0-9\-]*)
  | (?P<dtmark>\^\^)
  | (?P<punct>[;,.])
  | (?P<blank>_:[A-Za-z0-9_]+)
  | (?P<pname>[A-Za-z_][\w\-]*:[\w\-.]*|:[\w\-.]*)
  | (?P<kw_a>\ba\b)
  | (?P<number>[+-]?\d+(?:\.\d+)?)
  | (?P<boolean>\btrue\b|\bfalse\b)
  | (?P<ws>\s+)
""",
    re.X,
)

XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"


def _tokenize(text: str):
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at offset {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


def parse_turtle(text: str, *, src: str = "", seq_base: int = 0) -> pa.Table:
    """Parse a Turtle document (subset above) into TRIPLES_SCHEMA."""
    prefixes: dict[str, str] = {}
    rows: list[tuple] = []
    seq = seq_base

    toks = list(_tokenize(text))
    i = 0
    n = len(toks)

    def expand(kind: str, tok: str):
        """token → (value, obj_kind, datatype) as a TERM."""
        if kind == "iri":
            return tok[1:-1], OBJ_IRI, ""
        if kind == "blank":
            return tok, OBJ_BLANK, ""
        if kind == "kw_a":
            return RDF_TYPE, OBJ_IRI, ""
        if kind == "pname":
            p, _, local = tok.partition(":")
            if p not in prefixes:
                raise ValueError(f"turtle: undefined prefix {p!r} in {tok!r}")
            return prefixes[p] + local, OBJ_IRI, ""
        if kind == "number":
            dt = XSD_DECIMAL if "." in tok else XSD_INTEGER
            return tok, OBJ_LITERAL, dt
        if kind == "boolean":
            return tok, OBJ_LITERAL, XSD_BOOLEAN
        raise ValueError(f"turtle: unexpected term {tok!r}")

    while i < n:
        kind, tok = toks[i]
        if kind == "prefix_kw":
            # @prefix name: <iri> .   (trailing '.' optional for PREFIX)
            if i + 2 >= n or toks[i + 1][0] != "pname" or toks[i + 2][0] != "iri":
                raise ValueError("turtle: malformed @prefix")
            pname = toks[i + 1][1]
            prefixes[pname[:-1] if pname.endswith(":") else pname.split(":")[0]] = toks[
                i + 2
            ][1][1:-1]
            i += 3
            if i < n and toks[i] == ("punct", "."):
                i += 1
            continue

        # subject
        subj, subj_kind, _ = expand(kind, tok)
        if subj_kind == OBJ_LITERAL:
            raise ValueError("turtle: literal subject")
        i += 1
        while True:  # predicate list
            if i >= n:
                raise ValueError("turtle: unexpected EOF in statement")
            pkind, ptok = toks[i]
            pred, pk, _ = expand(pkind, ptok)
            if pk != OBJ_IRI:
                raise ValueError(f"turtle: predicate must be IRI, got {ptok!r}")
            i += 1
            while True:  # object list
                okind, otok = toks[i]
                if okind == "literal":
                    value = unescape_literal(otok[1:-1])
                    dt, lang = XSD_STRING, ""
                    if i + 1 < n and toks[i + 1][0] == "langtag":
                        lang, dt = toks[i + 1][1][1:], LANGSTRING
                        i += 1
                    elif i + 1 < n and toks[i + 1][0] == "dtmark":
                        dkind, dtok = toks[i + 2]
                        dt = expand(dkind, dtok)[0]
                        i += 2
                    rows.append((subj, pred, value, OBJ_LITERAL, dt, lang, seq))
                else:
                    value, vkind, vdt = expand(okind, otok)
                    rows.append((subj, pred, value, vkind, vdt, "", seq))
                seq += 1
                i += 1
                if i < n and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < n and toks[i] == ("punct", ";"):
                i += 1
                # tolerate trailing ';' before '.'
                if i < n and toks[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if i < n and toks[i] == ("punct", "."):
                i += 1
            break

    return pa.Table.from_pydict(
        {
            "subj": [r[0] for r in rows],
            "pred": [r[1] for r in rows],
            "obj": [r[2] for r in rows],
            "obj_is_iri": [r[3] == OBJ_IRI for r in rows],
            "obj_kind": [r[3] for r in rows],
            "obj_datatype": [r[4] for r in rows],
            "obj_lang": [r[5] for r in rows],
            "seq": [r[6] for r in rows],
            "src": [src for _ in rows],
        },
        schema=TRIPLES_SCHEMA,
    )


def read_turtle(paths: str | list[str]):
    """Read Turtle file(s) into a triples Dataset; one task per file.
    Files that fail to parse are dead-lettered (empty output + counted
    via the returned dataset's ``src`` coverage), not fatal."""
    import ray.data as rd

    if isinstance(paths, str):
        import os

        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f)
                for f in os.listdir(paths)
                if f.endswith((".ttl", ".turtle"))
            )
        else:
            paths = [paths]
    file_idx = {p: i for i, p in enumerate(sorted(paths))}

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            base = file_idx.get(path, 0)
            if path not in file_idx:
                for p, idx in file_idx.items():
                    if path.endswith(p) or p.endswith(path):
                        base = idx
                        break
            try:
                tables.append(
                    parse_turtle(
                        data.decode("utf-8"),
                        src=path,
                        seq_base=base * _FILE_SEQ_STRIDE,
                    )
                )
            except (ValueError, UnicodeDecodeError):
                continue  # dead-letter the whole file
        if not tables:
            return TRIPLES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse_file, batch_format="pyarrow", batch_size=None)

"""N-Triples source/sink ↔ the canonical triples table.

Replaces the reference's streaming Turtle reader
(/root/reference/components/ttlfilereader.go:16-64) with a per-file
parallel, vectorized line parser: each input file is one Ray task
(`read_binary_files`), lines are split and regex-parsed per batch with
pandas' C regex engine (one line = one statement, the property that
makes the parse embarrassingly parallel — the reference's latent
line-oriented path, filereader.go + tripleparser.go, has the same
contract).

Ordering: the reference relies on input-file statement order
(tripleaggregator.go:25). We encode it in the ``seq`` column:
``seq = file_index * 2^40 + line_number`` with ``file_index`` taken
from the sorted path list, so within-subject order is reproducible at
any parallelism. Parse errors become dead-letter rows (``subj == ""``
filtered out, counted) instead of the reference's ``log.Fatal``
(ttlfilereader.go:56-61).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from rdf2smw_ray.schemas import OBJ_BLANK, OBJ_IRI, OBJ_LITERAL, TRIPLES_SCHEMA

# One statement per line:  <s>|_:b  <p>  (<o> | _:b | "lit"[^^<dt>|@lang])  .
_LINE_RE = re.compile(
    r'^\s*(?:<(?P<subj_iri>[^>]*)>|(?P<subj_blank>_:\S+))'
    r'\s+<(?P<pred>[^>]*)>\s+'
    r'(?:<(?P<obj_iri>[^>]*)>|(?P<obj_blank>_:\S+)|'
    r'"(?P<lit>(?:[^"\\]|\\.)*)"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9\-]+))?)'
    r'\s*\.\s*$'
)

_UNESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")


def unescape_literal(s: str) -> str:
    """Decode N-Triples string escapes (\\t \\n \\" \\\\ \\uXXXX \\UXXXXXXXX)."""
    def sub(m: re.Match) -> str:
        g = m.group(1)
        if g[0] in "uU":
            return chr(int(g[1:], 16))
        return _UNESCAPES.get(g, g)

    return _ESC_RE.sub(sub, s)


def escape_literal(s: str) -> str:
    """Inverse of :func:`unescape_literal` for the writer."""
    return (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )


def parse_ntriples_lines(
    lines: pd.Series, seq_base: int = 0, src: str = "", dead_letters: list | None = None
) -> pa.Table:
    """Parse a Series of N-Triples lines into a TRIPLES_SCHEMA table.

    Blank and comment lines are skipped; malformed statements are
    dropped (dead-letter) rather than raising (the reference
    ``log.Fatal``s — ttlfilereader.go:56-61). Pass ``dead_letters`` (a
    list) to collect the rejected ``(line_no, line)`` pairs.
    """
    lines = lines[lines.str.strip().str.len() > 0]
    lines = lines[~lines.str.lstrip().str.startswith("#")]
    if len(lines) == 0:
        return TRIPLES_SCHEMA.empty_table()
    seqs = seq_base + lines.index.to_numpy(dtype=np.int64)
    ext = lines.str.extract(_LINE_RE)
    ok = ext["pred"].notna()
    if dead_letters is not None and (~ok).any():
        for line_no, line in lines[~ok].items():
            dead_letters.append((int(line_no), line))
    ext = ext[ok]
    seqs = seqs[ok.to_numpy()]

    ext = ext.astype(object)  # keep object dtype through fillna chains
    with pd.option_context("future.no_silent_downcasting", True):
        subj = ext["subj_iri"].fillna(ext["subj_blank"]).fillna("")
        pred = ext["pred"].fillna("")
        is_iri = ext["obj_iri"].notna()
        is_blank = ext["obj_blank"].notna()
        lit = ext["lit"]

        obj = ext["obj_iri"].fillna(ext["obj_blank"])
        lit_vals = lit.copy()
        needs_unescape = lit_vals.notna() & lit_vals.str.contains("\\", regex=False)
        if needs_unescape.any():
            lit_vals[needs_unescape] = lit_vals[needs_unescape].map(unescape_literal)
        obj = obj.fillna(lit_vals).fillna("")

    # Datatype: explicit ^^<dt> wins; bare "..." is xsd:string; "..."@lang
    # is rdf:langString (knakk/rdf's behavior mirrored by the reference's
    # datatype switch, triplestowikipageconv.go:120-132).
    with pd.option_context("future.no_silent_downcasting", True):
        lang = ext["lang"].fillna("")
        dt = ext["dt"].copy()
        bare = lit.notna() & dt.isna() & (lang == "")
        dt[bare] = "http://www.w3.org/2001/XMLSchema#string"
        tagged = lit.notna() & dt.isna() & (lang != "")
        dt[tagged] = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
        dt = dt.fillna("")

    kind = np.where(is_iri, OBJ_IRI, np.where(is_blank, OBJ_BLANK, OBJ_LITERAL))
    return pa.Table.from_pydict(
        {
            "subj": subj.to_numpy(dtype=object),
            "pred": pred.to_numpy(dtype=object),
            "obj": obj.to_numpy(dtype=object),
            "obj_is_iri": is_iri.to_numpy(),
            "obj_kind": kind,
            "obj_datatype": dt.to_numpy(dtype=object),
            "obj_lang": lang.to_numpy(dtype=object),
            "seq": seqs,
            "src": np.full(len(subj), src, dtype=object),
        },
        schema=TRIPLES_SCHEMA,
    )


_FILE_SEQ_STRIDE = 1 << 40


def resolve_seq_base(path: str, file_idx: dict) -> int:
    """File-index lookup robust to Ray's path normalization
    (``read_binary_files`` may hand back absolutized / scheme-prefixed
    paths): exact hit first, then suffix match either way. Shared by
    every file reader so none silently collides all files onto
    seq_base 0 (ADVICE round 2)."""
    base = file_idx.get(path)
    if base is not None:
        return base
    for p, i in file_idx.items():
        if path.endswith(p) or p.endswith(path):
            return i
    return 0


def read_ntriples(paths: str | list[str]):
    """Read N-Triples file(s) into a triples Dataset (TRIPLES_SCHEMA).

    One Ray read task per file; ``seq`` encodes (file index, line no)
    so global statement order is deterministic at any parallelism.
    """
    import ray.data as rd

    if isinstance(paths, str):
        import os

        if os.path.isdir(paths):
            paths = sorted(
                os.path.join(paths, f) for f in os.listdir(paths) if f.endswith(".nt")
            )
        else:
            paths = [paths]
    file_idx = {p: i for i, p in enumerate(sorted(paths))}

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            text = data.decode("utf-8")
            lines = pd.Series(text.split("\n"))
            base = resolve_seq_base(path, file_idx)
            tables.append(
                parse_ntriples_lines(lines, seq_base=base * _FILE_SEQ_STRIDE, src=path)
            )
        if not tables:
            return TRIPLES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse_file, batch_format="pyarrow", batch_size=None)


def read_ntriples_audited(paths: str | list[str]):
    """Like :func:`read_ntriples` but keeps dead-letter rows in-band:
    the returned Dataset has an extra ``error_line`` column — "" for
    parsed statements, the raw rejected line otherwise (with
    ``subj == ""``). Split with :func:`split_dead_letters`. This is
    the poison-row audit trail the reference lacks (it log.Fatals)."""
    import os

    import ray.data as rd

    if isinstance(paths, str):
        paths = (
            sorted(
                os.path.join(paths, f) for f in os.listdir(paths) if f.endswith(".nt")
            )
            if os.path.isdir(paths)
            else [paths]
        )
    file_idx = {p: i for i, p in enumerate(sorted(paths))}

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            base = resolve_seq_base(path, file_idx)
            dead: list = []
            good = parse_ntriples_lines(
                pd.Series(data.decode("utf-8").split("\n")),
                seq_base=base * _FILE_SEQ_STRIDE,
                src=path,
                dead_letters=dead,
            )
            good = good.append_column(
                "error_line", pa.array([""] * good.num_rows, pa.string())
            )
            if dead:
                err = TRIPLES_SCHEMA.empty_table().to_pydict()
                for line_no, line in dead:
                    for k in err:
                        err[k].append(
                            {
                                "subj": "",
                                "pred": "",
                                "obj": "",
                                "obj_is_iri": False,
                                "obj_kind": "error",
                                "obj_datatype": "",
                                "obj_lang": "",
                                "seq": base * _FILE_SEQ_STRIDE + line_no,
                                "src": path,
                            }[k]
                        )
                errs = pa.Table.from_pydict(err, schema=TRIPLES_SCHEMA).append_column(
                    "error_line", pa.array([d[1] for d in dead], pa.string())
                )
                good = pa.concat_tables([good, errs])
            tables.append(good)
        if not tables:
            t = TRIPLES_SCHEMA.empty_table()
            return t.append_column("error_line", pa.array([], pa.string()))
        return pa.concat_tables(tables)

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(parse_file, batch_format="pyarrow", batch_size=None)


def split_dead_letters(audited_ds):
    """audited Dataset → (clean triples Dataset, dead-letter Dataset)."""
    import pyarrow.compute as pc

    clean = audited_ds.map_batches(
        lambda t: t.filter(pc.equal(t["error_line"], "")).drop_columns(["error_line"]),
        batch_format="pyarrow",
    )
    errors = audited_ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["error_line"], "")).select(
            ["src", "seq", "error_line"]
        ),
        batch_format="pyarrow",
    )
    return clean, errors


def read_ntriples_lines(paths: str | list[str]):
    """Line-oriented alternative front-end (the reference's latent
    FileReader → TripleParser path, filereader.go:18-63 +
    tripleparser.go:11-38): ``ray.data.read_text`` → per-batch line
    parse. Line order (and therefore ``seq``) follows Ray's text
    reader, so use :func:`read_ntriples` when cross-file statement
    order must be reproducible."""
    import ray.data as rd

    counter = {"base": 0}

    def parse(batch: pa.Table) -> pa.Table:
        lines = pd.Series(batch["text"].to_pylist(), dtype=object)
        base = counter["base"]
        counter["base"] += len(lines)
        return parse_ntriples_lines(lines, seq_base=base)

    return rd.read_text(paths).map_batches(parse, batch_format="pyarrow")


def triples_to_ntriples(table: pa.Table) -> str:
    """Serialize a TRIPLES_SCHEMA table to N-Triples text (seq order).

    Driver-side helper for tests / fixture round-trips.
    """
    df = table.to_pandas().sort_values("seq")
    out = []
    for r in df.itertuples():
        s = f"_:{r.subj[2:]}" if r.subj.startswith("_:") else f"<{r.subj}>"
        if r.subj.startswith("_:"):
            s = r.subj
        if r.obj_kind == OBJ_IRI:
            o = f"<{r.obj}>"
        elif r.obj_kind == OBJ_BLANK:
            o = r.obj
        else:
            o = f'"{escape_literal(r.obj)}"'
            if r.obj_lang:
                o += f"@{r.obj_lang}"
            elif r.obj_datatype and r.obj_datatype != "http://www.w3.org/2001/XMLSchema#string":
                o += f"^^<{r.obj_datatype}>"
        out.append(f"{s} <{r.pred}> {o} .")
    return "\n".join(out) + "\n"

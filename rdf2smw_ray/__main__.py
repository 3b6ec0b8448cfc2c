"""CLI — drop-in replacement for the reference tool's command line.

The reference (/root/reference/main.go:38-56,102-109):

    rdf2smw -in input.nt -out output.xml

producing ``output.xml`` (pages), ``output_properties.xml`` and
``output_templates.xml`` (same ``.xml → _suffix.xml`` naming). This
CLI accepts the same flags (plus Ray/scale knobs) and writes the same
three files::

    python -m rdf2smw_ray -in input.nt -out output.xml
    python -m rdf2smw_ray -in pages_dir/ -out out.xml --from web-pages
    python -m rdf2smw_ray -in input.nt -out out.xml --checkpoint-dir ck/

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="rdf2smw_ray",
        description="Ray-Data-native RDF/web-page → Semantic MediaWiki XML converter",
    )
    ap.add_argument("-in", dest="infile", required=True, help="input file/dir (.nt, .ttl, or parquet web pages)")
    ap.add_argument("-out", dest="outfile", required=True, help="output XML file name (pages)")
    ap.add_argument(
        "--from",
        dest="source_kind",
        choices=["auto", "ntriples", "turtle", "web-pages"],
        default="auto",
        help="input kind (auto: by extension)",
    )
    ap.add_argument("--no-templates", action="store_true", help="bare [[P::V]] facts instead of template calls")
    ap.add_argument("--timestamp", default="2015-01-01T00:00:00Z", help="revision timestamp written into the XML")
    ap.add_argument("--num-cpus", type=int, default=None, help="ray.init num_cpus (default: all)")
    ap.add_argument("--checkpoint-dir", default=None, help="run resumable with manifests under this dir (web-pages input)")
    ap.add_argument("--parquet-out", default=None, help="also write pages/properties/templates parquet under this dir")
    args = ap.parse_args(argv)

    if not os.path.exists(args.infile):
        print(f"input not found: {args.infile}", file=sys.stderr)
        return 1

    kind = args.source_kind
    if kind == "auto":
        low = args.infile.lower()
        if low.endswith((".ttl", ".turtle")):
            kind = "turtle"
        elif low.endswith((".nt", ".ntriples")):
            kind = "ntriples"
        else:
            kind = "web-pages"

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            **({"num_cpus": args.num_cpus} if args.num_cpus else {}),
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        import ray.data as rd

        from rdf2smw_ray.pipelines.rdf2smw import rdf2smw_pipeline
        from rdf2smw_ray.state.checkpoint import write_xml_dump

        use_templates = not args.no_templates

        if kind == "web-pages" and args.checkpoint_dir:
            from rdf2smw_ray.pipelines.checkpointed import run_kg_checkpointed

            paths = (
                sorted(
                    os.path.join(args.infile, f)
                    for f in os.listdir(args.infile)
                    if f.endswith(".parquet")
                )
                if os.path.isdir(args.infile)
                else [args.infile]
            )
            res = run_kg_checkpointed(
                paths,
                args.checkpoint_dir,
                use_templates=use_templates,
                timestamp=args.timestamp,
            )
            streams = {
                "pages": rd.read_parquet(res["pages_dir"]),
                "properties": rd.read_parquet(res["properties_dir"]),
                "templates": rd.read_parquet(res["templates_dir"]),
            }
        else:
            if kind == "ntriples":
                from rdf2smw_ray.sources.ntriples import read_ntriples

                triples = read_ntriples(args.infile)
            elif kind == "turtle":
                from rdf2smw_ray.sources.turtle import read_turtle

                triples = read_turtle(args.infile)
            else:
                from rdf2smw_ray.pipelines.kg import kg_pipeline
                from rdf2smw_ray.stages.extract_text import extract_text
                from rdf2smw_ray.stages.extract_triples import extract_triples

                pages_ds = rd.read_parquet(args.infile)
                triples = extract_triples(extract_text(pages_ds)).materialize()
            out = rdf2smw_pipeline(
                triples, use_templates=use_templates, timestamp=args.timestamp
            )
            streams = {
                "pages": out["content"],
                "properties": out["properties"],
                "templates": out["templates"],
            }

        # reference naming: out.xml / out_properties.xml / out_templates.xml
        # (suffix only the FINAL extension — the reference replaces the
        # first ".xml", which mangles paths like dumps.xml/out.xml;
        # splitext touches only the basename's extension)
        base, ext = os.path.splitext(args.outfile)
        names = {
            "pages": args.outfile,
            "properties": f"{base}_properties{ext}",
            "templates": f"{base}_templates{ext}",
        }
        from rdf2smw_ray.stages.render import render_pages

        for key, ds in streams.items():
            rendered = ds
            schema = rendered.schema()  # None for empty datasets
            if "xml" not in (schema.names if schema is not None else []):
                rendered = render_pages(
                    ds, use_templates=use_templates, timestamp=args.timestamp
                )
            n = write_xml_dump(rendered, names[key])
            print(f"wrote {names[key]} ({n} pages)")
            if args.parquet_out:
                rendered.write_parquet(os.path.join(args.parquet_out, key))
        return 0
    finally:
        if owns_session:  # never tear down a caller-owned session
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

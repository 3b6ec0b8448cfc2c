"""CLI smoke tests (in-process main(); the session fixture owns Ray)."""

import os

import pytest


def test_cli_missing_input(tmp_path, capsys):
    from rdf2smw_ray.__main__ import main

    rc = main(["-in", str(tmp_path / "nope.nt"), "-out", str(tmp_path / "o.xml")])
    assert rc == 1
    assert "input not found" in capsys.readouterr().err


def test_cli_ntriples_to_xml(tmp_path):
    from rdf2smw_ray.__main__ import main

    nt = tmp_path / "in.nt"
    nt.write_text(
        '<http://e/a> <http://www.w3.org/2000/01/rdf-schema#label> "A Label" .\n'
        "<http://e/a> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://e/T> .\n"
    )
    out = tmp_path / "out.xml"
    rc = main(["-in", str(nt), "-out", str(out)])
    assert rc == 0
    text = out.read_text()
    assert text.startswith("<mediawiki>\n")
    assert "<title>A Label</title>" in text
    # reference-style derived names
    assert (tmp_path / "out_properties.xml").exists()
    assert (tmp_path / "out_templates.xml").exists()


def test_cli_parquet_out(tmp_path):
    import ray.data as rd

    from rdf2smw_ray.__main__ import main

    nt = tmp_path / "in.nt"
    nt.write_text('<http://e/a> <http://e/p> "v" .\n')
    rc = main(
        [
            "-in", str(nt),
            "-out", str(tmp_path / "o.xml"),
            "--parquet-out", str(tmp_path / "pq"),
        ]
    )
    assert rc == 0
    pages = rd.read_parquet(str(tmp_path / "pq" / "pages")).to_pandas()
    assert len(pages) == 1 and "xml" in pages.columns

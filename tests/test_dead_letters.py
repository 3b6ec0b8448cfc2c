"""Dead-letter audit trail + verified MinHash dedup."""

import pyarrow as pa
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.dedup import minhash_dedup
from rdf2smw_ray.sources.ntriples import read_ntriples_audited, split_dead_letters


def test_audited_read_splits_errors(tmp_path):
    p = tmp_path / "in.nt"
    p.write_text(
        '<http://a> <http://p> "ok" .\n'
        "THIS IS BROKEN\n"
        "<http://b> <http://p> <http://c> .\n"
        "also broken\n"
    )
    audited = read_ntriples_audited(str(p))
    clean, errors = split_dead_letters(audited)
    cdf = clean.to_pandas()
    edf = errors.to_pandas()
    assert len(cdf) == 2 and "error_line" not in cdf.columns
    assert len(edf) == 2
    assert set(edf["error_line"]) == {"THIS IS BROKEN", "also broken"}
    # error rows carry provenance (src + line-derived seq)
    assert (edf["src"] == str(p)).all()


def test_minhash_verified_dedup():
    base = "the quick brown fox jumps over the lazy dog and then naps quietly nearby "
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    base * 4,
                    base * 4 + "slight tail change",  # near-dup of 0
                    "entirely different content about distributed dataflow engines " * 4,
                    base * 4,  # exact dup of 0
                ],
            }
        )
    )
    verified = minhash_dedup(docs, verify_threshold=0.5, concurrency=2).to_pandas()
    pairs = {
        (int(r["doc_id"]), int(r[[c for c in verified.columns if "dup_of" in c][0]]))
        for _, r in verified.iterrows()
    }
    assert (3, 0) in pairs  # exact dup survives verification
    assert all(a != 2 and b != 2 for a, b in pairs)  # unrelated doc untouched

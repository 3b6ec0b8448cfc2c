"""Resume-from-checkpoint: crash mid-run → rerun skips completed
shards and the final outputs equal an uninterrupted run's."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rdf2smw_ray.pipelines.checkpointed import run_kg_checkpointed
from rdf2smw_ray.sources.webpages import synth_batch


def _make_shards(tmp_path, n_shards=4, docs_per_shard=10):
    paths = []
    for s in range(n_shards):
        ids = list(range(s * docs_per_shard, (s + 1) * docs_per_shard))
        docs = pa.table(
            {
                "doc_id": ids,
                "text": [f"boiler {i}" for i in ids],
                "lang": ["en"] * len(ids),
            }
        )
        pages = synth_batch(docs)
        p = str(tmp_path / f"web_pages_{s:03d}.parquet")
        pq.write_table(pages, p)
        paths.append(p)
    return paths


def _pages_frame(pages_dir):
    df = rd.read_parquet(pages_dir).to_pandas()
    df["facts"] = df["facts"].map(
        lambda fs: tuple((f["property"], f["value"]) for f in fs)
    )
    df["categories"] = df["categories"].map(tuple)
    return df.sort_values("title").reset_index(drop=True)


def test_crash_resume_identical_output(tmp_path):
    shards = _make_shards(tmp_path)

    # uninterrupted reference run
    ref_out = str(tmp_path / "ref")
    ref = run_kg_checkpointed(shards, ref_out, concurrency=2)

    # crashing run: fails after 2 shards
    crash_out = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected failure"):
        run_kg_checkpointed(shards, crash_out, concurrency=2, fail_after_shards=2)

    manifests = [
        f
        for f in os.listdir(os.path.join(crash_out, "triples"))
        if f.endswith(".manifest.json")
    ]
    assert len(manifests) == 2  # two shards completed before the crash
    for m in manifests:
        payload = json.load(open(os.path.join(crash_out, "triples", m)))
        assert payload["status"] == "done"
        assert payload["rows_out"] > 0
        assert "fingerprint" in payload

    # resume: completed shards skipped, the rest processed
    res = run_kg_checkpointed(shards, crash_out, concurrency=2)
    assert res["shards"] == {"processed": 2, "skipped": 2}

    ref_pages = _pages_frame(ref["pages_dir"])
    res_pages = _pages_frame(res["pages_dir"])
    assert ref_pages[["title", "page_type", "facts", "categories"]].equals(
        res_pages[["title", "page_type", "facts", "categories"]]
    )


def test_second_run_skips_everything(tmp_path):
    shards = _make_shards(tmp_path, n_shards=2, docs_per_shard=5)
    out = str(tmp_path / "out")
    run_kg_checkpointed(shards, out, concurrency=2)
    res2 = run_kg_checkpointed(shards, out, concurrency=2)
    assert res2["shards"] == {"processed": 0, "skipped": 2}


def test_incremental_new_shard(tmp_path):
    """Adding a new input shard to a completed run reprocesses ONLY the
    new shard (front half) and refreshes the global back half."""
    shards = _make_shards(tmp_path, n_shards=3, docs_per_shard=8)
    out = str(tmp_path / "out")
    run_kg_checkpointed(shards[:2], out, concurrency=2)
    n_before = len(_pages_frame(os.path.join(out, "stages", "pages")))
    # new shards auto-invalidate the global stages
    res = run_kg_checkpointed(shards, out, concurrency=2)
    assert res["shards"] == {"processed": 1, "skipped": 2}
    n_after = len(_pages_frame(os.path.join(out, "stages", "pages")))
    assert n_after >= n_before


def test_no_templates_checkpointed(tmp_path):
    """use_templates=False writes an empty-but-readable templates stage."""
    import ray.data as rd

    shards = _make_shards(tmp_path, n_shards=1, docs_per_shard=5)
    out = str(tmp_path / "out")
    res = run_kg_checkpointed(shards, out, concurrency=2, use_templates=False)
    assert rd.read_parquet(res["templates_dir"]).count() == 0


def test_shard_ids_distinguish_directories(tmp_path):
    """Same basename in different directories must map to different
    shard manifests (ADVICE round-1)."""
    from rdf2smw_ray.state.checkpoint import ShardedRun

    a = tmp_path / "a" / "part-0.parquet"
    b = tmp_path / "b" / "part-0.parquet"
    assert ShardedRun.shard_id_for(str(a)) != ShardedRun.shard_id_for(str(b))


def test_timestamp_change_invalidates_stages(tmp_path):
    """A rerun with a different --timestamp must recompute the back
    half, not resume stale XML (ADVICE round-1)."""
    shards = _make_shards(tmp_path, n_shards=1, docs_per_shard=5)
    out = str(tmp_path / "out")
    run_kg_checkpointed(shards, out, concurrency=2, timestamp="2001-01-01T00:00:00Z")
    res = run_kg_checkpointed(
        shards, out, concurrency=2, timestamp="2002-02-02T00:00:00Z"
    )
    xml = rd.read_parquet(res["pages_dir"]).to_pandas()["xml"].iloc[0]
    assert "2002-02-02T00:00:00Z" in xml and "2001-01-01" not in xml
    # unchanged params resume without recompute
    res2 = run_kg_checkpointed(
        shards, out, concurrency=2, timestamp="2002-02-02T00:00:00Z"
    )
    assert res2["shards"] == {"processed": 0, "skipped": 1}


def test_stitch_ignores_stale_fragments(tmp_path):
    """stitch_xml_parts stitches only the parts of the LAST run's
    manifest — stale fragments from earlier batch boundaries must not
    duplicate pages (ADVICE round-1)."""
    from rdf2smw_ray.state.checkpoint import stitch_xml_parts, write_xml_parts

    parts_dir = str(tmp_path / "parts")
    os.makedirs(parts_dir)
    # stale fragment left behind by a hypothetical earlier run
    stale = os.path.join(parts_dir, "part-deadbeefdeadbeef.xmlfrag")
    open(stale, "w").write("<page><title>STALE</title></page>\n")

    ds = rd.from_arrow(
        pa.table({"xml": ["<page><title>A</title></page>\n", "<page><title>B</title></page>\n"]})
    )
    write_xml_parts(ds, parts_dir)
    out = str(tmp_path / "dump.xml")
    stitch_xml_parts(parts_dir, out)
    xml = open(out).read()
    assert "STALE" not in xml
    assert "<title>A</title>" in xml and "<title>B</title>" in xml


def test_xml_dump_framing(tmp_path):
    shards = _make_shards(tmp_path, n_shards=1, docs_per_shard=5)
    out = str(tmp_path / "out")
    run_kg_checkpointed(shards, out, concurrency=2, write_xml=True)
    xml = open(os.path.join(out, "pages.xml")).read()
    assert xml.startswith("<mediawiki>\n")
    assert xml.rstrip().endswith("</mediawiki>")
    assert "<page>" in xml and "<ns>0</ns>" in xml


def test_write_partitioned_layout_and_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from rdf2smw_ray.state.checkpoint import write_partitioned

    tbl = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "lang": pa.array([["en", "de", "fr"][i % 3] for i in range(30)], pa.string()),
            "text": pa.array([f"doc {i}" for i in range(30)], pa.string()),
        }
    )
    out = str(tmp_path / "by_lang")
    m = write_partitioned(rd.from_arrow(tbl).repartition(4), out, partition_cols=["lang"])
    assert m["rows"] == 30
    assert m["partitions"] == ["lang=de", "lang=en", "lang=fr"]
    back = (
        pads.dataset(out, partitioning="hive")
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(back) == 30
    assert (back["lang"].to_numpy() == tbl["lang"].to_numpy(zero_copy_only=False)).all()
    # partition pruning at the read: one directory, one language
    en = pads.dataset(out + "/lang=en").to_table()
    assert en.num_rows == 10

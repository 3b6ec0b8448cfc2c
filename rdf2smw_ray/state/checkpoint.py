"""Checkpoint manifests + resumable execution.

The reference has no checkpointing — any failure reruns from scratch
(SURVEY.md §4.1). Here every unit of work writes an atomic manifest
(JSON next to its output, written tmp→rename) recording input
fingerprint, row counters and status; a rerun skips completed units
and produces byte-identical remaining outputs (deterministic stages).

Two granularities:

- **shard** (``ShardedRun.process_shards``): the embarrassingly
  parallel front half (web-page shard → triples part). One manifest
  per input shard. At cluster scale, raise ``wave`` so several shards
  execute per Dataset run; resume granularity stays per shard because
  each shard writes its own part + manifest from inside the wave.
- **stage** (``StageCheckpoint.stage``): global stages (sidecar, fold,
  property pages). One manifest per stage; a completed stage is read
  back from its parquet instead of recomputed.

This doubles as the per-partition lineage/metrics record: manifests
carry rows_in/rows_out and the input fingerprint.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from collections.abc import Callable


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def file_fingerprint(path: str) -> str:
    """Cheap input fingerprint: (size, mtime-less content head hash)."""
    st = os.stat(path)
    h = hashlib.blake2b(digest_size=8)
    with open(path, "rb") as f:
        h.update(f.read(1 << 16))
    return f"{st.st_size}-{h.hexdigest()}"


class ShardedRun:
    """Per-input-shard resumable execution.

    ``process_fn(shard_path, shard_out_dir) -> dict`` must write its
    outputs under ``shard_out_dir`` and return counters for the
    manifest. A shard whose manifest matches its current input
    fingerprint is skipped on rerun.
    """

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _manifest_path(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, f"{shard_id}.manifest.json")

    def shard_dir(self, shard_id: str) -> str:
        return os.path.join(self.out_dir, shard_id)

    def is_done(self, shard_id: str, shard_path: str) -> bool:
        mp = self._manifest_path(shard_id)
        if not os.path.exists(mp):
            return False
        try:
            m = json.load(open(mp))
        except (json.JSONDecodeError, OSError):
            return False
        return m.get("status") == "done" and m.get("fingerprint") == file_fingerprint(
            shard_path
        )

    @staticmethod
    def shard_id_for(path: str) -> str:
        # full normalized path, not basename: two shards named
        # part-0.parquet in different directories must not collide on
        # one manifest (ADVICE round-1)
        return "shard-" + hashlib.blake2b(
            os.path.abspath(path).encode(), digest_size=6
        ).hexdigest()

    def _finalize_shard(
        self, shard_id: str, path: str, tmp_dir: str, counters: dict, t0: float
    ) -> None:
        sdir = self.shard_dir(shard_id)
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)
        os.replace(tmp_dir, sdir)
        _atomic_write_json(
            self._manifest_path(shard_id),
            {
                "status": "done",
                "input": path,
                "fingerprint": file_fingerprint(path),
                "wall_sec": round(time.monotonic() - t0, 3),
                **(counters or {}),
            },
        )

    def _prep_tmp(self, shard_id: str) -> str:
        tmp_dir = self.shard_dir(shard_id) + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
        return tmp_dir

    def process_shards(
        self,
        shard_paths: list[str],
        process_fn: Callable[[str, str], dict],
        *,
        ray_parallel: bool = False,
        max_in_flight: int | None = None,
    ) -> dict:
        """Run all pending shards; returns summary counters.

        ``ray_parallel=True``: each shard runs as ONE plain Ray task
        (``process_fn`` must be cluster-shippable and self-contained —
        typically pure pyarrow, no nested Dataset), with a sliding
        window of ``max_in_flight`` outstanding tasks. A sequential
        driver loop of per-shard Dataset executions pays seconds of
        fixed overhead per shard; task-per-shard is the scale shape
        for the embarrassingly parallel front half. Manifests are
        still written by the driver as each task completes, so resume
        granularity is unchanged.
        """
        pending: list[tuple[str, str]] = []
        skipped = 0
        for path in sorted(shard_paths):
            shard_id = self.shard_id_for(path)
            if self.is_done(shard_id, path):
                skipped += 1
            else:
                pending.append((shard_id, path))

        done = 0
        if not ray_parallel:
            for shard_id, path in pending:
                tmp_dir = self._prep_tmp(shard_id)
                t0 = time.monotonic()
                counters = process_fn(path, tmp_dir)
                self._finalize_shard(shard_id, path, tmp_dir, counters, t0)
                done += 1
            return {"processed": done, "skipped": skipped}

        import ray

        if max_in_flight is None:
            max_in_flight = int(ray.cluster_resources().get("CPU", 8)) * 2
        remote_fn = ray.remote(num_cpus=1)(process_fn)
        in_flight: dict = {}
        it = iter(pending)
        t_start: dict = {}

        def submit_next() -> bool:
            try:
                shard_id, path = next(it)
            except StopIteration:
                return False
            tmp_dir = self._prep_tmp(shard_id)
            ref = remote_fn.remote(path, tmp_dir)
            in_flight[ref] = (shard_id, path, tmp_dir)
            t_start[ref] = time.monotonic()
            return True

        while len(in_flight) < max_in_flight and submit_next():
            pass
        while in_flight:
            ready, _ = ray.wait(list(in_flight), num_returns=1)
            ref = ready[0]
            shard_id, path, tmp_dir = in_flight.pop(ref)
            counters = ray.get(ref)
            self._finalize_shard(shard_id, path, tmp_dir, counters, t_start.pop(ref))
            done += 1
            submit_next()
        return {"processed": done, "skipped": skipped}

    def completed_output_dirs(self) -> list[str]:
        out = []
        for f in sorted(os.listdir(self.out_dir)):
            if f.endswith(".manifest.json"):
                try:
                    m = json.load(open(os.path.join(self.out_dir, f)))
                except (json.JSONDecodeError, OSError):
                    continue
                if m.get("status") == "done":
                    out.append(os.path.join(self.out_dir, f[: -len(".manifest.json")]))
        return out


class StageCheckpoint:
    """Driver-level stage checkpoints: ``stage(name, fn)`` runs ``fn``
    (which must write its outputs under the returned dir) only when no
    valid manifest exists."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def is_done(self, name: str, params: dict | None = None) -> bool:
        mp = os.path.join(self.out_dir, f"{name}.manifest.json")
        try:
            m = json.load(open(mp))
        except (OSError, json.JSONDecodeError):
            return False
        if m.get("status") != "done":
            return False
        # a stage cached under different parameters (e.g. --timestamp)
        # is stale (ADVICE round-1)
        return params is None or m.get("params", {}) == params

    def invalidate(self, name: str) -> None:
        mp = os.path.join(self.out_dir, f"{name}.manifest.json")
        if os.path.exists(mp):
            os.remove(mp)

    def stage(
        self, name: str, fn: Callable[[str], dict], *, params: dict | None = None
    ) -> tuple[str, bool]:
        """Returns (stage_output_dir, was_skipped). ``params`` are
        recorded in the manifest; a rerun with different params
        recomputes instead of resuming."""
        mp = os.path.join(self.out_dir, f"{name}.manifest.json")
        sdir = self.stage_dir(name)
        if self.is_done(name, params):
            return sdir, True
        tmp_dir = sdir + ".tmp"
        if os.path.exists(tmp_dir):
            import shutil

            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir, exist_ok=True)
        t0 = time.monotonic()
        counters = fn(tmp_dir)
        if os.path.exists(sdir):
            import shutil

            shutil.rmtree(sdir)
        os.replace(tmp_dir, sdir)
        _atomic_write_json(
            mp,
            {
                "status": "done",
                "wall_sec": round(time.monotonic() - t0, 3),
                **({"params": params} if params is not None else {}),
                **(counters or {}),
            },
        )
        return sdir, False


def write_xml_parts(rendered_ds, out_dir: str) -> dict:
    """Scale path for the XML dump: every batch writes its own
    ``part-*.xmlfrag`` (page elements only, no framing) plus a
    manifest entry; page order across parts is not semantically
    meaningful to MediaWiki import (only the framing is —
    mwxmlcreator.go:59-60). ``stitch_xml_parts`` produces the final
    framed file when a single file is actually needed."""
    import hashlib
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_part(batch):
        import pyarrow as pa

        xml = "".join(batch["xml"].to_pylist())
        frag_id = hashlib.blake2b(xml.encode(), digest_size=8).hexdigest()
        path = os.path.join(out_dir, f"part-{frag_id}.xmlfrag")
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(xml)
        os.replace(tmp, path)
        _atomic_write_json(
            path + ".manifest.json",
            {"status": "done", "pages": batch.num_rows, "bytes": len(xml)},
        )
        return pa.table({"part": [path], "pages": [batch.num_rows]})

    parts = rendered_ds.select_columns(["xml"]).map_batches(
        write_part, batch_format="pyarrow", batch_size=4096
    )
    pdf = parts.to_pandas()
    if "part" not in pdf.columns:
        _atomic_write_json(
            os.path.join(out_dir, "_run.manifest.json"),
            {"status": "done", "parts": [], "pages": 0},
        )
        return {"parts": 0, "pages": 0}
    # run-level manifest: the authoritative part set for THIS run.
    # Part names are content hashes, so a rerun with different batch
    # boundaries can leave stale fragments behind — stitch_xml_parts
    # stitches only the manifest's parts (ADVICE round-1).
    part_names = sorted(os.path.basename(p) for p in pdf["part"])
    _atomic_write_json(
        os.path.join(out_dir, "_run.manifest.json"),
        {"status": "done", "parts": part_names, "pages": int(pdf["pages"].sum())},
    )
    return {"parts": len(pdf), "pages": int(pdf["pages"].sum())}


def stitch_xml_parts(parts_dir: str, out_path: str) -> int:
    """Concatenate completed part fragments into one framed dump.

    Stitches exactly the parts recorded in the last run's
    ``_run.manifest.json`` (stale fragments from earlier runs with
    different batch boundaries are ignored); falls back to every
    ``*.xmlfrag`` only when no run manifest exists."""
    run_mp = os.path.join(parts_dir, "_run.manifest.json")
    try:
        names = json.load(open(run_mp))["parts"]
    except (OSError, json.JSONDecodeError, KeyError):
        names = sorted(f for f in os.listdir(parts_dir) if f.endswith(".xmlfrag"))
    n = 0
    with open(out_path, "w") as out:
        out.write("<mediawiki>\n")
        for f in names:
            with open(os.path.join(parts_dir, f)) as frag:
                out.write(frag.read())
            n += 1
        out.write("</mediawiki>\n")
    return n


def write_xml_dump(rendered_ds, out_path: str, *, stitch: bool = True) -> int:
    """MediaWiki XML dump sink: streams the ``xml`` column into
    ``out_path`` with the reference's ``<mediawiki>`` header/footer
    framing (mwxmlcreator.go:59-60,137-140,157). ``stitch=True``
    produces one file by streaming batches on the driver (page order
    is not semantically meaningful to MediaWiki import — only the
    framing is); at very large scale write per-partition parts via
    ``write_parquet`` instead and stitch lazily."""
    n = 0
    with open(out_path, "w") as f:
        f.write("<mediawiki>\n")
        for batch in rendered_ds.select_columns(["xml"]).iter_batches(
            batch_size=1024, batch_format="pyarrow"
        ):
            for x in batch["xml"].to_pylist():
                f.write(x)
                n += 1
        f.write("</mediawiki>\n")
    return n


def write_partitioned(ds, out_dir: str, *, partition_cols: list[str]) -> dict:
    """Hive-partitioned parquet sink: one ``col=value/`` directory per
    key — the resumable-output layout the 100-TB plan calls for (a
    restarted run lists the finished partitions and skips them; a
    consumer prunes partitions at the read). Writes to a temp dir and
    promotes atomically (the same crash-safety contract as the XML
    parts sink), then records a manifest of partition directories."""
    import shutil

    import pyarrow.dataset as pads

    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp, partition_cols=partition_cols)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    # derive partitions from the dataset's FILES so nested hive
    # layouts (len(partition_cols) > 1) list every leaf partition —
    # a top-level listdir would record only the first level, breaking
    # the resume-skip contract for multi-column layouts
    hive = pads.dataset(out_dir, partitioning="hive")
    parts = sorted(
        {
            os.path.relpath(os.path.dirname(f), out_dir)
            for f in hive.files
            if "=" in os.path.relpath(os.path.dirname(f), out_dir)
        }
    )
    manifest = {
        "partition_cols": partition_cols,
        "partitions": parts,
        "rows": hive.count_rows(),
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, sort_keys=True)
    return manifest

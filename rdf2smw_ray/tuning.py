"""Scale tuning — one place for the Ray Data knobs this engine relies
on, with the reasoning recorded (BASELINE.md "key engineering facts").

Call ``configure_context()`` once per session (CLI and bench do);
defaults suit a single fat node. At cluster scale, size
``target_max_block_size`` and stage batch sizes so
``batch × max-concurrent-tasks`` fits each worker's heap, and keep
wide binary stages (html, media payloads) on small batches.
"""

from __future__ import annotations

import math
import os


def configure_context(
    *,
    target_max_block_size_mb: int = 128,
    preserve_order: bool = False,
    progress_bars: bool = False,
) -> None:
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = target_max_block_size_mb * 1024 * 1024
    ctx.execution_options.preserve_order = preserve_order
    ctx.enable_progress_bars = progress_bars


def _default_min_buckets() -> int:
    # 2x the CPU count: reduce tasks run in ≥2 waves, which load-
    # balances skewed buckets without meaningful fixed overhead
    try:
        import ray

        if ray.is_initialized():
            return max(2, 2 * int(ray.cluster_resources().get("CPU", 1)))
    except Exception:
        pass
    return max(2, 2 * (os.cpu_count() or 1))


# Parquet is compressed; a file byte typically inflates ~4x in Arrow
# memory. target_bucket_bytes is therefore stated in FILE bytes so
# callers can stat inputs cheaply (a 32 MB file bucket ≈ 128 MB frame).
def auto_buckets(
    est_input_bytes: int,
    *,
    target_bucket_bytes: int = 32 << 20,
    min_buckets: int | None = None,
    max_buckets: int = 4096,
) -> int:
    """Shuffle width from estimated input size — replaces the fixed
    bucket constants flagged in round 1: each reduce task materializes
    one bucket as a pandas frame, so width must grow with input or the
    100x run needs hand-tuning. Floor = cluster CPU count (full
    parallelism even on small inputs), cap = 4096 (beyond that,
    per-bucket fixed overhead dominates)."""
    if min_buckets is None:
        min_buckets = _default_min_buckets()
    want = math.ceil(max(0, est_input_bytes) / target_bucket_bytes)
    return int(min(max_buckets, max(min_buckets, want)))


def input_bytes(*paths: str) -> int:
    """Total on-disk bytes of files / directories (parquet shards) —
    the cheap input-size estimate feeding ``auto_buckets``."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    try:
                        total += os.stat(os.path.join(root, f)).st_size
                    except OSError:
                        pass
        else:
            try:
                total += os.stat(p).st_size
            except OSError:
                pass
    return total


def dataset_est_bytes(ds) -> int:
    """Best-effort size estimate for a Dataset WITHOUT executing it:
    sum of its input files (lazy plans report their read source).
    Returns 0 when unknown — ``auto_buckets`` then floors at the CPU
    count, which is the right width for in-memory test inputs.
    (Deliberately does not fall back to ``size_bytes()``: that can
    trigger execution of a lazy plan.)"""
    try:
        files = ds.input_files()
        if files:
            return input_bytes(*files)
    except Exception:
        pass
    try:
        from ray.data.dataset import MaterializedDataset

        if isinstance(ds, MaterializedDataset):
            # metadata lookup, no execution; object-store bytes ≈ 4x
            # file bytes, so scale down to the file-byte convention
            return int((ds.size_bytes() or 0) // 4)
    except Exception:
        pass
    return 0


# Per-stage sizing guidance (enforced as defaults in the stage wrappers):
#   extract_text      batch_size=256   (wide binary html rows)
#   media_features    batch_size=64    (binary payloads)
#   extract_triples   batch_size=1024  (string rows, regex-bound)
#   resolve           batch_size=64k   (narrow string rows, dict lookups)
#   fold pack/merge   block-granular   (combiner bounds reduce-side skew)
# Shuffle keys (SURVEY §7.3): subj (page fold), pred_title (property
# pages), template_name (templates), band keys (LSH), bucket (ANN).

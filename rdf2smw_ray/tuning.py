"""Scale tuning — one place for the Ray Data knobs this engine relies
on, with the reasoning recorded (BASELINE.md "key engineering facts").

Call ``configure_context()`` once per session (CLI and bench do);
defaults suit a single fat node. At cluster scale, size
``target_max_block_size`` and stage batch sizes so
``batch × max-concurrent-tasks`` fits each worker's heap, and keep
wide binary stages (html, media payloads) on small batches.
"""

from __future__ import annotations


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


# Per-stage sizing guidance (enforced as defaults in the stage wrappers):
#   extract_text      batch_size=256   (wide binary html rows)
#   media_features    batch_size=64    (binary payloads)
#   extract_triples   batch_size=1024  (string rows, regex-bound)
#   resolve           batch_size=64k   (narrow string rows, dict lookups)
#   fold pack/merge   block-granular   (combiner bounds reduce-side skew)
# Shuffle keys (SURVEY §7.3): subj (page fold), pred_title (property
# pages), template_name (templates), band keys (LSH), bucket (ANN).

"""tuning.configure_context smoke."""

from ray.data import DataContext

from rdf2smw_ray.tuning import configure_context


def test_configure_context_roundtrip():
    ctx = DataContext.get_current()
    before = ctx.target_max_block_size
    try:
        configure_context(target_max_block_size_mb=64)
        assert ctx.target_max_block_size == 64 * 1024 * 1024
        assert ctx.execution_options.preserve_order is False
    finally:
        ctx.target_max_block_size = before

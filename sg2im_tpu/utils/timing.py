"""Timing / profiling utilities (reference ``sg2im/utils.py:46-92``).

TPU equivalents: ``jax.block_until_ready`` fencing instead of
``torch.cuda.synchronize`` (``utils.py:63-73``), jax device memory stats
instead of nvidia-smi (``utils.py:50-60``), and an opt-in ``jax.profiler``
trace context.
"""

from __future__ import annotations

import contextlib
import time


def _force_sync(value):
    """Fence on a device value via a host scalar read — syncs even through
    the axon tunnel, where ``block_until_ready`` returns early (CLAUDE.md
    hard rule; same fence ``trainer.step_breakdown`` uses)."""
    import jax
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(value):
        float(jnp.asarray(leaf).sum())
        break


@contextlib.contextmanager
def timeit(msg: str, should_time: bool = True, sync_value=None):
    """Print elapsed ms for a block (reference ``timeit``).

    Yields a dict: set ``box['sync'] = <device value produced inside>`` so
    the exit fence reads a host scalar from it; without a sync value only
    dispatch is timed on async backends (``sync_value`` pre-seeds it for
    values that exist up front)."""
    import jax

    box = {"sync": sync_value}
    if should_time:
        jax.effects_barrier()
        t0 = time.perf_counter()
    yield box
    if should_time:
        if box.get("sync") is not None:
            _force_sync(box["sync"])
        else:
            jax.effects_barrier()
        dt = time.perf_counter() - t0
        print(f"{msg}: {dt * 1000.0:.2f}ms")


def get_device_memory(device=None) -> dict:
    """Per-device memory stats in MB (replacement for ``get_gpu_memory``)."""
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except (AttributeError, NotImplementedError):
        return {}
    scale = 1.0 / (1024 * 1024)
    return {k: v * scale for k, v in stats.items()
            if isinstance(v, (int, float))}


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class LossManager:
    """Weighted loss accumulator (reference ``sg2im/utils.py:76-92``)."""

    def __init__(self):
        self.total_loss = None
        self.all_losses = {}

    def add_loss(self, loss, name, weight: float = 1.0):
        cur = loss * weight
        self.total_loss = cur if self.total_loss is None \
            else self.total_loss + cur
        self.all_losses[name] = float(cur)

    def items(self):
        return self.all_losses.items()

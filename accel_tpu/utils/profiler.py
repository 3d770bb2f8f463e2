"""Profiling + debug helpers.

Reference counterpart (SURVEY.md §5 "Tracing/profiling"): the reference has
only the Speedometer callback and pred_eval's data/net wall-clock split.
TPU-native replacement: ``jax.profiler`` traces (xprof-compatible) behind a
``--profile`` flag, a block-until-ready stage timer, and NaN-checking debug
mode (the reference has no sanitizers; SURVEY.md §5 "Race detection").
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(logdir: str | None, enabled: bool = True):
    """Capture a jax.profiler trace into ``logdir`` (view with xprof /
    tensorboard-profile). No-op when disabled or logdir is None."""
    if not enabled or not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with device sync (pred_eval's t_data/t_net
    split, generalized)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return "  ".join(
            f"{k}={self.totals[k] / max(self.counts[k], 1) * 1000:.2f}ms"
            for k in self.totals
        )


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    """Enable jax NaN debugging within the scope (debug cfg only — it
    disables async dispatch)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)

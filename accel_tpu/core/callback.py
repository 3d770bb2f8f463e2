"""Training callbacks.

Reference counterpart: ``<net>/core/callback.py`` (SURVEY.md §2) —
``Speedometer`` (samples/sec logging) and ``do_checkpoint`` (per-epoch param
dump). ``fit`` embeds a Speedometer; these standalone classes keep the
reference call-shape for code that composes its own loop.
"""

from __future__ import annotations

import time


class Speedometer:
    """batch_end_callback: logs samples/sec every ``frequent`` batches."""

    def __init__(self, batch_size: int, frequent: int = 20, logger=None):
        self.batch_size = batch_size
        self.frequent = frequent
        self.log = logger.info if logger else print
        self.init = False
        self.tic = 0.0
        self.last_count = 0

    def __call__(self, epoch: int, nbatch: int, eval_metric=None):
        if self.last_count > nbatch:
            self.init = False
        self.last_count = nbatch
        if self.init:
            if nbatch % self.frequent == 0:
                speed = self.frequent * self.batch_size / (time.time() - self.tic)
                msg = f"Epoch[{epoch}] Batch [{nbatch}]\tSpeed: {speed:.2f} samples/sec"
                if eval_metric is not None:
                    name, value = eval_metric.get()
                    msg += f"\t{name}={value:.6f}"
                self.log(msg)
                self.tic = time.time()
        else:
            self.init = True
            self.tic = time.time()


def do_checkpoint(prefix: str):
    """epoch_end_callback: save the train state under ``prefix`` per epoch
    (reference: do_checkpoint -> {prefix}-{epoch:04d}.params)."""
    from accel_tpu.core.checkpoint import save_checkpoint

    def _callback(epoch: int, state):
        import jax

        save_checkpoint(prefix, epoch, jax.device_get(state))

    return _callback

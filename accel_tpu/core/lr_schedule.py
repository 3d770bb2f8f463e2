"""Warmup + multi-step LR decay.

Reference counterpart: ``lib/utils/lr_scheduler.py:WarmupMultiFactorScheduler``
(SURVEY.md §2) — linear warmup to base lr, then multiply by ``factor`` at
each step boundary. Expressed as an optax-compatible schedule function.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def warmup_multifactor_schedule(
    base_lr: float,
    steps: Sequence[int],
    factor: float = 0.1,
    warmup: bool = True,
    warmup_lr: float = 0.0,
    warmup_steps: int = 0,
):
    """Returns f(step) -> lr.

    ``steps``: global-step boundaries (ascending) at which lr *= factor.
    During the first ``warmup_steps`` steps, lr ramps linearly from
    ``warmup_lr`` to ``base_lr`` (reference 'linear' warmup mode).
    """
    boundaries = jnp.asarray(sorted(int(s) for s in steps), dtype=jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        n_decays = jnp.sum(step >= boundaries)
        lr = base_lr * (factor ** n_decays.astype(jnp.float32))
        if warmup and warmup_steps > 0:
            frac = jnp.minimum(step.astype(jnp.float32) / float(warmup_steps), 1.0)
            wlr = warmup_lr + (base_lr - warmup_lr) * frac
            lr = jnp.where(step < warmup_steps, wlr, lr)
        return lr

    return schedule


def lr_steps_from_epochs(lr_step_csv: str, epoch_size: int, begin_epoch: int = 0) -> list[int]:
    """Convert the reference's 'lr_step' epoch csv ('3.333,4.5') to global steps."""
    out = []
    for tok in str(lr_step_csv).split(","):
        tok = tok.strip()
        if not tok:
            continue
        e = float(tok)
        if e > begin_epoch:
            out.append(int(e * epoch_size))
    return out

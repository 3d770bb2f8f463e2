"""Training: optimizer, train step, fit loop.

Reference counterparts (SURVEY.md §2, §3.2): ``<net>/train_end2end.py``
(SGD + WarmupMultiFactorScheduler, per-epoch checkpoints),
``core/module.py:MutableModule.fit`` and the kvstore('device') gradient
allreduce of ``DataParallelExecutorGroup``.

TPU-native shape: one jitted ``train_step`` closed over a mesh — batch
sharded on the 'data' axis, params replicated; XLA inserts the gradient
allreduce over ICI. Buffers are donated so the optimizer update is
in-place in HBM.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from accel_tpu.core.lr_schedule import lr_steps_from_epochs, warmup_multifactor_schedule
from accel_tpu.core.pipeline import pair_loss
from accel_tpu.parallel.mesh import replicated


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    variables: Any  # {'params': ..., 'batch_stats': ...}
    opt_state: Any


def make_optimizer(cfg, epoch_size: int, fixed_prefixes=None):
    """SGD + momentum + weight decay + warmup-multistep schedule (reference
    train_end2end.py optimizer_params).

    ``fixed_prefixes``: parameter-path substrings to freeze (the reference's
    ``network.FIXED_PARAMS`` — e.g. early ResNet stages when fine-tuning
    from pretrained weights). Matching leaves get zero updates.
    """
    tr = cfg.TRAIN
    steps = lr_steps_from_epochs(tr.lr_step, epoch_size, tr.begin_epoch)
    schedule = warmup_multifactor_schedule(
        base_lr=float(tr.lr),
        steps=steps,
        factor=float(tr.lr_factor),
        warmup=bool(tr.warmup),
        warmup_lr=float(tr.warmup_lr),
        warmup_steps=int(tr.warmup_step),
    )
    clip = float(tr.get("grad_clip", 0) or 0)
    parts = []
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    parts += [
        optax.add_decayed_weights(float(tr.wd)),
        optax.sgd(learning_rate=schedule, momentum=float(tr.momentum)),
    ]
    tx = optax.chain(*parts)
    fixed = fixed_prefixes
    if fixed is None:
        fixed = list(cfg.network.FIXED_PARAMS or []) if "network" in cfg else []
    if fixed:

        def frozen_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: any(
                    p in jax.tree_util.keystr(path) for p in fixed
                ),
                params,
            )

        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx, schedule


def init_train_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(
    model, tx, num_classes: int, loss_scale: float = 1.0, mesh=None,
    mutable_stats: bool | None = None, ohem_fraction: float | None = None,
    aux_weight: float = 0.0, objective: str = "pair",
    propagate: str = "incremental", remat: bool = False,
):
    """Build the jitted train step. With a mesh, batch is data-sharded and
    state replicated; without, plain jit (single device). ``mutable_stats``
    threads BatchNorm running stats through the step (auto-detected from
    ``model.norm`` when None). ``objective``: 'pair' (reference single-warp
    objective, batch = data/data_ref/eq_flag/label) or 'clip'
    (cascade-unrolled, batch = clip/label; ``propagate`` selects the
    cascade mode). ``remat`` (clip objective only) rematerializes each
    frame's forward during backprop — one frame of activations live instead
    of k (jax.checkpoint; trades ~1 extra forward for O(k) less HBM)."""
    from accel_tpu.core.pipeline import clip_loss_and_stats, pair_loss_and_stats

    if mutable_stats is None:
        mutable_stats = getattr(model, "norm", "frozenbn") == "batchnorm"

    def step_fn(state: TrainState, batch):
        def loss_fn(params):
            variables = dict(state.variables)
            variables["params"] = params
            if objective == "clip":
                return clip_loss_and_stats(
                    model, variables, batch, num_classes, loss_scale,
                    propagate, mutable_stats, ohem_fraction, aux_weight,
                    remat,
                )
            return pair_loss_and_stats(
                model, variables, batch, num_classes, loss_scale, mutable_stats,
                ohem_fraction, aux_weight,
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.variables["params"]
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.variables["params"]
        )
        params = optax.apply_updates(state.variables["params"], updates)
        variables = dict(state.variables)
        variables["params"] = params
        if new_stats is not None:
            variables["batch_stats"] = new_stats
        new_state = TrainState(
            step=state.step + 1, variables=variables, opt_state=opt_state
        )
        return new_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))
    # state replicated; batch shardings are inherited from the arguments so
    # callers can shard data-only or data+spatial (shard_batch) freely.
    rep = replicated(mesh)
    return jax.jit(
        step_fn,
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def fit(
    model,
    state: TrainState,
    train_step,
    data_iter: Iterable,
    epochs: int,
    epoch_size: int,
    logger=None,
    frequent: int = 20,
    epoch_end_callback: Callable[[int, TrainState], None] | None = None,
    begin_epoch: int = 0,
    metrics_writer=None,
):
    """Reference-shaped fit loop (MutableModule.fit): per-batch step with a
    Speedometer-style throughput log, per-epoch callback for checkpointing."""
    log = logger.info if logger else print
    for epoch in range(begin_epoch, epochs):
        t0 = time.time()
        n_since = 0
        loss_acc = 0.0
        for i, batch in zip(range(epoch_size), data_iter):
            state, metrics = train_step(state, batch)
            n_since += 1
            # also log at epoch end: epochs smaller than `frequent` would
            # otherwise never produce a Speedometer line or metrics row
            if (i + 1) % frequent == 0 or (i + 1) == epoch_size:
                loss = float(metrics["loss"])
                dt = time.time() - t0
                bsz = (batch["data"] if "data" in batch else batch["clip"]).shape[0]
                log(
                    f"Epoch[{epoch}] Batch [{i + 1}/{epoch_size}]\t"
                    f"Speed: {n_since * bsz / dt:.2f} samples/sec\t"
                    f"FCNLogLoss={loss:.5f}"
                )
                if metrics_writer is not None:
                    metrics_writer.write(
                        int(state.step), loss=loss,
                        samples_per_sec=n_since * bsz / dt, epoch=epoch,
                    )
                t0 = time.time()
                n_since = 0
        if epoch_end_callback is not None:
            jax.block_until_ready(state.variables)
            epoch_end_callback(epoch, state)
    return state

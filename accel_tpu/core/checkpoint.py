"""Checkpoint save/restore (orbax).

Reference counterparts (SURVEY.md §5 "Checkpoint / resume"):
``core/callback.py:do_checkpoint`` (per-epoch ``{prefix}-{epoch:04d}.params``)
and ``lib/utils/load_model.py:load_param`` / ``save_model.py``. The orbax
checkpoint holds the full train state (params + opt state + step), giving
restart-from-epoch like the reference's TRAIN.RESUME/begin_epoch.
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _mngr(prefix_dir: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(prefix_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=None, create=True),
    )


def save_checkpoint(prefix_dir: str, epoch: int, state) -> None:
    """Save the train state for ``epoch`` (reference: do_checkpoint)."""
    mngr = _mngr(prefix_dir)
    # Re-runs must overwrite: orbax raises StepAlreadyExistsError on a step
    # collision (and `force` only bypasses the save-interval policy — the
    # r1 force=True alone left repeated runs crashing on leftover steps),
    # so delete the stale step first.
    if epoch in mngr.all_steps():
        mngr.delete(epoch)
    mngr.save(epoch, args=ocp.args.StandardSave(state), force=True)
    mngr.wait_until_finished()
    mngr.close()


def load_checkpoint(prefix_dir: str, epoch: int, abstract_state):
    """Restore the train state saved at ``epoch`` (reference: load_param)."""
    mngr = _mngr(prefix_dir)
    restored = mngr.restore(
        epoch,
        args=ocp.args.StandardRestore(jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state))
        if abstract_state is not None
        else None,
    )
    mngr.close()
    return restored


def latest_epoch(prefix_dir: str) -> int | None:
    if not os.path.isdir(prefix_dir):
        return None
    mngr = _mngr(prefix_dir)
    step = mngr.latest_step()
    mngr.close()
    return step


def saved_epochs(prefix_dir: str) -> list[int]:
    """All saved steps, ascending. With TRAIN.checkpoint_interval > 1 not
    every epoch exists — callers wanting "epoch <= N" must pick from this
    list rather than assume N was saved."""
    if not os.path.isdir(prefix_dir):
        return []
    mngr = _mngr(prefix_dir)
    steps = sorted(mngr.all_steps())
    mngr.close()
    return steps


def save_params(path: str, variables) -> None:
    """Standalone params dump (reference: the .params file for test.py)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables)
    ckptr.wait_until_finished()


def load_params(path: str, abstract_variables=None):
    ckptr = ocp.StandardCheckpointer()
    if abstract_variables is not None:
        abstract_variables = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, abstract_variables
        )
    return ckptr.restore(os.path.abspath(path), abstract_variables)

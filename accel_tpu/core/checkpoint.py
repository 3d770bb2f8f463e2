"""Checkpoint save/restore (orbax).

Reference counterparts (SURVEY.md §5 "Checkpoint / resume"):
``core/callback.py:do_checkpoint`` (per-epoch ``{prefix}-{epoch:04d}.params``)
and ``lib/utils/load_model.py:load_param`` / ``save_model.py``. The orbax
checkpoint holds the full train state (params + opt state + step), giving
restart-from-epoch like the reference's TRAIN.RESUME/begin_epoch.
"""

from __future__ import annotations

import json
import os

import jax
import orbax.checkpoint as ocp

# ---------------------------------------------------------------------------
# Training-semantics provenance.
#
# The repo's own measurements prove eval-mode mismatch is the single largest
# accuracy hazard in the system: a clip-through-direct checkpoint evaluated
# under incremental collapses 84.36 -> 31.97 mIoU, a pair-trained one to
# 20.2, and a 'last'-trained incremental recipe served as 'product' loses up
# to ~25 points at k=10 (BASELINE.md propagation/cascade tables). Checkpoints
# therefore carry a provenance.json recording the (objective,
# trained-through-propagate, scale_field_norm, scale_cascade) they were
# trained with, and eval refuses the known-collapse combinations unless
# forced. The reference has no equivalent (its .params carry no metadata —
# SURVEY.md §5 checkpoint row); this is a rebuild-side guardrail.

PROVENANCE_FILE = "provenance.json"


def save_provenance(prefix_dir: str, prov: dict) -> None:
    os.makedirs(prefix_dir, exist_ok=True)
    with open(os.path.join(prefix_dir, PROVENANCE_FILE), "w") as f:
        json.dump(prov, f, indent=1, sort_keys=True)


def load_provenance(prefix_dir: str) -> dict | None:
    path = os.path.join(prefix_dir, PROVENANCE_FILE)
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def provenance_from_cfg(cfg) -> dict:
    return {
        "objective": str(cfg.TRAIN.objective),
        "propagate": str(cfg.network.propagate),
        "scale_field_norm": str(cfg.network.scale_field_norm),
        "scale_cascade": str(cfg.network.scale_cascade),
        "family": str(cfg.network.name),
    }


class EvalSemanticsError(ValueError):
    """Eval semantics known (measured) to collapse this checkpoint."""


def check_eval_semantics(
    prov: dict | None, eval_propagate: str, eval_network, force: bool = False
) -> list[str]:
    """Compare a checkpoint's training provenance against the requested
    eval semantics. Returns human-readable warnings for benign mismatches
    (eval-time interventions); raises :class:`EvalSemanticsError` for the
    measured-collapse combinations unless ``force``.

    ``eval_network`` is the post-override cfg.network (dict-like with
    scale_cascade / scale_field_norm).
    """
    if prov is None:
        return []
    warnings: list[str] = []
    objective = prov.get("objective")
    trained_prop = prov.get("propagate")
    cascading = eval_propagate in ("incremental", "composed")

    trained_cascade = prov.get("scale_cascade")
    eval_cascade = (
        str(eval_network.get("scale_cascade"))
        if eval_network is not None and eval_network.get("scale_cascade")
        is not None
        else None
    )

    fatal = None
    if objective == "pair" and cascading:
        fatal = (
            f"pair-trained checkpoint evaluated --propagate {eval_propagate}: "
            "the pair objective supervises exactly ONE warp; its scale field "
            "compounds under cascade (measured 80.0 -> 20.2 mIoU, "
            "BASELINE.md propagation table)"
        )
    elif objective == "clip" and trained_prop == "direct" and cascading:
        fatal = (
            f"clip-through-direct checkpoint evaluated --propagate "
            f"{eval_propagate}: a direct-trained scale field is calibrated "
            "for exactly one warp (measured 84.36 -> 31.97 mIoU, BASELINE.md "
            "r4 decision table)"
        )
    elif (
        objective == "clip"
        and cascading
        and trained_cascade == "last"
        and eval_cascade == "product"
    ):
        fatal = (
            "'last'-trained checkpoint evaluated under the 'product' "
            "cascade: re-introduces the compounding scale product the "
            "model never trained through (measured r5: 87.45 -> 31.27 "
            "mIoU at k=5 and 87.38 -> 16.47 at k=10 on the extreme "
            "clip-last arm — BASELINE.md)"
        )
    if fatal is not None:
        if not force:
            raise EvalSemanticsError(
                fatal + " — pass --force to evaluate anyway"
            )
        warnings.append("FORCED past known-collapse semantics: " + fatal)
    elif trained_prop is not None and eval_propagate != trained_prop:
        warnings.append(
            f"eval propagate={eval_propagate!r} differs from the semantics "
            f"this checkpoint was trained through ({trained_prop!r}) — "
            "intentional for eval-time intervention studies; not the "
            "checkpoint's native operating point"
        )

    if (
        cascading
        and trained_cascade is not None
        and eval_cascade is not None
        and eval_cascade != trained_cascade
        and fatal is None
    ):
        # cascade semantics only act on cascading eval paths (direct mode
        # performs a single warp — interventions are vacuous there)
        if trained_cascade == "product" and eval_cascade == "last":
            warnings.append(
                "eval scale_cascade='last' on a product-trained checkpoint "
                "— the measured-BEST incremental eval semantics "
                "(BASELINE.md intervention table), an intentional "
                "eval-time intervention, not a hazard"
            )
        else:
            warnings.append(
                f"eval scale_cascade={eval_cascade!r} differs from trained "
                f"{trained_cascade!r} — eval-time intervention; cascade "
                "mismatches have measured up to ~25 mIoU at k=10 "
                "(BASELINE.md intervention table)"
            )
    tn = prov.get("scale_field_norm")
    en = (str(eval_network.get("scale_field_norm"))
          if eval_network is not None
          and eval_network.get("scale_field_norm") is not None else None)
    if tn is not None and en is not None and en != tn:
        warnings.append(
            f"eval scale_field_norm={en!r} differs from trained {tn!r} — "
            "the scale field's calibration is recipe-bound (BASELINE.md "
            "r2 gain A/B)"
        )
    return warnings


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

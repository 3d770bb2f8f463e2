"""Serving export: serialize the fused clip-inference program to a
portable artifact via ``jax.export`` (StableHLO + calling convention).

The reference has no deployment story beyond "run test.py under MXNet"
(SURVEY.md §4 — golden-number runs are the only harness); a production
serving stack wants the compiled program *without* the Python/flax model
definition on the serving host. ``jax.export`` gives exactly that on TPU:
the traced ``clip_predictions`` program — scan-carried keyframe cache,
batched group step, fused upsample+argmax tail — becomes one
self-describing StableHLO module that any JAX runtime (or an XLA C++
host binary) can load and invoke.

Two packaging modes:

- ``embed_params=True`` (default): the checkpoint's parameter tree is
  closed over and baked into the module as constants — a single-file
  artifact, nothing else to ship.
- ``embed_params=False``: parameters stay a call argument (flat list in
  deterministic tree order); the artifact is tiny and one module serves
  many checkpoints of the same architecture.

The clip batch dimension can be exported symbolically (``batch='b'``) so
one artifact serves any batch size; H/W/interval stay static (XLA wants
static spatial shapes on TPU — SURVEY.md §7, and the reference also fixes
them per config).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport

from accel_tpu.core.pipeline import clip_predictions

# serialized artifacts start with this magic so load_serving can reject
# arbitrary files early with a clear error
MAGIC = b"ACCELTPU_SERVING1\n"


def make_serving_fn(model, interval: int, propagate: str = "direct",
                    full_res: bool = True, upsample: str = "bilinear_logits"):
    """(variables, clip) -> (B, F, H, W) uint8 predictions — the group
    serving program (same program VideoSegmenter.push_group runs)."""

    def fn(variables, clip):
        return clip_predictions(
            model, variables, clip, interval, propagate,
            full_res=full_res, upsample=upsample,
        )

    return fn


def export_serving(
    model,
    variables,
    frame_hw: tuple[int, int],
    interval: int,
    propagate: str = "direct",
    batch: int | str = "b",
    full_res: bool = True,
    upsample: str = "bilinear_logits",
    embed_params: bool = True,
    platforms=None,
    path: str | None = None,
) -> bytes:
    """Export the clip-serving program; returns the serialized artifact
    (and writes it to ``path`` if given).

    ``batch``: an int for a static clip-batch dim, or a symbolic dim name
    (default ``'b'``) for a batch-polymorphic artifact.
    ``platforms``: lowering platforms (default: the current backend);
    pass e.g. ``('tpu',)`` to cross-export from a CPU host.
    """
    H, W = int(frame_hw[0]), int(frame_hw[1])
    F = int(interval) if model.family != "deeplab" else 1
    fn = make_serving_fn(model, interval, propagate, full_res, upsample)

    if isinstance(batch, str):
        (b,) = jexport.symbolic_shape(batch)
    else:
        b = int(batch)
    clip_spec = jax.ShapeDtypeStruct((b, F, H, W, 3), jnp.float32)

    if embed_params:
        exported = jexport.export(
            jax.jit(lambda clip: fn(variables, clip)),
            platforms=platforms,
        )(clip_spec)
    else:
        var_specs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            variables,
        )
        exported = jexport.export(jax.jit(fn), platforms=platforms)(
            var_specs, clip_spec
        )

    blob = MAGIC + exported.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_serving(src):
    """Load an artifact (path or bytes) -> callable.

    The returned callable has the exported signature: ``fn(clip)`` when the
    parameters were embedded, else ``fn(variables, clip)``. It re-traces
    through ``exported.call`` so it composes with jit/sharding on the
    serving host.
    """
    if isinstance(src, (bytes, bytearray)):
        blob = bytes(src)
    else:
        with open(src, "rb") as f:
            blob = f.read()
    if not blob.startswith(MAGIC):
        raise ValueError(
            "not an accel_tpu serving artifact (missing magic header)"
        )
    exported = jexport.deserialize(blob[len(MAGIC):])

    def call(*args):
        return exported.call(*args)

    call.exported = exported
    return call

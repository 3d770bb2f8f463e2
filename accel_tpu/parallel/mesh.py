"""Device mesh + sharding rules.

Reference counterpart: ``<net>/core/DataParallelExecutorGroup.py`` +
kvstore('device') — single-process multi-GPU data parallelism, the
reference's only parallelism (SURVEY.md §2b). The TPU-native replacement is
a ``jax.sharding.Mesh`` with two axes:

- ``data``    — batch (clips) sharded; gradient allreduce over ICI is
  induced automatically by pjit (the kvstore equivalent).
- ``spatial`` — the image H axis sharded; XLA's SPMD partitioner inserts
  halo exchanges for the convolutions. This is the sequence-parallel analog
  for 1024x2048 activations when one chip's HBM is tight (SURVEY.md §2b
  "TP" row); mesh {'spatial': 1} disables it.

Params/optimizer state are replicated — the models are CNN-sized (<100M
params), so weight sharding buys nothing at these scales.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, spatial: int = 1, devices=None) -> Mesh:
    """Create a (data, spatial) mesh. data=-1 -> all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % spatial == 0, f"{n} devices not divisible by spatial={spatial}"
        data = n // spatial
    assert data * spatial <= n, f"mesh {data}x{spatial} > {n} devices"
    arr = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    """Mesh from config. The reference's ``gpus: '0,1,2,3'`` field selects
    devices by index (SURVEY.md §2b DP row); ``tpu.mesh`` shapes the axes."""
    if devices is None:
        all_devices = jax.devices()
        gpus = str(cfg.get("gpus", "") or "")
        if gpus:
            ids = [int(x) for x in gpus.split(",") if x.strip() != ""]
            # any valid explicit id list selects devices (including a single
            # id); all-devices default only when the field is empty
            if ids and all(i < len(all_devices) for i in ids):
                devices = [all_devices[i] for i in ids]
    m = cfg.tpu.mesh
    return make_mesh(int(m.data), int(m.spatial), devices)


def batch_sharding(mesh: Mesh, spatial_axis: int | None = None) -> NamedSharding:
    """Sharding for a batch tensor: axis 0 over 'data', optionally one
    spatial dim over 'spatial' (e.g. H of NHWC images -> spatial_axis=1,
    of clip tensors (B,F,H,W,C) -> spatial_axis=2)."""
    if spatial_axis is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * (spatial_axis + 1)
    spec[0] = "data"
    spec[spatial_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, spatial: bool = False) -> dict:
    """Device-put a host batch dict with data(/spatial) sharding."""
    out = {}
    for k, v in batch.items():
        ax = None
        if spatial and hasattr(v, "ndim") and v.ndim >= 3:
            # H axis: float tensors carry a trailing channel dim
            # ((N,H,W,C) / (B,F,H,W,C) -> ndim-3); integer label maps don't
            # ((N,H,W) / (B,F,H,W) -> ndim-2)
            floating = np.issubdtype(np.dtype(v.dtype), np.floating)
            ax = v.ndim - 3 if floating else v.ndim - 2
        out[k] = jax.device_put(v, batch_sharding(mesh, ax))
    return out

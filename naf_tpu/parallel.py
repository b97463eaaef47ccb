"""Mesh / sharding utilities (data + spatial parallelism).

The reference is single-GPU (SURVEY §2.10); on TPU, parallelism is free
structure: batches shard over a `data` axis, and the query grid — the only
O(N) axis — shards spatially over a `space` axis. NAF's LR K/V grids are
small by construction, so they replicate and the cross-scale attention runs
collective-free; XLA inserts halo exchanges for the conv encoder
automatically under jit.

    mesh = make_mesh(data=4, space=2)
    params = replicate(mesh, params)
    out = pjit_upsample(mesh, model)(params, image, lr_feats, (H, W))
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_spatial",
    "pjit_upsample",
]


def make_mesh(data: Optional[int] = None, space: int = 1) -> Mesh:
    """(data, space) device mesh; data defaults to n_devices // space."""
    n = len(jax.devices())
    if data is None:
        data = n // space
    devices = np.array(jax.devices()[: data * space]).reshape(data, space)
    return Mesh(devices, ("data", "space"))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def shard_batch(mesh: Mesh, tree):
    """Shard leading (batch) axis over `data`."""
    return jax.device_put(tree, NamedSharding(mesh, P("data")))


def shard_spatial(mesh: Mesh, tree):
    """Shard (batch, height) over (`data`, `space`) — NHWC activations."""
    return jax.device_put(tree, NamedSharding(mesh, P("data", "space")))


def pjit_upsample(mesh: Mesh, model):
    """jit'd model.apply with batch-sharded image and replicated LR feats;
    output sharded like the image (data x space over batch x rows)."""

    import functools

    @functools.partial(jax.jit, static_argnums=(3,))
    def fn(params, image, lr_feats, out_hw):
        return model.apply({"params": params}, image, lr_feats, out_hw)

    def wrapped(params, image, lr_feats, out_hw):
        params = replicate(mesh, params)
        image = shard_spatial(mesh, image)
        lr_feats = shard_batch(mesh, lr_feats)
        with mesh:
            return fn(params, image, lr_feats, tuple(int(v) for v in out_hw))

    return wrapped

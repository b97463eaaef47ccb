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
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "shard_spatial",
    "pjit_upsample",
    "naf_spatial_forward",
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


def naf_spatial_forward(
    mesh: Mesh, model, params, image, lr_feats, out_hw, interpret=None
):
    """Spatially-sharded PRODUCTION inference: shard_map'd fused-q bands.

    Each device on the `space` axis owns a contiguous band of LR cell rows
    (and the output rows above them). By the banded fused-q decomposition
    (kernels/na2d_fused_q.py) this is collective-free in the attention:
    K/V and the pooled keys are LR-sized and replicate; the encoder output
    and RoPE row tables are row-sliced; each device's windows reach into
    neighbor cells through the (replicated) K/V union-tile gather, so no
    halo exchange is needed. One traced program serves every device — the
    band origin enters the kernel as a dynamic SMEM scalar and the gather
    table as a dynamic row-slice of the full-grid cell-index table.

    The encoder + pooled-keys prep runs under jit with sharding constraints
    (XLA inserts the conv halo exchanges and the keys-reduction collectives);
    the attention — the O(output) stage — runs under shard_map on the Pallas
    production kernel. Batch shards over `data`.

    The reference is single-GPU and caps at 2048^2 outputs (README.md:98,
    SURVEY §2.10); this is the TPU-native context-parallel analogue.

    Requires: integer ratios, `space` dividing the LR grid rows into
    kernel-geometry-aligned bands, and `data` dividing the batch.
    Returns NHWC (B, H, W, C) sharded P("data", "space").
    """
    import functools

    from naf_tpu.kernels.na2d_fused_q import (
        _cell_index_table,
        naf_upsample_attention,
        pick_geometry,
    )
    from naf_tpu.models.naf import ImageEncoder

    oh, ow = int(out_hw[0]), int(out_hw[1])
    S = mesh.shape["space"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hk, wk = int(lr_feats.shape[1]), int(lr_feats.shape[2])
    n = model.heads_attn
    d = model.dim // n
    dv = lr_feats.shape[-1] // n
    d_head = model.dim // model.heads_rope
    hi, wi = ImageEncoder.guard_size(
        int(image.shape[1]), int(image.shape[2]), oh, ow
    )
    kk = model.kernel_size
    geom = pick_geometry(
        oh, ow, hi, wi, hk, wk, kk, n, d, dv, image.dtype.itemsize
    )
    if geom is None:
        raise ValueError("no fused-q geometry for these shapes")
    if hk % S or (hk // S) % geom[0] or hi % S or image.shape[0] % mesh.shape["data"]:
        raise ValueError(
            f"space={S} must divide LR rows ({hk}) into bands aligned to "
            f"the cell block ({geom[0]}), and encoder rows ({hi}) evenly; "
            f"data={mesh.shape['data']} must divide the batch"
        )
    band_cells = hk // S
    n_ch_local = band_cells // geom[0]
    r_h = oh // hk
    out_h_local = band_cells * r_h
    idx_full = jnp.asarray(_cell_index_table(hk, wk, *geom, kk, 0, hk))
    P_ = P  # close over

    def att_local(enc_l, keys, feats, rows_tab, cols_tab, idx_full):
        dev = jax.lax.axis_index("space")
        cell0 = (dev * band_cells).astype(jnp.int32)
        idx_l = jax.lax.dynamic_slice(
            idx_full, (dev * n_ch_local, 0, 0),
            (n_ch_local, idx_full.shape[1], idx_full.shape[2]),
        )
        rows_l = jax.lax.dynamic_slice(
            rows_tab, (dev * out_h_local, 0),
            (out_h_local, rows_tab.shape[1]),
        )
        return naf_upsample_attention(
            enc_l, keys, feats, rows_l, cols_tab, d_head,
            num_heads=n, kernel_size=kk, band_cells=band_cells,
            enc_banded=True, cell0_array=cell0, idx_table=idx_l,
            full_hq=oh, geometry=geom, interpret=interpret,
        )

    att = jax.shard_map(
        att_local,
        mesh=mesh,
        in_specs=(P_("data", "space"), P_("data"), P_("data"), P_(), P_(),
                  P_()),
        out_specs=P_("data", "space"),
        check_vma=False,
    )

    @jax.jit
    def fwd(params, image, lr_feats, idx_full):
        image = jax.lax.with_sharding_constraint(
            image, NamedSharding(mesh, P_("data", "space"))
        )
        b = model.bind({"params": params})
        enc = b.image_encoder.encode_guarded(image, (oh, ow))
        enc = jax.lax.with_sharding_constraint(
            enc, NamedSharding(mesh, P_("data", "space"))
        )
        keys = b.image_encoder.rope.pooled(enc, (oh, ow), (hk, wk))
        sin_r, cos_r, sin_c, cos_c = b.image_encoder.rope.tables(oh, ow)
        rows_tab = jnp.concatenate([cos_r, sin_r], axis=-1).astype(enc.dtype)
        cols_tab = jnp.concatenate([cos_c, sin_c], axis=-1).astype(enc.dtype)
        return att(enc, keys, lr_feats, rows_tab, cols_tab, idx_full)

    with mesh:
        return fwd(params, jnp.asarray(image), jnp.asarray(lr_feats), idx_full)


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

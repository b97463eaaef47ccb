"""k3 conv kernel with FLAT 2-D tap matmuls in the padded-width domain."""
import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from naf_tpu.utils import device_time_ms

rng = np.random.RandomState(0)
H = W = 2048
C = F = 128
x = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
w3 = jnp.asarray(rng.randn(9, C, F), jnp.bfloat16)
scale = jnp.ones((1, C), jnp.float32)
shift = jnp.zeros((1, C), jnp.float32)

def make(bh, bw):
    wp = bw + 8
    R = (bh + 2) * wp
    M = bh * wp

    def kern(x_ref, s_ref, t_ref, w_ref, y_ref, z_ref, acc_ref):
        zf = x_ref[0].astype(jnp.float32) * s_ref[0] + t_ref[0]
        zf = zf * jax.nn.sigmoid(zf)
        z_ref[pl.ds(0, R)] = zf.astype(x_ref.dtype).reshape(R, C)

        def body(dy, _):
            # aligned ref load (wp % 8 == 0 makes dy*wp provably 8-aligned);
            # the +-dx tap shifts are value-level sublane slices.
            zrow = z_ref[pl.ds(dy * wp, M + 8)]
            acc = None
            for dx in range(3):
                zs = zrow[dx : dx + M]
                part = jax.lax.dot_general(
                    zs, w_ref[dy * 3 + dx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            @pl.when(dy == 0)
            def _i():
                acc_ref[...] = acc
            @pl.when(dy > 0)
            def _a():
                acc_ref[...] = acc_ref[...] + acc
            return _
        jax.lax.fori_loop(0, 3, body, None)
        y = acc_ref[...].reshape(bh, wp, F)[:, :bw]
        y_ref[0] = y.astype(y_ref.dtype)

    call = pl.pallas_call(
        kern,
        grid=(1, H // bh, W // bw),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(bh + 2), pl.Element(bw + 8), pl.Element(C)),
                         lambda bb, i, j: (bb, i * bh, j * bw, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, C, F), lambda bb, i, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, F), lambda bb, i, j: (bb, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, F), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((R + 8, C), jnp.bfloat16), pltpu.VMEM((M, F), jnp.float32)],
    )

    def run(a):
        xin = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        xin = jnp.pad(xin, ((0, 0), (0, 0), (0, 6), (0, 0)))
        return call(xin, scale, shift, w3)

    return run

for (bh, bw) in [(8, 256), (16, 256), (16, 512), (8, 512), (32, 256)]:
    try:
        f = make(bh, bw)
        ms = device_time_ms(lambda a: f(a), x, iters=8, perturb="smallest")
        print(f"flat k3 bh={bh:3d} bw={bw:4d}: {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"flat k3 bh={bh:3d} bw={bw:4d}: FAIL {str(e)[:100]}", flush=True)

"""k3 conv kernel via in-VMEM im2col: one K=9C matmul per program."""
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
w3 = jnp.asarray(rng.randn(3, 3, C, F), jnp.bfloat16)
scale = jnp.ones((1, C), jnp.float32)
shift = jnp.zeros((1, C), jnp.float32)
w2 = w3.reshape(9 * C, F)

def make(bh, bw):
    def kern(x_ref, s_ref, t_ref, w_ref, y_ref, zw_ref, zw2_ref):
        zf = x_ref[0].astype(jnp.float32) * s_ref[0] + t_ref[0]
        zf = zf * jax.nn.sigmoid(zf)
        z = zf.astype(x_ref.dtype)  # (bh+2, bw+8, C)
        # row-conv im2col via scratch stores (lane offsets are 128-aligned,
        # which normalizes the sublane-shifted operands' layouts)
        for dx in range(3):
            zw_ref[:, :, dx * C : (dx + 1) * C] = z[:, dx : dx + bw]
        zw = zw_ref[...]
        for dy in range(3):
            zw2_ref[:, :, dy * 3 * C : (dy + 1) * 3 * C] = zw[dy : dy + bh]
        y = jax.lax.dot_general(
            zw2_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y_ref[0] = y.astype(y_ref.dtype)

    call = pl.pallas_call(
        kern,
        grid=(1, H // bh, W // bw),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(bh + 2), pl.Element(bw + 8), pl.Element(C)),
                         lambda bb, i, j: (bb, i * bh, j * bw, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda bb, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, F), lambda bb, i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bh, bw, F), lambda bb, i, j: (bb, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, F), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, bw, 3 * C), jnp.bfloat16),
            pltpu.VMEM((bh, bw, 9 * C), jnp.bfloat16),
        ],
    )

    def run(a):
        xin = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        xin = jnp.pad(xin, ((0, 0), (0, 0), (0, 6), (0, 0)))
        return call(xin, scale, shift, w2)
    return run

for (bh, bw) in [(8, 256), (16, 256), (8, 512), (16, 128), (32, 128), (8, 128)]:
    try:
        f = make(bh, bw)
        ms = device_time_ms(f, x, iters=8, perturb="smallest")
        print(f"im2col k3 bh={bh:3d} bw={bw:4d}: {ms:7.2f} ms", flush=True)
    except Exception as e:
        print(f"im2col k3 bh={bh:3d} bw={bw:4d}: FAIL {str(e)[:90]}", flush=True)

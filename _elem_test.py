import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 32, 8, 128
bh = 8
x = jnp.arange(H * W * C, dtype=jnp.float32).reshape(1, H, W, C) % 997

def kern(x_ref, o_ref):
    o_ref[...] = x_ref[...]

f = pl.pallas_call(
    kern,
    grid=(H // bh,),
    in_specs=[pl.BlockSpec(
        (pl.Element(1), pl.Element(bh + 2), pl.Element(W), pl.Element(C)),
        lambda i: (0, jnp.clip(i * bh - 1, 0, H - bh - 2), 0, 0),
        memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, bh + 2, W, C), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((1, (H // bh) * (bh + 2), W, C), jnp.float32),
)
y = f(x)
y = np.asarray(y)
xn = np.asarray(x)
print("block0 row0 (OOB low):", y[0, 0, 0, :3])
print("block0 row1 == x row0:", np.allclose(y[0, 1], xn[0, 0]))
print("block1 row0 == x row7:", np.allclose(y[0, bh + 2, 0:1], xn[0, 7:8]))
print("block1 rows ok:", np.allclose(y[0, bh + 3], xn[0, 8]))
print("last block last row (OOB high):", y[0, -1, 0, :3])

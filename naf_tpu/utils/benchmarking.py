"""Robust on-device timing.

`jax.block_until_ready` does not actually synchronize through remote-TPU
tunnels (axon), so host-side wall clocks around async dispatch measure
nothing. Instead we run N chained executions inside ONE jitted fori_loop —
each iteration's input is perturbed by a scalar derived from the previous
output, forcing serialization — and fetch a single scalar at the end. The
reported time is (t_N - t_1) / (N - 1), which also cancels dispatch and
fetch overhead. (Reference analogue: CUDA-event timing in
test/forward_speed.py:39-50.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["device_time_ms"]


def _perturbed_args(args, c):
    """Multiply the smallest array leaf by (1 + 0*c) to chain iterations."""
    leaves, treedef = jax.tree.flatten(args)
    sizes = [
        leaf.nbytes if hasattr(leaf, "nbytes") else 1 << 60 for leaf in leaves
    ]
    j = sizes.index(min(sizes))
    leaves = list(leaves)
    leaves[j] = leaves[j] * (1 + 0 * c).astype(leaves[j].dtype)
    return treedef.unflatten(leaves)


def _make_loop(fn, n_iters):
    @jax.jit
    def loop(*args):
        def body(_, c):
            out = fn(*_perturbed_args(args, c))
            leaf = jax.tree.leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    return loop


def device_time_ms(fn, *args, iters: int = 10, repeats: int = 3) -> float:
    """Median per-call device time of `fn(*args)` in milliseconds.

    fn must be jittable; args are arrays/pytrees already on device.
    """
    loop_1 = _make_loop(fn, 1)
    loop_n = _make_loop(fn, iters + 1)
    float(loop_1(*args))  # compile
    float(loop_n(*args))  # compile

    samples = []
    for _ in range(repeats):
        t1 = min(
            _timed(loop_1, args), _timed(loop_1, args)
        )  # best-of-2 baseline: dispatch jitter dominates sub-0.1ms kernels
        tn = _timed(loop_n, args)
        samples.append(max(tn - t1, 0.0) / iters * 1e3)
    samples.sort()
    return samples[len(samples) // 2]


def _timed(fn, args) -> float:
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0

"""Robust on-device timing.

Two hazards make naive timing lie in this environment:

1. `jax.block_until_ready` does not synchronize through remote-TPU tunnels
   (axon): host wall clocks around async dispatch measure nothing. A scalar
   *fetch* of the result does block, but pays a 25-55 ms tunnel round trip.
2. XLA aggressively folds loop bodies. A chained `lax.scan`/`fori_loop` only
   measures `fn` if every iteration's work is (a) data-dependent on the
   carry and (b) not algebraically collapsible. Multiplying an input by
   ``(1 + 0*c)`` gets constant-folded; even ``c * k`` carries collapse
   (``k**n`` is precomputed). Ops not downstream of the perturbed input are
   hoisted out of the loop entirely and cost nothing.

Design: run N chained executions inside one jitted scan. The carry is a full
reduction of the previous output (a slice-only consumer would let XLA slice
through dots and skip the work). Every floating-point argument leaf gets
``+ clip(nan_to_num(c), -1, 1) * 1e-38`` added — data-dependent (not
foldable or hoistable), additive (a scalar *multiply* factors out of
dots/convs and the op hoists), and numerically identity for normal values.
Reported time is (T_scanN - T_scan1) / (N - 1), which cancels the tunnel
round trip, dispatch, and fetch overhead.

The per-leaf epsilon materializes a perturbed copy of each *array* argument
once per iteration wherever XLA cannot fuse the add into the consumer (e.g.
inputs of pallas_call). For micro-benchmarks of kernels with very large
operands, pass ``perturb="smallest"`` to perturb only the smallest leaf — but
then ops that depend solely on the other operands are hoisted and excluded.

(Reference analogue: CUDA-event timing in test/forward_speed.py:39-50.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["device_time_ms"]


def _perturbed_args(args, c, perturb):
    """Add a data-dependent epsilon (rounds to identity) to float leaves.

    Additive, not multiplicative: XLA's algebraic simplifier factors scalar
    multiplies out of dots/convs (``(a*s) @ (a*s) -> s^2 * (a@a)``), hoisting
    the expensive op out of the timing loop. Addition does not distribute
    out of a contraction, so the op must re-execute every iteration.
    """
    # clip keeps |s| <= 1e-38 even when the reduction overflows to ~1e38
    # (1e38 * 1e-38 = 1.0 would visibly perturb the inputs).
    s = jnp.clip(jnp.nan_to_num(c.astype(jnp.float32)), -1.0, 1.0) * 1e-38
    leaves, treedef = jax.tree.flatten(args)

    def scaled(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf + s.astype(leaf.dtype)
        return leaf

    if perturb == "all":
        leaves = [scaled(leaf) for leaf in leaves]
    else:  # "smallest": only the smallest float leaf
        sizes = [
            leaf.nbytes
            if hasattr(leaf, "nbytes")
            and hasattr(leaf, "dtype")
            and jnp.issubdtype(leaf.dtype, jnp.floating)
            else 1 << 60
            for leaf in leaves
        ]
        j = sizes.index(min(sizes))
        leaves = list(leaves)
        leaves[j] = scaled(leaves[j])
    return treedef.unflatten(leaves)


def _make_loop(fn, n_iters, perturb, chain="full"):
    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(*_perturbed_args(args, c, perturb))
            leaf = jax.tree.leaves(out)[0]
            if chain == "scalar":
                # Single-element carry. SOUND ONLY when fn's output leaf is
                # produced by an opaque custom call (a Pallas kernel): XLA
                # cannot slice through a custom-call boundary, so the full
                # kernel AND everything feeding it still execute, and Pallas
                # always stores its whole output. For XLA-native terminals
                # (dots/convs) this would let the simplifier slice the work
                # away (dot(x,y)[0,0] -> dot(x[0],y[:,0])) — use "full".
                # Motivation: the full reduce READS the entire output every
                # iteration (~4.3 ms at 2048^2x384 bf16) — a verification
                # tax the reference's CUDA-event timing
                # (test/forward_speed.py:39-50) does not pay.
                return leaf[(0,) * leaf.ndim].astype(jnp.float32), ()
            # Reduce over the FULL first output leaf: consuming only a
            # slice/element would let XLA slice through the computation
            # (dot(x,y)[0,0] -> dot(x[0,:], y[:,0])) and skip the work.
            # Caveat: a reduce-only consumer may elide the *final store* of
            # an XLA-fused output (pallas outputs always store), so pure-XLA
            # functions are measured without one output write. Carrying the
            # full output instead would force the store but doubles its HBM
            # residency (OOM for 2K^2 outputs).
            # (A strided-checksum variant was tried for pallas-terminal fns
            # to cut the chain's read cost; measured SLOWER than the full
            # contiguous reduce — strided row reads defeat DMA streaming.)
            return jnp.sum(leaf, dtype=jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return c

    return loop


def device_time_ms(
    fn, *args, iters: int = 10, repeats: int = 3, perturb: str = "all",
    chain: str = "full",
) -> float:
    """Median per-call device time of `fn(*args)` in milliseconds.

    fn must be jittable; args are arrays/pytrees already on device.
    perturb: "all" (default; correct for end-to-end numbers) or "smallest"
    (cheaper for huge-operand kernels; hoists work not downstream of the
    smallest float leaf — see module docstring).
    chain: "full" (default; safe for any fn) or "scalar" (single-element
    carry; ONLY for fns whose output comes straight out of a Pallas kernel —
    see the in-body comment. Removes the full-output read the reference's
    CUDA-event methodology does not pay).
    """
    loop_1 = _make_loop(fn, 1, perturb, chain)
    loop_n = _make_loop(fn, iters + 1, perturb, chain)
    float(loop_1(*args))  # compile
    float(loop_n(*args))  # compile

    samples = []
    for _ in range(repeats):
        t1 = min(_timed(loop_1, args), _timed(loop_1, args))
        tn = _timed(loop_n, args)
        samples.append(max(tn - t1, 0.0) / iters * 1e3)
    samples.sort()
    return samples[len(samples) // 2]


def _timed(fn, args) -> float:
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0

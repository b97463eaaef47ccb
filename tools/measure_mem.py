"""Device-measured peak HBM for headline bench rows (VERDICT r3 item 8).

The sweep's `fwd_mem_mb`/`bwd_mem_mb` columns are XLA `memory_analysis()`
of the compiled executable (argument + temp + output sizes) — analytical,
not runtime. This probe grounds them with a device-side measurement. The
reference's comparable number is torch `max_memory_allocated`
(test/test_utils.py).

Primary path: `device.memory_stats()['peak_bytes_in_use']` deltas around
the real execution. The axon tunnel returns None for memory_stats, so the
fallback is allocate-to-OOM bisection: hold a filler buffer of F bytes
while executing the program; the largest F that coexists with a successful
run bounds the program's true peak at HBM_total - F (resolution = the
bisection step). Coarse but *measured* — it reflects the runtime
allocator, padding, and fragmentation that memory_analysis cannot see.

For each headline config it records analytical + measured fwd/bwd peaks
and merges `fwd_mem_measured_mb` / `bwd_mem_measured_mb` onto the matching
benchmarks/results.json rows (the sweep merge carries these fields across
later refreshes).

Run: python tools/measure_mem.py   (on the real TPU)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CONFIGS = [
    # (model, img, embed, lr)  — headline rows: r16 and r32 for NAF + JAFAR
    ("NAF", 448, 384, 28),
    ("NAF", 896, 384, 28),
    ("JAFAR", 448, 384, 28),
    ("JAFAR", 896, 384, 28),
]

HBM_TOTAL_MB = 16 * 1024  # one v5e chip
STEP_MB = 256  # bisection resolution


def _try_run(fn, args, filler_mb: int) -> bool:
    """True iff `fn(*args)` completes while `filler_mb` MB are held."""
    filler = None
    try:
        if filler_mb:
            filler = jnp.zeros((filler_mb, 2 ** 20 // 4), jnp.float32)
            filler.block_until_ready()
        out = fn(*args)
        # force completion through the tunnel: fetch a scalar
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        return True
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                or "OOM" in msg or "exceeds the" in msg:
            return False
        raise
    finally:
        del filler


def bisect_peak_mb(fn, args) -> float:
    """Largest filler that coexists with fn -> peak = HBM_total - filler."""
    if not _try_run(fn, args, 0):
        return float("nan")  # doesn't fit at all (caller records error)
    lo, hi = 0, HBM_TOTAL_MB  # lo = known-good filler, hi = known-bad
    while hi - lo > STEP_MB:
        mid = (lo + hi) // 2
        if _try_run(fn, args, mid):
            lo = mid
        else:
            hi = mid
    return float(HBM_TOTAL_MB - lo)


def peak_stats_mb(dev):
    stats = dev.memory_stats() if hasattr(dev, "memory_stats") else None
    return None if stats is None else stats["peak_bytes_in_use"] / 2 ** 20


METHOD = (
    f"oom_bisection(step={STEP_MB}MB, hbm={HBM_TOTAL_MB}MB): "
    "peak = HBM - largest coexisting filler; includes weights "
    "+ inputs + runtime overhead; one probe per process (a single OOM "
    "trial poisons the axon runtime for the rest of the process, so "
    "post-first-OOM trials conservatively read as OOM — upper bias "
    "<= 1 step)")


def probe(name: str, img: int, embed: int, lr: int, direction: str) -> float:
    """One bisection in THIS process; returns peak MB (nan = never fits)."""
    from naf_tpu.models.registry import ModelWrapper

    dtype = jnp.bfloat16
    wrapper = ModelWrapper(
        name, embed_dim=embed, ratio=img // lr,
        init_shapes=((1, img, img, 3), (1, lr, lr, embed), (img, img)),
    )
    model = wrapper.model
    params = jax.tree.map(lambda a: a.astype(dtype), wrapper.params)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (1, img, img, 3), dtype)
    feats = jax.random.normal(key, (1, lr, lr, embed), dtype)

    def fwd(p, im, ft):
        return model.apply({"params": p}, im, ft, (img, img))

    def loss(p, im, ft):
        return jnp.sum(fwd(p, im, ft).astype(jnp.float32) ** 2)

    fn = jax.jit(fwd) if direction == "fwd" else jax.jit(jax.grad(loss))
    return bisect_peak_mb(fn, (params, image, feats))


def main():
    """Orchestrate: one subprocess per (config, direction) — after any OOM
    trial the axon runtime rejects all further allocations in that process
    (observed: even persistent-cache reads fail RESOURCE_EXHAUSTED), so
    every probe gets a fresh process."""
    import subprocess

    out = {}
    for name, img, embed, lr in CONFIGS:
        row = {}
        for direction in ("fwd", "bwd"):
            r = subprocess.run(
                [sys.executable, __file__, "probe", name, str(img),
                 str(embed), str(lr), direction],
                capture_output=True, text=True, timeout=900)
            line = (r.stdout.strip().splitlines() or [""])[-1]
            try:
                row[f"{direction}_peak_mb"] = json.loads(line)["peak_mb"]
            except (json.JSONDecodeError, KeyError):
                row[f"{direction}_error"] = (
                    (r.stderr or r.stdout).strip()[-200:] or "no output")
        if "fwd_peak_mb" in row or "bwd_peak_mb" in row:
            row["method"] = METHOD
        out[f"{name}_{img}_{embed}_{lr}"] = row
        print(name, img, row, flush=True)

    # merge onto results.json rows
    path = "benchmarks/results.json"
    rows = json.load(open(path))
    for name, img, embed, lr in CONFIGS:
        r = out[f"{name}_{img}_{embed}_{lr}"]
        if "fwd_peak_mb" not in r:
            continue
        for row in rows:
            if (row.get("model") == name and row.get("img_size") == img
                    and row.get("embed_dim") == embed
                    and row.get("lr_size") == lr
                    and row.get("dtype") == "bfloat16"):
                row["fwd_mem_measured_mb"] = r.get("fwd_peak_mb")
                row["bwd_mem_measured_mb"] = r.get("bwd_peak_mb")
                row["mem_measured_method"] = r["method"]
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    with open("benchmarks/measured_mem.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "probe":
        _, _, name, img, embed, lr, direction = sys.argv
        peak = probe(name, int(img), int(embed), int(lr), direction)
        print(json.dumps({"peak_mb": round(peak, 1)}))
    else:
        main()

"""Device-measured peak HBM for headline bench rows (VERDICT r3 item 8).

The sweep's `fwd_mem_mb`/`bwd_mem_mb` columns are XLA `memory_analysis()`
of the compiled executable (argument + temp + output sizes) — analytical,
not runtime. This probe grounds them with a device-side measurement. The
reference's comparable number is torch `max_memory_allocated`
(test/forward_memory.py:29-35).

Primary path: `device.memory_stats()['peak_bytes_in_use']` deltas around
the real execution. The axon tunnel returns None for memory_stats, so the
fallback is allocate-to-OOM bisection: hold a filler buffer of F bytes
while executing the program; the largest F that coexists with a successful
run bounds the program's true peak at HBM_total - F (resolution = the
bisection step). Coarse but *measured* — it reflects the runtime
allocator, padding, and fragmentation that memory_analysis cannot see.

CRITICAL PROCESS STRUCTURE: one (filler, execute) TRIAL per subprocess.
A single OOM poisons the axon runtime for the rest of its process (every
later allocation — even persistent-cache reads — fails RESOURCE_EXHAUSTED),
so a whole bisection inside one process self-invalidates: after the first
OOM every trial reads as OOM and the search pins to a power-of-two rail.
The parent drives the bisection; each child does exactly one trial and
reports pass/fail, so post-OOM state never leaks between trials and the
<= 1-step (STEP_MB) bias claim actually holds. The persistent compile cache
keeps per-trial cost at process startup + cache read + one execution.

For each headline config it records analytical + measured fwd/bwd peaks
and merges `fwd_mem_measured_mb` / `bwd_mem_measured_mb` (+ method and a
git-revision stamp) onto the matching benchmarks/results.json rows (the
sweep merge carries these fields across later refreshes).

Run: python tools/measure_mem.py   (on the real TPU)
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

# (model, img, embed, lr, out) — headline rows: r16 and r32 for NAF +
# JAFAR. Reference protocol (test/test_utils.py:79-83): guidance image is
# (img, img), output is (ratio*lr, ratio*lr); the r32 row keeps the 448^2
# guidance and only grows the output.
CONFIGS = [
    ("NAF", 448, 384, 28, 448),
    ("NAF", 448, 384, 28, 896),
    ("JAFAR", 448, 384, 28, 448),
    ("JAFAR", 448, 384, 28, 896),
]

HBM_TOTAL_MB = 16 * 1024  # one v5e chip
STEP_MB = 256  # bisection resolution

METHOD = (
    f"oom_bisection(step={STEP_MB}MB, hbm={HBM_TOTAL_MB}MB): "
    "peak = HBM - largest coexisting filler; includes weights "
    "+ inputs + runtime overhead; ONE (filler, execute) trial per "
    "subprocess (an OOM poisons the axon runtime for its whole process, "
    "so in-process bisection would pin to rails); uncertainty "
    f"<= {STEP_MB}MB upward")


def _trial(name: str, img: int, embed: int, lr: int, out: int,
           direction: str, filler_mb: int) -> bool:
    """Run ONE (filler, execute) trial in THIS process. True iff it fits."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/naf_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from naf_tpu.models.registry import ModelWrapper

    dtype = jnp.bfloat16
    wrapper = ModelWrapper(
        name, embed_dim=embed, ratio=out // lr,
        init_shapes=((1, img, img, 3), (1, lr, lr, embed), (out, out)),
    )
    model = wrapper.model
    params = jax.tree.map(lambda a: a.astype(dtype), wrapper.params)
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (1, img, img, 3), dtype)
    feats = jax.random.normal(key, (1, lr, lr, embed), dtype)

    def fwd(p, im, ft):
        return model.apply({"params": p}, im, ft, (out, out))

    def loss(p, im, ft):
        return jnp.sum(fwd(p, im, ft).astype(jnp.float32) ** 2)

    fn = jax.jit(fwd) if direction == "fwd" else jax.jit(jax.grad(loss))

    try:
        filler = None
        if filler_mb:
            filler = jnp.zeros((filler_mb, 2 ** 20 // 4), jnp.float32)
            filler.block_until_ready()
        result = fn(params, image, feats)
        # force completion through the tunnel: fetch a scalar
        leaf = jax.tree_util.tree_leaves(result)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))
        del filler
        return True
    except Exception as e:  # RESOURCE_EXHAUSTED surfaces as XlaRuntimeError
        msg = str(e)
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg \
                or "OOM" in msg or "exceeds the" in msg:
            return False
        raise


def _run_trial(name, img, embed, lr, out, direction, filler_mb) -> bool:
    """One trial in a FRESH subprocess; returns whether it fit."""
    r = subprocess.run(
        [sys.executable, __file__, "trial", name, str(img), str(embed),
         str(lr), str(out), direction, str(filler_mb)],
        capture_output=True, text=True, timeout=900)
    line = (r.stdout.strip().splitlines() or [""])[-1]
    try:
        return bool(json.loads(line)["ok"])
    except (json.JSONDecodeError, KeyError):
        raise RuntimeError(
            f"trial subprocess failed ({name} {img}->{out} {direction} "
            f"filler={filler_mb}): {(r.stderr or r.stdout).strip()[-400:]}")


def bisect_peak_mb(name, img, embed, lr, out, direction) -> float:
    """Largest filler coexisting with the run -> peak = HBM_total - filler.

    Every trial is its own subprocess (see module docstring). Geometric
    first touch (halving from full HBM) then standard bisection to STEP_MB.
    """
    if not _run_trial(name, img, embed, lr, out, direction, 0):
        return float("nan")  # doesn't fit at all (caller records error)
    lo, hi = 0, HBM_TOTAL_MB  # lo = known-good filler, hi = known-bad
    while hi - lo > STEP_MB:
        mid = (lo + hi) // 2
        if _run_trial(name, img, embed, lr, out, direction, mid):
            lo = mid
        else:
            hi = mid
        print(f"  {name} {img}->{out} {direction}: filler bracket "
              f"({lo}, {hi}] MB", flush=True)
    return float(HBM_TOTAL_MB - lo)


def _merge_results(out, rev):
    """Merge measured peaks onto matching benchmarks/results.json rows."""
    path = "benchmarks/results.json"
    rows = json.load(open(path))
    for name, img, embed, lr, osz in CONFIGS:
        r = out.get(f"{name}_{img}_{embed}_{lr}_{osz}", {})
        if "fwd_peak_mb" not in r:
            continue
        for row in rows:
            if (row.get("model") == name and row.get("img_size") == img
                    and row.get("embed_dim") == embed
                    and row.get("lr_size") == lr
                    and row.get("out_size", row.get("ratio", 0) * lr) == osz
                    and row.get("dtype") == "bfloat16"):
                row["fwd_mem_measured_mb"] = r.get("fwd_peak_mb")
                row["bwd_mem_measured_mb"] = r.get("bwd_peak_mb")
                row["mem_measured_method"] = METHOD
                row["mem_measured_at"] = rev
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)


def main(only=()):
    """Parent orchestrator: drives one bisection per (config, direction),
    each trial in a fresh subprocess. `only` (substring filters on the
    config key, e.g. "JAFAR" or "448_384_28_896") restricts the queue so an
    interrupted run can resume. measured_mem.json is merged + rewritten
    after EVERY config so an interrupt never loses finished bisections."""
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True).stdout.strip()
    mm_path = "benchmarks/measured_mem.json"
    out = {}
    if os.path.exists(mm_path):
        out = json.load(open(mm_path))
    out["_method"] = METHOD
    out["_measured_at"] = rev
    for name, img, embed, lr, osz in CONFIGS:
        key = f"{name}_{img}_{embed}_{lr}_{osz}"
        if only and not any(f in key for f in only):
            continue
        row = {}
        for direction in ("fwd", "bwd"):
            try:
                peak = bisect_peak_mb(name, img, embed, lr, osz, direction)
                row[f"{direction}_peak_mb"] = round(peak, 1)
            except RuntimeError as e:
                row[f"{direction}_error"] = str(e)[-200:]
        out[key] = row
        print(name, img, "->", osz, row, flush=True)
        with open(mm_path, "w") as f:
            json.dump(out, f, indent=1)
        _merge_results(out, rev)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "trial":
        _, _, name, img, embed, lr, out, direction, filler_mb = sys.argv
        ok = _trial(name, int(img), int(embed), int(lr), int(out),
                    direction, int(filler_mb))
        print(json.dumps({"ok": ok}))
    else:
        main(tuple(sys.argv[1:]))

"""Run the eval harnesses end-to-end on the committed real-image shard.

The environment has no network egress, so no true ADE20K/DAVIS split (or
pretrained backbone weights) can be staged. benchmarks/real_shard/ holds
real photographs with deterministic procedural annotations in the exact
ADE20K/DAVIS directory layouts (tools/build_real_shard.py) — this script
drives the REAL dataset readers, transforms, probe trainer, label
propagation, and J&F/mIoU metric code on real pixels and records the
numbers, converting "plumbing exists" into "harness verified".

Interpretation: the backbone is random-init (no weights reachable), labels
are machine-made; absolute numbers measure harness correctness and the
RELATIVE effect of the upsampler (NAF vs bilinear over identical features),
not leaderboard standing. Reference harnesses being mirrored:
evaluation/eval_seg_probing.py, evaluation/eval_video_seg.py:646-757.

Usage:
    python evaluation/eval_real_shard.py            # all evals
    python evaluation/eval_real_shard.py seg        # probing only
    python evaluation/eval_real_shard.py video      # DAVIS J&F only

Writes benchmarks/real_eval.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHARD = os.path.join(REPO, "benchmarks", "real_shard")
OUT = os.path.join(REPO, "benchmarks", "real_eval.json")


def run_seg(results):
    import eval_seg_probing

    for model in ("naf", "bilinear"):
        argv = [
            f"model={model}",
            "dataset=ade20k",
            f"dataset.root={os.path.join(SHARD, 'ade20k')}",
            "dataset.num_classes=7",
            "img_size=256",
            "num_epochs=8",
            "train_dataloader.batch_size=2",
            "val_dataloader.batch_size=1",
            "backbone.name=vit_small_patch16_224",
        ]
        print(f"== seg probing: {model} ==", flush=True)
        results[f"seg_probing_{model}"] = eval_seg_probing.main(argv)


def run_video(results):
    import eval_video_seg

    argv = [
        "model=naf",
        f"dataroot={SHARD}",
        f"dataset.root={os.path.join(SHARD, 'davis')}",
        "eval.ups_factor=2",
        "backbone.name=vit_small_patch16_224",
        "run_dir=/tmp/naf_real_shard_runs",
    ]
    print("== DAVIS propagation: naf ==", flush=True)
    results["davis_jf_naf"] = eval_video_seg.main(argv)


def main(argv):
    which = set(argv) or {"seg", "video"}
    results = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    results["_provenance"] = (
        "real photographs (sklearn/matplotlib bundled samples), procedural "
        "k-means annotations, random-init backbone (no egress); see "
        "tools/build_real_shard.py. Numbers verify the harnesses and the "
        "relative upsampler effect, not leaderboard standing."
    )
    if "seg" in which:
        run_seg(results)
    if "video" in which:
        run_video(results)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])

"""B=512 TPU-recipe convergence-parity validation (VERDICT r4 Next #5).

Trains the shipped large-batch fast-train recipe
(`configs/uncond/diffusion_bedrooms_instancond_lat32_v_b512_tpu.yaml`:
B=512, lr 4e-4, bf16_turbo fast-train options, EMA) on the SAME synthetic
full-dress dataset as the round-5 eval-protocol run
(tools/eval_protocol_r5.py), for the SAME number of epochs, then generates
1000 scenes and computes the same quality metrics (categorical KL vs the
dataset marginals + pixel-FID vs the GT renders).  Parity = the B=512
recipe's CKL/FID within split noise of the B=128 protocol run's
(EVAL_r05.json) — recorded to B512_RECIPE_r05.json.

Usage: python tools/b512_recipe_r5.py [workdir-of-eval-protocol]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import yaml

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_r5"
OUT_JSON = "/root/repo/B512_RECIPE_r05.json"
TRAIN_EPOCHS = 160  # same epoch budget as the protocol run (4x fewer steps)

data_dir = os.path.join(WORK, "cached")
gt_dir = os.path.join(WORK, "gt_renders")
assert os.path.isdir(data_dir), "run tools/eval_protocol_r5.py first"

report = {"workdir": WORK, "epochs": TRAIN_EPOCHS, "stages": {}}


def stage(name):
    print(f"\n=== {name} ===", flush=True)
    return time.perf_counter()


def done(name, t0, **extra):
    dt = time.perf_counter() - t0
    report["stages"][name] = {"seconds": round(dt, 1), **extra}
    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=1)
    print(f"=== {name}: {dt:.1f}s ===", flush=True)


cfg = yaml.safe_load(open(
    "/root/repo/configs/uncond/diffusion_bedrooms_instancond_lat32_v_b512_tpu.yaml"))
cfg["data"].update(dataset_directory=data_dir,
                   annotation_file=os.path.join(data_dir, "splits.csv"))
del cfg["data"]["path_to_invalid_scene_ids"], cfg["data"]["path_to_invalid_bbox_jids"]
del cfg["data"]["filter_fn"]
cfg["training"].update(epochs=TRAIN_EPOCHS, save_frequency=40)
cfg["validation"].update(frequency=10_000)
cfg_path = os.path.join(WORK, "config_b512.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)

t0 = stage("train_b512")
from diffuscene_tpu.cli.train_diffusion import main as train_main

exp_dir = os.path.join(WORK, "exp")
ckpt_dir = os.path.join(exp_dir, "protocol_b512")
if not os.path.isdir(ckpt_dir) or not any(
        d.startswith("model_") for d in os.listdir(ckpt_dir)):
    train_main([cfg_path, exp_dir, "--experiment_tag", "protocol_b512",
                "--steps_per_dispatch", "4", "--log_every", "20"])
done("train_b512", t0)

t0 = stage("generate_1000_b512")
from diffuscene_tpu.cli.generate_diffusion import main as gen_main

gen_dir = os.path.join(WORK, "gen_b512")
# --no_ema: 1560 steps << the 0.9999-EMA's ~10k-step horizon (see the
# eval-protocol driver's note; the shipped config's EMA is sized for the
# reference's 60k-epoch production runs)
gen_main([cfg_path, gen_dir, "--weight_file", ckpt_dir, "--no_ema",
          "--n_sequences", "1000", "--batch_size", "250",
          "--clip_denoised", "--fused", "--render", "--compute_intersec",
          "--seed", "0"])
done("generate_1000_b512", t0)

metrics_json = os.path.join(gen_dir, "metrics.json")
if os.path.isfile(metrics_json):
    report["generate_metrics_b512"] = json.load(open(metrics_json))

# pixel-FID vs the same GT renders as the protocol run
import contextlib
import io


def run_cli(main, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(argv)
    out = buf.getvalue()
    print(out[-1500:], flush=True)
    for line in reversed(out.strip().splitlines()):
        if line.strip().startswith("{"):
            return json.loads(line.strip())
    return {}


t0 = stage("fid_b512")
from diffuscene_tpu.cli.compute_fid_scores import main as fid_main

report["fid_b512_pixel"] = run_cli(
    fid_main, [gt_dir, gen_dir, "--compare_all", "--features", "pixel"])
done("fid_b512", t0)

# pull the B=128 protocol numbers for the side-by-side
proto = "/root/repo/EVAL_r05.json"
if os.path.isfile(proto):
    p = json.load(open(proto))
    report["protocol_b128_reference"] = {
        "generate_metrics": p.get("generate_metrics"),
        "fid_protocol_pixel": p.get("fid_protocol_pixel"),
        "fid_control_half_vs_half_pixel": p.get("fid_control_half_vs_half_pixel"),
    }
with open(OUT_JSON, "w") as f:
    json.dump(report, f, indent=1)
print("\nDONE ->", OUT_JSON, flush=True)

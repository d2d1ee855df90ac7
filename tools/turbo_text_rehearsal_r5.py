"""Turbo fast-train recipe on the TEXT-CONDITIONED family (round-5
insurance): the fused low-precision optimizer / bf16 grads / WSDense fast
VJP / bf16 EMA are family-independent Trainer+denoiser options, but the
text family additionally runs cross-attention in the backward — this
rehearses train (cli.train_diffusion) + fused conditional generation
(cli.generate_diffusion) end-to-end on the synthetic fixture with ALL
round-5 options on.  Writes TURBO_TEXT_r05.json.

Usage: python tools/turbo_text_rehearsal_r5.py [workdir]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import yaml

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/turbo_text_r5"
OUT = "/root/repo/TURBO_TEXT_r05.json"
os.makedirs(WORK, exist_ok=True)
report = {"workdir": WORK, "stages": {}}

from diffuscene_tpu.data import make_synthetic_cached_dataset

data_dir = os.path.join(WORK, "cached")
if not os.path.isdir(data_dir):
    make_synthetic_cached_dataset(data_dir, n_scenes=512, max_objects=12, seed=0)

cfg = yaml.safe_load(open(
    "/root/repo/configs/text/diffusion_bedrooms_instancond_lat32_v_bert.yaml"))
cfg["data"].update(dataset_directory=data_dir,
                   annotation_file=os.path.join(data_dir, "splits.csv"))
for k in ("path_to_invalid_scene_ids", "path_to_invalid_bbox_jids", "filter_fn"):
    cfg["data"].pop(k, None)
# smaller denoiser for a fast rehearsal; ALL round-5 fast-train options on
cfg["network"]["net_kwargs"].update(
    dim=256, compute_dtype="bfloat16", exact_gelu=False, ws_fast_vjp=True)
cfg["training"].update(
    epochs=25, save_frequency=25, batch_size=128,
    fused_adam=True, adam_moment_dtype="bfloat16", grads_dtype="bfloat16",
    ema_decay=0.995, ema_dtype="bfloat16")
cfg["validation"].update(frequency=10_000, gen_gt=False)
cfg_path = os.path.join(WORK, "config.yaml")
with open(cfg_path, "w") as f:
    yaml.safe_dump(cfg, f)

t0 = time.perf_counter()
from diffuscene_tpu.cli.train_diffusion import main as train_main

exp_dir = os.path.join(WORK, "exp")
train_main([cfg_path, exp_dir, "--experiment_tag", "turbo_text",
            "--steps_per_dispatch", "4", "--log_every", "20"])
report["stages"]["train"] = {"seconds": round(time.perf_counter() - t0, 1)}
with open(OUT, "w") as f:
    json.dump(report, f, indent=1)

t0 = time.perf_counter()
from diffuscene_tpu.cli.generate_diffusion import main as gen_main

gen_dir = os.path.join(WORK, "gen")
gen_main([cfg_path, gen_dir, "--weight_file", os.path.join(exp_dir, "turbo_text"),
          "--n_sequences", "128", "--batch_size", "64",
          "--clip_denoised", "--fused", "--render", "--seed", "0"])
report["stages"]["generate"] = {"seconds": round(time.perf_counter() - t0, 1)}
report["generate_metrics"] = json.load(open(os.path.join(gen_dir, "metrics.json")))
with open(OUT, "w") as f:
    json.dump(report, f, indent=1)
print("DONE", json.dumps(report["generate_metrics"]), flush=True)

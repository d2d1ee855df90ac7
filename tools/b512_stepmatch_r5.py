"""Step-matched extension of the B=512 recipe validation: continue the
tools/b512_recipe_r5.py run from epoch 160 to 640 epochs (= the SAME ~6.2k
optimizer steps as the B=128 protocol run, i.e. 4x the scenes seen), then
regenerate and re-score.  Rationale: at 1560 steps the run is
optimization-limited, not data-limited — equal-epoch comparison conflates
the two (measured CKL 0.104 vs 0.031); equal-step is the standard
large-batch comparison.  Appends rows to B512_RECIPE_r05.json.

Usage: python tools/b512_stepmatch_r5.py [workdir]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_r5"
OUT_JSON = "/root/repo/B512_RECIPE_r05.json"
report = json.load(open(OUT_JSON))
cfg_path = os.path.join(WORK, "config_b512.yaml")
exp_dir = os.path.join(WORK, "exp")
ckpt_dir = os.path.join(exp_dir, "protocol_b512")
gt_dir = os.path.join(WORK, "gt_renders")

t0 = time.perf_counter()
from diffuscene_tpu.cli.train_diffusion import main as train_main

# auto-resumes from the epoch-160 checkpoint in ckpt_dir
train_main([cfg_path, exp_dir, "--experiment_tag", "protocol_b512",
            "--steps_per_dispatch", "4", "--log_every", "20",
            "--epochs", "640"])
report["stages"]["train_b512_to_640"] = {"seconds": round(time.perf_counter() - t0, 1)}
with open(OUT_JSON, "w") as f:
    json.dump(report, f, indent=1)

t0 = time.perf_counter()
from diffuscene_tpu.cli.generate_diffusion import main as gen_main

gen_dir = os.path.join(WORK, "gen_b512_stepmatch")
gen_main([cfg_path, gen_dir, "--weight_file", ckpt_dir, "--no_ema",
          "--n_sequences", "1000", "--batch_size", "250",
          "--clip_denoised", "--fused", "--render", "--compute_intersec",
          "--seed", "0"])
report["stages"]["generate_1000_b512_stepmatch"] = {
    "seconds": round(time.perf_counter() - t0, 1)}
report["generate_metrics_b512_stepmatch"] = json.load(
    open(os.path.join(gen_dir, "metrics.json")))

import contextlib
import io

from diffuscene_tpu.cli.compute_fid_scores import main as fid_main

buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    fid_main([gt_dir, gen_dir, "--compare_all", "--features", "pixel"])
for line in reversed(buf.getvalue().strip().splitlines()):
    if line.strip().startswith("{"):
        report["fid_b512_stepmatch_pixel"] = json.loads(line.strip())
        break
with open(OUT_JSON, "w") as f:
    json.dump(report, f, indent=1)
print("DONE", json.dumps({
    "ckl": report["generate_metrics_b512_stepmatch"]["categorical_kl"],
    "fid": report["fid_b512_stepmatch_pixel"]["fid"]}), flush=True)

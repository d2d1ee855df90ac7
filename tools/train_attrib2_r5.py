"""Second round-5 attribution pass: attention + GroupNorm backward bounds.

Runs loss-only / grad-only k-scan programs for bf16 (baseline),
bf16_noattn (attention blocks + their pre-norms dropped) and bf16_nonorm
(resblock GroupNorms dropped).  These ablations CHANGE the param tree, so
each delta bounds that piece's total fwd+bwd cost (its optimizer share is
excluded — only loss/grad programs are run, no full steps).

Usage:  python tools/train_attrib2_r5.py [k] [B] [out.json]
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench import _train_setup
from diffuscene_tpu.train.optim import f32_global_norm

K = int(sys.argv[1]) if len(sys.argv) > 1 else 32
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/train_attrib2_r5.json"
N_WINDOWS = 4

results = {"k": K, "B": B, "device": str(jax.devices()[0]), "rows": {}}


def _stacked(trainer, k, B):
    rng = np.random.default_rng(7)
    return trainer.put_batches([{
        "translations": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "sizes": rng.uniform(-1, 1, (B, 12, 3)).astype(np.float32),
        "angles": rng.uniform(-1, 1, (B, 12, 2)).astype(np.float32),
        "class_labels": (rng.integers(0, 2, (B, 12, 22)) * 2 - 1).astype(np.float32),
        "objfeats_32": rng.normal(0, 1, (B, 12, 32)).astype(np.float32),
    } for _ in range(k)])


def _time_windows(run, label):
    run()
    run()
    windows = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        windows.append((time.perf_counter() - t0) / K * 1e3)
    results["rows"][label] = {
        "ms_per_step_best": round(min(windows), 4),
        "windows_ms": [round(w, 4) for w in windows],
    }
    print(label, results["rows"][label], flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def loss_or_grad(variant, mode):
    trainer, state, _ = _train_setup(variant, B)
    stacked = _stacked(trainer, K, B)
    key = jax.random.PRNGKey(1)
    params = state.params
    scene = trainer.scene

    @jax.jit
    def prog(p_arg, stacked):
        def body_loss(carry, batch):
            k2 = jax.random.fold_in(key, carry)
            loss, _ = scene.get_loss(p_arg, batch, k2)
            return carry + 1, loss

        def body_grad(carry, batch):
            k2 = jax.random.fold_in(key, carry)

            def lf(p):
                return scene.get_loss(p, batch, k2)

            (loss, _), grads = jax.value_and_grad(lf, has_aux=True)(p_arg)
            return carry + 1, f32_global_norm(grads) + loss

        body = body_loss if mode == "loss" else body_grad
        _, outs = jax.lax.scan(body, jnp.zeros((), jnp.int32), stacked)
        return outs.mean()

    def run():
        return prog(params, stacked)

    _time_windows(run, f"{mode}:{variant}")


for v in ("bf16", "bf16_noattn", "bf16_nonorm"):
    loss_or_grad(v, "loss")
    loss_or_grad(v, "grad")

with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
print("DONE", OUT, flush=True)

"""Round-5 train-step attribution + optimizer experiments on real TPU.

Measures, via dispatch-insensitive k-step lax.scan windows (the only timing
method that survives the remote tunnel — see docs/PERFORMANCE.md):

  PHASE A  backward attribution (VERDICT r4 Next #2):
    - loss-only / grad-only / full-step scans for: bf16 (baseline),
      bf16_wsvjp (residual-light WS standardization VJP),
      bf16_nostd (no weight standardization — cost upper bound)
  PHASE B  optimizer chain (VERDICT r4 Next #1):
    - optimizer-only scans for: baseline optax chain, fused_clip_adam
      (f32 moments), fused + bf16 moments (+ bf16 grads feed)
    - full-step scans for bf16_fusedopt / bf16_lowp / bf16_turbo

Usage:  python tools/train_attrib_r5.py [k] [B] [out.json]
Writes one JSON with every window time; run with an otherwise-idle host.
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
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/train_attrib_r5.json"
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
    run()  # warmup 1 (compile)
    run()  # warmup 2 (recompile quirk)
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
    return min(windows)


def full_step(variant, label=None):
    trainer, state, _ = _train_setup(variant, B)
    stacked = _stacked(trainer, K, B)
    key = jax.random.PRNGKey(1)
    holder = {"state": state}

    def run():
        s, m = trainer.train_step_scan(holder["state"], stacked, key)
        holder["state"] = s
        return m["loss"]

    return _time_windows(run, label or f"full:{variant}")


def loss_or_grad(variant, mode):
    trainer, state, _ = _train_setup(variant, B)
    stacked = _stacked(trainer, K, B)
    key = jax.random.PRNGKey(1)
    params = state.params
    scene = trainer.scene

    # params must be an ARGUMENT: closed-over they end up as HLO literals
    # and blow the remote-compile request size limit (HTTP 413)
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

    return _time_windows(run, f"{mode}:{variant}")


def opt_only(label, tcfg_extra, grads_dtype=None):
    """Optimizer-chain-only scan: k updates of (params, opt_state) with a
    fixed gradient tree (state evolves, so no iteration can be skipped).
    Includes the trainer's separate gnorm metric pass, like the real step."""
    trainer, state, _ = _train_setup("bf16", B)
    from diffuscene_tpu.train.optim import optimizer_factory
    import optax

    tcfg = {"optimizer": "Adam", "lr": 2e-4, "schedule": "step",
            "lr_step": 10000, "lr_decay": 0.5, "max_grad_norm": 10.0}
    tcfg.update(tcfg_extra)
    tx = optimizer_factory(tcfg, 500)
    params = state.params
    gd = grads_dtype or jnp.float32
    base_grads = jax.tree.map(
        lambda p: (0.01 * jnp.ones_like(p)).astype(gd), params)
    opt_state = tx.init(params)

    # grads must VARY per iteration (g + eps(i), an in-register add) or XLA
    # hoists the whole norm/update algebra out of the loop — the first run
    # of this script measured a physically impossible 0.12 ms/step with
    # constant grads.  The final output must depend on the final state.
    def prog(params, opt_state, grads):
        def body(carry, i):
            p, s = carry
            g = jax.tree.map(
                lambda x: x + (1e-9 * i.astype(jnp.float32)).astype(x.dtype),
                grads)
            gnorm = f32_global_norm(g)
            updates, s = tx.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), gnorm

        (p, s), gn = jax.lax.scan(
            body, (params, opt_state), jnp.arange(K, dtype=jnp.int32))
        return f32_global_norm(p) + gn.mean()

    jprog = jax.jit(prog, donate_argnums=(0, 1))
    holder = {}

    def run():
        if "p" not in holder:
            holder["p"] = jax.tree.map(jnp.copy, params)
            holder["s"] = tx.init(holder["p"])
        out = jprog(holder["p"], holder["s"], base_grads)
        del holder["p"], holder["s"]  # donated; rebuild next call
        return out

    return _time_windows(run, f"opt:{label}")


print(json.dumps({"k": K, "B": B}), flush=True)

# --- PHASE B first: optimizer-only rows are the cheapest compiles ---
opt_only("chain_f32", {})
opt_only("fused_f32", {"fused_adam": True})
opt_only("fused_bf16mom", {"fused_adam": True, "adam_moment_dtype": "bfloat16"})
opt_only("fused_bf16mom_bf16g",
         {"fused_adam": True, "adam_moment_dtype": "bfloat16"},
         grads_dtype=jnp.bfloat16)

# --- PHASE A: forward / backward attribution ---
for v in ("bf16", "bf16_wsvjp", "bf16_nostd"):
    loss_or_grad(v, "loss")
    loss_or_grad(v, "grad")

# --- full steps ---
for v in ("bf16", "bf16_fusedopt", "bf16_lowp", "bf16_wsvjp", "bf16_turbo"):
    full_step(v)

# re-measure the baseline to detect chip time-slicing drift across the run
full_step("bf16", label="full:bf16_recheck")

with open(OUT, "w") as f:
    json.dump(results, f, indent=1)
print("DONE", OUT, flush=True)

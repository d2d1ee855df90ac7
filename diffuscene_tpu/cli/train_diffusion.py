"""Train the scene-layout diffusion model.

CLI equivalent of `scripts/train_diffusion.py:27-256`: datasets from config,
bounds export, epoch loop with per-epoch LR schedule, periodic checkpoints
and validation, stats logging.  The per-batch work runs as one donated jitted
XLA program (see `train/trainer.py`); batches stream from the host pipeline
with prefetch.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a scene diffusion model (TPU)")
    parser.add_argument("config_file", help="Path to the YAML config")
    parser.add_argument("output_directory", help="Where to save checkpoints/logs")
    parser.add_argument("--experiment_tag", default=None)
    parser.add_argument("--continue_from_epoch", type=int, default=0)
    parser.add_argument("--weight_file", default=None,
                        help="warm-start the model weights before training "
                        "(reference train_diffusion.py:41,181): a torch "
                        ".pt/.pth state_dict (converted) or an experiment dir "
                        "with model_* checkpoints (params + EMA only; the "
                        "optimizer starts fresh, like the reference)")
    parser.add_argument("--n_processes", type=int, default=0,
                        help="accepted for reference drop-in compatibility "
                        "(DataLoader workers there, train_diffusion.py:53); "
                        "host batching here is a prefetch thread + the "
                        "optional C++ --native_loader")
    parser.add_argument("--seed", type=int, default=27)
    parser.add_argument("--epochs", type=int, default=None, help="override config epochs")
    parser.add_argument("--with_wandb_logger", action="store_true")
    parser.add_argument("--native_loader", action="store_true",
                        help="use the C++ fused batch encoder (uncond diffusion "
                        "encodings only; delivers packed targets)")
    parser.add_argument("--log_every", type=int, default=10,
                        help="fetch metrics to host every N batches; between "
                        "fetches the device pipeline runs fully async")
    parser.add_argument("--mixed_precision", action="store_true",
                        help="cast params to bf16 once per step outside the "
                        "grad (train/trainer.py); only meaningful with a "
                        "bf16 compute_dtype network config")
    parser.add_argument("--async_checkpoints", action="store_true",
                        help="save epoch checkpoints on a background thread "
                        "(orbax AsyncCheckpointer) so the train loop overlaps "
                        "checkpoint I/O with compute")
    parser.add_argument("--keep_last_checkpoints", type=int, default=None,
                        help="retain only the N highest-epoch checkpoints "
                        "(default: keep all, like the reference)")
    parser.add_argument("--steps_per_dispatch", type=int, default=1,
                        help="run N train steps as ONE jitted lax.scan "
                        "dispatch (train/trainer.py train_step_scan) — "
                        "amortizes host dispatch, which dominates short "
                        "steps through remote TPU tunnels; logging/metrics "
                        "then advance once per dispatch")
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of steady-state "
                        "training steps to this directory (XProf/TensorBoard)")
    parser.add_argument("--profile_steps", type=int, default=20,
                        help="how many steps the --profile_dir capture spans")
    args = parser.parse_args(argv)

    from ..data.factory import get_dataset_raw_and_encoded, get_encoded_dataset
    from ..data.loader import DataLoader
    from ..models.scene_model import SceneDiffusion, SceneModelConfig
    from ..train.trainer import Trainer
    from ..utils import (
        StatsLogger, WandB, load_config, save_bounds, save_checkpoint,
        wait_for_checkpoints,
        load_checkpoint, save_experiment_params,
    )

    config = load_config(args.config_file)
    from ..data.factory import apply_text_emb_dim_default

    apply_text_emb_dim_default(config)
    np.random.seed(args.seed)

    experiment_tag = args.experiment_tag or os.path.basename(args.config_file).rsplit(".", 1)[0]
    experiment_dir = os.path.join(args.output_directory, experiment_tag)
    os.makedirs(experiment_dir, exist_ok=True)
    save_experiment_params(args, experiment_tag, experiment_dir)

    # datasets (train_diffusion.py:100-163); room masks ride the batches only
    # when the model conditions on them (diffusion_scene_layout_ddpm.py:27-33)
    keep_rl = bool(config["network"].get("room_mask_condition", True))
    train_raw, train_ds = get_dataset_raw_and_encoded(
        config["data"],
        augmentations=config["data"].get("augmentations"),
        split=config["training"].get("splits", ["train", "val"]),
        seed=args.seed,
        keep_room_layout=keep_rl,
    )
    val_ds = get_encoded_dataset(
        {**config["data"], "encoding_type": config["data"]["encoding_type"]},
        augmentations=None,
        split=config["validation"].get("splits", ["test"]),
        seed=args.seed,
        keep_room_layout=keep_rl,
    )
    bounds = train_ds.bounds.as_device_bounds()
    save_bounds(experiment_dir, bounds)

    net_cfg = dict(config["network"])
    net_cfg.setdefault("sample_num_points", train_ds.max_length)
    cfg = SceneModelConfig.from_config(net_cfg)
    scene = SceneDiffusion(cfg, bounds=bounds if cfg.loss_config.loss_iou else None)

    batch_size = int(config["training"].get("batch_size", 128))
    if args.native_loader:
        from ..data.loader import PackedDataLoader

        enc_name = config["data"]["encoding_type"]
        assert "text" not in enc_name, "native loader does not cover text encodings"
        train_loader = PackedDataLoader(
            train_raw, train_ds.bounds, max_length=train_ds.max_length,
            n_classes=train_ds.n_classes, batch_size=batch_size,
            rotation="fixed_rotations" if "fixed_rotations" in
            (config["data"].get("augmentations") or []) else None,
            seed=args.seed,
        )
    else:
        train_loader = DataLoader(train_ds, batch_size, shuffle=True, seed=args.seed)
    # drop_last so every eval batch shards evenly over the device mesh
    val_loader = DataLoader(val_ds, int(config["validation"].get("batch_size", batch_size)),
                            shuffle=False, drop_last=True)
    steps_per_epoch = max(len(train_loader), 1)

    trainer = Trainer(scene, config["training"], steps_per_epoch=steps_per_epoch,
                      mixed_precision=args.mixed_precision)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))

    # warm start (train_diffusion.py:181 loads --weight_file into the net
    # before the epoch loop; optimizer state starts fresh either way)
    if args.weight_file:
        if args.weight_file.endswith((".pt", ".pth")):
            from ..utils import convert_scene_model, load_torch_checkpoint

            state = state.replace(
                params=convert_scene_model(load_torch_checkpoint(args.weight_file)))
        else:
            warm, warm_epoch = load_checkpoint(state, args.weight_file)
            assert warm_epoch is not None, \
                f"--weight_file: no checkpoints under {args.weight_file}"
            state = state.replace(params=warm.params,
                                  ema_params=warm.ema_params)
        print(f"warm-started weights from {args.weight_file}")

    # resume (training_utils.py:62-87)
    state, resumed = load_checkpoint(state, experiment_dir)
    start_epoch = (resumed + 1) if resumed is not None else args.continue_from_epoch

    logger = WandB.instance() if args.with_wandb_logger else StatsLogger.instance()
    if args.with_wandb_logger:
        logger.init(args, None, project=config.get("logger", {}).get("project", "diffuscene_tpu"),
                    name=experiment_tag)
    stats_file = open(os.path.join(experiment_dir, "stats.txt"), "a")
    logger.add_output_file(stats_file)

    try:
        epochs = args.epochs if args.epochs is not None else int(config["training"].get("epochs", 1000))
        save_every = int(config["training"].get("save_frequency", 10))
        val_every = int(config["validation"].get("frequency", 100))
        key = jax.random.PRNGKey(args.seed)

        from ..utils import TraceWindow

        trace_window = (TraceWindow(args.profile_dir, length=args.profile_steps)
                        if args.profile_dir else None)
        gstep = 0
        spd = max(args.steps_per_dispatch, 1)
        log_every = max(args.log_every, 1)
        # steps executed since the last metrics fetch; primed so the first
        # dispatch of a run always logs (matches the b == 0 log at spd == 1)
        since_log = log_every
        for epoch in range(start_epoch, epochs):
            pending = []  # host batches awaiting a scan dispatch (spd > 1)
            n_batches = len(train_loader)
            for b, batch in enumerate(train_loader):
                if spd > 1:
                    pending.append(batch)
                    if len(pending) < spd and (b + 1) < n_batches:
                        continue
                    n_stepped = len(pending)
                    if n_stepped == 1:
                        state, metrics = trainer.train_step(
                            state, trainer.put_batch(pending[0]), key)
                    else:
                        state, metrics = trainer.train_step_scan(
                            state, trainer.put_batches(pending), key)
                    pending = []
                else:
                    n_stepped = 1
                    device_batch = trainer.put_batch(batch)
                    state, metrics = trainer.train_step(state, device_batch, key)
                if trace_window is not None:
                    trace_window.tick(gstep)
                gstep += n_stepped
                since_log += n_stepped
                # fetch metrics only every log_every STEPS, as ONE transfer —
                # per-metric float() costs a device round-trip each, which
                # serializes the pipeline (measured 600 ms/step vs 47 ms compute
                # through the TPU tunnel).  Counted in steps (not loader
                # iterations) so grouped dispatches (spd > 1) still log: with
                # spd=8 / log_every=10, `b % 10 == 0` never lands on a
                # dispatch iteration.
                if since_log >= log_every:
                    since_log = 0
                    host_metrics = jax.device_get(metrics)
                    loss = float(host_metrics["loss"])
                    if not np.isfinite(loss):
                        # fail fast with a recoverable state on disk instead of
                        # silently corrupting the parameters with NaN updates
                        save_checkpoint(state, experiment_dir, epoch)
                        raise RuntimeError(
                            f"non-finite loss at epoch {epoch} batch {b}; checkpoint "
                            f"saved to {experiment_dir} — resume with a lower lr or "
                            "smaller max_grad_norm"
                        )
                    logger.update({k: float(v) for k, v in host_metrics.items()})
                    logger.print_progress(epoch, b + 1, loss)
            logger["lr"].value = trainer.current_lr(int(state.step))
            logger.clear()

            if (epoch % save_every) == 0 and epoch > start_epoch:
                save_checkpoint(state, experiment_dir, epoch,
                                blocking=not args.async_checkpoints,
                                keep_last=args.keep_last_checkpoints)
            if (epoch % val_every) == 0:
                for b, batch in enumerate(val_loader):
                    metrics = jax.device_get(trainer.eval_step(state, trainer.put_batch(batch), key))
                    logger.update({k: float(v) for k, v in metrics.items()})
                    logger.print_progress(-1, b + 1, float(metrics["loss"]))
                logger.clear()

        if trace_window is not None:
            trace_window.close()
        save_checkpoint(state, experiment_dir, epochs - 1,
                        keep_last=args.keep_last_checkpoints)
        wait_for_checkpoints()  # commit any in-flight async save before exit
        print(f"\ndone: {epochs - start_epoch} epochs, final step {int(state.step)}")
    finally:
        # the logger is a process-wide singleton; detach this run's
        # file so a later training in the same process does not
        # keep appending to it
        logger.remove_output_file(stats_file)


if __name__ == "__main__":
    main()

"""Train the KL shape autoencoder on 3D-FUTURE point clouds.

CLI equivalent of `scripts/train_objautoencoder.py:23-294`: dedupe furniture
by model_jid across room types, serve 2048-point subsamples, train with
chamfer + KL (Pallas chamfer kernel on TPU).
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train the shape autoencoder (TPU)")
    parser.add_argument("config_file")
    parser.add_argument("output_directory")
    parser.add_argument("--experiment_tag", default=None)
    parser.add_argument("--path_to_pickled_dataset", default=None,
                        help="pickled ThreedFutureNormPCDataset (or reference pickle)")
    parser.add_argument("--seed", type=int, default=27)
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--continue_from_epoch", type=int, default=0,
                        help="start epoch when no checkpoint is found in the "
                        "experiment dir (reference train_objautoencoder.py:43)")
    parser.add_argument("--weight_file", default=None,
                        help="warm-start weights before training (reference "
                        "train_objautoencoder.py:37,212-215): torch .pt/.pth "
                        "state_dict (converted) or an experiment dir with "
                        "model_* checkpoints")
    parser.add_argument("--with_wandb_logger", action="store_true")
    parser.add_argument("--n_processes", type=int, default=0,
                        help="accepted for reference drop-in compatibility "
                        "(DataLoader workers there, train_objautoencoder.py:49)")
    parser.add_argument("--num_samples", type=int, default=None,
                        help="points served per object (reference fixes 2048, "
                        "threed_future_dataset.py:101); smaller for smoke runs")
    args = parser.parse_args(argv)

    from ..data.threed_future import ThreedFutureNormPCDataset
    from ..models.autoencoder import KLAutoEncoder
    from ..train.ae_trainer import AETrainer
    from ..utils import (
        StatsLogger, WandB, load_config, load_checkpoint, save_checkpoint,
        save_experiment_params,
    )

    config = load_config(args.config_file)
    experiment_tag = args.experiment_tag or os.path.basename(args.config_file).rsplit(".", 1)[0]
    experiment_dir = os.path.join(args.output_directory, experiment_tag)
    os.makedirs(experiment_dir, exist_ok=True)
    save_experiment_params(args, experiment_tag, experiment_dir)

    assert args.path_to_pickled_dataset, (
        "pass --path_to_pickled_dataset (build it with cli.pickle_threed_future_pointcloud; "
        "the reference's raw-JSON path needs the 3D-FRONT download)"
    )
    kwargs = {"num_samples": args.num_samples} if args.num_samples else {}
    dataset = ThreedFutureNormPCDataset.from_pickled_dataset(
        args.path_to_pickled_dataset, **kwargs)
    n_points = getattr(dataset, "num_samples", 2048)

    net_cfg = config.get("network", {})
    model = KLAutoEncoder(
        latent_dim=int(net_cfg.get("objfeat_dim", 32)),
        kl_weight=float(net_cfg.get("kl_weight", 0.001)),
    )
    batch_size = int(config["training"].get("batch_size", 16))
    steps_per_epoch = max(len(dataset) // batch_size, 1)
    trainer = AETrainer(model, config["training"], steps_per_epoch=steps_per_epoch,
                        n_points=n_points)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    # warm start (train_objautoencoder.py:212-215 loads --weight_file into
    # the net before the epoch loop; optimizer state starts fresh)
    if args.weight_file:
        if args.weight_file.endswith((".pt", ".pth")):
            from ..utils import convert_autoencoder, load_torch_checkpoint

            variables = convert_autoencoder(load_torch_checkpoint(args.weight_file))
            state = state.replace(params=variables["params"],
                                  batch_stats=variables["batch_stats"])
        else:
            warm, warm_epoch = load_checkpoint(state, args.weight_file)
            assert warm_epoch is not None, \
                f"--weight_file: no checkpoints under {args.weight_file}"
            state = state.replace(params=warm.params,
                                  batch_stats=warm.batch_stats)
        print(f"warm-started weights from {args.weight_file}")
    state, resumed = load_checkpoint(state, experiment_dir)
    start_epoch = (resumed + 1) if resumed is not None else args.continue_from_epoch

    logger = WandB.instance() if args.with_wandb_logger else StatsLogger.instance()
    if args.with_wandb_logger:
        logger.init(args, None,
                    project=config.get("logger", {}).get("project", "diffuscene_tpu"),
                    name=experiment_tag)
    stats_file = open(os.path.join(experiment_dir, "stats.txt"), "a")
    logger.add_output_file(stats_file)
    epochs = args.epochs if args.epochs is not None else int(config["training"].get("epochs", 2000))
    save_every = int(config["training"].get("save_frequency", 100))
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    order = np.arange(len(dataset))
    try:
        for epoch in range(start_epoch, epochs):
            rng.shuffle(order)
            for b in range(steps_per_epoch):
                idxs = order[b * batch_size : (b + 1) * batch_size]
                pts = np.stack([dataset[int(i)]["points"] for i in idxs])
                state, metrics = trainer.train_step(state, trainer.put_batch(pts), key)
                if (b % 10) == 0:  # one batched host fetch, not one per metric
                    host_metrics = jax.device_get(metrics)
                    logger.update({k: float(v) for k, v in host_metrics.items()})
                    logger.print_progress(epoch, b + 1, float(host_metrics["loss"]))
            logger.clear()
            if (epoch % save_every) == 0 and epoch > start_epoch:
                save_checkpoint(state, experiment_dir, epoch)
        save_checkpoint(state, experiment_dir, epochs - 1)
    finally:
        logger.remove_output_file(stats_file)


if __name__ == "__main__":
    main()

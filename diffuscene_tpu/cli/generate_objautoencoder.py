"""Export latent shape codes ("objfeats") with a trained shape autoencoder.

CLI equivalent of `scripts/generate_objautoencoder.py:25-235`: run the
deterministic encoder over every catalog object and write per-model
``raw_model_norm_pc_lat{dim}.npz`` latents plus the global std scale factor
report (generate_objautoencoder.py:225-230).
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Export shape-AE latents (TPU)")
    parser.add_argument("config_file")
    parser.add_argument("weight_dir", metavar="output_directory",
                        help="experiment/output dir (the reference's second "
                        "positional, generate_objautoencoder.py:35): weights "
                        "load from here unless --weight_file is given, and "
                        "the latent std report is written here")
    parser.add_argument("--path_to_pickled_dataset", required=True)
    parser.add_argument("--output_directory", default=None,
                        help="write latents here instead of next to the models")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--weight_file", default=None,
                        help="load weights from a specific torch .pt/.pth "
                        "state_dict (converted) instead of the newest "
                        "checkpoint in weight_dir (reference "
                        "generate_objautoencoder.py:40,161-164)")
    parser.add_argument("--experiment_tag", default=None,
                        help="accepted for reference drop-in compatibility "
                        "(generate_objautoencoder.py:33); outputs are "
                        "addressed by weight_dir here")
    parser.add_argument("--continue_from_epoch", type=int, default=0,
                        help="accepted for reference drop-in compatibility "
                        "(generate_objautoencoder.py:46 parses it; unused in "
                        "generation)")
    parser.add_argument("--n_processes", type=int, default=0,
                        help="accepted for reference drop-in compatibility "
                        "(DataLoader workers there)")
    parser.add_argument("--num_samples", type=int, default=None,
                        help="points fed to the encoder per object (default: "
                        "dataset's, i.e. 2048)")
    parser.add_argument("--lat_name", default=None,
                        help="latent filename tag: raw_model_norm_pc_<tag>.npz. "
                        "Defaults to lat{objfeat_dim}. The reference loader reads "
                        "the 64-d file as 'lat' with no dim suffix "
                        "(threed_front_scene.py:223-227) while its exporter writes "
                        "lat64 (generate_objautoencoder.py:219-221) — pass "
                        "--lat_name lat to produce loader-compatible files.")
    args = parser.parse_args(argv)

    from ..data.threed_future import ThreedFutureNormPCDataset
    from ..models.autoencoder import KLAutoEncoder
    from ..train.ae_trainer import AETrainer
    from ..utils import load_config, load_checkpoint

    config = load_config(args.config_file)
    kwargs = {"num_samples": args.num_samples} if args.num_samples else {}
    dataset = ThreedFutureNormPCDataset.from_pickled_dataset(
        args.path_to_pickled_dataset, **kwargs)
    n_points = getattr(dataset, "num_samples", 2048)

    net_cfg = config.get("network", {})
    latent_dim = int(net_cfg.get("objfeat_dim", 32))
    model = KLAutoEncoder(latent_dim=latent_dim,
                          kl_weight=float(net_cfg.get("kl_weight", 0.001)))
    trainer = AETrainer(model, config["training"], n_points=n_points)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    if args.weight_file and args.weight_file.endswith((".pt", ".pth")):
        from ..utils import convert_autoencoder, load_torch_checkpoint

        variables = convert_autoencoder(load_torch_checkpoint(args.weight_file))
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
        print(f"loaded torch weights from {args.weight_file}")
    else:
        state, epoch = load_checkpoint(state, args.weight_file or args.weight_dir)
        assert epoch is not None, \
            f"no checkpoints under {args.weight_file or args.weight_dir}"
        print(f"loaded epoch {epoch}")

    lats = []
    for start in range(0, len(dataset), args.batch_size):
        idxs = list(range(start, min(start + args.batch_size, len(dataset))))
        pts = np.stack([dataset[i]["points"] for i in idxs])
        lat = np.asarray(trainer.encode(state, trainer.put_batch(pts)))
        lats.append(lat)
        for j, i in enumerate(idxs):
            obj = dataset.objects[i]
            out_dir = args.output_directory or os.path.dirname(
                getattr(obj, "raw_model_norm_pc_path", "") or "."
            )
            os.makedirs(out_dir, exist_ok=True)
            jid = dataset.get_model_jid(i)["model_jid"]
            tag = args.lat_name or f"lat{latent_dim}"
            name = f"raw_model_norm_pc_{tag}.npz" if not args.output_directory \
                else f"{jid}_norm_pc_{tag}.npz"
            np.savez(os.path.join(out_dir, name), latent=lat[j].astype(np.float32))
        print(f"encoded {min(start + args.batch_size, len(dataset))}/{len(dataset)}")

    all_lat = np.concatenate(lats)
    # global std scale report (generate_objautoencoder.py:225-230): the
    # reference prints scale_factor = 1/std of the flattened latents, used to
    # whiten objfeats downstream.  Persist it next to the checkpoints too.
    std = float(all_lat.std())
    stats = {
        "latent_dim": latent_dim,
        "std": std,
        "scale_factor": (1.0 / std) if std > 0 else 1.0,
        "min": float(all_lat.min()),
        "max": float(all_lat.max()),
        "n_objects": int(len(dataset)),
    }
    print(f"latent std: {stats['std']:.6f}  min: {stats['min']:.4f}  max: {stats['max']:.4f}")
    print(f"scale factor: {stats['scale_factor']:.6f}")
    import json

    with open(os.path.join(args.weight_dir, f"lat{latent_dim}_stats.json"), "w") as f:
        json.dump(stats, f)


if __name__ == "__main__":
    main()

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
    parser.add_argument("weight_dir", help="experiment dir with model_* checkpoints")
    parser.add_argument("--path_to_pickled_dataset", required=True)
    parser.add_argument("--output_directory", default=None,
                        help="write latents here instead of next to the models")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from ..data.threed_future import ThreedFutureNormPCDataset
    from ..models.autoencoder import KLAutoEncoder
    from ..train.ae_trainer import AETrainer
    from ..utils import load_config, load_checkpoint

    config = load_config(args.config_file)
    dataset = ThreedFutureNormPCDataset.from_pickled_dataset(args.path_to_pickled_dataset)
    n_points = getattr(dataset, "num_samples", 2048)

    net_cfg = config.get("network", {})
    latent_dim = int(net_cfg.get("objfeat_dim", 32))
    model = KLAutoEncoder(latent_dim=latent_dim,
                          kl_weight=float(net_cfg.get("kl_weight", 0.001)))
    trainer = AETrainer(model, config["training"], n_points=n_points)
    state = trainer.init_state(jax.random.PRNGKey(args.seed))
    state, epoch = load_checkpoint(state, args.weight_dir)
    assert epoch is not None, f"no checkpoints under {args.weight_dir}"
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
            name = f"raw_model_norm_pc_lat{latent_dim}.npz" if not args.output_directory \
                else f"{jid}_norm_pc_lat{latent_dim}.npz"
            np.savez(os.path.join(out_dir, name), latent=lat[j].astype(np.float32))
        print(f"encoded {min(start + args.batch_size, len(dataset))}/{len(dataset)}")

    all_lat = np.concatenate(lats)
    # global std scale report (generate_objautoencoder.py:225-230)
    print(f"latent std: {all_lat.std():.6f}  min: {all_lat.min():.4f}  max: {all_lat.max():.4f}")


if __name__ == "__main__":
    main()

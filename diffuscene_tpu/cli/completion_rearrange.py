"""Scene completion and re-arrangement with a trained model.

CLI equivalent of `scripts/completion_rearrange.py:32-542`:
- completion: take the first --num_partial boxes of each eval scene as the
  partial input and inpaint the rest (RePaint-style splice sampler,
  samplers.p_sample_loop_complete)
- rearrangement (--arrange_objects): add noise to translations/angles of the
  GT scene, then re-arrange with sizes/classes/objfeats as conditioning
  (5-channel subspace sampler, samplers.p_sample_loop_arrange)
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Scene completion / rearrangement (TPU)")
    parser.add_argument("config_file")
    parser.add_argument("output_directory")
    parser.add_argument("--no_ema", action="store_true",
                        help="use raw (non-EMA) weights from the checkpoint")
    parser.add_argument("--weight_file", default=None)
    parser.add_argument("--arrange_objects", action="store_true")
    parser.add_argument("--num_partial", type=int, default=3)
    parser.add_argument("--noise_scale", type=float, default=0.5,
                        help="translation/angle noise for rearrangement inputs")
    parser.add_argument("--n_sequences", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--clip_denoised", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="use the fused serving engine (models/inference.py)")
    parser.add_argument("--render", action="store_true")
    from ._scene_output import add_scene_output_args

    # the reference's completion/rearrange script shares generate's mesh
    # retrieval + textured rendering + --save_mesh export funnel
    # (completion_rearrange.py:138-160 -> scripts/utils.py:460-560)
    add_scene_output_args(parser)
    args = parser.parse_args(argv)

    from ..data.factory import get_dataset_raw_and_encoded
    from ..eval.postprocess import split_network_samples
    from ..eval.render import save_image
    from ..models.scene_model import SceneDiffusion, SceneModelConfig
    from ..utils import load_config, load_checkpoint

    config = load_config(args.config_file)
    from ..data.factory import apply_text_emb_dim_default

    apply_text_emb_dim_default(config)
    os.makedirs(args.output_directory, exist_ok=True)

    enc = config["data"]["encoding_type"]
    if "no_prm" not in enc:
        enc += "_no_prm"
    raw, eval_ds = get_dataset_raw_and_encoded(
        {**config["data"], "encoding_type": enc},
        augmentations=None, split=config["validation"].get("splits", ["test"]),
    )

    net_cfg = dict(config["network"])
    net_cfg.setdefault("sample_num_points", eval_ds.max_length)
    # NOTE: completion does NOT require partial-condition heads — the
    # RePaint-style splice sampler works with the unconditional model
    # (diffusion_ddpm.py:447-476); enable room_partial_condition only when
    # the config (and hence the checkpoint) trained with it
    cfg = SceneModelConfig.from_config(net_cfg)
    scene = SceneDiffusion(cfg)
    params = scene.init(jax.random.PRNGKey(args.seed))
    if args.weight_file:
        if args.weight_file.endswith((".pt", ".pth")):
            from ..utils import convert_scene_model, load_torch_checkpoint

            params = convert_scene_model(load_torch_checkpoint(args.weight_file))
        else:
            from ..train.trainer import Trainer, ema_or_params

            trainer = Trainer(scene, config["training"])
            state = trainer.init_state(jax.random.PRNGKey(args.seed))
            state, epoch = load_checkpoint(state, args.weight_file)
            assert epoch is not None
            params = ema_or_params(state) if not args.no_ema else state.params

    from ._scene_output import SceneOutput

    scene_out = SceneOutput(args, raw, seed=args.seed)
    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed)

    @jax.jit
    def complete(params, key, partial):
        return scene.sample(params, key, batch_size=partial.shape[0],
                            partial_boxes=partial, clip_denoised=args.clip_denoised,
                            fused=args.fused)

    @jax.jit
    def arrange(params, key, input_boxes):
        return scene.sample(params, key, batch_size=input_boxes.shape[0],
                            input_boxes=input_boxes, clip_denoised=args.clip_denoised,
                            fused=args.fused)

    n_done = 0
    while n_done < args.n_sequences:
        idxs = [(n_done + i) % len(eval_ds) for i in range(args.batch_size)]
        batch = [eval_ds[i] for i in idxs]
        target = np.stack([
            np.concatenate(
                [s["translations"], s["sizes"], s["angles"], s["class_labels"]]
                + ([s["objfeats_32"]] if "objfeats_32" in s else []),
                axis=-1,
            ) for s in batch
        ]).astype(np.float32)
        key, sub = jax.random.split(key)

        if args.arrange_objects:
            # noise translations/angles of the GT scene (completion_rearrange.py:309-324)
            noisy = target.copy()
            td, bd = cfg.translation_dim, cfg.bbox_dim
            noisy[:, :, :td] += rng.normal(0, args.noise_scale, noisy[:, :, :td].shape)
            noisy[:, :, td + cfg.size_dim : bd] += rng.normal(
                0, args.noise_scale, noisy[:, :, td + cfg.size_dim : bd].shape)
            out = np.asarray(arrange(params, sub, jnp.asarray(noisy)))
        else:
            partial = jnp.asarray(target[:, : args.num_partial])
            out = np.asarray(complete(params, sub, partial))

        take = min(args.batch_size, args.n_sequences - n_done)
        for i, boxes in enumerate(split_network_samples(scene.spec, out[:take])):
            boxes = eval_ds.post_process(boxes)
            idx = n_done + i
            with open(os.path.join(args.output_directory, f"{idx:05d}_boxes.json"), "w") as f:
                json.dump({k: np.asarray(v).tolist() for k, v in boxes.items()}, f)
            if args.render:
                # mesh-accurate textured render when a catalog is loaded,
                # oriented boxes otherwise (see _scene_output.SceneOutput)
                save_image(scene_out.render(boxes, idx),
                           os.path.join(args.output_directory, f"{idx:05d}.png"))
            if args.save_mesh:
                scene_out.export(boxes, idx, args.output_directory)
        n_done += take
        print(f"{'arranged' if args.arrange_objects else 'completed'} {n_done}/{args.n_sequences}")


if __name__ == "__main__":
    main()

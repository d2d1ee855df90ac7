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
    parser.add_argument("--scene_id", default=None,
                        help="complete/arrange this named eval scene in every "
                        "sequence instead of walking the eval split "
                        "(reference completion_rearrange.py:117,264-268); "
                        "rearrange noise is then seeded by the scene index "
                        "like the reference (:319-322)")
    parser.add_argument("--scene_texture", action="store_true",
                        help="accepted for reference drop-in compatibility "
                        "(completion_rearrange.py:171 parses it but never "
                        "uses it); textures are controlled by --no_texture")
    parser.add_argument("--clip_denoised", action="store_true")
    parser.add_argument("--fused", action="store_true",
                        help="use the fused serving engine (models/inference.py)")
    parser.add_argument("--render_top2down", dest="render", action="store_true",
                        help="alias for --render (the reference's flag name, "
                        "completion_rearrange.py:123)")
    parser.add_argument("--render", action="store_true",
                        help="render results; also renders the input scenes "
                        "into partial/ (completion) or noisy/ (rearrange), "
                        "like the reference's render_to_folder calls "
                        "(completion_rearrange.py:332-337,367-380)")
    parser.add_argument("--render_gt", action="store_true",
                        help="also render the ground-truth scenes into "
                        "groundtruth/ (reference validation.gen_gt, "
                        "completion_rearrange.py:499-538); defaults on when "
                        "the config sets validation.gen_gt")
    parser.add_argument("--compute_intersec", action="store_true",
                        help="bbox IoU/intersection/symmetry stats per scene "
                        "(reference completion_rearrange.py:430-446 "
                        "iou_states.txt)")
    parser.add_argument("--judge_mesh_intersec", action="store_true",
                        help="with --compute_intersec and a retrieved catalog, "
                        "count a positive box IoU only when the retrieved "
                        "meshes' surfaces actually cross (Möller tri-tri, "
                        "eval/mesh_intersect.py) — the reference's pyvista "
                        "branch (scripts/utils.py:686-691)")
    from ._scene_output import add_scene_output_args

    # the reference's completion/rearrange script shares generate's mesh
    # retrieval + textured rendering + --save_mesh export funnel
    # (completion_rearrange.py:138-160 -> scripts/utils.py:460-560)
    add_scene_output_args(parser)
    from ._scene_output import resolve_scene_output_args

    args = resolve_scene_output_args(parser.parse_args(argv))

    from ..data.factory import get_dataset_raw_and_encoded
    from ..eval.metrics import (
        compute_intersection, compute_symmetry, scene_bboxes_from_params,
    )
    from ..eval.postprocess import split_network_samples
    from ..eval.render import save_image
    from ..models.scene_model import SceneDiffusion, SceneModelConfig
    from ..utils import load_config, load_checkpoint

    config = load_config(args.config_file)
    from ..data.factory import apply_text_emb_dim_default

    apply_text_emb_dim_default(config)
    os.makedirs(args.output_directory, exist_ok=True)
    # reference gates GT renders on validation.gen_gt (completion_rearrange.py:499)
    args.render_gt = args.render_gt or bool(
        config.get("validation", {}).get("gen_gt", False))

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
    # --scene_id pins every sequence to one named eval scene; the reference
    # then seeds the rearrange noise with the scene index so repeated runs
    # perturb the same scene identically (completion_rearrange.py:264-268,
    # 312-322)
    given_scene_id = None
    if args.scene_id is not None:
        ids = list(getattr(raw, "scene_ids", []))
        if args.scene_id not in ids:
            raise SystemExit(f"--scene_id {args.scene_id!r} not in the eval "
                             f"split ({len(ids)} scenes)")
        given_scene_id = ids.index(args.scene_id)
        print(f"using scene {args.scene_id!r} (index {given_scene_id}) "
              f"for every sequence")
    rng = np.random.default_rng(
        args.seed if given_scene_id is None else given_scene_id)
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
    per_scene_stats = []
    while n_done < args.n_sequences:
        if given_scene_id is not None:
            idxs = [given_scene_id] * args.batch_size
        else:
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

        def render_aux(arr, subdir, idx):
            """Render an encoded scene array into a subfolder (the TPU
            equivalent of the reference's render_to_folder side renders)."""
            aux = eval_ds.post_process(
                split_network_samples(scene.spec, arr[None])[0])
            out_dir = os.path.join(args.output_directory, subdir)
            os.makedirs(out_dir, exist_ok=True)
            save_image(scene_out.render(aux, idx),
                       os.path.join(out_dir, f"{idx:05d}.png"))

        input_name = "noisy" if args.arrange_objects else "partial"
        inputs = noisy if args.arrange_objects else np.asarray(partial)
        for i, boxes in enumerate(split_network_samples(scene.spec, out[:take])):
            boxes = eval_ds.post_process(boxes)
            idx = n_done + i
            with open(os.path.join(args.output_directory, f"{idx:05d}_boxes.json"), "w") as f:
                json.dump({k: np.asarray(v).tolist() for k, v in boxes.items()}, f)
            if args.render:
                # mesh-accurate textured render when a catalog is loaded,
                # oriented boxes otherwise (see _scene_output.SceneOutput);
                # the input scene goes to partial//noisy/ like the
                # reference's render_foldername (completion_rearrange.py:332-337)
                save_image(scene_out.render(boxes, idx),
                           os.path.join(args.output_directory, f"{idx:05d}.png"))
                render_aux(inputs[i], input_name, idx)
            # perspective + orbit-frame outputs (reference camera flags);
            # no-op unless requested
            scene_out.perspective_outputs(boxes, idx, args.output_directory)
            if args.render_gt:
                render_aux(target[i], "groundtruth", idx)
            if args.save_mesh:
                scene_out.export(boxes, idx, args.output_directory)
            if args.compute_intersec:
                bb = scene_bboxes_from_params(
                    np.asarray(boxes["translations"]).reshape(-1, 3),
                    np.asarray(boxes["sizes"]).reshape(-1, 3))
                cls = np.asarray(boxes["class_labels"])
                cls = cls[0] if cls.ndim == 3 else cls
                pair_fn = None
                if args.judge_mesh_intersec:
                    if scene_out.objects_dataset is None:
                        raise SystemExit(
                            "--judge_mesh_intersec needs a retrieved catalog "
                            "(--path_to_pickled_3d_futute_models)")
                    from ..eval.mesh_intersect import make_pair_intersects

                    pair_fn = make_pair_intersects(scene_out.retrieve(boxes))
                n, pairs, avg_iou, avg_insec, ratio = compute_intersection(
                    bb, pair_intersects=pair_fn)
                sym = compute_symmetry(bb, cls)
                per_scene_stats.append((n, pairs, avg_iou, avg_insec, ratio, sym))
                # running line per scene, reference iou_states.txt
                # (completion_rearrange.py:441-446)
                arr = np.asarray(per_scene_stats, np.float64)
                with open(os.path.join(args.output_directory, "iou_states.txt"), "a") as f:
                    f.write(
                        f"num scenes: {len(arr)} - num objects avg: {arr[:, 0].mean():f}"
                        f" - std: {arr[:, 0].std():f} - num pairs: {arr[:, 1].mean():f}"
                        f" - box iou: {arr[:, 2].mean():f}"
                        f" - box intersec: {arr[:, 3].mean():f}"
                        f" - overlap ratio: {arr[:, 4].mean():f}"
                        f" - total num symmetries: {int(arr[:, 5].sum())}\n")
        n_done += take
        print(f"{'arranged' if args.arrange_objects else 'completed'} {n_done}/{args.n_sequences}")

    if args.compute_intersec and per_scene_stats:
        arr = np.asarray(per_scene_stats, np.float64)
        stats = {
            "n_scenes": int(arr.shape[0]),
            "avg_objects": float(arr[:, 0].mean()),
            "avg_pair_iou": float(arr[:, 2].mean()),
            "avg_intersec": float(arr[:, 3].mean()),
            "avg_overlap_ratio": float(arr[:, 4].mean()),
            "avg_symmetry": float(arr[:, 5].mean()),
        }
        with open(os.path.join(args.output_directory, "metrics.json"), "w") as f:
            json.dump(stats, f, indent=2)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()

"""Generate scenes with a trained model; render + optional metrics.

CLI equivalent of `scripts/generate_diffusion.py:47-469`.  Key TPU re-design:
the reference samples one scene at a time through a 1000-step Python loop;
here all requested scenes sample in batched jitted scans, then post-process,
retrieval, and rendering run host-side.
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description="Generate scenes (TPU)")
    parser.add_argument("config_file")
    parser.add_argument("output_directory")
    parser.add_argument("--no_ema", action="store_true",
                        help="sample with the raw (non-EMA) weights even when "
                        "the checkpoint carries training.ema_decay averages")
    parser.add_argument("--weight_file", default=None,
                        help="experiment dir with model_* checkpoints (or a torch .pt)")
    parser.add_argument("--n_sequences", type=int, default=10)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--clip_denoised", action="store_true")
    parser.add_argument("--ddim", action="store_true")
    parser.add_argument("--ddim_steps", type=int, default=50)
    parser.add_argument("--dpm", action="store_true",
                        help="DPM-Solver++(2M) fast sampling (not in the reference)")
    parser.add_argument("--dpm_steps", type=int, default=20)
    parser.add_argument("--fused", action="store_true",
                        help="use the fused serving engine (models/inference.py)")
    parser.add_argument("--compute_intersec", action="store_true")
    parser.add_argument("--judge_mesh_intersec", action="store_true",
                        help="with --compute_intersec and a retrieved catalog, "
                        "count a positive box IoU only when the retrieved "
                        "meshes' surfaces actually cross (Möller tri-tri, "
                        "eval/mesh_intersect.py) — the reference's pyvista "
                        "branch (scripts/utils.py:686-691)")
    parser.add_argument("--scene_id", default=None,
                        help="condition every sequence on this named eval "
                        "scene (its floor plan / text / room mask), like the "
                        "reference (generate_diffusion.py:132-136,268-273)")
    parser.add_argument("--fix_order", action="store_true",
                        help="iterate the eval set in order (i %% len) instead "
                        "of seeded-random scene choice "
                        "(generate_diffusion.py:174-178,295-301)")
    parser.add_argument("--render", action="store_true", help="save top-down renders")
    parser.add_argument("--render_top2down", dest="render", action="store_true",
                        help="alias for --render (the reference's flag name, "
                        "generate_diffusion.py:137)")
    from ._scene_output import add_scene_output_args

    add_scene_output_args(parser)
    parser.add_argument("--profile_dir", default=None,
                        help="capture a jax.profiler trace of the sampling "
                        "batches to this directory (XProf/TensorBoard); the "
                        "first (compile) batch is excluded")
    from ._scene_output import resolve_scene_output_args

    args = resolve_scene_output_args(parser.parse_args(argv))

    from ..data.factory import get_dataset_raw_and_encoded
    from ..eval.metrics import (
        categorical_kl, compute_intersection, compute_symmetry, scene_bboxes_from_params,
    )
    from ..eval.postprocess import split_network_samples
    from ..eval.render import save_image
    from ..models.scene_model import SceneDiffusion, SceneModelConfig
    from ..utils import load_config, load_checkpoint

    config = load_config(args.config_file)
    from ..data.factory import apply_text_emb_dim_default

    apply_text_emb_dim_default(config)
    os.makedirs(args.output_directory, exist_ok=True)

    # eval-time encoding rewrite (generate_diffusion.py:201-208):
    # text -> textfix, and no permutation at eval
    enc = config["data"]["encoding_type"]
    if "textfix" not in enc and "text" in enc:
        enc = enc.replace("text", "textfix")
    if "no_prm" not in enc:
        enc = enc + "_no_prm"
    raw, eval_ds = get_dataset_raw_and_encoded(
        {**config["data"], "encoding_type": enc},
        augmentations=None, split=config["validation"].get("splits", ["test"]),
        keep_room_layout=bool(config["network"].get("room_mask_condition", True)),
    )
    bounds_dev = eval_ds.bounds.as_device_bounds()

    net_cfg = dict(config["network"])
    net_cfg.setdefault("sample_num_points", eval_ds.max_length)
    cfg = SceneModelConfig.from_config(net_cfg)
    scene = SceneDiffusion(cfg, bounds=None)
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
            assert epoch is not None, f"no checkpoints under {args.weight_file}"
            params = ema_or_params(state) if not args.no_ema else state.params
            print(f"loaded checkpoint epoch {epoch}"
                  + (" (EMA weights)" if state.ema_params is not None and not args.no_ema else ""))

    from ._scene_output import SceneOutput

    scene_out = SceneOutput(args, raw, seed=args.seed)
    objects_dataset = scene_out.objects_dataset

    # conditioning-scene selection (generate_diffusion.py:268-273,294-301):
    # --scene_id pins every sequence to one named eval scene, --fix_order
    # walks the eval set in order, default draws seeded-random scenes (the
    # reference uses unseeded np.random.choice; seeding keeps runs repeatable)
    given_scene_id = None
    if args.scene_id is not None:
        ids = list(getattr(raw, "scene_ids", []))
        if args.scene_id not in ids:
            raise SystemExit(f"--scene_id {args.scene_id!r} not in the eval "
                             f"split ({len(ids)} scenes)")
        given_scene_id = ids.index(args.scene_id)
        print(f"conditioning all sequences on scene {args.scene_id!r} "
              f"(index {given_scene_id})")
    idx_rng = np.random.default_rng(args.seed)

    def cond_index(i: int) -> int:
        if given_scene_id is not None:
            return given_scene_id
        if args.fix_order:
            return i % len(eval_ds)
        return int(idx_rng.integers(len(eval_ds)))

    # batched jitted sampling (vs generate_diffusion.py:294 batch-1 loop)
    @jax.jit
    def sample_batch(params, key, text_emb=None, room_layout=None):
        return scene.sample(params, key, batch_size=args.batch_size,
                            text_emb=text_emb, room_layout=room_layout,
                            clip_denoised=args.clip_denoised,
                            ddim=args.ddim, ddim_steps=args.ddim_steps,
                            dpm=args.dpm, dpm_steps=args.dpm_steps,
                            fused=args.fused)

    from ..utils import TraceWindow

    # batch 0 compiles; capture from the first steady-state batch on — unless
    # generation fits in ONE batch, in which case trace that batch (compile
    # included) rather than silently capturing nothing
    total_batches = -(-args.n_sequences // args.batch_size)
    trace_window = (TraceWindow(args.profile_dir, start=min(1, total_batches - 1),
                                length=10**9)
                    if args.profile_dir else None)
    all_boxes = []
    n_done = 0
    n_batches = 0
    key = jax.random.PRNGKey(args.seed)
    while n_done < args.n_sequences:
        key, sub = jax.random.split(key)
        batch_indices = [cond_index(n_done + i) for i in range(args.batch_size)]
        text_emb = None
        room_layout = None
        descriptions = []
        if cfg.text_condition or cfg.room_mask_condition:
            embs, masks = [], []
            for idx in batch_indices:
                s = eval_ds[idx]
                if cfg.text_condition:
                    embs.append(np.asarray(s["desc_emb"], np.float32))
                    descriptions.append(s.get("description", ""))
                if cfg.room_mask_condition:
                    masks.append(np.asarray(s["room_layout"], np.float32))
            if embs:
                text_emb = np.stack(embs)
            if masks:
                # dataset room masks are CHW (1, H, W); feed the (B, 1, H, W)
                # batch the room-feature extractor accepts (the reference
                # feeds floor_plan_from_scene's room_mask at
                # generate_diffusion.py:309-315)
                room_layout = np.stack(masks)
        if trace_window is not None:
            trace_window.tick(n_batches)
        samples = np.asarray(sample_batch(params, sub, text_emb, room_layout))
        n_batches += 1
        take = min(args.batch_size, args.n_sequences - n_done)
        per_scene = split_network_samples(scene.spec, samples[:take])
        for i, boxes in enumerate(per_scene):
            boxes = eval_ds.post_process(boxes)
            all_boxes.append(boxes)
            idx = n_done + i
            if args.render:
                # mesh-accurate textured render when a catalog is loaded,
                # oriented boxes otherwise (see _scene_output.SceneOutput);
                # the floor plan comes from the scene that conditioned this
                # sample (generate_diffusion.py:305-315)
                save_image(scene_out.render(boxes, idx, floor_idx=batch_indices[i]),
                           os.path.join(args.output_directory, f"{idx:05d}.png"))
            # perspective + orbit-frame outputs (reference camera flags,
            # generate_diffusion.py:82-127); no-op unless requested
            scene_out.perspective_outputs(boxes, idx, args.output_directory,
                                          floor_idx=batch_indices[i])
            if descriptions:
                # text dump next to the render (generate_diffusion.py writes
                # the conditioning sentence per scene)
                with open(os.path.join(args.output_directory, f"{idx:05d}.txt"), "w") as f:
                    f.write(descriptions[i])
            if args.save_mesh:
                scene_out.export(boxes, idx, args.output_directory)
        n_done += take
        print(f"sampled {n_done}/{args.n_sequences}")
    if trace_window is not None:
        trace_window.close()

    # metrics (generate_diffusion.py:394-429 + categorical KL at 44)
    stats = {"n_scenes": len(all_boxes)}
    class_freq_gen = np.zeros(len(raw.class_labels) - 2, np.float64)
    per_scene_stats = []
    for boxes in all_boxes:
        cls = np.asarray(boxes["class_labels"])
        if cls.ndim == 3:
            cls = cls[0]
        for c in cls.argmax(-1):
            class_freq_gen[c] += 1
        if args.compute_intersec:
            bb = scene_bboxes_from_params(
                np.asarray(boxes["translations"]).reshape(-1, 3),
                np.asarray(boxes["sizes"]).reshape(-1, 3))
            pair_fn = None
            if args.judge_mesh_intersec:
                if scene_out.objects_dataset is None:
                    raise SystemExit("--judge_mesh_intersec needs a retrieved "
                                     "catalog (--path_to_pickled_3d_futute_models)")
                from ..eval.mesh_intersect import make_pair_intersects

                # retrieval order matches the bb row order (both iterate the
                # boxes dict rows), so indices line up
                pair_fn = make_pair_intersects(scene_out.retrieve(boxes))
            n, pairs, avg_iou, avg_insec, ratio = compute_intersection(
                bb, pair_intersects=pair_fn)
            sym = compute_symmetry(bb, cls)
            per_scene_stats.append((n, pairs, avg_iou, avg_insec, ratio, sym))
            # running line per scene, reference iou_states.txt
            # (generate_diffusion.py:394-429)
            arr = np.asarray(per_scene_stats, np.float64)
            with open(os.path.join(args.output_directory, "iou_states.txt"), "a") as f:
                f.write(
                    f"num scenes: {len(arr)} - num objects avg: {arr[:, 0].mean():f}"
                    f" - std: {arr[:, 0].std():f} - num pairs: {arr[:, 1].mean():f}"
                    f" - box iou: {arr[:, 2].mean():f}"
                    f" - box intersec: {arr[:, 3].mean():f}"
                    f" - overlap ratio: {arr[:, 4].mean():f}"
                    f" - total num symmetries: {int(arr[:, 5].sum())}\n")
    if class_freq_gen.sum() > 0:
        gt_freq = np.array([raw.class_frequencies[c] for c in raw.object_types], np.float64)
        gen_freq = class_freq_gen / class_freq_gen.sum()
        stats["categorical_kl"] = categorical_kl(gt_freq / gt_freq.sum(), gen_freq)
    if per_scene_stats:
        arr = np.asarray(per_scene_stats, np.float64)
        stats.update(
            avg_objects=float(arr[:, 0].mean()), avg_pair_iou=float(arr[:, 2].mean()),
            avg_intersec=float(arr[:, 3].mean()), avg_overlap_ratio=float(arr[:, 4].mean()),
            avg_symmetry=float(arr[:, 5].mean()),
        )
    with open(os.path.join(args.output_directory, "metrics.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(json.dumps(stats))


if __name__ == "__main__":
    main()

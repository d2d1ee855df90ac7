"""Improved Precision & Recall between real and generated render folders.

CLI equivalent of `scripts/improved_precision_recall.py` (k=3, 5000 samples
default; VGG16-fc2 features in the reference — pluggable here, see
eval/fid.py for the offline story).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Improved precision/recall over renders")
    parser.add_argument("path_to_real_renderings",
                        help="flat folder of real renders, a precalculated "
                        "manifold .npz, or (with path_to_annotations) a "
                        "preprocessed cached-dataset directory")
    parser.add_argument("path_to_synthesized_renderings")
    parser.add_argument("path_to_annotations", nargs="?", default=None,
                        help="scene_id,split CSV; when given, the real set is "
                        "the cached dataset's train+val renders like the "
                        "reference (improved_precision_recall.py:375,"
                        "396-404)")
    parser.add_argument("--batch_size", type=int, default=100)
    parser.add_argument("--k", type=int, default=3)
    parser.add_argument("--num_samples", type=int, default=5000)
    parser.add_argument("--features", choices=["pixel", "vgg", "inception"],
                        default="vgg",
                        help="'vgg' (default) = the reference's VGG16-fc2 "
                        "features via the pure-JAX backbone (needs "
                        "--vgg_weights; errors loudly without them). 'pixel' "
                        "is an explicit offline opt-in and is flagged "
                        "comparable=false in the output JSON")
    parser.add_argument("--vgg_weights", default=None,
                        help="torchvision vgg16 state_dict (.pth) or .npz")
    parser.add_argument("--inception_weights", default=None)
    parser.add_argument("--fname_precalc", default="",
                        help="extract real-manifold features, save them to "
                        "this .npz, and exit (path_to_synthesized_renderings "
                        "is ignored) — the reference's precalc mode "
                        "(improved_precision_recall.py:381,463-467); pass the "
                        ".npz as path_to_real_renderings later to reuse it")
    parser.add_argument("--realism", action="store_true",
                        help="also report per-sample realism scores of the "
                        "synthesized set vs the real manifold "
                        "(improved_precision_recall.py:273-281)")
    parser.add_argument("--toy", action="store_true",
                        help="self-check of the IPR math on synthetic gaussians "
                        "(improved_precision_recall.py:344-368)")
    args = parser.parse_args(argv)

    from ..eval.ipr import compute_precision_recall

    if args.toy:
        import numpy as np

        rng = np.random.default_rng(0)
        real = rng.normal(0, 1, (args.num_samples, 64))
        fake = rng.normal(0.5, 1, (args.num_samples, 64))
        pr = compute_precision_recall(real, fake, k=args.k, num_samples=args.num_samples)
        print(json.dumps({"toy": True, "precision": pr.precision, "recall": pr.recall}))
        return

    # "comparable" = the reference's VGG16-fc2 feature space; any other
    # extractor yields self-consistent but not paper-comparable numbers.
    comparable = args.features == "vgg"
    if args.features == "vgg":
        from ..eval.fid import JaxVGG16Features

        fn = JaxVGG16Features(args.vgg_weights)  # raises loudly if no weights
    elif args.features == "inception":
        from ..eval.fid import JaxInceptionFeatures

        fn = JaxInceptionFeatures(args.inception_weights)
    else:
        from ..eval.fid import PixelFeatures

        fn = PixelFeatures()
        print("WARNING: pixel features are NOT comparable to the reference's "
              "VGG16-fc2 precision/recall; pass --features vgg with local weights")
    # Extract features ONCE per folder and subsample ONCE (same rng order as
    # compute_precision_recall's internal path), so precision/recall and the
    # optional realism scores are computed over identical manifolds.
    import numpy as np

    from ..eval.fid import load_image_folder
    from ..eval.ipr import subsample_features

    rng = np.random.default_rng(0)
    if args.path_to_real_renderings.endswith(".npz"):
        # precalculated real manifold (reference path_real .npz input,
        # improved_precision_recall.py:106)
        from ..eval.ipr import load_manifold

        real_feats, _, _ = load_manifold(args.path_to_real_renderings)
        real_feats = subsample_features(real_feats, args.num_samples, rng)
    elif args.path_to_annotations:
        # real set = train+val renders of a preprocessed cached dataset
        # (improved_precision_recall.py:396-404)
        from ..data.splits import CSVSplitsBuilder
        from ..data.threed_front import CachedThreedFront
        from ..eval.fid import load_image_paths

        ids = CSVSplitsBuilder(args.path_to_annotations).get_splits(
            ["train", "val"])
        ds = CachedThreedFront(args.path_to_real_renderings,
                               config={"train_stats": "dataset_stats.txt"},
                               scene_ids=ids)
        paths = [p for p in ds._path_to_renders if p]
        if not paths:
            raise SystemExit(f"no renders found for train+val under "
                             f"{args.path_to_real_renderings}")
        print(f"real set: {len(paths)} renders from splits ['train', 'val']")
        real_feats = subsample_features(fn(load_image_paths(paths)),
                                        args.num_samples, rng)
    else:
        real_feats = subsample_features(
            fn(load_image_folder(args.path_to_real_renderings)), args.num_samples, rng)
    if args.fname_precalc:
        from ..eval.ipr import save_manifold

        save_manifold(args.fname_precalc, real_feats, k=args.k)
        print(f"saved real manifold ({len(real_feats)} samples) to "
              f"{args.fname_precalc}; path_fake "
              f"({args.path_to_synthesized_renderings}) ignored for precalc")
        return
    fake_feats = subsample_features(
        fn(load_image_folder(args.path_to_synthesized_renderings)), args.num_samples, rng)
    pr = compute_precision_recall(real_feats, fake_feats, k=args.k, num_samples=None)
    payload = {"precision": pr.precision, "recall": pr.recall,
               "features": args.features, "comparable": comparable}
    if args.realism:
        from ..eval.ipr import compute_realism_scores

        scores = compute_realism_scores(real_feats, fake_feats, k=args.k)
        payload["realism_mean"] = float(scores.mean())
        payload["realism_max"] = float(scores.max())
    print(json.dumps(payload))


if __name__ == "__main__":
    main()

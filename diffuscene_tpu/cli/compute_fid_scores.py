"""FID/KID between real and generated render folders.

CLI equivalent of `scripts/compute_fid_scores.py:41-118` (which calls
cleanfid).  The feature extractor is selectable: InceptionV3 with local
weights for paper-comparable numbers, or the offline pixel features (relative
comparisons only — see eval/fid.py).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compute FID/KID between render folders")
    parser.add_argument("path_to_real_renderings")
    parser.add_argument("path_to_synthesized_renderings")
    parser.add_argument("--features", choices=["pixel", "inception"],
                        default="inception",
                        help="'inception' (default) needs --inception_weights "
                        "and errors loudly without them; 'pixel' is an "
                        "explicit offline opt-in, flagged comparable=false "
                        "in the output JSON")
    parser.add_argument("--inception_weights", default=None)
    parser.add_argument("--inception_variant", choices=["fid", "torchvision"],
                        default="fid",
                        help="'fid': canonical FID-network pooling (pytorch-fid"
                        "/cleanfid semantics; use with FID-network weights). "
                        "'torchvision': plain ImageNet inception_v3 semantics "
                        "incl. transform_input")
    parser.add_argument("--kid_subset_size", type=int, default=1000)
    args = parser.parse_args(argv)

    from ..eval.fid import (
        JaxInceptionFeatures, PixelFeatures, compute_fid_folders, compute_kid_folders,
    )

    # "comparable" = the canonical Inception FID-network feature space
    # (fid_pools); anything else is self-consistent but not paper-comparable.
    comparable = args.features == "inception" and args.inception_variant == "fid"
    if args.features == "inception":
        # pure-JAX InceptionV3 (no torchvision); raises FileNotFoundError
        # loudly instead of silently printing a pixel-FID number
        fn = JaxInceptionFeatures(
            args.inception_weights,
            fid_pools=args.inception_variant == "fid",
            transform_input=args.inception_variant == "torchvision")
    else:
        fn = PixelFeatures()
        print("WARNING: pixel features are not comparable to published "
              "Inception-FID numbers; pass --features inception with local weights")

    fid = compute_fid_folders(args.path_to_real_renderings,
                              args.path_to_synthesized_renderings, fn)
    kid = compute_kid_folders(args.path_to_real_renderings,
                              args.path_to_synthesized_renderings, fn,
                              subset_size=args.kid_subset_size)
    print(json.dumps({"fid": fid, "kid": kid, "features": args.features,
                      "comparable": comparable}))


if __name__ == "__main__":
    main()

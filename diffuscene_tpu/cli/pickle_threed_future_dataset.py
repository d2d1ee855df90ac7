"""Pickle the deduped 3D-FUTURE furniture catalog for one room type.

CLI equivalent of `scripts/pickle_threed_fucture_dataset.py:13-115` (note the
reference's filename typo is intentional there; this module uses the correct
spelling).  Output: ``threed_future_model_<room>.pkl`` consumed by
generate_diffusion's mesh retrieval.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser(description="Pickle the 3D-FUTURE catalog")
    parser.add_argument("output_directory")
    parser.add_argument("path_to_3d_front_dataset_directory")
    parser.add_argument("path_to_3d_future_dataset_directory")
    parser.add_argument("path_to_model_info")
    parser.add_argument("--annotation_file", required=True)
    parser.add_argument("--dataset_filtering", default="threed_front_bedroom",
                        choices=["threed_front_bedroom", "threed_front_livingroom",
                                 "threed_front_diningroom", "threed_front_library"])
    parser.add_argument("--path_to_invalid_scene_ids", default=None)
    parser.add_argument("--path_to_invalid_bbox_jids", default=None)
    parser.add_argument("--without_lamps", action="store_true",
                        help="exclude ceiling/pendant lamps from the scene "
                        "filter (pickle_threed_fucture_dataset.py:69-72)")
    args = parser.parse_args(argv)

    from ..data.filters import filter_function
    from ..data.raw import ThreedFront
    from ..data.threed_future import ThreedFutureDataset

    filter_cfg = {
        "filter_fn": args.dataset_filtering,
        "path_to_invalid_scene_ids": args.path_to_invalid_scene_ids,
        "path_to_invalid_bbox_jids": args.path_to_invalid_bbox_jids,
        "annotation_file": args.annotation_file,
    }
    scenes = ThreedFront.from_dataset_directory(
        args.path_to_3d_front_dataset_directory, args.path_to_model_info,
        args.path_to_3d_future_dataset_directory,
        filter_fn=filter_function(filter_cfg, ["train", "val", "test"],
                                  args.without_lamps),
    )
    # dedupe objects by jid (pickle_threed_fucture_dataset.py:75-90)
    seen, objects = set(), []
    for room in scenes.scenes:
        for obj in room.bboxes:
            if obj.model_jid not in seen:
                seen.add(obj.model_jid)
                objects.append(obj)
    dataset = ThreedFutureDataset(objects)
    room = args.dataset_filtering.replace("threed_front_", "")
    os.makedirs(args.output_directory, exist_ok=True)
    out = os.path.join(args.output_directory, f"threed_future_model_{room}.pkl")
    dataset.pickle(out)
    print(f"pickled {len(dataset)} unique objects -> {out}")


if __name__ == "__main__":
    main()

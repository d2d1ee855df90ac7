"""Sample normalized surface point clouds for every 3D-FUTURE model.

CLI equivalent of `scripts/pickle_threed_fucture_pointcloud.py:21-187`: per
object, normalize the raw mesh to the unit cube, sample surface points
(area-weighted triangle sampling in numpy, replacing trimesh.sample), and
write ``raw_model_norm_pc.npz`` (+ optional PLY, as the reference does) next
to the model plus train/val/test lst files.  These feed shape-AE training.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def sample_surface(vertices: np.ndarray, faces: np.ndarray, n: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Area-weighted uniform surface sampling (numpy trimesh.sample port)."""
    tri = vertices[faces]  # (F, 3, 3)
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        idx = rng.integers(0, len(vertices), n)
        return vertices[idx]
    probs = area / total
    choice = rng.choice(len(faces), n, p=probs)
    u = rng.random((n, 1))
    v = rng.random((n, 1))
    flip = (u + v) > 1
    u = np.where(flip, 1 - u, u)
    v = np.where(flip, 1 - v, v)
    t = tri[choice]
    return t[:, 0] + u * (t[:, 1] - t[:, 0]) + v * (t[:, 2] - t[:, 0])


def normalize_to_unit_cube(vertices: np.ndarray) -> np.ndarray:
    """Center at the bbox centroid and scale the longest side to 1
    (pickle_threed_fucture_pointcloud.py:143-160)."""
    lo, hi = vertices.min(0), vertices.max(0)
    center = (lo + hi) / 2
    scale = (hi - lo).max()
    return (vertices - center) / max(scale, 1e-12)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Sample normalized point clouds per model")
    parser.add_argument("output_directory")
    parser.add_argument("path_to_3d_front_dataset_directory")
    parser.add_argument("path_to_3d_future_dataset_directory")
    parser.add_argument("path_to_model_info")
    parser.add_argument("--n_points", type=int, default=30000)
    parser.add_argument("--export_ply", action="store_true",
                        help="also write raw_model_norm_pc.ply per model")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from ..data.raw import parse_threed_future_models

    models = parse_threed_future_models(
        args.path_to_3d_front_dataset_directory,
        args.path_to_3d_future_dataset_directory,
        args.path_to_model_info,
    )
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.output_directory, exist_ok=True)
    names = []
    for i, obj in enumerate(models):
        out_path = obj.raw_model_norm_pc_path
        names.append(obj.model_jid)
        if os.path.isfile(out_path):
            continue
        v, f = obj.raw_model()
        v = normalize_to_unit_cube(v)
        points = sample_surface(v, f, args.n_points, rng).astype(np.float32)
        np.savez(out_path, points=points)
        if args.export_ply:
            from ..data.utils_io import export_pointcloud

            export_pointcloud(points, out_path.replace(".npz", ".ply"), as_text=False)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(models)}")

    # split lst files (pickle_threed_fucture_pointcloud.py:176-187)
    rng.shuffle(names)
    n = len(names)
    splits = {"train": names[: int(0.8 * n)],
              "val": names[int(0.8 * n): int(0.9 * n)],
              "test": names[int(0.9 * n):]}
    for split, ids in splits.items():
        with open(os.path.join(args.output_directory, f"{split}.lst"), "w") as fh:
            fh.write("\n".join(ids))
    print(f"done: {n} models")


if __name__ == "__main__":
    main()

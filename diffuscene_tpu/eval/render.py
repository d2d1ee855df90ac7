"""Top-down orthographic scene rendering (dependency-free numpy rasterizer).

The reference renders retrieved textured meshes with simple_3dviz
(`scripts/utils.py:220-239`, `render_scene_from_bbox_params:460-556`) for
qualitative results and FID inputs.  simple_3dviz/trimesh are not available in
this image, so this module provides a native orthographic box rasterizer:
each object's oriented footprint (translation, size, z-angle) is painted
top-down in its class color over the floor mask — the same projection and
image size (256x256) as the reference's renders.  Mesh-level rendering can be
plugged in where trimesh/simple_3dviz exist; all CLI entry points take a
``renderer`` callable.
"""
from __future__ import annotations

import colorsys
from typing import Dict, Optional

import numpy as np


def class_colors(n: int) -> np.ndarray:
    """Deterministic class palette, (n, 3) uint8 (hls wheel, like the
    reference's seaborn color_palette('hls', n))."""
    cols = [colorsys.hls_to_rgb(i / max(n, 1), 0.6, 0.65) for i in range(n)]
    return (np.asarray(cols) * 255).astype(np.uint8)


def _rot_y(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]], np.float64)


def render_topdown(
    translations: np.ndarray,  # (N, 3) world units
    sizes: np.ndarray,  # (N, 3) half-extents
    angles: np.ndarray,  # (N, 1) radians (or (N, 2) cos/sin)
    class_labels: np.ndarray,  # (N, C) probabilities/one-hot
    image_size: int = 256,
    room_extent: float = 3.1,
    floor_mask: Optional[np.ndarray] = None,
    palette: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Rasterize a scene top-down (x -> u, z -> v).  Returns (S, S, 3) uint8.

    Objects are painted back-to-front by height (y + y-size), so taller
    objects overdraw — a reasonable approximation of the reference's
    orthographic camera looking straight down.
    """
    n = len(translations)
    img = np.zeros((image_size, image_size, 3), np.uint8)
    if floor_mask is not None:
        m = floor_mask
        if m.ndim == 3:
            m = m[..., 0] if m.shape[-1] in (1, 3) else m[0]
        mask_img = np.kron(m > 0.5, np.ones(
            (image_size // m.shape[0] or 1, image_size // m.shape[1] or 1)))
        mask_img = mask_img[:image_size, :image_size]
        img[mask_img > 0] = (230, 230, 230)
    else:
        img[:] = (230, 230, 230)

    if n == 0:
        return img

    pal = palette if palette is not None else class_colors(class_labels.shape[-1])
    angles = np.asarray(angles)
    if angles.shape[-1] == 2:  # cos/sin encoding
        theta = np.arctan2(angles[:, 1], angles[:, 0])
    else:
        theta = angles[:, 0]

    scale = image_size / (2 * room_extent)
    order = np.argsort(np.asarray(translations)[:, 1] + np.asarray(sizes)[:, 1])
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    # pixel centers in world coords
    wx = (xx + 0.5) / scale - room_extent
    wz = (yy + 0.5) / scale - room_extent

    for i in order:
        cx, _, cz = np.asarray(translations[i], np.float64)
        sx, _, sz = np.asarray(sizes[i], np.float64)
        R = _rot_y(theta[i])
        # transform pixel grid into the box frame
        dx = wx - cx
        dz = wz - cz
        lx = R[0, 0] * dx + R[1, 0] * dz
        lz = R[0, 1] * dx + R[1, 1] * dz
        inside = (np.abs(lx) <= sx) & (np.abs(lz) <= sz)
        img[inside] = pal[int(np.argmax(class_labels[i]))]
    return img


def render_scene_dict(boxes: Dict[str, np.ndarray], image_size: int = 256,
                      room_extent: float = 3.1,
                      floor_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Render a post-processed per-scene attribute dict (see
    eval/postprocess.py).  Accepts (N, ...) or (1, N, ...) leading shapes."""
    sq = lambda a: np.asarray(a)[0] if np.asarray(a).ndim == 3 else np.asarray(a)
    return render_topdown(
        sq(boxes["translations"]), sq(boxes["sizes"]), sq(boxes["angles"]),
        sq(boxes["class_labels"]), image_size=image_size,
        room_extent=room_extent, floor_mask=floor_mask,
    )


def save_image(img: np.ndarray, path: str):
    from PIL import Image

    Image.fromarray(img).save(path)


def render_scene_from_bbox_params(boxes: Dict[str, np.ndarray], path: str,
                                  image_size: int = 256, room_extent: float = 3.1,
                                  floor_mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Render one scene's bbox params to a PNG and return the image.

    Named for parity with the reference `render_scene_from_bbox_params`
    (scripts/utils.py:460-556); this rasterizes oriented footprints instead
    of retrieved textured meshes (see module docstring).
    """
    img = render_scene_dict(boxes, image_size=image_size,
                            room_extent=room_extent, floor_mask=floor_mask)
    save_image(img, path)
    return img


def render_to_folder(boxes_list, output_directory: str, prefix: str = "",
                     image_size: int = 256, room_extent: float = 3.1):
    """Render a list of per-scene bbox dicts into a folder of PNGs.

    Equivalent of the reference `render_to_folder` (scripts/utils.py:361-457)
    minus the mesh/texture machinery.  Returns the written paths.
    """
    import os

    os.makedirs(output_directory, exist_ok=True)
    paths = []
    for i, boxes in enumerate(boxes_list):
        p = os.path.join(output_directory, f"{prefix}{i:05d}.png")
        render_scene_from_bbox_params(boxes, p, image_size=image_size,
                                      room_extent=room_extent)
        paths.append(p)
    return paths

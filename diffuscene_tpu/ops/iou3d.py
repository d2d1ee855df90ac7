"""Axis-aligned 3D bbox IoU, batched, XLA-fused.

TPU-native equivalent of the reference IoU used by the training-time
regularizer (`scene_synthesis/networks/loss.py:7-102`).  The object counts are
tiny (N <= 21), so the right design is a single fused elementwise expression
that XLA vectorizes on the VPU — no kernel needed; it fuses into the
surrounding loss computation.
"""
from __future__ import annotations

import jax.numpy as jnp


def axis_aligned_bbox_overlaps_3d(
    bboxes1: jnp.ndarray,
    bboxes2: jnp.ndarray,
    mode: str = "iou",
    is_aligned: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pairwise (or aligned) IoU/GIoU of axis-aligned 3D boxes.

    bboxes are (..., M, 6) as <x1, y1, z1, x2, y2, z2>.  With
    ``is_aligned=False`` returns (..., M, N); otherwise (..., M).
    """
    assert mode in ("iou", "giou"), mode
    assert bboxes1.shape[-1] == 6 and bboxes2.shape[-1] == 6

    area1 = (
        (bboxes1[..., 3] - bboxes1[..., 0])
        * (bboxes1[..., 4] - bboxes1[..., 1])
        * (bboxes1[..., 5] - bboxes1[..., 2])
    )
    area2 = (
        (bboxes2[..., 3] - bboxes2[..., 0])
        * (bboxes2[..., 4] - bboxes2[..., 1])
        * (bboxes2[..., 5] - bboxes2[..., 2])
    )

    if is_aligned:
        lt = jnp.maximum(bboxes1[..., :3], bboxes2[..., :3])
        rb = jnp.minimum(bboxes1[..., 3:], bboxes2[..., 3:])
        wh = jnp.clip(rb - lt, 0.0, None)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1 + area2 - overlap
        if mode == "giou":
            enclosed_lt = jnp.minimum(bboxes1[..., :3], bboxes2[..., :3])
            enclosed_rb = jnp.maximum(bboxes1[..., 3:], bboxes2[..., 3:])
    else:
        lt = jnp.maximum(bboxes1[..., :, None, :3], bboxes2[..., None, :, :3])
        rb = jnp.minimum(bboxes1[..., :, None, 3:], bboxes2[..., None, :, 3:])
        wh = jnp.clip(rb - lt, 0.0, None)
        overlap = wh[..., 0] * wh[..., 1] * wh[..., 2]
        union = area1[..., :, None] + area2[..., None, :] - overlap
        if mode == "giou":
            enclosed_lt = jnp.minimum(bboxes1[..., :, None, :3], bboxes2[..., None, :, :3])
            enclosed_rb = jnp.maximum(bboxes1[..., :, None, 3:], bboxes2[..., None, :, 3:])

    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode == "iou":
        return ious
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0.0, None)
    enclose_area = enclose_wh[..., 0] * enclose_wh[..., 1] * enclose_wh[..., 2]
    enclose_area = jnp.maximum(enclose_area, eps)
    return ious - (enclose_area - union) / enclose_area

from .chamfer import (
    chamfer_2d,
    chamfer_3d,
    chamfer_5d,
    chamfer_distance,
    chamfer_oracle,
    fscore,
    pairwise_sqdist,
)
from .iou3d import axis_aligned_bbox_overlaps_3d
from .knn import gather_neighbors, knn_indices
from .attention import fused_set_attention
from .fused_resblock import fused_resnet_block, standardize_kernel

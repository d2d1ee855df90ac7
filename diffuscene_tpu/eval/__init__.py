from .fid import (
    InceptionFeatures,
    PixelFeatures,
    compute_fid_folders,
    compute_kid_folders,
    fid_from_features,
    frechet_distance,
    kid_from_features,
    load_image_folder,
)
from .ipr import PrecisionRecall, compute_ipr_folders, compute_precision_recall, knn_radii
from .metrics import (
    bbox_iou_and_overlap_ratio,
    categorical_kl,
    compute_intersection,
    compute_symmetry,
    judge_if_symmetry,
    scene_bboxes_from_params,
)
from .postprocess import one_hot_from_probs, split_network_samples

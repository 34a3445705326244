"""Pure-JAX numerics core: batched heatmap ops, affine warps, PCK, AdaIN."""

from .heatmap import (
    generate_prior_map,
    generate_target,
    generate_target_batch,
    get_max_preds,
    rectify,
    render_gaussian,
)
from .affine import (
    inverse_affine_coeffs,
    rss_coeffs,
    warp_affine,
    warp_affine_chain,
    inverse_warp_heatmaps,
    forward_warp_images,
    affine_keypoints,
)
from .pck import keypoint_pck_accuracy, accuracy, get_max_preds_np
from .adain import calc_mean_std, adain, gram_matrix

__all__ = [
    "generate_target",
    "generate_target_batch",
    "get_max_preds",
    "rectify",
    "render_gaussian",
    "inverse_affine_coeffs",
    "rss_coeffs",
    "warp_affine",
    "warp_affine_chain",
    "inverse_warp_heatmaps",
    "forward_warp_images",
    "affine_keypoints",
    "keypoint_pck_accuracy",
    "accuracy",
    "get_max_preds_np",
    "calc_mean_std",
    "adain",
    "gram_matrix",
]

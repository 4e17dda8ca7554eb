from retargetvid_tpu.ops.resize import resize, resize_matrix
from retargetvid_tpu.ops.threshold import threshold_saliency
from retargetvid_tpu.ops.morphology import dilate, erode, close as morph_close
from retargetvid_tpu.ops.clustering import connected_components, clustering_filter
from retargetvid_tpu.ops.center import center_of_mass
from retargetvid_tpu.ops.scenes import predictions_to_scenes, fix_scene_bounds
from retargetvid_tpu.ops.border import (
    border_detection, mean_saliency, coverage_score)
from retargetvid_tpu.ops.boxes import calc_dest_size, compute_crop_boxes, shift_time
from retargetvid_tpu.ops.temporal import fill_empty_centers, freeze_unstable_segments
from retargetvid_tpu.ops.focus import jump_saliency_scores
from retargetvid_tpu.ops.interpolate import interpolate_segments
from retargetvid_tpu.ops.filters import (
    butter_lowpass_filter, savgol_smooth, loess_smooth, smooth_segments)

__all__ = [
    "resize", "resize_matrix",
    "threshold_saliency",
    "dilate", "erode", "morph_close",
    "connected_components", "clustering_filter",
    "center_of_mass",
    "predictions_to_scenes", "fix_scene_bounds",
    "border_detection", "mean_saliency", "coverage_score",
    "calc_dest_size", "compute_crop_boxes", "shift_time",
    "fill_empty_centers", "freeze_unstable_segments",
    "jump_saliency_scores",
    "interpolate_segments",
    "butter_lowpass_filter", "savgol_smooth", "loess_smooth",
    "smooth_segments",
]

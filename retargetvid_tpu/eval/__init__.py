from retargetvid_tpu.eval.annotations import (
    load_annotations,
    read_boxes_file,
    write_boxes_file,
    VID_INDS,
    ASPECT_RATIOS,
)
from retargetvid_tpu.eval.harness import (
    iou_xyxy_inclusive,
    iou_series,
    score_run,
    evaluate_results_tree,
    benchmark_eval_boxes,
)

__all__ = [
    "load_annotations",
    "read_boxes_file",
    "write_boxes_file",
    "VID_INDS",
    "ASPECT_RATIOS",
    "iou_xyxy_inclusive",
    "iou_series",
    "score_run",
    "evaluate_results_tree",
    "benchmark_eval_boxes",
]

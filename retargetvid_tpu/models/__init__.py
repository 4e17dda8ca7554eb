from retargetvid_tpu.models.unisal import UNISAL
from retargetvid_tpu.models.mobilenet_v2 import MobileNetV2
from retargetvid_tpu.models.transnet import TransNetV1, predict_video_windows

__all__ = ["UNISAL", "MobileNetV2", "TransNetV1", "predict_video_windows"]

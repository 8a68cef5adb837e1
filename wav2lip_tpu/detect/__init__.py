from wav2lip_tpu.detect.pipeline import FaceDetectionPipeline, RoiTracker
from wav2lip_tpu.detect.landmarks import (
    LandmarkPipeline,
    box_to_center_scale,
    crop_face,
    transform_points,
)

__all__ = [
    "FaceDetectionPipeline",
    "RoiTracker",
    "LandmarkPipeline",
    "box_to_center_scale",
    "crop_face",
    "transform_points",
]

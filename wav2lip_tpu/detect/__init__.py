from wav2lip_tpu.detect.pipeline import FaceDetectionPipeline, RoiTracker

__all__ = ["FaceDetectionPipeline", "RoiTracker"]

from wav2lip_tpu.detect.pipeline import FaceDetectionPipeline

__all__ = ["FaceDetectionPipeline"]

from wav2lip_tpu.infer.pipeline import LipSyncPipeline

__all__ = ["LipSyncPipeline"]

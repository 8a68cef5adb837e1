from wav2lip_tpu.eval.lse import LSEScorer

__all__ = ["LSEScorer"]

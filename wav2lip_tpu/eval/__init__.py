from wav2lip_tpu.eval.lse import LSEScorer
from wav2lip_tpu.eval.fid import (
    FIDScorer,
    InceptionV3FID,
    compute_statistics,
    frechet_distance,
    import_inception,
)

__all__ = [
    "LSEScorer",
    "FIDScorer",
    "InceptionV3FID",
    "compute_statistics",
    "frechet_distance",
    "import_inception",
]

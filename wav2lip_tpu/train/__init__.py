from wav2lip_tpu.train.losses import (
    l1_loss,
    bce,
    cosine_bce_loss,
    fold_lower_half_for_syncnet,
)

__all__ = ["l1_loss", "bce", "cosine_bce_loss", "fold_lower_half_for_syncnet"]

from wav2lip_tpu.train.losses import (
    l1_loss,
    bce,
    cosine_bce_loss,
    sync_loss_from_frames,
)

__all__ = ["l1_loss", "bce", "cosine_bce_loss", "sync_loss_from_frames"]

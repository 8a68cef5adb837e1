from wav2lip_tpu.ops.nms import batched_nms, pairwise_iou
from wav2lip_tpu.ops.anchors import decode_all_scales

__all__ = ["batched_nms", "pairwise_iou", "decode_all_scales"]

from wav2lip_tpu.models.generator import Wav2LipGenerator
from wav2lip_tpu.models.syncnet import SyncNet
from wav2lip_tpu.models.discriminator import QualityDiscriminator
from wav2lip_tpu.models.s3fd import S3FD
from wav2lip_tpu.models.fan import FAN, ResNetDepth, heatmaps_to_landmarks

__all__ = [
    "Wav2LipGenerator",
    "SyncNet",
    "QualityDiscriminator",
    "S3FD",
    "FAN",
    "ResNetDepth",
    "heatmaps_to_landmarks",
]

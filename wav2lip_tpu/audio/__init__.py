from wav2lip_tpu.audio.mel import (
    MelFrontend,
    load_wav,
    save_wav,
    melspectrogram,
)
from wav2lip_tpu.audio.mel_pallas import PallasMelFrontend

__all__ = [
    "MelFrontend",
    "PallasMelFrontend",
    "load_wav",
    "save_wav",
    "melspectrogram",
]

from wav2lip_tpu.audio.mel import (
    MelFrontend,
    load_wav,
    save_wav,
    melspectrogram,
)

__all__ = ["MelFrontend", "load_wav", "save_wav", "melspectrogram"]

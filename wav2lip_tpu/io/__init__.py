from wav2lip_tpu.io.video import (
    read_video_frames,
    VideoFrameWriter,
    mux_audio,
    extract_audio,
    has_ffmpeg,
)

__all__ = [
    "read_video_frames",
    "VideoFrameWriter",
    "mux_audio",
    "extract_audio",
    "has_ffmpeg",
]

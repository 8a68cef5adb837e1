from wav2lip_tpu.io.video import (
    read_video_frames,
    MJPEGWriter,
    VideoFrameReader,
    VideoFrameWriter,
    make_frame_writer,
    mux_audio,
    embed_wav_audio,
    extract_audio,
    has_ffmpeg,
)

__all__ = [
    "read_video_frames",
    "MJPEGWriter",
    "VideoFrameReader",
    "VideoFrameWriter",
    "make_frame_writer",
    "mux_audio",
    "embed_wav_audio",
    "extract_audio",
    "has_ffmpeg",
]

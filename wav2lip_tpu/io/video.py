"""Host-side media I/O.

The TPU work happens between decode and encode; demux/decode/encode/mux stay
on the host exactly as in the reference (cv2.VideoCapture/VideoWriter +
ffmpeg subprocess calls, inference.py:190-213,217-222,256,276-277). ffmpeg is
probed at runtime and every ffmpeg-dependent step degrades with a clear error
(or a documented fallback) when the binary is absent.

Performance-critical deltas from the reference:

* :class:`VideoFrameReader` streams frames instead of materializing the whole
  clip in RAM (the reference reads everything up front,
  inference.py:190-213);
* :class:`MJPEGWriter` writes an MJPG AVI container directly with cv2's JPEG
  encoder — on a single core baseline JPEG costs ~4.5 ms/frame at 1080p vs
  ~8-9 ms for cv2.VideoWriter's DIVX/mp4v encoders, and the container itself
  is a few hundred bytes of RIFF bookkeeping.
"""

from __future__ import annotations

import mmap
import os
import shutil
import struct
import subprocess
import tempfile
from typing import Iterator, List, Optional, Tuple

# Let ffmpeg-backed VideoCapture use its frame-threaded decoder (threads;0 =
# one per core). OpenCV's default is a single decode thread, which makes
# 1080p H.264 decode the serial floor of the whole inference pipeline
# (~3.3 ms/frame single-threaded). Read at capture-open time; setdefault
# respects a caller's own setting. Must be set before cv2 opens a capture —
# importing this module is the chokepoint for every reader in the package.
os.environ.setdefault("OPENCV_FFMPEG_CAPTURE_OPTIONS", "threads;0")

import cv2
import numpy as np


def has_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


class VideoFrameReader:
    """Streaming decode with the reference's ingest transforms
    (inference.py:190-213): integer downscale, optional 90° clockwise
    rotate, then crop (top, bottom, left, right; -1 = full extent).

    ``approx_frame_count`` comes from the container header and may be 0 or
    slightly off for some files — callers must treat it as a hint.
    """

    def __init__(
        self,
        path: str,
        resize_factor: int = 1,
        rotate: bool = False,
        crop: Tuple[int, int, int, int] = (0, -1, 0, -1),
    ):
        self._cap = cv2.VideoCapture(path)
        if not self._cap.isOpened():
            raise ValueError(f"could not open video: {path}")
        self.path = path
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS) or 25.0)
        self.approx_frame_count = int(
            self._cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0
        )
        self._resize_factor = resize_factor
        self._rotate = rotate
        self._crop = crop

    @property
    def reads_into_dst(self) -> bool:
        """True when frames pass through untransformed, so :meth:`read` can
        decode straight into a caller-provided destination buffer."""
        return (
            self._resize_factor <= 1
            and not self._rotate
            and tuple(self._crop) == (0, -1, 0, -1)
        )

    def read(self, dst: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        """Next transformed BGR frame, or None at end of stream.

        ``dst``: optional (H, W, 3) uint8 buffer to decode into — cv2's
        colorspace conversion then writes the pixels straight into ``dst``
        (e.g. a view of a memory-mapped output file), skipping one
        full-frame copy. Only honored when :attr:`reads_into_dst`; the
        caller must check whether the returned array IS ``dst`` (cv2
        reallocates on size/type mismatch).
        """
        if dst is not None and self.reads_into_dst:
            ok, frame = self._cap.read(dst)
            return frame if ok else None
        ok, frame = self._cap.read()
        if not ok:
            return None
        if self._resize_factor > 1:
            frame = cv2.resize(
                frame,
                (frame.shape[1] // self._resize_factor,
                 frame.shape[0] // self._resize_factor),
            )
        if self._rotate:
            frame = cv2.rotate(frame, cv2.ROTATE_90_CLOCKWISE)
        y1, y2, x1, x2 = self._crop
        fy2 = frame.shape[0] if y2 == -1 else y2
        fx2 = frame.shape[1] if x2 == -1 else x2
        return frame[y1:fy2, x1:fx2]

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self.read()
            if frame is None:
                return
            yield frame

    def seek(self, frame_idx: int) -> bool:
        """Position the decoder so the next :meth:`read` returns frame
        ``frame_idx``. Returns False when the backend cannot seek (or lands
        elsewhere) — callers must then fall back to sequential decode.

        cv2's ffmpeg backend implements CAP_PROP_POS_FRAMES by seeking to
        the preceding keyframe and decoding forward, so the position is
        frame-accurate for the container/codec set this package reads and
        writes (mp4/avi; h264/mpeg4/MJPG/raw). The get() round-trip below
        rejects backends that only land on a nearby keyframe."""
        ok = self._cap.set(cv2.CAP_PROP_POS_FRAMES, float(frame_idx))
        return bool(ok) and int(
            self._cap.get(cv2.CAP_PROP_POS_FRAMES)
        ) == int(frame_idx)

    def close(self) -> None:
        self._cap.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_video_frames(
    path: str,
    resize_factor: int = 1,
    rotate: bool = False,
    crop: Tuple[int, int, int, int] = (0, -1, 0, -1),
) -> Tuple[List[np.ndarray], float]:
    """Decode a whole video into BGR frames (materialized). Prefer
    :class:`VideoFrameReader` on long clips. Returns (frames, fps)."""
    with VideoFrameReader(path, resize_factor, rotate, crop) as reader:
        frames = list(reader)
        if not frames:
            raise ValueError(f"no frames decoded from {path}")
        return frames, reader.fps


class VideoFrameWriter:
    """Streaming BGR frame writer (cv2.VideoWriter).

    The reference writes a DIVX .avi intermediate then muxes audio with ffmpeg
    (inference.py:256,276). mp4v is used by default here since it is portable
    across OpenCV builds; pass ``fourcc='DIVX'`` for bit-identical reference
    behavior. For the fast path see :class:`MJPEGWriter`.
    """

    def __init__(self, path: str, fps: float, frame_size_hw: Tuple[int, int],
                 fourcc: str = "mp4v"):
        h, w = frame_size_hw
        self.path = path
        self._writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*fourcc), fps, (w, h)
        )
        if not self._writer.isOpened():
            raise ValueError(f"could not open video writer: {path}")

    def write(self, frame_bgr: np.ndarray) -> None:
        self._writer.write(frame_bgr)

    # split encode/write API parity (cv2 encodes inside write; the "encoded
    # payload" is the frame itself)
    def encode_frame(self, frame_bgr: np.ndarray) -> np.ndarray:
        return frame_bgr

    def write_encoded(self, frame_bgr: np.ndarray) -> None:
        self._writer.write(frame_bgr)

    def close(self) -> None:
        self._writer.release()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _AVIWriterBase:
    """Shared RIFF-AVI container plumbing (RIFF 'AVI ' → hdrl → movi chunks →
    idx1 index). Subclasses set the stream fourcc/compression and implement
    ``write`` by handing per-frame payload bytes to :meth:`_append_chunk`.

    Containers larger than one RIFF chunk roll over into OpenDML AVI 2.0
    ``RIFF AVIX`` continuation chunks automatically (RIFF sizes are 32-bit;
    without this a >4 GB write — ~25 s of raw 1080p — would overflow at
    close after all the work was done). Layout follows the ODML convention:
    the first RIFF carries hdrl + movi + the legacy ``idx1`` (so pre-ODML
    readers still play its frames), each continuation is ``RIFF('AVIX')
    LIST('movi')``, and a ``LIST odml → dmlh`` header carries the true total
    frame count. ffmpeg/libav (and so cv2) read the continuation chunks by
    sequential scan — verified: a multi-RIFF file round-trips through
    cv2.VideoCapture with the full frame count reported.
    """

    _AVIF_HASINDEX = 0x10
    _AVIIF_KEYFRAME = 0x10

    #: max bytes per RIFF chunk before rolling into an AVIX continuation.
    #: The ODML convention is ~1 GiB for broad reader compatibility (the
    #: format allows up to 4 GiB − 1). Tests shrink this to force rollover
    #: on tiny files.
    _RIFF_LIMIT = 1 << 30

    #: payload of the reserved audio-stream slot (see _write_headers): a JUNK
    #: chunk exactly the size of the 'LIST strl' a PCM audio stream needs
    #: (strh 56 + WAVEFORMATEX strf 18), so :func:`embed_wav_audio` can turn
    #: a finished silent container into video+audio by patching bytes in
    #: place — no header shift, no movi rewrite.
    _AUDIO_SLOT_MARKER = b"W2L_AUDIO_SLOT\x00"
    _AUDIO_SLOT_PAYLOAD = 94  # == 102-byte LIST strl minus the 8-byte header

    #: stream handler fourcc (strh) and BITMAPINFOHEADER biCompression (strf)
    _HANDLER = b"\x00\x00\x00\x00"
    _COMPRESSION = b"\x00\x00\x00\x00"
    #: movi chunk id: '00dc' = compressed video, '00db' = uncompressed DIB
    _CHUNK_ID = b"00dc"
    #: biHeight sign: raw DIB frames are stored top-down with negative height
    _HEIGHT_SIGN = 1
    #: open an existing file r+b (page reuse) instead of truncating
    _REUSE_EXISTING = False

    def __init__(self, path: str, fps: float, frame_size_hw: Tuple[int, int]):
        self.path = path
        self.fps = float(fps)
        self.h, self.w = frame_size_hw
        # w+b: PreallocRawAVIWriter memory-maps the fd, and mmap's
        # PROT_READ|PROT_WRITE mapping needs a read-write file object.
        # _REUSE_EXISTING keeps an existing file's pages alive (r+b instead
        # of truncating): rewriting a tmpfs file in place skips the
        # page-fault + zero-fill cost of fresh pages (~0.6 s per 1080p-250
        # frame container) — every byte up to the final size is overwritten
        # and close() trims the rest
        if self._REUSE_EXISTING and os.path.isfile(path):
            self._file = open(path, "r+b")
        else:
            self._file = open(path, "w+b")
        self._index: List[Tuple[int, int]] = []  # (offset into movi, size)
        self._movi_bytes = 4  # 'movi' fourcc
        self._max_chunk = 0
        self._closed = False
        self._total_frames = 0
        self._riff_index = 0        # 0 = the 'AVI ' RIFF, ≥1 = AVIX chunks
        self._riff_start = 0        # file offset of the current RIFF header
        self._first_riff_frames = 0
        self._idx1_written = False
        self._write_headers()

    # -- container ------------------------------------------------------------

    def _write_headers(self) -> None:
        f = self._file
        # sizes are back-patched in close(); record the patch offsets
        f.write(b"RIFF")
        self._riff_size_pos = f.tell(); f.write(struct.pack("<I", 0))
        f.write(b"AVI ")

        # LIST hdrl (+24: LIST odml → dmlh; +102: the reserved audio-stream
        # JUNK slot at the end)
        hdrl_payload_size = 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 40 + 24 + 102
        f.write(b"LIST" + struct.pack("<I", hdrl_payload_size) + b"hdrl")

        # avih: MainAVIHeader
        f.write(b"avih" + struct.pack("<I", 56))
        self._avih_pos = f.tell()
        usec = int(round(1_000_000 / self.fps)) if self.fps > 0 else 40_000
        f.write(struct.pack(
            "<14I",
            usec,            # dwMicroSecPerFrame
            0,               # dwMaxBytesPerSec (patched: best effort 0)
            0,               # dwPaddingGranularity
            self._AVIF_HASINDEX,
            0,               # dwTotalFrames (patched)
            0,               # dwInitialFrames
            1,               # dwStreams
            0,               # dwSuggestedBufferSize (patched)
            self.w, self.h,
            0, 0, 0, 0,      # reserved
        ))

        # LIST strl
        strl_payload_size = 4 + 8 + 56 + 8 + 40
        f.write(b"LIST" + struct.pack("<I", strl_payload_size) + b"strl")

        # strh: AVIStreamHeader — fractional fps via scale 1000
        f.write(b"strh" + struct.pack("<I", 56))
        self._strh_pos = f.tell()
        f.write(b"vids" + self._HANDLER)
        f.write(struct.pack(
            "<IHHIIIIIIIi4h",
            0, 0, 0,                       # dwFlags, wPriority, wLanguage
            0,                             # dwInitialFrames
            1000,                          # dwScale
            int(round(self.fps * 1000)),   # dwRate
            0,                             # dwStart
            0,                             # dwLength (patched)
            0,                             # dwSuggestedBufferSize (patched)
            0xFFFFFFFF,                    # dwQuality (-1: default)
            0,                             # dwSampleSize
            0, 0, self.w, self.h,          # rcFrame
        ))

        # strf: BITMAPINFOHEADER
        f.write(b"strf" + struct.pack("<I", 40))
        f.write(struct.pack(
            "<IiiHH4sIiiII",
            40, self.w, self._HEIGHT_SIGN * self.h, 1, 24, self._COMPRESSION,
            self.w * self.h * 3, 0, 0, 0, 0,
        ))

        # LIST odml → dmlh: the ODML extended header whose dwTotalFrames
        # counts frames across ALL RIFF chunks (avih's counts only the first
        # RIFF once the container rolls into AVIX continuations)
        f.write(b"LIST" + struct.pack("<I", 4 + 8 + 4) + b"odml")
        f.write(b"dmlh" + struct.pack("<I", 4))
        self._dmlh_pos = f.tell()
        f.write(struct.pack("<I", 0))  # dwTotalFrames (patched in close)

        # reserved audio slot: legal-AVI JUNK padding that embed_wav_audio()
        # later rewrites into the audio stream's LIST strl (same byte count)
        f.write(b"JUNK" + struct.pack("<I", self._AUDIO_SLOT_PAYLOAD))
        f.write(self._AUDIO_SLOT_MARKER
                + b"\x00" * (self._AUDIO_SLOT_PAYLOAD
                             - len(self._AUDIO_SLOT_MARKER)))

        # LIST movi
        f.write(b"LIST")
        self._movi_size_pos = f.tell(); f.write(struct.pack("<I", 0))
        f.write(b"movi")

    def _append_chunk(self, payload) -> None:
        """Append one frame chunk (bytes or any buffer-protocol object),
        rolling into a new ``RIFF AVIX`` continuation when the current RIFF
        would exceed :attr:`_RIFF_LIMIT`."""
        if self._closed:
            raise ValueError("writer is closed")
        size = len(payload) if isinstance(payload, bytes) else payload.nbytes
        padded = size + (size & 1)
        f = self._file
        if self._movi_bytes > 4:  # never roll an empty movi
            # idx1 lands inside the first RIFF at rollover; budget for it
            idx1_reserve = (
                8 + 16 * (len(self._index) + 1) if self._riff_index == 0
                else 0
            )
            projected = (f.tell() - self._riff_start) + 8 + padded
            if projected + idx1_reserve > self._RIFF_LIMIT:
                self._roll_riff()
        if self._riff_index == 0:
            self._index.append((self._movi_bytes, size))
        self._total_frames += 1
        f.write(self._CHUNK_ID + struct.pack("<I", size))
        f.write(payload)
        if size & 1:
            f.write(b"\x00")
        self._movi_bytes += 8 + padded
        self._max_chunk = max(self._max_chunk, size)

    def _write_idx1(self) -> None:
        """Write the legacy idx1 index (first-RIFF frames only) at the
        current file position."""
        f = self._file
        f.write(b"idx1" + struct.pack("<I", 16 * len(self._index)))
        for offset, size in self._index:
            f.write(self._CHUNK_ID + struct.pack(
                "<III", self._AVIIF_KEYFRAME, offset, size
            ))
        self._first_riff_frames = len(self._index)
        self._idx1_written = True

    def _patch_riff_sizes(self) -> None:
        """Back-patch the current RIFF and movi LIST sizes from the current
        end of file, leaving the file position at the end."""
        f = self._file
        end = f.tell()
        f.seek(self._riff_size_pos)
        f.write(struct.pack("<I", end - self._riff_size_pos - 4))
        f.seek(self._movi_size_pos)
        f.write(struct.pack("<I", self._movi_bytes))
        f.seek(end)

    def _roll_riff(self) -> None:
        """Close the current RIFF (writing idx1 if it is the first) and open
        a ``RIFF AVIX → LIST movi`` continuation."""
        f = self._file
        if self._riff_index == 0:
            self._write_idx1()
        self._patch_riff_sizes()
        self._riff_start = f.tell()
        f.write(b"RIFF")
        self._riff_size_pos = f.tell()
        f.write(struct.pack("<I", 0))
        f.write(b"AVIX")
        f.write(b"LIST")
        self._movi_size_pos = f.tell()
        f.write(struct.pack("<I", 0))
        f.write(b"movi")
        self._movi_bytes = 4
        self._riff_index += 1

    def encode_frame(self, frame_bgr: np.ndarray):
        """Turn one BGR frame into its chunk payload — pure CPU work with no
        container state, safe to fan out across threads; only
        :meth:`write_encoded` must stay ordered."""
        raise NotImplementedError

    def write_encoded(self, payload) -> None:
        """Append one pre-encoded frame payload (ordered)."""
        self._append_chunk(payload)

    def write(self, frame_bgr: np.ndarray) -> None:
        self.write_encoded(self.encode_frame(frame_bgr))

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        self._finalize()

    def _finalize(self) -> None:
        """Write idx1 (single-RIFF containers; multi-RIFF ones wrote it at
        the first rollover) and back-patch the header sizes from
        ``_index``/``_movi_bytes``/``_max_chunk``/``_total_frames``."""
        f = self._file
        total = self._total_frames or len(self._index)
        if not self._idx1_written:
            self._write_idx1()
        self._patch_riff_sizes()
        f.seek(self._avih_pos + 16)
        # dwTotalFrames counts the FIRST RIFF's frames (ODML semantics);
        # dmlh carries the cross-RIFF total — identical for single-RIFF files
        f.write(struct.pack("<I", self._first_riff_frames))
        f.seek(self._avih_pos + 28)
        f.write(struct.pack("<I", self._max_chunk + 8))    # dwSuggestedBufferSize
        f.seek(self._strh_pos + 8 + 4 + 2 + 2 + 4 + 4 + 4 + 4)
        f.write(struct.pack("<I", total))                  # dwLength
        f.write(struct.pack("<I", self._max_chunk + 8))    # dwSuggestedBufferSize
        f.seek(self._dmlh_pos)
        f.write(struct.pack("<I", total))
        f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class MJPEGWriter(_AVIWriterBase):
    """MJPG-in-AVI writer, JPEG-encoding frames with cv2.imencode.

    Every mainstream reader (OpenCV, ffmpeg, VLC) accepts MJPG AVI; unlike
    inter-frame codecs each frame is independent, so encode cost is one
    baseline JPEG — measurably cheaper than cv2.VideoWriter's DIVX/mp4v on a
    single core and embarrassingly parallel if cores are available.
    """

    _HANDLER = b"MJPG"
    _COMPRESSION = b"MJPG"
    _CHUNK_ID = b"00dc"
    _HEIGHT_SIGN = 1

    def __init__(self, path: str, fps: float, frame_size_hw: Tuple[int, int],
                 quality: int = 90):
        self.quality = int(quality)
        super().__init__(path, fps, frame_size_hw)

    def encode_frame(self, frame_bgr: np.ndarray) -> bytes:
        if frame_bgr.shape[:2] != (self.h, self.w):
            raise ValueError(
                f"frame shape {frame_bgr.shape[:2]} != {(self.h, self.w)}"
            )
        ok, buf = cv2.imencode(
            ".jpg", frame_bgr, [cv2.IMWRITE_JPEG_QUALITY, self.quality]
        )
        if not ok:
            raise ValueError("JPEG encode failed")
        return buf.tobytes()


class RawAVIWriter(_AVIWriterBase):
    """Uncompressed BGR24 ('DIB ') AVI writer — zero per-frame encode CPU.

    A raw DIB chunk is one buffered ``write`` into the page cache
    (<1 ms/frame) at the price of 6.2 MB/frame on disk: 1080p @ 25 fps needs
    a ~155 MB/s sustained sink, so once the clip outruns the page cache the
    writes block on disk writeback (measured: a ~90 MB/s disk turned the
    encode stage from 0.9 s into 14.6 s across repeated runs). Use for
    lossless output or fast scratch space; :class:`MJPEGWriter` with the
    pooled ``encode_frame`` path is the throughput default. The frame is
    stored top-down via negative ``biHeight`` (no vertical-flip pass;
    ffmpeg/OpenCV both honor it).
    """

    _HANDLER = b"DIB "
    _COMPRESSION = b"\x00\x00\x00\x00"  # BI_RGB
    _CHUNK_ID = b"00db"
    _HEIGHT_SIGN = -1  # top-down rows

    def encode_frame(self, frame_bgr: np.ndarray) -> np.ndarray:
        if frame_bgr.shape[:2] != (self.h, self.w):
            raise ValueError(
                f"frame shape {frame_bgr.shape[:2]} != {(self.h, self.w)}"
            )
        frame_bgr = np.ascontiguousarray(frame_bgr, dtype=np.uint8)
        row = self.w * 3
        if row % 4:  # BI_RGB rows are 4-byte aligned
            stride = (row + 3) & ~3
            padded = np.zeros((self.h, stride), np.uint8)
            padded[:, :row] = frame_bgr.reshape(self.h, row)
            frame_bgr = padded
        return frame_bgr

    def write_encoded(self, payload) -> None:
        self._append_chunk(payload.data if isinstance(payload, np.ndarray)
                           else payload)


class PreallocRawAVIWriter(_AVIWriterBase):
    """Raw BGR24 AVI with the whole container preallocated and memory-mapped.

    The frame payloads live at fixed offsets, so callers write pixels
    DIRECTLY into :meth:`frame_view`'s (H, W, 3) uint8 views of the output
    file — the video decoder's colorspace conversion and the mouth-patch
    composite land in their final location and the encode and write stages of
    the pipeline cease to exist (the reference encodes + writes every frame
    serially, inference.py:267-272). On a RAM-backed filesystem a view write
    is pure memcpy: measured 2.9-3.3 ms/frame for 1080p decode-into-view on
    tmpfs vs 3.9 ms decode + 2.5 ms write on the buffered path.

    Constraints: the frame count ceiling must be known up front (the file is
    truncated down in :meth:`close` if fewer frames were committed), rows
    must be 4-byte aligned (``w*3 % 4 == 0`` — BI_RGB padding would break the
    contiguous view), and the target filesystem must tolerate ``max_frames *
    (h*w*3 + 8)`` bytes — use :func:`ram_backed_bytes_free` before choosing
    it. Frames are stored top-down via negative ``biHeight`` like
    :class:`RawAVIWriter`. Commits may arrive in any order (the composite
    stage is unordered); :meth:`close` requires the committed set to be a
    prefix 0..n-1.
    """

    _HANDLER = b"DIB "
    _COMPRESSION = b"\x00\x00\x00\x00"  # BI_RGB
    _CHUNK_ID = b"00db"
    _HEIGHT_SIGN = -1  # top-down rows
    _REUSE_EXISTING = True  # rewrite in place: tmpfs pages stay allocated

    def __init__(self, path: str, fps: float, frame_size_hw: Tuple[int, int],
                 max_frames: int):
        h, w = frame_size_hw
        if (w * 3) % 4:
            raise ValueError(
                f"PreallocRawAVIWriter needs 4-byte-aligned rows; width {w} "
                f"gives row stride {w * 3}"
            )
        if max_frames <= 0:
            raise ValueError(f"max_frames must be positive, got {max_frames}")
        self.max_frames = int(max_frames)
        super().__init__(path, fps, frame_size_hw)
        self._frame_bytes = h * w * 3
        self._chunk_bytes = 8 + self._frame_bytes
        f = self._file
        f.flush()
        self._movi_data_start = f.tell()
        # -- ODML layout: a fixed chunk size makes the whole multi-RIFF
        # geometry computable up front. K0 frames fit the first RIFF next to
        # its idx1 (16 B/frame) and header; K frames fit each 24-byte-header
        # AVIX continuation. Single-RIFF files (the common case) keep the
        # exact legacy layout.
        k0 = (self._RIFF_LIMIT - self._movi_data_start - 8) // (
            self._chunk_bytes + 16
        )
        k = (self._RIFF_LIMIT - 24) // self._chunk_bytes
        if k0 < 1 or k < 1:
            raise ValueError(
                f"one {self._frame_bytes}-byte frame exceeds the "
                f"{self._RIFF_LIMIT}-byte RIFF limit"
            )
        self._k0 = int(k0)
        self._k = int(k)
        if self.max_frames <= self._k0:
            self._riff0_end = None  # single RIFF: no continuation geometry
            total = self._movi_data_start + self.max_frames * self._chunk_bytes
        else:
            self._riff0_end = (self._movi_data_start
                               + self._k0 * self._chunk_bytes
                               + 8 + 16 * self._k0)
            n_avix = -(-(self.max_frames - self._k0) // self._k)
            last = self.max_frames - self._k0 - (n_avix - 1) * self._k
            self._avix_stride = 24 + self._k * self._chunk_bytes
            total = (self._riff0_end + (n_avix - 1) * self._avix_stride
                     + 24 + last * self._chunk_bytes)
        # posix_fallocate, not ftruncate: ftruncate leaves a hole and every
        # first-touch write then pays a page-allocation fault — measured
        # 47 ms/frame (15 s per 1080p clip) on a lazily-backed VM vs 0.17 s
        # to provision the whole file in-kernel up front
        try:
            os.posix_fallocate(f.fileno(), 0, total)
        except OSError:
            os.ftruncate(f.fileno(), total)  # fs without fallocate support
        self._mm = mmap.mmap(f.fileno(), total)
        self._arr = np.frombuffer(self._mm, np.uint8)
        hdr = self._CHUNK_ID + struct.pack("<I", self._frame_bytes)
        hdr_arr = np.frombuffer(hdr, np.uint8)
        for i in range(self.max_frames):
            off = self._payload_offset(i) - 8
            self._arr[off : off + 8] = hdr_arr
        if self._riff0_end is not None:
            # AVIX continuation headers at their fixed offsets (sizes are
            # patched in close once the final frame count is known)
            avix_hdr = np.frombuffer(
                b"RIFF\x00\x00\x00\x00AVIXLIST\x00\x00\x00\x00movi", np.uint8
            )
            n_avix = -(-(self.max_frames - self._k0) // self._k)
            for r in range(n_avix):
                off = self._riff0_end + r * self._avix_stride
                self._arr[off : off + 24] = avix_hdr
        self._committed = np.zeros(self.max_frames, bool)

    def _payload_offset(self, i: int) -> int:
        """File offset of frame ``i``'s pixel payload."""
        if self._riff0_end is None or i < self._k0:
            return self._movi_data_start + i * self._chunk_bytes + 8
        r, j = divmod(i - self._k0, self._k)
        return (self._riff0_end + r * self._avix_stride + 24
                + j * self._chunk_bytes + 8)

    def frame_view(self, i: int) -> np.ndarray:
        """(H, W, 3) uint8 view of frame ``i``'s payload in the output file."""
        if not 0 <= i < self.max_frames:
            raise IndexError(f"frame {i} out of range 0..{self.max_frames - 1}")
        off = self._payload_offset(i)
        return self._arr[off : off + self._frame_bytes].reshape(
            self.h, self.w, 3
        )

    def commit(self, i: int) -> None:
        """Mark frame ``i``'s pixels as final (written via its view)."""
        self._committed[i] = True

    # classic write API for uniformity: copy into the next free view
    def write(self, frame_bgr: np.ndarray) -> None:
        i = int(np.count_nonzero(self._committed))
        np.copyto(self.frame_view(i), frame_bgr)
        self.commit(i)

    def abort(self) -> None:
        """Error-path close: release the fd WITHOUT truncating or finalizing
        the container. Producer/composite threads may still hold live views
        into the mapping, and shrinking a file under a MAP_SHARED view
        SIGBUSes the process on their next touch — while *unlinking* a
        mapped file is safe (pages live until munmap). Callers abort and
        then delete the file; nothing valid is lost (the container was
        incomplete)."""
        if self._closed:
            return
        self._closed = True
        del self._arr
        try:
            self._mm.close()
        except BufferError:
            pass  # live views — the mapping dies with the last view
        self._file.close()

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        n = int(np.count_nonzero(self._committed))
        if not self._committed[:n].all():
            missing = int(np.flatnonzero(~self._committed[:n])[0])
            raise ValueError(
                f"committed frames are not a prefix: frame {missing} missing "
                f"with {n} total commits"
            )
        del self._arr
        self._mm.flush()
        try:
            self._mm.close()
        except BufferError:
            pass  # a stray frame view is still alive; MAP_SHARED pages are
            # already in the file, so finalizing via the fd below is safe
        f = self._file
        if self._riff0_end is None or n <= self._k0:
            # single RIFF (possibly truncating away preallocated AVIX
            # continuations that ended up unused) — exact legacy layout
            self._index = [
                (4 + i * self._chunk_bytes, self._frame_bytes)
                for i in range(n)
            ]
            self._movi_bytes = 4 + n * self._chunk_bytes
            self._max_chunk = self._frame_bytes if n else 0
            self._total_frames = n
            f.seek(self._movi_data_start + n * self._chunk_bytes)
            f.truncate()
            self._finalize()
            return
        # multi-RIFF: idx1 (first-RIFF frames) lands in its reserved slot,
        # each used AVIX gets its sizes patched, unused tail truncated
        self._index = [
            (4 + i * self._chunk_bytes, self._frame_bytes)
            for i in range(self._k0)
        ]
        self._movi_bytes = 4 + self._k0 * self._chunk_bytes
        self._max_chunk = self._frame_bytes
        self._total_frames = n
        f.seek(self._movi_data_start + self._k0 * self._chunk_bytes)
        self._write_idx1()
        assert f.tell() == self._riff0_end, (f.tell(), self._riff0_end)
        self._patch_riff_sizes()  # RIFF#0 + movi#0 (positions from init)
        n_used = -(-(n - self._k0) // self._k)
        for r in range(n_used):
            frames_r = min(self._k, n - self._k0 - r * self._k)
            start = self._riff0_end + r * self._avix_stride
            movi_size = 4 + frames_r * self._chunk_bytes
            f.seek(start + 4)
            f.write(struct.pack("<I", 4 + 8 + movi_size))  # 'AVIX' + LIST
            f.seek(start + 16)
            f.write(struct.pack("<I", movi_size))
        f.seek(self._riff0_end + (n_used - 1) * self._avix_stride + 24
               + (n - self._k0 - (n_used - 1) * self._k) * self._chunk_bytes)
        f.truncate()
        # header patches normally done by _finalize (idx1 is already placed)
        f.seek(self._avih_pos + 16)
        f.write(struct.pack("<I", self._first_riff_frames))
        f.seek(self._avih_pos + 28)
        f.write(struct.pack("<I", self._max_chunk + 8))
        f.seek(self._strh_pos + 8 + 4 + 2 + 2 + 4 + 4 + 4 + 4)
        f.write(struct.pack("<I", n))
        f.write(struct.pack("<I", self._max_chunk + 8))
        f.seek(self._dmlh_pos)
        f.write(struct.pack("<I", n))
        f.close()


def ram_backed_bytes_free(path: str) -> int:
    """Free bytes at ``path`` if its filesystem is RAM-backed (tmpfs/ramfs),
    else 0. Used by the ``auto`` codec to decide whether a preallocated raw
    intermediate is a pure-memcpy sink or would thrash a disk."""
    probe = os.path.abspath(path)
    while not os.path.exists(probe):
        parent = os.path.dirname(probe)
        if parent == probe:
            return 0
        probe = parent
    try:
        dev = os.stat(probe).st_dev
        ram = False
        with open("/proc/mounts") as f:
            best = -1
            for line in f:
                parts = line.split()
                if len(parts) < 3:
                    continue
                mnt, fstype = parts[1], parts[2]
                try:
                    if os.stat(mnt).st_dev != dev:
                        continue
                except OSError:
                    continue
                if len(mnt) > best:
                    best = len(mnt)
                    ram = fstype in ("tmpfs", "ramfs")
        if not ram:
            return 0
        st = os.statvfs(probe)
        return st.f_bavail * st.f_frsize
    except OSError:
        return 0


def make_frame_writer(path: str, fps: float, frame_size_hw: Tuple[int, int],
                      codec: str = "mjpeg", jpeg_quality: int = 90,
                      n_frames_hint: Optional[int] = None):
    """Writer factory.

    * ``auto`` → :class:`PreallocRawAVIWriter` when the target filesystem is
      RAM-backed with headroom for ``n_frames_hint`` lossless frames (zero
      encode CPU, composite/decode land in-place), else :class:`MJPEGWriter`;
    * ``mjpeg`` → :class:`MJPEGWriter` (compact, disk-safe, encode
      parallelizes via ``encode_frame``);
    * ``raw`` → :class:`RawAVIWriter` (lossless streaming, zero encode CPU,
      needs a ≥155 MB/s sink at 1080p25);
    * any cv2 fourcc (``DIVX``, ``mp4v``, ...) → :class:`VideoFrameWriter`.
    """
    codec = codec.lower()
    if codec == "auto":
        h, w = frame_size_hw
        need = (n_frames_hint or 0) * (h * w * 3 + 8) + (1 << 20)
        if (
            n_frames_hint
            and (w * 3) % 4 == 0
            # leave half the RAM-backed fs free: the sink must never be the
            # reason the host starts swapping or an ffmpeg mux step fails
            and need <= ram_backed_bytes_free(path) // 2
        ):
            return PreallocRawAVIWriter(path, fps, frame_size_hw,
                                        max_frames=n_frames_hint)
        return MJPEGWriter(path, fps, frame_size_hw, quality=jpeg_quality)
    if codec == "raw":
        return RawAVIWriter(path, fps, frame_size_hw)
    if codec == "mjpeg":
        return MJPEGWriter(path, fps, frame_size_hw, quality=jpeg_quality)
    return VideoFrameWriter(path, fps, frame_size_hw, fourcc=codec)


def extract_audio(media_path: str, out_wav: Optional[str] = None,
                  sample_rate: int = 16000) -> str:
    """Extract a wav track from a media file via ffmpeg
    (reference inference.py:217-222, preprocess.py:35).

    Returns the wav path. Raises RuntimeError when ffmpeg is unavailable —
    callers should pass .wav audio directly in that case.
    """
    if media_path.endswith(".wav"):
        return media_path
    if not has_ffmpeg():
        raise RuntimeError(
            "ffmpeg is required to extract audio from non-wav inputs; "
            "provide a .wav file instead"
        )
    if out_wav is None:
        fd, out_wav = tempfile.mkstemp(suffix=".wav")
        os.close(fd)  # ffmpeg rewrites it; mkstemp reserves a unique name
    subprocess.check_call(
        ["ffmpeg", "-loglevel", "error", "-y", "-i", media_path,
         "-ar", str(sample_rate), "-ac", "1", out_wav]
    )
    return out_wav


def _wav_pcm16(wav_path: str) -> Optional[Tuple[int, np.ndarray]]:
    """Read a .wav and normalize to interleaved int16 PCM.

    Returns ``(sample_rate, (n_samples, n_channels) int16)`` or None when the
    file isn't a readable wav (non-wav container, zero samples, exotic
    codec). scipy handles 8/16/32-bit integer and float PCM.
    """
    from scipy.io import wavfile
    try:
        rate, data = wavfile.read(wav_path)
    except Exception:  # noqa: BLE001 — any unreadable input → no embed
        return None
    if data.size == 0 or rate <= 0:
        return None
    if data.ndim == 1:
        data = data[:, None]
    if data.dtype == np.int16:
        pcm = data
    elif data.dtype == np.int32:
        pcm = (data >> 16).astype(np.int16)
    elif data.dtype == np.uint8:
        pcm = ((data.astype(np.int16) - 128) << 8)
    elif data.dtype in (np.float32, np.float64):
        pcm = (np.clip(data, -1.0, 1.0) * 32767.0).astype(np.int16)
    else:
        return None
    return int(rate), np.ascontiguousarray(pcm)


def embed_wav_audio(avi_path: str, wav_path: str) -> bool:
    """Pure-Python audio mux: add the wav as a PCM ``auds`` stream to an AVI
    written by :class:`_AVIWriterBase`, IN PLACE.

    The writers reserve a JUNK slot in ``hdrl`` sized exactly like the audio
    stream's ``LIST strl`` (see ``_AUDIO_SLOT_MARKER``), so embedding is three
    byte-patches plus an append: slot → strl, ``dwStreams`` 1 → 2, audio
    ``01wb`` chunks appended to ``movi`` with ``idx1`` rewritten after them.
    No video byte moves — for the preallocated mmap'd sink that makes the
    whole mux ~sub-millisecond per second of audio. The audio lands
    non-interleaved (all blocks after the video chunks); every indexed-AVI
    reader (ffmpeg/libav, VLC, mpv, OpenCV) seeks streams via ``idx1`` and
    plays this fine.

    Multi-RIFF (OpenDML >limit) containers embed too: their first RIFF is
    full and AVIX continuations follow idx1, so instead of the idx1
    overwrite the PCM appends as final ``RIFF AVIX → LIST movi``
    continuation(s) — ODML readers discover those by the same sequential
    scan that finds the video AVIX chunks.

    Returns True on success; False when the container lacks the slot (e.g.
    a cv2-written file), carries a foreign non-AVIX trailer, or the wav is
    unreadable — callers fall back to the silent-video warning. Replaces the
    reference's hard ffmpeg dependency for wav inputs (inference.py:276-277).
    """
    loaded = _wav_pcm16(wav_path)
    if loaded is None:
        return False
    rate, pcm = loaded
    n_samples, n_ch = pcm.shape
    block_align = 2 * n_ch
    byte_rate = rate * block_align
    marker = _AVIWriterBase._AUDIO_SLOT_MARKER
    slot_payload = _AVIWriterBase._AUDIO_SLOT_PAYLOAD

    with open(avi_path, "r+b") as f:
        head = f.read(12)
        if len(head) < 12 or head[:4] != b"RIFF" or head[8:12] != b"AVI ":
            return False

        # -- walk the top-level chunks to find hdrl / movi / idx1 ----------
        # ODML multi-RIFF (>limit) containers carry ``RIFF AVIX`` chunks
        # after the first RIFF's idx1; those are legal continuations of our
        # own writers and the audio appends as one more AVIX at the end.
        # Anything else after idx1 is a foreign trailer → leave untouched.
        hdrl_off = movi_off = idx1_off = None
        movi_size = idx1_size = 0
        saw_avix, trailer_ok = False, True
        pos = 12
        file_end = os.path.getsize(avi_path)
        while pos + 8 <= file_end:
            f.seek(pos)
            cid, csize = struct.unpack("<4sI", f.read(8))
            if cid == b"LIST":
                ltype = f.read(4)
                if ltype == b"hdrl":
                    hdrl_off = pos
                elif ltype == b"movi" and movi_off is None:
                    movi_off, movi_size = pos, csize
            elif cid == b"idx1":
                idx1_off, idx1_size = pos, csize
            elif cid == b"RIFF" and f.read(4) == b"AVIX":
                saw_avix = True
            elif idx1_off is not None:
                trailer_ok = False  # unknown top-level chunk after idx1
            pos += 8 + csize + (csize & 1)
        if hdrl_off is None or movi_off is None or idx1_off is None:
            return False
        if idx1_off != movi_off + 8 + movi_size + (movi_size & 1):
            return False  # unexpected layout (not one of ours)
        first_extent = idx1_off + 8 + idx1_size + (idx1_size & 1)
        if not saw_avix and first_extent < file_end:
            return False  # foreign (non-AVIX) trailer
        if saw_avix and (not trailer_ok or pos != file_end):
            return False  # AVIX run interleaved with foreign/truncated data

        # -- find avih and the reserved JUNK slot inside hdrl ---------------
        f.seek(hdrl_off + 4)
        hdrl_size = struct.unpack("<I", f.read(4))[0]
        hdrl_end = hdrl_off + 8 + hdrl_size
        avih_payload = slot_off = None
        pos = hdrl_off + 12
        while pos + 8 <= hdrl_end:
            f.seek(pos)
            cid, csize = struct.unpack("<4sI", f.read(8))
            if cid == b"avih":
                avih_payload = pos + 8
            elif cid == b"JUNK" and csize == slot_payload:
                if f.read(len(marker)) == marker:
                    slot_off = pos
            pos += 8 + csize + (csize & 1)
        if avih_payload is None or slot_off is None:
            return False

        # -- 1. rewrite the JUNK slot as the audio LIST strl ----------------
        max_chunk = block_align * max(1, rate // 2)  # ~0.5 s per chunk
        f.seek(slot_off)
        f.write(b"LIST" + struct.pack("<I", slot_payload) + b"strl")
        f.write(b"strh" + struct.pack("<I", 56))
        f.write(b"auds" + b"\x00\x00\x00\x00")  # fccType, fccHandler
        f.write(struct.pack(
            "<IHHIIIIIIIi4h",
            0, 0, 0,                 # dwFlags, wPriority, wLanguage
            0,                       # dwInitialFrames
            block_align,             # dwScale
            byte_rate,               # dwRate (rate/scale = samples/s)
            0,                       # dwStart
            n_samples,               # dwLength (in blocks)
            max_chunk + 8,           # dwSuggestedBufferSize
            0xFFFFFFFF,              # dwQuality (-1)
            block_align,             # dwSampleSize (PCM: one block)
            0, 0, 0, 0,              # rcFrame
        ))
        f.write(b"strf" + struct.pack("<I", 18))
        f.write(struct.pack(
            "<HHIIHHH", 1, n_ch, rate, byte_rate, block_align, 16, 0,
        ))  # WAVEFORMATEX, wFormatTag=1 (PCM), cbSize=0

        # -- 2. dwStreams 1 → 2 ---------------------------------------------
        f.seek(avih_payload + 24)
        f.write(struct.pack("<I", 2))

        # -- 3. append the audio chunks -------------------------------------
        if saw_avix:
            # Multi-RIFF (OpenDML) container: the first RIFF is full and
            # AVIX continuations follow its idx1, so the in-place
            # overwrite-idx1 path below would clobber video. Instead the
            # PCM appends as one more ``RIFF AVIX → LIST movi`` at EOF —
            # ODML readers discover continuation chunks by sequential scan
            # (same mechanism that finds the video AVIX chunks; idx1 only
            # ever indexes the first RIFF). Audio chunks roll into further
            # AVIX continuations at the writer's RIFF limit like video does.
            pcm_bytes = memoryview(pcm).cast("B")
            f.seek(0, 2)
            riff_size_pos = movi_size_pos = None
            movi_bytes = 0

            def _open_avix():
                nonlocal riff_size_pos, movi_size_pos, movi_bytes
                f.write(b"RIFF")
                riff_size_pos = f.tell(); f.write(struct.pack("<I", 0))
                f.write(b"AVIX" + b"LIST")
                movi_size_pos = f.tell(); f.write(struct.pack("<I", 0))
                f.write(b"movi")
                movi_bytes = 4

            def _close_avix():
                end = f.tell()
                f.seek(riff_size_pos)
                f.write(struct.pack("<I", end - riff_size_pos - 4))
                f.seek(movi_size_pos)
                f.write(struct.pack("<I", movi_bytes))
                f.seek(end)

            _open_avix()
            limit = _AVIWriterBase._RIFF_LIMIT
            for start in range(0, len(pcm_bytes), max_chunk):
                part = pcm_bytes[start:start + max_chunk]
                padded = len(part) + (len(part) & 1)
                if movi_bytes > 4 and movi_bytes + 8 + padded + 20 > limit:
                    _close_avix()
                    _open_avix()
                f.write(b"01wb" + struct.pack("<I", len(part)))
                f.write(part)
                if len(part) & 1:
                    f.write(b"\x00")
                movi_bytes += 8 + padded
            _close_avix()
            return True

        # -- 3b. single RIFF: append audio over the old idx1, rewrite idx1 --
        old_index = []
        f.seek(idx1_off + 8)
        raw = f.read(idx1_size)
        for i in range(0, len(raw) - 15, 16):
            old_index.append(raw[i:i + 16])
        pcm_bytes = memoryview(pcm).cast("B")
        f.seek(idx1_off)
        movi_cursor = movi_size  # chunk offsets in idx1 count from 'movi'
        new_entries = []
        for start in range(0, len(pcm_bytes), max_chunk):
            part = pcm_bytes[start:start + max_chunk]
            f.write(b"01wb" + struct.pack("<I", len(part)))
            f.write(part)
            if len(part) & 1:
                f.write(b"\x00")
            new_entries.append(struct.pack(
                "<4sIII", b"01wb", _AVIWriterBase._AVIIF_KEYFRAME,
                movi_cursor, len(part),
            ))
            movi_cursor += 8 + len(part) + (len(part) & 1)
        f.write(b"idx1" + struct.pack(
            "<I", 16 * (len(old_index) + len(new_entries))))
        for entry in old_index:
            f.write(entry)
        for entry in new_entries:
            f.write(entry)
        end = f.tell()
        f.truncate(end)

        # -- 4. back-patch movi and RIFF sizes -------------------------------
        f.seek(movi_off + 4)
        f.write(struct.pack("<I", movi_cursor))
        f.seek(4)
        f.write(struct.pack("<I", end - 8))
    return True


def mux_audio(video_path: str, audio_path: str, outfile: str,
              move: bool = False) -> str:
    """Mux the audio track onto the rendered video (reference
    inference.py:276-277, ``ffmpeg -i audio -i video -q:v 1 out``).

    Without ffmpeg, wav audio is embedded into the AVI container in pure
    Python (:func:`embed_wav_audio`) and the file lands at ``outfile`` —
    renamed into place when ``move=True`` (the intermediate is disposable;
    avoids a full-file copy), copied otherwise. Only when the container has
    no audio slot or the audio isn't readable wav does the silent video land
    with a warning.
    """
    os.makedirs(os.path.dirname(os.path.abspath(outfile)), exist_ok=True)
    if has_ffmpeg():
        subprocess.check_call(
            ["ffmpeg", "-loglevel", "error", "-y", "-i", audio_path,
             "-i", video_path, "-strict", "-2", "-q:v", "1", outfile]
        )
    else:
        embedded = embed_wav_audio(video_path, audio_path)
        if move:
            # shutil.move copies+removes across filesystems, where a bare
            # os.replace raises EXDEV (temp on tmpfs, outfile on disk)
            shutil.move(video_path, outfile)
        else:
            shutil.copyfile(video_path, outfile)
        if embedded:
            print(
                f"[wav2lip_tpu] ffmpeg not found: embedded PCM audio into "
                f"the AVI container at {outfile}"
            )
        else:
            print(
                f"[wav2lip_tpu] ffmpeg not found: wrote video without audio "
                f"track to {outfile}"
            )
    return outfile

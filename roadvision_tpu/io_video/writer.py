"""Codec-free video recording.

The reference's recorder is dead code (record.enable is read but no
cv2.VideoWriter is ever constructed — main_preview.py:81,130,137; SURVEY.md
§5 puts "actually implement the recorder" in scope). This writer works with
zero native codec dependencies:

  * ``.avi``  — Motion-JPEG in a standard RIFF AVI container, frames
    JPEG-encoded with PIL. Plays in VLC/ffplay/browsers.
  * ``.npy``  — raw (T, H, W, 3) uint8 stack (exact, for parity tooling).
  * ``.mp4``  — routed to cv2.VideoWriter when OpenCV is available,
    otherwise transparently falls back to MJPEG-AVI alongside the requested
    path (so the reference's default ``out_compare.mp4`` config still
    records something useful instead of silently dropping frames).

API mirrors cv2.VideoWriter: ``write(frame_bgr)``, ``release()``.
"""
from __future__ import annotations

import io
import struct
from pathlib import Path
from typing import List, Optional

import numpy as np

try:
    import cv2  # type: ignore
    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _fourcc(s: str) -> bytes:
    return s.encode("ascii")


class MJPEGAVIWriter:
    """Minimal single-stream MJPG AVI muxer (RIFF: hdrl, movi, idx1)."""

    def __init__(self, path: str, fps: float = 30.0, quality: int = 90):
        self.path = Path(path)
        self.fps = max(1.0, float(fps))
        self.quality = int(quality)
        self._chunks: List[bytes] = []
        self._size = None  # (w, h)

    def write(self, frame_bgr: np.ndarray) -> None:
        from PIL import Image
        h, w = frame_bgr.shape[:2]
        if self._size is None:
            self._size = (w, h)
        elif self._size != (w, h):
            raise ValueError("frame size changed mid-stream")
        buf = io.BytesIO()
        Image.fromarray(frame_bgr[..., ::-1]).save(buf, format="JPEG",
                                                   quality=self.quality)
        self._chunks.append(buf.getvalue())

    def release(self) -> None:
        if self._size is None:
            return
        w, h = self._size
        n = len(self._chunks)
        max_size = max(len(c) for c in self._chunks)

        def chunk(tag: bytes, payload: bytes) -> bytes:
            pad = b"\0" if len(payload) % 2 else b""
            return tag + struct.pack("<I", len(payload)) + payload + pad

        def lst(kind: bytes, payload: bytes) -> bytes:
            body = kind + payload
            pad = b"\0" if len(body) % 2 else b""
            return b"LIST" + struct.pack("<I", len(body)) + body + pad

        avih = struct.pack(
            "<14I",
            int(1e6 / self.fps),           # dwMicroSecPerFrame
            int(max_size * self.fps),      # dwMaxBytesPerSec
            0,                             # dwPaddingGranularity
            0x10,                          # dwFlags: AVIF_HASINDEX
            n, 0, 1,                       # totalframes, initial, streams
            max_size, w, h, 0, 0, 0, 0)    # sugg. buffer, w, h, reserved
        strh = _fourcc("vids") + _fourcc("MJPG") + struct.pack(
            "<IHHIIIIIIiI4H",
            0,                             # dwFlags
            0, 0,                          # wPriority, wLanguage
            0,                             # dwInitialFrames
            1, int(self.fps),              # dwScale, dwRate (fps = rate/scale)
            0, n,                          # dwStart, dwLength
            max_size,                      # dwSuggestedBufferSize
            -1, 0,                         # dwQuality (-1 default), dwSampleSize
            0, 0, w, h)                    # rcFrame (l, t, r, b)
        strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                           w * h * 3, 0, 0, 0, 0)
        hdrl = lst(b"hdrl", chunk(b"avih", avih)
                   + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

        movi_body = b"movi"
        idx_entries = []
        offset = 4  # relative to start of 'movi' fourcc
        for data in self._chunks:
            c = chunk(b"00dc", data)
            idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10,
                                           offset, len(data)))
            movi_body += c
            offset += len(c)
        movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
        idx1 = chunk(b"idx1", b"".join(idx_entries))

        riff_body = b"AVI " + hdrl + movi + idx1
        with open(self.path, "wb") as fh:
            fh.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)
        self._chunks = []


class NpyWriter:
    def __init__(self, path: str, fps: float = 30.0):
        self.path = Path(path)
        self.frames: List[np.ndarray] = []

    def write(self, frame_bgr: np.ndarray) -> None:
        self.frames.append(np.asarray(frame_bgr, np.uint8))

    def release(self) -> None:
        if self.frames:
            np.save(self.path, np.stack(self.frames))
            self.frames = []


class _CV2Writer:
    def __init__(self, path: str, fps: float, size_hint=None):
        self.path = str(path)
        self.fps = fps
        self.writer = None

    def write(self, frame_bgr: np.ndarray) -> None:
        if self.writer is None:
            h, w = frame_bgr.shape[:2]
            four = cv2.VideoWriter_fourcc(*"mp4v")
            self.writer = cv2.VideoWriter(self.path, four, self.fps, (w, h))
        self.writer.write(frame_bgr)

    def release(self) -> None:
        if self.writer is not None:
            self.writer.release()


def make_writer(path: str, fps: float = 30.0):
    """Pick a writer by extension (with graceful mp4 fallback)."""
    suffix = Path(path).suffix.lower()
    if suffix == ".npy":
        return NpyWriter(path, fps)
    if suffix == ".avi":
        return MJPEGAVIWriter(path, fps)
    if suffix == ".mp4":
        if _HAS_CV2:
            return _CV2Writer(path, fps)
        fallback = str(Path(path).with_suffix(".avi"))
        print(f"[roadvision] no mp4 codec available; recording MJPEG to {fallback}")
        return MJPEGAVIWriter(fallback, fps)
    raise ValueError(f"unsupported recording format: {suffix}")

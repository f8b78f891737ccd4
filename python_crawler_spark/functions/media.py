"""Video / audio kernels for the multimodal column operators.

Real video/audio codecs (mp4/h264, mp3/aac) need ffmpeg-class
libraries absent from this container, so — exactly like
``images.decode_standard`` — the STANDARD-format decode is a stubbed
production seam, while a self-contained deterministic container with
the same shape is the tested path:

- ``PCSV`` video: header (frame count, fps) + length-prefixed PCS1
  image frames. Frame-sampling, the operator the pipeline needs, is
  real logic over it.
- ``PCSA`` audio: header (sample rate) + int16 mono PCM. Feature
  extraction (duration/RMS/zero-crossing/peak) is real numpy math —
  identical code would run on PCM decoded by a real library.

The Spark-side plumbing (BinaryType columns, typed metadata,
mapInPandas batch shape, partitioning) is production-real; only the
byte-format parsers swap.
"""

from __future__ import annotations

import numpy as np

from . import images as IMG

MAGIC_V = b"PCSV"
MAGIC_A = b"PCSA"


# ------------------------------------------------------------------ video


def encode_video(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Container of PCS1-png frames (lossless; frame-exact tests)."""
    blobs = [IMG.encode_image(f, "png") for f in frames]
    head = MAGIC_V + len(blobs).to_bytes(4, "big") + fps.to_bytes(2, "big")
    return head + b"".join(len(b).to_bytes(4, "big") + b for b in blobs)


def video_info(data: bytes) -> tuple[int, int]:
    """(n_frames, fps) without decoding any frame bytes."""
    if data[:4] != MAGIC_V:
        return decode_video_standard(data)
    return int.from_bytes(data[4:8], "big"), int.from_bytes(data[8:10], "big")


def iter_frames(data: bytes):
    """Yield (frame_idx, frame_blob) lazily — sampling N of F frames
    reads headers, not F decoded images."""
    if data[:4] != MAGIC_V:
        decode_video_standard(data)
    n = int.from_bytes(data[4:8], "big")
    off = 10
    for i in range(n):
        ln = int.from_bytes(data[off : off + 4], "big")
        off += 4
        yield i, data[off : off + ln]
        off += ln


def decode_video_standard(data: bytes):
    """STUB: real container demux (mp4/webm) requires ffmpeg-class
    libraries not present in this container. In production swap in
    pyav/ffmpeg here; sampling logic and schemas are identical."""
    raise NotImplementedError(
        "standard video formats require ffmpeg; this sandbox uses the "
        "deterministic PCSV container"
    )


def sample_frame_indices(n_frames: int, n_samples: int) -> list[int]:
    """Evenly spaced frame indices (first frame always included) —
    the standard keyframe-ish sampling a training pipeline uses."""
    if n_frames <= 0 or n_samples <= 0:
        return []
    if n_samples >= n_frames:
        return list(range(n_frames))
    step = n_frames / n_samples
    return sorted({int(i * step) for i in range(n_samples)})


# ------------------------------------------------------------------ audio


def encode_audio(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono PCM container."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("samples must be 1-D int16")
    return MAGIC_A + rate.to_bytes(4, "big") + samples.tobytes()


def decode_audio(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples)."""
    if data[:4] != MAGIC_A:
        return decode_audio_standard(data)
    rate = int.from_bytes(data[4:8], "big")
    return rate, np.frombuffer(data[8:], dtype=np.int16)


def decode_audio_standard(data: bytes):
    """STUB: real audio decode (mp3/aac/flac) requires audio libraries
    not present in this container; production swaps in soundfile/ffmpeg
    and the feature math below runs unchanged on the decoded PCM."""
    raise NotImplementedError(
        "standard audio formats require an audio library; this sandbox "
        "uses the deterministic PCSA container"
    )


def audio_features(data: bytes) -> dict:
    """Real feature math over PCM: duration, RMS (dBFS-ish scale),
    zero-crossing rate, peak amplitude."""
    rate, pcm = decode_audio(data)
    x = pcm.astype(np.float64) / 32768.0
    n = len(x)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    zc = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_s": n / rate if rate else 0.0,
        "rms": rms,
        "zero_cross_rate": zc,
        "peak": float(np.max(np.abs(x))) if n else 0.0,
    }

"""MP4/ISO BMFF demux tests: round-trip through the motion-JPEG
muxer, the general stsc multi-chunk + co64 layouts foreign muxers
emit, lazy sampling, and the codec-half seam (avc1 demuxes but
refuses bitstream decode)."""

import struct

import numpy as np
import pytest

import python_crawler_spark.functions.images as IMG
import python_crawler_spark.functions.media as MED
import python_crawler_spark.functions.mp4 as MP4


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[:, : (i + 1) * 8] = (20 * i) % 255  # frame-distinguishing bar
        out.append(f)
    return out


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_roundtrip_single_chunk():
    frames = _frames()
    blob = MP4.encode_mp4_mjpeg(frames, fps=25, quality=100)
    assert blob[4:8] == b"ftyp"
    n, fps, codec = MP4.mp4_info(blob)
    assert (n, fps, codec) == (6, 25, "jpeg")
    for i, sample in MP4.mp4_iter_samples(blob):
        decoded = IMG.decode_image(sample)[3]
        assert _psnr(decoded, frames[i]) >= 40.0


def test_roundtrip_multi_chunk_stsc_runs():
    """samples_per_chunk=4 over 10 frames -> two stsc runs (4,4 then a
    short 2-chunk), the general mapping path."""
    frames = _frames(10)
    blob = MP4.encode_mp4_mjpeg(frames, fps=10, samples_per_chunk=4, quality=100)
    n, fps, codec = MP4.mp4_info(blob)
    assert (n, fps) == (10, 10)
    for i, sample in MP4.mp4_iter_samples(blob):
        assert _psnr(IMG.decode_image(sample)[3], frames[i]) >= 40.0


def test_co64_and_largesize_variants():
    """Foreign layout: rewrite our stco into co64 and the mdat size
    into a 64-bit largesize; demux must read both."""
    frames = _frames(4)
    blob = bytearray(MP4.encode_mp4_mjpeg(frames, fps=25, quality=100))

    # --- stco -> co64 (offsets stay valid: same-length moov not needed
    # since co64 grows the box AFTER mdat; chunk offsets point into mdat)
    idx = bytes(blob).index(b"stco")
    n_ch = struct.unpack(">I", blob[idx + 8 : idx + 12])[0]
    offs = struct.unpack(f">{n_ch}I", blob[idx + 12 : idx + 12 + 4 * n_ch])
    old_size = struct.unpack(">I", blob[idx - 4 : idx])[0]
    co64 = (struct.pack(">I", 16 + 8 * n_ch) + b"co64" + b"\x00" * 4
            + struct.pack(">I", n_ch)
            + b"".join(struct.pack(">Q", o) for o in offs))
    grown = len(co64) - old_size
    out = bytearray(bytes(blob[: idx - 4]) + co64 + bytes(blob[idx - 4 + old_size :]))
    # grow every enclosing box size (stbl/minf/mdia/trak/moov)
    for four in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        j = bytes(out).index(four)
        sz = struct.unpack(">I", out[j - 4 : j])[0]
        out[j - 4 : j] = struct.pack(">I", sz + grown)
    for i, sample in MP4.mp4_iter_samples(bytes(out)):
        assert _psnr(IMG.decode_image(sample)[3], frames[i]) >= 40.0

    # --- mdat 32-bit size -> largesize (shifts moov AND the sample
    # offsets by 8; patch chunk offsets accordingly)
    blob2 = bytearray(MP4.encode_mp4_mjpeg(frames, fps=25, quality=100))
    m = bytes(blob2).index(b"mdat")
    sz = struct.unpack(">I", blob2[m - 4 : m])[0]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", sz + 8)
    out2 = bytearray(bytes(blob2[: m - 4]) + large + bytes(blob2[m + 4 :]))
    idx = bytes(out2).index(b"stco")
    n_ch = struct.unpack(">I", out2[idx + 8 : idx + 12])[0]
    for k in range(n_ch):
        p = idx + 12 + 4 * k
        o = struct.unpack(">I", out2[p : p + 4])[0]
        out2[p : p + 4] = struct.pack(">I", o + 8)
    for i, sample in MP4.mp4_iter_samples(bytes(out2)):
        assert _psnr(IMG.decode_image(sample)[3], frames[i]) >= 40.0


def test_sampling_is_lazy():
    """Reading 2 of 40 frames must not touch the other 38 samples'
    bytes: corrupt every sample except 0 and 39 in-place."""
    frames = _frames(40, h=32, w=32)
    blob = bytearray(MP4.encode_mp4_mjpeg(frames, fps=25, quality=100))
    trak = MP4._video_track(bytes(blob))
    codec, n, sizes, stsc, chunks = MP4._parse_stbl(bytes(blob), *trak)
    offs = MP4._sample_offsets(sizes, stsc, chunks)
    for i in range(1, 39):
        blob[offs[i] : offs[i] + sizes[i]] = b"\xde" * sizes[i]
    it = MP4.mp4_iter_samples(bytes(blob))
    got = {i: s for i, s in it if i in (0, 39)}
    assert _psnr(IMG.decode_image(got[0])[3], frames[0]) >= 40.0
    assert _psnr(IMG.decode_image(got[39])[3], frames[39]) >= 40.0


def test_avc1_demuxes_but_codec_decode_raises():
    """An h264 track: container parsing works (info + raw sample
    bytes), the codec half stays the documented seam."""
    blob = bytearray(MP4.encode_mp4_mjpeg(_frames(3), fps=25))
    i = bytes(blob).index(b"stsd")
    j = bytes(blob).index(b"jpeg", i)
    blob[j : j + 4] = b"avc1"
    n, fps, codec = MP4.mp4_info(bytes(blob))
    assert (n, codec) == (3, "avc1")
    samples = list(MP4.mp4_iter_samples(bytes(blob)))
    assert len(samples) == 3 and all(len(s) > 100 for _, s in samples)
    with pytest.raises(NotImplementedError, match="h264"):
        MP4.mp4_frame_decodable(bytes(blob))


# ------------------------------------------------- media.py dispatch


def test_video_info_and_iter_frames_dispatch_mp4():
    frames = _frames(5)
    blob = MP4.encode_mp4_mjpeg(frames, fps=20, quality=100)
    assert MED.video_info(blob) == (5, 20)
    for i, fb in MED.iter_frames(blob):
        assert _psnr(IMG.decode_image(fb)[3], frames[i]) >= 40.0


def test_iter_frames_mp4_avc1_raises():
    blob = bytearray(MP4.encode_mp4_mjpeg(_frames(2), fps=25))
    i = bytes(blob).index(b"stsd")
    j = bytes(blob).index(b"jpeg", i)
    blob[j : j + 4] = b"avc1"
    with pytest.raises(NotImplementedError, match="h264"):
        next(MED.iter_frames(bytes(blob)))


def test_unknown_container_still_raises():
    with pytest.raises(NotImplementedError, match="unrecognized"):
        MED.video_info(b"FLV\x01" + b"\x00" * 32)


def test_corruption_never_crashes_unstructured():
    """Crash-safety contract (same discipline as the tolerant-parser
    fuzz): random single-byte corruption anywhere in the file either
    demuxes (flip hit an inert field / sample payload — JPEG decode
    has its own checks) or raises a STRUCTURED error, never an
    IndexError/struct.error/hang."""
    blob = MP4.encode_mp4_mjpeg(_frames(5), fps=25, quality=90)
    rng = np.random.default_rng(13)
    for _ in range(60):
        i = int(rng.integers(0, len(blob)))
        bad = bytearray(blob)
        bad[i] ^= int(rng.integers(1, 256))
        try:
            n, fps, codec = MP4.mp4_info(bytes(bad))
            for _idx, _s in MP4.mp4_iter_samples(bytes(bad)):
                pass
        except (ValueError, NotImplementedError):
            pass

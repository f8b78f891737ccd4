"""GIF decoder (functions/gif.py) — hand-built spec fixtures.

There is deliberately no GIF encoder in the engine (decode-only
surface), so these tests construct GIF bytes directly from the public
spec layout: an "uncompressed" LZW writer that emits only root codes
while mirroring the decoder's dictionary/width growth (the classic
royalty-free-GIF-writer technique), plus hand-crafted streams for the
KwKwK corner case, interlacing, transparency and animation.
"""

from __future__ import annotations

import numpy as np
import pytest

from python_crawler_spark.functions import gif as G
from python_crawler_spark.functions import images as IMG
from python_crawler_spark.functions import media as MED


class _LZWWriter:
    """LSB-first bit packer emitting an explicit code sequence with
    GIF width semantics (width grows when the decoder's next_code
    reaches 1<<width)."""

    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.bits: list[int] = []
        self.reset()

    def reset(self) -> None:
        self.width = self.min + 1
        self.next_code = (1 << self.min) + 2
        self.started = False

    def raw(self, code: int) -> None:
        for i in range(self.width):
            self.bits.append((code >> i) & 1)

    def clear(self) -> None:
        self.raw(1 << self.min)
        self.reset()

    def code(self, c: int) -> None:
        self.raw(c)
        if self.started:
            # the decoder defines a new entry after every code but the
            # first following a clear; mirror its width growth
            if self.next_code < 4096:
                self.next_code += 1
                if self.next_code < 4096 and self.next_code == (1 << self.width):
                    self.width += 1
        self.started = True

    def end(self) -> bytes:
        self.raw((1 << self.min) + 1)  # EOI
        by = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for j, b in enumerate(self.bits[i : i + 8]):
                v |= b << j
            by.append(v)
        return bytes(by)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


PALETTE4 = np.array(
    [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], np.uint8
)


def _gif_header(w: int, h: int, palette: np.ndarray, bg: int = 0) -> bytes:
    size_bits = int(np.ceil(np.log2(len(palette)))) - 1
    packed = 0x80 | (size_bits & 0x07)
    head = b"GIF89a"
    head += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    head += bytes([packed, bg, 0])
    pad = (2 << size_bits) - len(palette)
    tab = np.vstack([palette, np.zeros((pad, 3), np.uint8)]) if pad else palette
    return head + tab.tobytes()


def _image_block(
    ix: int, iy: int, iw: int, ih: int, indices: np.ndarray, min_code: int = 2,
    interlaced: bool = False,
) -> bytes:
    desc = b"\x2c" + ix.to_bytes(2, "little") + iy.to_bytes(2, "little")
    desc += iw.to_bytes(2, "little") + ih.to_bytes(2, "little")
    desc += bytes([0x40 if interlaced else 0x00])
    wtr = _LZWWriter(min_code)
    wtr.clear()
    for v in indices.reshape(-1):
        wtr.code(int(v))
    return desc + bytes([min_code]) + _sub_blocks(wtr.end())


def _simple_gif(idx: np.ndarray, palette=PALETTE4, interlaced=False) -> bytes:
    h, w = idx.shape
    rows = idx
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[np.array(order)]
    return (
        _gif_header(w, h, palette)
        + _image_block(0, 0, w, h, rows, interlaced=interlaced)
        + b"\x3b"
    )


def test_basic_decode_and_dispatch():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], np.uint8)
    blob = _simple_gif(idx)
    w, h, fmt, px = G.decode_gif(blob)
    assert (w, h, fmt) == (4, 2, "gif")
    assert np.array_equal(px, PALETTE4[idx])
    # signature dispatch through the pipeline's decode path
    w2, h2, fmt2, px2 = IMG.decode_image(blob)
    assert fmt2 == "gif" and np.array_equal(px2, px)


def test_lzw_dictionary_growth():
    """Enough pixels that the decoder's dictionary passes a width
    boundary (next_code crosses 8 -> width 4) — the writer mirrors it,
    so any width desync would corrupt the tail."""
    rng = np.random.RandomState(5)
    idx = rng.randint(0, 4, (16, 16)).astype(np.uint8)
    w, h, fmt, px = G.decode_gif(_simple_gif(idx))
    assert np.array_equal(px, PALETTE4[idx])


def test_kwkwk_case():
    """code == next_code (the entry being defined): stream
    clear, 0, 6 decodes to [0, 0, 0] per the classic aaa example."""
    wtr = _LZWWriter(2)
    wtr.clear()
    wtr.code(0)
    wtr.code(6)  # == next_code at this point -> string(0)+first = 0,0
    desc = b"\x2c" + bytes(4) + (3).to_bytes(2, "little") + (1).to_bytes(2, "little") + b"\x00"
    blob = _gif_header(3, 1, PALETTE4) + desc + bytes([2]) + _sub_blocks(wtr.end()) + b"\x3b"
    w, h, fmt, px = G.decode_gif(blob)
    assert np.array_equal(px[0], PALETTE4[[0, 0, 0]])


def test_interlaced():
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 4, (8, 5)).astype(np.uint8)
    px = G.decode_gif(_simple_gif(idx, interlaced=True))[3]
    assert np.array_equal(px, PALETTE4[idx])


def test_animation_transparency_and_disposal():
    """Two frames: frame 2 is a 2x2 patch at (1,1) with one
    transparent index — the composite keeps frame 1's pixels there."""
    base = np.zeros((4, 4), np.uint8)  # all red
    patch = np.array([[1, 2], [2, 1]], np.uint8)
    gce1 = b"\x21\xf9\x04" + bytes([0x00, 10, 0, 0]) + b"\x00"  # delay 10cs
    # frame 2: transparent index 2, delay 5
    gce2 = b"\x21\xf9\x04" + bytes([0x01, 5, 0, 2]) + b"\x00"
    blob = (
        _gif_header(4, 4, PALETTE4)
        + gce1 + _image_block(0, 0, 4, 4, base)
        + gce2 + _image_block(1, 1, 2, 2, patch)
        + b"\x3b"
    )
    frames = G.decode_gif_frames(blob)
    assert len(frames) == 2
    f1, d1 = frames[0]
    f2, d2 = frames[1]
    assert (d1, d2) == (10, 5)
    assert np.array_equal(f1, PALETTE4[base])
    expect = PALETTE4[base].copy()
    expect[1, 1] = PALETTE4[1]  # patch[0,0]=1 drawn
    expect[2, 2] = PALETTE4[1]  # patch[1,1]=1 drawn
    # patch[0,1]=2 and [1,0]=2 transparent -> stay red
    assert np.array_equal(f2, expect)


def test_animated_gif_as_video_source():
    """video_info + iter_frames treat an animated GIF as a video:
    frames re-emitted as PNG blobs that decode through the standard
    image path, fps derived from the GCE delay."""
    base = np.zeros((4, 4), np.uint8)
    f2 = np.full((4, 4), 1, np.uint8)
    gce = b"\x21\xf9\x04" + bytes([0x00, 20, 0, 0]) + b"\x00"  # 20cs -> 5fps
    blob = (
        _gif_header(4, 4, PALETTE4)
        + gce + _image_block(0, 0, 4, 4, base)
        + gce + _image_block(0, 0, 4, 4, f2)
        + b"\x3b"
    )
    n, fps = MED.video_info(blob)
    assert (n, fps) == (2, 5)
    got = list(MED.iter_frames(blob))
    assert len(got) == 2
    for i, frame_blob in got:
        w, h, fmt, px = IMG.decode_image(frame_blob)
        assert fmt == "png" and (w, h) == (4, 4)
    assert np.array_equal(IMG.decode_image(got[1][1])[3], PALETTE4[f2])


def test_corrupt_and_truncated():
    with pytest.raises(ValueError, match="signature"):
        G.decode_gif(b"NOTAGIF...")
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    blob = _simple_gif(idx)
    # truncating mid-LZW zero-fills the tail rather than crashing
    # (browser behavior); truncating the container raises cleanly
    with pytest.raises((ValueError, IndexError)):
        G.decode_gif(blob[:15])

"""GIF decoder — pure numpy + stdlib, public GIF87a/GIF89a spec.

Completes the reference's real image-format set: the crawler streams
JPEG, PNG and GIF bytes from the wire
(/root/reference/crawler/weixin_public.py:315-321 serves whatever
`wx_fmt` names); with functions/jpeg.py and images.decode_png this
module makes all three decode natively.

Implements the public GIF layout (W3C/CompuServe spec): logical
screen descriptor, global/local color tables, LZW-compressed image
data with variable code width, interlaced row ordering, GIF89a
graphic-control extensions (frame delay, transparency, disposal) and
multi-frame animation. Decode only — the engine re-hosts originals
and writes thumbnails as PNG/JPEG, so a GIF encoder has no consumer.

LZW decode is an honest per-code loop (the dictionary grows
sequentially; that IS the algorithm) but operates on numpy-unpacked
code words and emits into preallocated index buffers; per-image cost
is microseconds at thumbnail sizes and runs inside Arrow-batched
executors, never per-row in the plan.
"""

from __future__ import annotations

import numpy as np

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _GIF_SIGS


def _color_table(data: bytes, pos: int, size: int) -> tuple[np.ndarray, int]:
    n = 2 << size  # 2^(size+1) entries
    tab = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    return tab, pos + 3 * n


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks (length-prefixed, 0-terminated)."""
    out = bytearray()
    while True:
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += data[pos : pos + ln]
        pos += ln


def _lzw_decode(min_code_size: int, blob: bytes, n_pixels: int) -> np.ndarray:
    """GIF variable-width LZW -> uint8 color indices (n_pixels,)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # unpack the bitstream LSB-first into one big uint8 bit array
    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8), bitorder="little")
    out = np.empty(n_pixels, dtype=np.uint8)
    out_n = 0
    # dictionary as (prefix_code, suffix_byte) chains; roots have
    # prefix -1, so the reverse walk terminates on them naturally
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    suffix[:clear] = np.arange(clear, dtype=np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    pos = 0
    prev = -1
    buf = np.empty(4097, dtype=np.uint8)  # reversed-entry scratch
    total_bits = len(bits)
    while out_n < n_pixels and pos + width <= total_bits:
        code = int(bits[pos : pos + width] @ (1 << np.arange(width, dtype=np.int64)))
        pos += width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:  # first code after a clear: must be a root
            if code >= clear:
                raise ValueError("corrupt GIF: non-root after clear")
            out[out_n] = code
            out_n += 1
            prev = code
            continue
        if code > next_code:
            raise ValueError("corrupt GIF: LZW code out of range")
        # emit string(code); for code == next_code (KwKwK) it is
        # string(prev) + first_byte(string(prev))
        walk = prev if code == next_code else code
        n = 0
        c = walk
        while c >= 0:
            buf[n] = suffix[c]
            n += 1
            c = prefix[c]
        chunk = buf[:n][::-1].copy()
        if code == next_code:
            chunk = np.append(chunk, chunk[0])
        take = min(len(chunk), n_pixels - out_n)
        out[out_n : out_n + take] = chunk[:take]
        out_n += take
        if next_code < 4096:
            prefix[next_code] = prev
            suffix[next_code] = chunk[0]
            next_code += 1
            if next_code < 4096 and next_code == (1 << width):
                width += 1
        prev = code
    if out_n < n_pixels:
        out[out_n:] = 0  # tolerate truncated streams (browsers do)
    return out


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    """GIF 4-pass interlace -> sequential row order."""
    rows = np.empty(h, dtype=np.int64)
    order = (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )
    rows[np.array(order, dtype=np.int64)] = np.arange(h)
    return idx.reshape(h, w)[rows]


def decode_gif(data: bytes) -> tuple[int, int, str, np.ndarray]:
    """First frame -> (w, h, 'gif', (h, w, 3) uint8 RGB) — the
    images-pipeline contract (decode_image tuple)."""
    frames = decode_gif_frames(data, max_frames=1)
    if not frames:
        raise ValueError("GIF contains no image data")
    px, _delay = frames[0]
    return px.shape[1], px.shape[0], "gif", px


def decode_gif_frames(
    data: bytes, max_frames: int | None = None
) -> list[tuple[np.ndarray, int]]:
    """All frames -> [(rgb (h, w, 3) uint8, delay_cs)], composited on
    the logical screen per GIF89a disposal semantics (restore-to-
    background clears to background color; restore-to-previous
    reverts). Frame delay is in centiseconds (0 for still GIFs)."""
    if not is_gif(data):
        raise ValueError("not a GIF: bad signature")
    if len(data) < 14:
        raise ValueError("truncated GIF: no logical screen descriptor")
    sw = int.from_bytes(data[6:8], "little")
    sh = int.from_bytes(data[8:10], "little")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    global_tab = None
    if packed & 0x80:
        global_tab, pos = _color_table(data, pos, packed & 0x07)
    if global_tab is not None and bg_index < len(global_tab):
        bg_rgb = global_tab[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    screen = np.empty((sh, sw, 3), dtype=np.uint8)
    screen[:] = bg_rgb
    frames: list[tuple[np.ndarray, int]] = []
    transparent = -1
    delay_cs = 0
    disposal = 0
    try:
        return _parse_blocks(
            data, pos, global_tab, bg_rgb, screen, frames, transparent,
            delay_cs, disposal, max_frames,
        )
    except IndexError as exc:  # ran off the end of a truncated container
        raise ValueError("truncated GIF: block structure cut short") from exc


def _parse_blocks(
    data, pos, global_tab, bg_rgb, screen, frames, transparent,
    delay_cs, disposal, max_frames,
):
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                ln = data[pos]
                body = data[pos + 1 : pos + 1 + ln]
                disposal = (body[0] >> 2) & 0x07
                delay_cs = int.from_bytes(body[1:3], "little")
                transparent = body[3] if body[0] & 0x01 else -1
                pos += 1 + ln
                if data[pos] == 0:
                    pos += 1
            else:  # comment / app / plain-text: skip sub-blocks
                _, pos = _sub_blocks(data, pos)
        elif b == 0x2C:  # image descriptor
            ix = int.from_bytes(data[pos + 1 : pos + 3], "little")
            iy = int.from_bytes(data[pos + 3 : pos + 5], "little")
            iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
            ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
            ipacked = data[pos + 9]
            pos += 10
            tab = global_tab
            if ipacked & 0x80:
                tab, pos = _color_table(data, pos, ipacked & 0x07)
            if tab is None:
                raise ValueError("GIF frame without any color table")
            min_code = data[pos]
            pos += 1
            blob, pos = _sub_blocks(data, pos)
            idx = _lzw_decode(min_code, blob, iw * ih)
            grid = _deinterlace(idx, ih, iw) if ipacked & 0x40 else idx.reshape(ih, iw)
            saved = screen.copy() if disposal == 3 else None
            region = screen[iy : iy + ih, ix : ix + iw]
            rgb = tab[np.minimum(grid, len(tab) - 1)]
            if transparent >= 0:
                mask = (grid != transparent)[:, :, None]
                region[:] = np.where(mask, rgb, region)
            else:
                region[:] = rgb
            frames.append((screen.copy(), delay_cs))
            if max_frames is not None and len(frames) >= max_frames:
                return frames
            if disposal == 2:  # restore to background
                screen[iy : iy + ih, ix : ix + iw] = bg_rgb
            elif disposal == 3 and saved is not None:  # restore previous
                screen = saved
            disposal = 0
            transparent = -1
            delay_cs = 0
        else:
            raise ValueError(f"corrupt GIF: unexpected block 0x{b:02X}")
    return frames

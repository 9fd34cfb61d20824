"""Pure-python GIF decoder (+ a minimal encoder for fixtures) — the last
pixel format in M16's decode tier that was header-parse only.

``gif_decode``: GIF87a/89a logical-screen parse, global/local color
tables, extension-block skip, first-image LZW decode (variable code
width, clear/EOI codes, 12-bit cap), interlace de-weave, composition
onto the logical screen (background-color fill for partial frames).
Returns ``(width, height, 3, uint8 ndarray[h, w, 3])`` — logical-screen
dims, matching ``parse_image_dims`` — or None for anything it cannot
decode (callers fall back to the header-parse tier, never crash).

``gif_encode_rgb8``: indexed-color encoder (≤256 unique colors) using
the classic "uncompressed LZW" scheme — a CLEAR code every 2^min−2
symbols keeps the code width fixed while the decoder's dictionary
grows — so decode correctness (including the dictionary-growth and
width-bump paths) is provable without any image library.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------- decode

def gif_decode(payload: bytes):
    try:
        return _gif_decode_inner(payload)
    except Exception:
        return None


def _read_color_table(payload: bytes, pos: int, n: int):
    tbl = np.frombuffer(payload[pos:pos + 3 * n], np.uint8)
    if len(tbl) < 3 * n:
        raise ValueError("short color table")
    return tbl.reshape(n, 3), pos + 3 * n


def _lzw_decode(min_code: int, data: bytes, max_pixels: int) -> bytearray:
    """Emits color indices into a bytearray (1 B/pixel — the r4 version
    built a Python list of ints, ~28 B/pixel of transient heap at the
    cap; table entries are bytes objects so growth is cheap concat)."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dict_init = [bytes((i,)) for i in range(clear)] + [None, None]
    table = list(dict_init)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(dict_init)
                width = min_code + 1
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = table[code]
                if entry is None:
                    raise ValueError("bad first code")
            elif code < len(table) and table[code] is not None:
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("bad LZW code")
            out += entry
            if len(out) > max_pixels:
                raise ValueError("LZW output overrun")
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out


# decode work/memory cap: a crafted header can declare 65535×65535 and
# self-referential LZW codes expand quadratically, so bound BOTH the
# declared pixel count and the LZW output before allocating anything.
# 16 Mpx (≈ 4096×4096 — far above any profile photo) bounds the real
# transient footprint at ~16 MB LZW bytearray + 16 MB uint8 frame +
# 48 MB RGB screen ≈ 80 MB per decode (r5: cap sized from the actual
# allocations; the r4 cap of 2^26 with a list-of-int LZW buffer allowed
# ~1 GB transients per actor on crafted payloads).
MAX_PIXELS = 1 << 24


def _gif_decode_inner(payload: bytes):
    n = len(payload)
    if n < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh = struct.unpack("<HH", payload[6:10])
    if sw * sh > MAX_PIXELS:
        return None
    flags, bg_idx, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(payload, pos, 2 << (flags & 7))
    if not sw or not sh:
        return None
    while pos < n:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < n and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            return None
        left, top, iw, ih = struct.unpack("<HHHH", payload[pos + 1:pos + 9])
        if iw * ih > MAX_PIXELS:
            return None
        iflags = payload[pos + 9]
        pos += 10
        table = gct
        if iflags & 0x80:
            table, pos = _read_color_table(payload, pos, 2 << (iflags & 7))
        if table is None or not iw or not ih:
            return None
        min_code = payload[pos]
        pos += 1
        if not (2 <= min_code <= 8):
            return None
        chunks = []
        while pos < n and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), iw * ih)
        if len(idx) < iw * ih:
            return None
        frame = np.frombuffer(bytes(idx[: iw * ih]),
                              np.uint8).reshape(ih, iw)
        if iflags & 0x40:  # interlaced: de-weave pass rows
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2)])
            de = np.empty_like(frame)
            de[order] = frame
            frame = de
        if (frame >= len(table)).any():
            return None
        # colorize the FRAME through its own (local-or-global) table,
        # the background through the GLOBAL table, then compose in RGB
        # space — index spaces of the two tables must never mix
        frame_rgb = table[frame]
        bg_rgb = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
                  else np.zeros(3, dtype=np.uint8))
        screen = np.empty((sh, sw, 3), dtype=np.uint8)
        screen[:] = bg_rgb
        y1, x1 = min(sh, top + ih), min(sw, left + iw)
        if top < sh and left < sw:
            screen[top:y1, left:x1] = frame_rgb[: y1 - top, : x1 - left]
        return (sw, sh, 3, screen)
    return None


# --------------------------------------------------------------- encode

def _lzw_encode_codes(min_code: int, seq: list[int]):
    """Real LZW compression (code, width) stream — exists so the
    decoder's dictionary-growth, width-bump, KwKwK (code==len(table))
    and 4096-reset paths are all provable by round trip."""
    clear = 1 << min_code
    eoi = clear + 1
    init = {(i,): i for i in range(clear)}
    d = dict(init)
    next_code = eoi + 1
    width = min_code + 1
    codes = [(clear, width)]
    buf: tuple = ()
    for s in seq:
        cand = buf + (s,)
        if cand in d:
            buf = cand
            continue
        codes.append((d[buf], width))
        d[cand] = next_code
        next_code += 1
        # decoder bumps width when ITS table reaches 2^width; its table
        # trails the encoder's by exactly one entry, so bump when the
        # encoder's next-to-assign code fills the current width
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code > 4095:
            codes.append((clear, width))
            d = dict(init)
            next_code = eoi + 1
            width = min_code + 1
        buf = (s,)
    if buf:
        codes.append((d[buf], width))
    codes.append((eoi, width))
    return codes


def gif_encode_rgb8(arr: np.ndarray, interlace: bool = False,
                    compress: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array with ≤256 unique colors as a
    GIF89a. Default scheme is uncompressed LZW (CLEAR before each width
    bump); ``compress=True`` runs real LZW so the decoder's growth
    paths get exercised. Fixture generator for decode tests — not a
    production compressor."""
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode_rgb8: >256 colors")
    # palette size: power of two ≥ max(2, n_colors)
    depth = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    pal_n = 1 << depth
    palette = np.zeros((pal_n, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx = inverse.reshape(h, w)
    if interlace:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    else:
        rows = idx
    seq = rows.reshape(-1).tolist()

    min_code = max(2, depth)
    clear = 1 << min_code
    eoi = clear + 1
    out_bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    if compress:
        for code, width in _lzw_encode_codes(min_code, seq):
            emit(code, width)
    else:
        width = min_code + 1
        emit(clear, width)
        run = 0
        for s in seq:
            # keep the decoder's dictionary below the width-bump point:
            # after CLEAR the decoder adds one entry per symbol starting
            # from the second; width would bump at 2^width - 1 entries
            if run >= (1 << min_code) - 2:
                emit(clear, width)
                run = 0
            emit(s, width)
            run += 1
        emit(eoi, width)
    if nbits:
        out_bits.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (depth - 1), 0, 0])  # GCT flag+size, bg=0
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0])
    out += bytes([min_code])
    for i in range(0, len(out_bits), 255):
        chunk = out_bits[i:i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    out += b"\x00\x3b"
    return bytes(out)

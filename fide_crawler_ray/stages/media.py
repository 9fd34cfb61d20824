"""Multimodal (media) column stages: opaque binary payloads + typed
metadata, processed by actor-pool ``map_batches`` stages.

The reference's media surface is the base64 data-URI profile photo
(multi-MB in its live DB) decoded for display
(reference: ui/streamlit_ui.py:14-25 splits the data-URI, b64-decodes,
PIL-opens). The engine-side plumbing is real — data-URI parsing, binary
columns, small batch sizes for wide rows, actor-pool signatures — and so
is the pixel decode for the three formats that matter (r4, closing
M16): pure-python PNG (``png_decode`` — stdlib zlib + scanline
unfiltering), pure-python baseline JPEG (``stages/jpeg.py`` — Huffman +
IDCT + 4:2:0/4:2:2/4:4:4 + restart markers), and pure-python GIF
(``stages/gif.py`` — LZW + interlace + local/global color tables). PIL
is still preferred when importable (import-gated in ``__init__``, once
per actor) for formats beyond those (progressive JPEG, animated-GIF
later frames); only payloads NO tier can decode fall to the
deterministic hash-derived stub dims.

Scale notes (SURVEY.md §7 hard part (e)): media payloads stay in a
separate binary column; batches are kept small (``MEDIA_BATCH_SIZE``) so
batch × concurrency of multi-MB rows fits worker heaps; span rows carry
only the media *ref*.
"""

from __future__ import annotations

import base64
import binascii
import hashlib

import numpy as np
import pyarrow as pa

MEDIA_BATCH_SIZE = 64  # wide binary rows → small batches


def parse_data_uri(ref: str) -> tuple[str, bytes | None]:
    """'data:image/jpeg;base64,<payload>' → (mime, bytes|None). Non-data
    or undecodable refs yield (kind-of-ref, None) — error → null, no drop."""
    if not ref.startswith("data:"):
        return ("ref", None)
    head, _, payload = ref.partition(",")
    mime = head[5:].split(";", 1)[0] or "application/octet-stream"
    try:
        return (mime, base64.b64decode(payload, validate=False))
    except (binascii.Error, ValueError):
        return (mime, None)


def materialize_media_batch(batch: pa.Table, ref_col: str = "profile_photo") -> pa.Table:
    """M16: media refs → (mime, payload binary, payload_len) columns."""
    mimes, payloads, lens = [], [], []
    for ref in batch[ref_col].to_pylist():
        mime, data = parse_data_uri(ref or "")
        mimes.append(mime)
        payloads.append(data)
        lens.append(len(data) if data is not None else None)
    return (
        batch.append_column("media_mime", pa.array(mimes, pa.string()))
        .append_column("media_payload", pa.array(payloads, pa.binary()))
        .append_column("media_len", pa.array(lens, pa.int64()))
    )


def parse_image_dims(payload: bytes) -> tuple[int, int] | None:
    """Pure-python (width, height) from PNG / JPEG / GIF headers — no
    image library needed. Returns None for unrecognized or truncated
    payloads (pixel formats beyond the header are NOT validated; this is
    a header parse, not a decode)."""
    n = len(payload)
    # PNG: 8-byte signature, IHDR width/height big-endian at offsets 16/20
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return (w, h) if w and h else None
    # GIF: 'GIF87a'/'GIF89a', logical screen size little-endian at 6/8
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return (w, h) if w and h else None
    # JPEG: walk markers to the first SOFn frame header
    if n >= 4 and payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:
                    h = int.from_bytes(payload[i + 5:i + 7], "big")
                    w = int.from_bytes(payload[i + 7:i + 9], "big")
                    return (w, h) if w and h else None
                return None
            i += 2 + seg_len
    return None


def _pure_python_decode(payload: bytes):
    """Shared no-image-library pixel-decode chain: PNG (``png_decode``)
    → baseline JPEG (stages/jpeg.py) → GIF (stages/gif.py, LZW).
    Returns (w, h, channels, ndarray) or None."""
    dec = png_decode(payload)
    if dec is None:
        from .jpeg import jpeg_decode

        dec = jpeg_decode(payload)
    if dec is None:
        from .gif import gif_decode

        dec = gif_decode(payload)
    return dec


class ImageDecodeStub:
    """Actor-pool decode stage. Decode priority per payload:

    1. PIL, when importable (absent in this environment);
    2. pure-python FULL pixel decode (``_pure_python_decode``) —
       ``png_decode`` (stdlib zlib + scanline unfiltering) for 8-bit
       non-interlaced PNGs, ``jpeg_decode`` (stages/jpeg.py) for
       baseline JPEGs, ``gif_decode`` (stages/gif.py LZW) for GIFs;
    3. pure-python header parse (``parse_image_dims``) — REAL dimensions
       for the remainder (progressive JPEG, 16-bit PNG), no image
       library;
    4. deterministic hash-derived stub dims (undecodable payloads only;
       the Ray-side plumbing — schema, batch size, actor lifecycle —
       is still exercised end-to-end).
    """

    def __init__(self):
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes | None) -> tuple[int | None, int | None]:
        if payload is None:
            return (None, None)
        if self._pil is not None:
            import io

            try:
                with self._pil.open(io.BytesIO(payload)) as im:
                    return im.size
            except Exception:
                return (None, None)
        dec = _pure_python_decode(payload)  # REAL pixel decode, no libs
        if dec is not None:
            return (dec[0], dec[1])
        dims = parse_image_dims(payload)
        if dims is not None:
            return dims
        # STUB: deterministic fake dimensions from the payload digest
        d = hashlib.sha1(payload).digest()
        return (64 + d[0] % 192, 64 + d[1] % 192)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dims = [self._decode(p) for p in batch["media_payload"].to_pylist()]
        return (
            batch.append_column("width", pa.array([d[0] for d in dims], pa.int32()))
            .append_column("height", pa.array([d[1] for d in dims], pa.int32()))
        )


class MediaFeatureStub:
    """Feature-extraction stage signature (embedding per media payload):
    deterministic 8-dim hash-derived vector standing in for a model
    forward pass; model load would live in ``__init__`` (once per actor)."""

    DIM = 8

    def __init__(self):
        self.dim = self.DIM  # a real model handle would be loaded here

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["media_payload"].to_pylist():
            if p is None:
                feats.append(None)
                continue
            d = hashlib.sha256(p).digest()
            feats.append([round(b / 255.0, 6) for b in d[: self.dim]])
        return batch.append_column(
            "media_embedding", pa.array(feats, pa.list_(pa.float32()))
        )


def media_pipeline(players_ds, concurrency: int = 2):
    """Compose: materialize → decode (actor pool) → features (actor pool).

    num_cpus=0.5 per actor so the two pools can't reserve every core and
    starve the upstream read stage (the pipeline would deadlock on a
    small CPU budget otherwise)."""
    ds = players_ds.map_batches(
        materialize_media_batch, batch_format="pyarrow", batch_size=MEDIA_BATCH_SIZE
    )
    ds = ds.map_batches(
        ImageDecodeStub, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=concurrency, num_cpus=0.5,
    )
    return ds.map_batches(
        MediaFeatureStub, batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE, concurrency=concurrency, num_cpus=0.5,
    )


def resize_dims(w: int, h: int, max_dim: int) -> tuple[int, int]:
    """Aspect-preserving thumbnail dimensions (never upscales)."""
    scale = min(1.0, max_dim / max(w, h, 1))
    return (max(1, round(w * scale)), max(1, round(h * scale)))


class ImageResizeStub:
    """Actor-pool resize stage: real aspect-ratio math on the decoded
    (width, height) columns. Pixel resample priority per payload:
    PIL when importable; else the pure-python decoders (``png_decode``,
    then baseline ``jpeg_decode``) + an exact numpy area-average
    (integer box resample, re-encoded with ``png_encode_rgb8`` — a REAL
    thumbnail, no image library); else a deterministic stub payload
    (digest-derived bytes)."""

    def __init__(self, max_dim: int = 128):
        self.max_dim = max_dim
        try:
            from PIL import Image

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th, thumbs = [], [], []
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        payloads = batch["media_payload"].to_pylist()
        for w, h, p in zip(widths, heights, payloads):
            if w is None or h is None or p is None:
                tw.append(None), th.append(None), thumbs.append(None)
                continue
            nw, nh = resize_dims(w, h, self.max_dim)
            tw.append(nw)
            th.append(nh)
            if self._pil is not None:
                import io

                try:
                    with self._pil.open(io.BytesIO(p)) as im:
                        im.thumbnail((self.max_dim, self.max_dim))
                        buf = io.BytesIO()
                        im.save(buf, format="PNG")
                        thumbs.append(buf.getvalue())
                        continue
                except Exception:
                    pass
            dec = _pure_python_decode(p)
            if dec is not None and dec[2] == 3 and nw <= dec[0] \
                    and nh <= dec[1]:
                # REAL resample: integer area average over an exact
                # box partition (floor boundaries), re-encoded as PNG
                _, _, _, arr = dec
                xb = np.floor(np.arange(nw + 1) * dec[0] / nw) \
                    .astype(np.int64)
                yb = np.floor(np.arange(nh + 1) * dec[1] / nh) \
                    .astype(np.int64)
                out = np.zeros((nh, nw, 3), dtype=np.uint8)
                a64 = arr.astype(np.int64)
                for yy in range(nh):
                    for xx in range(nw):
                        box = a64[yb[yy]:yb[yy + 1], xb[xx]:xb[xx + 1]]
                        out[yy, xx] = (
                            box.reshape(-1, 3).sum(axis=0)
                            // (box.shape[0] * box.shape[1])
                        ).astype(np.uint8)
                thumbs.append(png_encode_rgb8(nw, nh, out.tobytes()))
                continue
            # STUB payload: deterministic digest bytes sized to the thumb
            thumbs.append(hashlib.sha256(p).digest()[: max(8, (nw * nh) % 64)])
        return (
            batch.append_column("thumb_width", pa.array(tw, pa.int32()))
            .append_column("thumb_height", pa.array(th, pa.int32()))
            .append_column("thumb_payload", pa.array(thumbs, pa.binary()))
        )


def frame_offsets(n_samples: int, frame_len: int, hop: int):
    """Sliding audio frame start offsets (sample units): 0, hop, 2·hop …
    while a full frame fits. Pure framing math — real, not a stub."""
    import numpy as np

    if n_samples < frame_len:
        return np.empty(0, dtype=np.int64)
    return np.arange(0, n_samples - frame_len + 1, hop, dtype=np.int64)


class AudioFrameStage:
    """Actor-pool audio framing: opaque PCM-ish binary payload + sample
    rate → frame count, duration, and the frame-offset list. The
    sample-decode (codec) step would sit before this and is the stubbed
    part elsewhere; framing itself is exact arithmetic over payload
    length, so THIS stage is real and oracle-checkable."""

    def __init__(self, frame_len: int = 400, hop: int = 160,
                 sample_rate: int = 16_000, bytes_per_sample: int = 1):
        self.frame_len, self.hop = frame_len, hop
        self.rate, self.bps = sample_rate, bytes_per_sample

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_samples, n_frames, durations, offsets = [], [], [], []
        for p in batch["audio_payload"].to_pylist():
            if p is None:
                n_samples.append(None), n_frames.append(None)
                durations.append(None), offsets.append(None)
                continue
            ns = len(p) // self.bps
            offs = frame_offsets(ns, self.frame_len, self.hop)
            n_samples.append(ns)
            n_frames.append(len(offs))
            durations.append(ns / self.rate)
            offsets.append(offs[:16].tolist())  # head only; full list is derivable
        return (
            batch.append_column("n_samples", pa.array(n_samples, pa.int64()))
            .append_column("n_frames", pa.array(n_frames, pa.int64()))
            .append_column("duration_s", pa.array(durations, pa.float64()))
            .append_column("frame_offsets",
                           pa.array(offsets, pa.list_(pa.int64())))
        )


def sample_frame_indices(n_frames: int, k: int):
    """Uniform deterministic video frame sampling: k indices spread over
    [0, n_frames) (all frames when n_frames <= k). Pure math — real."""
    import numpy as np

    if n_frames <= 0:
        return np.empty(0, dtype=np.int64)
    if n_frames <= k:
        return np.arange(n_frames, dtype=np.int64)
    return np.unique((np.arange(k) * (n_frames / k)).astype(np.int64))


class VideoFrameSampleStub:
    """Video frame-sample stage: index selection is real; the frame
    extraction itself (codec) is represented by deterministic digest
    payloads per selected index (no video library in this env)."""

    def __init__(self, k: int = 8):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        idx_col, frames_col = [], []
        metas = batch["n_video_frames"].to_pylist()
        payloads = batch["media_payload"].to_pylist()
        for n, p in zip(metas, payloads):
            if n is None or p is None:
                idx_col.append(None), frames_col.append(None)
                continue
            idx = sample_frame_indices(int(n), self.k)
            idx_col.append(idx.tolist())
            frames_col.append(
                [hashlib.sha1(p + i.tobytes()).digest()[:8] for i in idx]
            )
        return (
            batch.append_column("sampled_frames",
                                pa.array(idx_col, pa.list_(pa.int64())))
            .append_column("frame_payloads",
                           pa.array(frames_col, pa.list_(pa.binary())))
        )


# ============================= pure-python PNG codec (zlib is stdlib)

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF))


def png_encode_rgb8(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal REAL PNG encoder (8-bit RGB, filter 0, one IDAT) — no
    image library, just zlib + CRC32. Output opens in any PNG reader;
    used to synthesize genuine image payloads for the decode path."""
    import struct
    import zlib as _z

    assert len(rgb) == width * height * 3, "rgb byte count mismatch"
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(b"\x00" + rgb[y * stride:(y + 1) * stride]
                   for y in range(height))
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(raw))
            + _png_chunk(b"IEND", b""))


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def png_decode(payload: bytes):
    """Pure-python PNG decoder — REAL pixel decode, no image library:
    walks chunks, zlib-inflates the concatenated IDATs and unfilters
    every scanline (all five filter types 0–4, including Paeth). Only
    8-bit depth, non-interlaced, color types 0/2/4/6 — which covers
    every PNG this engine synthesizes and the overwhelming share of
    web images. Returns (width, height, channels, ndarray[h, w, c])
    or None when the payload isn't such a PNG (caller falls back to
    the header parse / stub tiers)."""
    try:
        return _png_decode_inner(payload)
    except Exception:
        # same never-crash contract as jpeg_decode/gif_decode: a
        # truncated IHDR raised struct.error straight through the
        # decode tier before r5 (found by the codec fuzz test)
        return None


def _png_decode_inner(payload: bytes):
    import struct
    import zlib as _z

    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = None
    idat = []
    bitdepth = color = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitdepth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if (w is None or not idat or bitdepth != 8 or interlace != 0
            or color not in _PNG_CHANNELS):
        return None
    # decode work/memory cap (shared policy with stages/jpeg.py and
    # stages/gif.py): a crafted IHDR + zlib bomb can expand a small
    # payload to multi-GB — bound the declared pixel count AND pass
    # an explicit max length to decompress before any allocation
    if w * h > (1 << 26):
        return None
    ch = _PNG_CHANNELS[color]
    try:
        # decompressobj + max_length HARD-caps the inflated size (plain
        # decompress's bufsize is only a hint); one surplus byte makes
        # the exact-length check below fail → None, never an OOM
        raw = _z.decompressobj().decompress(
            b"".join(idat), h * (w * ch + 1) + 1)
    except Exception:
        return None
    stride = w * ch
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
            dtype=np.uint8).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    return (w, h, ch, out.reshape(h, w, ch))


def _pixel_stats_batch(batch: pa.Table, decoder) -> pa.Table:
    """Shared body of the pixel-stats stages: decode every payload with
    ``decoder`` (→ (w, h, channels, ndarray) or None), emit per-channel
    integer pixel sums; undecodable / non-RGB payloads yield null rows
    (error → null, never drop)."""
    w_out, h_out, rs, gs, bs = [], [], [], [], []
    for p in batch["media_payload"].to_pylist():
        dec = decoder(p) if p is not None else None
        if dec is None or dec[2] != 3:
            w_out.append(None), h_out.append(None)
            rs.append(None), gs.append(None), bs.append(None)
            continue
        w, h, _, arr = dec
        s = arr.astype(np.int64).reshape(-1, 3).sum(axis=0)
        w_out.append(w), h_out.append(h)
        rs.append(int(s[0])), gs.append(int(s[1])), bs.append(int(s[2]))
    return pa.table({
        "doc_id": batch["doc_id"],
        "width": pa.array(w_out, pa.int64()),
        "height": pa.array(h_out, pa.int64()),
        "r_sum": pa.array(rs, pa.int64()),
        "g_sum": pa.array(gs, pa.int64()),
        "b_sum": pa.array(bs, pa.int64()),
    })


class JpegPixelStatsStage:
    """Actor-pool REAL-decode stage for baseline JPEG: pure-python
    ``jpeg_decode`` (stages/jpeg.py — Huffman + IDCT + color convert)
    per payload, per-channel integer pixel sums out. Same contract as
    PngPixelStatsStage (shared ``_pixel_stats_batch`` body); together
    they close M16's pixel-decode gap without any image library."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .jpeg import jpeg_decode

        return _pixel_stats_batch(batch, jpeg_decode)


class PngPixelStatsStage:
    """Actor-pool REAL-decode stage: pure-python ``png_decode`` per
    payload, per-channel integer pixel sums out. Actor (not task) per
    the multimodal house contract — decoders with model/codec state
    init once here; this one is stateless but keeps the same shape."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _pixel_stats_batch(batch, png_decode)

"""Report sink (S7) and the pure-python image header parser (M16)."""

import struct

import pandas as pd
import pyarrow as pa
import ray.data as rd

from fide_crawler_ray.sources import report as RP
from fide_crawler_ray.stages.media import parse_image_dims


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 8)


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def _jpeg(w, h):
    # SOI, APP0 (minimal), SOF0 with height/width, EOI
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", h, w) + b"\x01\x01\x11\x00")
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_parse_image_dims_formats():
    assert parse_image_dims(_png(640, 480)) == (640, 480)
    assert parse_image_dims(_gif(320, 200)) == (320, 200)
    assert parse_image_dims(_jpeg(1024, 768)) == (1024, 768)
    assert parse_image_dims(b"not an image at all") is None
    assert parse_image_dims(b"\x89PNG\r\n\x1a\n tru") is None  # truncated


def test_write_report_csv_and_md(tmp_path):
    ds = rd.from_arrow(pa.table({
        "segment": pa.array(["A", "B"], pa.string()),
        "revenue": pa.array([1234.5, 99.25], pa.float64()),
    }))
    out = str(tmp_path / "rollup")
    written = RP.write_report(ds, out)
    csv = pd.read_csv(written["csv"])
    assert csv["revenue"].tolist() == [1234.5, 99.25]
    md = open(written["md"]).read()
    assert md.splitlines()[0] == "| segment | revenue |"
    assert "| A | 1234.5000 |" in md
    # atomic replace: a second write overwrites in place
    RP.write_report(csv.assign(revenue=[1.0, 2.0]), out)
    assert pd.read_csv(written["csv"])["revenue"].tolist() == [1.0, 2.0]


def test_store_filter_pushdown(tmp_path):
    """S3: the store reader pushes column pruning and row predicates
    down to the parquet scan."""
    import pyarrow.dataset as pads

    from fide_crawler_ray.sources import store as ST

    t = pa.table({
        "k": pa.array(range(100), pa.int64()),
        "v": pa.array([f"row{i}" for i in range(100)], pa.string()),
        "unused": pa.array([0.0] * 100, pa.float64()),
    })
    root = str(tmp_path / "st")
    assert ST.write_epoch(rd.from_arrow(t), root, "tbl", 1) == 100
    ds = ST.read_all(root, "tbl", columns=["k", "v"],
                     filter=pads.field("k") >= 90)
    df = ds.to_pandas()
    assert list(df.columns) == ["k", "v"]
    assert sorted(df["k"]) == list(range(90, 100))


def test_write_report_row_cap(tmp_path):
    big = pd.DataFrame({"x": range(10)})
    try:
        RP.write_report(big, str(tmp_path / "r"), max_rows=5)
        raise AssertionError("row cap not enforced")
    except ValueError as e:
        assert "report input has" in str(e)


def test_resize_stage_dims_and_payloads():
    """ImageResizeStub: aspect-preserving dims, never upscales, null in →
    null out; stub thumb payload is deterministic."""
    from fide_crawler_ray.stages.media import ImageResizeStub, resize_dims

    assert resize_dims(640, 480, 128) == (128, 96)
    assert resize_dims(480, 640, 128) == (96, 128)
    assert resize_dims(100, 50, 128) == (100, 50)  # no upscale
    t = pa.table({
        "width": pa.array([640, None], pa.int32()),
        "height": pa.array([480, None], pa.int32()),
        "media_payload": pa.array([b"imgbytes", None], pa.binary()),
    })
    r = ImageResizeStub()
    out1, out2 = r(t), r(t)
    assert out1["thumb_width"].to_pylist() == [128, None]
    assert out1["thumb_height"].to_pylist() == [96, None]
    assert out1["thumb_payload"].to_pylist() == out2["thumb_payload"].to_pylist()
    assert out1["thumb_payload"].to_pylist()[1] is None


def test_audio_framing_math():
    """frame_offsets: standard sliding-window framing (frame 400, hop
    160) — exact counts and offsets, including shorter-than-one-frame."""
    import numpy as np

    from fide_crawler_ray.stages.media import AudioFrameStage, frame_offsets

    assert frame_offsets(399, 400, 160).tolist() == []
    assert frame_offsets(400, 400, 160).tolist() == [0]
    assert frame_offsets(1000, 400, 160).tolist() == [0, 160, 320, 480]
    st = AudioFrameStage()
    out = st(pa.table({"audio_payload": [b"\0" * 1000, None]}))
    assert out["n_frames"].to_pylist() == [4, None]
    assert out["duration_s"].to_pylist()[0] == 1000 / 16000.0
    assert out["frame_offsets"].to_pylist()[0] == [0, 160, 320, 480]


def test_video_frame_sampling():
    """sample_frame_indices: k uniform indices, all frames when short,
    strictly increasing, deterministic."""
    import numpy as np

    from fide_crawler_ray.stages.media import (VideoFrameSampleStub,
                                               sample_frame_indices)

    idx = sample_frame_indices(100, 8)
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] < 100
    assert np.all(np.diff(idx) > 0)
    assert sample_frame_indices(3, 8).tolist() == [0, 1, 2]
    assert sample_frame_indices(0, 8).tolist() == []
    st = VideoFrameSampleStub(k=4)
    t = pa.table({
        "n_video_frames": pa.array([20, None], pa.int64()),
        "media_payload": pa.array([b"vid", None], pa.binary()),
    })
    out = st(t)
    assert out["sampled_frames"].to_pylist()[0] == [0, 5, 10, 15]
    assert out["sampled_frames"].to_pylist()[1] is None
    frames = out["frame_payloads"].to_pylist()[0]
    assert len(frames) == 4 and all(len(f) == 8 for f in frames)


def test_media_dedup_by_payload_bytes():
    """Binary-payload exact dedup: distinct payloads survive once, keep
    the smallest fide_id; nulls (non-data URIs) are excluded."""
    from fide_crawler_ray.pipelines.queries import q_crawl_players, q_media_dedup

    import ray

    sf = "/root/testdata/sf0.001"
    df = q_media_dedup(sf).to_pandas()
    players = q_crawl_players(sf).to_pandas()
    assert 0 < len(df) <= len(players)
    # recompute expected survivors driver-side
    from fide_crawler_ray.stages.media import parse_data_uri

    best = {}
    for _, r in players.iterrows():
        mime, payload = parse_data_uri(r["profile_photo"])
        if payload is None:
            continue
        fid = int(r["fide_id"])
        if payload not in best or fid < best[payload]:
            best[payload] = fid
    assert sorted(df["fide_id"].astype(int)) == sorted(best.values())


def _real_png(w, h, rgb):
    """A complete, decodable RGB PNG built with stdlib only (zlib IDAT):
    every pixel = `rgb`. Lets the pixel-decode path be tested for REAL
    whenever a decoder is importable, with no image library needed to
    build the fixture."""
    import zlib

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(rgb) * w for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_decode_real_pixels_any_decoder():
    """M16 pixel decode: decoded dims come from the pixels and the
    resized thumbnail is a real PNG whose pixel mean matches the solid
    source color. With PIL importable the stages must prefer it and the
    thumbnail is cross-checked with PIL; without PIL (this container)
    the pure-python tier must produce the same result and the thumbnail
    is cross-checked with the in-repo ``png_decode`` — the codec itself
    is oracle-certified by its own round-trip suites, so this runs (not
    skips) in a PIL-less env."""
    from fide_crawler_ray.stages.media import (
        ImageDecodeStub, ImageResizeStub, png_decode)

    payload = _real_png(256, 64, (200, 40, 90))
    batch = pa.table({"media_payload": pa.array([payload], pa.binary())})
    dec = ImageDecodeStub()
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    # the probe must prefer the real decoder exactly when available
    assert (dec._pil is not None) == has_pil
    out = dec(batch)
    assert (out["width"][0].as_py(), out["height"][0].as_py()) == (256, 64)

    thumb = ImageResizeStub(max_dim=128)(out)
    assert (thumb["thumb_width"][0].as_py(),
            thumb["thumb_height"][0].as_py()) == (128, 32)
    tp = thumb["thumb_payload"][0].as_py()
    if has_pil:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(tp)) as im:
            assert im.size == (128, 32)
            px = list(im.convert("RGB").getdata())
            means = [sum(c[i] for c in px) / len(px) for i in range(3)]
    else:
        w, h, chans, arr = png_decode(tp)
        assert (w, h, chans) == (128, 32, 3)
        means = arr.reshape(-1, 3).mean(axis=0).tolist()
    for got, want in zip(means, (200, 40, 90)):
        assert abs(got - want) < 2.0  # resample of a solid color


def test_report_session_language_state(tmp_path):
    """ST5 semantics: the session's language persists across report
    writes, the toggle flips it (reference ui/streamlit_ui.py:398-414),
    and rendered headers come from the M19 localization table while
    data values stay untranslated."""
    from fide_crawler_ray.functions.localization import LABELS

    df = pd.DataFrame({
        "date": ["2024-01-01"],
        "tournament_name": ["T1"],
        "result": [1.0],
    })
    s = RP.ReportSession()               # defaults pt-BR like the reference
    out = s.write(df, str(tmp_path / "r1"))
    csv1 = open(out["csv"]).read()
    assert csv1.splitlines()[0] == "Data,Nome do Torneio,Resultado"
    assert "T1" in csv1                  # values untouched
    # session state persists across writes
    out2 = s.write(df, str(tmp_path / "r2"))
    assert open(out2["csv"]).read().splitlines()[0] == \
        "Data,Nome do Torneio,Resultado"
    # toggle flips to en-US for subsequent renders
    assert s.toggle() == "en-US"
    out3 = s.write(df, str(tmp_path / "r3"))
    head = open(out3["csv"]).read().splitlines()[0]
    assert head == ",".join(LABELS["en-US"][c] for c in df.columns)
    assert s.toggle() == "pt-BR"         # round trip


# ===================== pure-python PNG codec (round-3 real pixel decode)

def test_png_codec_round_trip():
    """png_encode_rgb8 → png_decode is exact for arbitrary pixel bytes;
    the decoder also handles every PNG filter type (1/2/3/4) on
    hand-filtered scanlines, not just the encoder's filter 0."""
    import hashlib
    import struct
    import zlib

    import numpy as np

    from fide_crawler_ray.stages.media import (_png_chunk, png_decode,
                                               png_encode_rgb8)

    rgb = hashlib.md5(b"codec").digest() * 12  # 192 bytes = 8×8×3
    w, h, ch, arr = png_decode(png_encode_rgb8(8, 8, rgb))
    assert (w, h, ch) == (8, 8, 3)
    assert arr.tobytes() == rgb

    # Hand-build a 3×2 RGB PNG exercising filters Sub(1) and Paeth(4).
    row0 = np.array([10, 20, 30, 40, 50, 60, 70, 80, 90], np.uint8)
    row1 = np.array([15, 25, 35, 45, 55, 65, 75, 85, 95], np.uint8)
    # filter 1 (Sub): enc[x] = raw[x] - raw[x-3]
    f0 = row0.astype(np.int64)
    sub = np.concatenate([f0[:3], (f0[3:] - f0[:-3]) & 0xFF]).astype(np.uint8)
    # filter 4 (Paeth) on row1 with prev=row0: predictor per spec
    enc1 = np.zeros(9, np.int64)
    cur = row1.astype(np.int64)
    prev = row0.astype(np.int64)
    for x in range(9):
        a = cur[x - 3] if x >= 3 else 0
        b = prev[x]
        c = prev[x - 3] if x >= 3 else 0
        p = a + b - c
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
        enc1[x] = (cur[x] - pred) & 0xFF
    raw = b"\x01" + sub.tobytes() + b"\x04" + enc1.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
    w, h, ch, arr = png_decode(payload)
    assert (w, h, ch) == (3, 2, 3)
    assert arr.reshape(-1).tolist() == row0.tolist() + row1.tolist()

    # Non-PNG / truncated / 16-bit payloads are rejected, not crashed.
    assert png_decode(b"notapng") is None
    assert png_decode(payload[:20]) is None
    ihdr16 = struct.pack(">IIBBBBB", 3, 2, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr16)
           + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 20))
           + _png_chunk(b"IEND", b""))
    assert png_decode(bad) is None


def test_decode_and_resize_real_png_without_pil():
    """The decode stage reads REAL dims from the PNG pixels (no PIL
    needed), and the resize stage produces a REAL thumbnail: a solid
    color source area-averages to the same solid color, verified by
    decoding the thumbnail payload back."""
    from fide_crawler_ray.stages.media import (ImageDecodeStub,
                                               ImageResizeStub, png_decode,
                                               png_encode_rgb8)

    src = png_encode_rgb8(64, 32, bytes([200, 40, 90]) * (64 * 32))
    batch = pa.table({"media_payload": pa.array([src], pa.binary())})
    dec = ImageDecodeStub()
    out = dec(batch)
    assert (out["width"][0].as_py(), out["height"][0].as_py()) == (64, 32)

    thumb = ImageResizeStub(max_dim=16)(out)
    assert (thumb["thumb_width"][0].as_py(),
            thumb["thumb_height"][0].as_py()) == (16, 8)
    w, h, ch, arr = png_decode(thumb["thumb_payload"][0].as_py())
    assert (w, h, ch) == (16, 8, 3)
    assert set(map(tuple, arr.reshape(-1, 3).tolist())) == {(200, 40, 90)}


def test_png_pixel_stats_stage_sums():
    """PngPixelStatsStage emits exact per-channel integer sums of the
    DECODED pixels; non-PNG payloads yield null rows."""
    import numpy as np

    from fide_crawler_ray.stages.media import (PngPixelStatsStage,
                                               png_encode_rgb8)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media_payload": pa.array(
            [png_encode_rgb8(8, 8, px.tobytes()), b"junk"], pa.binary()),
    })
    out = PngPixelStatsStage()(t)
    s = px.astype(np.int64).reshape(-1, 3).sum(axis=0)
    assert out["r_sum"].to_pylist() == [int(s[0]), None]
    assert out["g_sum"].to_pylist() == [int(s[1]), None]
    assert out["b_sum"].to_pylist() == [int(s[2]), None]
    assert out["width"].to_pylist() == [8, None]


# ------------------------------------------- baseline JPEG codec (r4, M16)


def test_jpeg_codec_round_trip_solid_exact():
    """Solid colors must round-trip the baseline codec bit-exactly at
    quality 95 (the bound the jpeg_pixel_stats oracle relies on) —
    across 4:4:4, 4:2:0, restart intervals, grayscale and odd dims."""
    import numpy as np

    from fide_crawler_ray.stages.jpeg import (jpeg_decode,
                                              jpeg_encode_baseline)

    rng = np.random.default_rng(11)
    for _ in range(25):
        rgb = rng.integers(0, 256, 3).tolist()
        arr = np.full((20, 24, 3), rgb, dtype=np.uint8)
        for ss in (False, True):
            for ri in (0, 2):
                dec = jpeg_decode(jpeg_encode_baseline(
                    arr, quality=95, subsample=ss, restart_interval=ri))
                assert dec is not None
                w, h, ch, out = dec
                assert (w, h, ch) == (24, 20, 3)
                assert np.array_equal(out, arr), (rgb, ss, ri)
    # grayscale + odd (non-multiple-of-8) dims
    g = np.full((13, 21), 77, dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode_baseline(g, quality=95))
    assert dec[:3] == (21, 13, 1)
    assert np.array_equal(dec[3][:, :, 0], g)


def test_jpeg_codec_gradient_tolerance():
    """Non-trivial content (every AC path, long Huffman codes) decodes
    within a small mean error at high quality."""
    import numpy as np

    from fide_crawler_ray.stages.jpeg import (jpeg_decode,
                                              jpeg_encode_baseline)

    yy, xx = np.mgrid[0:50, 0:70]
    grad = np.stack([(xx * 3) % 256, (yy * 5) % 256,
                     ((xx + yy) * 2) % 256], axis=2).astype(np.uint8)
    for ss in (False, True):
        dec = jpeg_decode(jpeg_encode_baseline(
            grad, quality=95, subsample=ss, restart_interval=3))
        assert (dec[0], dec[1]) == (70, 50)
        err = np.abs(dec[3].astype(int) - grad.astype(int)).mean()
        assert err < (0.6 if not ss else 2.0), (ss, err)


def test_jpeg_decode_rejects_what_it_cannot_decode():
    """Progressive SOF2, truncated payloads and junk → None (callers
    fall back to the header-parse tier), never an exception."""
    import numpy as np

    from fide_crawler_ray.stages.jpeg import (jpeg_decode,
                                              jpeg_encode_baseline)

    good = jpeg_encode_baseline(
        np.full((16, 16, 3), 99, dtype=np.uint8))
    assert jpeg_decode(good) is not None
    assert jpeg_decode(good[:40]) is None             # truncated
    assert jpeg_decode(b"junkjunk") is None
    prog = bytearray(good)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2                                # fake progressive
    assert jpeg_decode(bytes(prog)) is None


def test_decode_and_resize_real_jpeg_without_pil():
    """M16 closed for JPEG: the decode stage reads REAL dims from the
    entropy-decoded pixels (no PIL in this env), and the resize stage
    area-averages the REAL pixel array into a PNG thumbnail that decodes
    back to the same solid color."""
    import numpy as np

    from fide_crawler_ray.stages.jpeg import jpeg_encode_baseline
    from fide_crawler_ray.stages.media import (ImageDecodeStub,
                                               ImageResizeStub, png_decode)

    src = jpeg_encode_baseline(
        np.full((32, 64, 3), [200, 40, 90], dtype=np.uint8), quality=95)
    batch = pa.table({"media_payload": pa.array([src], pa.binary())})
    dec = ImageDecodeStub()
    assert dec._pil is None  # this env: the pure-python tier must carry
    out = dec(batch)
    assert (out["width"][0].as_py(), out["height"][0].as_py()) == (64, 32)

    thumb = ImageResizeStub(max_dim=16)(out)
    assert (thumb["thumb_width"][0].as_py(),
            thumb["thumb_height"][0].as_py()) == (16, 8)
    w, h, ch, arr = png_decode(thumb["thumb_payload"][0].as_py())
    assert (w, h, ch) == (16, 8, 3)
    assert set(map(tuple, arr.reshape(-1, 3).tolist())) == {(200, 40, 90)}


def test_jpeg_pixel_stats_stage_sums():
    """JpegPixelStatsStage emits exact per-channel sums of the DECODED
    pixels for solid sources; undecodable payloads yield null rows."""
    import numpy as np

    from fide_crawler_ray.stages.jpeg import jpeg_encode_baseline
    from fide_crawler_ray.stages.media import JpegPixelStatsStage

    arr = np.full((20, 24, 3), [17, 130, 251], dtype=np.uint8)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "media_payload": pa.array(
            [jpeg_encode_baseline(arr, quality=95), b"junk"], pa.binary()),
    })
    out = JpegPixelStatsStage()(t)
    n = 24 * 20
    assert out["r_sum"].to_pylist() == [17 * n, None]
    assert out["g_sum"].to_pylist() == [130 * n, None]
    assert out["b_sum"].to_pylist() == [251 * n, None]
    assert out["width"].to_pylist() == [24, None]


def test_synth_photo_is_real_jpeg():
    """The synthetic site's profile photos are REAL baseline JPEGs whose
    decoded pixels are the palette color the digest selected — so every
    crawl exercises the real decode path end to end."""
    import base64

    from fide_crawler_ray import synth
    from fide_crawler_ray.stages.jpeg import jpeg_decode
    from fide_crawler_ray.stages.media import parse_data_uri

    cfg = synth.SiteConfig(seed=7, n_players=3, n_queries=1, n_months=2)
    fid = synth.player_ids(cfg)[0]
    doc = synth.render_url(cfg, synth.profile_url(fid))
    ref = next(s["media_ref"] for s in doc["spans"] if s["kind"] == "media")
    mime, payload = parse_data_uri(ref)
    assert mime == "image/jpeg"
    dec = jpeg_decode(payload)
    assert dec is not None
    w, h, ch, arr = dec
    assert 64 <= w <= 160 and 64 <= h <= 128 and ch == 3
    colors = set(map(tuple, arr.reshape(-1, 3).tolist()))
    assert len(colors) == 1
    assert colors.pop() in {
        (r, g, b) for r in (32, 128, 224) for g in (32, 128, 224)
        for b in (32, 128, 224)}


# ---------------------------------------------- GIF codec (r4, M16 tail)


def test_gif_codec_round_trip_exact():
    """GIF LZW decode is bit-exact across palette sizes, interlace, the
    uncompressed-LZW scheme AND real compression (dictionary growth,
    width bumps, KwKwK, 4096 reset)."""
    import numpy as np

    from fide_crawler_ray.stages.gif import gif_decode, gif_encode_rgb8

    rng = np.random.default_rng(3)
    for npal in (2, 16, 256):
        pal = rng.integers(0, 256, (npal, 3)).astype(np.uint8)
        img = pal[rng.integers(0, npal, (30, 45))]
        for comp in (False, True):
            for il in (False, True):
                dec = gif_decode(gif_encode_rgb8(
                    img, interlace=il, compress=comp))
                assert dec is not None and dec[:3] == (45, 30, 3)
                assert np.array_equal(dec[3], img), (npal, comp, il)
    # large high-entropy image forces the 4096-entry dictionary reset
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    big = pal[rng.integers(0, 256, (120, 200))]
    dec = gif_decode(gif_encode_rgb8(big, compress=True))
    assert np.array_equal(dec[3], big)


def test_gif_decode_rejects_garbage():
    import numpy as np

    from fide_crawler_ray.stages.gif import gif_decode, gif_encode_rgb8

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (8, 3)).astype(np.uint8)
    good = gif_encode_rgb8(pal[rng.integers(0, 8, (12, 12))])
    assert gif_decode(good) is not None
    assert gif_decode(good[:20]) is None
    assert gif_decode(b"notagif!") is None
    for i in range(0, len(good), 5):
        b = bytearray(good)
        b[i] ^= 0xFF
        gif_decode(bytes(b))  # must never raise


def test_decode_stage_reads_real_gif_pixels():
    """The decode stage's pure-python chain now covers GIF: real dims
    from the LZW-decoded pixels, and the resize stage produces a real
    PNG thumbnail of the GIF content."""
    import numpy as np

    from fide_crawler_ray.stages.gif import gif_encode_rgb8
    from fide_crawler_ray.stages.media import (ImageDecodeStub,
                                               ImageResizeStub, png_decode)

    src = gif_encode_rgb8(
        np.full((32, 64, 3), [200, 40, 90], dtype=np.uint8))
    batch = pa.table({"media_payload": pa.array([src], pa.binary())})
    out = ImageDecodeStub()(batch)
    assert (out["width"][0].as_py(), out["height"][0].as_py()) == (64, 32)
    thumb = ImageResizeStub(max_dim=16)(out)
    w, h, ch, arr = png_decode(thumb["thumb_payload"][0].as_py())
    assert (w, h, ch) == (16, 8, 3)
    assert set(map(tuple, arr.reshape(-1, 3).tolist())) == {(200, 40, 90)}


def test_gif_local_color_table_and_bg_composition():
    """Frame indices resolve through the frame's OWN (local) color
    table; the background fills through the GLOBAL table — the two
    index spaces never mix (regression: a local-table frame used to
    colorize through the GCT)."""
    import struct

    import numpy as np

    from fide_crawler_ray.stages.gif import gif_decode

    # GCT = [white, white]; 2x2 frame at (1,1) with LCT [black, red],
    # all pixels index 1 → red frame on white background
    def chunks(bits):
        out = bytearray()
        for i in range(0, len(bits), 255):
            c = bits[i:i + 255]
            out += bytes([len(c)]) + bytes(c)
        return out + b"\x00"

    # min_code=7 keeps the dictionary far from a width bump for this
    # 4-pixel stream: CLEAR=128, idx 1 ×4, EOI=129, all 8-bit codes
    codes = [(128, 8), (1, 8), (1, 8), (1, 8), (1, 8), (129, 8)]
    acc = nb = 0
    bits = bytearray()
    for code, w in codes:
        acc |= code << nb
        nb += w
        while nb >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nb -= 8
    if nb:
        bits.append(acc & 0xFF)
    gif = bytearray(b"GIF89a")
    gif += struct.pack("<HH", 4, 4) + bytes([0x80, 0, 0])  # GCT 2 entries
    gif += bytes([255, 255, 255, 255, 255, 255])           # white, white
    gif += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2)
    gif += bytes([0x80])                                   # LCT 2 entries
    gif += bytes([0, 0, 0, 255, 0, 0])                     # black, red
    gif += bytes([7]) + chunks(bits)
    gif += b"\x3b"
    dec = gif_decode(bytes(gif))
    assert dec is not None and dec[:3] == (4, 4, 3)
    arr = dec[3]
    assert tuple(arr[0, 0]) == (255, 255, 255)  # bg via GCT
    assert tuple(arr[1, 1]) == (255, 0, 0)      # frame via LCT
    assert tuple(arr[2, 2]) == (255, 0, 0)
    assert tuple(arr[3, 3]) == (255, 255, 255)


def test_decoders_reject_dimension_bombs():
    """Crafted headers declaring huge dimensions must be rejected
    BEFORE allocation (the never-crash contract covers adversarial
    payloads, not just malformed ones)."""
    import struct
    import zlib

    from fide_crawler_ray.stages.gif import gif_decode
    from fide_crawler_ray.stages.jpeg import jpeg_decode
    from fide_crawler_ray.stages.media import png_decode

    # GIF logical screen 65535x65535
    g = (b"GIF89a" + struct.pack("<HH", 65535, 65535)
         + bytes([0x80, 0, 0]) + bytes(6) + b"\x3b")
    assert gif_decode(g) is None
    # JPEG SOF0 65535x65535
    j = (b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + b"\x08"
         + struct.pack(">HH", 65535, 65535) + b"\x01\x01\x11\x00"
         + b"\xff\xd9")
    assert jpeg_decode(j) is None
    # PNG zlib bomb: IHDR 20000x20000 RGB + tiny compressed IDAT
    ihdr = struct.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0)

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    p = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
         + chunk(b"IDAT", zlib.compress(b"\x00" * 100000))
         + chunk(b"IEND", b""))
    assert png_decode(p) is None


def test_codec_fuzz_never_crashes_or_hangs():
    """Deterministic corruption fuzz over all three pure-python decoders
    (the r5 JPEG bit-reader/LUT rewrite and GIF bytearray-LZW rewrite
    must keep the never-crash contract): truncations and byte flips of
    valid payloads either decode or return None — no exception escapes,
    no pathological run time."""
    import time

    import numpy as np

    from fide_crawler_ray.stages.gif import gif_decode, gif_encode_rgb8
    from fide_crawler_ray.stages.jpeg import (jpeg_decode,
                                              jpeg_encode_baseline)
    from fide_crawler_ray.stages.media import png_decode

    rng = np.random.default_rng(99)
    arr = (rng.integers(0, 256, (24, 32, 3))).astype(np.uint8)
    solid = np.full((16, 16, 3), (9, 200, 77), dtype=np.uint8)
    payloads = [
        ("jpeg", jpeg_encode_baseline(arr, quality=90)),
        ("jpeg420", jpeg_encode_baseline(arr, quality=95, subsample=True,
                                         restart_interval=2)),
        ("png", _real_png(24, 16, (1, 2, 3))),
        ("gif", gif_encode_rgb8(solid)),
    ]
    decoders = {"jpeg": jpeg_decode, "jpeg420": jpeg_decode,
                "png": png_decode, "gif": gif_decode}
    t0 = time.perf_counter()
    for name, p in payloads:
        dec = decoders[name]
        assert dec(p) is not None  # the uncorrupted payload decodes
        for cut in (1, 7, len(p) // 3, len(p) - 2):
            dec(p[:cut])  # truncation: None or decode, never raise
        for _ in range(60):
            b = bytearray(p)
            for _ in range(rng.integers(1, 4)):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            dec(bytes(b))
    assert time.perf_counter() - t0 < 30.0  # no pathological blowup

"""Round-9 codec surface: PNG 16-bit + Adam7 interlace, GIF (real
LZW), y4m chroma subsampling, and the pure-numpy baseline JPEG codec.

Every lossless format is pinned by exact encode->decode round-trips
over adversarial shapes (1x1, odd sizes, sizes straddling interlace
pass boundaries); JPEG — the one lossy format — is pinned by its
exactness model (block-constant images at quality 75 round-trip
BIT-EXACTLY, see jpegcodec module docstring) plus bounded error and
structural checks on general images."""

import struct
import zlib

import numpy as np
import pytest

from scipi_spark.operators import multimodal as mm
from scipi_spark.operators.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
    quality_tables,
    _ZIGZAG,
)


# ---------------------------------------------------------------------------
# PNG: 16-bit depth and Adam7 interlace
# ---------------------------------------------------------------------------


def test_png_16bit_roundtrip_all_channels():
    rng = np.random.default_rng(5)
    for ch in (1, 2, 3, 4):
        a = rng.integers(0, 65536, (11, 7, ch), dtype=np.uint16)
        out = mm.decode_image(mm.encode_png(a))
        assert out.dtype == np.uint16
        assert (out == a).all()
    # byte order is big-endian per spec: a crafted two-pixel gray image
    raw = b"\x00" + struct.pack(">HH", 0x0102, 0xFFFE)
    png = (
        mm.PNG_SIGNATURE
        + mm._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0))
        + mm._png_chunk(b"IDAT", zlib.compress(raw))
        + mm._png_chunk(b"IEND", b"")
    )
    out = mm.decode_image(png)
    assert out.ravel().tolist() == [0x0102, 0xFFFE]


def test_png_adam7_roundtrip_shapes():
    """Adam7 passes have empty/degenerate cases for images < 8 px in
    either dimension — every shape class must round-trip, at 8 and 16
    bit, across all five scanline filters (the encoder cycles them)."""
    rng = np.random.default_rng(6)
    shapes = [(1, 1), (1, 9), (9, 1), (2, 2), (5, 3), (7, 13), (8, 8), (17, 16)]
    for ch in (1, 2, 3, 4):
        for h, w in shapes:
            a = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            assert (mm.decode_image(mm.encode_png(a, interlace=1)) == a).all()
    a16 = rng.integers(0, 65536, (13, 11, 3), dtype=np.uint16)
    assert (mm.decode_image(mm.encode_png(a16, interlace=1)) == a16).all()


def test_png_adam7_fixed_filters():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (10, 10, 3), dtype=np.uint8)
    for ft in range(5):
        png = mm.encode_png(a, filter_type=ft, interlace=1)
        assert (mm.decode_image(png) == a).all()


def test_png_interlaced_stream_differs_but_decodes_equal():
    a = np.arange(9 * 8 * 3, dtype=np.uint8).reshape(9, 8, 3)
    plain, inter = mm.encode_png(a), mm.encode_png(a, interlace=1)
    assert plain != inter  # genuinely different wire layout
    assert (mm.decode_image(plain) == mm.decode_image(inter)).all()


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


def test_gif_roundtrip_basic():
    rng = np.random.default_rng(8)
    for h, w, n in [(1, 1, 2), (7, 13, 5), (33, 17, 3), (64, 64, 256)]:
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        plte = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        out = mm.decode_image(mm.encode_gif(idx, plte))
        assert out.shape == (h, w, 3)
        assert (out == plte[idx]).all()


def test_gif_lzw_table_reset_and_width_growth():
    """A 200x200 random 256-colour image drives the LZW table through
    every code width up to 12 bits and past the 4095-entry reset — the
    encoder/decoder width-bump and Clear handshake must stay in
    lockstep the whole way."""
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 256, (200, 200), dtype=np.uint8)
    plte = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    assert (mm.decode_image(mm.encode_gif(idx, plte)) == plte[idx]).all()


def test_gif_kwkwk_case():
    # maximally repetitive input exercises the code==next_slot branch
    idx = np.tile(np.array([[0, 0, 1, 1]], dtype=np.uint8), (50, 100))
    plte = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    assert (mm.decode_image(mm.encode_gif(idx, plte)) == plte[idx]).all()


def test_gif_interlace():
    rng = np.random.default_rng(10)
    for h in (1, 2, 3, 7, 8, 9, 16):  # straddle all four pass starts
        idx = rng.integers(0, 16, (h, 11), dtype=np.uint8)
        plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        plain = mm.encode_gif(idx, plte)
        inter = mm.encode_gif(idx, plte, interlace=True)
        assert plain != inter
        assert (mm.decode_image(inter) == plte[idx]).all()


def test_gif_transparency_emits_alpha():
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    plte = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    out = mm.decode_image(mm.encode_gif(idx, plte, trans_index=1))
    assert out.shape == (2, 2, 4)
    assert (out[..., 3] == np.where(idx == 1, 0, 255)).all()
    assert (out[..., :3] == plte[idx]).all()


def test_gif_corrupt_streams_fail_loudly():
    idx = np.zeros((2, 2), dtype=np.uint8)
    plte = np.zeros((2, 3), dtype=np.uint8)
    payload = bytearray(mm.encode_gif(idx, plte))
    with pytest.raises(ValueError):
        mm._decode_gif(b"GIF89a" + b"\x00" * 7 + b"\x3b")  # no image block
    # truncated pixel data: flip the image dims up
    bad = payload.replace(
        struct.pack("<HHHH", 0, 0, 2, 2), struct.pack("<HHHH", 0, 0, 9, 9), 1
    )
    with pytest.raises(ValueError):
        mm._decode_gif(bytes(bad))


# ---------------------------------------------------------------------------
# y4m chroma subsampling
# ---------------------------------------------------------------------------


def _chroma_blocked_frames(sx, sy, n=2, h=6, w=8):
    f, y, x = np.indices((n, h, w))
    fr = np.empty((n, h, w, 3), np.uint8)
    fr[..., 0] = (3 * f + 7 * x + 13 * y) % 256
    fr[..., 1] = (5 * (x // sx) + 11 * (y // sy) + f) % 256
    fr[..., 2] = (9 * (x // sx) + 2 * (y // sy) + 4 * f) % 256
    return fr


def test_y4m_420_exact_when_chroma_block_constant():
    fr = _chroma_blocked_frames(2, 2)
    out, fps = mm.decode_y4m(mm.encode_y4m(fr, fps=10, colour="420jpeg"))
    assert fps == 10.0
    assert (out == fr).all()


def test_y4m_422_exact_when_chroma_block_constant():
    fr = _chroma_blocked_frames(2, 1)
    out, _ = mm.decode_y4m(mm.encode_y4m(fr, colour="422"))
    assert (out == fr).all()


def test_y4m_420_reconstructs_block_means():
    rng = np.random.default_rng(12)
    a = rng.integers(0, 256, (1, 4, 4, 3), dtype=np.uint8)
    out, _ = mm.decode_y4m(mm.encode_y4m(a, colour="420jpeg"))
    assert (out[..., 0] == a[..., 0]).all()  # luma untouched
    for c in (1, 2):
        blocks = a[0, :, :, c].astype(int).reshape(2, 2, 2, 2).sum(axis=(1, 3))
        exp = (blocks + 2) // 4  # round-half-up block mean
        assert (out[0, ::2, ::2, c] == exp).all()
        # replication upsampling: all four positions in a block agree
        assert (out[0, 1::2, 1::2, c] == exp).all()


def test_y4m_subsampling_needs_even_dims():
    fr = np.zeros((1, 3, 4, 3), np.uint8)
    with pytest.raises(ValueError):
        mm.encode_y4m(fr, colour="420jpeg")
    mm.encode_y4m(fr, colour="422")  # odd height fine for 422


# ---------------------------------------------------------------------------
# JPEG
# ---------------------------------------------------------------------------


def _block_constant_rgb(h=24, w=40, seed_mult=(3, 7), base=5):
    by, bx = np.indices((h // 8, w // 8))
    vals = ((base + seed_mult[0] * bx + seed_mult[1] * by) % 256).astype(
        np.uint8
    )
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    return np.stack([img] * 3, axis=-1)


def test_jpeg_zigzag_is_the_spec_order():
    # the first 10 entries of the T.81 zigzag scan, flat-indexed
    assert _ZIGZAG[:10].tolist() == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_jpeg_quality75_luma_dc_step_is_8():
    luma, chroma = quality_tables(75)
    assert luma[0, 0] == 8  # the exactness anchor (module docstring)
    assert quality_tables(100)[0].max() == 1 or quality_tables(100)[0].min() == 1


def test_jpeg_block_constant_bit_exact_all_subsamplings():
    rgb = _block_constant_rgb()
    for sub in ("444", "420", "422"):
        out = decode_jpeg(encode_jpeg(rgb, quality=75, subsampling=sub))
        assert out.shape == rgb.shape
        assert (out == rgb).all(), sub


def test_jpeg_grayscale_scan_bit_exact():
    img = _block_constant_rgb()[..., 0]
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert out.shape == (*img.shape, 1)
    assert (out[..., 0] == img).all()


def test_jpeg_non_multiple_of_8_dims():
    """Edge padding: a block-constant image whose dims are NOT multiples
    of 8 still decodes exactly in the covered region (padding is edge
    replication, so edge blocks stay constant)."""
    rgb = _block_constant_rgb()[:19, :27]
    out = decode_jpeg(encode_jpeg(rgb, quality=75, subsampling="444"))
    assert out.shape == rgb.shape
    assert (out == rgb).all()


def test_jpeg_restart_markers_roundtrip():
    rgb = _block_constant_rgb(16, 32)
    for sub in ("444", "420"):
        for ri in (1, 2, 3):
            out = decode_jpeg(
                encode_jpeg(rgb, 75, sub, restart_interval=ri)
            )
            assert (out == rgb).all(), (sub, ri)
    # restart on/off must agree bit-for-bit on lossy content too
    rng = np.random.default_rng(13)
    a = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    o1 = decode_jpeg(encode_jpeg(a, 90, "420"))
    o2 = decode_jpeg(encode_jpeg(a, 90, "420", restart_interval=2))
    assert (o1 == o2).all()


def test_jpeg_bounded_error_on_smooth_image():
    rng = np.random.default_rng(14)
    sm = rng.integers(0, 256, (37, 53, 3)).astype(float)
    for _ in range(4):
        sm = (
            sm
            + np.roll(sm, 1, 0)
            + np.roll(sm, 1, 1)
            + np.roll(sm, -1, 0)
            + np.roll(sm, -1, 1)
        ) / 5
    a = np.clip(sm, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(a, quality=95, subsampling="444"))
    err = np.abs(out.astype(int) - a.astype(int))
    assert err.max() <= 24 and err.mean() < 4.0


def test_jpeg_dispatches_from_decode_image():
    rgb = _block_constant_rgb(8, 16)
    assert (mm.decode_image(encode_jpeg(rgb, 75)) == rgb).all()


def test_jpeg_rejects_non_baseline():
    # lossless (SOF3) must refuse, not garble (SOF2 progressive is
    # supported since round 10)
    payload = bytearray(encode_jpeg(_block_constant_rgb(8, 8)))
    idx = bytes(payload).index(b"\xff\xc0")
    payload[idx + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00not-a-jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan


def test_jpeg_quality_monotonic_size():
    a = _block_constant_rgb()
    rng = np.random.default_rng(15)
    noisy = np.clip(
        a.astype(int) + rng.integers(-20, 21, a.shape), 0, 255
    ).astype(np.uint8)
    sizes = [len(encode_jpeg(noisy, q)) for q in (10, 50, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


# ---------------------------------------------------------------------------
# 16-bit PPM + resize across every decodable container
# ---------------------------------------------------------------------------


def test_ppm_16bit_roundtrip():
    rng = np.random.default_rng(16)
    a = rng.integers(0, 65536, (5, 7, 3), dtype=np.uint16)
    out = mm.decode_image(mm.encode_ppm(a))
    assert out.dtype == np.uint16 and (out == a).all()
    # spec: samples are big-endian — pin the wire order
    payload = mm.encode_ppm(np.array([[[0x0102, 0, 0]]], dtype=np.uint16))
    assert payload.endswith(b"\x01\x02\x00\x00\x00\x00")


def test_resize_payload_all_containers():
    """resize_payload must re-encode in the SAME container at the new
    dims; for lossless containers the pixels equal an independent
    nearest-neighbor resample of the decoded source."""
    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    expected = mm.resize_pixels(rgb, 8, 6)
    for enc, magic in [
        (mm.encode_ppm, b"P6"),
        (mm.encode_bmp, b"BM"),
        (mm.encode_png, mm.PNG_SIGNATURE[:2]),
    ]:
        out = mm.resize_payload(enc(rgb), 8, 6)
        assert out[: len(magic)] == magic
        assert (mm.decode_image(out) == expected).all(), magic
    # GIF: resampled in index space, palette + transparency preserved
    idx = rng.integers(0, 16, (12, 16), dtype=np.uint8)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    out = mm.resize_payload(mm.encode_gif(idx, plte, trans_index=3), 8, 6)
    assert out[:6] in (b"GIF87a", b"GIF89a")
    got = mm.decode_image(out)
    eidx = mm.resize_pixels(idx, 8, 6)
    assert (got[..., :3] == plte[eidx]).all()
    assert (got[..., 3] == np.where(eidx == 3, 0, 255)).all()
    # JPEG: lossy leg — container preserved, dims right, block-constant
    # content survives exactly at the aligned size
    blocks = _block_constant_rgb(16, 32)
    out = mm.resize_payload(encode_jpeg(blocks, 75), 16, 8)
    assert out[:2] == b"\xff\xd8"
    dec = decode_jpeg(out)
    assert dec.shape == (8, 16, 3)
    # unknown codec-compressed formats pass through untouched
    assert mm.resize_payload(b"\x00mp4fake", 4, 4) == b"\x00mp4fake"


# ---------------------------------------------------------------------------
# Animated GIF
# ---------------------------------------------------------------------------


def test_gif_animation_roundtrip_and_delays():
    rng = np.random.default_rng(18)
    fr = rng.integers(0, 16, (4, 6, 8), dtype=np.uint8)
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    payload = mm.encode_gif_animation(fr, plte, delays_cs=[4, 5, 6, 7])
    frames, delays = mm.decode_gif_frames(payload)
    assert delays == [4, 5, 6, 7]
    assert frames.shape == (4, 6, 8, 3)
    for f in range(4):
        assert (frames[f] == plte[fr[f]]).all(), f
    # interlaced animation decodes identically
    frames2, _ = mm.decode_gif_frames(
        mm.encode_gif_animation(fr, plte, interlace=True)
    )
    assert (frames2 == frames).all()


def test_gif_animation_transparent_composition():
    """Do-not-dispose composition: a later frame's transparent pixels
    must show the prior composed canvas, not background."""
    plte = np.array([[9, 9, 9], [50, 60, 70], [200, 10, 0]], dtype=np.uint8)
    f0 = np.full((4, 4), 1, dtype=np.uint8)
    f1 = np.zeros((4, 4), dtype=np.uint8)
    f1[0, 0] = 2  # everything else transparent (index 0)
    frames, _ = mm.decode_gif_frames(
        mm.encode_gif_animation(np.stack([f0, f1]), plte, trans_index=0)
    )
    assert (frames[0] == plte[1]).all()
    exp = np.tile(plte[1], (4, 4, 1)).astype(np.uint8)
    exp[0, 0] = plte[2]
    assert (frames[1] == exp).all()


def test_gif_single_frame_still_plain():
    """encode_gif (single frame) stays a plain GIF: no NETSCAPE loop
    block, decodes via both the single-image and animation paths."""
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 4
    plte = np.arange(12, dtype=np.uint8).reshape(4, 3)
    payload = mm.encode_gif(idx, plte)
    assert b"NETSCAPE" not in payload
    assert (mm.decode_image(payload) == plte[idx]).all()
    frames, delays = mm.decode_gif_frames(payload)
    assert frames.shape[0] == 1 and delays == [0]


def test_resize_payload_video():
    """y4m resize: every frame nearest-neighbor resampled, fps kept,
    output re-encoded C444 (lossless for the resampled planes) even
    when the source was chroma-subsampled."""
    f, y, x = np.indices((3, 6, 8))
    fr = np.empty((3, 6, 8, 3), np.uint8)
    fr[..., 0] = (3 * f + 7 * x + 13 * y) % 256
    fr[..., 1] = (5 * (x // 2) + 11 * (y // 2) + f) % 256
    fr[..., 2] = (9 * (x // 2) + 2 * (y // 2) + 4 * f) % 256
    for colour in ("444", "420jpeg"):
        out = mm.resize_payload(mm.encode_y4m(fr, fps=12, colour=colour), 4, 4)
        assert out[:9] == b"YUV4MPEG2" and b"C444" in out[: out.index(b"\n")]
        got, fps = mm.decode_y4m(out)
        assert fps == 12.0 and got.shape == (3, 4, 4, 3)
        # chroma is block-constant, so subsampled decode == original and
        # the resize must equal an independent per-frame resample
        exp = np.stack([mm.resize_pixels(fr[i], 4, 4) for i in range(3)])
        assert (got == exp).all()


def test_gif_animation_local_palettes():
    """Per-frame Local Colour Tables: frame 1 decodes through the LCT,
    frame 0 through the global table — the decode branch real animated
    GIFs with disjoint per-frame colour sets exercise."""
    rng = np.random.default_rng(19)
    fr = rng.integers(0, 8, (2, 5, 7), dtype=np.uint8)
    gct = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    lct = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    payload = mm.encode_gif_animation(fr, gct, local_palettes=[None, lct])
    frames, _ = mm.decode_gif_frames(payload)
    assert (frames[0] == gct[fr[0]]).all()
    assert (frames[1] == lct[fr[1]]).all()
    # index validity is checked against the palette actually in scope
    with pytest.raises(ValueError):
        mm.encode_gif_animation(
            np.full((1, 2, 2), 9, dtype=np.uint8), gct,
            local_palettes=[np.zeros((4, 3), dtype=np.uint8)],
        )


def test_jpeg_truncated_streams_raise_valueerror():
    """Round-10 (r9 advice): truncation anywhere — inside the marker
    loop, a segment body, or the entropy-coded data — surfaces as the
    ValueError contract the other decoders follow, never a raw
    IndexError/struct.error from the bit reader."""
    full = encode_jpeg(_block_constant_rgb(16, 16), 75)
    for cut in (3, 6, 21, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])


def test_jpeg_progressive_roundtrip_matches_baseline_bit_for_bit():
    """Round-10: progressive (SOF2) is a lossless reordering of the
    entropy layer — for identical quantized coefficients the decoded
    pixels must EQUAL the baseline decode exactly. Random noise makes
    the scan script exercise EOB runs > 1, the luma band split, DC
    refinement, and AC successive-approximation correction bits."""
    from scipi_spark.operators.jpegcodec import encode_jpeg_progressive

    rng = np.random.default_rng(23)
    noisy = rng.integers(0, 256, (41, 53, 3)).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(noisy, 75, subsampling="444"))
    prog = decode_jpeg(encode_jpeg_progressive(noisy, 75))
    assert (base == prog).all()

    gray = rng.integers(0, 256, (17, 29)).astype(np.uint8)
    bg = decode_jpeg(encode_jpeg(gray, 75))
    pg = decode_jpeg(encode_jpeg_progressive(gray, 75))
    assert bg.shape == pg.shape == (17, 29, 1)
    assert (bg == pg).all()


def test_jpeg_progressive_block_constant_bit_exact():
    """Block-constant fixtures decode bit-exactly through the
    progressive path (same zero-loss argument as baseline), and the
    stream really is SOF2 with the full 8-scan script."""
    from scipi_spark.operators.jpegcodec import encode_jpeg_progressive

    rgb = _block_constant_rgb(16, 24)
    payload = encode_jpeg_progressive(rgb, 75)
    # walk the marker stream (raw byte counts false-positive on segment
    # bodies that happen to contain FF DA): expect SOF2 and the full
    # 9-scan script — DC, 4x AC first (luma split 1-5/6-63 + 2 chroma),
    # DC refine, 3x AC refine
    markers, pos = [], 2
    while pos + 4 < len(payload):
        assert payload[pos] == 0xFF
        m = payload[pos + 1]
        markers.append(m)
        if m == 0xDA:  # skip entropy: find next unstuffed non-RST marker
            pos += 2 + struct.unpack_from(">H", payload, pos + 2)[0]
            while not (
                payload[pos] == 0xFF
                and payload[pos + 1] not in (0x00,)
                and not (0xD0 <= payload[pos + 1] <= 0xD7)
            ):
                pos += 1
        else:
            pos += 2 + struct.unpack_from(">H", payload, pos + 2)[0]
    assert 0xC2 in markers and 0xC0 not in markers
    assert markers.count(0xDA) == 9
    assert (decode_jpeg(payload) == rgb).all()
    assert (mm.decode_image(payload) == rgb).all()  # magic dispatch


def test_jpeg_progressive_truncation_raises():
    from scipi_spark.operators.jpegcodec import encode_jpeg_progressive

    full = encode_jpeg_progressive(_block_constant_rgb(16, 16), 75)
    for cut in (len(full) // 3, len(full) // 2, len(full) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])

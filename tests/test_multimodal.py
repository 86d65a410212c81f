"""Multimodal plumbing (operators/multimodal.py): binary payload
attachment, Arrow batch iteration, feature schema, decode stub."""

from __future__ import annotations

import hashlib

import pytest

from amazonredshift_blueprints_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image,
    extract_features,
)
from amazonredshift_blueprints_spark.session import load_table


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_attach_and_extract_features(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(20)
    mm = attach_binary_payload(d, "doc_id", "text")
    row = mm.collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.mime == "text/plain" and row.meta.n_bytes == len(row.payload)

    feats = {r.doc_id: r for r in extract_features(mm).collect()}
    src = {r.doc_id: r.text.encode() for r in d.collect()}
    assert set(feats) == set(src)
    for doc_id, payload in src.items():
        f = feats[doc_id]
        assert f.n_bytes == len(payload)
        assert f.payload_md5 == hashlib.md5(payload).hexdigest()
        assert f.head_hex == payload[:8].hex()
        assert f.feature == hashlib.sha256(payload).hexdigest()[:16]


def test_resize_payload_decimation(spark, sf_dir):
    import hashlib
    import math

    from amazonredshift_blueprints_spark.operators.multimodal import (
        attach_binary_payload,
        resize_payload,
    )
    from amazonredshift_blueprints_spark.session import load_table

    d = load_table(spark, sf_dir, "documents").limit(50)
    src = {r["doc_id"]: r["text"] for r in d.collect()}
    got = resize_payload(
        attach_binary_payload(d, "doc_id", "text"), target_bytes=100
    ).collect()
    assert len(got) == len(src)
    for r in got:
        b = src[r["doc_id"]].encode()
        if len(b) > 100:
            k = math.ceil(len(b) / 100)
            want = b[::k]
        else:
            want = b
        assert r["orig_bytes"] == len(b)
        assert r["resized_bytes"] == len(want) <= 100
        assert bytes(r["resized"]) == want
        assert r["resized_md5"] == hashlib.md5(want).hexdigest()


def test_sample_frames_covers_every_stride(spark):
    from amazonredshift_blueprints_spark.operators.multimodal import sample_frames

    # 300-byte payload, 64-byte frames -> frames 0..4; stride 4 keeps 0 and 4,
    # frame 4 being the 44-byte tail.
    payload = bytes(range(256)) + bytes(44)
    df = spark.createDataFrame([(1, payload)], "doc_id: long, payload: binary")
    rows = sorted(sample_frames(df).collect(), key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["n_frame_bytes"]) for r in rows] == [(0, 64), (4, 44)]


def test_ppm_roundtrip_and_comment_handling():
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(px)) == px).all()
    # header comments are legal PPM; the parser must skip them
    with_comment = b"P6\n# a comment\n3 5\n255\n" + px.tobytes()
    assert (decode_image(with_comment) == px).all()
    # compressed formats: honest failure without pillow
    import pytest as _pytest
    with _pytest.raises((NotImplementedError, Exception)):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")


def test_image_channel_stats_decodes_real_pixels(spark):
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        image_channel_stats,
        synthesize_ppm_images,
    )

    ids = spark.createDataFrame([(7,), (123,)], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in image_channel_stats(synthesize_ppm_images(ids, "doc_id")).collect()
    }
    for i in (7, 123):
        r_idx = np.arange(8)[:, None]
        c_idx = np.arange(8)[None, :]
        for ch, col in enumerate(["sum_r", "sum_g", "sum_b"]):
            want = int(((i * 31 + r_idx * 7 + c_idx * 3 + ch) % 256).sum())
            assert got[i][col] == want, (i, col)
        assert got[i]["n_pixels"] == 64 and got[i]["width"] == 8


def test_ppm_roundtrip_property():
    """decode(encode(px)) == px for arbitrary image shapes and pixel
    values — the lossless contract of the uncompressed codec."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    @settings(max_examples=100, deadline=None)
    def roundtrip(h, w, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        out = decode_image(encode_ppm(px))
        assert out.shape == (h, w, 3) and (out == px).all()

    roundtrip()


def test_decode_truncated_ppm_raises_not_hangs():
    """Malformed P6 payloads must raise ValueError — a corrupt image in a
    100 TB batch must fail the row, not hang the executor in the header
    scan (the unbounded-loop bug class)."""
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import decode_image

    # header cut off mid-token: no whitespace ever terminates the scan
    with pytest.raises(ValueError):
        decode_image(b"P6\n12")
    # comment never terminated by newline
    with pytest.raises(ValueError):
        decode_image(b"P6\n# unterminated comment")
    # full header but pixel buffer short of h*w*3
    with pytest.raises(ValueError, match="truncated PPM payload"):
        decode_image(b"P6\n4 4\n255\n" + b"\x00" * 10)
    # empty-dimension token (double separator at end of buffer)
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4 ")


def test_png_roundtrip_property():
    """decode_png(encode_png(px)) == px for arbitrary shapes/values and
    BOTH filter modes; 'cycle' mode guarantees every PNG filter type
    (None/Sub/Up/Average/Paeth) is crossed whenever h >= 5."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["none", "cycle"]),
    )
    @settings(max_examples=100, deadline=None)
    def roundtrip(h, w, seed, mode):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
        b = encode_png(px, filter_mode=mode)
        assert b[:8] == b"\x89PNG\r\n\x1a\n"
        out = decode_png(b)
        assert out.shape == (h, w, 3) and (out == px).all()
        assert (decode_image(b) == px).all()  # dispatch via signature

    roundtrip()


def test_png_corrupt_payloads_raise_not_hang():
    """Truncated/corrupt PNGs raise ValueError (decode CRC-checks every
    chunk) — a bad image in a 100 TB batch fails the row, never hangs
    or silently returns garbage pixels."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    b = encode_png(px)
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"\x89PNG\r\n\x1a\x00" + b[8:])
    with pytest.raises(ValueError, match="cut short|partial chunk"):
        decode_png(b[:20])
    # flip one byte inside the IDAT payload: CRC must catch it
    idat_pos = b.index(b"IDAT") + 4
    flipped = b[:idat_pos] + bytes([b[idat_pos] ^ 0xFF]) + b[idat_pos + 1 :]
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(flipped)
    with pytest.raises(ValueError, match="missing IEND"):
        decode_png(b[: b.index(b"IEND") - 4])
    # interlaced / non-RGB variants are refused, not mis-decoded
    import struct
    import zlib

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    # RGBA decodes since r15; a 16-bit PALETTE claim is the invalid
    # variant now (PNG spec: palette images are 1/2/4/8 only)
    bad_ihdr = struct.pack(">IIBBBBB", 8, 8, 16, 3, 0, 0, 0)
    pal16 = b[:8] + chunk(b"IHDR", bad_ihdr) + b[b.index(b"IDAT") - 4 :]
    with pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(pal16)
    # IDAT that inflates to the wrong scanline length
    short = b[:8] + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)
    ) + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="scanline bytes"):
        decode_png(short)


def test_png_channel_stats_matches_formula(spark):
    """c81's operator path at unit scale: synthesize PNGs from the
    closed-form pixels, decode through image_channel_stats, compare
    the sums against the formula computed directly in numpy."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        image_channel_stats,
        synthesize_png_images,
    )

    ids = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in image_channel_stats(
            synthesize_png_images(ids, "doc_id", side=8)
        ).collect()
    }
    r = np.arange(8)[:, None, None]
    c = np.arange(8)[None, :, None]
    ch = np.arange(3)[None, None, :]
    for i in range(6):
        px = (i * 31 + r * 7 + c * 3 + ch) % 256
        sums = px.reshape(-1, 3).sum(axis=0)
        row = got[i]
        assert (row["width"], row["height"], row["n_pixels"]) == (8, 8, 64)
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(
            int(s) for s in sums
        )


def test_png_variant_matrix_roundtrip_property():
    """filter x interlace x color-kind x depth matrix (VERDICT r9 #6):
    decode(encode(px)) is exact for truecolor, grayscale, and palette
    (depths 1/2/4/8), each sequential and Adam7-interlaced, under both
    filter modes — including ragged sizes where Adam7 passes go empty
    (h or w < 8) and 1x1 images."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_gray,
        encode_png_palette,
    )

    @given(
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=1, max_value=13),
        st.integers(min_value=0, max_value=2**32 - 1),
        st.sampled_from(["none", "cycle"]),
        st.booleans(),
        st.sampled_from(["rgb", "gray", 1, 2, 4, 8]),
    )
    @settings(max_examples=120, deadline=None)
    def roundtrip(h, w, seed, mode, interlace, kind):
        rng = np.random.default_rng(seed)
        if kind == "rgb":
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            b = encode_png(px, filter_mode=mode, interlace=interlace)
            want = px
        elif kind == "gray":
            g = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
            b = encode_png_gray(g, filter_mode=mode, interlace=interlace)
            want = np.repeat(g[:, :, None], 3, axis=2)
        else:
            n = 1 << kind
            pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
            idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
            b = encode_png_palette(
                idx, pal, depth=kind, filter_mode=mode, interlace=interlace
            )
            want = pal[idx]
        out = decode_png(b)
        assert out.shape == (h, w, 3) and (out == want).all()

    roundtrip()


def test_png_variant_corrupt_paths_raise():
    """Palette/interlace-specific failure paths: PLTE missing, index
    beyond the palette, truncated Adam7 stream, trailing bytes — all
    ValueError, never garbage pixels."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = np.zeros((4, 4), dtype=np.uint8)
    b = encode_png_palette(idx, pal, depth=8)
    # strip the PLTE chunk
    plte_start = b.index(b"PLTE") - 4
    plte_len = 12 + struct.unpack(">I", b[plte_start : plte_start + 4])[0]
    with pytest.raises(ValueError, match="without PLTE"):
        decode_png(b[:plte_start] + b[plte_start + plte_len :])
    # index 3 with a 2-entry palette: beyond-PLTE indices must raise
    small = encode_png_palette(
        np.full((2, 2), 1, dtype=np.uint8), pal[:2], depth=8
    )
    idat_start = small.index(b"IDAT") - 4
    idat_len = 12 + struct.unpack(">I", small[idat_start : idat_start + 4])[0]
    evil_rows = zlib.compress(bytes([0, 3, 3, 0, 3, 3]))
    evil = (
        small[:idat_start] + chunk(b"IDAT", evil_rows)
        + small[idat_start + idat_len :]
    )
    with pytest.raises(ValueError, match="beyond PLTE"):
        decode_png(evil)
    # Adam7 stream cut short mid-pass
    px = np.arange(9 * 9 * 3, dtype=np.uint8).reshape(9, 9, 3) % 256
    bi = encode_png(px, interlace=True)
    idat_start = bi.index(b"IDAT") - 4
    idat_len = 12 + struct.unpack(">I", bi[idat_start : idat_start + 4])[0]
    raw = zlib.decompress(
        bi[idat_start + 8 : idat_start + 8 + idat_len - 12]
    )
    cut = (
        bi[:idat_start] + chunk(b"IDAT", zlib.compress(raw[: len(raw) // 2]))
        + bi[idat_start + idat_len :]
    )
    with pytest.raises(ValueError, match="scanline bytes"):
        decode_png(cut)
    # trailing bytes after the last pass
    fat = (
        bi[:idat_start] + chunk(b"IDAT", zlib.compress(raw + b"\x00\x01"))
        + bi[idat_start + idat_len :]
    )
    with pytest.raises(ValueError, match="trailing bytes"):
        decode_png(fat)


def test_png_variant_channel_stats_matches_formula(spark):
    """c83's operator path at unit scale: all four encode variants
    (sequential/Adam7 x truecolor/palette, side=9) decode to the same
    closed-form channel sums."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        image_channel_stats,
        synthesize_png_variant_images,
    )

    ids = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in image_channel_stats(
            synthesize_png_variant_images(ids, "doc_id", side=9)
        ).collect()
    }
    r = np.arange(9)[:, None, None]
    c = np.arange(9)[None, :, None]
    ch = np.arange(3)[None, None, :]
    for i in range(8):  # covers every variant twice
        px = (i * 31 + r * 7 + c * 3 + ch) % 256
        sums = px.reshape(-1, 3).sum(axis=0)
        row = got[i]
        assert (row["width"], row["height"], row["n_pixels"]) == (9, 9, 81)
        assert (row["sum_r"], row["sum_g"], row["sum_b"]) == tuple(
            int(s) for s in sums
        )


def test_wav_codec_roundtrip_and_failures():
    """RIFF/WAVE PCM16 codec: exact round-trip, metadata-chunk
    skipping, and loud refusal of mangled sizes, compressed format
    tags, and non-16-bit depths."""
    import struct

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.arange(64)[:, None]
    ch = np.arange(2)[None, :]
    arr = ((7 * 37 + s * 11 + ch * 5) % 65536 - 32768).astype("<i2")
    p = encode_wav(arr)
    rate, nch, out = decode_wav(p)
    assert rate == 8000 and nch == 2 and (out == arr).all()
    # a LIST metadata chunk before fmt must be skipped by declared size
    listc = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = b"WAVE" + listc + p[12:]
    assert (decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)[2] == arr).all()
    # mangled RIFF size
    bad = bytearray(p)
    bad[4] ^= 0xFF
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav(bytes(bad))
    # compressed format tag (e.g. 85 = MP3) refuses with the swap-in named
    mp3 = bytearray(p)
    mp3[20] = 85
    with pytest.raises(ValueError, match="compressed WAVE"):
        decode_wav(bytes(mp3))
    # odd-sized data (half a frame) refuses
    frag = encode_wav(arr)[:-2]
    trimmed = bytearray(frag)
    struct.pack_into("<I", trimmed, 4, len(frag) - 8)
    datasize = struct.unpack("<I", p[44:48])[0]
    struct.pack_into("<I", trimmed, 44, datasize - 2)
    with pytest.raises(ValueError):
        decode_wav(bytes(trimmed))


def test_lzw_roundtrip_stress():
    """200 random index streams (incl. multi-bump dictionary growth)
    plus repetitive KwKwK-heavy streams must round-trip bit-exactly."""
    import random

    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    rng = random.Random(7)
    nprng = np.random.RandomState(7)
    for _ in range(200):
        n = rng.randint(1, 5000)
        mcs = rng.choice([2, 3, 4, 8])
        idx = nprng.randint(0, 1 << mcs, size=n).tolist()
        assert list(_lzw_decompress(_lzw_compress(idx, mcs), mcs)) == idx
    for mcs in (2, 4):
        idx = [0] * 3000 + [1, 0, 1, 0, 1] * 200
        assert list(_lzw_decompress(_lzw_compress(idx, mcs), mcs)) == idx


def test_gif_decode_matches_palette_and_refusals():
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _gif_palette,
        decode_gif,
        encode_gif,
    )

    y, x = np.arange(8)[:, None], np.arange(8)[None, :]
    img = ((5 * 7 + y * 5 + x * 3) % 16).astype("uint8")
    arr = decode_gif(encode_gif(img, n_colors=16))
    pal = np.frombuffer(_gif_palette(16), dtype=np.uint8).reshape(16, 3)
    assert (arr == pal[img]).all()
    # truncated stream must refuse, not return garbage
    payload = bytearray(encode_gif(img, n_colors=16))
    try:
        decode_gif(bytes(payload[:-20]))
        raise AssertionError("truncated GIF decoded")
    except (ValueError, IndexError):
        pass


def test_bmp_roundtrip_truecolor_both_orientations():
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for w, h in [(6, 5), (4, 3), (1, 1), (7, 2)]:  # padded and unpadded rows
        img = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for topdown in (False, True):
            out = decode_bmp(encode_bmp(img, topdown=topdown))
            assert out.shape == (h, w, 3)
            assert (out == img).all(), (w, h, topdown)


def test_bmp_roundtrip_palette_and_refusals():
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp_palette,
    )

    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, size=(5, 6)).astype(np.uint8)
    for topdown in (False, True):
        out = decode_bmp(encode_bmp_palette(idx, pal, topdown=topdown))
        assert (out == pal[idx]).all()
    # refusal paths raise by name instead of emitting garbage
    good = bytearray(encode_bmp_palette(idx, pal))
    bad_bits = bytearray(good)
    bad_bits[28] = 16  # biBitCount
    with pytest.raises(NotImplementedError, match="8/24-bit"):
        decode_bmp(bytes(bad_bits))
    bad_comp = bytearray(good)
    bad_comp[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError, match="BI_RGB"):
        decode_bmp(bytes(bad_comp))
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(good[2:]))


def test_qoi_roundtrip_stress_and_refusals():
    """300 random/run/gradient images round-trip bit-exactly through
    the QOI encoder+decoder (covering RUN/INDEX/DIFF/LUMA/RGB and the
    62-run split); malformed streams refuse loudly."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_qoi,
        encode_qoi,
    )

    rng = np.random.default_rng(7)
    for trial in range(300):
        h, w = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if trial % 4 == 0:
            img[:, :] = img[0, 0]          # pure run (may exceed 62)
        elif trial % 4 == 1:
            img = (
                np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3) % 256
            ).astype(np.uint8)             # gradient (DIFF/LUMA heavy)
        back = decode_qoi(encode_qoi(img))
        assert (back == img).all(), trial
    # a 200-pixel constant image forces multiple 62-length run chunks
    big = np.full((10, 20, 3), 42, dtype=np.uint8)
    assert (decode_qoi(encode_qoi(big)) == big).all()
    with pytest.raises(ValueError, match="bad magic"):
        decode_qoi(b"nope" + b"\x00" * 20)
    good = encode_qoi(np.zeros((2, 2, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="end marker"):
        decode_qoi(good[:-1])
    with pytest.raises(ValueError, match="truncated"):
        decode_qoi(good[:14] + good[-8:])  # ops removed, marker kept


def test_tga_roundtrip_stress_and_refusals():
    """TGA encode->decode is the identity for 24-bit type 2 and RLE
    type 10 in both row orders, across randomized shapes including
    >128-pixel rows (the packet-length cap) and degenerate 1x1;
    unsupported types refuse by name; the 2.0 footer is present (the
    format's only signature — decode_image dispatches on the TAIL)."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        decode_tga,
        encode_tga,
    )

    rng = np.random.RandomState(7)
    for _ in range(20):
        h, w = rng.randint(1, 7), rng.randint(1, 140)
        img = (
            rng.randint(0, 3, (h, w, 1)).repeat(3, axis=2).astype(np.uint8)
            * 40
        )
        for rle in (False, True):
            for td in (False, True):
                payload = encode_tga(img, rle=rle, topdown=td)
                assert payload.endswith(b"TRUEVISION-XFILE.\x00")
                assert (decode_tga(payload) == img).all()
                # tail-footer dispatch through the generic entry point
                assert (decode_image(payload) == img).all()
    # color-mapped / non-24-bit types refuse by name
    good = bytearray(encode_tga(np.zeros((1, 1, 3), np.uint8)))
    bad_type = bytes(good[:2]) + b"\x01" + bytes(good[3:])
    with pytest.raises(NotImplementedError, match="truecolor"):
        decode_tga(bad_type)
    bad_bits = bytes(good[:16]) + b"\x10" + bytes(good[17:])
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_tga(bad_bits)


# ---------------------------------------------------------------------------
# baseline JPEG (r14)
# ---------------------------------------------------------------------------


def test_jpeg_block_constant_even_tiles_round_trip_exactly():
    """The c211 exactness contract: 8x8-aligned constant EVEN tiles
    have a single nonzero DCT coefficient whose Annex-K quantization
    is exact, so the lossy codec round-trips them bit-identically —
    including non-multiple-of-8 crops (edge-replicate padding keeps
    cropped tiles block-constant)."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(7)
    tiles = (2 * rng.integers(0, 128, size=(3, 4))).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)
    crop = img[:19, :27]  # ragged crop: padding path
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(crop)), crop)


def test_jpeg_gradient_fidelity_and_noise_shape():
    """Non-constant content is lossy but high-fidelity: a smooth
    gradient must reconstruct above 40 dB PSNR under the Annex-K
    luminance table; arbitrary noise must decode to the right shape."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    y, x = np.mgrid[0:64, 0:48]
    img = ((x * 2 + y) % 256).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img))
    err = dec.astype(np.int32) - img.astype(np.int32)
    mse = float((err**2).mean())
    psnr = 10 * np.log10(255**2 / mse)
    assert psnr > 40, psnr
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(41, 33)).astype(np.uint8)
    assert decode_jpeg_gray(encode_jpeg_gray(noise)).shape == (41, 33)


def test_jpeg_bytes_decode_identically_in_jvm_imageio(spark):
    """Cross-validation against an INDEPENDENT decoder: the JVM's
    javax.imageio (present in every Spark container) must decode our
    encoder's bytes to exactly the pixels our own decoder produces —
    proving the emitted JFIF is spec-standard, not merely
    self-consistent."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg_gray,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(3)
    tiles = (2 * rng.integers(0, 128, size=(2, 3))).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    enc = encode_jpeg_gray(img)
    jvm = spark._jvm
    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(enc))
    )
    raster = bimg.getRaster()
    jarr = np.array(
        [
            [raster.getSample(x, y, 0) for x in range(bimg.getWidth())]
            for y in range(bimg.getHeight())
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(jarr, img)  # exact contract holds externally
    assert np.array_equal(jarr, decode_jpeg_gray(enc))


def test_jpeg_refusals_and_corruption():
    """Lossless/arithmetic SOFs, non-integer sampling grids, CMYK and
    truncated entropy data refuse/raise with the reason — honest
    subset, never a silent mis-decode (restart intervals and
    progressive decode for real since r15; see
    test_jpeg_restart_intervals / test_jpeg_progressive*)."""
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )
    import numpy as np

    img = np.full((16, 16), 100, dtype=np.uint8)
    enc = bytearray(encode_jpeg_gray(img))
    sof = enc.find(b"\xff\xc0")
    assert sof > 0
    # lossless sequential (SOF3) still refuses by name
    lossless = bytes(enc[:sof]) + b"\xff\xc3" + bytes(enc[sof + 2 :])
    with pytest.raises(NotImplementedError, match="SOF0"):
        decode_jpeg_gray(lossless)
    # color decodes since r14 — but the gray-contract face refuses it
    rgb = np.full((16, 16, 3), (10, 200, 30), dtype=np.uint8)
    cenc = bytearray(encode_jpeg_color(rgb))
    with pytest.raises(ValueError, match="color JPEG"):
        decode_jpeg_gray(bytes(cenc))
    sofc = cenc.find(b"\xff\xc0")
    # 4:2:0/4:2:2 DECODE for real since r15 — the refusal left is a
    # non-integer upsampling ratio (Y 2x2 with a 3x1 sibling: 3 % 2)
    sub = bytearray(cenc)
    sub[sofc + 11] = 0x22  # Y -> 2x2
    sub[sofc + 14] = 0x31  # Cb -> 3x1: maxh=3 not divisible by Y's 2
    with pytest.raises(NotImplementedError, match="non-integer"):
        decode_jpeg(bytes(sub))
    # 4-component DECODES for real since r16 (Adobe CMYK/YCCK) — but
    # claiming 4 components over a 3-entry SOF is now caught as a
    # truncated segment, and a 5-component claim still refuses by name
    four = bytearray(cenc)
    four[sofc + 9] = 4  # ncomp -> CMYK-style, but only 3 SOF entries
    with pytest.raises(ValueError, match="truncated SOF"):
        decode_jpeg(bytes(four))
    five = bytearray(cenc)
    five[sofc + 9] = 5
    with pytest.raises(NotImplementedError, match="5-component"):
        decode_jpeg(bytes(five))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"NOTAJPEG")
    # header-level truncation (into the DHT tables) raises, not crashes
    with pytest.raises(ValueError, match="corrupt JPEG"):
        decode_jpeg_gray(bytes(enc[:-20]))
    # scan-level truncation: a noisy image has long entropy data
    rng = np.random.default_rng(5)
    noisy = encode_jpeg_gray(
        rng.integers(0, 256, size=(32, 32)).astype(np.uint8)
    )
    with pytest.raises(ValueError, match="exhausted|corrupt"):
        decode_jpeg_gray(noisy[:-30])
    # decode_image dispatches FFD8 to the JPEG decoder
    assert decode_image(bytes(enc)).shape == (16, 16)


def test_jpeg_color_roundtrip_exact_on_gray_tiles_and_psnr():
    """Color (3-component 4:4:4) baseline JPEG: gray-valued even tiles
    (R=G=B) give Y=v and Cb=Cr=128, so chroma blocks quantize to
    exactly zero and the whole color pipeline round-trips
    bit-identically — the oracle contract; real color content is
    PSNR-bounded on the encoder's own round trip."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(7)
    tiles = (2 * rng.integers(0, 128, size=(3, 2))).astype(np.uint8)
    g = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:23, :13]
    rgb = np.stack([g, g, g], axis=-1)
    assert np.array_equal(decode_jpeg(encode_jpeg_color(rgb)), rgb)
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack(
        [(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_color(smooth)).astype(float)
    mse = np.mean((dec - smooth.astype(float)) ** 2)
    assert 10 * np.log10(255.0**2 / mse) > 30.0  # measured ~46 dB


def test_jpeg_subsampled_roundtrip_and_shapes():
    """Chroma-subsampled encode+decode (r15): bit-exact on gray-valued
    even tiles under BOTH 4:2:0 and 4:2:2 (zero centered chroma is
    invariant under box-average downsampling and replication
    upsampling); PSNR-bounded on smooth color content; shape contract
    holds on sizes that are multiples of neither 8 nor the 16-pixel
    MCU grid (edge-replicate padding to the MCU grid, cropped back)."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(13)
    tiles = (2 * rng.integers(0, 128, size=(3, 4))).astype(np.uint8)
    g = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:22, :29]
    rgb = np.stack([g, g, g], axis=-1)
    for sampling in ("420", "422", "444"):
        assert np.array_equal(
            decode_jpeg(encode_jpeg_color(rgb, sampling=sampling)), rgb
        ), sampling
    yy, xx = np.mgrid[0:41, 0:53]
    smooth = np.stack(
        [(yy * 2) % 256, (xx * 2) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)
    for sampling in ("420", "422"):
        dec = decode_jpeg(
            encode_jpeg_color(smooth, sampling=sampling)
        )
        assert dec.shape == smooth.shape, sampling
        mse = np.mean((dec.astype(float) - smooth.astype(float)) ** 2)
        # chroma carries real signal here, so subsampling costs a few
        # dB vs 4:4:4's ~46 — measured ~43.3 (420) / ~44.1 (422)
        assert 10 * np.log10(255.0**2 / mse) > 30.0, sampling
    noise = rng.integers(0, 256, size=(17, 19, 3)).astype(np.uint8)
    for sampling in ("420", "422"):
        assert (
            decode_jpeg(encode_jpeg_color(noise, sampling=sampling)).shape
            == noise.shape
        ), sampling
    import pytest

    with pytest.raises(ValueError, match="sampling must be"):
        encode_jpeg_color(rgb, sampling="411")


def test_jpeg_color_bytes_decode_identically_in_jvm_imageio(spark):
    """Cross-validation of the COLOR bitstream against the JVM's
    independent javax.imageio decoder: on the exactness class
    (gray-valued even tiles) both decoders must return the original
    pixels bit-for-bit — proving the 3-component interleaved scan,
    dual quant tables, and chroma Huffman tables are spec-standard;
    on a solid non-gray color both must land within quantization
    rounding (the JVM's integer IDCT diverges from the float IDCT
    only on high-frequency content, a pre-existing property also
    visible on grayscale gradients)."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
    )

    jvm = spark._jvm

    def jvm_decode(enc):
        bimg = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(enc))
        )
        h, w = bimg.getHeight(), bimg.getWidth()
        raster = bimg.getRaster()
        return np.array(
            [
                [
                    [raster.getSample(x, y, c) for c in range(3)]
                    for x in range(w)
                ]
                for y in range(h)
            ],
            dtype=np.uint8,
        )

    rng = np.random.default_rng(11)
    tiles = (2 * rng.integers(0, 128, size=(2, 2))).astype(np.uint8)
    g = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:15, :13]
    rgb = np.stack([g, g, g], axis=-1)
    enc = encode_jpeg_color(rgb)
    assert np.array_equal(jvm_decode(enc), rgb)
    assert np.array_equal(decode_jpeg(enc), rgb)
    solid = np.full((16, 16, 3), (200, 40, 90), dtype=np.uint8)
    enc2 = encode_jpeg_color(solid)
    j = jvm_decode(enc2).astype(int)
    o = decode_jpeg(enc2).astype(int)
    assert np.abs(j - o).max() <= 2
    assert np.abs(o - solid.astype(int)).max() <= 2
    # r15 — SUBSAMPLED bitstreams (4:2:0/4:2:2) cross-validate the
    # same way: bit-for-bit on the exactness class (gray-valued even
    # tiles — zero centered chroma survives box-averaging and
    # replication upsampling exactly), within quantization rounding
    # on solid colors (constant chroma, so any upsampler agrees)
    for sampling in ("420", "422"):
        enc3 = encode_jpeg_color(rgb, sampling=sampling)
        assert np.array_equal(jvm_decode(enc3), rgb), sampling
        assert np.array_equal(decode_jpeg(enc3), rgb), sampling
        enc4 = encode_jpeg_color(solid, sampling=sampling)
        j = jvm_decode(enc4).astype(int)
        o = decode_jpeg(enc4).astype(int)
        assert np.abs(j - o).max() <= 2, sampling
        assert np.abs(o - solid.astype(int)).max() <= 2, sampling


def test_jpeg_restart_intervals():
    """DRI/RSTn for real (r15): restarts change only the bitstream
    segmentation — decoded pixels are bit-identical on the exactness
    class for every (sampling, interval) combination; the marker
    sequence cycles RST0..RST7; restart_interval=0 keeps the pre-r15
    bytes byte-identical; a stream whose markers disagree with its
    own DRI declaration raises instead of silently mis-decoding."""
    import re

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    rng = np.random.default_rng(19)
    tiles = (2 * rng.integers(0, 128, size=(4, 3))).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:31, :22]
    # gray: 12 blocks -> ri=1 emits 11 restarts, cycling RST0..RST7
    for ri in (1, 2, 4, 100):
        enc = encode_jpeg_gray(img, restart_interval=ri)
        assert b"\xff\xdd" in enc
        assert np.array_equal(decode_jpeg(enc), img), ri
    enc1 = encode_jpeg_gray(img, restart_interval=1)
    scan = enc1[enc1.find(b"\xff\xda") :]
    rsts = [m[0] - 0xD0 for m in re.findall(rb"\xff([\xd0-\xd7])", scan)]
    assert rsts == [m % 8 for m in range(12 - 1)]  # full mod-8 cycle
    # default path byte-identical to the no-restart encoder
    assert encode_jpeg_gray(img) == encode_jpeg_gray(img, restart_interval=0)
    assert b"\xff\xdd" not in encode_jpeg_gray(img)
    # color: every sampling x interval round-trips exactly on gray tiles
    rgb = np.stack([img, img, img], axis=-1)
    for sampling in ("444", "422", "420"):
        for ri in (1, 2, 3):
            enc = encode_jpeg_color(
                rgb, sampling=sampling, restart_interval=ri
            )
            assert np.array_equal(decode_jpeg(enc), rgb), (sampling, ri)
    # noisy content still decodes to the right shape (predictor resets
    # exercise real DC discontinuities, not just constant tiles)
    noise = rng.integers(0, 256, size=(33, 29, 3)).astype(np.uint8)
    enc = encode_jpeg_color(noise, sampling="420", restart_interval=2)
    assert decode_jpeg(enc).shape == noise.shape
    # stripping the DRI declaration leaves bare RSTn mid-scan -> raise
    enc = encode_jpeg_gray(img, restart_interval=1)
    i = enc.find(b"\xff\xdd")
    with pytest.raises(ValueError, match="marker inside entropy"):
        decode_jpeg(enc[:i] + enc[i + 6 :])
    # an out-of-sequence restart marker raises by name
    bad = bytearray(encode_jpeg_gray(img, restart_interval=1))
    j = bad.find(b"\xff\xd0", bad.find(b"\xff\xda"))
    bad[j + 1] = 0xD5
    with pytest.raises(ValueError, match="restart marker RST0"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg_gray(img, restart_interval=-1)
    with pytest.raises(ValueError, match="restart_interval"):
        encode_jpeg_color(rgb, restart_interval=1 << 16)


def _jvm_decode_jpeg(jvm, enc, bands=None):
    """Decode image bytes with the JVM's independent javax.imageio
    decoder → int64 array: (h, w) for bands=1, (h, w, 3) for
    bands=3, or (h, w, numBands) when bands is None — the one shared
    raster-reading helper for every cross-validation test."""
    import numpy as np

    bimg = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(enc))
    )
    h, w = bimg.getHeight(), bimg.getWidth()
    raster = bimg.getRaster()
    if bands == 1:
        return np.array(
            [
                [raster.getSample(x, y, 0) for x in range(w)]
                for y in range(h)
            ],
            dtype=np.int64,
        )
    nb = 3 if bands == 3 else raster.getNumBands()
    return np.array(
        [
            [
                [raster.getSample(x, y, c) for c in range(nb)]
                for x in range(w)
            ]
            for y in range(h)
        ],
        dtype=np.int64,
    )


def test_jpeg_restart_bytes_decode_identically_in_jvm_imageio(spark):
    """Cross-validation of DRI-bearing bitstreams against the JVM's
    independent javax.imageio decoder: on the exactness class both
    decoders return the original pixels bit-for-bit — proving the
    restart markers, their mod-8 sequence, the byte-aligned padding
    and the DC predictor resets are spec-standard interchange, not a
    private dialect."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    jvm = spark._jvm

    def jvm_decode(enc, bands):
        return _jvm_decode_jpeg(jvm, enc, bands)

    rng = np.random.default_rng(23)
    tiles = (2 * rng.integers(0, 128, size=(3, 3))).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:23, :22]
    for ri in (1, 2):
        enc = encode_jpeg_gray(img, restart_interval=ri)
        assert np.array_equal(jvm_decode(enc, 1), img), ri
        assert np.array_equal(decode_jpeg_gray(enc), img), ri
    rgb = np.stack([img, img, img], axis=-1)
    for sampling in ("444", "420"):
        enc = encode_jpeg_color(rgb, sampling=sampling, restart_interval=1)
        assert np.array_equal(jvm_decode(enc, 3), rgb), sampling
        assert np.array_equal(decode_jpeg(enc), rgb), sampling


def test_jpeg_zigzag_is_spec_order():
    """Regression pin for the r15 zigzag fix: the table must be the
    T.81 Figure 5 order (odd anti-diagonals down-left, even ones
    up-right), not its transpose — the transposed table survived
    fourteen rounds because every internal round trip is
    self-consistent and every cross-validated test image (constant
    tiles, solid colors) is per-block transpose-invariant; real
    content interchanged with an external codec came out per-block
    transposed."""
    from amazonredshift_blueprints_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
    )

    assert _JPEG_ZIGZAG[:10] == [
        (0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
        (0, 2), (0, 3), (1, 2), (2, 1), (3, 0),
    ]
    assert _JPEG_ZIGZAG[-4:] == [(5, 7), (6, 7), (7, 6), (7, 7)]
    assert len(set(_JPEG_ZIGZAG)) == 64


def test_jpeg_baseline_noise_interchange_with_jvm(spark):
    """The class the transposed zigzag broke: NOISE (not block-
    transpose-invariant) written by our baseline encoder must decode
    in the JVM's independent javax.imageio to within integer-IDCT
    rounding of our own decode — grayscale pins the coefficient
    pipeline exactly (same upsampling: none)."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    jvm = spark._jvm

    def jvm_decode_gray(enc):
        return _jvm_decode_jpeg(jvm, enc, 1)

    rng = np.random.default_rng(47)
    for hw in [(16, 16), (17, 23)]:
        g = rng.integers(0, 256, size=hw).astype(np.uint8)
        enc = encode_jpeg_gray(g)
        ours = decode_jpeg(enc).astype(np.int64)
        theirs = jvm_decode_gray(enc)
        assert np.abs(ours - theirs).max() <= 1, hw


def test_jpeg_progressive_roundtrip_and_equivalence():
    """Progressive (SOF2) for real (r15): the spectral-selection
    encoder and the four-scan-kind decoder. The exactness class
    round-trips bit-identically through the multi-scan pipeline for
    every sampling; on NOISE the progressive decode must equal the
    baseline decode of the same image bit-for-bit (identical
    quantized coefficients, identical reconstruction) — a coefficient
    -level equivalence no pixel tolerance can fake."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(31)
    tiles = (2 * rng.integers(0, 128, size=(4, 3))).astype(np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))[:31, :22]
    enc = encode_jpeg_progressive(img)
    assert b"\xff\xc2" in enc and enc.count(b"\xff\xda") == 2
    assert np.array_equal(decode_jpeg(enc), img)
    rgb = np.stack([img, img, img], axis=-1)
    for s in ("444", "422", "420"):
        enc = encode_jpeg_progressive(rgb, sampling=s)
        assert enc.count(b"\xff\xda") == 4  # DC + three AC scans
        assert np.array_equal(decode_jpeg(enc), rgb), s
    for hw in [(8, 8), (17, 23), (9, 40)]:
        g = rng.integers(0, 256, size=hw).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(g)),
            decode_jpeg(encode_jpeg_gray(g)),
        ), hw
        c3 = rng.integers(0, 256, size=(*hw, 3)).astype(np.uint8)
        for s in ("444", "422", "420"):
            assert np.array_equal(
                decode_jpeg(encode_jpeg_progressive(c3, sampling=s)),
                decode_jpeg(encode_jpeg_color(c3, sampling=s)),
            ), (hw, s)
    with pytest.raises(ValueError, match="sampling must be"):
        encode_jpeg_progressive(rgb, sampling="411")
    with pytest.raises(ValueError, match="grayscale or HxWx3"):
        encode_jpeg_progressive(rgb[..., :2])


def test_jpeg_progressive_interchange_with_jvm(spark):
    """Two-sided external validation of the progressive pipeline
    against javax.imageio: (a) the JVM's progressive WRITER (the
    libjpeg default script — DC/AC successive-approximation
    refinement scans, EOB runs, per-scan Huffman tables) produces
    streams our decoder must match the original on exactly for flat
    tiles and within integer-IDCT rounding for grayscale noise; (b)
    our progressive bytes must decode in the JVM bit-for-bit the
    same as our baseline bytes of the same image — same
    coefficients, same JVM pipeline, so any bitstream deviation
    would show."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    jvm = spark._jvm

    def jvm_write_prog(arr):
        h, w = arr.shape[:2]
        gray = arr.ndim == 2
        t = (
            jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            if gray
            else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        bimg = jvm.java.awt.image.BufferedImage(w, h, t)
        if gray:
            raster = bimg.getRaster()
            for y in range(h):
                for x in range(w):
                    raster.setSample(x, y, 0, int(arr[y, x]))
        else:
            for y in range(h):
                for x in range(w):
                    r, g, b = map(int, arr[y, x])
                    bimg.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpeg"
        ).next()
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        p = writer.getDefaultWriteParam()
        p.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), p)
        ios.flush()
        return bytes(baos.toByteArray())

    def jvm_decode(enc, bands):
        return _jvm_decode_jpeg(jvm, enc, bands)

    rng = np.random.default_rng(23)
    # (a) decode JVM-written progressive streams
    tiles = (2 * rng.integers(0, 128, size=(2, 3))).astype(np.uint8)
    flat = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    enc = jvm_write_prog(np.stack([flat] * 3, axis=-1))
    assert b"\xff\xc2" in enc and enc.count(b"\xff\xda") >= 6
    got = decode_jpeg(enc)
    assert np.array_equal(
        got, np.stack([flat] * 3, axis=-1)
    )  # flat tiles: exact through 10 refinement scans
    for hw in [(16, 16), (17, 23)]:
        g = rng.integers(0, 256, size=hw).astype(np.uint8)
        enc = jvm_write_prog(g)
        ours = decode_jpeg(enc).astype(np.int64)
        theirs = jvm_decode(enc, 1)
        assert np.abs(ours - theirs).max() <= 1, hw
    # (b) JVM decodes our progressive == our baseline, bit-for-bit
    g = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
    assert np.array_equal(
        jvm_decode(encode_jpeg_progressive(g), 1),
        jvm_decode(encode_jpeg_gray(g), 1),
    )
    c3 = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    for s in ("444", "420"):
        assert np.array_equal(
            jvm_decode(encode_jpeg_progressive(c3, sampling=s), 3),
            jvm_decode(encode_jpeg_color(c3, sampling=s), 3),
        ), s


def test_jpeg_progressive_with_restart_intervals(spark):
    """Progressive scans can carry restart intervals too (T.81 E.2.4
    applies per scan: every N MCUs in the interleaved DC scan, every
    N data units in non-interleaved scans, RST index restarting per
    scan, DC predictors and the EOB run reset at each boundary). Our
    decode of a DRI-segmented progressive stream must equal the
    plain progressive decode bit-for-bit, and javax.imageio must
    agree with our baseline bytes of the same image — exercising the
    decoder's progressive restart path with real content."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    jvm = spark._jvm

    def jvm_decode(enc, bands):
        return _jvm_decode_jpeg(jvm, enc, bands)

    rng = np.random.default_rng(53)
    g = rng.integers(0, 256, size=(17, 23)).astype(np.uint8)
    for ri in (1, 2, 3):
        enc = encode_jpeg_progressive(g, restart_interval=ri)
        assert b"\xff\xdd" in enc
        assert np.array_equal(
            decode_jpeg(enc), decode_jpeg(encode_jpeg_progressive(g))
        ), ri
        assert np.array_equal(
            jvm_decode(enc, 1), jvm_decode(encode_jpeg_gray(g), 1)
        ), ri
    c3 = rng.integers(0, 256, size=(17, 23, 3)).astype(np.uint8)
    for s in ("444", "420"):
        enc = encode_jpeg_progressive(c3, sampling=s, restart_interval=2)
        assert np.array_equal(
            decode_jpeg(enc),
            decode_jpeg(encode_jpeg_color(c3, sampling=s)),
        ), s
        assert np.array_equal(
            jvm_decode(enc, 3),
            jvm_decode(encode_jpeg_color(c3, sampling=s), 3),
        ), s
    # restart_interval=0 keeps the bytes byte-identical
    assert encode_jpeg_progressive(g) == encode_jpeg_progressive(
        g, restart_interval=0
    )


def test_g711_codecs_bit_exact_against_audioop():
    """G.711 mu-law and A-law (r15): our vectorized numpy codecs must
    be bit-exact against CPython's independent C reference (audioop)
    over the ENTIRE int16 domain for encode and all 256 code bytes
    for decode — including A-law's -pcm-1 negative magnitudes and
    mu-law's double zero (0x7F, the one non-idempotent codebook
    byte)."""
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        # stdlib audioop is the reference on <= 3.12; removed in 3.13
        # (PEP 594) — skip the pin there rather than erroring
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_alaw,
        decode_mulaw,
        encode_alaw,
        encode_mulaw,
    )

    allb = bytes(range(256))
    assert np.array_equal(
        decode_mulaw(allb), np.frombuffer(audioop.ulaw2lin(allb, 2), "<i2")
    )
    assert np.array_equal(
        decode_alaw(allb), np.frombuffer(audioop.alaw2lin(allb, 2), "<i2")
    )
    allpcm = np.arange(-32768, 32768, dtype=np.int16)
    assert encode_mulaw(allpcm) == audioop.lin2ulaw(allpcm.tobytes(), 2)
    assert encode_alaw(allpcm) == audioop.lin2alaw(allpcm.tobytes(), 2)
    # codebook idempotence: A-law exact on all 256 bytes; mu-law exact
    # on 255 of them (0x7F is negative zero: decodes to 0, re-encodes
    # as the canonical positive zero 0xFF)
    assert encode_alaw(decode_alaw(allb)) == allb
    re_mu = encode_mulaw(decode_mulaw(allb))
    assert [b for b in range(256) if re_mu[b] != b] == [0x7F]
    assert re_mu[0x7F] == 0xFF


def test_g711_stats_operator(spark):
    """The c217 surface end-to-end on a local frame: synthesized
    payloads decode through the law named per row and the stats match
    a direct numpy replay."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_alaw,
        decode_mulaw,
        g711_audio_stats,
        synthesize_g711_audio,
    )

    ids = spark.createDataFrame([(0,), (1,), (37,)], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in g711_audio_stats(
            synthesize_g711_audio(ids, "doc_id")
        ).collect()
    }
    for i in (0, 1, 37):
        k = np.arange(96 + i % 32, dtype=np.int64)
        payload = ((i * 7 + k * 13) % 256).astype(np.uint8).tobytes()
        dec = decode_mulaw if i % 2 == 0 else decode_alaw
        pcm = dec(payload).astype(np.int64)
        r = got[i]
        assert r["law"] == ("ulaw" if i % 2 == 0 else "alaw")
        assert r["n_samples"] == pcm.size
        assert r["sum_pcm"] == int(pcm.sum())
        assert r["sum_abs"] == int(np.abs(pcm).sum())
        assert (r["min_pcm"], r["max_pcm"]) == (int(pcm.min()), int(pcm.max()))


def test_adpcm_codec_bit_exact_against_audioop():
    """IMA/DVI ADPCM (r15): our stateful codec must be bit-exact
    against CPython's independent C reference (audioop) — decode on
    arbitrary code bytes (all 16 codes reachable), encode on random
    and ramp PCM, and the packed high-nibble-first framing."""
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    rng = np.random.default_rng(61)
    # decode parity on random code bytes (covers every nibble value)
    for n in (1, 7, 64, 333):
        payload = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
        ref = np.frombuffer(audioop.adpcm2lin(payload, 2, None)[0], "<i2")
        assert np.array_equal(decode_adpcm(payload), ref), n
    # encode parity on random, ramp and railing PCM (even lengths:
    # audioop DISCARDS a trailing half-byte on odd sample counts,
    # ours pads the low nibble with zero bits and keeps the sample)
    for pcm in (
        rng.integers(-32768, 32768, size=500).astype(np.int16),
        np.linspace(-32768, 32767, 300).astype(np.int16),
        np.repeat([32767, -32768], 50).astype(np.int16),
    ):
        ref, _ = audioop.lin2adpcm(pcm.tobytes(), 2, None)
        assert encode_adpcm(pcm) == ref
    odd = rng.integers(-32768, 32768, size=11).astype(np.int16)
    enc = encode_adpcm(odd)
    assert len(enc) == 6  # 11 codes + 1 pad nibble
    assert enc[:5] == audioop.lin2adpcm(odd[:10].tobytes(), 2, None)[0]
    # roundtrip: decode(encode(x)) tracks x within the step size at
    # the rail regime (ADPCM is lossy but stable)
    tone = (3000 * np.sin(np.arange(400) / 7.0)).astype(np.int16)
    back = decode_adpcm(encode_adpcm(tone))[: tone.size].astype(np.int64)
    assert np.abs(back - tone.astype(np.int64)).max() < 2000


def test_adpcm_stats_operator(spark):
    """The c218 surface end-to-end on a local frame: synthesized
    payloads decode statefully and the stats match both a direct
    replay of our codec and audioop."""
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        audioop = pytest.importorskip("audioop")

    from amazonredshift_blueprints_spark.operators.multimodal import (
        adpcm_audio_stats,
        synthesize_adpcm_audio,
    )

    ids = spark.createDataFrame([(0,), (1,), (123,)], ["doc_id"])
    got = {
        r["doc_id"]: r
        for r in adpcm_audio_stats(
            synthesize_adpcm_audio(ids, "doc_id")
        ).collect()
    }
    for i in (0, 1, 123):
        n = 64 + 2 * (i % 16)
        codes = [((i % 97) * (k + 1) + k * k) % 16 for k in range(n)]
        payload = bytes(
            (codes[j] << 4) | codes[j + 1] for j in range(0, n, 2)
        )
        pcm = np.frombuffer(
            audioop.adpcm2lin(payload, 2, None)[0], "<i2"
        ).astype(np.int64)
        r = got[i]
        assert r["n_samples"] == n
        assert r["sum_pcm"] == int(pcm.sum())
        assert r["sum_abs"] == int(np.abs(pcm).sum())
        assert (r["min_pcm"], r["max_pcm"]) == (int(pcm.min()), int(pcm.max()))


def test_png_deep_roundtrip_and_jvm_interchange(spark):
    """16-bit and alpha PNG (r15): every (channels, depth, interlace,
    filter-mode) combination round-trips losslessly through our
    encoder/decoder AND decodes bit-for-bit in the JVM's independent
    javax.imageio PNG reader; uint8 RGB bytes stay byte-identical to
    the 8-bit-only encoder's output contract (IHDR depth 8, type 2);
    hand-built gray+alpha and 16-bit grayscale payloads decode with
    gray replicated to RGB and alpha kept."""
    import struct
    import zlib

    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    jvm = spark._jvm

    def jvm_decode_png(enc):
        return _jvm_decode_jpeg(jvm, enc)

    rng = np.random.default_rng(73)
    for ch in (3, 4):
        for dt, hi in ((np.uint8, 256), (np.uint16, 65536)):
            for il in (False, True):
                px = rng.integers(0, hi, size=(9, 7, ch)).astype(dt)
                enc = encode_png(px, interlace=il)
                out = decode_png(enc)
                assert out.dtype == dt and np.array_equal(out, px)
                assert np.array_equal(
                    jvm_decode_png(enc), px.astype(np.int64)
                ), (ch, dt, il)
    # uint8 RGB keeps the original header contract
    enc = encode_png(rng.integers(0, 256, size=(4, 5, 3)).astype(np.uint8))
    assert struct.unpack(">IIBBBBB", enc[16:29]) == (5, 4, 8, 2, 0, 0, 0)
    # non-native-endian uint16 input encodes as 16-bit, not truncated
    be = (np.arange(12, dtype=">u2").reshape(2, 2, 3) * 999 % 65536).astype(
        ">u2"
    )
    assert np.array_equal(decode_png(encode_png(be)), be.astype(np.uint16))

    def build(w, h, depth, ctype, rows):
        scan = bytearray()
        for r in rows:
            scan.append(0)
            scan.extend(r)
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _png_chunk(b"IEND", b"")
        )

    # gray+alpha 8-bit: gray replicated, alpha kept last
    out = decode_png(
        build(2, 2, 8, 4, [bytes([10, 200, 20, 210]),
                           bytes([30, 220, 40, 230])])
    )
    assert out.shape == (2, 2, 4) and out[0, 0].tolist() == [10, 10, 10, 200]
    # 16-bit grayscale: big-endian pairs
    out = decode_png(build(2, 1, 16, 0, [bytes([0x12, 0x34, 0xAB, 0xCD])]))
    assert out.dtype == np.uint16 and out[0, 1, 0] == 0xABCD
    # 16-bit gray+alpha
    out = decode_png(build(1, 1, 16, 4, [bytes([1, 2, 3, 4])]))
    assert out[0, 0].tolist() == [0x0102, 0x0102, 0x0102, 0x0304]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="PNG encoder takes"):
        encode_png(rng.integers(0, 256, size=(4, 5, 2)).astype(np.uint8))


def test_tiff_roundtrip_refusals_and_jvm_interchange(spark):
    """Baseline TIFF (r15): every (channels, depth, byte-order)
    combination round-trips losslessly, decodes bit-for-bit in the
    JVM's independent com.sun.imageio TIFF plugin, and we decode the
    JVM writer's files right back; compressed/tiled/planar claims
    and corrupt structures refuse by name."""
    import struct

    import numpy as np
    import pytest as _pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    jvm = spark._jvm

    def jvm_decode(enc):
        return _jvm_decode_jpeg(jvm, enc)

    rng = np.random.default_rng(83)
    for shape, dt, hi in [
        ((6, 7), np.uint8, 256),
        ((6, 7, 3), np.uint8, 256),
        ((6, 7, 4), np.uint8, 256),
        ((6, 7), np.uint16, 65536),
        ((6, 7, 3), np.uint16, 65536),
        ((6, 7, 4), np.uint16, 65536),
        ((1, 1), np.uint8, 256),
        ((13, 2, 3), np.uint16, 65536),
    ]:
        for be in (False, True):
            px = rng.integers(0, hi, size=shape).astype(dt)
            enc = encode_tiff(px, big_endian=be)
            out = decode_tiff(enc)
            assert out.dtype == px.dtype and np.array_equal(out, px)
            want = (px if px.ndim == 3 else px[:, :, None]).astype(np.int64)
            got = jvm_decode(enc)
            assert got.shape == want.shape and np.array_equal(got, want), (
                shape, dt, be,
            )
    # the JVM TIFF writer's own files decode back exactly
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff"
    ).next()
    arr = rng.integers(0, 256, size=(9, 5, 3)).astype(np.uint8)
    bimg = jvm.java.awt.image.BufferedImage(
        5, 9, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(9):
        for x in range(5):
            r, g, b = map(int, arr[y, x])
            bimg.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(bimg)
    ios.flush()
    assert np.array_equal(decode_tiff(bytes(baos.toByteArray())), arr)
    # refusals and corruption
    enc = bytearray(encode_tiff(arr))
    with _pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + bytes(enc[2:]))
    comp_off = bytes(enc).index(struct.pack("<HHI", 259, 3, 1))
    jpg = bytearray(enc)
    jpg[comp_off + 8] = 7  # Compression=7 (JPEG-in-TIFF): still refused
    with _pytest.raises(NotImplementedError, match="compressed TIFF"):
        decode_tiff(bytes(jpg))
    with _pytest.raises(ValueError, match="truncated IFD|past EOF|strip"):
        decode_tiff(bytes(enc[:30]))
    with _pytest.raises(ValueError, match="truncated header"):
        decode_tiff(b"II*\x00")
    # WhiteIsZero (photometric=0) decodes with inverted polarity (r16
    # lifted the refusal): sample 9 reads back as 255-9
    wiz = bytearray(encode_tiff(np.full((3, 3), 9, dtype=np.uint8)))
    pm_off = bytes(wiz).index(struct.pack("<HHI", 262, 3, 1))
    wiz[pm_off + 8] = 0
    assert (decode_tiff(bytes(wiz)) == 246).all()
    # ...and unknown photometrics still refuse by name
    wiz[pm_off + 8] = 5  # separated (CMYK)
    with _pytest.raises(NotImplementedError, match="Photometric"):
        decode_tiff(bytes(wiz))
    # non-native-endian uint16 input must encode as 16-bit, not
    # silently truncate (dtype == np.uint16 is False for '>u2')
    be = (np.arange(12, dtype=">u2").reshape(2, 2, 3) * 999 % 65536).astype(
        ">u2"
    )
    assert np.array_equal(decode_tiff(encode_tiff(be)), be.astype(np.uint16))


# ---------------------------------------------------------------------------
# r16: advisor hardening — empty audio frames, truncated progressive SOS,
# wide-integer encoder refusals.
# ---------------------------------------------------------------------------


def test_audio_stats_handle_empty_payloads(spark):
    """An empty G.711 / ADPCM frame yields an honest n_samples=0 row
    with NULL stats, not numpy's opaque zero-size-reduction error
    (r15 advisor: synthesized inputs are never empty, real ingest
    rows can be)."""
    from amazonredshift_blueprints_spark.operators.multimodal import (
        adpcm_audio_stats,
        g711_audio_stats,
    )

    g = spark.createDataFrame(
        [(1, "ulaw", bytearray(b"")), (2, "alaw", bytearray(b"\x55"))],
        "doc_id long, law string, payload binary",
    )
    rows = {r["doc_id"]: r for r in g711_audio_stats(g).collect()}
    assert rows[1]["n_samples"] == 0
    assert rows[1]["sum_pcm"] is None and rows[1]["min_pcm"] is None
    assert rows[2]["n_samples"] == 1 and rows[2]["sum_pcm"] is not None

    a = spark.createDataFrame(
        [(1, bytearray(b"")), (2, bytearray(b"\x12"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in adpcm_audio_stats(a).collect()}
    assert rows[1]["n_samples"] == 0 and rows[1]["max_pcm"] is None
    assert rows[2]["n_samples"] == 2


def test_progressive_sos_truncation_raises_named_error():
    """A progressive stream whose SOS segment is shorter than its
    declared component list raises the module's 'corrupt JPEG: ...'
    contract, not a bare IndexError (r15 advisor)."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    tile = np.full((8, 8), 128, dtype=np.uint8)
    data = bytearray(encode_jpeg_progressive(tile))
    i = data.find(b"\xff\xda")
    assert i > 0
    # shrink the SOS segment: keep the marker, declare ns but cut the
    # spectral-selection tail (ln covers only the ns byte + 1 pair)
    ln = 2 + 1 + 2  # length field + ns + one (cs, td/ta) pair, no ss/se/ah/al
    truncated = bytes(data[: i + 2]) + ln.to_bytes(2, "big") + bytes(
        data[i + 4 : i + 4 + 3]
    )
    with pytest.raises(ValueError, match="corrupt JPEG: truncated SOS"):
        decode_jpeg(truncated)


def test_encoders_refuse_wide_integers_instead_of_truncating():
    """encode_png / encode_tiff / encode_png_gray refuse int inputs
    outside 0..255 and non-integer dtypes by name instead of the
    silent mod-256 astype truncation (r15 advisor); in-range int
    literals and uint8/uint16 keep working."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        decode_tiff,
        encode_png,
        encode_png_gray,
        encode_tiff,
    )

    wide = np.full((2, 2, 3), 300, dtype=np.int32)
    for enc in (encode_png, encode_tiff):
        with pytest.raises(ValueError, match="would truncate"):
            enc(wide)
    with pytest.raises(ValueError, match="would truncate"):
        encode_png_gray(np.full((2, 2), -1, dtype=np.int64))
    with pytest.raises(ValueError, match="not dtype float64"):
        encode_png(np.zeros((2, 2, 3), dtype=np.float64))
    # in-range plain-int literals still encode (back-compat path)
    small = [[[0, 128, 255]] * 2] * 2
    assert decode_png(encode_png(small)).shape == (2, 2, 3)
    assert decode_tiff(encode_tiff(small))[0].shape[0] == 2
    # uint16 still selects 16-bit output
    deep = np.full((2, 2, 3), 40000, dtype=np.uint16)
    assert decode_png(encode_png(deep)).dtype == np.uint16


def test_tiff_packbits_lzw_jvm_interchange(spark):
    """TIFF PackBits + LZW (r16): our compressed files decode
    bit-for-bit in the JVM's independent com.sun.imageio TIFF plugin
    (including LZW with Predictor=2 horizontal differencing), and the
    JVM writer's PackBits/LZW files decode right back — the same
    both-directions contract as c220's uncompressed baseline."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    jvm = spark._jvm
    rng = np.random.default_rng(163)

    # ours -> JVM: noise and run-heavy content, both byte orders
    imgs = [
        rng.integers(0, 256, size=(6, 7, 3)).astype(np.uint8),
        np.repeat(rng.integers(0, 256, (5, 4, 3)).astype(np.uint8), 9, axis=1),
        rng.integers(0, 256, size=(9, 5)).astype(np.uint8),
        # big enough to force LZW width growth in one strip
        rng.integers(0, 4, size=(40, 60, 3)).astype(np.uint8) * 80,
    ]
    for px in imgs:
        for be in (False, True):
            for kw in (
                {"compression": "packbits"},
                {"compression": "lzw"},
                {"compression": "lzw", "predictor": True},
            ):
                enc = encode_tiff(px, big_endian=be, **kw)
                assert np.array_equal(decode_tiff(enc), px), kw
                want = (px if px.ndim == 3 else px[:, :, None]).astype(
                    np.int64
                )
                got = _jvm_decode_jpeg(jvm, enc)
                assert got.shape == want.shape and np.array_equal(
                    got, want
                ), (px.shape, be, kw)

    # JVM -> ours: its own PackBits, LZW and Deflate writers
    for ctype in ("PackBits", "LZW", "Deflate"):
        arr = rng.integers(0, 256, size=(11, 6, 3)).astype(np.uint8)
        bimg = jvm.java.awt.image.BufferedImage(
            6, 11, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        for y in range(11):
            for x in range(6):
                r, g, b = map(int, arr[y, x])
                bimg.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "tiff"
        ).next()
        p = writer.getDefaultWriteParam()
        p.setCompressionMode(
            jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT
        )
        p.setCompressionType(ctype)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(bimg, None, None), p)
        ios.flush()
        payload = bytes(baos.toByteArray())
        assert np.array_equal(decode_tiff(payload), arr), ctype

    # Deflate round-trips too (zlib strips, Compression=8), and the
    # JVM reads ours / we read the JVM's "Deflate"-compressed files
    for kw in ({"compression": "deflate"},
               {"compression": "deflate", "predictor": True}):
        px = imgs[3]
        enc = encode_tiff(px, **kw)
        assert np.array_equal(decode_tiff(enc), px)
        got = _jvm_decode_jpeg(jvm, enc)
        assert np.array_equal(got, px.astype(np.int64)), kw

    # refusals move up the ladder: old-style JPEG still refuses by name
    import struct

    import pytest as _pytest

    enc = bytearray(encode_tiff(imgs[0]))
    comp_off = bytes(enc).index(struct.pack("<HHI", 259, 3, 1))
    enc[comp_off + 8] = 6  # Compression=6 (old-style JPEG)
    with _pytest.raises(NotImplementedError, match="Compression=6"):
        decode_tiff(bytes(enc))


def test_gif89a_animation_compositing_and_jvm_interchange(spark):
    """GIF89a animation (r16): disposal 0/1/2/3 compositing matches a
    hand-computed reference; GCE transparency leaves the canvas
    through; the JVM's independent javax.imageio GIF reader sees the
    same raw frames and GCE metadata in our files; and the JVM
    writer's own multi-frame sequences decode back."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _gif_palette,
        decode_gif_animation,
        encode_gif89a,
    )

    pal = np.frombuffer(_gif_palette(16), dtype=np.uint8).reshape(16, 3)

    # --- disposal semantics against a hand-built reference ---
    f0 = np.full((4, 5), 3, dtype=np.uint8)
    f1 = np.full((4, 5), 7, dtype=np.uint8)
    f1[1, 1] = 9  # the transparent index of frame 1
    f2 = np.full((4, 5), 2, dtype=np.uint8)
    enc = encode_gif89a(
        [f0, f1, f2],
        delays=[10, 20, 30],
        transparents=[None, 9, None],
        disposals=[1, 3, 2],
        loop=5,
    )
    canvases, meta, loop = decode_gif_animation(enc)
    assert loop == 5
    assert [m["delay"] for m in meta] == [10, 20, 30]
    assert [m["disposal"] for m in meta] == [1, 3, 2]
    assert [m["transparent"] for m in meta] == [None, 9, None]
    assert meta[1]["n_transparent"] == 1
    # frame 1 paints 7 everywhere except (1,1), which shows frame 0's 3
    assert tuple(canvases[1][1, 1, :3]) == tuple(pal[3])
    assert tuple(canvases[1][0, 0, :3]) == tuple(pal[7])
    # frame 1's disposal is 3 (restore previous): frame 2 draws over
    # the RESTORED frame-0 canvas, fully opaque 2s
    assert (canvases[2][:, :, :3] == pal[2]).all()

    # disposal 2 restores the rect to transparent for the NEXT frame
    g0 = np.full((3, 3), 1, dtype=np.uint8)
    g1 = np.full((3, 3), 4, dtype=np.uint8)
    g1[0, 0] = 6
    enc2 = encode_gif89a(
        [g0, g1],
        transparents=[None, 6],
        disposals=[2, 1],
    )
    cvs2, meta2, _ = decode_gif_animation(enc2)
    # frame 0 painted 1s; its disposal-2 wipes the screen, so frame
    # 1's transparent pixel (0,0) shows TRANSPARENT, not frame 0's 1
    assert cvs2[1][0, 0, 3] == 0
    assert tuple(cvs2[1][1, 1, :3]) == tuple(pal[4])

    # --- JVM reads our animation: raw frames + GCE metadata ---
    jvm = spark._jvm
    rng = np.random.default_rng(29)
    frames = [
        rng.integers(0, 16, size=(6, 7)).astype(np.uint8) for _ in range(3)
    ]
    transparents = [None, 5, 11]
    delays = [7, 13, 21]
    enc3 = encode_gif89a(
        frames,
        delays=delays,
        transparents=transparents,
        disposals=[1, 1, 1],
        loop=2,
    )
    stream = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(enc3))
    )
    reader = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
        "gif"
    ).next()
    reader.setInput(stream)
    assert reader.getNumImages(True) == 3
    for k, (fr, tr) in enumerate(zip(frames, transparents)):
        bimg = reader.read(k)
        for y in range(6):
            for x in range(7):
                argb = bimg.getRGB(x, y)
                a = (argb >> 24) & 0xFF
                if tr is not None and fr[y, x] == tr:
                    assert a == 0, (k, y, x)
                else:
                    got = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
                    assert got == tuple(pal[fr[y, x]]), (k, y, x)
        node = reader.getImageMetadata(k).getAsTree(
            "javax_imageio_gif_image_1.0"
        )
        child = node.getFirstChild()
        gce = None
        while child is not None:
            if child.getNodeName() == "GraphicControlExtension":
                gce = child
            child = child.getNextSibling()
        assert gce is not None
        assert int(gce.getAttribute("delayTime")) == delays[k]
        flag = gce.getAttribute("transparentColorFlag") == "TRUE"
        assert flag == (tr is not None)
        if tr is not None:
            assert int(gce.getAttribute("transparentColorIndex")) == tr

    # --- JVM writes a multi-frame sequence; we decode it back ---
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "gif"
    ).next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(None)
    arrs = [rng.integers(0, 256, size=(5, 4, 3)).astype(np.uint8)
            for _ in range(2)]
    for arr in arrs:
        bimg = jvm.java.awt.image.BufferedImage(
            4, 5, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        for y in range(5):
            for x in range(4):
                r, g, b = map(int, arr[y, x])
                bimg.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer.writeToSequence(
            jvm.javax.imageio.IIOImage(bimg, None, None), None
        )
    writer.endWriteSequence()
    ios.flush()
    payload = bytes(baos.toByteArray())
    cvs, meta, _ = decode_gif_animation(payload)
    assert len(cvs) == 2
    # GIF quantizes to <=256 colors; the JVM writer palettizes, so
    # compare through ITS reader: our composited frames must equal
    # the JVM's own decode of the same payload
    stream2 = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    reader2 = jvm.javax.imageio.ImageIO.getImageReadersByFormatName(
        "gif"
    ).next()
    reader2.setInput(stream2)
    for k in range(2):
        bimg = reader2.read(k)
        for y in range(5):
            for x in range(4):
                argb = bimg.getRGB(x, y)
                want = ((argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF)
                assert tuple(cvs[k][y, x, :3]) == want, (k, y, x)


def test_wav_telephony_containers(spark):
    """RIFF/WAVE with non-PCM format tags (r16): G.711 A-law/mu-law
    data bytes decode bit-exact against audioop through the container
    path; IMA ADPCM blocks honor the header state, LOW-first nibble
    order (the opposite of audioop's raw high-first stream — pinned
    apart), samples_per_block and the fact-chunk trim; the JVM's
    independent javax.sound.sampled stack decodes our mu-law
    container to the same PCM; malformed/unsupported containers
    refuse by name."""
    import audioop
    import struct

    import numpy as np
    import pytest as _pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_adpcm,
        decode_wav,
        encode_wav_telephony,
    )

    rng = np.random.default_rng(47)
    data = bytes(rng.integers(0, 256, 200).astype(np.uint8))
    for tag, name in ((7, "ulaw2lin"), (6, "alaw2lin")):
        rate, ch, samples = decode_wav(encode_wav_telephony(data, tag))
        want = np.frombuffer(getattr(audioop, name)(data, 2), dtype="<i2")
        assert rate == 8000 and ch == 1
        assert (samples[:, 0] == want).all()

    # ADPCM: header state respected; low-first differs from the raw
    # high-first stream on the same bytes
    deltas = [int(d) for d in rng.integers(0, 16, 64)]
    blob = struct.pack("<hBB", -300, 17, 0) + bytes(
        deltas[j] | (deltas[j + 1] << 4) for j in range(0, 64, 2)
    )
    enc = encode_wav_telephony(blob, 0x11, samples_per_block=65, n_samples=65)
    _, _, samples = decode_wav(enc)
    assert samples.shape == (65, 1)
    assert samples[0, 0] == -300  # the header predictor IS sample 0
    raw = decode_adpcm(blob[4:])  # high-first, zero state: must differ
    assert not (samples[1:, 0] == raw).all()
    # fact-chunk trim: n_samples below the block capacity
    enc2 = encode_wav_telephony(blob, 0x11, samples_per_block=65, n_samples=50)
    assert decode_wav(enc2)[2].shape == (50, 1)

    # the JVM's independent telephony stack reads our mu-law container
    jvm = spark._jvm
    ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        jvm.java.io.ByteArrayInputStream(
            bytearray(encode_wav_telephony(data, 7))
        )
    )
    pcm_fmt = jvm.javax.sound.sampled.AudioFormat(
        jvm.javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000.0, 16, 1, 2, 8000.0, False,
    )
    pcm_ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
        pcm_fmt, ais
    )
    got = np.frombuffer(bytes(pcm_ais.readAllBytes()), dtype="<i2")
    ours = decode_wav(encode_wav_telephony(data, 7))[2][:, 0]
    assert (got == ours).all()

    # refusals by name
    with _pytest.raises(ValueError, match="format tag 2"):
        bad = bytearray(encode_wav_telephony(data, 7))
        off = bad.index(b"fmt ") + 8
        bad[off] = 2  # MS ADPCM
        decode_wav(bytes(bad))
    with _pytest.raises(ValueError, match="multi-channel IMA ADPCM"):
        bad = bytearray(enc)
        off = bad.index(b"fmt ") + 8
        bad[off + 2] = 2  # channels = 2
        decode_wav(bytes(bad))
    with _pytest.raises(ValueError, match="step index"):
        bad_blob = struct.pack("<hBB", 0, 99, 0) + blob[4:]
        decode_wav(
            encode_wav_telephony(
                bad_blob, 0x11, samples_per_block=65, n_samples=65
            )
        )


def test_png_trns_transparency(spark):
    """PNG tRNS (r16): palette images gain per-index alpha, gray/RGB
    gain color-key transparency, and javax.imageio's independent PNG
    reader agrees pixel-for-pixel on our spliced tRNS files; tRNS on
    an alpha-bearing color type is corrupt per the spec."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    def splice_trns(payload: bytes, data: bytes) -> bytes:
        chunk = (
            struct.pack(">I", len(data)) + b"tRNS" + data
            + struct.pack(">I", zlib.crc32(b"tRNS" + data) & 0xFFFFFFFF)
        )
        i = payload.index(b"IDAT") - 4  # before the IDAT length field
        return payload[:i] + chunk + payload[i:]

    rng = np.random.default_rng(53)
    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(5, 6)).astype(np.uint8)
    alphas = bytes([255, 0, 128, 255, 64])  # indices 5..7 default 255
    enc = splice_trns(encode_png_palette(idx, pal), alphas)
    out = decode_png(enc)
    assert out.shape == (5, 6, 4)
    lut = np.array([255, 0, 128, 255, 64, 255, 255, 255], dtype=np.uint8)
    assert (out[:, :, 3] == lut[idx]).all()
    assert (out[:, :, :3] == pal[idx]).all()

    # RGB color key: pixels equal to the key read alpha 0
    px = rng.integers(0, 256, size=(4, 4, 3)).astype(np.uint8)
    px[2, 2] = (10, 20, 30)
    enc2 = splice_trns(
        encode_png(px), struct.pack(">HHH", 10, 20, 30)
    )
    out2 = decode_png(enc2)
    assert out2.shape == (4, 4, 4)
    assert out2[2, 2, 3] == 0
    assert (out2[:, :, 3] == 0).sum() == (
        (px == (10, 20, 30)).all(axis=2).sum()
    )

    # the JVM's independent reader sees the same ARGB for both files
    jvm = spark._jvm
    for enc_k, want in ((enc, np.concatenate(
            [pal[idx], lut[idx][..., None]], axis=2)), (enc2, out2)):
        bimg = jvm.javax.imageio.ImageIO.read(
            jvm.java.io.ByteArrayInputStream(bytearray(enc_k))
        )
        h, w = want.shape[:2]
        for y in range(h):
            for x in range(w):
                argb = bimg.getRGB(x, y)
                a = (argb >> 24) & 0xFF
                assert a == want[y, x, 3], (y, x)
                if a:  # fully transparent pixels may zero their RGB
                    got = (
                        (argb >> 16) & 0xFF, (argb >> 8) & 0xFF, argb & 0xFF,
                    )
                    assert got == tuple(want[y, x, :3]), (y, x)

    # tRNS with an alpha channel is corrupt per the spec
    rgba = rng.integers(0, 256, size=(2, 2, 4)).astype(np.uint8)
    with _pytest.raises(ValueError, match="tRNS is forbidden"):
        decode_png(splice_trns(encode_png(rgba), b"\x00\x01"))


def _cmyk_tile_image(i):
    """The c226 exactness-class fixture: ODD constant ink tiles (they
    invert to EVEN Adobe stored samples) with C=M=Y per pixel so the
    YCCK chroma is exactly zero."""
    import numpy as np

    th, tw = 2 + i % 2, 2 + i % 3
    tr = np.arange(th)[:, None]
    tc = np.arange(tw)[None, :]
    cmy = (2 * ((i * 47 + tr * 19 + tc * 11) % 128) + 1).astype(np.uint8)
    kk = (2 * ((i * 53 + tr * 7 + tc * 3) % 128) + 1).astype(np.uint8)
    ones = np.ones((8, 8), dtype=np.uint8)
    img = np.stack(
        [np.kron(cmy, ones)] * 3 + [np.kron(kk, ones)], axis=-1
    )
    return img[: th * 8 - 1, : tw * 8 - 2]


def test_jpeg_cmyk_roundtrip_and_refusals():
    """4-component Adobe CMYK/YCCK (r16): the exactness class
    round-trips bit-identically through both transforms and every
    YCCK sampling; malformed/ambiguous streams refuse by name."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    for i in range(6):
        img = _cmyk_tile_image(i)
        for enc in (
            encode_jpeg_cmyk(img),
            encode_jpeg_cmyk(img, ycck=True, sampling="444"),
            encode_jpeg_cmyk(img, ycck=True, sampling="422"),
            encode_jpeg_cmyk(img, ycck=True, sampling="420"),
        ):
            assert np.array_equal(decode_jpeg(enc), img), i
    # noise is lossy but shape- and range-sane through both transforms
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, size=(17, 22, 4)).astype(np.uint8)
    for enc in (
        encode_jpeg_cmyk(noise),
        encode_jpeg_cmyk(noise, ycck=True, sampling="420"),
    ):
        assert decode_jpeg(enc).shape == noise.shape
    img = _cmyk_tile_image(1)
    enc = encode_jpeg_cmyk(img)
    # strip the APP14 segment -> ambiguous 4-component stream refuses
    app14_len = 2 + 2 + 12
    no_app14 = enc[:2] + enc[2 + app14_len:]
    assert no_app14[2:4] == b"\xff\xdb"  # really removed the marker
    with pytest.raises(NotImplementedError, match="without an Adobe"):
        decode_jpeg(no_app14)
    # unknown transform byte refuses by name
    bad = bytearray(enc)
    bad[2 + 4 + 11] = 1  # transform=1 (YCbCr) is invalid with 4 comps
    with pytest.raises(NotImplementedError, match="transform 1"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="HxWx4"):
        encode_jpeg_cmyk(img[:, :, :3])
    with pytest.raises(ValueError, match="4:4:4 only"):
        encode_jpeg_cmyk(img, sampling="420")
    with pytest.raises(ValueError, match="outside 0..255"):
        encode_jpeg_cmyk(img.astype(np.int32) + 300)


def test_jpeg_cmyk_interchange_with_jvm(spark):
    """Two-sided external validation of the 4-component pipeline
    against javax.imageio: (a) the JVM's readRaster (no color
    conversion) returns OUR files' stored-domain samples — exactly on
    the exactness class for both transforms, and within integer-IDCT
    rounding on transform-0 noise; (b) the JVM's own 4-band raster
    WRITER produces streams that, with an Adobe transform-0 APP14
    spliced in, our decoder must agree with the JVM's reader on to
    within rounding — an independent encoder exercising our
    4-component entropy/MCU walk."""
    import struct

    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_cmyk,
    )

    jvm = spark._jvm

    def jvm_read_raster(enc):
        """The JVM's NO-color-conversion path: readRaster returns the
        stored-domain samples (chroma upsampled, +128 biased)."""
        stream = jvm.javax.imageio.ImageIO.createImageInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(enc))
        )
        reader = jvm.javax.imageio.ImageIO.getImageReaders(stream).next()
        reader.setInput(stream)
        raster = reader.readRaster(0, None)
        h, w, nb = raster.getHeight(), raster.getWidth(), raster.getNumBands()
        return np.array(
            [
                [
                    [raster.getSample(x, y, c) for c in range(nb)]
                    for x in range(w)
                ]
                for y in range(h)
            ],
            dtype=np.int64,
        )

    # (a) exactness class, both JVM paths: ImageIO.read applies the
    # full Adobe pipeline (YCCK inverse + sample re-inversion) and must
    # equal the TRUE ink values; readRaster must equal the STORED
    # domain (inverted samples; zero chroma reads 128 for YCCK)
    for i in (0, 1, 3):
        img = _cmyk_tile_image(i)
        inv = 255 - img.astype(np.int64)
        stored_ycck = np.stack(
            [
                inv[:, :, 0],  # Y of inverted gray == the gray
                np.full(img.shape[:2], 128, dtype=np.int64),
                np.full(img.shape[:2], 128, dtype=np.int64),
                inv[:, :, 3],
            ],
            axis=-1,
        )
        for kind, enc, stored in (
            ("cmyk", encode_jpeg_cmyk(img), inv),
            (
                "ycck420",
                encode_jpeg_cmyk(img, ycck=True, sampling="420"),
                stored_ycck,
            ),
            (
                "ycck422",
                encode_jpeg_cmyk(img, ycck=True, sampling="422"),
                stored_ycck,
            ),
        ):
            if kind == "cmyk":
                # ImageIO.read's full conversion honors the Adobe
                # inversion for transform 0 → TRUE ink values. (Its
                # YCCK path carries the known JDK quirk of re-inverting
                # only K, so for YCCK the unambiguous external check is
                # the stored-domain raster below — the YCCK→CMYK color
                # math itself is pinned by our round-trip + oracle.)
                converted = _jvm_decode_jpeg(jvm, enc)
                assert np.array_equal(
                    converted, img.astype(np.int64)
                ), (i, kind)
            raw = jvm_read_raster(enc)
            assert np.array_equal(raw, stored), (i, kind)
    # (a) noise, transform 0: decoder-vs-decoder on the same stream
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(16, 24, 4)).astype(np.uint8)
    enc = encode_jpeg_cmyk(noise)
    ours_stored = 255 - decode_jpeg(enc).astype(np.int64)
    theirs = jvm_read_raster(enc)
    assert np.abs(ours_stored - theirs).max() <= 1
    # (b) the JVM writes a 4-band raster; we splice Adobe APP14
    # transform 0 and compare our decode with the JVM's own reader
    h, w = 16, 24
    raster = jvm.java.awt.image.Raster.createInterleavedRaster(
        0, w, h, 4, jvm.java.awt.Point(0, 0)
    )
    vals = rng.integers(0, 256, size=(h, w, 4))
    for y in range(h):
        for x in range(w):
            for c in range(4):
                raster.setSample(x, y, c, int(vals[y, x, c]))
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpeg"
    ).next()
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(jvm.javax.imageio.IIOImage(raster, None, None))
    ios.flush()
    jvm_bytes = bytes(baos.toByteArray())
    app14 = b"\xff\xee" + struct.pack(">H", 14) + b"Adobe" + struct.pack(
        ">HHHB", 100, 0, 0, 0
    )
    ours = decode_jpeg(jvm_bytes[:2] + app14 + jvm_bytes[2:])
    assert ours.shape == (h, w, 4)
    theirs = jvm_read_raster(jvm_bytes)
    assert np.abs((255 - ours.astype(np.int64)) - theirs).max() <= 1


def test_pnm_family_roundtrip_crossform_and_refusals():
    """Full netpbm family (r16): every variant round-trips losslessly,
    the SAME raster through ASCII and binary forms decodes
    identically (P1<->P4, P2<->P5), 16-bit P5 is big-endian per the
    maxval>255 rule, header comments parse, and truncation/range
    violations refuse by name."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_image,
        decode_pnm,
        encode_pnm,
    )

    rng = np.random.default_rng(13)
    for h, w in [(3, 3), (5, 17), (9, 8), (7, 30)]:
        bit = rng.integers(0, 2, size=(h, w)).astype(np.uint8)
        g8 = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
        g16 = rng.integers(0, 60000, size=(h, w)).astype(np.uint16)
        rgb = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert np.array_equal(decode_pnm(encode_pnm(bit, "P1")), bit)
        assert np.array_equal(decode_pnm(encode_pnm(bit, "P4")), bit)
        assert np.array_equal(decode_pnm(encode_pnm(g8, "P2")), g8)
        assert np.array_equal(decode_pnm(encode_pnm(g8, "P5")), g8)
        out16 = decode_pnm(encode_pnm(g16, "P5"))
        assert out16.dtype == np.uint16 and np.array_equal(out16, g16)
        assert np.array_equal(decode_pnm(encode_pnm(rgb, "P3")), rgb)
        # cross-form: ASCII and binary spellings of one raster agree
        assert np.array_equal(
            decode_pnm(encode_pnm(bit, "P1")),
            decode_pnm(encode_pnm(bit, "P4")),
        )
        assert np.array_equal(
            decode_pnm(encode_pnm(g8, "P2")),
            decode_pnm(encode_pnm(g8, "P5")),
        )
    # the 16-bit wire format is BIG-endian: check one sample by hand
    one = np.array([[0x1234]], dtype=np.uint16)
    enc = encode_pnm(one, "P5")
    assert enc.endswith(b"\x12\x34")
    # header comments parse anywhere whitespace is legal
    p = encode_pnm(g8, "P2")
    assert np.array_equal(
        decode_pnm(p[:2] + b"\n# a comment\n" + p[2:]), g8
    )
    # decode_image routes the netpbm magics
    assert np.array_equal(decode_image(encode_pnm(g8, "P5")), g8)
    # refusals
    with pytest.raises(ValueError, match="truncated P5"):
        decode_pnm(encode_pnm(g8, "P5")[:-3])
    with pytest.raises(ValueError, match="truncated PNM raster"):
        decode_pnm(b"P2\n3 3\n255\n1 2 3 4\n")
    with pytest.raises(ValueError, match="outside 0..255"):
        decode_pnm(b"P2\n1 1\n255\n300\n")
    with pytest.raises(ValueError, match="0 or 1"):
        encode_pnm(g8, "P1")
    with pytest.raises(ValueError, match="unknown PNM variant"):
        encode_pnm(g8, "P7")


def test_wav_pcm_variants_roundtrip_and_refusals():
    """PCM WAVE at all three real sample widths (r16): 8-bit unsigned
    excess-128 promotes to full-scale int16, 16-bit stereo
    interleaves, 24-bit packs 3-byte little-endian signed with exact
    sign extension; malformed widths refuse by name."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm,
    )

    rng = np.random.default_rng(23)
    u8 = rng.integers(0, 256, size=(37, 1)).astype(np.uint8)
    rate, ch, s = decode_wav(encode_wav_pcm(u8, bits=8, sample_rate=8000))
    assert (rate, ch) == (8000, 1)
    assert np.array_equal(s, (u8.astype(np.int16) - 128) * 256)
    st16 = rng.integers(-32768, 32768, size=(41, 2)).astype(np.int64)
    rate, ch, s = decode_wav(
        encode_wav_pcm(st16, bits=16, sample_rate=16000)
    )
    assert (rate, ch) == (16000, 2) and np.array_equal(s, st16)
    s24 = rng.integers(-(1 << 23), 1 << 23, size=(29, 1)).astype(np.int64)
    rate, ch, s = decode_wav(
        encode_wav_pcm(s24, bits=24, sample_rate=44100)
    )
    assert s.dtype == np.int32 and np.array_equal(s.flatten(), s24.flatten())
    # sign-extension corners
    corners = np.array([[-1], [-(1 << 23)], [(1 << 23) - 1], [0]])
    _, _, s = decode_wav(encode_wav_pcm(corners, bits=24))
    assert np.array_equal(s.flatten(), corners.flatten())
    with pytest.raises(ValueError, match="bits must be 8/16/24"):
        encode_wav_pcm(u8, bits=12)
    with pytest.raises(ValueError, match="uint8"):
        encode_wav_pcm(st16, bits=8)
    with pytest.raises(ValueError, match="outside"):
        encode_wav_pcm(np.array([[1 << 23]]), bits=24)
    # a 12-bit PCM fmt chunk refuses on decode
    enc = bytearray(encode_wav_pcm(u8, bits=8))
    fmt_off = enc.find(b"fmt ") + 8
    enc[fmt_off + 14] = 12  # bits field
    with pytest.raises(ValueError, match="8/16/24-bit"):
        decode_wav(bytes(enc))


def test_wav_pcm_variants_decode_in_jvm_audio_stack(spark):
    """The JVM's independent javax.sound.sampled parser reads our
    8/16/24-bit PCM containers: format fields and the RAW frame bytes
    must agree — external validation of the RIFF structure and sample
    packing."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        encode_wav_pcm,
    )

    jvm = spark._jvm
    rng = np.random.default_rng(29)

    def jvm_read(enc):
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(enc))
        )
        f = ais.getFormat()
        return f, bytes(ais.readAllBytes())

    u8 = rng.integers(0, 256, size=(33, 1)).astype(np.uint8)
    enc = encode_wav_pcm(u8, bits=8, sample_rate=8000)
    f, frames = jvm_read(enc)
    assert f.getSampleSizeInBits() == 8 and f.getChannels() == 1
    assert int(f.getSampleRate()) == 8000
    assert frames == u8.tobytes()
    st16 = rng.integers(-32768, 32768, size=(21, 2)).astype(np.int64)
    enc = encode_wav_pcm(st16, bits=16, sample_rate=16000)
    f, frames = jvm_read(enc)
    assert f.getSampleSizeInBits() == 16 and f.getChannels() == 2
    assert not f.isBigEndian()
    assert frames == st16.astype("<i2").tobytes()
    s24 = rng.integers(-(1 << 23), 1 << 23, size=(17, 1)).astype(np.int64)
    enc = encode_wav_pcm(s24, bits=24, sample_rate=44100)
    f, frames = jvm_read(enc)
    assert f.getSampleSizeInBits() == 24 and f.getChannels() == 1
    u = (s24.flatten() & 0xFFFFFF).astype(np.uint32)
    want = np.stack(
        [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF], axis=-1
    ).astype(np.uint8).tobytes()
    assert frames == want


def test_aiff_au_roundtrip_and_refusals():
    """AIFF (big-endian IFF sibling of WAVE) and Sun AU containers
    (r16): signed 8-bit, 16-bit stereo and 24-bit big-endian AIFF
    round-trip exactly (80-bit extended sampleRate included); AU
    mu-law/int8/int16be decode; malformed containers refuse by
    name."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _f80_decode,
        _f80_encode,
        decode_aiff,
        decode_au,
        decode_mulaw,
        encode_aiff,
        encode_au,
    )

    rng = np.random.default_rng(31)
    for rate in (8000, 11025, 44100, 48000, 96000):
        assert _f80_decode(_f80_encode(rate)) == rate
    a8 = rng.integers(-128, 128, size=(33, 1)).astype(np.int8)
    r, ch, s = decode_aiff(encode_aiff(a8, bits=8, sample_rate=8000))
    assert (r, ch) == (8000, 1)
    assert np.array_equal(s, a8.astype(np.int16) * 256)
    a16 = rng.integers(-32768, 32768, size=(21, 2)).astype(np.int64)
    r, ch, s = decode_aiff(encode_aiff(a16, bits=16, sample_rate=44100))
    assert (r, ch) == (44100, 2)
    assert np.array_equal(s, a16.astype(np.int16))
    a24 = rng.integers(-(1 << 23), 1 << 23, size=(17, 1)).astype(np.int64)
    r, ch, s = decode_aiff(encode_aiff(a24, bits=24, sample_rate=48000))
    assert (r, ch) == (48000, 1)
    assert s.dtype == np.int32 and np.array_equal(s.astype(np.int64), a24)
    # corner samples survive 24-bit sign extension
    corners = np.array([[-(1 << 23)], [(1 << 23) - 1], [0], [-1]])
    _, _, s = decode_aiff(encode_aiff(corners, bits=24, sample_rate=8000))
    assert np.array_equal(s.astype(np.int64), corners)
    # AU paths
    pcm = rng.integers(-32768, 32768, size=42).astype(np.int16)
    r, ch, s = decode_au(
        encode_au(pcm.astype(">i2").tobytes(), encoding=3,
                  sample_rate=16000, channels=2)
    )
    assert (r, ch) == (16000, 2) and np.array_equal(s.flatten(), pcm)
    codes = rng.integers(0, 256, size=30).astype(np.uint8)
    _, _, s = decode_au(
        encode_au(codes.tobytes(), encoding=1, sample_rate=8000, channels=1)
    )
    assert np.array_equal(s.flatten(), decode_mulaw(codes.tobytes()))
    i8 = rng.integers(-128, 128, size=28).astype(np.int8)
    _, _, s = decode_au(
        encode_au(i8.tobytes(), encoding=2, sample_rate=8000, channels=1)
    )
    assert np.array_equal(s.flatten(), i8.astype(np.int16) * 256)
    # annotation bytes shift the data offset and still decode
    _, _, s = decode_au(
        encode_au(i8.tobytes(), encoding=2, sample_rate=8000, channels=1,
                  annotation=b"note\x00\x00\x00\x00")
    )
    assert np.array_equal(s.flatten(), i8.astype(np.int16) * 256)
    # refusals
    with pytest.raises(ValueError, match="no FORM header"):
        decode_aiff(b"RIFFxxxxWAVE")
    with pytest.raises(NotImplementedError, match="AIFC"):
        enc = bytearray(encode_aiff(a8, bits=8, sample_rate=8000))
        enc[8:12] = b"AIFC"
        decode_aiff(bytes(enc))
    with pytest.raises(ValueError, match="SIGNED int8"):
        encode_aiff(np.zeros((4, 1), dtype=np.uint8), bits=8)
    with pytest.raises(ValueError, match="no .snd magic"):
        decode_au(b"FORMxxxxAIFF")
    with pytest.raises(NotImplementedError, match="AU encoding 27"):
        decode_au(encode_au(b"", encoding=27))
    with pytest.raises(ValueError, match="truncated AIFF chunk"):
        decode_aiff(encode_aiff(a16, bits=16, sample_rate=8000)[:-8])
    # SSND shorter than COMM's frame count (sizes self-consistent)
    short = encode_aiff(a16[:4], bits=16, sample_rate=8000)
    longer = bytearray(encode_aiff(a16, bits=16, sample_rate=8000))
    comm_off = longer.find(b"COMM") + 8 + 2
    longer[comm_off:comm_off + 4] = (2**20).to_bytes(4, "big")
    with pytest.raises(ValueError, match="shorter than COMM"):
        decode_aiff(bytes(longer))
    assert decode_aiff(short)[2].shape == (4, 2)


def test_aiff_au_cross_validate_jvm_both_directions(spark):
    """javax.sound.sampled reads AIFF and AU natively: our containers
    must parse with matching format fields and bit-identical frames,
    and the JVM's own AIFF/AU writers' files must decode through our
    path — independent validation both directions."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_aiff,
        decode_au,
        decode_mulaw,
        encode_aiff,
        encode_au,
    )

    jvm = spark._jvm
    sampled = jvm.javax.sound.sampled
    rng = np.random.default_rng(37)

    def jvm_read(enc):
        ais = sampled.AudioSystem.getAudioInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(enc))
        )
        return ais.getFormat(), bytes(ais.readAllBytes())

    # ours -> JVM
    a8 = rng.integers(-128, 128, size=(29, 1)).astype(np.int8)
    f, frames = jvm_read(encode_aiff(a8, bits=8, sample_rate=8000))
    assert f.getSampleSizeInBits() == 8 and f.getChannels() == 1
    assert frames == a8.tobytes()
    a16 = rng.integers(-32768, 32768, size=(19, 2)).astype(np.int64)
    f, frames = jvm_read(encode_aiff(a16, bits=16, sample_rate=44100))
    assert f.isBigEndian() and f.getChannels() == 2
    assert int(f.getSampleRate()) == 44100
    assert frames == a16.astype(">i2").tobytes()
    a24 = rng.integers(-(1 << 23), 1 << 23, size=(15, 1)).astype(np.int64)
    enc = encode_aiff(a24, bits=24, sample_rate=48000)
    f, frames = jvm_read(enc)
    assert f.getSampleSizeInBits() == 24
    u = (a24.flatten() & 0xFFFFFF).astype(np.uint32)
    want = np.stack(
        [(u >> 16) & 0xFF, (u >> 8) & 0xFF, u & 0xFF], axis=-1
    ).astype(np.uint8).tobytes()
    assert frames == want
    pcm16 = rng.integers(-32768, 32768, size=(23, 1)).astype(np.int64)
    f, frames = jvm_read(
        encode_au(pcm16.astype(">i2").tobytes(), encoding=3,
                  sample_rate=16000, channels=1)
    )
    assert f.isBigEndian() and int(f.getSampleRate()) == 16000
    assert frames == pcm16.astype(">i2").tobytes()
    codes = rng.integers(0, 256, size=31).astype(np.uint8)
    f, frames = jvm_read(
        encode_au(codes.tobytes(), encoding=1, sample_rate=8000, channels=1)
    )
    assert f.getEncoding().toString() == "ULAW"
    assert frames == codes.tobytes()

    # JVM -> ours
    def jvm_write(raw, fmt, ftype, n_frames):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(raw))
        ais = sampled.AudioInputStream(bais, fmt, n_frames)
        baos = jvm.java.io.ByteArrayOutputStream()
        sampled.AudioSystem.write(ais, ftype, baos)
        return bytes(baos.toByteArray())

    types = sampled.AudioFileFormat.Type
    pcm_signed = sampled.AudioFormat.Encoding.PCM_SIGNED
    ulaw = sampled.AudioFormat.Encoding.ULAW
    fmt16 = sampled.AudioFormat(
        pcm_signed, float(22050), 16, 2, 4, float(22050), True
    )
    raw16 = rng.integers(-32768, 32768, size=(27, 2)).astype(">i2")
    payload = jvm_write(raw16.tobytes(), fmt16, types.AIFF, 27)
    r, ch, s = decode_aiff(payload)
    assert (r, ch) == (22050, 2)
    assert np.array_equal(s, raw16.astype(np.int16))
    fmt8 = sampled.AudioFormat(
        pcm_signed, float(8000), 8, 1, 1, float(8000), True
    )
    raw8 = rng.integers(-128, 128, size=25).astype(np.int8)
    r, ch, s = decode_aiff(jvm_write(raw8.tobytes(), fmt8, types.AIFF, 25))
    assert (r, ch) == (8000, 1)
    assert np.array_equal(s.flatten(), raw8.astype(np.int16) * 256)
    payload = jvm_write(raw16.tobytes(), fmt16, types.AU, 27)
    r, ch, s = decode_au(payload)
    assert (r, ch) == (22050, 2)
    assert np.array_equal(s, raw16.astype(np.int16))
    ufmt = sampled.AudioFormat(ulaw, float(8000), 8, 1, 1, float(8000), True)
    ucodes = rng.integers(0, 256, size=33).astype(np.uint8)
    r, ch, s = decode_au(jvm_write(ucodes.tobytes(), ufmt, types.AU, 33))
    assert (r, ch) == (8000, 1)
    assert np.array_equal(s.flatten(), decode_mulaw(ucodes.tobytes()))


def test_wav_extensible_unwraps_to_effective_tag(spark):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE, r16): the 40-byte fmt chunk's
    SubFormat GUID supplies the effective tag — PCM payloads decode
    identically to their plain-tag containers at every width, the
    JVM's javax.sound.sampled parser agrees on format + frames, and
    non-standard GUIDs / padded validBits / wrapped ADPCM refuse by
    name."""
    import struct

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_wav,
        encode_wav_extensible,
        encode_wav_pcm,
    )

    rng = np.random.default_rng(41)
    cases = [
        (rng.integers(0, 256, size=(31, 1)).astype(np.uint8), 8, 8000),
        (rng.integers(-32768, 32768, size=(19, 2)).astype(np.int64), 16,
         44100),
        (rng.integers(-(1 << 23), 1 << 23, size=(17, 2)).astype(np.int64),
         24, 48000),
    ]
    jvm = spark._jvm
    for arr, bits, rate in cases:
        ext = encode_wav_extensible(
            arr, bits=bits, sample_rate=rate, channel_mask=0x3
        )
        plain = encode_wav_pcm(arr, bits=bits, sample_rate=rate)
        re_, ce, se = decode_wav(ext)
        rp, cp, sp = decode_wav(plain)
        assert (re_, ce) == (rp, cp) == (rate, arr.shape[1])
        assert np.array_equal(se, sp)
        ais = jvm.javax.sound.sampled.AudioSystem.getAudioInputStream(
            jvm.java.io.ByteArrayInputStream(bytearray(ext))
        )
        f = ais.getFormat()
        assert f.getSampleSizeInBits() == bits
        assert f.getChannels() == arr.shape[1]
        assert int(f.getSampleRate()) == rate
    # refusals: non-standard GUID suffix, padded validBits, ADPCM wrap
    arr, bits, rate = cases[1]
    enc = bytearray(encode_wav_extensible(arr, bits=16, sample_rate=rate))
    g = enc.find(b"fmt ") + 8 + 24
    enc[g + 4] = 0xFF
    with pytest.raises(ValueError, match="not a standard media subtype"):
        decode_wav(bytes(enc))
    enc = bytearray(encode_wav_extensible(arr, bits=16, sample_rate=rate))
    v = enc.find(b"fmt ") + 8 + 18
    enc[v:v + 2] = struct.pack("<H", 12)  # validBits != container bits
    with pytest.raises(ValueError, match="padded layouts"):
        decode_wav(bytes(enc))
    enc = bytearray(encode_wav_extensible(arr, bits=16, sample_rate=rate))
    s = enc.find(b"fmt ") + 8 + 24
    enc[s:s + 4] = struct.pack("<I", 0x11)
    with pytest.raises(ValueError, match="EXTENSIBLE not"):
        decode_wav(bytes(enc))


def test_exif_orientation_parse_transform_and_refusals():
    """EXIF APP1 (r16): builder/parser round-trip over both TIFF byte
    orders, all eight orientation states transform to the correct
    upright view, missing EXIF yields the spec default, corrupt
    structures refuse by name."""
    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        apply_exif_orientation,
        build_exif_app1,
        decode_jpeg_gray,
        encode_jpeg_gray,
        inject_exif,
        parse_exif,
    )

    img = (np.arange(64).reshape(8, 8) * 2 % 256).astype(np.uint8)
    jp = encode_jpeg_gray(img)
    for bo in ("II", "MM"):
        for o in range(1, 9):
            p = inject_exif(
                jp, build_exif_app1(o, byte_order=bo, description=f"d{o}")
            )
            m = parse_exif(p)
            assert (m["orientation"], m["byte_order"], m["description"]) \
                == (o, bo, f"d{o}")
            # the image decoder skips the APP1 transparently
            assert np.array_equal(decode_jpeg_gray(p), decode_jpeg_gray(jp))
    assert parse_exif(jp) == {
        "orientation": 1, "byte_order": None, "description": None,
    }
    # inline (<= 4 byte) description stays inline and parses
    m = parse_exif(inject_exif(jp, build_exif_app1(2, description="ab")))
    assert m["description"] == "ab" and m["orientation"] == 2
    # all eight upright transforms against a hand-checked 2x3 grid
    px = np.arange(6).reshape(2, 3)
    want_topleft = {1: px[0, 0], 2: px[0, 2], 3: px[1, 2], 4: px[1, 0],
                    5: px[0, 0], 6: px[1, 0], 7: px[1, 2], 8: px[0, 2]}
    for o in range(1, 9):
        up = apply_exif_orientation(px, o)
        assert up.shape == ((2, 3) if o <= 4 else (3, 2))
        assert up[0, 0] == want_topleft[o]
        assert up.sum() == px.sum()
    with pytest.raises(ValueError, match="orientation must be 1..8"):
        build_exif_app1(9)
    with pytest.raises(ValueError, match="byte-order mark"):
        parse_exif(inject_exif(jp, b"Exif\x00\x00XX" + b"\x00" * 8))
    bad = bytearray(build_exif_app1(3))
    bad[8] = 43  # TIFF magic
    with pytest.raises(ValueError, match="magic != 42"):
        parse_exif(inject_exif(jp, bytes(bad)))
    bad = bytearray(build_exif_app1(3))
    off = 6 + 8 + 2 + 8  # into the orientation value field
    bad[off:off + 2] = (77).to_bytes(2, "little")
    with pytest.raises(ValueError, match="orientation 77"):
        parse_exif(inject_exif(jp, bytes(bad)))


def test_exif_app1_framing_survives_jvm_reader(spark):
    """javax.imageio's independent JPEG marker parser must expose our
    APP1 segment verbatim (unknown-marker node, tag 225) — external
    validation that the segment framing and placement are spec-valid,
    and that the stream still decodes to the same pixels."""
    import numpy as np

    from amazonredshift_blueprints_spark.operators.multimodal import (
        build_exif_app1,
        encode_jpeg_gray,
        inject_exif,
    )

    jvm = spark._jvm
    img = np.full((16, 16), 120, dtype=np.uint8)
    app1 = build_exif_app1(6, byte_order="MM", description="jvm check")
    payload = inject_exif(encode_jpeg_gray(img), app1)
    stream = jvm.javax.imageio.ImageIO.createImageInputStream(
        jvm.java.io.ByteArrayInputStream(bytearray(payload))
    )
    reader = jvm.javax.imageio.ImageIO.getImageReaders(stream).next()
    reader.setInput(stream)
    md = reader.getImageMetadata(0)
    tree = md.getAsTree("javax_imageio_jpeg_image_1.0")
    markers = tree.getFirstChild()  # markerSequence is first child?
    # walk the whole tree for unknown nodes with MarkerTag 225
    found = []

    def walk(node):
        if node.getNodeName() == "unknown":
            attrs = node.getAttributes()
            tag = attrs.getNamedItem("MarkerTag")
            if tag is not None and tag.getNodeValue() == "225":
                found.append(bytes(node.getUserObject()))
        kids = node.getChildNodes()
        for i in range(kids.getLength()):
            walk(kids.item(i))

    walk(tree)
    assert found and found[0] == app1
    buffered = reader.read(0)
    raster = buffered.getRaster()
    got = np.array(
        [
            raster.getSample(x, y, 0)
            for y in range(16)
            for x in range(16)
        ]
    ).reshape(16, 16)
    assert np.array_equal(got, img)


def test_ico_container_roundtrip_masks_and_refusals():
    """ICO favicons (r16): ICONDIR walk, embedded-PNG dispatch on the
    magic, headerless DIBs with DOUBLED heights (24-bit + AND mask,
    32-bit BGRA alpha), and named refusals for foreign members and
    odd doubled heights."""
    import struct

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        decode_ico,
        encode_ico,
    )

    rng = np.random.default_rng(43)
    px16 = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    px8 = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    al = rng.integers(0, 256, size=(8, 8)).astype(np.uint8)
    enc = encode_ico([
        {"pixels": px16, "kind": "png"},
        {"pixels": px8, "kind": "bmp"},
        {"pixels": px8, "kind": "bmp32", "alpha": al},
    ])
    frames = decode_ico(enc)
    assert [f["kind"] for f in frames] == ["png", "bmp", "bmp32"]
    assert np.array_equal(frames[0]["pixels"], px16)
    assert np.array_equal(frames[1]["pixels"], px8)
    assert (frames[1]["alpha"] == 255).all()
    assert np.array_equal(frames[2]["pixels"], px8)
    assert np.array_equal(frames[2]["alpha"], al)
    # a set AND-mask bit means transparent in the 24-bit layout:
    # flip the first mask byte of the bmp frame (top row after the
    # bottom-up flip is the LAST stored mask row)
    enc2 = bytearray(enc)
    # locate the 24-bit DIB: entries are 16 bytes from offset 6
    _, _, _, _, _, _, size1, off1 = struct.unpack(
        "<BBBBHHII", enc2[6 + 16:6 + 32]
    )
    stride = 8 * 3
    mask_at = off1 + 40 + stride * 8  # w=8 -> row stride 24, no pad
    enc2[mask_at] = 0b10000000  # stored row 0 = display bottom row
    fr2 = decode_ico(bytes(enc2))[1]
    assert fr2["alpha"][7, 0] == 0 and fr2["alpha"][7, 1] == 255
    assert fr2["alpha"][0, 0] == 255
    # 256x256 encodes as width byte 0 per the ICONDIR rule
    big = np.zeros((256, 256, 3), dtype=np.uint8)
    fr = decode_ico(encode_ico([{"pixels": big, "kind": "bmp"}]))[0]
    assert (fr["width"], fr["height"]) == (256, 256)
    # refusals
    with pytest.raises(ValueError, match="bad ICONDIR"):
        decode_ico(b"\x00\x00\x02\x00\x01\x00" + b"\x00" * 16)
    bad = bytearray(encode_ico([{"pixels": px8, "kind": "bmp"}]))
    off = struct.unpack("<I", bad[18:22])[0]
    bad[off:off + 4] = struct.pack("<I", 124)  # V5 header size
    with pytest.raises(NotImplementedError, match="neither PNG nor"):
        decode_ico(bytes(bad))
    odd = bytearray(encode_ico([{"pixels": px8, "kind": "bmp"}]))
    off = struct.unpack("<I", odd[18:22])[0]
    odd[off + 8:off + 12] = struct.pack("<i", 15)  # odd doubled height
    with pytest.raises(ValueError, match="doubled"):
        decode_ico(bytes(odd))


def test_apng_roundtrip_compositing_and_refusals(spark):
    """APNG (r16): acTL/fcTL/fdAT container round-trip, §ANIMATION
    compositing (SOURCE and OVER blends, none/background/previous
    disposals, PREVIOUS-on-frame-0 downgrade), static readers seeing
    the default image — ours AND the JVM's — and corrupt containers
    refusing by name."""
    import struct

    import numpy as np
    import pytest

    from amazonredshift_blueprints_spark.operators.multimodal import (
        _png_chunk,
        decode_apng,
        decode_png,
        encode_apng,
    )

    base = np.full((16, 16, 3), 10, dtype=np.uint8)
    f1 = np.full((6, 6, 3), 100, dtype=np.uint8)
    f2 = np.full((6, 6, 3), 200, dtype=np.uint8)
    enc = encode_apng(
        [
            {"pixels": base, "delay_num": 2, "delay_den": 100},
            {"pixels": f1, "x": 2, "y": 2},
            {"pixels": f2, "x": 4, "y": 4},
        ],
        num_plays=3,
    )
    out = decode_apng(enc)
    assert out["num_plays"] == 3 and len(out["frames"]) == 3
    assert out["frames"][0]["delay_num"] == 2
    cv = out["canvas"]
    assert cv[0, 0, 0] == 10 and cv[3, 3, 0] == 100
    assert cv[5, 5, 0] == 200 and cv[9, 9, 0] == 200
    assert (cv[..., 3] == 255).all()
    # our static reader and the JVM's both see the default image
    assert (decode_png(enc) == 10).all()
    jvm = spark._jvm
    buffered = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(enc))
    )
    assert buffered.getWidth() == 16 and buffered.getHeight() == 16
    assert (buffered.getRGB(0, 0) & 0xFFFFFF) == (10 << 16 | 10 << 8 | 10)
    # dispose background: uncovered canvas goes transparent
    cv2 = decode_apng(
        encode_apng(
            [{"pixels": base, "dispose": 1},
             {"pixels": f1, "x": 0, "y": 0}]
        )
    )["canvas"]
    assert cv2[0, 0, 3] == 255 and cv2[10, 10, 3] == 0
    # dispose previous: the region restores
    cv3 = decode_apng(
        encode_apng(
            [{"pixels": base},
             {"pixels": f1, "x": 2, "y": 2, "dispose": 2},
             {"pixels": f2, "x": 10, "y": 10}]
        )
    )["canvas"]
    assert cv3[3, 3, 0] == 10 and cv3[12, 12, 0] == 200
    # PREVIOUS on frame 0 downgrades to BACKGROUND (spec rule)
    cv4 = decode_apng(
        encode_apng(
            [{"pixels": base, "dispose": 2},
             {"pixels": f1, "x": 0, "y": 0}]
        )
    )["canvas"]
    assert cv4[10, 10, 3] == 0
    # refusals
    with pytest.raises(ValueError, match="no acTL"):
        from amazonredshift_blueprints_spark.operators.multimodal import (
            encode_png,
        )
        decode_apng(encode_png(base))
    bad = bytearray(enc)
    at = bad.find(b"acTL")
    n = struct.unpack(">I", bad[at + 4:at + 8])[0]
    bad[at + 4:at + 8] = struct.pack(">I", n + 1)
    bad[at + 12:at + 16] = struct.pack(
        ">I",
        __import__("zlib").crc32(bytes(bad[at:at + 12])) & 0xFFFFFFFF,
    )
    with pytest.raises(ValueError, match="declares"):
        decode_apng(bytes(bad))
    with pytest.raises(ValueError, match="exceeds the canvas"):
        encode_apng([{"pixels": base},
                     {"pixels": f1, "x": 12, "y": 12}])

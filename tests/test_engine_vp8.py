"""VP8 (lossy) keyframe decoder tests — `engine/vp8x.py` (RFC 6386).

Gold standard: pixel-exact Y'CbCr parity with the system libwebp (the same
library family the reference's Rust `image` crate wraps) on

* the reference's own `sample_text.webp` fixture, and
* synthetic images freshly ENCODED by libwebp in-test at several sizes,
  qualities and contents (exercises DC/V/H/TM, the 4x4 B modes, the Y2
  WHT path, segmentation and the normal loop filter).

Both parity legs skip cleanly when libwebp isn't installed; the error-path
tests and the extraction e2e (test_reference_fixtures.py) run everywhere.
"""

import ctypes
import ctypes.util
import os
import struct

import numpy as np
import pytest

from activestorage_ocr_spark.engine import vp8x, webpx

FIXTURE = "/root/reference/rust/tests/fixtures/sample_text.webp"


def _load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


_LW = _load_libwebp()
needs_libwebp = pytest.mark.skipif(_LW is None, reason="system libwebp not present")


def _vp8_payload(webp: bytes) -> bytes:
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(webp):
        tag = webp[pos : pos + 4]
        (ln,) = struct.unpack("<I", webp[pos + 4 : pos + 8])
        if tag == b"VP8 ":
            return webp[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln % 2)
    raise AssertionError("no VP8 chunk")


def _libwebp_yuv(webp: bytes):
    """Decode via libwebp -> (Y, U, V) uint8 planes."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    _LW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    py = _LW.WebPDecodeYUV(
        webp, len(webp), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v), ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    assert py, "libwebp failed to decode"
    H, W = h.value, w.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = np.ctypeslib.as_array(py, shape=(H, stride.value))[:, :W].copy()
    U = np.ctypeslib.as_array(u, shape=(ch, uv_stride.value))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, shape=(ch, uv_stride.value))[:, :cw].copy()
    _LW.WebPFree(py)
    return Y, U, V


def _libwebp_encode(rgb: np.ndarray, quality: float) -> bytes:
    h, w, _ = rgb.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    _LW.WebPEncodeRGB.restype = ctypes.c_size_t
    _LW.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    n = _LW.WebPEncodeRGB(
        rgb.tobytes(), w, h, w * 3, ctypes.c_float(quality), ctypes.byref(out)
    )
    assert n > 0, "libwebp encode failed"
    data = ctypes.string_at(out, n)
    _LW.WebPFree(out)
    return data


@needs_libwebp
@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="reference fixtures not present")
def test_reference_fixture_pixel_exact():
    webp = open(FIXTURE, "rb").read()
    Y, U, V = vp8x.decode_frame_planes(_vp8_payload(webp))
    ty, tu, tv = _libwebp_yuv(webp)
    assert np.array_equal(Y, ty)
    assert np.array_equal(U, tu)
    assert np.array_equal(V, tv)


def _synthetic(w, h, kind, seed):
    rng = np.random.RandomState(seed)
    if kind == "gradient":
        x = np.linspace(0, 255, w)[None, :]
        y = np.linspace(0, 255, h)[:, None]
        img = np.stack([x + 0 * y, 0 * x + y, (x + y) / 2], axis=2)
        return np.clip(img, 0, 255).astype(np.uint8)
    if kind == "text":
        img = np.full((h, w, 3), 255, dtype=np.uint8)
        for _ in range(30):  # dark glyph-like strokes on white
            y0, x0 = rng.randint(0, max(1, h - 8)), rng.randint(0, max(1, w - 8))
            img[y0 : y0 + rng.randint(2, 8), x0 : x0 + rng.randint(2, 8)] = (
                rng.randint(0, 60)
            )
        return img
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)  # noise
    return img


@needs_libwebp
@pytest.mark.parametrize(
    "w,h,kind,quality",
    [
        (64, 48, "gradient", 75.0),
        (35, 21, "text", 50.0),  # non-multiple-of-16: crop path
        (128, 64, "text", 90.0),
        (48, 48, "noise", 30.0),  # heavy residuals, many token categories
        (16, 16, "gradient", 75.0),
        (400, 100, "text", 75.0),
    ],
)
def test_synthetic_encode_decode_pixel_exact(w, h, kind, quality):
    rgb = _synthetic(w, h, kind, seed=w * h + int(quality))
    webp = _libwebp_encode(rgb, quality)
    Y, U, V = vp8x.decode_frame_planes(_vp8_payload(webp))
    ty, tu, tv = _libwebp_yuv(webp)
    assert np.array_equal(Y, ty), f"Y mismatch {np.abs(Y.astype(int)-ty).max()}"
    assert np.array_equal(U, tu)
    assert np.array_equal(V, tv)


class TestErrors:
    def test_interframe_rejected(self):
        with pytest.raises(ValueError, match="interframe"):
            vp8x.decode_frame_planes(b"\x01\x00\x00" + b"\x9d\x01\x2a" + bytes(8))

    def test_bad_start_code(self):
        with pytest.raises(ValueError, match="start code"):
            vp8x.decode_frame_planes(b"\x00\x00\x00" + b"\xff\xff\xff" + bytes(8))

    def test_truncated(self):
        with pytest.raises(ValueError):
            vp8x.decode_frame_planes(b"\x00\x02")

    def test_partition_overrun(self):
        # declared first-partition size beyond the frame
        tag = (4000 << 5)
        hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        with pytest.raises(ValueError, match="overruns"):
            vp8x.decode_frame_planes(hdr + b"\x9d\x01\x2a" + b"\x10\x00\x10\x00")

    def test_decode_bomb_guarded(self):
        # corrupt header declaring 16383x16383 must fail fast, not loop
        # over a million macroblocks
        dims = struct.pack("<HH", 0x3FFF, 0x3FFF)
        with pytest.raises(ValueError, match="64MP"):
            vp8x.decode_frame_planes(b"\x00\x00\x00\x9d\x01\x2a" + dims + bytes(32))

    def test_reserved_version_rejected(self):
        dims = struct.pack("<HH", 48, 32)
        tag = bytes([(4 << 1), 0x00, 0x00])  # version 4 = reserved
        with pytest.raises(ValueError, match="version"):
            vp8x.decode_frame_planes(tag + b"\x9d\x01\x2a" + dims + bytes(32))

    def test_version_overrides_loop_filter(self):
        # RFC 6386 9.1: version 3 = no loop filter regardless of the signaled
        # filter level. Patch a libwebp stream (version 0, filtered) to
        # version 3: it must still decode, and the output must differ from
        # the version-0 decode exactly when the filter was active.
        if _LW is None:
            pytest.skip("needs libwebp to build a lossy stream")
        payload = bytearray(_vp8_payload(_libwebp_encode(_synthetic(64, 64, "gradient", 5), 30.0)))
        y0, u0, v0 = vp8x.decode_frame_planes(bytes(payload))
        payload[0] = (payload[0] & ~0x0E) | (3 << 1)
        y3, u3, v3 = vp8x.decode_frame_planes(bytes(payload))
        assert y3.shape == y0.shape
        assert not np.array_equal(y3, y0), "filter override had no effect"

    def test_garbage_payloads_never_crash(self):
        # realistic corruption: valid small dims, garbage partitions
        rng = np.random.RandomState(7)
        dims = struct.pack("<HH", 48, 32)
        for i in range(50):
            blob = bytes(rng.randint(0, 256, rng.randint(0, 64)).astype(np.uint8))
            try:
                vp8x.decode_frame_planes(b"\x00\x00\x00\x9d\x01\x2a" + dims + blob)
            except ValueError:
                pass

    def test_bitflip_fuzz_on_real_stream(self):
        # flip bytes inside a real lossy stream: ValueError or a decode,
        # never a crash or hang
        if _LW is None:
            pytest.skip("needs libwebp to build a lossy stream")
        payload = bytearray(_vp8_payload(_libwebp_encode(_synthetic(48, 32, "text", 3), 60.0)))
        rng = np.random.RandomState(11)
        for _ in range(25):
            mut = bytearray(payload)
            for _ in range(rng.randint(1, 4)):
                mut[rng.randint(6, len(mut))] = rng.randint(0, 256)
            try:
                vp8x.decode_frame_planes(bytes(mut))
            except ValueError:
                pass

    def test_decode_webp_routes_vp8(self):
        # a VP8 chunk inside RIFF now decodes instead of raising
        if _LW is None:
            pytest.skip("needs libwebp to build a lossy stream")
        rgb = _synthetic(32, 32, "gradient", 1)
        webp = _libwebp_encode(rgb, 75.0)
        out = webpx.decode_webp(webp)
        assert out.shape == (32, 32, 3) and out.dtype == np.uint8


class TestAlphaChunk:
    """ALPH (lossy WebP alpha) — webpx.decode_alpha + composite routing."""

    @needs_libwebp
    def test_alpha_plane_matches_libwebp(self):
        rgba = np.zeros((40, 56, 4), dtype=np.uint8)
        rng = np.random.RandomState(5)
        rgba[:, :, :3] = _synthetic(56, 40, "gradient", 2)
        # structured alpha: vertical ramp + a hole
        rgba[:, :, 3] = np.linspace(0, 255, 40)[:, None].astype(np.uint8)
        rgba[10:20, 10:30, 3] = 0
        out = ctypes.POINTER(ctypes.c_uint8)()
        _LW.WebPEncodeRGBA.restype = ctypes.c_size_t
        _LW.WebPEncodeRGBA.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
        n = _LW.WebPEncodeRGBA(rgba.tobytes(), 56, 40, 56 * 4,
                               ctypes.c_float(75.0), ctypes.byref(out))
        assert n > 0
        webp = ctypes.string_at(out, n)
        _LW.WebPFree(out)
        assert b"ALPH" in webp[:64], "encoder did not emit an ALPH chunk"
        # our alpha plane == libwebp's decoded A channel, byte for byte
        w = ctypes.c_int(); h = ctypes.c_int()
        _LW.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
        p = _LW.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
        truth = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
        _LW.WebPFree(p)
        pos = 12
        alph = None
        while pos + 8 <= len(webp):
            tag = webp[pos:pos + 4]
            (ln,) = struct.unpack("<I", webp[pos + 4:pos + 8])
            if tag == b"ALPH":
                alph = webp[pos + 8:pos + 8 + ln]
            pos += 8 + ln + (ln % 2)
        got = webpx.decode_alpha(alph, 56, 40)
        assert np.array_equal(got, truth[:, :, 3])
        # end-to-end: decode_webp composites (opaque area unchanged hue-wise,
        # transparent hole reads white)
        rgb = webpx.decode_webp(webp)
        assert rgb.shape == (40, 56, 3)
        assert (rgb[12:18, 12:28] == 255).all()

    def test_raw_alpha_and_filters_roundtrip(self):
        rng = np.random.RandomState(9)
        h, w = 13, 17
        a = rng.randint(0, 256, (h, w)).astype(np.uint8)

        def forward(a, filt):
            src = a.astype(np.int32)
            out = np.zeros_like(src)
            for y in range(h):
                for x in range(w):
                    if filt == 1:
                        p = src[y, x - 1] if x else (src[y - 1, 0] if y else 0)
                    elif filt == 2:
                        p = src[y - 1, x] if y else (src[y, x - 1] if x else 0)
                    else:
                        if y == 0:
                            p = src[y, x - 1] if x else 0
                        elif x == 0:
                            p = src[y - 1, 0]
                        else:
                            g = int(src[y, x - 1]) + int(src[y - 1, x]) - int(src[y - 1, x - 1])
                            p = min(255, max(0, g))
                    out[y, x] = (src[y, x] - p) & 0xFF
            return out.astype(np.uint8)

        for filt in (0, 1, 2, 3):
            residues = a if filt == 0 else forward(a, filt)
            body = bytes([filt << 2]) + residues.tobytes()
            got = webpx.decode_alpha(body, w, h)
            assert np.array_equal(got, a), f"filter {filt}"


class TestAnimatedWebp:
    @needs_libwebp
    def test_first_anmf_frame_decodes(self):
        # wrap a real lossy still into a VP8X+ANIM+ANMF container (the
        # animated-WebP layout) and check the first frame decodes
        rgb = _synthetic(48, 32, "gradient", 4)
        still = _libwebp_encode(rgb, 75.0)
        vp8_chunk = None
        pos = 12
        while pos + 8 <= len(still):
            tag = still[pos:pos + 4]
            (ln,) = struct.unpack("<I", still[pos + 4:pos + 8])
            if tag == b"VP8 ":
                vp8_chunk = still[pos:pos + 8 + ln + (ln % 2)]
            pos += 8 + ln + (ln % 2)
        assert vp8_chunk

        def chunk(tag, body):
            pad = b"\x00" if len(body) % 2 else b""
            return tag + struct.pack("<I", len(body)) + body + pad

        vp8x = chunk(b"VP8X", bytes([0x02, 0, 0, 0]) + b"\x2f\x00\x00\x1f\x00\x00")
        anim = chunk(b"ANIM", bytes(6))
        anmf = chunk(b"ANMF", bytes(16) + vp8_chunk)
        payload = b"WEBP" + vp8x + anim + anmf
        webp = b"RIFF" + struct.pack("<I", len(payload)) + payload
        out = webpx.decode_webp(webp)
        assert out.shape == (32, 48, 3)

    def test_anmf_frame_composites_onto_vp8x_canvas(self):
        # ADVICE r3: a first frame smaller than the canvas must decode to
        # CANVAS dimensions, placed at its x/y offset over white — not to
        # the frame's own size. Uses the pure-Python VP8L encoder so no
        # libwebp is needed.
        from tests.test_engine_webp import encode_vp8l

        fh, fw = 6, 8
        frame_rgb = np.zeros((fh, fw, 3), dtype=np.uint8)
        frame_rgb[..., 0] = 200  # solid dark red
        still = encode_vp8l(frame_rgb)
        vp8l_chunk = None
        pos = 12
        while pos + 8 <= len(still):
            tag = still[pos:pos + 4]
            (ln,) = struct.unpack("<I", still[pos + 4:pos + 8])
            if tag == b"VP8L":
                vp8l_chunk = still[pos:pos + 8 + ln + (ln % 2)]
            pos += 8 + ln + (ln % 2)
        assert vp8l_chunk

        def chunk(tag, body):
            pad = b"\x00" if len(body) % 2 else b""
            return tag + struct.pack("<I", len(body)) + body + pad

        cw, ch = 20, 16
        fx, fy = 4, 2  # stored as /2 per the container spec
        vp8x = chunk(
            b"VP8X",
            bytes([0x02, 0, 0, 0])
            + (cw - 1).to_bytes(3, "little") + (ch - 1).to_bytes(3, "little"),
        )
        anim = chunk(b"ANIM", bytes(6))
        params = (
            (fx // 2).to_bytes(3, "little") + (fy // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little") + (fh - 1).to_bytes(3, "little")
            + (100).to_bytes(3, "little") + bytes([0])
        )
        anmf = chunk(b"ANMF", params + vp8l_chunk)
        payload = b"WEBP" + vp8x + anim + anmf
        webp = b"RIFF" + struct.pack("<I", len(payload)) + payload
        out = webpx.decode_webp(webp)
        assert out.shape == (ch, cw, 3)
        assert np.array_equal(out[fy:fy + fh, fx:fx + fw], frame_rgb)
        mask = np.ones((ch, cw), dtype=bool)
        mask[fy:fy + fh, fx:fx + fw] = False
        assert (out[mask] == 255).all()  # white background everywhere else

    def test_animated_without_frames_still_errors(self):
        payload = b"WEBPANIM\x06\x00\x00\x00" + bytes(6)
        webp = b"RIFF" + struct.pack("<I", len(payload)) + payload
        with pytest.raises(ValueError, match="no image chunk"):
            webpx.decode_webp(webp)

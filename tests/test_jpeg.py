"""The stdlib baseline-JPEG decoder (functions/jpeg.py, VERDICT r14 #6)
against hand-built T.81 streams: a tiny test-side ENCODER (bit writer +
byte stuffing + custom Huffman tables) produces JPEGs with known
quantized coefficients, and every expected pixel below is computed
INDEPENDENTLY from the IDCT definition — so the decoder's Huffman
decode, DC prediction, restart handling, dequantization, IDCT,
chroma upsampling and YCbCr conversion are each pinned against spec
arithmetic, not against the decoder itself."""

from __future__ import annotations

import math
import struct

import pytest

from mini_hadoop_spark.functions.jpeg import decode_baseline_jpeg

# --- minimal encoder -------------------------------------------------------
# Huffman geometry: all symbols at code length 5, code == symbol index.
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x09, 0x0A, 0x11, 0x21, 0xF0]


class _BW:
    """MSB-first bit writer with T.81 0xFF byte stuffing; pads the final
    partial byte with 1-bits (the spec's fill)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in reversed(range(nbits)):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def pad(self) -> bytes:
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def _dht(tc: int, th: int, syms: list) -> bytes:
    counts = [0] * 16
    counts[4] = len(syms)  # every symbol at length 5
    body = bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt(tq: int, q: list) -> bytes:
    body = bytes([tq]) + bytes(q)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _sof0(w: int, h: int, comps: list) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hs, vs, tq in comps:
        body += bytes([cid, hs << 4 | vs, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def _sos(comp_ids: list) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _size(v: int) -> int:
    return abs(v).bit_length()


def _emit_coeff(bw: _BW, v: int, t: int) -> None:
    bw.put(v if v >= 0 else v + (1 << t) - 1, t)


def _emit_block(bw: _BW, dc_diff: int, ac: dict) -> None:
    """ac: {zigzag position k: quantized value} — positions strictly
    ascending, runs < 16 (enough for these tests)."""
    t = _size(dc_diff)
    bw.put(DC_SYMS.index(t), 5)
    _emit_coeff(bw, dc_diff, t)
    prev = 0
    for k in sorted(ac):
        run = k - prev - 1
        s = _size(ac[k])
        bw.put(AC_SYMS.index(run << 4 | s), 5)
        _emit_coeff(bw, ac[k], s)
        prev = k
    bw.put(AC_SYMS.index(0x00), 5)  # EOB


def _make_gray(w, h, q, dc_quantized, ac_per_block=None, ri=0):
    """Grayscale baseline JPEG; dc_quantized = per-block DC values in
    MCU raster order (DC diffs derived here, resetting at restarts)."""
    head = (
        b"\xff\xd8"
        + _dqt(0, q)
        + _sof0(w, h, [(1, 1, 1, 0)])
        + _dht(0, 0, DC_SYMS)
        + _dht(1, 0, AC_SYMS)
    )
    if ri:
        head += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    head += _sos([1])
    scan = bytearray()
    bw = _BW()
    pred = 0
    for i, dc in enumerate(dc_quantized):
        if ri and i and i % ri == 0:
            scan += bw.pad()
            scan += bytes([0xFF, 0xD0 + ((i // ri - 1) % 8)])
            bw = _BW()
            pred = 0
        _emit_block(bw, dc - pred, (ac_per_block or {}).get(i, {}))
        pred = dc
    scan += bw.pad()
    return head + bytes(scan) + b"\xff\xd9"


def _clamp(v: float) -> int:
    return 0 if v < 0 else (255 if v > 255 else int(v + 0.5))


# --- tests ------------------------------------------------------------------

def test_gray_multi_mcu_dc_prediction():
    """4 MCUs, distinct DCs, q0=16: a DC-only block IDCTs to the
    constant DC_dequant/8 + 128 (independent arithmetic)."""
    q = [16] + [1] * 63
    dcs = [8, 16, -8, 0]
    w, h, px = decode_baseline_jpeg(_make_gray(16, 16, q, dcs))
    assert (w, h, len(px)) == (16, 16, 256)
    expect = [_clamp(dc * 16 / 8 + 128) for dc in dcs]  # 144 160 112 128
    for y in range(16):
        for x in range(16):
            block = (y // 8) * 2 + (x // 8)
            v = expect[block]
            assert px[y * 16 + x] == (v, v, v), (x, y)


def test_gray_restart_interval_resets_prediction():
    """Same image, ri=1: every MCU is preceded by RSTn and the DC
    predictor resets — decoded pixels must be identical to the
    no-restart stream's."""
    q = [16] + [1] * 63
    dcs = [8, 16, -8, 0]
    plain = decode_baseline_jpeg(_make_gray(16, 16, q, dcs))
    rst = decode_baseline_jpeg(_make_gray(16, 16, q, dcs, ri=1))
    assert rst == plain


def test_gray_single_ac_coefficient_matches_idct_definition():
    """One AC coefficient (u=1, v=0) value 100, q=1: expected pixels
    computed straight from the T.81 IDCT formula with math.cos."""
    payload = _make_gray(8, 8, [1] * 64, [0], ac_per_block={0: {1: 100}})
    w, h, px = decode_baseline_jpeg(payload)
    inv_sqrt2 = 1 / math.sqrt(2)
    for y in range(8):
        for x in range(8):
            f = 0.25 * inv_sqrt2 * 100 * math.cos((2 * x + 1) * math.pi / 16)
            v = _clamp(f + 128)
            assert px[y * 8 + x] == (v, v, v), (x, y)


def test_color_420_upsampling_and_ycbcr():
    """16x16 4:2:0: one MCU = 4 Y blocks + 1 Cb + 1 Cr.  Uniform
    DC-only planes -> every output pixel is the same YCbCr triple run
    through the JFIF conversion, computed here independently."""
    q = [16] + [1] * 63
    head = (
        b"\xff\xd8"
        + _dqt(0, q)
        + _sof0(16, 16, [(1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0)])
        + _dht(0, 0, DC_SYMS)
        + _dht(1, 0, AC_SYMS)
        + _sos([1, 2, 3])
    )
    bw = _BW()
    pred = 0
    for dc in (8, 8, 8, 8):  # Y blocks: diff 8 then 0,0,0
        _emit_block(bw, dc - pred, {})
        pred = dc
    _emit_block(bw, -8, {})  # Cb
    _emit_block(bw, 8, {})  # Cr
    payload = head + bw.pad() + b"\xff\xd9"
    w, h, px = decode_baseline_jpeg(payload)
    assert (w, h, len(px)) == (16, 16, 256)
    yv, cb, cr = 128 + 16, 128 - 16, 128 + 16  # dequant DC/8 + 128
    want = (
        _clamp(yv + 1.402 * (cr - 128)),
        _clamp(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        _clamp(yv + 1.772 * (cb - 128)),
    )
    assert set(px) == {want}


def test_mjpeg_fixture_frames_decode_uniform_gray():
    """The committed MJPEG fixture's two hand-built frames (DC diff 0,
    EOB) decode to exactly 8x8 mid-gray each — the pinned pixel stats
    behind the un-gated video decode arm."""
    from pathlib import Path

    from mini_hadoop_spark.operators.multimodal import demux_video_frames

    data = Path(__file__).parent.joinpath("fixtures", "clip_2frames_mjpeg.avi").read_bytes()
    for frame in demux_video_frames(data):
        w, h, px = decode_baseline_jpeg(frame)
        assert (w, h) == (8, 8)
        assert set(px) == {(128, 128, 128)}


def test_loud_failures():
    """Outside the baseline profile the decoder must raise, never stub:
    progressive -> NotImplementedError; non-JPEG / truncated / corrupt
    -> ValueError."""
    with pytest.raises(ValueError, match="missing SOI"):
        decode_baseline_jpeg(b"BMnot-a-jpeg")
    q = [1] * 64
    good = _make_gray(8, 8, q, [0])
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_baseline_jpeg(progressive)
    with pytest.raises(ValueError):
        decode_baseline_jpeg(good[:40])  # truncated mid-tables
    # entropy data cut off mid-scan
    sos_at = good.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_baseline_jpeg(good[: sos_at + 10])
    # 4-component (CMYK-style) frames are out of profile
    with pytest.raises(NotImplementedError, match="1/3-component"):
        decode_baseline_jpeg(
            b"\xff\xd8"
            + _dqt(0, q)
            + _sof0(8, 8, [(1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0), (4, 1, 1, 0)])
        )


def test_real_image_features_jpeg_arm_without_pil():
    """_real_image_features must route JPEG payloads through the stdlib
    decoder when PIL is absent (in this container it always is): a
    uniform mid-gray JPEG gives the one-hot bin-4 luma histogram —
    byte-identical to what the PIL arm computes for the same image."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed — the PIL arm handles JPEG here")
    except ImportError:
        pass
    from mini_hadoop_spark.operators.multimodal import FEATURE_DIM, decode_payload

    payload = _make_gray(8, 8, [16] + [1] * 63, [0])
    feats = decode_payload(payload, "image")
    assert len(feats) == FEATURE_DIM
    assert feats[4] == pytest.approx(1.0)


def test_fill_bytes_before_markers_decode():
    """T.81 B.1.1.2: markers may be padded with 0xFF fill bytes — a
    spec-legal stream with fill before DQT/SOF must still decode
    (r15 code review)."""
    good = _make_gray(8, 8, [16] + [1] * 63, [8])
    padded = good.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xc0", b"\xff\xff\xc0", 1
    )
    assert decode_baseline_jpeg(padded) == decode_baseline_jpeg(good)


def test_truncated_segments_raise_valueerror_not_struct_error():
    """Any truncation must surface as ValueError, never struct.error /
    IndexError (r15 code review: the mapInPandas contract)."""
    good = _make_gray(8, 8, [1] * 64, [0])
    for cut in (3, 5, 21, 40, len(good) // 2):
        with pytest.raises(ValueError):
            decode_baseline_jpeg(good[:cut])
    # SOI + SOF0 marker with the length bytes cut off
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"\xff\xd8\xff\xc0\x00")


def test_adobe_rgb_passthrough_skips_ycbcr_matrix():
    """A 3-component stream with literal 'R','G','B' component ids (the
    Adobe-RGB shape) decodes as straight RGB — no color matrix applied
    (r15 code review: previously silently miscolored)."""
    q = [16] + [1] * 63
    head = (
        b"\xff\xd8"
        + _dqt(0, q)
        + _sof0(8, 8, [(0x52, 1, 1, 0), (0x47, 1, 1, 0), (0x42, 1, 1, 0)])  # R G B
        + _dht(0, 0, DC_SYMS)
        + _dht(1, 0, AC_SYMS)
        + _sos([0x52, 0x47, 0x42])
    )
    bw = _BW()
    for dc in (8, -8, 0):  # R=144, G=112, B=128 planes (DC-only)
        _emit_block(bw, dc, {})
    payload = head + bw.pad() + b"\xff\xd9"
    w, h, px = decode_baseline_jpeg(payload)
    assert set(px) == {(144, 112, 128)}


def test_png_truncated_chunks_raise_valueerror():
    from mini_hadoop_spark.functions.png import decode_png_rgb

    import struct as _s
    import zlib as _z

    ihdr = _s.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    body = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    # CRC missing entirely -> short unpack must convert to ValueError
    with pytest.raises(ValueError):
        decode_png_rgb(b"\x89PNG\r\n\x1a\n" + body)


def test_fill_bytes_before_restart_marker_decode():
    """T.81 B.1.1.2 again, now in the entropy stream: 0xFF fill bytes
    immediately before an RSTn marker are spec-legal and must decode
    identically (ADVICE r15: restart() previously required the marker
    at the exact byte-aligned position)."""
    q = [16] + [1] * 63
    dcs = [8, 16, -8, 0]
    good = _make_gray(16, 16, q, dcs, ri=1)
    padded = good
    for n in range(3):  # pad every RSTn in the stream
        padded = padded.replace(bytes([0xFF, 0xD0 + n]), bytes([0xFF, 0xFF, 0xD0 + n]))
    assert padded != good
    assert decode_baseline_jpeg(padded) == decode_baseline_jpeg(good)


def test_sof_zero_sampling_factor_raises_valueerror():
    """A corrupt SOF declaring 0 sampling factors must surface as
    ValueError, not ZeroDivisionError escaping the corrupt-stream
    boundary (ADVICE r15)."""
    good = _make_gray(8, 8, [16] + [1] * 63, [8])
    sof_comp = struct.pack(">BBB", 1, 0x11, 0)  # cid=1, h=1, v=1, tq=0
    bad_comp = struct.pack(">BBB", 1, 0x00, 0)  # h=0, v=0
    assert good.count(sof_comp) >= 1
    bad = good.replace(sof_comp, bad_comp, 1)
    with pytest.raises(ValueError, match="sampling factors"):
        decode_baseline_jpeg(bad)

"""Unit tests for the stdlib baseline JPEG codec (operators.jpeg).

JPEG is lossy, so correctness is asserted through measured reconstruction
bounds on analytically chosen inputs: solid colors are DC-only blocks and
must survive q100 quantization within ±1-2; smooth gradients bound the AC
path; noise bounds the full pipeline loosely. Structural paths (chroma
subsampling MCU interleave, restart markers + DC predictor reset, odd
dimensions / edge crop, ZRL runs) each get a dedicated drive.
"""

import numpy as np
import pytest

from spark_sql_flow_plugin_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _maxerr(a, b):
    return int(np.abs(a.astype(np.int64) - b.astype(np.int64)).max())


def test_solid_color_444_is_near_exact():
    img = np.full((8, 8, 3), [200, 30, 90], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (8, 8, 3)
    assert _maxerr(out, img) <= 1


def test_solid_color_420_with_restarts():
    img = np.full((40, 56, 3), [12, 200, 64], dtype=np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, quality=95, subsample=True, restart_interval=2)
    )
    assert out.shape == (40, 56, 3)
    assert _maxerr(out, img) <= 1


def test_smooth_gradient_bound():
    yy, xx = np.mgrid[0:64, 0:48]
    img = np.stack(
        [np.clip(yy * 2, 0, 255), np.clip(xx * 3, 0, 255), np.clip(yy + xx, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert _maxerr(out, img) <= 4


def test_noise_roundtrip_bounded():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 12  # lossy but sane; a broken path lands ~70+


def test_odd_dimensions_crop():
    img = np.full((17, 23, 3), [255, 255, 0], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert out.shape == (17, 23, 3)
    assert _maxerr(out, img) <= 2


def test_long_zero_runs_exercise_zrl():
    # one bright pixel in a black image: AC spectrum is dense, but a black
    # second block is all-zero after the DC diff — drives EOB + ZRL paths
    img = np.zeros((8, 32, 3), dtype=np.uint8)
    img[3, 4] = [255, 255, 255]
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (8, 32, 3)
    assert int(out[3, 4].astype(int).min()) > 150  # the spike survives
    assert int(out[:, 16:, :].max()) <= 4  # black stays black


def test_relabeled_sequential_scan_rejected_loudly():
    payload = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    # flip SOF0 (FFC0) to SOF2 (FFC2): the sequential scan header (Ss=0,
    # Se=63) violates T.81 G.1.1.1.1 for progressive, so the decoder must
    # refuse loudly instead of mis-decoding AC data as a DC scan
    idx = payload.find(b"\xff\xc0")
    payload[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnope")


def test_decode_image_routes_jpeg():
    from spark_sql_flow_plugin_spark.operators.multimodal import decode_image

    img = np.full((8, 8, 3), [10, 250, 33], dtype=np.uint8)
    out = decode_image(encode_jpeg(img, quality=100))
    assert _maxerr(np.asarray(out), img) <= 1


def test_truncated_entropy_stream_raises_valueerror():
    payload = encode_jpeg(np.full((24, 24, 3), 128, dtype=np.uint8), quality=90)
    # chop inside the entropy-coded data (before the EOI)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) - 10] + b"\xff\xd9")


def test_dqt_payload_is_annex_k_in_zigzag_order():
    # the DQT segment must carry the Annex K luminance table in zigzag
    # order (quality 50 = unscaled): spec decoders dequantize by zigzag
    # position, so a raster-order payload would scramble the weighting
    from spark_sql_flow_plugin_spark.operators.jpeg import QUANT_LUMA, ZIGZAG

    payload = encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8), quality=50)
    i = payload.find(b"\xff\xdb")
    table = np.frombuffer(payload[i + 5 : i + 5 + 64], dtype=np.uint8)
    assert (table == QUANT_LUMA[ZIGZAG]).all()


def test_fill_bytes_before_markers_are_consumed():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker;
    # inject one before every segment marker of a valid stream
    img = np.full((8, 8, 3), [77, 150, 20], dtype=np.uint8)
    payload = encode_jpeg(img, quality=100)
    out = bytearray(payload[:2])
    i = 2
    while i < len(payload):
        if payload[i] == 0xFF and payload[i + 1] in (0xDB, 0xC0, 0xC4, 0xDA):
            out.append(0xFF)  # fill byte
        out.append(payload[i])
        i += 1
    decoded = decode_jpeg(bytes(out))
    assert _maxerr(decoded, img) <= 1


def test_cmyk_component_count_gates_loudly():
    payload = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    i = payload.index(b"\xff\xc0")
    payload[i + 9] = 4  # claim 4 components (CMYK) in SOF0
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


# ---------------------------------------------------------------------------
# progressive (SOF2) — the scan script quantizes identically to baseline,
# so progressive decode must match baseline decode EXACTLY, pixel for pixel
# ---------------------------------------------------------------------------

from spark_sql_flow_plugin_spark.operators.jpeg import (  # noqa: E402
    encode_jpeg_progressive,
)


def _assert_prog_equals_baseline(img, quality=85, subsample=False):
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsample=subsample)
    )
    assert np.array_equal(base, prog)


def test_progressive_solid_color_444():
    _assert_prog_equals_baseline(
        np.full((8, 8, 3), [200, 30, 90], dtype=np.uint8), quality=100
    )


def test_progressive_noise_420_odd_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    _assert_prog_equals_baseline(img, quality=75, subsample=True)


def test_progressive_gradient_exercises_eob_runs():
    # smooth gradient: most high-frequency bands are zero after the Al=1
    # point transform, so whole-block EOB runs span many blocks in the
    # first AC scans, and refinement adds them back bit by bit
    yy, xx = np.mgrid[0:64, 0:80]
    img = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, ((yy + xx)) % 256], axis=-1
    ).astype(np.uint8)
    _assert_prog_equals_baseline(img, quality=90)
    _assert_prog_equals_baseline(img, quality=90, subsample=True)


def test_progressive_spike_exercises_zrl_refinement():
    # isolated spikes produce sparse AC spectra: long zero-history runs
    # with embedded correction bits — the ZRL branch of AC refinement
    img = np.zeros((16, 40, 3), dtype=np.uint8)
    img[3, 4] = [255, 255, 255]
    img[12, 33] = [0, 255, 0]
    _assert_prog_equals_baseline(img, quality=95)


def test_progressive_dc_only_scans_give_blocky_preview():
    # decoding only the DC scans (truncate before the first AC scan) is
    # the progressive contract: a valid, coarse image — every 8x8 block
    # must be flat and near the block mean of the original
    img = np.full((16, 16, 3), [120, 60, 200], dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=95)
    # find the second SOS (first AC scan) and truncate there, append EOI
    first_sos = payload.index(b"\xff\xda")
    second_sos = payload.index(b"\xff\xda", first_sos + 2)
    truncated = payload[:second_sos] + b"\xff\xd9"
    out = decode_jpeg(truncated)
    assert out.shape == (16, 16, 3)
    assert _maxerr(out, img) <= 6  # DC carries the solid color


def test_progressive_grayscale_relabel_rejected():
    # Ss>0 scan with >1 component is invalid per T.81 — covered by the
    # relabel test above; here: band outside [0,63] must also gate
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive(img))
    # corrupt the first AC scan's Se byte to 200
    first_sos = payload.index(b"\xff\xda")
    second_sos = payload.index(b"\xff\xda", first_sos + 2)
    seg_len = int.from_bytes(payload[second_sos + 2 : second_sos + 4], "big")
    # scan header: [len][ns][cid tdta]*ns [Ss][Se][AhAl] — Se is at -2
    payload[second_sos + 2 + seg_len - 2] = 200
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_missing_huffman_table_raises_valueerror():
    # SOS referencing an undefined DHT id must fail with the documented
    # error type, not AttributeError/KeyError (both baseline and
    # progressive route through the same gate)
    for enc in (encode_jpeg, encode_jpeg_progressive):
        payload = bytearray(enc(np.zeros((8, 8, 3), dtype=np.uint8)))
        sos_at = payload.index(b"\xff\xda")
        # component 1's Td/Ta byte: point at table id 9 (never defined)
        payload[sos_at + 6] = 0x99
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))


def test_progressive_truncated_before_eoi_reconstructs_partial():
    """A progressive stream cut off mid-way still yields an image from the
    scans decoded so far (lower fidelity by design), instead of the
    misleading 'no SOS segment found' error."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=95)
    # find the second SOS marker and truncate just before it: at least one
    # full scan (the DC scan) has been decoded at that point
    sos_positions = []
    i = 2
    while i < len(payload) - 1:
        if payload[i] == 0xFF and payload[i + 1] == 0xDA:
            sos_positions.append(i)
        i += 1
    assert len(sos_positions) >= 2
    truncated = bytes(payload[: sos_positions[1]])
    out = decode_jpeg(truncated)
    assert out.shape == img.shape
    # DC-only preview: not pixel-equal to the original, but correlated
    assert abs(int(out.mean()) - int(img.mean())) < 40


def test_progressive_truncated_mid_header_raises_truncation_error():
    """Truncation that leaves decoded scans but no usable tail must raise
    the truncation diagnostic, not 'no SOS segment found'."""
    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=90)
    # strip the trailing EOI marker (last 2 bytes) — scans all decoded,
    # loop falls out without EOI: partial reconstruction must still work
    assert payload[-2:] == b"\xff\xd9"
    out = decode_jpeg(payload[:-2])
    assert out.shape == img.shape

"""Multimodal plumbing (binary columns, mapInPandas batch shape, stub gates)
and Structured Streaming behaviors."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_sql_flow_plugin_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    encode_bmp,
    encode_png,
    encode_ppm,
    with_binary_payload,
)
from spark_sql_flow_plugin_spark.registry import queries
from spark_sql_flow_plugin_spark.sources import load


def test_decode_stubs_are_gated():
    # baseline JPEG decodes natively since round 5 (operators.jpeg);
    # malformed JPEG bytes fail loudly with ValueError...
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0...")
    # ...PROGRESSIVE JPEG (SOF2) decodes natively since round 5, so the
    # routing check lives with the codec tests; a relabeled sequential
    # stream (invalid progressive scan header) still fails loudly
    import numpy as np

    from spark_sql_flow_plugin_spark.operators.jpeg import encode_jpeg

    relabeled = bytearray(encode_jpeg(np.zeros((8, 8, 3), dtype=np.uint8)))
    relabeled[relabeled.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_image(bytes(relabeled))
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF...")
    # PNG decodes natively for all 8/16-bit color types (incl. Adam7) since
    # round 5; sub-8-bit depths (here: 4-bit grayscale) must still gate,
    # not mis-decode
    import zlib

    ihdr = (1).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([4, 0, 0, 0, 0])
    gray = (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big")
        + b"IHDR"
        + ihdr
        + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
    )
    with pytest.raises(NotImplementedError):
        decode_image(gray)


def test_ppm_bmp_round_trip():
    rng = np.random.default_rng(7)
    # odd width (5) exercises BMP's 4-byte row padding; bottom-up + BGR
    # storage must invert exactly
    arr = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    assert (decode_image(encode_bmp(arr)) == arr).all()


def test_png_round_trip_all_filters():
    # 7 rows => scanline filters 0,1,2,3,4,0,1: every PNG filter type's
    # reconstruction path (None/Sub/Up/Average/Paeth) must invert exactly
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    payload = encode_png(arr)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert (decode_image(payload) == arr).all()


def test_ppm_header_comments_and_whitespace():
    arr = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    raw = b"P6\n# a comment\n 2\t2\n# another\n255\n" + arr.tobytes()
    assert (decode_image(raw) == arr).all()


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_codec_round_trip_property(w, h, seed):
    # every (w, h) combination exercises a different BMP row padding
    # (w*3 mod 4) and bottom-up inversion; pixel values are arbitrary bytes
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    assert (decode_image(encode_bmp(arr)) == arr).all()
    assert (decode_image(encode_png(arr)) == arr).all()


def test_binary_payload_schema(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")["documents"]
    b = with_binary_payload(docs)
    kinds = dict(b.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:")
    row = b.first()
    assert bytes(row.payload).decode("utf-8")  # round-trips as utf-8


def test_multimodal_extract_matches_source(spark, sf_dir):
    out = queries()["multimodal_meta_extract"](spark, sf_dir)
    docs = load(spark, sf_dir, "documents")["documents"]
    joined = out.join(docs, "doc_id").where("byte_len != n_chars")
    assert joined.count() == 0  # ascii corpus: byte length == char length


def test_stream_equals_batch(spark, sf_dir):
    stream_rows = {
        (r.bucket, r.event_type, r.n_events)
        for r in queries()["stream_hourly_counts"](spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events")["events"]
    batch_rows = {
        (r.bucket, r.event_type, r.n_events)
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert stream_rows == batch_rows


def test_run_to_memory_restores_unset_conf(spark, sf_dir):
    """_run_to_memory(no_data_batches=...) must return the no-data-batch
    conf to UNSET when it was unset before, not pin it to the default
    string — otherwise a later reader can't distinguish a session-level
    override being absent vs present."""
    from spark_sql_flow_plugin_spark.streaming import events as ev_mod

    key = ev_mod._NO_DATA_KEY
    prev = spark.conf.get(key, None)
    try:
        # case 1: key unset before -> unset after
        if prev is not None:
            spark.conf.unset(key)
        src = ev_mod._read_events_stream(spark, sf_dir).where("user_id < 0")
        ev_mod._run_to_memory(
            src.groupBy("user_id").count(), "update", no_data_batches=False
        )
        assert spark.conf.get(key, None) is None

        # case 2: explicit session value before -> same value after
        spark.conf.set(key, "false")
        ev_mod._run_to_memory(
            src.groupBy("user_id").count(), "update", no_data_batches=True
        )
        assert spark.conf.get(key, None) == "false"
    finally:
        if prev is None:
            try:
                spark.conf.unset(key)
            except Exception:
                pass
        else:
            spark.conf.set(key, prev)


def test_transform_with_state_gated(spark, sf_dir):
    """The v2 stateful API registers only when protobuf is available;
    without it the builder raises the documented gate error instead of
    crashing the streaming driver worker."""
    from spark_sql_flow_plugin_spark.streaming import stateful

    if stateful._has_protobuf():
        df = stateful.stream_transform_with_state(spark, sf_dir)
        agg = {r["user_id"]: (r["n_events"], r["sum_scaled"]) for r in df.collect()}
        assert agg  # same semantics as the batch SQL oracle
    else:
        with pytest.raises(NotImplementedError):
            stateful.stream_transform_with_state(spark, sf_dir)
        from spark_sql_flow_plugin_spark.registry import queries

        assert "stream_transform_with_state" not in queries()


def test_wav_round_trip_and_gates():
    from spark_sql_flow_plugin_spark.operators.multimodal import encode_wav

    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=256, dtype=np.int16)
    wav = decode_audio(encode_wav(samples))
    assert wav.shape == (256,)
    assert np.allclose(wav * 32768.0, samples)
    # compressed audio (here: an mp3 magic) must still gate
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...")


def test_png_multi_idat_decode():
    # real PNGs split pixel data across multiple IDAT chunks; the decoder
    # must concatenate them before inflating
    import zlib

    from spark_sql_flow_plugin_spark.operators.multimodal import encode_png

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    payload = encode_png(arr)

    def chunks(b):
        pos, out = 8, []
        while pos < len(b):
            ln = int.from_bytes(b[pos : pos + 4], "big")
            out.append((b[pos + 4 : pos + 8], b[pos + 8 : pos + 8 + ln]))
            pos += 12 + ln
        return out

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    rebuilt = b"\x89PNG\r\n\x1a\n"
    for typ, data in chunks(payload):
        if typ == b"IDAT":
            mid = len(data) // 2
            rebuilt += chunk(b"IDAT", data[:mid]) + chunk(b"IDAT", data[mid:])
        else:
            rebuilt += chunk(typ, data)
    assert (decode_image(rebuilt) == arr).all()


def test_wav_multichannel_downmix():
    import io
    import wave

    left = np.array([1000, -2000, 3000], dtype="<i2")
    right = np.array([3000, 2000, -1000], dtype="<i2")
    inter = np.empty(6, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    mono = decode_audio(buf.getvalue())
    expect = (left.astype(np.float64) + right) / 2.0 / 32768.0
    assert np.allclose(mono, expect)


def test_foreach_batch_rerun_is_idempotent(spark, sf_dir):
    # dynamic partition overwrite on batch_id: re-running the whole query
    # (fresh checkpoint => same batch ids) must not double-count
    r1 = {
        (r.user_id, r.n_events)
        for r in queries()["stream_foreach_batch_totals"](spark, sf_dir).collect()
    }
    r2 = {
        (r.user_id, r.n_events)
        for r in queries()["stream_foreach_batch_totals"](spark, sf_dir).collect()
    }
    assert r1 == r2


def test_png_all_color_types_and_adam7_roundtrip():
    import numpy as np

    from spark_sql_flow_plugin_spark.operators.multimodal import (
        _decode_png,
        encode_png,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    gray = np.repeat(img[:, :, :1], 3, axis=2)
    pal = (
        rng.integers(0, 7, (17, 19, 1)) * np.array([[[11, 31, 53]]])
    ).astype(np.uint8) % 256
    cases = [
        (encode_png(img), img),
        (encode_png(img, interlace=1), img),
        (encode_png(img, color_type=0), gray),
        (encode_png(img, color_type=0, interlace=1), gray),
        (encode_png(pal, color_type=3), pal),
        (encode_png(pal, color_type=3, interlace=1), pal),
        (encode_png(img, color_type=4), gray),  # alpha dropped
        (encode_png(img, color_type=6), img),
        (encode_png(img, color_type=6, interlace=1), img),
        (encode_png(img, bit_depth=16), img),  # v*257 >> 8 == v
        (encode_png(img, color_type=0, bit_depth=16, interlace=1), gray),
    ]
    for payload, expect in cases:
        assert np.array_equal(_decode_png(payload), expect)


def test_png_sub8bit_depth_still_gates():
    import numpy as np
    import zlib

    from spark_sql_flow_plugin_spark.operators.multimodal import (
        _decode_png,
        encode_png,
    )

    payload = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    ihdr_at = payload.index(b"IHDR")
    payload[ihdr_at + 12] = 4  # claim bit depth 4
    # fix the IHDR crc so only the depth gate can reject it
    body = bytes(payload[ihdr_at : ihdr_at + 17])
    payload[ihdr_at + 17 : ihdr_at + 21] = zlib.crc32(body).to_bytes(4, "big")
    with pytest.raises(NotImplementedError):
        _decode_png(bytes(payload))


def _wav_manual(fmt_code, bits, data_bytes, n_ch=1, extensible=False):
    rate = 8000
    fmt = (
        (0xFFFE if extensible else fmt_code).to_bytes(2, "little")
        + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + rate.to_bytes(4, "little")
        + (n_ch * bits // 8).to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    if extensible:
        fmt += (22).to_bytes(2, "little") + bits.to_bytes(2, "little")
        fmt += (0).to_bytes(4, "little") + fmt_code.to_bytes(2, "little")
        fmt += b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    body = (
        b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data_bytes).to_bytes(4, "little") + data_bytes
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_wav_24bit_and_float_decode():
    rng = np.random.default_rng(9)
    v24 = rng.integers(-(1 << 23), 1 << 23, 64).astype(np.int64)
    raw = bytearray()
    for v in v24:
        raw += int(v & 0xFFFFFF).to_bytes(3, "little")
    got = decode_audio(_wav_manual(1, 24, bytes(raw)))
    assert np.allclose(got * 8388608.0, v24)

    f32 = rng.standard_normal(64).astype("<f4")
    got = decode_audio(_wav_manual(3, 32, f32.tobytes()))
    assert np.allclose(got, f32.astype(np.float64))

    f64 = rng.standard_normal(64)
    got = decode_audio(_wav_manual(3, 64, f64.astype("<f8").tobytes()))
    assert np.array_equal(got, f64)


def test_wav_extensible_header_resolves_subformat():
    rng = np.random.default_rng(4)
    s = rng.integers(-32768, 32768, 32).astype("<i2")
    got = decode_audio(_wav_manual(1, 16, s.tobytes(), extensible=True))
    assert np.allclose(got * 32768.0, s)


def test_g711_roundtrip_within_companding_bound():
    from spark_sql_flow_plugin_spark.operators.multimodal import encode_g711

    rng = np.random.default_rng(0)
    s = rng.integers(-32000, 32000, 2000).astype(np.int16)
    for law, bound in (("ulaw", 1 / 16), ("alaw", 1 / 8)):
        dec = decode_audio(encode_g711(s, law)) * 32768.0
        rel = np.abs(dec - s) / np.maximum(np.abs(s), 64)
        assert rel.max() <= bound + 1e-9, law


def test_g711_spec_anchor_values():
    # µ-law code 0xFF (and its complement pair 0x7F) is exactly 0; the
    # extreme codes hit the spec's ±32124 (µ) / ±32256 (A) full-scale
    from spark_sql_flow_plugin_spark.operators import multimodal as mm

    assert mm._ULAW_TABLE[0xFF] == 0 and mm._ULAW_TABLE[0x7F] == 0
    assert mm._ULAW_TABLE.max() == 32124 and mm._ULAW_TABLE.min() == -32124
    assert mm._ALAW_TABLE.max() == 32256 and mm._ALAW_TABLE.min() == -32256


def test_perceptual_codecs_still_gate():
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04...")
    # unknown WAV format code gates loudly instead of mis-decoding
    with pytest.raises(NotImplementedError):
        decode_audio(_wav_manual(2, 4, b"\x00\x00"))  # MS-ADPCM


def test_gif_roundtrip_all_layouts():
    from spark_sql_flow_plugin_spark.operators.multimodal import encode_gif

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 13, (37, 29))]
    assert np.array_equal(decode_image(encode_gif(img)), img)
    assert np.array_equal(decode_image(encode_gif(img, interlace=True)), img)
    pal256 = np.array(
        [[i, (i * 7) % 256, (i * 13) % 256] for i in range(256)], dtype=np.uint8
    )
    img256 = pal256[rng.integers(0, 256, (41, 43))]
    assert np.array_equal(
        decode_image(encode_gif(img256, interlace=True)), img256
    )


def test_gif_lzw_decoder_inverts_real_compression():
    # the module's writer emits literal-only LZW; a REAL greedy encoder
    # exercises dictionary growth, width changes, and the KwKwK
    # (code == next_code) special case the literal stream never produces
    from spark_sql_flow_plugin_spark.operators.multimodal import _lzw_decode

    def lzw_encode(min_code, pixels):
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1
        code_size = min_code + 1
        bits = bitlen = 0
        out = bytearray()

        def emit(c):
            nonlocal bits, bitlen, code_size
            bits |= c << bitlen
            bitlen += code_size
            while bitlen >= 8:
                out.append(bits & 0xFF)
                bits >>= 8
                bitlen -= 8

        emit(clear)
        buf = ()
        for p in pixels:
            cand = buf + (p,)
            if cand in table:
                buf = cand
                continue
            emit(table[buf])
            if next_code < 4096:
                table[cand] = next_code
                next_code += 1
                # the decoder adds each entry one code LATER than the
                # encoder (it needs the next code's first symbol), so at
                # the moment the encoder emits code k+1 the decoder has
                # one fewer entry — the encoder must therefore bump the
                # width one add AFTER the decoder's 2^cs trigger
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            buf = (p,)
        if buf:
            emit(table[buf])
        emit(eoi)
        if bitlen:
            out.append(bits & 0xFF)
        return bytes(out)

    rng = np.random.default_rng(11)
    # KwKwK stress: long runs of one symbol force code == next_code
    runs = np.repeat(rng.integers(0, 4, 40), rng.integers(1, 9, 40))
    for pixels in (
        [0, 0, 0, 0, 0, 0, 0],  # minimal KwKwK
        runs.tolist(),
        rng.integers(0, 16, 3000).tolist(),  # width growth past 9 bits
    ):
        min_code = max(2, int(np.ceil(np.log2(max(max(pixels) + 1, 2)))))
        assert _lzw_decode(min_code, lzw_encode(min_code, pixels)) == pixels


def test_ima_adpcm_roundtrip_tracks_waveform():
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        encode_ima_adpcm,
    )

    t = np.arange(4000)
    sig = (
        12000 * np.sin(2 * np.pi * t / 50) + 3000 * np.sin(2 * np.pi * t / 13)
    ).astype(np.int16)
    dec = decode_audio(encode_ima_adpcm(sig)) * 32768.0
    # the fact chunk records the true sample count: decode must NOT emit
    # the final block's zero padding as spurious samples
    assert dec.shape == (len(sig),)
    # ADPCM adapts its step from 7 upward, so the first samples of each
    # block carry a transient; steady state must track tightly
    assert np.corrcoef(dec, sig)[0, 1] > 0.99
    assert np.abs(dec - sig).mean() < 400
    assert np.abs(dec[200:] - sig[200:]).max() < 4000
    # stereo ADPCM gates loudly rather than mis-deinterleaving
    payload = bytearray(encode_ima_adpcm(sig))
    fmt_at = payload.index(b"fmt ")
    payload[fmt_at + 10] = 2  # claim 2 channels
    with pytest.raises(NotImplementedError):
        decode_audio(bytes(payload))


def test_rocksdb_state_store_runs_isolated(spark, sf_dir):
    # the RocksDB variant must produce the same totals as the default
    # provider AND leave the caller session's provider conf untouched
    before = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    rocks = {
        (r.user_id, r.n_events)
        for r in queries()["stream_rocksdb_user_totals"](spark, sf_dir).collect()
    }
    default = {
        (r.user_id, r.n_events)
        for r in queries()["stream_user_totals"](spark, sf_dir).collect()
    }
    assert rocks == default and rocks
    after = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    assert after == before


def test_tiff_roundtrip_layouts_and_gates():
    from spark_sql_flow_plugin_spark.operators.multimodal import encode_tiff

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    runs = (
        np.repeat(rng.integers(0, 5, 200), 8)[: 13 * 21 * 3].reshape(13, 21, 3)
        * 50
    ).astype(np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img)), img)
    assert np.array_equal(
        decode_image(encode_tiff(img, byte_order="big")), img
    )
    assert np.array_equal(decode_image(encode_tiff(img, packbits=True)), img)
    assert np.array_equal(decode_image(encode_tiff(runs, packbits=True)), runs)
    assert np.array_equal(
        decode_image(encode_tiff(img, rows_per_strip=64)), img
    )
    # JPEG-in-TIFF compression (7) gates loudly (LZW decodes natively)
    payload = bytearray(encode_tiff(img))
    # compression tag 259 value: find it — entry layout is deterministic
    # (4th entry, value at offset +8 within entry)
    ifd_at = 8
    entry_at = ifd_at + 2 + 3 * 12
    assert int.from_bytes(payload[entry_at : entry_at + 2], "little") == 259
    payload[entry_at + 8] = 7
    with pytest.raises(NotImplementedError):
        decode_image(bytes(payload))
    # ...and mislabeling UNCOMPRESSED strips as LZW fails loudly with the
    # documented error type, not a KeyError
    payload[entry_at + 8] = 5
    with pytest.raises(ValueError):
        decode_image(bytes(payload))


def test_tiff_lzw_roundtrip_and_predictor():
    from spark_sql_flow_plugin_spark.operators.multimodal import encode_tiff

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    # big enough to force code-width growth past 10 bits AND a table-full
    # Clear/restart inside one strip
    huge = rng.integers(0, 256, (120, 100, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_tiff(img, lzw=True)), img)
    assert np.array_equal(
        decode_image(encode_tiff(huge, lzw=True, rows_per_strip=128)), huge
    )
    assert np.array_equal(
        decode_image(
            encode_tiff(huge, lzw=True, predictor=True, rows_per_strip=128)
        ),
        huge,
    )
    assert np.array_equal(
        decode_image(encode_tiff(img, lzw=True, byte_order="big")), img
    )


def test_multi_batch_totals_actually_multi_batch(spark, sf_dir):
    """The staged 4-file source with maxFilesPerTrigger=1 must produce
    MULTIPLE real data batches — the whole point of the query is that
    keyed state evolves across batches; a silent fallback to one batch
    would make it redundant with stream_user_totals."""
    from spark_sql_flow_plugin_spark.streaming import events as ev_mod

    ev_mod.LAST_RUN.clear()
    queries()["stream_multi_batch_totals"](spark, sf_dir).count()
    assert ev_mod.LAST_RUN.get("num_batches", 0) >= 4

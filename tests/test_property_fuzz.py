"""Property-based fuzz for the round-5 algorithmic kernels.

These don't touch the oracle registry — they attack the pure-Python /
plan-construction layers with randomized inputs hypothesis shrinks to
minimal counterexamples:

- JPEG codec: random images, sizes, qualities, sampling/restart configs
  must round-trip within the lossy error model and never crash.
- Star connected-components: labels must equal a trusted union-find on
  random edge lists (the fixpoint's convergence check is exact, so a
  collision can't hide a wrong answer).
- Winnow pair counting: the df-cap must equal a brute-force reference.
"""

import numpy as np
import pytest

try:
    from hypothesis import HealthCheck, example, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from spark_sql_flow_plugin_spark.operators.jpeg import decode_jpeg, encode_jpeg

_SLOW = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@_SLOW
@given(
    h=st.integers(4, 40),
    w=st.integers(4, 40),
    quality=st.integers(60, 100),
    subsample=st.booleans(),
    restart=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
@example(h=9, w=9, quality=60, subsample=True, restart=0, seed=417).via(
    "discovered failure"
)
@example(h=9, w=9, quality=60, subsample=True, restart=0, seed=21).via(
    "dense-sweep worst case (median 17.0)"
)
def test_jpeg_roundtrip_never_crashes_and_is_bounded(
    h, w, quality, subsample, restart, seed
):
    rng = np.random.default_rng(seed)
    # smooth-ish content (block-constant): keeps the lossy error bounded
    # for any sampling config, unlike white noise
    base = rng.integers(0, 256, (max(1, h // 8) + 1, max(1, w // 8) + 1, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)[:h, :w].astype(np.uint8)
    out = decode_jpeg(
        encode_jpeg(img, quality=quality, subsample=subsample, restart_interval=restart)
    )
    assert out.shape == (h, w, 3)
    err = np.abs(out.astype(int) - img.astype(int))
    # block-constant content: every 8x8 block is a DC-dominated patch, so
    # at 4:4:4 the error is DC quantization only (dense sweep: worst
    # median 2.0, q60). Under 4:2:0 one chroma 8x8 block spans a 16x16
    # pixel area, so a COLOR BOUNDARY inside it puts energy in chroma AC
    # coefficients and q60's coarse chroma AC quantization rings across
    # the whole block — on small images (h,w <= 16) that is the entire
    # picture, with no clean interior to protect the median. Empirical
    # worst over a 4,000-roundtrip dense sweep of the worst configs
    # (9x9 / 12x10, q60, subsampled): median 17.0, mean 17.7 — bounds
    # set ~1.4x above; the two @example pins replay the discovered
    # failure (median 9.0) and the sweep worst case forever.
    if subsample:
        assert err.mean() < 28
        assert np.median(err) <= 24
    else:
        assert err.mean() < 20
        assert np.median(err) <= 8


@_SLOW
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=0,
        max_size=60,
    )
)
def test_star_components_match_union_find(spark, edges):
    from spark_sql_flow_plugin_spark.operators.dedup import _two_phase_star_labels

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    # trusted reference: plain union-find
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expect = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "u bigint, v bigint")
    labels, _rounds = _two_phase_star_labels(spark, df, npart=4)
    got = {r.node: r.comp for r in labels.collect()}
    assert got == expect


@_SLOW
@given(
    fps=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 6)),
        min_size=0,
        max_size=50,
    ),
    cap=st.integers(1, 8),
)
def test_winnow_pairs_match_bruteforce(spark, fps, cap):
    from collections import Counter
    from itertools import combinations

    from spark_sql_flow_plugin_spark.operators.dedup import _winnow_pairs

    fps = sorted(set(fps))  # per-doc fingerprints are distinct by winnowing
    if not fps:
        return
    by_f = {}
    for d, f in fps:
        by_f.setdefault(f, set()).add(d)
    pair_counts = Counter()
    for f, docs in by_f.items():
        if len(docs) > cap:
            continue  # hot fingerprint dropped
        for a, b in combinations(sorted(docs), 2):
            pair_counts[(a, b)] += 1
    expect = {p: c for p, c in pair_counts.items() if c >= 2}

    df = spark.createDataFrame(fps, "doc_id bigint, f bigint")
    got = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in _winnow_pairs(df, cap=cap).collect()
    }
    assert got == expect


# arbitrary unicode minus unpaired surrogates (not encodable to UTF-8);
# unicode line separators NEL/LS/PS are fair game — probed to survive the
# quoted-field path (see test_unicode_line_separators_roundtrip).
# NUL is excluded for the CSV fuzz only: univocity silently drops a
# literal '\0' inside quoted fields (its internal no-char sentinel) no
# matter the option set — see the contract note above _CSV_NULL in
# operators/misc.py. JSON gets its own alphabet WITH NUL below.
_TEXT_NO_NUL = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
        blacklist_characters="\x00",
    ),
    max_size=40,
)
_TEXT = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),
    ),
    max_size=40,
)


@_SLOW
@given(vals=st.lists(_TEXT_NO_NUL, min_size=1, max_size=8))
def test_csv_fidelity_roundtrips_arbitrary_unicode(spark, tmp_path_factory, vals):
    from spark_sql_flow_plugin_spark.operators.misc import (
        csv_read_fidelity,
        csv_write_fidelity,
    )

    path = str(tmp_path_factory.mktemp("csvfuzz"))
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v string")
    csv_write_fidelity(df.write.mode("overwrite")).csv(path)
    back = csv_read_fidelity(spark.read.schema("id bigint, v string")).csv(path)
    got = {r.id: r.v for r in back.collect()}
    assert got == dict(rows)


@_SLOW
@given(vals=st.lists(_TEXT, min_size=1, max_size=8))
def test_json_roundtrips_arbitrary_unicode(spark, tmp_path_factory, vals):
    path = str(tmp_path_factory.mktemp("jsonfuzz"))
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id bigint, v string")
    df.write.mode("overwrite").json(path)
    back = spark.read.schema("id bigint, v string").json(path)
    got = {r.id: r.v for r in back.collect()}
    assert got == dict(rows)


def test_unicode_line_separators_roundtrip(spark, tmp_path):
    # NEL/LS/PS are line terminators to some parsers; the fidelity option
    # set must carry them through the quoted-field path byte-exactly
    from spark_sql_flow_plugin_spark.operators.misc import (
        csv_read_fidelity,
        csv_write_fidelity,
    )

    nel, ls, ps = chr(0x85), chr(0x2028), chr(0x2029)
    rows = [(0, f"a{nel}b"), (1, f"c{ls}d"), (2, f"e{ps}f")]
    path = str(tmp_path / "nel")
    df = spark.createDataFrame(rows, "id bigint, v string")
    csv_write_fidelity(df.write.mode("overwrite")).csv(path)
    back = csv_read_fidelity(spark.read.schema("id bigint, v string")).csv(path)
    assert {r.id: r.v for r in back.collect()} == dict(rows)


@_SLOW
@given(
    h=st.integers(4, 40),
    w=st.integers(4, 40),
    quality=st.integers(60, 100),
    subsample=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_decode_equals_baseline_decode(h, w, quality, subsample, seed):
    # the progressive scan script quantizes identically to the baseline
    # writer, so for ANY image the two streams must decode to IDENTICAL
    # pixels — a bit-exact cross-check of every Annex G scan path (DC/AC
    # first + refinement, EOB runs, spectral bands) against the
    # well-tested sequential path
    from spark_sql_flow_plugin_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality, subsample=subsample))
    assert np.array_equal(base, prog)


@_SLOW
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    n_colors=st.integers(1, 8),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, n_colors, interlace, seed):
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        _decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    img = palette[rng.integers(0, n_colors, (h, w))]
    assert np.array_equal(_decode_gif(encode_gif(img, interlace=interlace)), img)


@_SLOW
@given(
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    mode=st.sampled_from(["plain", "packbits", "lzw", "lzw_pred"]),
    byte_order=st.sampled_from(["little", "big"]),
    rows_per_strip=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_tiff_roundtrip_property(h, w, mode, byte_order, rows_per_strip, seed):
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        _decode_tiff,
        encode_tiff,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = encode_tiff(
        img,
        packbits=mode == "packbits",
        lzw=mode in ("lzw", "lzw_pred"),
        predictor=mode == "lzw_pred",
        byte_order=byte_order,
        rows_per_strip=rows_per_strip,
    )
    assert np.array_equal(_decode_tiff(payload), img)


@_SLOW
@given(
    n=st.integers(1, 600),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_g711_roundtrip_property(n, law, seed):
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        decode_audio,
        encode_g711,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    dec = decode_audio(encode_g711(s, law)) * 32768.0
    assert dec.shape == (n,)
    # error sources: half the largest inter-level gap (512 for both laws'
    # top segment) and full-scale clipping. int16 is asymmetric: u-law max
    # level is +/-32124, so +32767 clips by 643 but -32768 clips by 644;
    # A-law max +/-32256 clips -32768 by 512.
    assert np.abs(dec - s).max() <= 644


def test_g711_int16_extremes_deterministic():
    # pin the asymmetric int16 extremes so the 644 bound above is exercised
    # on every run, not only when hypothesis happens to draw -32768
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        decode_audio,
        encode_g711,
    )

    s = np.array([-32768, -32767, 32766, 32767], dtype=np.int16)
    for law, bound in (("ulaw", 644), ("alaw", 512)):
        dec = decode_audio(encode_g711(s, law)) * 32768.0
        err = np.abs(dec - s)
        assert err.max() <= bound, (law, err)
    # the ulaw -32768 case is exactly the 644 worst case (decodes to -32124)
    dec_u = decode_audio(encode_g711(s, "ulaw")) * 32768.0
    assert abs(dec_u[0] - (-32768)) == 644


@_SLOW
@given(
    n=st.integers(1, 1500),
    block_align=st.sampled_from([64, 128, 256]),
    seed=st.integers(0, 2**31 - 1),
)
def test_ima_adpcm_length_exact_property(n, block_align, seed):
    # whatever the signal/block geometry, decode emits EXACTLY n samples
    # (the fact chunk), never block padding
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        decode_audio,
        encode_ima_adpcm,
    )

    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    dec = decode_audio(encode_ima_adpcm(s, block_align=block_align))
    assert dec.shape == (n,)

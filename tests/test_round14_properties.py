"""Round-14 property tests.

(a) The `events_decay_engagement` shift clamp (r13 ADVICE, medium): an
    event >= 63 half-lives older than the corpus max timestamp used to
    blow up the oracle (DuckDB raises OutOfRangeException on
    1::BIGINT << 63) while Spark's `shiftleft` masks the shift count
    mod 64 (Java semantics) — so a 64-half-life-old event silently
    contributed at FULL face value.  The committed events fixture spans
    ~30 days (k <= 4), which is exactly why this was never caught by
    the oracle matrix.  This test plants an ancient event on a private
    fixture, runs BOTH engines end-to-end, and keeps a negative-control
    witness of the unclamped Spark expression producing the wrong
    answer.
"""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_sql_flow_plugin_spark.operators.timeseries import (
    _DECAY_HALF_LIFE_US,
    _DECAY_SQL,
    events_decay_engagement,
)

_US = 1_000_000


def _write_events(path, rows):
    """rows: list of (event_id, ts_us, user_id, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "events.parquet"))


@pytest.fixture()
def ancient_events_dir(tmp_path):
    now_us = 1_700_000_000 * _US
    rows = [
        # user 1: one fresh event (k=0) + one 64-half-life-old event.
        (1, now_us, 1, 10.0),
        (2, now_us - 64 * _DECAY_HALF_LIFE_US, 1, 50.0),
        # user 2: k exactly 63 (the first DuckDB-fatal bucket pre-fix).
        (3, now_us - 63 * _DECAY_HALF_LIFE_US, 2, 7.0),
        (4, now_us, 2, 3.0),
        # user 3: k exactly 62 (clamp boundary, contribution still 0).
        (5, now_us - 62 * _DECAY_HALF_LIFE_US, 3, 9.0),
        (6, now_us, 3, 2.0),
        # user 4: moderate decay, sanity that the clamp is inert below it.
        (7, now_us - 3 * _DECAY_HALF_LIFE_US, 4, 8.0),
    ]
    _write_events(str(tmp_path), rows)
    return str(tmp_path)


def test_decay_clamp_survives_ancient_events(spark, ancient_events_dir):
    got = {
        r.user_id: (r.decay_score, r.n_events, r.last_seen_us)
        for r in events_decay_engagement(spark, ancient_events_dir).collect()
    }
    # Exact expectations: ancient contributions are ZERO, fresh at face
    # value in cents.
    now_us = 1_700_000_000 * _US
    assert got[1] == (1000, 2, now_us)  # 50.0 from k=64 contributes 0
    assert got[2] == (300, 2, now_us)  # k=63 contributes 0
    assert got[3] == (200, 2, now_us)  # k=62: 900 >> 62 == 0
    assert got[4] == (100, 1, now_us - 3 * _DECAY_HALF_LIFE_US)

    # The oracle must now RUN (pre-clamp it raised OutOfRangeException)
    # and agree bit-for-bit.
    con = duckdb.connect()
    pq_path = os.path.join(ancient_events_dir, "events.parquet")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq_path}')"
    )
    oracle = {
        int(u): (int(s), int(n), int(l))
        for u, s, n, l in con.execute(_DECAY_SQL).fetchall()
    }
    assert oracle == got


def test_decay_unclamped_witness(spark, ancient_events_dir):
    # Negative control pinning WHY the clamp exists: Spark's shiftleft
    # masks the count mod 64, so the unclamped expression counts a
    # 64-half-life-old event (k=64 -> shift by 0) at FULL face value.
    from pyspark.sql import functions as F

    from spark_sql_flow_plugin_spark.sources import load

    ev = load(spark, ancient_events_dir, "events")["events"]
    now_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    bad = (
        ev.select(
            "user_id",
            F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
            F.expr(
                f"CAST(({now_us} - unix_micros(ts)) DIV"
                f" {_DECAY_HALF_LIFE_US} AS BIGINT)"
            ).alias("k"),
        )
        .where("user_id = 1")
        .selectExpr(
            "SUM(cents DIV shiftleft(CAST(1 AS BIGINT), CAST(k AS INT)))"
            " AS unclamped"
        )
        .collect()[0]
        .unclamped
    )
    # 10.0 fresh + the 50.0 ancient event wrongly at face value.
    assert bad == 6000


# ---------------------------------------------------------------------------
# multimodal_phash_neardup (r13 verdict item #2)
# ---------------------------------------------------------------------------


def test_phash_witness_md5_misses_phash_catches():
    # The planted witness: the SAME image re-encoded lossily produces a
    # byte-different payload (exact/md5 dedup misses the pair) while the
    # dHash is bit-identical (perceptual dedup catches it).
    import hashlib

    from spark_sql_flow_plugin_spark.operators.jpeg import encode_jpeg
    from spark_sql_flow_plugin_spark.operators.multimodal import (
        decode_image,
        dhash64,
        encode_bmp,
        phash_image,
    )

    pixels_moved = False
    for did in (0, 8, 1024, 77776):
        arr = phash_image(did)
        lossless = encode_bmp(arr)
        lossy = encode_jpeg(arr, quality=90, subsample=False)
        lossy75 = encode_jpeg(arr, quality=75, subsample=False)
        assert hashlib.md5(lossless).hexdigest() != hashlib.md5(lossy).hexdigest()
        h0 = dhash64(decode_image(lossless))
        h1 = dhash64(decode_image(lossy))
        assert h0 == h1, f"doc {did}: lossy re-encode flipped dHash bits"
        # even a much harsher re-encode stays within the near-dup budget
        h2 = dhash64(decode_image(lossy75))
        assert bin(h0 ^ h2).count("1") <= 2, did
        # quantization must actually move pixels SOMEWHERE in the sweep
        # (flat 8x8 cells can survive q90's DC quantizer exactly, so the
        # lossiness probe uses the harsher q75 table and any-doc scope)
        pixels_moved = pixels_moved or bool((decode_image(lossy75) != arr).any())
    assert pixels_moved, "q75 re-encode reconstructed every doc bit-exactly"


@pytest.mark.parametrize("salt", [0, 0x5A1DAD10], ids=["image", "audio"])
def test_phash_cross_doc_min_distance_over_committed_ranges(salt):
    # Exactness of the registry oracle hinges on NO cross-doc pair within
    # Hamming 2. Banding (4 x 16 bits) is complete for d <= 3, so checking
    # band-equal pairs is a PROOF, not a sample. Sweep every selected
    # doc_id through the sf1 range with margin (0..1,200,000), once per
    # modality salt (image dHash / audio energy fingerprint).
    import numpy as np

    from spark_sql_flow_plugin_spark.operators.multimodal import (
        _PH_SALT_AUDIO,
        _PH_SALT_IMAGE,
        _PH_SEL_MOD,
        _splitmix64,
    )

    assert salt in (_PH_SALT_IMAGE, _PH_SALT_AUDIO)
    # The sweep bound must dominate every doc_id any committed SF (and
    # the derived sf1 set) can select — hard-coding 1.2M silently
    # unproves the oracle if a future SF's ids outgrow it (r14 ADVICE),
    # so derive the requirement from the data on disk and keep margin.
    import glob
    import os

    import duckdb

    paths = glob.glob("/root/testdata/sf*/documents.parquet") + glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "testdata",
                     "sf*", "documents.parquet")
    )
    if not paths:
        # max_doc defaulting to 0 would make the dominance assertion
        # pass vacuously, silently un-proving the property (r15 ADVICE).
        pytest.skip(
            "no documents.parquet found under /root/testdata or "
            "./testdata — sweep-bound dominance cannot be checked here"
        )
    max_doc = 0
    for p in paths:
        max_doc = max(
            max_doc,
            duckdb.sql(
                f"SELECT max(doc_id) FROM read_parquet('{p}')"
            ).fetchone()[0],
        )
    sweep_hi = 1_200_000
    assert sweep_hi >= 2 * max_doc + 1, (
        f"sweep bound {sweep_hi} no longer dominates max doc_id {max_doc} "
        "(x2 margin for derived-SF replication) — extend the proof range"
    )
    ids = np.arange(0, sweep_hi, _PH_SEL_MOD, dtype=np.uint64)
    h = _splitmix64(ids ^ np.uint64(salt))
    mind = 64
    for k in range(4):
        band = ((h >> np.uint64(16 * k)) & np.uint64(0xFFFF)).astype(np.int64)
        order = np.argsort(band, kind="stable")
        bs, hs = band[order], h[order]
        starts = np.flatnonzero(np.r_[True, np.diff(bs) != 0])
        ends = np.r_[starts[1:], len(bs)]
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            x = hs[s:e, None] ^ hs[None, s:e]
            cnt = np.zeros_like(x, dtype=np.int64)
            for _ in range(64):
                cnt += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            np.fill_diagonal(cnt, 64)
            mind = min(mind, int(cnt.min()))
    assert mind >= 3, f"cross-doc collision risk: min banded distance {mind}"


def test_audio_fingerprint_witness_md5_misses_afp_catches():
    # Audio twin of the pHash witness: PCM vs G.711 µ-law payloads are
    # byte-different (md5 dedup misses the pair), fingerprints identical;
    # the harsher A-law and IMA ADPCM re-encodes stay within the near-dup
    # Hamming budget — and lossy really moves SAMPLES somewhere.
    import hashlib

    import numpy as np

    from spark_sql_flow_plugin_spark.operators.multimodal import (
        afp64,
        afp_samples,
        decode_audio,
        encode_g711,
        encode_ima_adpcm,
        encode_wav,
    )

    samples_moved = False
    for did in (0, 8, 1024, 77776):
        pcm = afp_samples(did)
        lossless = encode_wav(pcm)
        ulaw = encode_g711(pcm, law="ulaw")
        assert hashlib.md5(lossless).hexdigest() != hashlib.md5(ulaw).hexdigest()
        h0 = afp64(decode_audio(lossless))
        h1 = afp64(decode_audio(ulaw))
        assert h0 == h1, f"doc {did}: µ-law re-encode flipped fingerprint bits"
        for harsher in (
            encode_g711(pcm, law="alaw"),
            encode_ima_adpcm(pcm),
        ):
            h2 = afp64(decode_audio(harsher))
            assert bin(h0 ^ h2).count("1") <= 2, did
        dec = np.rint(decode_audio(ulaw) * 32768.0).astype(np.int64)
        samples_moved = samples_moved or bool(
            (dec != pcm.astype(np.int64)).any()
        )
    assert samples_moved, "µ-law re-encode reconstructed every doc exactly"


@pytest.mark.parametrize(
    "qname",
    ["multimodal_phash_neardup", "multimodal_audio_fingerprint_neardup"],
)
def test_phash_plan_banded_no_allpairs(spark, sf_dir, qname):
    # Scale gate: candidates come from the banded equi-join (hash keys
    # band+val), never an all-pairs product; the codec pipeline is pinned
    # behind one InMemoryTableScan (no duplicate mapInPandas subtree).
    from spark_sql_flow_plugin_spark.registry import queries

    df = queries()[qname](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan
    # the codec pipeline must exist ONCE: the formatted tree re-prints the
    # cached subtree under each InMemoryRelation consumer, so count
    # distinct NODE IDs — one AQE cached plan contributes at most two
    # (its == Final == and == Initial == renderings share ids per plan)
    mip_ids = set(re.findall(r"MapInPandas \((\d+)\)", plan))
    assert len(mip_ids) <= 2, f"codec subtree duplicated: nodes {mip_ids}"
    join_ids = set(
        re.findall(
            r"(?:SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)[^(]*\((\d+)\)",
            plan,
        )
    )
    assert len(join_ids) == 1  # exactly the banded candidate join


def test_mixture_weights_python_reference(spark, sf_dir):
    # Exact integer re-computation with python ints + math.sqrt (IEEE
    # correctly-rounded, same as both engines), then the identical
    # float expression tree — every cell must match bit-for-bit.
    import math
    import re

    import pyarrow.parquet as pq

    from spark_sql_flow_plugin_spark.operators.curation import (
        _MIX_BUDGET,
        _MIX_Q,
        corpus_mixture_temperature,
    )

    rows = corpus_mixture_temperature(spark, sf_dir).collect()
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    ws = re.compile(r"[ \t\n\x0b\f\r]+")  # ASCII whitespace (Java/RE2 \s)
    n_docs, n_tok = {}, {}
    for s, t in zip(tbl["source"], tbl["text"]):
        n_docs[s] = n_docs.get(s, 0) + 1
        n_tok[s] = n_tok.get(s, 0) + len([w for w in ws.split(t.lower()) if w])
    q = {s: int(math.floor(math.sqrt(float(n)) * _MIX_Q)) for s, n in n_tok.items()}
    den = sum(q.values())
    assert len(rows) == len(n_docs) > 1
    for r in rows:
        assert r.n_docs == n_docs[r.source]
        assert r.n_tokens == n_tok[r.source], r.source
        assert r.q_sqrt == q[r.source]
        w = float(q[r.source]) / float(den)
        assert r.weight == w
        assert r.epochs_1b == (_MIX_BUDGET * w) / float(n_tok[r.source])
    # temperature actually bites: alpha=0.5 compresses the spread, so the
    # largest source's weight must sit BELOW its raw token share
    big = max(n_tok, key=n_tok.get)
    raw_share = n_tok[big] / sum(n_tok.values())
    w_big = q[big] / den
    assert w_big < raw_share or len(set(n_tok.values())) == 1

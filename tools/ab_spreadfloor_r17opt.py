"""r16 verdict item #5 sweep: the remaining min_bytes=0 spread sites
without an sf0.1 win on record — the 8 multimodal codec drivers and
text_boilerplate_df_score. Arms: PLAIN = current ungated spread,
FLOOR = same call sites behind the 2 MiB floor (spread wrapped so
min_bytes=SPREAD_MIN_BYTES when the caller passed 0). documents.parquet
at sf0.1 is 0.58 MB, so FLOOR disables the exchange at sf0.1 and leaves
sf1 (5.9 MB) unchanged. Interleaved within one JVM.

Usage: python tools/ab_spreadfloor_r17opt.py [sf_dir] [rounds]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

QUERIES = [
    "multimodal_image_decode_stats",
    "multimodal_image_resize_stats",
    "multimodal_video_frame_stats",
    "multimodal_audio_frame_rms",
    "multimodal_jpeg_roundtrip",
    "multimodal_gif_roundtrip",
    "multimodal_tiff_roundtrip",
    "multimodal_audio_vad",
    "text_boilerplate_df_score",
]


def main():
    from spark_sql_flow_plugin_spark import partitioning as _pt
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.operators import multimodal as _mm
    from spark_sql_flow_plugin_spark.operators import text as _tx
    from spark_sql_flow_plugin_spark.session import get_session

    spark = get_session("ab-spreadfloor", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)

    plain = _pt.spread

    def floored(spark, df, sf_dir, table, *keys, min_bytes=0):
        return plain(
            spark, df, sf_dir, table, *keys,
            min_bytes=min_bytes or _pt.SPREAD_MIN_BYTES,
        )

    qs = _reg.queries()
    res = {}
    for _ in range(ROUNDS):
        for arm, fn in (("plain", plain), ("floor", floored)):
            _mm.spread = fn
            _tx.spread = fn
            for name in QUERIES:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[name](spark, SF).count()
                res.setdefault(name, {}).setdefault(arm, []).append(
                    round(time.time() - t0, 3)
                )
    _mm.spread = plain
    _tx.spread = plain
    print(json.dumps({
        "sf_dir": SF,
        "anchor_md5_20m": round(anchor, 3),
        "per_query": {
            n: {a: v for a, v in arms.items()} for n, arms in res.items()
        },
        "mins": {
            n: {a: min(v) for a, v in arms.items()}
            for n, arms in res.items()
        },
    }))


if __name__ == "__main__":
    main()

"""Interleaved A/B for r16-opt "Not yet optimized" #2: is RocksDB a
better DEFAULT state store than HDFSBackedStateStore for the two
streaming bench entries (stream_user_totals, stream_click_purchase_join)?
Both run availableNow micro-batches on 8 state partitions in the
memoized child session; the variant is toggled by setting/unsetting
spark.sql.streaming.stateStore.providerClass on that child between
rounds (streaming confs bind at query start, so each run sees its
variant). Output rows are state-store independent — the store is an
implementation detail — and the bench pair's digests are oracle-checked
separately; this harness measures wall clock only.
"""
import sys, os, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
ROUNDS = 4
ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
KEY = "spark.sql.streaming.stateStore.providerClass"


def main():
    from spark_sql_flow_plugin_spark import registry as _reg
    from spark_sql_flow_plugin_spark.session import get_session
    from spark_sql_flow_plugin_spark.streaming.events import _stream_session

    spark = get_session("ab-rocksdb", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    anchor = 1e9
    for i in range(3):
        t0 = time.time()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "sum(crc32(md5(cast(id as string)))) s"
        ).collect()
        if i:
            anchor = min(anchor, time.time() - t0)
    qs = _reg.queries()
    names = ["stream_user_totals", "stream_click_purchase_join"]
    child = _stream_session(spark)
    rounds = []
    for r in range(ROUNDS):
        pair = {}
        for tag in ("hdfs", "rocks"):
            if tag == "rocks":
                child.conf.set(KEY, ROCKS)
            else:
                child.conf.unset(KEY)
            spark.catalog.clearCache()
            for n in names:
                t0 = time.time()
                qs[n](spark, SF).count()
                pair[f"{tag}:{n}"] = round(time.time() - t0, 3)
        rounds.append(pair)
    child.conf.unset(KEY)
    out = {"anchor_md5_20m": round(anchor, 3), "rounds": rounds}
    for n in names:
        out[f"min_hdfs:{n}"] = min(p[f"hdfs:{n}"] for p in rounds)
        out[f"min_rocks:{n}"] = min(p[f"rocks:{n}"] for p in rounds)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

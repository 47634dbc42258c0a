"""Generate a deterministic sf1 dataset (10x sf0.1) for the scale-proof bench.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); the round-5 verdict
asked for one real measurement above sf0.1 ("Next round #3").  This tool
derives sf1 from the driver's own sf0.1 parquet by replicating each table 10
times with per-copy transformations chosen so that *within-copy* structure is
preserved EXACTLY and *cross-copy* rows are unrelated:

- **documents**: copy c maps every word of `text` through a seeded
  permutation of the corpus's (31-word) vocabulary.  A vocab permutation is a
  bijection on shingles, so exact-dup groups, MinHash/Jaccard similarity,
  winnow fingerprint overlap, and n-gram statistics inside each copy are
  isomorphic to sf0.1 — near-dup pair counts therefore scale exactly 10x,
  never quadratically (naive replication would make every doc a 10-way exact
  dup and blow pair counts up ~100x, a dishonest workload).  Cross-copy
  similarity collapses because shingles only survive where the permutation
  happens to fix every word.  `n_chars` is recomputed (it equals
  `length(text)` in the driver data — verified).
- **embeddings**: copy c applies a seeded signed permutation of the 64
  dimensions (a rotation-free orthogonal transform).  All within-copy inner
  products and norms are bit-identical to sf0.1, so ANN neighbor structure
  scales 10x; cross-copy cosines decorrelate.
- **fact/dim tables** (customer, supplier, part, orders, lineitem, events):
  dense 0-based keys are offset by `c * (max_key + 1)` consistently across
  every referencing column, so referential integrity holds and join/agg
  cardinalities scale linearly.  Key-embedding name columns
  (`Customer#%09d`, `Supplier#%09d`) are regenerated from the new key to
  keep them unique.  `region`/`nation` stay single-copy (true dimensions).
- **events** keep their timestamp range (2024-01-01..-30): a 10x pipeline
  sees 10x event density per window, which is exactly how streaming load
  scales; `event_id`/`user_id` are offset.

Everything is seeded (numpy default_rng(2024_0601 + copy)); re-running
produces byte-identical parquet.  Output: ./testdata/sf1/*.parquet
(gitignored — ~1.5 GB).  Usage:  python tools/gen_sf1.py [outdir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
COPIES = 10
SEED_BASE = 20240601


def _read(name: str) -> pa.Table:
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def _writer(outdir: str, name: str, schema: pa.Schema) -> pq.ParquetWriter:
    return pq.ParquetWriter(
        os.path.join(outdir, f"{name}.parquet"), schema, compression="snappy"
    )


def _offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pa.compute.add(col, off).combine_chunks()


def gen_documents(outdir: str) -> None:
    t = _read("documents")
    texts = t.column("text").to_pylist()
    vocab = sorted({w for s in texts for w in s.split(" ")})
    n = len(t)
    with _writer(outdir, "documents", t.schema) as w:
        for c in range(COPIES):
            if c == 0:
                mapped = texts
            else:
                rng = np.random.default_rng(SEED_BASE + c)
                perm = dict(zip(vocab, [vocab[i] for i in rng.permutation(len(vocab))]))
                mapped = [" ".join(perm[x] for x in s.split(" ")) for s in texts]
            w.write_table(
                pa.table(
                    {
                        "doc_id": _offset(t.column("doc_id"), c * n),
                        "text": pa.array(mapped, pa.string()),
                        "lang": t.column("lang").combine_chunks(),
                        "source": t.column("source").combine_chunks(),
                        "n_chars": pa.array(
                            [len(s) for s in mapped], pa.int64()
                        ),
                    },
                    schema=t.schema,
                )
            )


def gen_embeddings(outdir: str) -> None:
    t = _read("embeddings")
    n = len(t)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    with _writer(outdir, "embeddings", schema) as w:
        for c in range(COPIES):
            if c == 0:
                out = vecs
            else:
                rng = np.random.default_rng(SEED_BASE + c)
                perm = rng.permutation(dim)
                signs = rng.choice(np.array([-1.0, 1.0], np.float32), size=dim)
                out = vecs[:, perm] * signs  # signed permutation: orthogonal
            w.write_table(
                pa.table(
                    {
                        "vec_id": _offset(t.column("vec_id"), c * n),
                        "embedding": pa.array(
                            [row for row in out], pa.list_(pa.float32())
                        ),
                        "label": t.column("label").combine_chunks(),
                    },
                    schema=schema,
                )
            )


def _copy_dim(outdir: str, name: str) -> None:
    t = _read(name)
    with _writer(outdir, name, t.schema) as w:
        w.write_table(t)


def _name_col(prefix: str, keys: pa.Array) -> pa.Array:
    return pa.array(
        [f"{prefix}#{k:09d}" for k in keys.to_pylist()], pa.string()
    )


def gen_facts(outdir: str) -> None:
    cust, supp, part = _read("customer"), _read("supplier"), _read("part")
    orders, li, ev = _read("orders"), _read("lineitem"), _read("events")
    CK, SK, PK = len(cust), len(supp), len(part)
    OK, EV = len(orders), len(ev)
    UK = 1 + int(pa.compute.max(ev.column("user_id")).as_py())

    writers = {
        name: _writer(outdir, name, t.schema)
        for name, t in [
            ("customer", cust),
            ("supplier", supp),
            ("part", part),
            ("orders", orders),
            ("lineitem", li),
            ("events", ev),
        ]
    }
    try:
        for c in range(COPIES):
            ck = _offset(cust.column("c_custkey"), c * CK)
            writers["customer"].write_table(
                pa.table(
                    {
                        "c_custkey": ck,
                        "c_name": _name_col("Customer", ck),
                        "c_nationkey": cust.column("c_nationkey").combine_chunks(),
                        "c_acctbal": cust.column("c_acctbal").combine_chunks(),
                        "c_mktsegment": cust.column("c_mktsegment").combine_chunks(),
                    },
                    schema=cust.schema,
                )
            )
            sk = _offset(supp.column("s_suppkey"), c * SK)
            writers["supplier"].write_table(
                pa.table(
                    {
                        "s_suppkey": sk,
                        "s_name": _name_col("Supplier", sk),
                        "s_nationkey": supp.column("s_nationkey").combine_chunks(),
                        "s_acctbal": supp.column("s_acctbal").combine_chunks(),
                    },
                    schema=supp.schema,
                )
            )
            writers["part"].write_table(
                part.set_column(
                    0, "p_partkey", _offset(part.column("p_partkey"), c * PK)
                )
            )
            o = orders.set_column(
                0, "o_orderkey", _offset(orders.column("o_orderkey"), c * OK)
            )
            o = o.set_column(1, "o_custkey", _offset(o.column("o_custkey"), c * CK))
            writers["orders"].write_table(o)
            lt = li.set_column(
                0, "l_orderkey", _offset(li.column("l_orderkey"), c * OK)
            )
            lt = lt.set_column(1, "l_partkey", _offset(lt.column("l_partkey"), c * PK))
            lt = lt.set_column(2, "l_suppkey", _offset(lt.column("l_suppkey"), c * SK))
            writers["lineitem"].write_table(lt)
            e = ev.set_column(0, "event_id", _offset(ev.column("event_id"), c * EV))
            e = e.set_column(2, "user_id", _offset(e.column("user_id"), c * UK))
            writers["events"].write_table(e)
    finally:
        for w in writers.values():
            w.close()


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
    os.makedirs(outdir, exist_ok=True)
    gen_documents(outdir)
    gen_embeddings(outdir)
    _copy_dim(outdir, "region")
    _copy_dim(outdir, "nation")
    gen_facts(outdir)
    for f in sorted(os.listdir(outdir)):
        p = os.path.join(outdir, f)
        print(f"{f}: {os.path.getsize(p) / 1e6:.1f} MB, "
              f"{pq.read_metadata(p).num_rows} rows")


if __name__ == "__main__":
    main()

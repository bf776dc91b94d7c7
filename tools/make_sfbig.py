#!/usr/bin/env python
"""Generate an "sf0.5-class" parity fixture by replicating the sf0.1
tables K times with shifted keys (round-6 verdict ask #7: push the
parity sweep up a scale notch for the heavy hitters, catching
size-dependent drift — float summation order, window spill — that the
sf0.1 mirror can't see).

This is NOT new synthetic data semantics: every replica is the driver
fixture with a uniform key offset (foreign keys shift together, so
join structure is preserved exactly), documents get a per-replica
suffix token (within-replica duplicate structure preserved;
cross-replica texts become near- rather than exact duplicates), and
embeddings get small deterministic per-replica noise (so cross-replica
cosines stay below 1.0 and pair sets don't degenerate). Both engines
read the SAME generated files, so the Spark-vs-DuckDB parity check is
exact regardless of the perturbations.

Usage: python tools/make_sfbig.py [--k 5] [--src /root/testdata/sf0.1]
                                  [--out /tmp/quacfka_sfbig]
"""
from __future__ import annotations

import argparse
import os
import shutil

OFF = 10_000_000  # > every bigint key in the sf0.1 fixture

SHIFTS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
COPY_ONCE = ["region", "nation"]  # fixed dimensions: nationkeys stay valid


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/quacfka_sfbig")
    args = ap.parse_args()

    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_ONCE:
        shutil.copyfile(
            os.path.join(args.src, f"{t}.parquet"),
            os.path.join(args.out, f"{t}.parquet"),
        )
        print(f"# {t}: copied")

    for t, keys in SHIFTS.items():
        src = os.path.join(args.src, f"{t}.parquet")
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
        selects = []
        for i in range(args.k):
            off = i * OFF
            proj = ", ".join(
                f"{c} + {off} AS {c}" if c in keys else c for c in cols
            )
            selects.append(f"SELECT {proj} FROM '{src}'")
        union = " UNION ALL ".join(selects)
        dst = os.path.join(args.out, f"{t}.parquet")
        con.sql(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"# {t}: {n} rows ({args.k}x)")

    # documents: key shift + per-replica suffix token (keeps
    # within-replica dup structure; cross-replica pairs become
    # near-dups — a REALISTIC re-crawl shape for the dedup keys)
    src = os.path.join(args.src, "documents.parquet")
    selects = []
    for i in range(args.k):
        off = i * OFF
        selects.append(
            f"SELECT doc_id + {off} AS doc_id, "
            f"text || ' qqrep{i}qq' AS text, lang, source, "
            # suffix is ' qqrep' + str(i) + 'qq' = 8 + len(str(i)) chars,
            # keeping the base fixture's n_chars == length(text) invariant
            f"n_chars + {8 + len(str(i))} AS n_chars FROM '{src}'"
        )
    union = " UNION ALL ".join(selects)
    dst = os.path.join(args.out, "documents.parquet")
    con.sql(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
    print(f"# documents: {con.sql(f'SELECT count(*) FROM {dst!r}').fetchone()[0]} rows")

    # embeddings: key shift + small deterministic per-replica noise so
    # cross-replica cosines stay < 1 (replica 0 is byte-identical)
    tbl = pq.read_table(os.path.join(args.src, "embeddings.parquet"))
    vec_ids = tbl.column("vec_id").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype="float32")
    labels = tbl.column("label").to_numpy()
    out_ids, out_emb, out_lab = [], [], []
    for i in range(args.k):
        rng = np.random.default_rng(9000 + i)
        noise = (
            np.zeros_like(emb)
            if i == 0
            else (0.05 * rng.normal(size=emb.shape)).astype("float32")
        )
        out_ids.append(vec_ids + i * OFF)
        out_emb.append(emb + noise)
        out_lab.append(labels)
    big = pa.table(
        {
            "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "embedding": pa.array(
                np.concatenate(out_emb).tolist(), type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                np.concatenate(out_lab).astype("int32"), type=pa.int32()
            ),
        }
    )
    pq.write_table(big, os.path.join(args.out, "embeddings.parquet"))
    print(f"# embeddings: {len(big)} rows")
    print(f"# fixture at {args.out} (~sf{0.1 * args.k:g}-class)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

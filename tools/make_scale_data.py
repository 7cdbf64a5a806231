"""Deterministic scale-up of the driver testdata for SCALE PROBES ONLY
(the correctness gate stays on the driver's own sf0.01 parquet — this
tool exists so the registry can be benched at sf1 = 10× sf0.1, the r6
verdict's "scale evidence" ask).

Construction (factor f, replica r = 0..f-1):

- Dimension tables (region, nation) copy through unchanged.
- Fact/dim tables replicate with KEY OFFSETS (new_key = key + r·max)
  so referential structure is preserved exactly and every attribute
  distribution (dates, segments, prices) is bit-identical per replica —
  group-by cardinalities on keys grow 10×, on attributes stay fixed,
  which is how a real corpus grows.
- documents: replica texts are REMIXED (first half of doc a's words +
  second half of doc b's, b = deterministic partner) — NOT copies:
  copies would make every doc a cross-replica near-duplicate and blow
  the dedup operators' pair counts superlinearly (pathological, see
  memory of r6 ANN probes). Remixes keep the vocabulary, length and
  duplicate-rate distributions while staying below near-dup thresholds.
- embeddings: replica vectors INTERPOLATE random pairs of real vectors
  (w·a + (1−w)·b, md5-deterministic w and partner) + small jitter —
  replicate+jitter makes disjoint clone-cliques, pathological for ANN.

Usage: python tools/make_scale_data.py [factor] [out_dir]
       (default: 10 /root/repo/.scale/sf1)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

N_CUST, N_SUPP, N_PART, N_ORD = 15000, 1000, 20000, 150000
N_EVT_USERS, N_DOCS, N_VECS = 1500, 5000, 2000


def main() -> None:
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({f})) AS r")

    def cp(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    for name in ("region", "nation"):
        cp(name, f"SELECT * FROM '{SRC}/{name}.parquet'")

    cp("customer", f"""
        SELECT c_custkey + r * {N_CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet' CROSS JOIN reps""")
    cp("supplier", f"""
        SELECT s_suppkey + r * {N_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet' CROSS JOIN reps""")
    cp("part", f"""
        SELECT p_partkey + r * {N_PART} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{SRC}/part.parquet' CROSS JOIN reps""")
    cp("orders", f"""
        SELECT o_orderkey + r * {N_ORD} AS o_orderkey,
               o_custkey + r * {N_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet' CROSS JOIN reps""")
    cp("lineitem", f"""
        SELECT l_orderkey + r * {N_ORD} AS l_orderkey,
               l_partkey + r * {N_PART} AS l_partkey,
               l_suppkey + r * {N_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet' CROSS JOIN reps""")
    cp("events", f"""
        SELECT event_id + r * 100000 AS event_id, ts,
               user_id + r * {N_EVT_USERS} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet' CROSS JOIN reps""")
    # documents: replica 0 verbatim; replicas remix word halves of two
    # source docs so no replica doc is a near-duplicate of any original
    cp("documents", f"""
        SELECT doc_id, text, lang, source, n_chars FROM '{SRC}/documents.parquet'
        UNION ALL
        SELECT d.doc_id + r * {N_DOCS} AS doc_id,
               array_to_string(
                 list_concat(
                   w.words[1 : greatest(len(w.words) // 2, 1)],
                   p.words[greatest(len(p.words) // 2, 1) + 1 : len(p.words)]
                 ), ' ') AS text,
               d.lang, d.source,
               CAST(len(array_to_string(
                 list_concat(
                   w.words[1 : greatest(len(w.words) // 2, 1)],
                   p.words[greatest(len(p.words) // 2, 1) + 1 : len(p.words)]
                 ), ' ')) AS BIGINT) AS n_chars
        FROM '{SRC}/documents.parquet' d
        CROSS JOIN (SELECT r FROM reps WHERE r > 0) reps
        JOIN (SELECT doc_id, string_split(text, ' ') AS words
              FROM '{SRC}/documents.parquet') w USING (doc_id)
        JOIN (SELECT doc_id AS pid, string_split(text, ' ') AS words
              FROM '{SRC}/documents.parquet') p
          ON p.pid = (d.doc_id + 1 + r * 2633) % {N_DOCS}""")

    # embeddings: interpolate md5-deterministic pairs of real vectors
    base = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = np.array([r[1] for r in base], dtype=np.float32)
    labels = np.array([r[2] for r in base], dtype=np.int32)
    n, dim = vecs.shape
    std = float(vecs.std())

    def h(s: str, mod: int) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % mod

    all_ids, all_vecs, all_labels = [np.arange(n, dtype=np.int64)], [vecs], [labels]
    for r in range(1, f):
        a = np.array([h(f"a:{r}:{i}", n) for i in range(n)])
        b = np.array([h(f"b:{r}:{i}", n) for i in range(n)])
        w = (np.array([h(f"w:{r}:{i}", 1000) for i in range(n)]) / 1000.0 * 0.4 + 0.3
             ).astype(np.float32)[:, None]
        jit = np.array(
            [[(h(f"j:{r}:{i}:{d}", 2001) - 1000) / 1000.0 for d in range(dim)]
             for i in range(n)], dtype=np.float32) * (0.05 * std)
        all_ids.append(np.arange(n, dtype=np.int64) + r * n)
        all_vecs.append(vecs[a] * w + vecs[b] * (1.0 - w) + jit)
        all_labels.append(labels[a])
    tbl = pa.table({
        "vec_id": pa.array(np.concatenate(all_ids)),
        "embedding": pa.array(list(np.concatenate(all_vecs)), type=pa.list_(pa.float32())),
        "label": pa.array(np.concatenate(all_labels), type=pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")
    print(f"embeddings: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()

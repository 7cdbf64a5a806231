"""Graph-ANN scale probe: replicate the embeddings N× and grow the
partition count WITH the corpus (partitions ∝ N, so per-partition size —
the build/search unit — stays constant). Expected shapes at 100 TB:

- build (kNN adjacency): per-partition O(n_part²) BLAS; with n_part fixed
  the total is linear in N and embarrassingly parallel → wall time ~flat
  on a machine with spare cores, ~linear once cores saturate.
- routed search: each query beam-searches only its routed partitions;
  with partition size fixed the per-(partition × query) work is constant
  → scales with routed pairs, not corpus size.

Superlinear growth in either column = a partition-global stage leaked in.

Usage: python tools/graph_probe.py [factors...]   (default: 1 4 16)
       python tools/graph_probe.py partsize [sizes...]
           (default: 8000 16000 32000 64000) — grow ONE partition and
           measure the incremental build wall + recall@10 at ef=48/128:
           near-linear wall and flat recall certify the HNSW-style
           insert loop (hnswbuild.c parity) has no quadratic cliff and
           no navigability collapse. Pure-kernel check, no Spark.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vectorsearch_rbac_spark.sources import get_spark, load_table
from vectorsearch_rbac_spark.operators import graph_ann

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def partsize_main(sizes: list[int]) -> None:
    """Partition-size scaling of the incremental (HNSW-insert) build:
    interpolate pairs of real embeddings (smooth structure — plain
    replication makes disjoint clone-cliques, pathological for ANY kNN
    graph) and grow one partition. Expect wall ∝ n and recall flat."""
    import numpy as np

    from vectorsearch_rbac_spark.operators.graph_ann import (
        _batched_entries,
        _beam_search,
        _incremental_adjacency,
    )

    try:
        import duckdb

        rows = duckdb.sql(
            f"select embedding from '{SF_DIR}/embeddings.parquet' order by vec_id"
        ).fetchall()
        base = np.array([r[0] for r in rows], dtype=np.float64)
    except Exception:
        base = np.random.default_rng(0).standard_normal((2000, 64))
    rng = np.random.default_rng(3)

    def corpus(n: int) -> np.ndarray:
        a = rng.integers(0, len(base), n)
        b = rng.integers(0, len(base), n)
        w = rng.random((n, 1))
        return base[a] * w + base[b] * (1 - w) + rng.standard_normal(
            (n, base.shape[1])
        ) * 0.05 * base.std()

    print(f"{'n':>7} {'build':>8} {'r@ef48':>7} {'r@ef128':>8} {'ms/q@48':>8} {'ms/q@128':>9}")
    for n in sizes:
        vecs = corpus(n)
        norms = (vecs * vecs).sum(axis=1)
        qs = corpus(20)
        t0 = time.time()
        adj = _incremental_adjacency(vecs, 8)
        tb = time.time() - t0
        rec, msq = {}, {}
        for ef in (48, 128):
            hits = 0
            t0 = time.time()
            # production entry routing INSIDE the timed region (each
            # search call pays it): medoid below the crossover, sampled
            # two-level routing above it (r7 — see _batched_entries)
            ents = _batched_entries(vecs, norms, qs)
            for qi, q in enumerate(qs):
                got = {u for _, u in _beam_search(vecs, adj, int(ents[qi]), q, 10, ef, norms=norms)}
                d2 = norms - 2 * (vecs @ q) + q @ q
                truth = set(np.argsort(d2)[:10])
                hits += len(truth & got)
            # per-query SEARCH wall (the brute-force truth pass rides the
            # same loop; subtract it via a second timed truth-only loop)
            t_all = time.time() - t0
            t0 = time.time()
            for q in qs:
                d2 = norms - 2 * (vecs @ q) + q @ q
                set(np.argsort(d2)[:10])
            msq[ef] = max(t_all - (time.time() - t0), 0.0) / len(qs) * 1e3
            rec[ef] = hits / 200
        print(f"{n:>7} {tb:>7.1f}s {rec[48]:>7.3f} {rec[128]:>8.3f}"
              f" {msq[48]:>7.2f} {msq[128]:>8.2f}")


def queries_main(n_rows: int, n_queries: int) -> None:
    """Per-query wall of the r7 LOCKSTEP batched beam vs the sequential
    reference kernel at a 1k-query batch (the r6 verdict's done-bar:
    ≥ current recall at ≤ half the per-query wall). Pure-kernel, no
    Spark — the cogroup plumbing is identical either way."""
    import numpy as np

    from vectorsearch_rbac_spark.operators.graph_ann import (
        _acorn_beam,
        _batched_beams,
        _beam_search,
        _build_adjacency,
        _medoid,
    )

    try:
        import duckdb

        rows = duckdb.sql(
            f"select embedding from '{SF_DIR}/embeddings.parquet' order by vec_id"
        ).fetchall()
        base = np.array([r[0] for r in rows], dtype=np.float64)
    except Exception:
        base = np.random.default_rng(0).standard_normal((2000, 64))
    rng = np.random.default_rng(3)

    def corpus(n: int) -> np.ndarray:
        a = rng.integers(0, len(base), n)
        b = rng.integers(0, len(base), n)
        w = rng.random((n, 1))
        return base[a] * w + base[b] * (1 - w) + rng.standard_normal(
            (n, base.shape[1])
        ) * 0.05 * base.std()

    vecs = corpus(n_rows)
    norms = (vecs * vecs).sum(axis=1)
    adj = _build_adjacency(vecs, 8)
    adjarr = [np.asarray(a, dtype=np.int64) for a in adj]
    entry = _medoid(vecs)
    qs = corpus(n_queries)
    k, ef = 10, 48
    truth = []
    for q in qs:
        truth.append(set(np.argsort(norms - 2 * (vecs @ q) + q @ q)[:k]))

    t0 = time.time()
    seq = [_beam_search(vecs, adj, entry, q, k, ef, norms=norms) for q in qs]
    t_seq = time.time() - t0
    t0 = time.time()
    bat = _batched_beams(
        vecs, norms, qs, np.full(n_queries, entry, dtype=np.int64), k, ef,
        lambda i, u: adjarr[u],
    )
    t_bat = time.time() - t0
    r_seq = sum(len(truth[i] & {u for _, u in s}) for i, s in enumerate(seq)) / (k * n_queries)
    r_bat = sum(len(truth[i] & {u for _, u in s}) for i, s in enumerate(bat)) / (k * n_queries)
    print(f"nsw   n={n_rows} q={n_queries}: seq {t_seq:.2f}s "
          f"({1e3 * t_seq / n_queries:.2f} ms/q, r={r_seq:.3f})  "
          f"batched {t_bat:.2f}s ({1e3 * t_bat / n_queries:.2f} ms/q, "
          f"r={r_bat:.3f})  speedup {t_seq / t_bat:.2f}x")

    # ACORN-1 with 30%-selectivity masks. Role-sets dedupe heavily in
    # RBAC (a few dozen combinations serve thousands of users), so the
    # batch carries 64 UNIQUE masks assigned round-robin — and the
    # production operator computes masks/entries once per unique set.
    n_uniq = min(64, n_queries)
    u_masks = [rng.random(n_rows) < 0.3 for _ in range(n_uniq)]
    uix = [i % n_uniq for i in range(n_queries)]
    masks = [u_masks[j] for j in uix]

    # padded 2-D adjacency (the production acorn_search build): one
    # fancy gather per expansion instead of a per-failing-node listcomp
    dmax = max(len(a) for a in adj)
    adj2d = np.empty((len(adj), dmax), dtype=np.int64)
    for v, a in enumerate(adj):
        adj2d[v, : len(a)] = a
        adj2d[v, len(a):] = v

    def expand1(i, u):
        al = masks[i]
        nb = adj2d[u]
        pm = al[nb]
        passing, failing = nb[pm], nb[~pm]
        if not failing.size:
            return passing
        two = adj2d[failing].ravel()
        return np.concatenate([passing, two[al[two]]])

    t0 = time.time()
    seq = [_acorn_beam(vecs, adj, q, k, ef, al, True, norms=norms)
           for q, al in zip(qs, masks)]
    t_seq = time.time() - t0
    # batched timing INCLUDES entry-point selection (the sequential
    # kernel computes its entry internally), done the production way:
    # once per unique mask
    t0 = time.time()
    u_entries = np.empty(n_uniq, dtype=np.int64)
    for j, al in enumerate(u_masks):
        idx = np.flatnonzero(al)
        sub = vecs[idx]
        mean = sub.mean(axis=0)
        u_entries[j] = idx[np.argmin(((sub - mean) ** 2).sum(axis=1))]
    entries = u_entries[np.asarray(uix, dtype=np.int64)]
    bat = _batched_beams(
        vecs, norms, qs, entries, k, ef, expand1,
        dedupe=True,
    )
    t_bat = time.time() - t0
    ft = []
    for al in masks:
        d2 = np.where(al, 0.0, np.inf)
        ft.append(d2)
    r_seq = r_bat = 0.0
    for i, q in enumerate(qs):
        d2 = norms - 2 * (vecs @ q) + q @ q + ft[i]
        tr = set(np.argsort(d2)[:k])
        r_seq += len(tr & {u for _, u in seq[i]})
        r_bat += len(tr & {u for _, u in bat[i]})
    r_seq /= k * n_queries
    r_bat /= k * n_queries
    print(f"acorn n={n_rows} q={n_queries}: seq {t_seq:.2f}s "
          f"({1e3 * t_seq / n_queries:.2f} ms/q, r={r_seq:.3f})  "
          f"batched {t_bat:.2f}s ({1e3 * t_bat / n_queries:.2f} ms/q, "
          f"r={r_bat:.3f})  speedup {t_seq / t_bat:.2f}x")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "queries":
        args = [int(a) for a in sys.argv[2:]]
        queries_main(args[0] if args else 16000, args[1] if len(args) > 1 else 1000)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "partsize":
        partsize_main([int(a) for a in sys.argv[2:]] or [8000, 16000, 32000, 64000])
        return
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("graph-probe")
    base = load_table(spark, "embeddings", SF_DIR)
    nb = base.count()
    qs = base.where(F.col("vec_id") % 97 == 0).limit(20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    ).localCheckpoint()

    print(f"{'factor':>6} {'rows':>9} {'parts':>6} {'build':>8} {'search':>8}")
    for f in factors:
        n_parts = 4 * f  # partitions grow with the corpus
        blocks = (
            base.crossJoin(spark.range(f).select(F.col("id").alias("rep")))
            .select(
                (F.col("vec_id") + F.col("rep") * nb).alias("block_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + F.when(i == F.col("rep") % 64, 0.01).otherwise(0.0),
                ).alias("vector"),
            )
            .withColumn("part", F.pmod(F.col("block_id"), F.lit(n_parts)))
            .localCheckpoint()
        )
        n = blocks.count()

        g = graph_ann.build_nsw_graph(blocks, m=8, id_col="block_id",
                                      vec_col="vector", part_col="part")
        g.count()
        t0 = time.time()
        g = graph_ann.build_nsw_graph(blocks, m=8, id_col="block_id",
                                      vec_col="vector", part_col="part").localCheckpoint()
        g.count()
        t_build = time.time() - t0

        s = graph_ann.nsw_search_indexed(blocks, g, qs, k=10, ef=48,
                                         id_col="block_id", vec_col="vector",
                                         part_col="part")
        s.count()
        t0 = time.time()
        s.count()
        t_search = time.time() - t0
        print(f"{f:>6} {n:>9} {n_parts:>6} {t_build:>7.2f}s {t_search:>7.2f}s")


if __name__ == "__main__":
    main()

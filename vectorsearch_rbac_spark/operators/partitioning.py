"""Physical partition layouts for RBAC vector search.

Parity: the reference materializes partition TABLES —
``documentblocks_role_{r}`` (baseline/prefilter/initialize_partitions.py),
``documentblocks_partition_{p}`` keyed by comb_role
(dynamic_partition/…), and qd-tree leaves (baseline/HQI/qd_tree.py). The
lakehouse-native equivalent is a parquet layout ``partitionBy(<key>)`` —
partition pruning then plays the role of "open only that table", with no
per-table index maintenance.

The qd-tree here is the batch partitioner: recursive splits choosing, at
each node, either a ROLE predicate (does role r reach this doc?) or a
CENTROID predicate (nearest of 2 k-means centroids), minimizing expected
scan cost over a query workload — the HQI idea re-expressed as a pure
assignment computation (block → partition_id) that the writer consumes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def role_partition_assignment(blocks: DataFrame, permission_assignment: DataFrame) -> DataFrame:
    """Replicate each block into one partition per role that may access it.

    Disk layout: ``df.write.partitionBy("role_id")`` →
    ``…/role_id=r/part-*.parquet`` ≡ the reference's per-role tables.
    """
    from . import hints
    from .knn import _perm_est_bytes

    # gated (r12): the permission relation is docs×roles — above the gate
    # the replication join shuffles on document_id (bucketable)
    return blocks.join(
        hints.gated_broadcast(permission_assignment, _perm_est_bytes(permission_assignment)),
        "document_id",
    )


def comb_role_assignment(blocks: DataFrame, permission_assignment: DataFrame) -> DataFrame:
    """One partition per *document access-set*: comb_role = sorted role list
    that can reach the document. Unlike per-role replication this stores
    each block exactly once (the dynamic-partition design)."""
    from . import hints
    from .knn import _perm_est_bytes

    doc_comb = permission_assignment.groupBy("document_id").agg(
        F.array_join(F.array_sort(F.collect_list(F.col("role_id").cast("string"))), ",").alias("comb_role")
    )
    # gated (r12): one row per permissioned document (doc-cardinality);
    # rows(doc_comb) ≤ rows(perm), so the perm estimate bounds it
    return blocks.join(
        hints.gated_broadcast(doc_comb, _perm_est_bytes(permission_assignment)), "document_id"
    )


def write_partitioned(df: DataFrame, path: str, key: str) -> None:
    """Index build = partitioned write. Sorting within files by the key keeps
    row-group min/max stats tight for skipping."""
    df.repartition(key).sortWithinPartitions(key).write.mode("overwrite").partitionBy(key).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Bucketed table write: rows hash-clustered into ``num_buckets`` files
    per partition by ``bucket_key``, sorted within buckets.

    This is the co-located-join layout: two tables bucketed on the same key
    with the same bucket count join WITHOUT any shuffle exchange — the
    bucketing metadata proves to Catalyst that equal keys already live in
    matching files. At 100 TB this converts every recurring fact-fact join
    on the bucket key (blocks⋈permissions, orders⋈lineitem) from a full
    network shuffle into a local merge — the single biggest recurring-cost
    saving a layout choice can buy.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_key).sortBy(bucket_key)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def qdtree_assignment(
    blocks: DataFrame,
    permission_assignment: DataFrame,
    max_leaf_size: int = 256,
    max_depth: int = 6,
    seed: int = 42,
    vec_col: str = "vector",
) -> DataFrame:
    """Assign each block a qd-tree partition id.

    Parity: ``baseline/HQI/qd_tree.py:508 build_qd_tree`` /
    ``:606 build_rbac_qd_tree`` — alternating role-predicate and centroid
    splits. Implementation: iterative (per level) rather than recursive;
    each level is ONE distributed pass that, per current node, evaluates the
    chosen predicate and appends a bit to the partition path. Split choice
    uses driver-side samples (the reference's k-means also runs on samples),
    gathered for ALL of a level's nodes in one grouped job — two jobs per
    level total, never a job per node. Depth ≤ max_depth keeps driver state
    tiny (≤ 2^depth nodes).
    """
    from . import hints
    from .knn import _perm_est_bytes

    doc_roles = permission_assignment.groupBy("document_id").agg(
        F.collect_set("role_id").alias("_roles")
    )
    # gated (r12): one row per permissioned document, rows ≤ rows(perm) —
    # above the gate the tree build joins shuffle on document_id
    cur = blocks.join(
        hints.gated_broadcast(doc_roles, _perm_est_bytes(permission_assignment)), "document_id"
    ).withColumn("pid", F.lit(0).cast("long"))

    role_sample_rate = 0.5
    for depth in range(max_depth):
        # per-node sizes; stop when all nodes small enough
        sizes = {r["pid"]: r["n"] for r in cur.groupBy("pid").agg(F.count("*").alias("n")).collect()}
        # sorted(pid) order + per-node seeded RNG → partition ids are
        # deterministic across cluster layouts and dict orderings
        big = sorted(p for p, n in sizes.items() if n > max_leaf_size)
        if not big:
            break
        # ONE distributed job per level computes every big node's split
        # sample at once (grouped by pid) — not a per-node driver loop:
        # at depth d there can be 2^d nodes, and a job per node would
        # serialize 2^d scheduler round-trips for driver-side work that
        # is one groupBy away.
        samples_by_pid: dict[int, list] = {}
        if depth % 2 == 0:
            # role counts for ALL big nodes in one sampled aggregation
            for row in (
                cur.where(F.col("pid").isin(big))
                .select("pid", F.explode("_roles").alias("r"))
                .sample(role_sample_rate, seed=seed + depth)
                .groupBy("pid", "r")
                .count()
                .collect()
            ):
                samples_by_pid.setdefault(row["pid"], []).append(row)
        else:
            # top-512-by-content-hash vectors per big node via ONE rank
            # window (content-hash TakeOrdered: Bernoulli sample()
            # membership depends on within-partition row order, which
            # drifts run to run downstream of joins; hash order depends
            # only on the data)
            w_s = Window.partitionBy("pid").orderBy(
                F.xxhash64(
                    F.concat_ws(",", F.col(vec_col).cast("array<string>")),
                    F.lit(seed + depth),
                )
            )
            for row in (
                cur.where(F.col("pid").isin(big))
                .select("pid", vec_col)
                .withColumn("_rn", F.row_number().over(w_s))
                .where(F.col("_rn") <= 512)
                # explicit sort: the 2-means init is order-sensitive, and
                # relying on the window's internal (pid, hash) order
                # surviving the filter+collect is plan-dependent (AQE or
                # optimizer changes could legally reorder the rows)
                .orderBy("pid", "_rn")
                .collect()
            ):
                samples_by_pid.setdefault(row["pid"], []).append(row[vec_col])
        split_exprs = None
        for pid in big:
            if depth % 2 == 0:
                # role split: pick the role closest to 50/50 membership —
                # scale sampled counts back by the sample rate before
                # comparing against the full node size
                sample = samples_by_pid.get(pid, [])
                n_node = sizes[pid]
                best = (
                    min(sample, key=lambda row: (abs(row["count"] / role_sample_rate / max(n_node, 1) - 0.5), row["r"]))
                    if sample
                    else None
                )
                cond = F.array_contains("_roles", int(best["r"])) if best is not None else F.lit(False)
            else:
                # centroid split: 2-means on the node's vector sample
                rng = np.random.default_rng([seed, depth, pid])
                vecs = samples_by_pid.get(pid, [])
                if len(vecs) < 2:
                    cond = F.lit(False)
                else:
                    X = np.array(vecs, dtype=np.float64)
                    c = X[rng.choice(len(X), 2, replace=False)]
                    for _ in range(8):
                        d = ((X[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                        lab = d.argmin(1)
                        c = np.array([X[lab == j].mean(0) if (lab == j).any() else c[j] for j in range(2)])
                    from ..functions import vector as V

                    d0 = V.l2_squared(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c[0]]))
                    d1 = V.l2_squared(F.col(vec_col), F.array(*[F.lit(float(v)) for v in c[1]]))
                    cond = d0 <= d1
            new_pid = (
                F.col("pid") * F.lit(2).cast("long")
                + F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")
                + F.lit(2 ** 30).cast("long")
            )
            split_exprs = (
                F.when(F.col("pid") == pid, new_pid)
                if split_exprs is None
                else split_exprs.when(F.col("pid") == pid, new_pid)
            )
        # non-split nodes keep pid; splitted get fresh ids in a new namespace
        cur = cur.withColumn("pid", F.coalesce(split_exprs, F.col("pid"))).localCheckpoint()
    return cur.drop("_roles").withColumnRenamed("pid", "partition_id")


def qdtree_search_stats(assigned: DataFrame) -> DataFrame:
    """Partition population stats (validation parity:
    ``HQI/debug/validate_qdtree_partitions.py``)."""
    return assigned.groupBy("partition_id").agg(
        F.count("*").alias("n_blocks"), F.countDistinct("document_id").alias("n_docs")
    )

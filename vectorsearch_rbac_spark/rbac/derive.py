"""Deterministic RBAC model derived from the testdata star schema.

Parity: reference data model ``controller/initialize_main_tables.py:17-72``
(Users / Roles / UserRoles / Documents / documentblocks /
PermissionAssignment). The reference populates these from external datasets +
synthetic RBAC generators; the driver's testdata has no RBAC tables, so we
derive them **arithmetically** — the same arithmetic is expressible in the
DuckDB oracle SQL, giving exact cross-engine parity (SURVEY.md §4):

- ``users``: ``user_id = c_custkey`` from ``customer``.
- ``roles``: role ids ``0..NUM_ROLES-1``.
- ``user_roles``: user *u* holds roles ``{u % 10, (u*7+3) % 10}``.
- ``permission_assignment``: role *r* may access document *d* iff
  ``d % 10 == r`` or ``(d+3) % 10 == r`` (each doc → exactly 2 roles).
- ``documentblocks``: from ``embeddings``; ``block_id = vec_id``,
  ``document_id = vec_id % count(documents)``, ``vector = embedding``.

Scale notes: user_roles/permission_assignment are tiny relative to blocks
(dims vs fact) → always broadcast; documentblocks is the 100 TB fact table
and is only ever scanned/filtered, never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import md5_long

NUM_ROLES = 10
# query user assignment modulus (prime, spreads queries across users)
USER_MOD = 97


def derive_rbac(customer: DataFrame, documents: DataFrame, embeddings: DataFrame) -> dict[str, DataFrame]:
    users = customer.select(F.col("c_custkey").alias("user_id"))

    spark = customer.sparkSession
    roles = spark.range(NUM_ROLES).select(F.col("id").cast("int").alias("role_id"))

    user_roles = (
        users.select("user_id", (F.col("user_id") % 10).cast("int").alias("role_id"))
        .unionAll(
            users.select("user_id", ((F.col("user_id") * 7 + 3) % 10).cast("int").alias("role_id"))
        )
        .distinct()
    )

    permission_assignment = (
        documents.select(F.col("doc_id").alias("document_id"), (F.col("doc_id") % 10).cast("int").alias("role_id"))
        .unionAll(
            documents.select(
                F.col("doc_id").alias("document_id"), ((F.col("doc_id") + 3) % 10).cast("int").alias("role_id")
            )
        )
        .distinct()
    )

    n_docs = documents.select(F.count("*").alias("n"))
    documentblocks = (
        embeddings.crossJoin(F.broadcast(n_docs))
        .select(
            F.col("vec_id").alias("block_id"),
            (F.col("vec_id") % F.col("n")).alias("document_id"),
            F.col("embedding").alias("vector"),
            F.col("label"),
        )
    )

    return {
        "users": users,
        "roles": roles,
        "user_roles": user_roles,
        "permission_assignment": permission_assignment,
        "documentblocks": documentblocks,
    }


def derive_queries(embeddings: DataFrame, stride: int = 100) -> DataFrame:
    """Deterministic query workload: every ``stride``-th embedding is a query
    issued by user ``vec_id % USER_MOD``.

    Parity: reference ``basic_benchmark/generate_queries.py`` /
    ``services/read_dataset_function.generate_query_dataset`` draw
    (user_id, query_vector) pairs; we pin them arithmetically for oracle
    parity. Query sets are tiny → broadcast to every executor.
    """
    return embeddings.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") % USER_MOD).alias("user_id"),
        F.col("embedding").alias("query_vector"),
    )


def derive_queries_zipf(embeddings: DataFrame, n_queries: int = 50, seed: int = 7) -> DataFrame:
    """Zipf-skewed query workload: query *i* targets the vector at zipf rank
    ``k_i = floor(M / h_i)`` (``h_i`` uniform in [1, M] via the md5 scheme),
    so ``P(rank ≥ k) ≈ 1/k`` — the a=2 zipf tail — and the hottest vector
    serves ~50% of queries. Users stay uniform.

    Parity: reference ``services/read_dataset_function.py:739``
    (``np.random.zipf(zipf_param) % total_blocks`` picks skewed block
    indices, users drawn uniformly). The inverse-CDF here is PURE INTEGER
    math (no float pow), so the DuckDB oracle reproduces it bit-exactly:
    ``(M // h) % count(embeddings)``.

    Benchmarks over uniform workloads hide hot-vector/hot-user skew; this is
    the workload to run prefilter/postfilter under before trusting a layout
    at scale.
    """
    spark = embeddings.sparkSession
    M = 1_000_000
    n_vec = embeddings.select(F.count("*").alias("nv"))
    idx = spark.range(n_queries).select(F.col("id").alias("query_id"))
    drawn = (
        idx.withColumn("h", md5_long(F.col("query_id").cast("string"), salt=f"z{seed}") % M + 1)
        .withColumn("user_id", md5_long(F.col("query_id").cast("string"), salt=f"u{seed}") % USER_MOD)
        .crossJoin(F.broadcast(n_vec))
        .select("query_id", "user_id", F.expr("1000000 DIV h").cast("long").alias("k"), "nv")
        .withColumn("pick", F.col("k") % F.col("nv"))
    )
    return drawn.join(
        embeddings.select(F.col("vec_id").alias("pick"), F.col("embedding").alias("query_vector")),
        "pick",
    ).select("query_id", "user_id", "query_vector")


def query_roles(queries: DataFrame) -> DataFrame:
    """Roles held by each query's user, computed arithmetically (no join with
    the customer table needed — same formula as ``user_roles``)."""
    u = F.col("user_id")
    return (
        queries.select("query_id", (u % 10).cast("int").alias("role_id"))
        .unionAll(queries.select("query_id", ((u * 7 + 3) % 10).cast("int").alias("role_id")))
        .distinct()
    )


def accessible_documents(user_roles: DataFrame, permission_assignment: DataFrame) -> DataFrame:
    """user_id → distinct permitted document_id.

    Parity: the prefilter CTE in ``common_function.py:112-121``
    (SELECT DISTINCT pa.document_id FROM PermissionAssignment pa JOIN
    UserRoles ur ... WHERE ur.user_id = %s) — set-at-a-time for all users.
    Both inputs are dim-sized → broadcast-joined by Catalyst/AQE.
    """
    return (
        user_roles.join(permission_assignment, "role_id")
        .select("user_id", "document_id")
        .distinct()
    )


def block_selectivity(user_roles: DataFrame, permission_assignment: DataFrame, documentblocks: DataFrame) -> DataFrame:
    """Per-user fraction of blocks accessible.

    Parity: ``basic_benchmark/generate_queries.py:14``
    (calculate_block_selectivity) — one SQL round-trip per user there; a
    single aggregate over the permitted-blocks join here.
    """
    total = documentblocks.select(F.count("*").alias("total_blocks"))
    acc = (
        accessible_documents(user_roles, permission_assignment)
        .join(documentblocks.select("document_id", "block_id"), "document_id")
        .groupBy("user_id")
        .agg(F.count("block_id").alias("accessible_blocks"))
    )
    return acc.crossJoin(F.broadcast(total)).select(
        "user_id",
        "accessible_blocks",
        F.round(F.col("accessible_blocks") / F.col("total_blocks"), 6).alias("selectivity"),
    )


def role_reach(permission_assignment: DataFrame, documentblocks: DataFrame) -> DataFrame:
    """B8: per-role audit rollup — documents and blocks each role reaches,
    plus the block fraction (the role-level analogue of per-user
    selectivity; what an access review reads first). One broadcast join +
    one aggregate."""
    total = documentblocks.select(F.count("*").alias("total_blocks"))
    return (
        permission_assignment.join(
            documentblocks.select("document_id", "block_id"), "document_id"
        )
        .groupBy("role_id")
        .agg(
            F.countDistinct("document_id").cast("long").alias("n_docs"),
            F.count("block_id").cast("long").alias("n_blocks"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "role_id", "n_docs", "n_blocks",
            F.round(F.col("n_blocks") / F.col("total_blocks"), 6).alias("block_frac"),
        )
    )


def role_overlap(permission_assignment: DataFrame) -> DataFrame:
    """B8: pairwise role-permission Jaccard — the role-mining similarity
    matrix (roles with overlap ≈ 1 are consolidation candidates; RBAC
    administration's classic cleanup signal). Self-join on document_id
    with r1 < r2 — pair cardinality is roles², never documents²."""
    a = permission_assignment.select(F.col("role_id").alias("r1"), "document_id")
    b = permission_assignment.select(F.col("role_id").alias("r2"), "document_id")
    inter = (
        a.join(b, "document_id")
        .where(F.col("r1") < F.col("r2"))
        .groupBy("r1", "r2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sizes = permission_assignment.groupBy("role_id").agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        inter.join(F.broadcast(sizes.select(F.col("role_id").alias("r1"), F.col("n").alias("na"))), "r1")
        .join(F.broadcast(sizes.select(F.col("role_id").alias("r2"), F.col("n").alias("nb"))), "r2")
        .select(
            "r1", "r2", "n_inter",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )

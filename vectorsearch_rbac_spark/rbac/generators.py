"""Distributed synthetic RBAC generators.

Parity: reference ``services/rbac_generator/`` —
``random_rbac_data_generator.py`` (random role/perm assignment),
``tree_based_rbac_data_generator.py`` (role tree of height h, branching
b0..b1, disjoint doc sets per role, ancestors inherit descendants' docs),
``erbac_data_generator.py`` (two-level business→functional role hierarchy).

The reference builds these with driver-side Python loops + psycopg2 inserts;
here generation is declarative DataFrame transforms seeded with deterministic
per-row hashes (the shared cross-engine ``md5 → 15 hex → BIGINT`` scheme) so
the same (seed, size) always yields the same relations on any cluster layout
— no RNG state on the driver, no collect — AND every generated relation has
an exact DuckDB-oracle formulation
(``('0x' || substr(md5(seed || ':' || x), 1, 15))::BIGINT % mod``).
Scales to billions of users: everything is ``spark.range`` + column
arithmetic + joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import md5_long


def _h(col, seed: int, mod: int):
    """Deterministic pseudo-random int in [0, mod) from a column + seed.

    Cross-engine: md5_long is 60-bit non-negative, so plain ``%`` matches
    DuckDB exactly (no pmod vs % sign mismatch).
    """
    return md5_long(col.cast("long").cast("string"), salt=seed) % mod


def random_rbac(
    spark: SparkSession,
    num_users: int,
    num_roles: int,
    num_documents: int,
    m_roles: int = 3,
    m_perms: int = 20,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Random RBAC: each user gets 1..m_roles roles, each role 1..m_perms docs.

    Parity: ``random_rbac_data_generator.py:27-84`` (random.sample loops →
    per-row hash draws).
    """
    users = spark.range(1, num_users + 1).select(F.col("id").alias("user_id"))
    roles = spark.range(1, num_roles + 1).select(F.col("id").alias("role_id"))

    # user u draws k_u = 1 + h(u) % m_roles roles; the j-th role is a hash draw
    ur = (
        users.select("user_id", (F.lit(1) + _h(F.col("user_id"), seed, m_roles)).alias("k"))
        .select("user_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "user_id",
            (F.lit(1) + _h(F.col("user_id") * 1000 + F.col("j"), seed + 1, num_roles)).alias("role_id"),
        )
        .distinct()
    )

    pa = (
        roles.select("role_id", (F.lit(1) + _h(F.col("role_id"), seed + 2, m_perms)).alias("k"))
        .select("role_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "role_id",
            (F.lit(1) + _h(F.col("role_id") * 100000 + F.col("j"), seed + 3, num_documents)).alias("document_id"),
        )
        .distinct()
    )
    return {"users": users, "roles": roles, "user_roles": ur, "permission_assignment": pa}


def tree_rbac(
    spark: SparkSession,
    num_users: int,
    num_documents: int,
    height: int = 4,
    branching: int = 3,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Tree RBAC: complete b-ary role tree of given height; leaves own
    disjoint document ranges; every role inherits all documents in its
    subtree; users are assigned one role uniformly.

    Parity: ``tree_based_rbac_data_generator.py:22-88`` (random tree +
    disjoint doc split + upward permission closure). The closure
    (ancestor inherits descendants' docs) is computed by joining each leaf to
    all its ancestors via base-b path arithmetic — O(height) column math, no
    recursion on the driver.
    """
    b = branching
    n_roles = (b ** (height + 1) - 1) // (b - 1)  # complete tree node count
    n_leaves = b**height
    first_leaf = (b**height - 1) // (b - 1)  # index of first leaf, root=0

    roles = spark.range(n_roles).select(
        F.col("id").cast("int").alias("role_id"),
        F.floor(F.log(float(b), (F.col("id") * (b - 1) + 1))).cast("int").alias("level"),
    )

    # leaf l (0-based) owns documents [l*docs_per, (l+1)*docs_per)
    docs_per = max(1, num_documents // n_leaves)
    leaves = spark.range(n_leaves).select(F.col("id").alias("leaf"))
    leaf_docs = leaves.select(
        "leaf",
        F.explode(
            F.sequence(F.col("leaf") * docs_per, (F.col("leaf") + 1) * docs_per - 1)
        ).alias("document_id"),
    ).where(F.col("document_id") < num_documents)

    # ancestors of leaf at depth d: repeatedly (node-1)/b; depth levels via sequence
    leaf_nodes = leaves.select("leaf", (F.col("leaf") + first_leaf).alias("node"))
    anc = leaf_nodes.select(
        "leaf",
        F.explode(F.sequence(F.lit(0), F.lit(height))).alias("up"),
        F.col("node"),
    )
    # node after `up` parent-steps: ((node+1) / b^up ceil) - adjust — use loop-free formula:
    # parent(n) = floor((n-1)/b); after k steps: floor((n - (b^k -1)/(b-1)) / b^k)
    bk = F.pow(F.lit(float(b)), F.col("up")).cast("long")
    geo = ((bk - 1) / F.lit(b - 1)).cast("long")
    anc = anc.select(
        "leaf", F.floor((F.col("node") - geo) / bk).cast("int").alias("role_id")
    )
    permission_assignment = (
        anc.join(leaf_docs, "leaf").select("role_id", "document_id").distinct()
    )

    users = spark.range(1, num_users + 1).select(F.col("id").alias("user_id"))
    user_roles = users.select(
        "user_id", _h(F.col("user_id"), seed, n_roles).cast("int").alias("role_id")
    )
    return {
        "users": users,
        "roles": roles.select("role_id"),
        "user_roles": user_roles,
        "permission_assignment": permission_assignment,
    }


def sharing_tree_rbac(
    spark: SparkSession,
    num_users: int,
    num_roles: int,
    num_documents: int,
    branching: int = 3,
    percent_shared: int = 30,
    max_share: int = 8,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Sharing-tree RBAC: a role hierarchy where DOCUMENTS ARE SHARED across
    several roles and permissions flow DOWN the tree (a child role inherits
    every ancestor's documents) — the opposite closure direction from
    ``tree_rbac``.

    Parity: ``sharing_tree_based_rbac_data_generator.py`` — role tree of
    random branching b0..b1 (re-expressed: fixed ``branching``, roles 0..R-1
    left-packed complete, role 0 = root with no documents, parent(n) =
    (n-1)//b); ``split_documents_into_shared_sets`` (:91) assigns
    ``percent_shared``% of docs to a Poisson-distributed number of random
    roles (re-expressed: bounded-uniform degree 1..``max_share`` via md5
    draws — overlap structure preserved, exact DuckDB oracle gained) and the
    rest uniquely; ``assign_sharing_permissions_to_tree`` (:141) unions each
    role's own set with everything inherited from its ancestors; users are
    spread evenly over non-root roles (:196).

    Scale: base assignment is explode + hash column math (no RNG state, no
    collect); the downward closure joins the dim-sized (role, ancestor)
    relation — O(R·depth) rows — against the base assignment, so the only
    big relation (doc assignments) is touched once.
    """
    b = branching
    R = num_roles
    # ancestor chain of node n after k parent-steps (0-indexed left-packed
    # complete tree): floor((n - (b^k - 1)/(b - 1)) / b^k) while >= 0
    max_depth = 0
    while (b ** (max_depth + 1) - 1) // (b - 1) <= R - 1:
        max_depth += 1

    roles = spark.range(R).select(F.col("id").cast("int").alias("role_id"))
    docs = spark.range(num_documents).select(F.col("id").alias("document_id"))

    shared = docs.where(_h(F.col("document_id"), seed + 10, 100) < percent_shared)
    degree = 1 + _h(F.col("document_id"), seed + 11, max_share)
    shared_base = (
        shared.select("document_id", F.explode(F.sequence(F.lit(1), degree)).alias("j"))
        .select(
            "document_id",
            (1 + _h(F.col("document_id") * 131 + F.col("j"), seed + 12, R - 1)).cast("int").alias("role_id"),
        )
    )
    unique_base = docs.where(_h(F.col("document_id"), seed + 10, 100) >= percent_shared).select(
        "document_id", (1 + _h(F.col("document_id"), seed + 13, R - 1)).cast("int").alias("role_id")
    )
    base = shared_base.unionAll(unique_base).distinct()

    # (role, ancestor) pairs incl. self (k=0); root contributes nothing
    anc = roles.select(
        "role_id", F.explode(F.sequence(F.lit(0), F.lit(max_depth))).alias("k")
    )
    bk = F.pow(F.lit(float(b)), F.col("k")).cast("long")
    geo = ((bk - 1) / F.lit(b - 1)).cast("long")
    anc = anc.select(
        "role_id", F.floor((F.col("role_id") - geo) / bk).cast("int").alias("anc_role")
    ).where(F.col("anc_role") >= 0).distinct()

    permission_assignment = (
        anc.join(base.withColumnRenamed("role_id", "anc_role"), "anc_role")
        .select("role_id", "document_id")
        .distinct()
    )

    users = spark.range(1, num_users + 1).select(F.col("id").alias("user_id"))
    user_roles = users.select(
        "user_id", (1 + _h(F.col("user_id"), seed + 14, R - 1)).cast("int").alias("role_id")
    )
    return {
        "users": users,
        "roles": roles,
        "user_roles": user_roles,
        "permission_assignment": permission_assignment,
        "base_assignment": base,
    }


def arxiv_business_rbac(
    spark: SparkSession,
    num_users: int,
    num_documents: int,
    n_categories: int = 24,
    max_cats_per_doc: int = 3,
    max_business_roles: int = 8,
    max_froles_per_brole: int = 3,
    users_per_brole: int | None = None,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """arXiv-style business-role RBAC (B9): functional roles derive from
    DOCUMENT ATTRIBUTES — each document carries 1..max_cats_per_doc
    category labels (multi-label, like arXiv's ``categories`` field),
    every category IS a functional role, each business role inherits the
    document UNION of its sampled functional roles, and users fill
    business roles round-robin in id order (not by random draw — the one
    generator in the reference family whose user assignment is
    positional).

    Parity: ``services/rbac_generator/arxiv_generator_business.py:21`` —
    ``load_data`` groups documents by category (the sandbox has no arXiv
    JSON, so labels are md5-synthesized from document ids; swap
    ``doc_categories`` for a real attribute table to run over actual
    metadata), ``generate_functional_roles`` maps category → role,
    ``generate_business_roles`` samples 1..max functional roles per
    business role and unions their documents,
    ``generate_users`` assigns ``users_per_business_role`` users to each
    business role sequentially. md5-deterministic throughout → exact
    DuckDB oracle.
    """
    docs = spark.range(num_documents).select(F.col("id").alias("document_id"))
    doc_categories = (
        docs.select(
            "document_id",
            (F.lit(1) + _h(F.col("document_id"), seed, max_cats_per_doc)).alias("k"),
        )
        .select("document_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "document_id",
            _h(F.col("document_id") * 100 + F.col("j"), seed + 1, n_categories).alias(
                "category_id"
            ),
        )
        .distinct()
    )
    brole_to_category = (
        spark.range(1, max_business_roles + 1)
        .select(
            F.col("id").alias("brole_id"),
            (F.lit(1) + _h(F.col("id"), seed + 2, max_froles_per_brole)).alias("k"),
        )
        .select("brole_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "brole_id",
            _h(F.col("brole_id") * 100 + F.col("j"), seed + 3, n_categories).alias(
                "category_id"
            ),
        )
        .distinct()
    )
    # business role inherits every document of its categories (the union
    # the reference materializes as role_permissions)
    permission_assignment = (
        brole_to_category.join(doc_categories, "category_id")
        .select(F.col("brole_id").alias("role_id"), "document_id")
        .distinct()
    )
    upb = users_per_brole or max(1, num_users // max_business_roles)
    users = spark.range(1, num_users + 1).select(F.col("id").alias("user_id"))
    # positional fill: business role b takes users ((b-1)*upb, b*upb];
    # users beyond B*upb get no role (the reference's early break)
    user_roles = users.where(F.col("user_id") <= upb * max_business_roles).select(
        "user_id",
        (F.expr(f"(user_id - 1) DIV {upb}") + 1).cast("long").alias("role_id"),
    )
    return {
        "users": users,
        "roles": spark.range(1, max_business_roles + 1).select(
            F.col("id").alias("role_id")
        ),
        "doc_categories": doc_categories,
        "brole_to_category": brole_to_category,
        "user_roles": user_roles,
        "permission_assignment": permission_assignment,
    }


def erbac(
    spark: SparkSession,
    num_users: int,
    n_froles: int,
    n_broles: int,
    num_documents: int,
    m_perms: int = 10,
    m_froles: int = 4,
    m_broles: int = 2,
    seed: int = 42,
) -> dict[str, DataFrame]:
    """ERBAC: users → business roles → functional roles → documents.

    Parity: ``erbac_data_generator.py:30-...``. The effective
    user→document permission is the composition of three many-to-many
    relations; we materialize the flattened ``user_roles`` (user→functional
    role) and role→doc tables so downstream search operators are identical.
    """
    users = spark.range(1, num_users + 1).select(F.col("id").alias("user_id"))
    froles = spark.range(1, n_froles + 1).select(F.col("id").alias("role_id"))

    # business role → functional roles
    br_fr = (
        spark.range(1, n_broles + 1)
        .select(F.col("id").alias("brole_id"), (F.lit(1) + _h(F.col("id"), seed, m_froles)).alias("k"))
        .select("brole_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "brole_id",
            (F.lit(1) + _h(F.col("brole_id") * 1000 + F.col("j"), seed + 1, n_froles)).alias("role_id"),
        )
        .distinct()
    )
    # user → business roles
    u_br = (
        users.select("user_id", (F.lit(1) + _h(F.col("user_id"), seed + 2, m_broles)).alias("k"))
        .select("user_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "user_id",
            (F.lit(1) + _h(F.col("user_id") * 1000 + F.col("j"), seed + 3, n_broles)).alias("brole_id"),
        )
        .distinct()
    )
    user_roles = u_br.join(br_fr, "brole_id").select("user_id", "role_id").distinct()

    pa = (
        froles.select("role_id", (F.lit(1) + _h(F.col("role_id"), seed + 4, m_perms)).alias("k"))
        .select("role_id", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("j"))
        .select(
            "role_id",
            (F.lit(1) + _h(F.col("role_id") * 100000 + F.col("j"), seed + 5, num_documents)).alias("document_id"),
        )
        .distinct()
    )
    return {
        "users": users,
        "roles": froles,
        "business_roles": u_br,
        "brole_to_frole": br_fr,
        "user_roles": user_roles,
        "permission_assignment": pa,
    }

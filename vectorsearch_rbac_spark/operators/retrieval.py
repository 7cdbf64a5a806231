"""Text retrieval + hybrid fusion (SURVEY.md §2 E26/E27).

The text-side complement to the vector search operators: BM25 keyword
scoring over the documents table, and reciprocal-rank fusion (RRF) of a
BM25 ranking with a vector-similarity ranking — the standard hybrid-search
combiner (used by every vector DB that also does keyword search; pgvector
deployments pair it with Postgres FTS the same way).

Both are pure DataFrame plans with exact DuckDB oracles: BM25 is two
aggregates (tf by (doc, term), df by term) + a broadcast corpus-stats row;
RRF is an outer join of two rank lists with a rational score — integer
ranks in, deterministic doubles out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from .hints import gated_broadcast, memoized_stat, parallelize_scan

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_scores(
    documents: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rank-free BM25 score table (query_id, doc_id, score) — the expensive
    half of `bm25_topk` (tf/df/dlen aggregates over the corpus), split out
    so one scored table can feed several rankings (plain, RBAC-filtered,
    hybrid shortlist) without recomputing the corpus aggregates; callers
    that fan out localCheckpoint the result once.
    """
    # r12: split the serial single-file scan ahead of the tokenize explode
    # (size-gated — see parallelize_scan); corpus-size stats stay as-is
    toks = parallelize_scan(documents).select(
        F.col(id_col).alias("doc_id"), F.explode(T.tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dlen = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dlen"))
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    stats = documents.agg(
        F.count("*").cast("long").alias("n_docs"),
    ).crossJoin(toks.agg((F.count("*") / F.countDistinct("doc_id")).alias("avg_len")))

    q = query_terms.select("query_id", F.explode("terms").alias("term"))
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(df_, "term")
        .join(dlen, "doc_id")
        .join(F.broadcast(stats), how="cross")
        .withColumn(
            "idf",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dlen") / F.col("avg_len"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored


def bm25_rank(
    scored: DataFrame,
    k: int = 10,
    permitted: DataFrame | None = None,
) -> DataFrame:
    """Top-k rank over a `bm25_scores` table: optional RBAC semi-join BEFORE
    the rank window (prefilter semantics), ties by doc id.

    The permitted (query_id, doc_id) relation is Q × accessible-docs —
    doc-cardinality, so its broadcast hint is SIZE-GATED (the knn.py
    `_join_masks` idiom): hinted while a memoized one-time count says it
    fits, else the semi-join shuffles on its keys (bucketable on doc_id)."""
    if permitted is not None:
        p = permitted.select("query_id", F.col("doc_id"))
        # price the gate by DISTINCT pairs (r12, ADVICE r11): the left-semi
        # consumer is duplicate-insensitive, so role-fan-out duplicates in
        # the role-expanded relation inflate a raw count and could flip an
        # otherwise-fitting broadcast to a shuffle — a silent pessimization
        est = memoized_stat(
            p, "n_distinct_pairs",
            lambda: p.agg(F.count_distinct("query_id", "doc_id").alias("n")).first()["n"] or 0,
        ) * 24
        scored = scored.join(gated_broadcast(p, est), ["query_id", "doc_id"], "left_semi")
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk(
    documents: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    permitted: DataFrame | None = None,
) -> DataFrame:
    """BM25 top-k per query: ``query_terms`` is (query_id, terms
    array<string>); score(d,q) = Σ_t idf(t)·tf·(k1+1)/(tf + k1·(1-b+b·len/avg)),
    idf = ln(1 + (N-df+0.5)/(df+0.5)); rounded to 6 dp, ties by doc id.

    ``permitted`` (optional, (query_id, doc_id)) applies RBAC to keyword
    search the way the reference applies it to vector search: a semi-join
    drops unpermitted docs BEFORE the rank window, so corpus statistics
    (idf, avg_len) stay global but the ranking is permission-aware —
    prefilter semantics, same as `knn.knn_prefilter`.

    Scale: tf/df are the same two shuffles the TF-IDF operator pays; the
    query side explodes to (query_id, term) — queries are dim-sized, so the
    term join broadcasts them; the per-query rank window ships (ids, score).
    """
    return bm25_rank(bm25_scores(documents, query_terms, id_col, text_col), k, permitted)


def rrf_fuse(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    rrf_k: int = RRF_K,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal-rank fusion of two (query_id, id, rank) lists:
    score = Σ_lists 1/(rrf_k + rank), absent list contributes 0. Integer
    ranks → the score is a deterministic rational, exact across engines
    (≤ 2 contributions per key, and two-term IEEE addition commutes, so
    the aggregate order can't change the rounded value).

    Shape: the natural FULL OUTER join cannot broadcast in Spark (it
    degrades to a sort-merge join even on rank-list-sized inputs); the
    union + groupBy form computes the identical score with ONE hash
    shuffle on (query_id, id) and no join at all."""
    contrib = lambda df: df.select(
        "query_id", id_col, (F.lit(1.0) / (F.lit(rrf_k) + F.col("rank"))).alias("_c")
    )
    fused = (
        contrib(rank_a).unionByName(contrib(rank_b))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("_c"), 6).alias("rrf_score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rrf_score", "rank")
    )


MMR_LAMBDA = 0.5


def mmr_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_candidates: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (E36, Carbonell &
    Goldstein 1998): greedily select ``k`` of the ``n_candidates`` most
    relevant docs per query, each step maximizing
    ``λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)`` with λ = 0.5 — the standard
    redundancy-suppressing re-rank in retrieval/RAG stacks.

    Determinism: rel = 1 − (6 dp cosine distance), pairwise sims rounded
    to 6 dp, every argmax tie-broken by id; the oracle replays the same
    greedy steps unrolled, so scores are bit-identical.

    Scale: the candidate set is (queries × n_candidates) — bounded and
    broadcastable by construction (this is a RE-RANK, downstream of
    retrieval). The only corpus-sized work is the candidate generation
    itself (brute-force here; swap in IVF/LSH upstream at scale). All k−1
    greedy iterations run over broadcast-sized tables; the per-query
    candidate×selected sim table is ≤ n_candidates² rows per query.
    """
    from . import ann
    from ..functions import vector as V

    cands = (
        ann.cosine_topk_bruteforce(embeddings, queries, k=n_candidates, id_col=id_col, vec_col=vec_col)
        .select("query_id", id_col, (F.lit(1.0) - F.col("distance")).alias("rel"))
        # NaN-safe (r7 zero-norm guard): NaN rel would sort FIRST under
        # the descending relevance window and NaN pair-sims would poison
        # every max(); dropping NaN candidates here removes both (all
        # surviving candidate vectors have nonzero norm, so downstream
        # sims are finite)
        .where(~F.isnan("rel"))
    )
    # reattach vectors: probe the corpus with the broadcast candidate list
    cands = (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(cands), id_col)
        .localCheckpoint(eager=False)
    )
    a = cands.select("query_id", F.col(id_col).alias("ia"), F.col(vec_col).alias("va"))
    b = cands.select("query_id", F.col(id_col).alias("ib"), F.col(vec_col).alias("vb"))
    sims = (
        a.join(F.broadcast(b), "query_id")
        .where(F.col("ia") != F.col("ib"))
        .select("query_id", "ia", "ib", F.round(V.cosine_similarity("va", "vb"), 6).alias("sim"))
        .localCheckpoint(eager=False)
    )
    flat = cands.select("query_id", id_col, "rel")
    w1 = Window.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col(id_col).asc())
    selected = (
        flat.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") == 1)
        .select("query_id", id_col, F.col("rel").alias("mmr_score"), F.lit(1).cast("long").alias("rank"))
        .localCheckpoint(eager=False)
    )
    lam = F.lit(MMR_LAMBDA)
    for step in range(2, k + 1):
        sel_ids = selected.select("query_id", F.col(id_col).alias("ib"))
        maxsim = (
            sims.join(F.broadcast(sel_ids), ["query_id", "ib"])
            .groupBy("query_id", "ia")
            .agg(F.max("sim").alias("maxsim"))
        )
        remaining = flat.join(
            F.broadcast(selected.select("query_id", id_col)), ["query_id", id_col], "left_anti"
        )
        scored = remaining.join(
            maxsim,
            (remaining["query_id"] == maxsim["query_id"]) & (remaining[id_col] == maxsim["ia"]),
        ).select(
            remaining["query_id"], remaining[id_col],
            (lam * F.col("rel") - (F.lit(1.0) - lam) * F.col("maxsim")).alias("mmr"),
        )
        w = Window.partitionBy("query_id").orderBy(F.col("mmr").desc(), F.col(id_col).asc())
        pick = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("query_id", id_col, F.col("mmr").alias("mmr_score"),
                    F.lit(step).cast("long").alias("rank"))
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected


def maxsim_topk(
    documents: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    dim: int = 16,
    max_doc_tokens: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E44 late-interaction retrieval (ColBERT-style MaxSim, Khattab &
    Zaharia 2020): score(q, d) = Σ_{t∈q} max_{u∈d} cos(E(t), E(u)) — each
    query token finds its best-matching document token, scores sum.

    Token embeddings here are DETERMINISTIC hash projections
    (v_i = (md5_long(tok:i) mod 2001 − 1000)/1000 — the stand-in for a
    learned encoder, exactly replayable by the SQL oracle; swap E() for a
    real encoder output table and nothing else changes). Doc-side tokens
    are CONTEXTUALIZED the way a real late-interaction encoder's are:
    E(u | doc) = 0.8·v(u) + 0.2·v(prev token), so the same word in
    different contexts embeds differently and MaxSim discriminates
    occurrences rather than degenerate exact-match ties; query tokens are
    context-free (the query-encoder side). Documents are represented by
    their first ``max_doc_tokens`` tokens (with positions) — the
    fixed-length token matrix a late-interaction index stores.

    Scale shape: doc tokens explode ONCE (≤ max_doc_tokens rows/doc, the
    context mix computed from the array before the explode — narrow), the
    tiny query-term table broadcasts, the (q-term × doc-token) cosine is
    a codegen'd expression, and the two-level aggregate (max per q-term,
    sum per doc) is map-side combinable on the (query, doc) key. No
    corpus×corpus join anywhere; per-doc work is O(|q|·max_doc_tokens).
    """
    from ..functions.vector import cosine_similarity, md5_long

    def tok_vec(tok_col) -> F.Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(md5_long(F.concat(tok_col, F.lit(":"), i.cast("string"))), F.lit(2001))
                - 1000
            ) / 1000.0,
        )

    # embed each DISTINCT token once (the "encoder output table"), then
    # join occurrences against it — hashing per occurrence would redo
    # dim·2 md5s for every token position in the corpus
    occs = (
        # r12: split the serial single-file scan ahead of the tokenize +
        # context-mix explode (size-gated — see parallelize_scan)
        parallelize_scan(documents)
        .select(F.col(id_col).alias("doc_id"), T.tokens(text_col).alias("_tk"))
        .where(F.size("_tk") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.least(F.size("_tk"), F.lit(max_doc_tokens))),
                    lambda p: F.struct(
                        F.element_at("_tk", p).alias("tok"),
                        F.when(p > 1, F.element_at("_tk", p - 1)).otherwise(F.lit("<s>")).alias("prev"),
                    ),
                )
            ).alias("_c"),
        )
        .select("doc_id", F.col("_c.tok").alias("tok"), F.col("_c.prev").alias("prev"))
    )
    vocab = (
        occs.select(F.col("tok").alias("t"))
        .unionByName(occs.select(F.col("prev").alias("t")))
        .distinct()
        .withColumn("tvec", tok_vec(F.col("t")))
    )
    q_toks = query_terms.select(
        "query_id", F.explode("terms").alias("qtok")
    ).withColumn("qvec", tok_vec(F.col("qtok")))

    # the dim-heavy cosine runs ONCE per (query-term × distinct context
    # bigram) — a vocab²-bounded table, not per token occurrence; the
    # corpus-sized occurrence stream then just hash-joins its
    # precomputed similarity. |bigram vocab| ≪ corpus by Zipf.
    bigrams = (
        occs.select("tok", "prev").distinct()
        .join(F.broadcast(vocab.select(F.col("t").alias("tok"), F.col("tvec").alias("_vt"))), "tok")
        .join(F.broadcast(vocab.select(F.col("t").alias("prev"), F.col("tvec").alias("_vp"))), "prev")
        .select("tok", "prev", F.zip_with("_vt", "_vp", lambda a, b: a * 0.8 + b * 0.2).alias("dvec"))
    )
    sims = (
        bigrams.join(F.broadcast(q_toks), how="cross")
        .select(
            "tok", "prev", "query_id", "qtok",
            F.round(cosine_similarity("qvec", "dvec"), 6).alias("sim"),
        )
    )
    per_qtok = (
        occs.join(F.broadcast(sims), ["tok", "prev"])
        .groupBy("query_id", "doc_id", "qtok")
        .agg(F.max("sim").alias("best"))
    )
    scored = per_qtok.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("best"), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )

"""Property-based tests (hypothesis): algebraic invariants that must hold
for ANY input, complementing the example-based suites — distance axioms,
quantization bounds, hash ranges, pack/unpack identities (SURVEY.md §5)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F


VEC = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False, width=32),
    min_size=4, max_size=4,
)


def _one_row(spark, **cols):
    """Evaluate column expressions against literal arrays on a 1-row frame."""
    return spark.range(1).select(*[v.alias(k) for k, v in cols.items()]).first()


def _arr(v):
    return F.array(*[F.lit(float(x)) for x in v])


@settings(max_examples=25, deadline=None)
@given(a=VEC, b=VEC)
def test_distance_axioms(spark, a, b):
    from vectorsearch_rbac_spark.functions import vector as V

    r = _one_row(
        spark,
        l2ab=V.l2_distance(_arr(a), _arr(b)),
        l2ba=V.l2_distance(_arr(b), _arr(a)),
        l2aa=V.l2_distance(_arr(a), _arr(a)),
        l1ab=V.l1_distance(_arr(a), _arr(b)),
        ip=V.inner_product(_arr(a), _arr(b)),
    )
    assert r["l2ab"] == pytest.approx(r["l2ba"], rel=1e-9)  # symmetry
    assert r["l2aa"] == pytest.approx(0.0, abs=1e-9)        # identity
    assert r["l2ab"] >= 0 and r["l1ab"] >= 0                # non-negativity
    exp_ip = float(np.dot(np.array(a, dtype=np.float64), np.array(b, dtype=np.float64)))
    assert r["ip"] == pytest.approx(exp_ip, rel=1e-6, abs=1e-6)


@settings(max_examples=25, deadline=None)
@given(v=VEC)
def test_int8_quantize_bounds_and_sign(spark, v):
    from vectorsearch_rbac_spark.operators import curation

    r = _one_row(spark, q=curation.int8_quantize(_arr(v)))
    q = r["q"]
    assert all(-127 <= x <= 127 for x in q)
    m = max(abs(x) for x in v)
    for orig, quant in zip(v, q):
        if m > 1e-12 and abs(orig) > 1e-12:
            assert quant == 0 or (quant > 0) == (orig > 0)  # sign preserved
    if m > 1e-6:
        assert max(abs(x) for x in q) == 127  # the max dim saturates


@settings(max_examples=20, deadline=None)
@given(s=st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\\\x00"), min_size=0, max_size=40))
def test_md5_long_range_and_determinism(spark, s):
    from vectorsearch_rbac_spark.functions.vector import md5_long

    r1 = _one_row(spark, h=md5_long(F.lit(s)))
    r2 = _one_row(spark, h=md5_long(F.lit(s)))
    assert r1["h"] == r2["h"]
    assert 0 <= r1["h"] < 16 ** 15  # 60-bit range


@settings(max_examples=20, deadline=None)
@given(v=VEC)
def test_binary_quantize_pack_popcount_consistency(spark, v):
    """hamming(pack(a), pack(0)) == number of positive dims of a."""
    from vectorsearch_rbac_spark.functions import vector as V

    q = V.binary_quantize(_arr(v))
    zeros = V.binary_quantize(_arr([0.0] * len(v)))
    r = _one_row(
        spark,
        h=V.hamming_distance(q, zeros),
        npos=F.size(F.filter(_arr(v), lambda x: x > 0)),
    )
    assert r["h"] == r["npos"]


@settings(max_examples=20, deadline=None)
@given(s=st.text(alphabet=st.characters(codec="ascii", exclude_characters="'\\\x00"), min_size=0, max_size=60))
def test_text_metric_ranges(spark, s):
    """Quality/ratio metrics stay in [0,1] and counts stay non-negative for
    arbitrary ascii input (empty, punctuation soup, whitespace runs)."""
    from vectorsearch_rbac_spark.functions import text as T

    r = _one_row(
        spark,
        q=T.quality_score(F.lit(s)),
        sw=T.stopword_ratio(F.lit(s)),
        pr=T.punct_ratio(F.lit(s)),
        rep=T.repetition_ratio(F.lit(s)),
        bgf=T.top_bigram_frac(F.lit(s)),
        n=T.token_count(F.lit(s)),
        nb=T.bpe_ish_token_count(F.lit(s)),
    )
    assert 0.0 <= r["q"] <= 1.0
    assert 0.0 <= r["sw"] <= 1.0 and 0.0 <= r["pr"] <= 1.0 and 0.0 <= r["rep"] <= 1.0
    assert 0.0 <= r["bgf"] <= 1.0
    assert r["n"] >= 0 and r["nb"] >= 0


def test_top_bigram_frac_known_values(spark):
    """Gopher top-2-gram signal on hand-checked inputs: a pure loop scores
    ~1, varied text scores low, <2 tokens scores 0."""
    from vectorsearch_rbac_spark.functions import text as T

    cases = {
        "a b a b a b a b": 4 / 7,  # 'a b'×4, 'b a'×3 of 7 bigrams
        "spam spam spam spam": 3 / 3,  # 'spam spam'×3
        "one two three four five": 1 / 4,  # all bigrams distinct
        "solo": 0.0,
        "": 0.0,
    }
    for s, want in cases.items():
        r = _one_row(spark, bgf=T.top_bigram_frac(F.lit(s)))
        assert r["bgf"] == pytest.approx(want, abs=1e-6), s


# ---------------------------------------------------------------- D10 layout
# The partition-composition greedy is pure driver-side logic over atom
# statistics — fuzz it directly: for ANY access-set structure and workload,
# the budget holds, routing covers every comb, and the result is
# order-independent (determinism is what makes the entry oracle-checkable).

_ROLES = st.integers(min_value=0, max_value=5)
_ATOMS = st.dictionaries(
    st.frozensets(_ROLES, min_size=1, max_size=4),
    st.integers(min_value=1, max_value=500),
    min_size=1, max_size=12,
)
_WEIGHTS = st.dictionaries(
    st.frozensets(_ROLES, min_size=1, max_size=4),
    st.floats(min_value=0.0, max_value=10.0, allow_nan=False),
    min_size=0, max_size=8,
)


def _key(roles):
    return ",".join(str(r) for r in sorted(roles))


@settings(max_examples=40, deadline=None)
@given(atoms=_ATOMS, weights=_WEIGHTS, alpha=st.floats(min_value=1.0, max_value=3.0))
def test_layout_optimizer_invariants(atoms, weights, alpha):
    from vectorsearch_rbac_spark.operators import layout

    atom_rows = [{"atom_key": _key(k), "n_blocks": v} for k, v in atoms.items()]
    weight_rows = [{"comb_key": _key(k), "weight": w} for k, w in weights.items()]

    assignment, routing, rep = layout.split_comb_roles(atom_rows, weight_rows, alpha=alpha)

    total = sum(atoms.values())
    assert rep["total_blocks"] == total
    assert rep["stored_blocks"] <= alpha * total + 1e-9          # budget
    assert rep["stored_blocks"] >= total                          # every atom kept
    assert rep["predicted_query_time"] <= rep["predicted_query_time_naive"] + 1e-9

    holders: dict[str, set[int]] = {}
    for atom_key, pid, _load in assignment:
        holders.setdefault(atom_key, set()).add(pid)
    assert set(holders) == {_key(k) for k in atoms}               # nothing dropped

    routes: dict[str, set[int]] = {}
    for comb_key, pid in routing:
        routes.setdefault(comb_key, set()).add(pid)
    atom_roles = {_key(k): set(k) for k in atoms}
    all_roles = set().union(*atoms.keys())
    for r in all_roles:
        assert str(r) in routes                                   # singles always routed
    part_atoms: dict[int, set[str]] = {}
    for atom_key, pid, _load in assignment:
        part_atoms.setdefault(pid, set()).add(atom_key)
    for comb_key, pids in routes.items():
        roles = {int(x) for x in comb_key.split(",")}
        need = {a for a, rs in atom_roles.items() if rs & roles}
        have = set().union(*(part_atoms[p] for p in pids))
        assert need <= have, f"comb {comb_key} uncovered"         # coverage

    # determinism: input order must not matter
    a2, r2, rep2 = layout.split_comb_roles(
        list(reversed(atom_rows)), list(reversed(weight_rows)), alpha=alpha
    )
    assert a2 == assignment and r2 == routing and rep2["splits"] == rep["splits"]


@settings(max_examples=15, deadline=None)
@given(
    passage=st.text(alphabet="abcdefgh ", min_size=60, max_size=120),
    prefix_a=st.text(alphabet="xyzuvw ", min_size=0, max_size=37),
    prefix_b=st.text(alphabet="pqrst ", min_size=0, max_size=53),
)
def test_dup_window_sampling_is_alignment_free(spark, passage, prefix_a, prefix_b):
    """E31 invariant: content-defined sampling picks grams by CONTENT, so a
    shared passage yields the same sampled-duplicate evidence no matter
    where it sits in each doc — a copy is flagged in both docs (or, if the
    passage happens to sample no gram, in neither)."""
    from vectorsearch_rbac_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, prefix_a + " " + passage), (2, prefix_b + " " + passage)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dedup.dup_window_stats(
        docs, win=24, sample_mod=2).collect()}
    # symmetric detection: either both docs carry duplicated grams or neither
    assert (got[1]["n_dup_windows"] > 0) == (got[2]["n_dup_windows"] > 0)


@settings(max_examples=20, deadline=None)
@given(
    n_tokens=st.integers(min_value=0, max_value=400),
    chunk=st.integers(min_value=8, max_value=64),
    overlap=st.integers(min_value=0, max_value=7),
)
def test_chunk_tiling_invariants(spark, n_tokens, chunk, overlap):
    """For ANY doc length and (chunk, overlap < chunk): starts advance by
    exactly the stride, every chunk except the last is full, the last ends
    exactly at the doc's last token, and the chunk-count formula holds."""
    from vectorsearch_rbac_spark.operators import curation

    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        curation.chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_idx"],
    )
    stride = chunk - overlap
    # empty text still tokenizes to [''] → size 1; mirror that here
    n_eff = max(n_tokens, 1)
    expect = 1 if n_eff <= chunk else 1 + math.ceil((n_eff - chunk) / stride)
    assert len(rows) == expect
    assert [r["start_token"] for r in rows] == [i * stride for i in range(expect)]
    for r in rows[:-1]:
        assert r["n_chunk_tokens"] == chunk
    assert rows[-1]["start_token"] + rows[-1]["n_chunk_tokens"] == n_eff


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=120).map("".join),
        min_size=1, max_size=6,
    ),
    win=st.sampled_from([5, 8]),
)
def test_exactsubstr_cut_matches_python_replay(spark, docs, win):
    """E39 over ARBITRARY small-alphabet corpora (maximal duplication
    pressure): spans, cut text and char counts must equal a direct python
    replay of the window-hash → interval-merge → cut pipeline."""
    import hashlib
    import re

    from vectorsearch_rbac_spark.operators import dedup

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup.exactsubstr_cut(df, win=win).collect()}

    from collections import Counter
    norm = [re.sub(r"\s+", " ", d.lower()).strip() for d in docs]
    cnt = Counter()
    for nrm in norm:
        for i in range(len(nrm) - win + 1):
            cnt[nrm[i:i + win]] += 1
    for did, nrm in enumerate(norm):
        ps = [i for i in range(len(nrm) - win + 1) if cnt[nrm[i:i + win]] > 1]
        spans = []
        for p in ps:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = p + win
            else:
                spans.append([p, p + win])
        cut, cur = "", 0
        for s0, e0 in spans:
            cut += nrm[cur:s0]
            cur = e0
        cut += nrm[cur:]
        r = got[did]
        assert r["n_chars"] == len(nrm)
        assert r["n_spans"] == len(spans)
        assert r["n_dup_chars"] == sum(e0 - s0 for s0, e0 in spans)
        assert r["cut_hash"] == hashlib.md5(cut.encode()).hexdigest()


@settings(max_examples=20, deadline=None)
@given(a=st.integers(0, 2**16 - 1), b=st.integers(0, 2**16 - 1))
def test_zorder_value_matches_python_interleave(spark, a, b):
    """H6: the Morton code column must equal the direct bit interleave."""
    from vectorsearch_rbac_spark.sources import layouts as L

    got = spark.createDataFrame([(a, b)], "a long, b long").select(
        L.zorder_value("a", "b").alias("z")).first()["z"]
    want = 0
    for i in range(16):
        want |= ((a >> i) & 1) << (2 * i + 1)
        want |= ((b >> i) & 1) << (2 * i)
    assert got == want


def test_maxsim_score_bounds_and_coverage(spark, sf_dir):
    """E44 invariants: every query scores ≤ #terms (each term's best cos
    ≤ 1), ranks are 1..k contiguous per query, and a doc containing a
    query term VERBATIM after a repeated token outranks unrelated docs."""
    from vectorsearch_rbac_spark.operators import retrieval
    from vectorsearch_rbac_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    qt = spark.createDataFrame([(0, ["table", "vector"])], "query_id long, terms array<string>")
    out = retrieval.maxsim_topk(docs, qt, k=10).collect()
    assert all(r["score"] <= 2.0 + 1e-9 for r in out)
    assert sorted(r["rank"] for r in out) == list(range(1, len(out) + 1))


@settings(max_examples=15, deadline=None)
@given(
    tgt=st.dictionaries(st.integers(0, 20), st.integers(0, 99), max_size=12),
    src=st.dictionaries(
        st.integers(0, 25),
        st.tuples(st.integers(0, 99), st.booleans()),  # (new value, is_delete)
        max_size=12,
    ),
)
def test_merge_upsert_matches_dict_replay(spark, tgt, src):
    """H8 MERGE must equal the obvious python replay for ANY target/source:
    apply each source op to a dict — delete if present, else upsert (a
    delete of a missing key is a no-op)."""
    from vectorsearch_rbac_spark.operators import dynamic

    expect = dict(tgt)
    for k, (v, is_del) in src.items():
        if is_del:
            expect.pop(k, None)
        else:
            expect[k] = v

    tdf = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()] or [(None, None)], "id long, val long"
    ).where(F.col("id").isNotNull())
    sdf = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in src.items()] or [(None, None, None)],
        "id long, val long, is_del boolean",
    ).where(F.col("id").isNotNull())
    out = dynamic.merge_upsert(tdf, sdf, "id", update_cols=["val"], delete_col="is_del")
    got = {r["id"]: r["val"] for r in out.collect()}
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 9)),  # (group, key)
        min_size=1,
        max_size=60,
    )
)
def test_weighted_ams_f2_matches_raw_for_any_stream(spark, events):
    """The weighted AMS path must equal the raw-row path for ANY event
    stream, not just the fixture corpus: feeding per-key counts with
    weight_col is the same sum in a different order (signs depend only
    on the key, integer sums commute)."""
    from vectorsearch_rbac_spark.operators import sketches as SK

    df = spark.createDataFrame([(g, k) for g, k in events], "g int, k int")
    kc = df.groupBy("g", "k").agg(F.count(F.lit(1)).alias("cnt"))
    raw = sorted(map(tuple, SK.ams_f2(df, ["g"], "k", trials=4).collect()))
    wtd = sorted(map(tuple, SK.ams_f2(kc, ["g"], "k", trials=4, weight_col="cnt").collect()))
    assert raw == wtd
    raw2 = sorted(map(tuple, SK.exact_f2(df, ["g"], "k").collect()))
    wtd2 = sorted(map(tuple, SK.exact_f2(kc, ["g"], "k", weight_col="cnt").collect()))
    assert raw2 == wtd2


@settings(max_examples=10, deadline=None)
@given(
    nq=st.integers(min_value=1, max_value=70),  # crosses the 64-bit word boundary
    perms=st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.integers(min_value=0, max_value=69)),
        min_size=1, max_size=40,
    ),
)
def test_query_doc_mask_packing_matches_python_replay(spark, nq, perms):
    """_query_doc_masks' expression-built Q-bit packing must unpack to
    EXACTLY the permitted (doc, query-position) membership for any
    permission structure — replayed bit-by-bit in Python, including query
    counts that span two 64-bit words."""
    from vectorsearch_rbac_spark.operators import knn

    perms = [(d, q) for d, q in perms if q < nq]
    if not perms:
        return
    # query ids deliberately non-contiguous: position = rank in sorted order
    qids = [7 + 3 * i for i in range(nq)]
    queries = spark.createDataFrame([(q,) for q in qids], "query_id long")
    # one role per query position; permissions grant (doc, role=qpos)
    qroles = spark.createDataFrame(
        [(qids[i], i) for i in range(nq)], "query_id long, role_id int"
    )
    pa = spark.createDataFrame(
        [(d, q) for d, q in set(perms)], "document_id long, role_id int"
    )
    got = {
        r["document_id"]: r["qmask"]
        for r in knn._query_doc_masks(queries, qroles, pa).collect()
    }
    want: dict[int, set[int]] = {}
    for d, q in perms:
        want.setdefault(d, set()).add(q)
    n_words = max(1, (nq + 63) // 64)
    assert set(got) == set(want)
    for d, mask in got.items():
        assert len(mask) == n_words
        positions = {
            w * 64 + b
            for w, word in enumerate(mask)
            for b in range(64)
            if (word >> b) & 1
        }
        assert positions == want[d], f"doc {d}"


def test_query_doc_mask_sign_bit_and_second_word(spark):
    """Deterministic edges the fuzz may not hit: bit 63 (shiftleft makes the
    packed long NEGATIVE — two's complement must round-trip) and a position
    in the second word."""
    from vectorsearch_rbac_spark.operators import knn

    nq = 70
    qids = list(range(nq))
    queries = spark.createDataFrame([(q,) for q in qids], "query_id long")
    qroles = spark.createDataFrame([(q, q) for q in qids], "query_id long, role_id int")
    pa = spark.createDataFrame(
        [(1, 63), (1, 69), (2, 0)], "document_id long, role_id int"
    )
    got = {r["document_id"]: r["qmask"] for r in knn._query_doc_masks(queries, qroles, pa).collect()}
    assert got[1][0] == -(1 << 63)  # bit 63 alone = Long.MIN_VALUE
    assert got[1][1] == 1 << 5      # position 69 = bit 5 of word 2
    assert got[2] == [1, 0]

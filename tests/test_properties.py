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

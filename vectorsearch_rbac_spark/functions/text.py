"""Text-analysis column functions for LLM-pipeline curation
(SURVEY.md §2 E9-E12). Pure built-in expressions (codegen, no UDFs), each
with an exact DuckDB-oracle formulation (SURVEY.md §4).

Conventions shared with the oracle SQL:
- tokens = split(normalized_text, ' ') where normalization = lower + trim +
  collapse whitespace;
- ratios rounded to 6 dp; counts exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "as", "at", "by", "it", "be", "are", "was", "that",
]

_BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _norm(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col) -> Column:
    return F.split(_norm(col), " ")


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col) -> Column:
    """Sub-word-ish token count: runs of letters, runs of digits, and single
    punctuation marks each count once — a cheap deterministic proxy for BPE
    vocab tokenization (regexp_count keeps it codegen'd)."""
    return F.regexp_count(_norm(col), F.lit(_BPE_ISH))


def stopword_count(col) -> Column:
    sw = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(sw, t)))


def stopword_ratio(col) -> Column:
    return F.round(stopword_count(col) / F.greatest(token_count(col), F.lit(1)), 6)


def punct_ratio(col) -> Column:
    """Non-alphanumeric, non-space characters / total characters."""
    c = _norm(col)
    n_punct = F.length(F.regexp_replace(c, r"[a-z0-9 ]", ""))
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 6)


def mean_word_length(col) -> Column:
    c = _norm(col)
    n_alpha = F.length(F.regexp_replace(c, r"[^a-z0-9]", ""))
    return F.round(n_alpha / F.greatest(token_count(col), F.lit(1)), 6)


def repetition_ratio(col) -> Column:
    """1 - distinct_tokens / tokens: high → boilerplate/spam."""
    t = tokens(col)
    return F.round(F.lit(1.0) - F.size(F.array_distinct(t)) / F.greatest(F.size(t), F.lit(1)), 6)


def top_bigram_frac(col) -> Column:
    """Fraction of bigrams taken by the most frequent bigram — the
    Gopher-rules "top n-gram fraction" repetition signal (complements
    :func:`repetition_ratio`, which misses phrase-level loops that reuse a
    small vocabulary). Pure array-lambda expression, no explode/shuffle:
    per-row O(d·n) over short documents. Texts with <2 tokens score 0."""
    # Bind the token array ONCE via a 1-element transform: referencing
    # tokens(col) directly inside the element_at lambdas re-inlines the
    # split expression, and the interpreter re-evaluates it per element —
    # O(n) splits of the doc per bigram, O(n²·len) per row (measured 7.6s
    # vs 0.4s over sf0.1 for this one column).
    def _frac(t: Column) -> Column:
        n = F.size(t)
        bg = F.transform(
            F.sequence(F.lit(1), n - F.lit(1)),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + F.lit(1))),
        )
        # top-bigram count == longest equal-adjacent run in the SORTED
        # bigram array: one O(n log n) pass referencing bg once. (The naive
        # distinct×filter nesting re-inlines the bg expression per distinct
        # element — O(d·n²) interpreted lambda evals per row, ~10× slower.)
        run = lambda acc, x: F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        top = F.aggregate(
            F.array_sort(bg),
            F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
            lambda acc, x: F.struct(
                x.alias("prev"),
                run(acc, x).alias("run"),
                F.greatest(acc.best, run(acc, x)).alias("best"),
            ),
            lambda acc: acc.best,
        )
        # guard n>=2 BEFORE building bg: sequence(1, 0) would be descending
        return F.round(F.when(n >= 2, top / (n - F.lit(1))).otherwise(F.lit(0.0)), 6)

    return F.element_at(F.transform(F.array(tokens(col)), _frac), 1)


def quality_score(col) -> Column:
    """Composite curation score in [0,1]: rewards stopword presence and
    reasonable word lengths, penalizes punctuation soup and repetition.
    (Heuristic in the C4/Gopher-rules tradition, deterministic + oracle-
    expressible; weights are fixed, not learned.)"""
    sw = stopword_ratio(col)
    pr = punct_ratio(col)
    rep = repetition_ratio(col)
    mwl = mean_word_length(col)
    score = (
        F.least(sw * 4, F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(pr * 5, F.lit(1.0))) * 0.3
        + (F.lit(1.0) - rep) * 0.2
        + F.when((mwl >= 2.5) & (mwl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
    )
    return F.round(score, 6)


def lang_id(col) -> Column:
    """n-gram/stopword heuristic language ID: 'en' when English stopwords
    are frequent enough and the charset is basic-latin; 'latin' for other
    latin-script text; 'other' otherwise."""
    c = _norm(col)
    non_ascii = F.length(F.regexp_replace(c, r"[\x00-\x7f]", ""))
    ascii_ratio = F.lit(1.0) - non_ascii / F.greatest(F.length(c), F.lit(1))
    return (
        F.when((stopword_ratio(col) >= 0.08) & (ascii_ratio >= 0.97), F.lit("en"))
        .when(ascii_ratio >= 0.97, F.lit("latin"))
        .otherwise(F.lit("other"))
    )


def fingerprint(col) -> Column:
    """Normalized-content fingerprint (md5 hex) — the dedup join key.
    Parity: reference stores ``hash_value BYTEA`` per block
    (initialize_main_tables.py:58)."""
    return F.md5(_norm(col))


def shingle_fingerprint(col, n: int = 5) -> Column:
    """Order-sensitive rolling fingerprint: md5 over every n-th token joined
    — robust to small mid-document edits at the ends, cheap to compute."""
    t = tokens(col)
    sampled = F.filter(t, lambda x, i: i % n == 0)
    return F.md5(F.array_join(sampled, " "))


# PII patterns kept to RE2-compatible syntax (no backrefs/lookaround) so the
# identical pattern strings run in Spark (Java regex) and DuckDB (RE2).
PII_PATTERNS = [
    # order matters: email first (digits in local-parts), card before phone
    # (a 16-digit PAN would otherwise match the phone pattern), and no \b
    # before \+ (word boundaries don't exist between two non-word chars)
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<CARDNUM>"),
    (r"\+?\d[\d -]{7,14}\d\b", "<PHONE>"),
]


def scrub_pii(col) -> Column:
    """Replace emails / IPs / phone-ish numbers / long digit runs with typed
    placeholder tokens — the standard pre-training privacy scrub, as a pure
    chain of regexp_replace (codegen'd; order matters: email before phone so
    digits in local-parts don't half-match)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(col) -> Column:
    """How many PII spans the scrub would replace (curation metric)."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pat, _ in PII_PATTERNS:
        total = total + F.regexp_count(scrubbed_up_to(c, pat), F.lit(pat))
    return total


def scrubbed_up_to(c: Column, pat: str) -> Column:
    """Apply all scrubs that precede ``pat`` in PII_PATTERNS (so counts
    don't double-tally overlapping matches, mirroring scrub order)."""
    out = c
    for p, repl in PII_PATTERNS:
        if p == pat:
            break
        out = F.regexp_replace(out, p, repl)
    return out

"""pgvector ``sparsevec`` parity: sparse vectors as paired columns
(indices array<int> sorted ascending & 1-indexed, values array<double>).

Parity: reference ``pgvector/src/sparsevec.c`` — ``<->`` l2, ``<#>`` neg
inner product, ``<=>`` cosine over index/value pairs. The C code walks two
sorted postings lists; the Spark re-expression iterates ONE side's pairs
and probes the other with ``array_position`` (linear in nnz, fine for the
small nnz sparsevec targets) — all built-in higher-order functions, so the
math stays in whole-stage codegen, and the same expressions exist in DuckDB
(``list_position`` / ``list_extract``) for exact oracle parity.

Scale: per-row expressions, embarrassingly parallel; sparse columns shrink
scan bytes by the sparsity factor, which at 100 TB is the whole point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .vector import ColumnOrName, _c


def sparse_from_dense(vec: ColumnOrName, threshold: float) -> Column:
    """struct(indices, values): keep dims with |v| > threshold (1-indexed).

    pgvector analogue: casting ``vector`` → ``sparsevec`` (zeros dropped);
    the threshold generalizes to magnitude pruning.
    """
    pairs = F.filter(
        F.transform(
            _c(vec),
            lambda x, i: F.struct((i + 1).alias("idx"), x.cast("double").alias("val")),
        ),
        lambda s: F.abs(s["val"]) > threshold,
    )
    return F.struct(
        F.transform(pairs, lambda s: s["idx"]).alias("indices"),
        F.transform(pairs, lambda s: s["val"]).alias("values"),
    )


def _probe(ib: Column, vb: Column, idx: Column) -> Column:
    """Value of ``idx`` in sparse vector (ib, vb), or 0.0 when absent."""
    pos = F.array_position(ib, idx)
    return F.when(pos > 0, F.element_at(vb, pos.cast("int"))).otherwise(F.lit(0.0))


def sparse_inner_product(ia: ColumnOrName, va: ColumnOrName, ib: ColumnOrName, vb: ColumnOrName) -> Column:
    """Dot product over the index intersection (sparsevec ``<#>`` is its
    negation). Iterates a's pairs, probes b."""
    ia, va, ib, vb = _c(ia), _c(va), _c(ib), _c(vb)
    return F.aggregate(
        F.zip_with(ia, va, lambda i, v: F.struct(i.alias("idx"), v.alias("val"))),
        F.lit(0.0),
        lambda acc, s: acc + s["val"] * _probe(ib, vb, s["idx"]),
    )


def sparse_norm(va: ColumnOrName) -> Column:
    """l2 norm from stored values (absent dims are zero)."""
    return F.sqrt(
        F.aggregate(_c(va), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def sparse_l2_distance(ia: ColumnOrName, va: ColumnOrName, ib: ColumnOrName, vb: ColumnOrName) -> Column:
    """sparsevec ``<->``: sqrt(|a|^2 + |b|^2 - 2<a,b>) — one intersection
    probe instead of a union walk; algebraically identical, and clamped at 0
    against rounding."""
    ia, va, ib, vb = _c(ia), _c(va), _c(ib), _c(vb)
    sq = (
        sparse_norm(va) * sparse_norm(va)
        + sparse_norm(vb) * sparse_norm(vb)
        - F.lit(2.0) * sparse_inner_product(ia, va, ib, vb)
    )
    return F.sqrt(F.greatest(sq, F.lit(0.0)))


def sparse_cosine_distance(ia: ColumnOrName, va: ColumnOrName, ib: ColumnOrName, vb: ColumnOrName) -> Column:
    """sparsevec ``<=>`` = 1 - <a,b> / (|a||b|).

    Zero-norm guard: a magnitude-sparsified vector can lose EVERY
    component (all |x| below the threshold), and pgvector's float math
    yields NaN there while Spark's ANSI mode would kill the job on the
    division — so the NaN is explicit (try_divide + coalesce, not a
    when-guard: CaseWhen defeats subexpression elimination and would
    fold the norms twice per row). NaN sorts last ascending in both
    engines, so empty sparse vectors never enter a top-k.

    Semantics note: the coalesce also maps NULL INPUT vectors to NaN
    (try_divide returns NULL for both /0 and null operands) — a
    deliberate widening over plain NULL propagation, since an ascending
    NULLS FIRST rank would have placed null-vector rows at the TOP of a
    distance top-k; as NaN they sort last instead. Callers needing NULL
    propagation should isnull-guard before calling."""
    return F.lit(1.0) - F.coalesce(
        F.try_divide(
            sparse_inner_product(ia, va, ib, vb),
            sparse_norm(va) * sparse_norm(vb),
        ),
        F.lit(float("nan")),
    )

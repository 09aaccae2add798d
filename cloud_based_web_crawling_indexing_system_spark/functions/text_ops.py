"""Catalyst-side text operators (no Python on the hot path).

Tokenization here uses JVM ``regexp_extract_all`` — appropriate for
the ASCII-only testdata probes and large-scale quality/dedup passes
where Java-vs-Python ``\\w`` Unicode divergence doesn't matter.  The
reference-faithful crawl/index path uses the Python tokenizer inside
the Arrow UDF instead (functions/terms.py) to preserve Unicode
semantics exactly (SURVEY.md §2.4 P4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "bigrams",
    "shingles",
    "minhash_cols",
    "simhash16",
    "simhash_combine",
    "stopword_count",
    "dedup_norm_key",
]

_WORD = r"\w+"


def tokens(text_col: str | Column) -> Column:
    # NULL text tokenizes as empty (coalesce): a failed-parse page has
    # no tokens, and NULL-vs-[] divergence between engines is exactly
    # the latent-hash-gate bug class the messy-input suite pins
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(F.coalesce(c, F.lit(""))), F.lit(_WORD), 0)


def bigrams(tokens_col: str) -> Column:
    """Adjacent-pair bigrams 's1 s2' (P6 shape), safe on short arrays."""
    t = tokens_col
    return F.expr(
        f"CASE WHEN size({t}) < 2 THEN array() "
        f"ELSE zip_with(slice({t}, 1, size({t})-1), slice({t}, 2, size({t})-1), "
        f"(a, b) -> concat(a, ' ', b)) END"
    )


def shingles(tokens_col: str, k: int) -> Column:
    """k-token shingles joined by spaces (dedup/fingerprint unit)."""
    t = tokens_col
    return F.expr(
        f"CASE WHEN size({t}) < {k} THEN array() "
        f"ELSE transform(sequence(1, size({t})-{k}+1), "
        f"i -> array_join(slice({t}, i, {k}), ' ')) END"
    )


def minhash_cols(shingle_col: str, k: int) -> list[Column]:
    """k MinHash aggregations over an exploded shingle column: band j's
    hash = min(md5(j || '|' || shingle)).  md5 makes the signature
    identical in Spark, DuckDB, and Python — no engine-specific hash.
    Use after ``groupBy(id)``."""
    return [
        F.min(F.md5(F.encode(F.concat(F.lit(f"{j}|"), F.col(shingle_col)), "utf-8"))).alias(
            f"mh{j}"
        )
        for j in range(k)
    ]


def simhash16(token_col: str) -> list[Column]:
    """16-bit SimHash over an exploded token column: bit j is set when
    the j-th md5 nibble of a majority(-by-count) of tokens has its
    high bit set.  Emitted as 16 sum-aggregations (use after
    ``groupBy(id)``); combine with ``simhash_combine``."""
    h = F.md5(F.encode(F.col(token_col), "utf-8"))
    out = []
    for j in range(16):
        nib = F.substring(h, j + 1, 1)
        contrib = F.when(nib.isin(*list("89abcdef")), F.lit(1)).otherwise(F.lit(-1))
        out.append(F.sum(contrib).alias(f"sh{j}"))
    return out


def simhash_combine() -> Column:
    """Folds sh0..sh15 into one integer signature."""
    expr = None
    for j in range(16):
        bit = F.when(F.col(f"sh{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        expr = bit if expr is None else expr + bit
    return expr.cast("int")


def stopword_count(tokens_col: str, stopwords: list[str]) -> Column:
    if not stopwords:
        return F.lit(0)  # 'IN ()' is a parse error
    # doubled-quote escaping: a stopword containing ' must not break
    # the lambda expression
    arr = ",".join("'" + w.replace("'", "''") + "'" for w in stopwords)
    return F.expr(f"size(filter({tokens_col}, t -> t IN ({arr})))")


def dedup_norm_key(text_col: str = "text") -> Column:
    """md5 of the normalized token stream (lowercase ``\\w+`` tokens
    minus the planted 'dup' marker, space-joined) — THE exact-dedup
    content key.  Shared by q23, q53's edge construction, and the
    components fixpoint test (review r5: three verbatim copies could
    silently drift from each other and from the SQL oracles)."""
    return F.md5(
        F.encode(
            F.array_join(
                F.expr(
                    f"filter(regexp_extract_all(lower(coalesce({text_col}, '')),"
                    " '\\\\w+', 0), t -> t <> 'dup')"
                ),
                " ",
            ),
            "utf-8",
        )
    )

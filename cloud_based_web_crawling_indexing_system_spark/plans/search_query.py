"""§2.8 search-query compiler (the reference's query language).

Grammar (reference parser /root/reference/Cloud/scripts/master.py:167-188,
all quirks preserved — see oracle.parse_query):

  query   := (phrase | word)*
  phrase  := '"' ... '"'          -> tokenized, stemmed, space-joined
                                     into ONE term (so 3+-word phrases
                                     never match the uni+bigram index)
  'or'    -> switches the WHOLE query to OR mode (no grouping)
  'not' w -> excludes w (stemmed)
  'and'   -> skipped (AND is default)

Evaluation (master.py:189-211): semi-join postings against the term
list (J6, broadcast), GROUP BY url with SUM(frequency) and
COUNT(DISTINCT term) (A4), HAVING matches = len(terms) for AND /
>= 1 for OR, anti-join the exclusion urls (J5), ORDER BY frequency
DESC (O1) with url ASC as the deterministic tiebreak (the reference
inherits MySQL's unstable sort; documented upgrade).

Two backends from one parse:
- ``compile_search``: DataFrame plan (broadcast joins, TakeOrdered
  when limited);
- ``compile_search_sql``: one ANSI-SQL string, runnable by both
  spark.sql and DuckDB — used for the driver's oracle contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..oracle import parse_query

__all__ = ["compile_search", "compile_search_sql", "suggest_terms"]


def compile_search(spark: SparkSession, postings: DataFrame, raw: str,
                   limit: int | None = None) -> DataFrame:
    """postings(term, url, frequency, ...) -> (url, frequency) ranked."""
    empty = spark.createDataFrame([], "url string, frequency long")
    if not raw.strip():
        return empty
    terms, op, ex_stems = parse_query(raw)
    if not terms:
        return empty
    need = len(terms)  # quirk: duplicates in the query inflate the AND bar
    terms_list = sorted(set(terms))
    tdf = spark.createDataFrame([(t,) for t in terms_list], "term string")
    # literal isin BEFORE the semi-join: semantically identical (the
    # join already restricts to these terms) but, unlike a join, an In
    # predicate reaches the parquet scan as a PushedFilter — at 100 TB
    # the postings read prunes row groups on term min/max stats instead
    # of scanning every postings file per search (queries are a handful
    # of terms, so the literal list stays tiny).  The broadcast join
    # stays as the J6 shape the coverage inventory names; with the
    # filter in place it is a cheap no-op restriction.
    scored = (
        postings.where(F.col("term").isin(terms_list))
        .join(F.broadcast(tdf), "term")  # J6
        .groupBy("url")
        .agg(
            F.sum("frequency").alias("frequency"),
            F.countDistinct("term").alias("matches"),
        )
    )
    scored = scored.where(
        (F.col("matches") == F.lit(need)) if op == "AND" else (F.col("matches") >= 1)
    )
    if ex_stems:
        ex_list = sorted(set(ex_stems))
        exdf = spark.createDataFrame([(t,) for t in ex_list], "term string")
        excluded = (
            postings.where(F.col("term").isin(ex_list))
            .join(F.broadcast(exdf), "term")
            .select("url")
            .distinct()
        )
        scored = scored.join(excluded, "url", "left_anti")  # J5
    out = scored.select("url", "frequency").orderBy(F.desc("frequency"), F.asc("url"))
    # `is not None`, not truthiness: limit=0 means ZERO rows, not all
    return out.limit(limit) if limit is not None else out


def suggest_terms(
    spark: SparkSession, postings: DataFrame | None, raw: str, k: int = 5
) -> DataFrame:
    """Offline replacement for the reference's GET /suggest (O3): the
    reference proxies the external Datamuse autocomplete API
    (/root/reference/Cloud/scripts/master.py:72-90, top-5 words for a
    partial query, [] on blank/error) — no network in this sandbox, so
    suggestions come from the INDEX VOCABULARY instead: unigram terms
    ranked prefix-matches-first, then collection frequency, then term;
    typo tolerance via Levenshtein <= 2 (JVM built-in) with a
    length-window block so the distance only runs on candidate terms.

    Scale shape: one groupBy over postings (the same vocabulary
    aggregate a production deployment would maintain as its own
    table), then a narrow filter + TakeOrdered(k) — no cross join, no
    Python."""
    empty = spark.createDataFrame([], "term string, freq long")
    q = (raw or "").strip().lower()
    if not q or postings is None:
        return empty  # master.py:77 returns [] for a blank query
    vocab = (
        postings.where(~F.col("term").contains(" "))  # words, not bigrams
        .groupBy("term")
        .agg(F.sum("frequency").alias("freq"))
    )
    is_prefix = F.col("term").startswith(q)
    near = (F.abs(F.length("term") - F.lit(len(q))) <= 2) & (
        F.levenshtein(F.col("term"), F.lit(q)) <= 2
    )
    return (
        vocab.where(is_prefix | near)
        .withColumn("_pfx", is_prefix.cast("int"))
        .orderBy(F.desc("_pfx"), F.desc("freq"), F.asc("term"))
        .limit(k)
        .select("term", "freq")
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def compile_search_sql(postings_table: str, raw: str, limit: int | None = None) -> str:
    """Same semantics as one ANSI SQL string (Spark SQL + DuckDB)."""
    if not raw.strip():
        return f"SELECT url, CAST(NULL AS BIGINT) AS frequency FROM {postings_table} WHERE 1=0"
    terms, op, ex_stems = parse_query(raw)
    if not terms:
        return f"SELECT url, CAST(NULL AS BIGINT) AS frequency FROM {postings_table} WHERE 1=0"
    need = len(terms)
    in_list = ",".join(_sql_quote(t) for t in sorted(set(terms)))
    having = f"COUNT(DISTINCT term) = {need}" if op == "AND" else "COUNT(DISTINCT term) >= 1"
    ex_clause = ""
    if ex_stems:
        ex_list = ",".join(_sql_quote(t) for t in sorted(set(ex_stems)))
        ex_clause = (
            f" AND url NOT IN (SELECT url FROM {postings_table} WHERE term IN ({ex_list}))"
        )
    lim = f" LIMIT {limit}" if limit is not None else ""
    return (
        f"SELECT url, CAST(SUM(frequency) AS BIGINT) AS frequency FROM {postings_table} "
        f"WHERE term IN ({in_list}){ex_clause} "
        f"GROUP BY url HAVING {having} "
        f"ORDER BY frequency DESC, url ASC{lim}"
    )

"""Lexical relevance scoring (BM25) over a document corpus.

The retrieval/quality-filter primitive that pairs with the ANN ladder
(`llm/similarity.py`): dense retrieval scores `embedding · query`,
sparse retrieval scores BM25 over an inverted term index. Here the
"index" is relational — a (doc, term) long table aggregated to
per-document term frequencies — so the whole computation is two
hash aggregations and one broadcast of a 1-row corpus-stats frame:

    tokens → groupBy(doc): dl + tf per query term   (one shuffle)
           → global agg:   N, Σdl, df per term      (1-row broadcast)
           → projection:   fixed-order BM25 sum     (codegen)

Determinism contract: the score is a FIXED-ORDER sum over the query
terms (a literal expression, not a float aggregation over rows), so
the result is bit-stable under any partitioning and replays exactly
in the DuckDB oracle. At 100 TB the shuffle volume is one row per
document (the tf vector), never the token table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trisk_datawrangle_spark.llm.text import word_gram_table


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Okapi BM25 score of every document against ``query_terms``.

    Returns (``id_col``, bm25) for documents matching at least one
    term. ``idf(t) = ln((N - df_t + 0.5)/(df_t + 0.5) + 1)`` (the
    non-negative Lucene variant), ``tf`` saturates with ``k1`` and is
    length-normalized with ``b`` against the corpus mean document
    length."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = list(query_terms)
    toks = word_gram_table(df, text_col=text_col, id_col=id_col, n=1)
    per_doc = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.count_if(F.col("gram") == F.lit(t)).alias(f"tf_{j}")
            for j, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("N"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.count_if(F.col(f"tf_{j}") > 0).alias(f"df_{j}")
            for j in range(len(terms))
        ],
    )
    joined = per_doc.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("N").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    )
    score = F.lit(0.0)
    for j in range(len(terms)):  # fixed-order sum: bit-stable
        tf = F.col(f"tf_{j}").cast("double")
        dft = F.col(f"df_{j}").cast("double")
        idf = F.log(
            (F.col("N").cast("double") - dft + F.lit(0.5))
            / (dft + F.lit(0.5))
            + F.lit(1.0)
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    return (
        joined.select(
            F.col("id").alias(id_col),
            F.round(score, round_to).alias("bm25"),
        )
        .filter(F.col("bm25") > 0)
    )


def bm25_sql(
    query_terms: Sequence[str],
    source: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> str:
    """The identical BM25 computation as DuckDB SQL (same tokenizer,
    same fixed-order sum) — the catalog oracle generator."""
    terms = list(query_terms)
    # terms land in SQL string literals — double any single quote so
    # a term like "o'brien" stays a literal instead of a syntax error
    # (the Spark side goes through F.lit and needs no escaping)
    tf_cols = ",\n        ".join(
        f"COUNT(*) FILTER (w = '{t.replace(chr(39), chr(39) * 2)}') AS tf_{j}"
        for j, t in enumerate(terms)
    )
    df_cols = ",\n        ".join(
        f"COUNT(*) FILTER (tf_{j} > 0) AS df_{j}" for j in range(len(terms))
    )
    contribs = "\n      + ".join(
        f"ln((CAST(N AS DOUBLE) - CAST(df_{j} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{j} AS DOUBLE) + 0.5) + 1.0)"
        f" * CAST(tf_{j} AS DOUBLE) * {k1 + 1.0!r}"
        f" / (CAST(tf_{j} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
        f" * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / CAST(N AS DOUBLE))))"
        for j in range(len(terms))
    )
    return f"""
WITH toks AS (
    SELECT {id_col},
        unnest(list_filter(string_split_regex(lower({text_col}),
                                              '[^a-z0-9]+'),
                           w -> w <> '')) AS w
    FROM {source}
), per_doc AS (
    SELECT {id_col}, COUNT(*) AS dl,
        {tf_cols}
    FROM toks GROUP BY 1
), stats AS (
    SELECT COUNT(*) AS N, SUM(dl) AS sum_dl,
        {df_cols}
    FROM per_doc
)
SELECT {id_col},
    ROUND({contribs}, {round_to}) AS bm25
FROM per_doc, stats
WHERE ROUND({contribs}, {round_to}) > 0
"""


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic keyword
    extraction / doc-summarization primitive. Scoring is EXACT
    integer arithmetic: ``score = tf × round(ln(N/df)·1e6)`` (term
    frequency is an int, the idf factor is rounded to integer
    micro-units once per term), so the per-document ranking —
    including its (score desc, term asc) tiebreak — is a pure
    function of the corpus, bit-identical in any engine.

    Scale shape: token table → (doc, term) tf counts (one shuffle) →
    per-term df counts joined back on the term key (hash join; the
    term side is vocabulary-grain) → per-doc top-k window. The token
    table is never joined to itself."""
    from pyspark.sql import Window

    toks = word_gram_table(df, text_col=text_col, id_col=id_col, n=1)
    tf = toks.groupBy("id", "gram").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("N")
    )
    dfreq = tf.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    idf_micro = F.round(
        F.log(F.col("N").cast("double") / F.col("df").cast("double"))
        * F.lit(1e6),
        0,
    ).cast("long")
    scored = (
        tf.join(dfreq, "gram")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "id",
            "gram",
            (F.col("tf") * idf_micro).alias("score_micro"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_micro").desc(), F.col("gram").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "rank", F.col("gram").alias("term"),
            "score_micro",
        )
    )

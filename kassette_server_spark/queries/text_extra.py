"""Additional scalar/array operator queries (q49–q51): regex
extraction, array explode with position, and aggregation over exploded
arrays — the remaining scalar-function surface a reference user would
expect, phrased portably (Spark regexp_extract ≡ DuckDB
regexp_extract for simple character-class patterns; posexplode ≡
unnest WITH ORDINALITY)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from .base import query


# q49: regex extraction. Pattern kept to character classes (Java regex
# and RE2 agree); group 1 extraction; no-match → empty string in BOTH
# engines (Spark returns '' on no match; DuckDB regexp_extract too).
@query(
    "q49_regexp_extract",
    oracle=r"""
    SELECT p_partkey,
           regexp_extract(p_type, '([a-z]+)', 1) AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS consonants
    FROM part
    """,
    doc="regex extract/replace (portable character-class patterns)",
    tags=("text",),
)
def q49(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "part").select(
        "p_partkey",
        F.regexp_extract("p_type", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.length(F.regexp_replace("p_name", r"[aeiou]", "")).cast("long").alias("consonants"),
    )


# q50: explode with ordinality — token stream from documents.
@query(
    "q50_posexplode",
    oracle="""
    SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
         range(1, 6) t(i)
    WHERE i <= len(toks)
    """,
    doc="posexplode / positional-unnest parity",
    tags=("text",),
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    return d.filter(F.col("pos") < 5).select("doc_id", "pos", "tok")


# q51: aggregate over the exploded stream — corpus-wide token
# frequencies (the classic wordcount as a declared operator; the
# groupBy shuffles 16-byte-ish tokens with map-side combine).
@query(
    "q51_token_frequencies",
    oracle="""
    SELECT t.tok, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) d,
         unnest(d.toks) AS t(tok)
    GROUP BY t.tok
    HAVING count(*) > 5
    """,
    doc="corpus token/document frequencies (wordcount + DF)",
    tags=("text",),
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    toks = load(spark, sf, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .filter(F.col("freq") > 5)
    )

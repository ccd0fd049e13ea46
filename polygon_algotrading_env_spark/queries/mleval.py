"""Model-evaluation / feature-association tier (extension surface).

The reference pipeline's outputs feed signal research that is scored in
downstream pandas notebooks (AUC of a signal, lift of a decile, agreement
of two labelers); a training-data engine needs those scoreboards as
first-class distributed queries. Every metric here follows the repo's
exact-integer discipline: the hash-compared payload is BIGINT sufficient
statistics (pair counts, rank moments, contingency cells) plus metrics
derived from them by fixed scalar double recipes that IEEE-754 evaluates
identically on Spark and DuckDB — see operators/evalmetrics.py.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.operators.evalmetrics import (
    auc_rank_sum,
    cohens_kappa,
    confusion_at_threshold,
    contingency_assoc,
    dcg_discounts,
    decile_lift,
    idcg_prefix,
    label_topk_eval,
    spearman_by_group,
)
from polygon_algotrading_env_spark.queries import register

_URGENT = "o_orderpriority = '1-URGENT'"


# --- tie-corrected Mann-Whitney AUC ---------------------------------------
@register(
    "auc_urgent_price_by_status",
    headline=True,
    oracle=f"""
    WITH s AS (
      SELECT o_orderstatus AS g, o_totalprice AS score,
             CAST(sum(CASE WHEN {_URGENT} THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(sum(CASE WHEN {_URGENT} THEN 0 ELSE 1 END) AS BIGINT) AS nn
      FROM orders GROUP BY 1, 2
    ),
    c AS (
      SELECT g, np, nn,
             coalesce(sum(nn) OVER (
               PARTITION BY g ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
      FROM s
    )
    SELECT g AS o_orderstatus,
           CAST(sum(np) AS BIGINT)                      AS n_pos,
           CAST(sum(nn) AS BIGINT)                      AS n_neg,
           CAST(sum(np * (2 * cumneg + nn)) AS BIGINT)  AS auc_num2,
           round(CAST(sum(np * (2 * cumneg + nn)) AS DOUBLE)
                 / (2.0 * sum(np) * sum(nn)), 6)        AS auc
    FROM c GROUP BY g
    """,
)
def auc_urgent_price_by_status(spark, sf_dir):
    """Does order value discriminate URGENT orders, per order status? —
    tie-corrected Mann-Whitney AUC with the 2U numerator emitted as an
    exact BIGINT (every tied pair contributes exactly 1, every win 2).
    Plan: the fact table collapses to its (status, price) grid in one
    hash aggregate; the pair count is a window cumsum over the GRID (its
    cardinality, not the row count) plus one final aggregate — the same
    shape at 100 TB provided scores are grid-valued, which prices are."""
    o = load_table(spark, sf_dir, "orders")
    return auc_rank_sum(
        o,
        "o_totalprice",
        F.col("o_orderpriority") == "1-URGENT",
        keys=["o_orderstatus"],
    )


# --- retrieval eval vs label ground truth ---------------------------------
_K = 10
_DISC_SQL = "[" + ", ".join(repr(d) for d in dcg_discounts(_K)) + "]"
_IDCG_SQL = "[" + ", ".join(repr(v) for v in idcg_prefix(_K)) + "]"

_QUERY_ROWS_CACHE: dict[
    tuple[str, float], list[tuple[int, list[float], int]]
] = {}


def _eval_query_rows(spark, sf_dir):
    """The 20 evaluation probes (vec_id < 20) with their labels — models
    the eval-harness shape where the query set arrives with the request;
    cached per (fixture dir, embeddings mtime) so a regenerated fixture
    within the same process never reuses stale probe vectors."""
    path = os.path.abspath(sf_dir)
    emb_path = os.path.join(path, "embeddings.parquet")
    try:
        mtime = os.path.getmtime(emb_path)
    except OSError:
        mtime = 0.0
    key = (path, mtime)
    if key not in _QUERY_ROWS_CACHE:
        rows = (
            load_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < 20)
            .select("vec_id", "embedding", "label")
            .collect()
        )
        _QUERY_ROWS_CACHE[key] = [
            (r["vec_id"], list(r["embedding"]), r["label"]) for r in rows
        ]
    return _QUERY_ROWS_CACHE[key]


@register(
    "retrieval_label_eval_top10",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv,
             label AS qlabel
      FROM embeddings WHERE vec_id < 20
    ),
    sc AS (
      SELECT q.qid, e.vec_id AS cid,
             round(list_dot_product(
                     list_transform(e.embedding, x -> CAST(x AS DOUBLE)), q.qv)
                   / (sqrt(list_sum(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(q.qv, x -> x * x)))),
                   6) AS score,
             CASE WHEN e.label = q.qlabel THEN 1 ELSE 0 END AS rel
      FROM embeddings e, q WHERE e.vec_id <> q.qid
    ),
    r AS (
      SELECT qid, cid, rel,
             row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid)
               AS rn
      FROM sc
    ),
    a AS (
      SELECT qid,
             CAST(sum(rel) AS BIGINT)                       AS hits,
             round(sum(rel) / 10.0, 6)                      AS p_at_k,
             round(max(rel * (1.0 / rn)), 6)                AS mrr,
             round(sum(rel * ({_DISC_SQL})[rn]), 6)         AS dcg,
             sum(rel * ({_DISC_SQL})[rn])                   AS dcg_raw
      FROM r WHERE rn <= {_K} GROUP BY qid
    ),
    t AS (
      SELECT qid, CAST(sum(rel) AS BIGINT) AS total_rel FROM sc GROUP BY qid
    )
    SELECT a.qid, a.hits, t.total_rel, a.p_at_k, a.mrr, a.dcg,
           CASE WHEN a.hits = 0 THEN 0.0
                ELSE round(a.dcg_raw /
                       ({_IDCG_SQL})[greatest(least(t.total_rel, {_K}), 1)],
                     6) END AS ndcg
    FROM a JOIN t USING (qid)
    """,
)
def retrieval_label_eval_top10(spark, sf_dir):
    """Scoreboard for the exact-cosine retriever against label ground
    truth: per evaluation probe, precision@10, MRR, DCG and standard NDCG
    (ideal = prefix-sum discount at min(total_rel, 10), where total_rel
    counts ALL corpus-relevant candidates) with the hit and relevant
    counts as exact BIGINTs. The probe set rides as a constant struct
    array exploded onto the corpus scan (|Q|·n rows, no join node);
    ranking is per-probe top-k on (rounded score, id); both normalizer
    lookups are literal prefix-sum arrays indexed by exact integers, so
    both engines divide identical doubles."""
    emb = load_table(spark, sf_dir, "embeddings")
    return label_topk_eval(emb, _eval_query_rows(spark, sf_dir), k=_K)


# --- chi-square feature association ---------------------------------------
@register(
    "chi_square_brand_type",
    oracle="""
    WITH cells AS (
      SELECT p_brand, p_type, CAST(count(*) AS BIGINT) AS o
      FROM part GROUP BY 1, 2
    ),
    rows_ AS (SELECT p_brand, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT p_type, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
    SELECT ce.p_brand, ce.p_type, ce.o, r.r, c.c, t.n,
           CAST(t.n * ce.o - r.r * c.c AS BIGINT) AS d,
           round(CAST((t.n * ce.o - r.r * c.c)
                      * (t.n * ce.o - r.r * c.c) AS DOUBLE)
                 / CAST(t.n * r.r * c.c AS DOUBLE), 6) AS chi2_term
    FROM cells ce
    JOIN rows_ r USING (p_brand)
    JOIN cols_ c USING (p_type)
    CROSS JOIN tot t
    """,
)
def chi_square_brand_type(spark, sf_dir):
    """Is part type independent of brand? — the full chi-square
    decomposition: per (brand, type) cell the exact BIGINT sufficient
    statistics and the scaled deviation d = n·o − r·c (d²/(n·r·c) sums to
    the chi-square statistic; emitting per-cell terms makes the query a
    feature-selection report, not just one number). Marginals are
    re-aggregated FROM the domain-sized cell relation — the fact table is
    scanned exactly once at any scale."""
    return contingency_assoc(
        load_table(spark, sf_dir, "part"), "p_brand", "p_type"
    )


# --- mutual information ----------------------------------------------------
@register(
    "mutual_info_lang_source",
    oracle="""
    WITH cells AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS o
      FROM documents GROUP BY 1, 2
    ),
    rows_ AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    cols_ AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells)
    SELECT ce.lang, ce.source, ce.o, r.r, c.c, t.n,
           CAST(t.n * ce.o - r.r * c.c AS BIGINT) AS d,
           round(CAST((t.n * ce.o - r.r * c.c)
                      * (t.n * ce.o - r.r * c.c) AS DOUBLE)
                 / CAST(t.n * r.r * c.c AS DOUBLE), 6) AS chi2_term,
           round((CAST(ce.o AS DOUBLE) / t.n)
                 * log2(CAST(t.n * ce.o AS DOUBLE)
                        / CAST(r.r * c.c AS DOUBLE)), 6) AS mi_term
    FROM cells ce
    JOIN rows_ r USING (lang)
    JOIN cols_ c USING (source)
    CROSS JOIN tot t
    """,
)
def mutual_info_lang_source(spark, sf_dir):
    """How much does a document's source tell you about its language? —
    pointwise mutual-information decomposition over the (lang, source)
    contingency table (mi_term sums to I(lang; source) in bits), with the
    chi-square deviation alongside for the same cells. The log2 argument
    is a ratio of exact BIGINT products cast to double, keeping the only
    cross-engine wobble inside log2's last ulp — far below the 1e-6
    rounding grid. Corpus-curation use: rank metadata columns by how much
    language signal they leak before choosing mixture strata."""
    return contingency_assoc(
        load_table(spark, sf_dir, "documents"), "lang", "source", with_mi=True
    )


# --- decile lift -----------------------------------------------------------
def _decile_cuts_sql() -> str:
    cols = ", ".join(
        f"quantile_cont(o_totalprice, {i / 10}) AS c{i}" for i in range(1, 10)
    )
    bucket = " + ".join(
        f"CASE WHEN o_totalprice > c{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    )
    return f"""
    WITH cuts AS (SELECT {cols} FROM orders),
    b AS (
      SELECT 1 + {bucket} AS bucket,
             CASE WHEN {_URGENT} THEN 1 ELSE 0 END AS p
      FROM orders, cuts
    ),
    per AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p) AS BIGINT) AS n_pos
      FROM b GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS tn, CAST(sum(n_pos) AS BIGINT) AS tpos
      FROM per
    )
    SELECT bucket, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / n, 6) AS rate,
           round((CAST(n_pos AS DOUBLE) / n)
                 / (CAST(tpos AS DOUBLE) / tn), 6) AS lift,
           round(CAST(n_pos AS DOUBLE) / tpos, 6) AS capture
    FROM per CROSS JOIN tot
    """


@register("decile_lift_urgent_orders", oracle=_decile_cuts_sql())
def decile_lift_urgent_orders(spark, sf_dir):
    """Decile lift table for order value as an urgency signal: bucket by
    exact price deciles, report each bucket's exact (n, n_pos) and its
    rate / lift / capture. Buckets come from comparing against the nine
    exact percentile cutoffs broadcast as one row (a scan expression) —
    NOT a global ntile() sort, which would funnel the fact table through
    one partition at scale."""
    return decile_lift(
        load_table(spark, sf_dir, "orders"),
        "o_totalprice",
        F.col("o_orderpriority") == "1-URGENT",
    )


# --- confusion matrix / F1 -------------------------------------------------
@register(
    "confusion_f1_price_median",
    oracle=f"""
    WITH thr AS (SELECT quantile_cont(o_totalprice, 0.5) AS t FROM orders),
    a AS (
      SELECT
        CAST(sum(CASE WHEN o_totalprice > t AND {_URGENT}
                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN o_totalprice > t AND NOT ({_URGENT})
                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN o_totalprice <= t AND {_URGENT}
                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN o_totalprice <= t AND NOT ({_URGENT})
                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM orders, thr
    ),
    m AS (
      SELECT tp, fp, fn, tn,
             CAST(tp AS DOUBLE) / (tp + fp) AS prec,
             CAST(tp AS DOUBLE) / (tp + fn) AS rec
      FROM a
    )
    SELECT tp, fp, fn, tn,
           round(prec, 6) AS precision,
           round(rec, 6)  AS recall,
           round(2.0 * prec * rec / (prec + rec), 6) AS f1,
           round(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6)
             AS accuracy
    FROM m
    """,
)
def confusion_f1_price_median(spark, sf_dir):
    """Threshold metrics for the price-predicts-urgency classifier at
    the exact median cutoff: one row of exact BIGINT tp/fp/fn/tn plus
    precision / recall / F1 / accuracy derived from those integers by
    the identical scalar double recipe on both engines. The median is a
    one-row broadcast; the counts one conditional scan aggregate."""
    return confusion_at_threshold(
        load_table(spark, sf_dir, "orders"),
        "o_totalprice",
        F.col("o_orderpriority") == "1-URGENT",
    )


# --- Cohen's kappa ---------------------------------------------------------
@register(
    "cohens_kappa_doc_raters",
    oracle="""
    WITH a AS (
      SELECT
        CAST(sum(CASE WHEN n_chars >= 306
                   AND length(text) - length(replace(text, ' ', '')) >= 55
                 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        CAST(sum(CASE WHEN n_chars >= 306
                   AND length(text) - length(replace(text, ' ', '')) < 55
                 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
        CAST(sum(CASE WHEN n_chars < 306
                   AND length(text) - length(replace(text, ' ', '')) >= 55
                 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
        CAST(sum(CASE WHEN n_chars < 306
                   AND length(text) - length(replace(text, ' ', '')) < 55
                 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      FROM documents
    ),
    m AS (
      SELECT n11, n10, n01, n00,
             CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS n,
             CAST(n11 + n00 AS DOUBLE)
               / CAST(n11 + n10 + n01 + n00 AS DOUBLE) AS po,
             CAST((n11 + n10) * (n11 + n01)
                  + (n01 + n00) * (n10 + n00) AS DOUBLE)
               / (CAST(n11 + n10 + n01 + n00 AS DOUBLE)
                  * CAST(n11 + n10 + n01 + n00 AS DOUBLE)) AS pe
      FROM a
    )
    SELECT n11, n10, n01, n00,
           round(po, 6) AS po,
           round(pe, 6) AS pe,
           round((po - pe) / (1.0 - pe), 6) AS kappa
    FROM m
    """,
)
def cohens_kappa_doc_raters(spark, sf_dir):
    """Agreement between two deterministic document-quality raters —
    rater A: character count ≥ corpus-median 306; rater B: whitespace
    count ≥ median 55 (a token-count proxy): exact BIGINT 2×2 agreement
    counts plus observed/chance agreement and Cohen's kappa. The
    labeling-pipeline primitive: kappa between a cheap heuristic and an
    expensive labeler decides whether the heuristic can pre-filter. One
    conditional aggregate, no shuffle wider than the 1-row result."""
    d = load_table(spark, sf_dir, "documents")
    spaces = F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
    return cohens_kappa(d, F.col("n_chars") >= 306, spaces >= 55)


# --- tie-corrected Spearman -----------------------------------------------
_SPEARMAN_RHO_SQL = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    "         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    "    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
    "           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "spearman_qty_price_by_flag",
    headline=True,
    oracle=f"""
    WITH r AS (
      SELECT l_returnflag, l_linestatus,
             2 * rank() OVER (PARTITION BY l_returnflag, l_linestatus
                              ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_linestatus,
                                l_quantity) - 1 AS rx,
             2 * rank() OVER (PARTITION BY l_returnflag, l_linestatus
                              ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_linestatus,
                                l_extendedprice) - 1 AS ry
      FROM lineitem
    ),
    a AS (
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT)      AS n,
             CAST(sum(rx) AS BIGINT)       AS sx,
             CAST(sum(ry) AS BIGINT)       AS sy,
             CAST(sum(rx * rx) AS BIGINT)  AS sxx,
             CAST(sum(ry * ry) AS BIGINT)  AS syy,
             CAST(sum(rx * ry) AS BIGINT)  AS sxy
      FROM r GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, n, sx, sy, sxx, syy, sxy,
           round({_SPEARMAN_RHO_SQL}, 6) AS rho
    FROM a
    """,
)
def spearman_qty_price_by_flag(spark, sf_dir):
    """Tie-corrected Spearman rank correlation of quantity vs extended
    price per (returnflag, linestatus) — the monotone-association
    complement to the certified Pearson pair query (outliers can't drag
    rank correlation). Average ranks are encoded exactly as the integer
    2·avgrank = cnt_lt + cnt_le + 1, so the five rank moments are exact
    integers and rho is one fixed scalar double recipe on both engines.
    Plan: ONE fact scan into the joint (flag, status, qty, price) grid,
    marginal rank maps from zoned prefix sums (operators/rankstats.py —
    no window ever partitions on the ~4-value group key alone), moments
    accumulated as DECIMAL(38,0) — exact to ~1e12 rows/group; the BIGINT
    sufficient-statistic exports try_cast to NULL past ~1.3e6 rows/group
    while rho itself stays exact from the decimal accumulators."""
    from polygon_algotrading_env_spark.operators.zonedroll import zoning_mode

    li = load_table(spark, sf_dir, "lineitem")
    return spearman_by_group(
        li,
        "l_quantity",
        "l_extendedprice",
        keys=["l_returnflag", "l_linestatus"],
        mode=zoning_mode(sf_dir, "lineitem"),
    )


# --- group-fairness audit --------------------------------------------------
@register(
    "fairness_gaps_by_segment",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_totalprice AS score,
             CASE WHEN o.{_URGENT} THEN 1 ELSE 0 END AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    thr AS (SELECT quantile_cont(score, 0.5) AS t FROM j),
    per AS (
      SELECT segment,
        CAST(sum(CASE WHEN score > t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        CAST(sum(CASE WHEN score > t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        CAST(sum(CASE WHEN score <= t AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        CAST(sum(CASE WHEN score <= t AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM j, thr GROUP BY segment
    ),
    tot AS (
      SELECT CAST(sum(tp) AS BIGINT) AS ttp, CAST(sum(fp) AS BIGINT) AS tfp,
             CAST(sum(fn) AS BIGINT) AS tfn, CAST(sum(tn) AS BIGINT) AS ttn
      FROM per
    )
    SELECT segment,
           CAST(tp + fp + fn + tn AS BIGINT) AS n, tp, fp, fn, tn,
           round(CAST(tp + fp AS DOUBLE) / (tp + fp + fn + tn), 6) AS ppr,
           round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS tpr,
           round(CAST(fp AS DOUBLE) / (fp + tn), 6) AS fpr,
           round(CAST(tp + fp AS DOUBLE) / (tp + fp + fn + tn)
                 - CAST(ttp + tfp AS DOUBLE) / (ttp + tfp + tfn + ttn), 6)
             AS dp_gap,
           round(CAST(tp AS DOUBLE) / (tp + fn)
                 - CAST(ttp AS DOUBLE) / (ttp + tfn), 6) AS tpr_gap,
           round(CAST(fp AS DOUBLE) / (fp + tn)
                 - CAST(tfp AS DOUBLE) / (tfp + ttn), 6) AS fpr_gap
    FROM per CROSS JOIN tot
    """,
)
def fairness_gaps_by_segment(spark, sf_dir):
    """Group-fairness audit of the price-predicts-urgency classifier
    across market segments: per segment the exact BIGINT confusion
    counts, demographic-parity rate (ppr), equalized-odds rates
    (tpr/fpr), and each rate's gap vs the overall population — the bias
    scoreboard a curation gate needs before a heuristic filter ships.
    One broadcast dim join + one-row threshold broadcast + one
    conditional segment aggregate; only the segment domain shuffles."""
    from polygon_algotrading_env_spark.operators.evalmetrics import (
        fairness_gaps,
    )

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    j = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select(
        F.col("c_mktsegment").alias("segment"),
        "o_totalprice",
        "o_orderpriority",
    )
    return fairness_gaps(
        j,
        "o_totalprice",
        F.col("o_orderpriority") == "1-URGENT",
        "segment",
    )


# --- weight-of-evidence / information-value binning -------------------------
def _woe_cuts_sql() -> str:
    cols = ", ".join(
        f"quantile_cont(o_totalprice, {i / 10}) AS c{i}" for i in range(1, 10)
    )
    bucket = " + ".join(
        f"CASE WHEN o_totalprice > c{i} THEN 1 ELSE 0 END" for i in range(1, 10)
    )
    return f"""
    WITH cuts AS (SELECT {cols} FROM orders),
    b AS (
      SELECT 1 + {bucket} AS bucket,
             CASE WHEN {_URGENT} THEN 1 ELSE 0 END AS p
      FROM orders, cuts
    ),
    per AS (
      SELECT bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p) AS BIGINT)   AS n_pos,
             CAST(count(*) - sum(p) AS BIGINT) AS n_neg
      FROM b GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
             CAST(sum(n_neg) AS BIGINT) AS tn
      FROM per
    )
    SELECT bucket, n, n_pos, n_neg,
           round(ln(CAST(n_pos * tn AS DOUBLE)
                    / CAST(n_neg * tp AS DOUBLE)), 6) AS woe,
           round((CAST(n_pos AS DOUBLE) / tp - CAST(n_neg AS DOUBLE) / tn)
                 * ln(CAST(n_pos * tn AS DOUBLE)
                      / CAST(n_neg * tp AS DOUBLE)), 6) AS iv_term
    FROM per CROSS JOIN tot
    """


@register("woe_iv_price_urgency", oracle=_woe_cuts_sql())
def woe_iv_price_urgency(spark, sf_dir):
    """Weight-of-evidence / information-value binning of order value as
    an urgency signal — the credit-scoring feature-screening staple:
    exact decile buckets (the distributed grid-quantile cutoffs, one
    broadcast row), per-bucket exact BIGINT (n, pos, neg), and
    woe = ln(pos·tot_neg / (neg·tot_pos)) — the log of a ratio of exact
    integer products, so both engines take ln of the identical double —
    with iv_term the bucket's contribution to total IV. Buckets with a
    zero class emit NULL woe (ln of 0/undefined) rather than an ANSI
    error. One scan for cutoffs, one conditional aggregate, one tiny
    re-aggregate broadcast back."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        grouped_exact_quantiles,
    )

    o = load_table(spark, sf_dir, "orders")
    cuts = grouped_exact_quantiles(
        o, "o_totalprice", [], [i / 10 for i in range(1, 10)],
        [f"c{i}" for i in range(1, 10)],
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + (F.col("o_totalprice") > F.col(f"c{i}")).cast(
            "int"
        )
    pos = (F.col("o_orderpriority") == "1-URGENT").cast("bigint")
    per = (
        o.crossJoin(F.broadcast(cuts))
        .select(bucket.alias("bucket"), pos.alias("p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p").alias("n_pos"),
            (F.count(F.lit(1)) - F.sum("p")).alias("n_neg"),
        )
    )
    tot = per.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    )
    woe = F.log(
        (F.col("n_pos") * F.col("tn")).cast("double")
        / (F.col("n_neg") * F.col("tp")).cast("double")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n",
        "n_pos",
        "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round(
            (
                F.col("n_pos").cast("double") / F.col("tp")
                - F.col("n_neg").cast("double") / F.col("tn")
            )
            * woe,
            6,
        ).alias("iv_term"),
    )


# --- rank-sum tests on the distributed grid (operators/rankstats.py) -------
@register(
    "mann_whitney_u_price_urgency",
    oracle="""
    WITH v AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1
      FROM orders
    ),
    g AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS t,
             CAST(sum(g1) AS BIGINT) AS t1
      FROM v GROUP BY 1
    ),
    c AS (
      SELECT cents, t, t1,
             sum(t) OVER (ORDER BY cents) AS le
      FROM g
    ),
    s AS (
      -- TRY_CAST on the sufficient-statistic exports mirrors the Spark
      -- side's try_cast: overflow must yield NULL cross-engine, not a
      -- DuckDB cast error (n1/n are plain row counts and cannot overflow
      -- before the sums do)
      SELECT TRY_CAST(sum(t1 * (2 * le - t + 1)) AS BIGINT) AS two_r1,
             CAST(sum(t1) AS BIGINT)                        AS n1,
             CAST(sum(t) AS BIGINT)                         AS n,
             TRY_CAST(sum(t * t * t - t) AS BIGINT)         AS tie_term
      FROM c
    )
    SELECT n1, n - n1 AS n2, two_r1,
           TRY_CAST(two_r1 - n1 * (n1 + 1) AS BIGINT) AS u1_x2, tie_term,
           round(CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE)
                 / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)),
                 6) AS auc_equiv,
           round((CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 2.0)
                 / sqrt(CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE) / 12.0
                        * (CAST(n AS DOUBLE) + 1.0
                           - CAST(tie_term AS DOUBLE)
                             / (CAST(n AS DOUBLE)
                                * (CAST(n AS DOUBLE) - 1.0)))),
                 6) AS z
    FROM s
    """,
)
def mann_whitney_u_price_urgency(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) comparing URGENT vs non-URGENT
    order values — "is the urgent price distribution stochastically
    larger?", the nonparametric two-sample test a signal scoreboard runs
    before trusting a mean gap. Exact-integer discipline end to end:
    prices land on the cents grid, pooled average ranks come from the
    distributed grid cumulation (operators/rankstats.py — no single-task
    sort; the tie convention 2·avgrank = cum_lt + cum_le + 1 keeps
    everything BIGINT), and the payload is (n1, n2, 2·R1, 2·U1, Σt³−t)
    plus the tie-corrected normal z and the AUC-equivalent U/(n1·n2) by
    one fixed scalar double recipe per engine. No continuity correction
    (both engines would apply it identically anyway; documented here so
    the z is interpretable)."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        cumulate_grid,
    )

    v = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g1"),
    )
    grid = v.groupBy("cents").agg(
        F.count(F.lit(1)).alias("t"), F.sum("g1").cast("bigint").alias("t1")
    )
    stats = cumulate_grid(grid, [], "cents", "t")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    two_avgrank = F.col("cum_lt") + F.col("cum_le") + 1
    agg = stats.agg(
        F.sum(dec(F.col("t1")) * dec(two_avgrank)).alias("__two_r1"),
        F.sum("t1").cast("bigint").alias("n1"),
        F.max("n_g").alias("n"),
        F.sum(
            dec(F.col("t")) * dec(F.col("t")) * dec(F.col("t"))
            - dec(F.col("t"))
        ).alias("__tie"),
    )
    n1d = F.col("n1").cast("double")
    n2d = (F.col("n") - F.col("n1")).cast("double")
    nd = F.col("n").cast("double")
    u1x2 = F.col("__two_r1") - dec(F.col("n1") * (F.col("n1") + 1))
    u1x2d = u1x2.cast("double")
    tied = F.col("__tie").cast("double")
    return agg.select(
        "n1",
        (F.col("n") - F.col("n1")).alias("n2"),
        F.expr("try_cast(__two_r1 AS BIGINT)").alias("two_r1"),
        u1x2.try_cast("bigint").alias("u1_x2"),
        F.expr("try_cast(__tie AS BIGINT)").alias("tie_term"),
        F.round(u1x2d / (2.0 * n1d * n2d), 6).alias("auc_equiv"),
        F.round(
            (u1x2d / 2.0 - n1d * n2d / 2.0)
            / F.sqrt(
                n1d * n2d / 12.0 * (nd + 1.0 - tied / (nd * (nd - 1.0)))
            ),
            6,
        ).alias("z"),
    )


@register(
    "kruskal_wallis_price_by_priority",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    g2 AS (
      SELECT pri, cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2
    ),
    pooled AS (
      SELECT cents, CAST(sum(c) AS BIGINT) AS t FROM g2 GROUP BY 1
    ),
    cum AS (
      SELECT cents, t, sum(t) OVER (ORDER BY cents) AS le FROM pooled
    ),
    perg AS (
      SELECT g2.pri,
             CAST(sum(g2.c) AS BIGINT)                        AS n_g,
             CAST(sum(g2.c * (2 * cum.le - cum.t + 1)) AS BIGINT) AS two_r_g
      FROM g2 JOIN cum ON g2.cents = cum.cents
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(t) AS BIGINT)             AS n,
             CAST(sum(t * t * t - t) AS BIGINT) AS tie_term,
             CAST(count(*) AS BIGINT)           AS n_values
      FROM pooled
    ),
    h AS (
      SELECT round(
               (12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                * (SELECT sum(
                     CAST(n_g AS DOUBLE)
                     * (CAST(two_r_g AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))
                        - (CAST(n AS DOUBLE) + 1.0) / 2.0)
                     * (CAST(two_r_g AS DOUBLE) / (2.0 * CAST(n_g AS DOUBLE))
                        - (CAST(n AS DOUBLE) + 1.0) / 2.0))
                   FROM perg))
               / (1.0 - CAST(tie_term AS DOUBLE)
                        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                           * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
               6) AS h_corr,
             n
      FROM tot
    )
    SELECT p.pri AS o_orderpriority, p.n_g, p.two_r_g,
           round(CAST(p.two_r_g AS DOUBLE) / (2.0 * CAST(p.n_g AS DOUBLE)),
                 6) AS rbar,
           h.h_corr,
           (SELECT count(*) - 1 FROM perg) AS df
    FROM perg p, h
    """,
)
def kruskal_wallis_price_by_priority(spark, sf_dir):
    """Kruskal-Wallis H across the five order priorities — the k-group
    rank ANOVA ("does ANY priority class price differently?") that
    gates pairwise rank tests. Pooled average ranks come from ONE
    distributed grid cumulation over all groups (operators/rankstats.py);
    per-group rank sums are an equi-join of the (pri, cents) grid against
    the pooled grid on the fine-grained value key — never a per-group
    sort, never a broadcast of the fact. Payload: per-group BIGINT
    (n_g, 2·R_g) rows plus mean rank, the tie-corrected H (identical
    scalar recipe both engines), and the k−1 degrees of freedom."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        cumulate_grid,
    )

    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pri"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g2 = v.groupBy("pri", "cents").agg(F.count(F.lit(1)).alias("c"))
    pooled = g2.groupBy("cents").agg(F.sum("c").alias("t"))
    cum = cumulate_grid(pooled, [], "cents", "t")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    two_avgrank = F.col("cum_lt") + F.col("cum_le") + 1
    perg = (
        g2.join(cum.select("cents", two_avgrank.alias("__tar")), "cents")
        .groupBy("pri")
        .agg(
            F.sum("c").cast("bigint").alias("n_g"),
            F.sum(dec(F.col("c")) * dec(F.col("__tar"))).alias("__two_r_g"),
        )
        .select(
            "pri",
            "n_g",
            F.expr("try_cast(__two_r_g AS BIGINT)").alias("two_r_g"),
        )
    )
    tot = cum.agg(
        F.max("n_g").alias("n"),
        F.sum(
            dec(F.col("t")) * dec(F.col("t")) * dec(F.col("t"))
            - dec(F.col("t"))
        )
        .cast("double")
        .alias("__tie"),
        F.count(F.lit(1)).alias("n_values"),
    )
    nd = F.col("n").cast("double")
    rbar = F.col("two_r_g").cast("double") / (2.0 * F.col("n_g").cast("double"))
    dev = rbar - (nd + 1.0) / 2.0
    joined = perg.crossJoin(F.broadcast(tot))
    hnum = joined.groupBy().agg(
        F.sum(F.col("n_g").cast("double") * dev * dev).alias("__ss"),
        F.max("n").alias("n"),
        F.max("__tie").alias("__tie"),
        F.count(F.lit(1)).alias("__k"),
    )
    nd2 = F.col("n").cast("double")
    h_corr = F.round(
        (12.0 / (nd2 * (nd2 + 1.0)) * F.col("__ss"))
        / (1.0 - F.col("__tie") / (nd2 * nd2 * nd2 - nd2)),
        6,
    )
    hrow = hnum.select(h_corr.alias("h_corr"), (F.col("__k") - 1).alias("df"))
    return (
        perg.crossJoin(F.broadcast(tot.select("n")))
        .crossJoin(F.broadcast(hrow))
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_g",
            "two_r_g",
            F.round(
                F.col("two_r_g").cast("double")
                / (2.0 * F.col("n_g").cast("double")),
                6,
            ).alias("rbar"),
            "h_corr",
            F.col("df").cast("bigint").alias("df"),
        )
    )


@register(
    "kendall_tau_qty_discount",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS INT)                    AS x,
             CAST(round(l_discount * 100) AS INT)       AS y
      FROM lineitem
    ),
    cells AS (
      SELECT g, x, y, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2, 3
    ),
    dense AS (
      SELECT xs.g, xs.x, ys.y, coalesce(cells.c, 0) AS c
      FROM (SELECT DISTINCT g, x FROM v) xs
      JOIN (SELECT DISTINCT g, y FROM v) ys USING (g)
      LEFT JOIN cells ON cells.g = xs.g AND cells.x = xs.x
                     AND cells.y = ys.y
    ),
    sweep AS (
      SELECT g, x, y, c,
             coalesce(sum(c) OVER (PARTITION BY g, y ORDER BY x
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS h,
             coalesce(sum(c) OVER (PARTITION BY g ORDER BY x
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS a
      FROM dense
    ),
    dom AS (
      SELECT g, x, y, c, h, a,
             coalesce(sum(h) OVER (PARTITION BY g, x ORDER BY y
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS dlt
      FROM sweep
    ),
    xm AS (
      SELECT g, CAST(sum(tx * (tx - 1) / 2) AS HUGEINT) AS tie_x
      FROM (SELECT g, x, sum(c) AS tx FROM cells GROUP BY 1, 2)
      GROUP BY 1
    ),
    ym AS (
      SELECT g, CAST(sum(ty * (ty - 1) / 2) AS HUGEINT) AS tie_y
      FROM (SELECT g, y, sum(c) AS ty FROM cells GROUP BY 1, 2)
      GROUP BY 1
    ),
    agg AS (
      SELECT g,
             CAST(sum(c) AS HUGEINT)                     AS n,
             CAST(sum(CAST(c AS HUGEINT) * dlt) AS HUGEINT) AS c_pairs,
             CAST(sum(CAST(c AS HUGEINT) * (a - dlt - h)) AS HUGEINT)
               AS d_pairs
      FROM dom GROUP BY 1
    )
    -- TRY_CAST mirrors the Spark side's try_cast exports (mleval.py
    -- Spark projection): HUGEINT overflow past BIGINT must yield NULL
    -- cross-engine, not a DuckDB cast error
    SELECT agg.g AS l_returnflag,
           TRY_CAST(agg.n AS BIGINT)       AS n,
           TRY_CAST(agg.c_pairs AS BIGINT) AS c_pairs,
           TRY_CAST(agg.d_pairs AS BIGINT) AS d_pairs,
           TRY_CAST(xm.tie_x AS BIGINT)    AS tie_x,
           TRY_CAST(ym.tie_y AS BIGINT)    AS tie_y,
           round((CAST(agg.c_pairs AS DOUBLE) - CAST(agg.d_pairs AS DOUBLE))
                 / sqrt((CAST(agg.n AS DOUBLE) * (CAST(agg.n AS DOUBLE) - 1.0)
                         / 2.0 - CAST(xm.tie_x AS DOUBLE))
                        * (CAST(agg.n AS DOUBLE)
                           * (CAST(agg.n AS DOUBLE) - 1.0) / 2.0
                           - CAST(ym.tie_y AS DOUBLE))),
                 6) AS tau_b
    FROM agg JOIN xm ON agg.g = xm.g JOIN ym ON agg.g = ym.g
    """,
)
def kendall_tau_qty_discount(spark, sf_dir):
    """Tie-corrected Kendall tau-b between quantity and discount per
    returnflag — the concordance rank correlation whose pair counts are
    usually quoted as O(n log n)-per-group sequential work. Here the fact
    collapses to the (flag, qty, discount) grid (both domains are small
    and discrete — 50 x 11; Kendall on continuous columns belongs to
    Spearman), the grid densifies via a per-group key join (never a
    cartesian node), and the 2D dominance count D(x,y) = #{x'<x, y'<y}
    falls out of TWO window prefix sweeps over the dense grid: h =
    within-row-y exclusive x-cumsum, then dlt = exclusive y-cumsum of h;
    discordant pairs are a(x) - dlt - h by inclusion-exclusion. Every
    pair count is an exact DECIMAL(38,0) integer (n0 = n(n-1)/2 overflows
    BIGINT beyond ~4e9 rows/group; exports try_cast like the Spearman
    payload) and tau-b is one fixed scalar double recipe per engine."""
    from pyspark.sql import Window

    v = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("int").alias("x"),
        F.round(F.col("l_discount") * 100).cast("int").alias("y"),
    )
    cells = v.groupBy("g", "x", "y").agg(F.count(F.lit(1)).alias("c"))
    xs = v.select("g", "x").distinct()
    ys = v.select("g", "y").distinct()
    dense = (
        xs.join(ys, "g")
        .join(cells, ["g", "x", "y"], "left")
        .select("g", "x", "y", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w_h = (
        Window.partitionBy("g", "y")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_a = (
        Window.partitionBy("g")
        .orderBy("x")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    sweep = dense.select(
        "g",
        "x",
        "y",
        "c",
        F.coalesce(F.sum("c").over(w_h), F.lit(0)).alias("h"),
        F.coalesce(F.sum("c").over(w_a), F.lit(0)).alias("a"),
    )
    w_d = (
        Window.partitionBy("g", "x")
        .orderBy("y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    dom = sweep.withColumn(
        "dlt", F.coalesce(F.sum("h").over(w_d), F.lit(0))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = dom.groupBy("g").agg(
        F.sum("c").cast("decimal(38,0)").alias("__n"),
        F.sum(dec(F.col("c")) * dec(F.col("dlt"))).alias("__c"),
        F.sum(
            dec(F.col("c")) * dec(F.col("a") - F.col("dlt") - F.col("h"))
        ).alias("__d"),
    )
    xm = (
        cells.groupBy("g", "x")
        .agg(F.sum("c").alias("tx"))
        .groupBy("g")
        .agg(
            F.sum(dec(F.col("tx")) * dec(F.col("tx") - 1) / 2).alias("__tx")
        )
    )
    ym = (
        cells.groupBy("g", "y")
        .agg(F.sum("c").alias("ty"))
        .groupBy("g")
        .agg(
            F.sum(dec(F.col("ty")) * dec(F.col("ty") - 1) / 2).alias("__ty")
        )
    )
    j = agg.join(xm, "g").join(ym, "g")
    nd = F.col("__n").cast("double")
    n0 = nd * (nd - 1.0) / 2.0
    return j.select(
        F.col("g").alias("l_returnflag"),
        F.col("__n").try_cast("bigint").alias("n"),
        F.col("__c").try_cast("bigint").alias("c_pairs"),
        F.col("__d").try_cast("bigint").alias("d_pairs"),
        F.col("__tx").cast("decimal(38,0)").try_cast("bigint").alias("tie_x"),
        F.col("__ty").cast("decimal(38,0)").try_cast("bigint").alias("tie_y"),
        F.round(
            (F.col("__c").cast("double") - F.col("__d").cast("double"))
            / F.sqrt(
                (n0 - F.col("__tx").cast("double"))
                * (n0 - F.col("__ty").cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


@register(
    "brown_forsythe_price_by_status",
    oracle="""
    WITH v AS (
      SELECT o_orderstatus AS g,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    med AS (
      SELECT g, quantile_cont(cents, 0.5) AS m FROM v GROUP BY 1
    ),
    z AS (
      SELECT v.g,
             CAST(abs(2 * v.cents - CAST(2 * med.m AS BIGINT)) AS BIGINT)
               AS z2
      FROM v JOIN med ON v.g = med.g
    ),
    perg AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(z2) AS HUGEINT) AS s1,
             CAST(sum(CAST(z2 AS HUGEINT) * z2) AS HUGEINT) AS s2
      FROM z GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS HUGEINT) AS n,
             CAST(sum(s1) AS HUGEINT)  AS s1t,
             CAST(count(*) AS BIGINT)  AS k
      FROM perg
    )
    SELECT p.g AS o_orderstatus,
           p.n_g,
           TRY_CAST(p.s1 AS BIGINT) AS s1,
           TRY_CAST(p.s2 AS BIGINT) AS s2,
           round((
             (SELECT sum(CAST(p2.n_g AS DOUBLE)
                 * (CAST(p2.s1 AS DOUBLE) / CAST(p2.n_g AS DOUBLE)
                    - CAST(t.s1t AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * (CAST(p2.s1 AS DOUBLE) / CAST(p2.n_g AS DOUBLE)
                    - CAST(t.s1t AS DOUBLE) / CAST(t.n AS DOUBLE)))
                FROM perg p2) / (CAST(t.k AS DOUBLE) - 1.0))
             / ((SELECT sum(CAST(p3.s2 AS DOUBLE)
                   - CAST(p3.s1 AS DOUBLE) * CAST(p3.s1 AS DOUBLE)
                     / CAST(p3.n_g AS DOUBLE))
                  FROM perg p3)
                / (CAST(t.n AS DOUBLE) - CAST(t.k AS DOUBLE))),
             6) AS f_stat
    FROM perg p, tot t
    """,
)
def brown_forsythe_price_by_status(spark, sf_dir):
    """Brown-Forsythe test for equal order-value spread across order
    statuses — the robust (median-centered) Levene variant that gates
    "did volatility regimes differ?" questions without normality
    assumptions. Group medians come from the distributed grid-quantile
    operator (operators/rankstats.py — no single-reducer percentile
    buffer); because cents are integers, the median lies on the half-cent
    grid and z2 = |2·x − 2·med| is an EXACT BIGINT per row, so the
    one-way-ANOVA-on-deviations sufficient statistics (n_g, Σz2, Σz2²)
    are exact integers and the F statistic is one fixed scalar double
    recipe on both engines."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        grouped_exact_quantiles,
    )

    v = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("g"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    med = grouped_exact_quantiles(v, "cents", ["g"], [0.5], ["m"])
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    z2 = F.abs(
        2 * F.col("cents") - F.round(2 * F.col("m")).cast("bigint")
    )
    perg = (
        v.join(F.broadcast(med), "g")
        .select("g", z2.alias("z2"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_g"),
            F.sum(dec(F.col("z2"))).alias("__s1"),
            F.sum(dec(F.col("z2")) * dec(F.col("z2"))).alias("__s2"),
        )
    )
    tot = perg.agg(
        F.sum("n_g").alias("n"),
        F.sum("__s1").cast("decimal(38,0)").alias("s1t"),
        F.count(F.lit(1)).alias("k"),
    )
    j = perg.crossJoin(F.broadcast(tot))
    zbar_g = F.col("__s1").cast("double") / F.col("n_g").cast("double")
    zbar = F.col("s1t").cast("double") / F.col("n").cast("double")
    between = j.agg(
        F.sum(F.col("n_g").cast("double") * (zbar_g - zbar) * (zbar_g - zbar))
        .alias("__bss"),
        F.sum(
            F.col("__s2").cast("double")
            - F.col("__s1").cast("double")
            * F.col("__s1").cast("double")
            / F.col("n_g").cast("double")
        ).alias("__wss"),
        F.max("n").alias("n"),
        F.max("k").alias("k"),
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    f_row = between.select(
        F.round(
            (F.col("__bss") / (kd - 1.0)) / (F.col("__wss") / (nd - kd)), 6
        ).alias("f_stat")
    )
    return perg.crossJoin(F.broadcast(f_row)).select(
        F.col("g").alias("o_orderstatus"),
        "n_g",
        F.expr("try_cast(__s1 AS BIGINT)").alias("s1"),
        F.expr("try_cast(__s2 AS BIGINT)").alias("s2"),
        "f_stat",
    )


@register(
    "hill_tail_index_by_priority",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS pri,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_totalprice > 0
    ),
    g AS (
      SELECT pri, cents, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2
    ),
    cum AS (
      SELECT pri, cents, c,
             sum(c) OVER (PARTITION BY pri ORDER BY cents) AS le,
             sum(c) OVER (PARTITION BY pri)                AS n
      FROM g
    ),
    t AS (SELECT pri, cents, c, n, n - le AS above FROM cum),
    a AS (
      SELECT pri,
             CAST(max(n) AS BIGINT) AS n,
             sum(CASE WHEN above < 100
                      THEN least(c, 100 - above) * ln(CAST(cents AS DOUBLE))
                      ELSE 0.0 END) / 100.0 AS top_mean_ln,
             CAST(max(CASE WHEN above < 101 AND above + c >= 101
                           THEN cents END) AS BIGINT) AS thr_cents
      FROM t GROUP BY 1 HAVING max(n) > 101
    )
    SELECT pri AS o_orderpriority, n, thr_cents,
           round(top_mean_ln - ln(CAST(thr_cents AS DOUBLE)), 6)
             AS hill_inv_alpha,
           round(1.0 / (top_mean_ln - ln(CAST(thr_cents AS DOUBLE))), 6)
             AS alpha
    FROM a
    """,
)
def hill_tail_index_by_priority(spark, sf_dir):
    """Hill estimator of the right-tail index of order value per priority
    (k = 100 top order statistics against the 101st as threshold) — the
    heavy-tail diagnostic behind "can I trust a mean here at all?" and
    the standard first look at fat-tailed notional distributions. The
    top-k ORDER STATISTICS come straight from the distributed rank grid
    (operators/rankstats.py): a cell contributes min(c, k − #strictly
    greater) copies, and the threshold is the single cell straddling
    rank k+1 from the top — exact tie handling, no per-group sort, no
    TakeOrdered funnel. The only floats are ≤100 ln terms per group,
    summed identically on both engines; groups smaller than k+1 rows are
    excluded on both sides."""
    from polygon_algotrading_env_spark.operators.rankstats import (
        grid_rank_stats,
    )

    k = 100
    v = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 0)
        .select(
            F.col("o_orderpriority").alias("pri"),
            F.round(F.col("o_totalprice") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    stats = grid_rank_stats(v, "cents", ["pri"])
    above = F.col("n_g") - F.col("cum_le")
    contrib = F.when(
        above < k,
        F.least(F.col("c"), k - above).cast("double")
        * F.log(F.col("cents").cast("double")),
    ).otherwise(F.lit(0.0))
    thr = F.max(
        F.when(
            (above < k + 1) & (above + F.col("c") >= k + 1), F.col("cents")
        )
    )
    a = (
        stats.groupBy("pri")
        .agg(
            F.max("n_g").alias("n"),
            (F.sum(contrib) / float(k)).alias("top_mean_ln"),
            thr.alias("thr_cents"),
        )
        .where(F.col("n") > k + 1)
    )
    hinv = F.col("top_mean_ln") - F.log(F.col("thr_cents").cast("double"))
    return a.select(
        F.col("pri").alias("o_orderpriority"),
        "n",
        "thr_cents",
        F.round(hinv, 6).alias("hill_inv_alpha"),
        F.round(1.0 / hinv, 6).alias("alpha"),
    )


# --- Brier score decomposition (Murphy 1973) -------------------------------
@register(
    "brier_decomposition_urgent",
    oracle="""
    WITH b AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y,
             ntile(10) OVER (PARTITION BY o_orderstatus
                             ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    ),
    pb AS (
      SELECT o_orderstatus, bin, count(*) AS nk, sum(y) AS pos,
             (2.0 * bin - 1) / 20.0 AS p
      FROM b GROUP BY 1, 2
    )
    SELECT o_orderstatus,
           CAST(sum(nk) AS BIGINT)  AS n,
           CAST(sum(pos) AS BIGINT) AS n_pos,
           round(sum(nk * p * p - 2 * p * pos + pos) / sum(nk), 6)
             AS brier,
           round(sum(nk * (p - pos * 1.0 / nk) * (p - pos * 1.0 / nk))
                 / sum(nk), 6) AS reliability,
           round(sum(pos * pos * 1.0 / nk) / sum(nk)
                 - (sum(pos) * 1.0 / sum(nk))
                   * (sum(pos) * 1.0 / sum(nk)), 6) AS resolution,
           round((sum(pos) * 1.0 / sum(nk))
                 * (1 - sum(pos) * 1.0 / sum(nk)), 6) AS uncertainty
    FROM pb GROUP BY 1
    """,
)
def brier_decomposition_urgent(spark, sf_dir):
    """Murphy (1973) decomposition of the Brier score for a
    price-decile forecast of order urgency, per order status:
    brier = reliability - resolution + uncertainty, where the forecast
    is the decile midpoint p_k = (2k-1)/20 of the (price, orderkey)
    total order — ntile over a TOTAL order is deterministic in both
    engines, so the bins (and everything derived) hash exactly.
    reliability penalizes mis-calibrated bins (forecast vs observed
    rate), resolution rewards bins that separate outcomes from the
    base rate, uncertainty is the base rate's own variance — the
    standard scoreboard for "is this signal calibrated or merely
    discriminative" that AUC (auc_urgent_price_by_status) cannot see.
    All three terms and the measured Brier reduce over one 10-bin
    relation per status (sufficient statistics nk, pos as BIGINTs;
    doubles derived by the same scalar recipe both engines evaluate —
    the file's exact-integer discipline), so cost after the one
    per-status exchange is bins x statuses, independent of row
    count."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    b = orders.select(
        "o_orderstatus",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
        F.ntile(10).over(w).alias("bin"),
    )
    pb = (
        b.groupBy("o_orderstatus", "bin")
        .agg(F.count(F.lit(1)).alias("nk"), F.sum("y").alias("pos"))
        .withColumn("p", (F.lit(2.0) * F.col("bin") - 1) / F.lit(20.0))
    )
    nk, pos, p = F.col("nk"), F.col("pos"), F.col("p")
    ybar = F.sum(pos) * 1.0 / F.sum(nk)
    return pb.groupBy("o_orderstatus").agg(
        F.sum(nk).cast("bigint").alias("n"),
        F.sum(pos).cast("bigint").alias("n_pos"),
        F.round(
            F.sum(nk * p * p - 2 * p * pos + pos) / F.sum(nk), 6
        ).alias("brier"),
        F.round(
            F.sum(nk * (p - pos * 1.0 / nk) * (p - pos * 1.0 / nk))
            / F.sum(nk),
            6,
        ).alias("reliability"),
        F.round(
            F.sum(pos * pos * 1.0 / nk) / F.sum(nk) - ybar * ybar, 6
        ).alias("resolution"),
        F.round(ybar * (1 - ybar), 6).alias("uncertainty"),
    )

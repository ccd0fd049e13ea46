"""Sliding windows, session windows, and a full indicator (RSI) as
oracle-checked queries — completing the time-series surface (SURVEY.md
§2.6 W3/W4, §2.10 T3 extensions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from polygon_algotrading_env_spark.catalog import load_table
from polygon_algotrading_env_spark.queries import register


# --- sliding (hopping) windows: 10-minute bars every 5 minutes ------------
@register(
    "sliding_bars_10m_5m",
    oracle="""
    SELECT event_type,
           time_bucket(INTERVAL '5 minutes', CAST(ts AS TIMESTAMP))
             - k.k * INTERVAL '5 minutes'       AS bucket_start,
           count(*)                             AS n_events,
           round(sum(value), 4)                 AS volume
    FROM events, (VALUES (0), (1)) AS k(k)
    GROUP BY event_type, bucket_start
    """,
)
def sliding_bars_10m_5m(spark, sf_dir):
    """Hopping window: each event contributes to the two 10-minute windows
    (slide 5 min) covering it. Spark's window() duplicates rows into their
    windows; the oracle reproduces that with an explicit 2-row fan-out."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.window("ts", "10 minutes", "5 minutes").alias("__w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select(
            "event_type", F.col("__w.start").alias("bucket_start"),
            "n_events", "volume",
        )
    )


# --- session windows: activity sessions with a 5-minute gap ---------------
@register(
    "session_windows_per_user",
    headline=True,
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           epoch_ms(min(ts))       AS session_start_ms,
           count(*)                AS n_events,
           round(sum(value), 4)    AS volume
    FROM sess GROUP BY user_id, sid
    """,
)
def session_windows_per_user(spark, sf_dir):
    """Session windows (gap timeout 5 min) — Spark's native session_window;
    the oracle is the classic gaps-and-islands formulation. A new session
    starts when the gap is ≥ the timeout (Spark's window end is exclusive:
    [start, last_event + gap)). Session start is exposed as epoch millis
    computed from the exact nanos (cross-engine timestamp-precision-safe)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("__w"))
        .agg(
            # Integer DIV: float division on epoch-nanos loses precision
            # above 2^53 and lands ±1 ms off.
            F.expr("min(ts_ns) DIV 1000000").alias("session_start_ms"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("volume"),
        )
        .select("user_id", "session_start_ms", "n_events", "volume")
    )


# --- EMA as closed-form window algebra (oracle-bearing since round 8) -----
def _ema20_oracle() -> str:
    from polygon_algotrading_env_spark.queries._ema_sql import ema_pass_ctes

    ctes, final = ema_pass_ctes(
        "ema20",
        "d",
        keys=["event_type"],
        ord_col="ts, event_id",
        val="value",
        span=20,
        out="__ema",
    )
    return f"""
    WITH d AS (
      SELECT event_type, event_id, ts, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) - 1 AS __t
      FROM events
    ),{ctes}
    SELECT event_type, event_id, round(__ema, 6) AS ema_20
    FROM {final}
    """


@register("ema_20_per_event_type", oracle=_ema20_oracle(), headline=True)
def ema_20_per_event_type(spark, sf_dir):
    """EMA-20 of value per event_type — the recursive indicator, evaluated
    WITHOUT Python: ``with_ema_closed_form`` expands the recursion into
    two-level pow-normalized prefix sums (in-block running sum + bounded
    lag-combination carry), all JVM window expressions. The DuckDB oracle
    (``queries/_ema_sql.py``) evaluates the IDENTICAL formula with the
    same embedded double literals, so the hash compare certifies the
    closed form on both engines; equivalence to pandas
    ``ewm(span=20, adjust=False)`` is separately pinned in
    tests/test_indicators.py. Round-6: values carry ~1e-13 cross-engine
    float noise, five orders under the grid."""
    from polygon_algotrading_env_spark.operators.indicators import (
        with_ema_closed_form,
    )
    from polygon_algotrading_env_spark.operators.zonedroll import zoning_mode

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts_ns", "value"
    )
    out = with_ema_closed_form(
        ev, "value", span=20, keys=["event_type"],
        order_cols=["ts_ns", "event_id"], mode=zoning_mode(sf_dir),
    )
    return out.select(
        "event_type", "event_id", F.round("ema_20", 6).alias("ema_20")
    )


# --- multimodal: real WAV + PPM decode over binary columns (rows-only) ----
@register("multimodal_features_from_docs", oracle=None)
def multimodal_features_from_docs(spark, sf_dir):
    """Multimodal column pipeline end-to-end with REAL codec paths for
    all THREE modalities, routed by doc_id mod 3: deterministic mono
    tones rotating between PCM WAV and lossless-compressed native FLAC
    containers (frequency and duration parameterized by doc_id),
    gradient images rotating across P6 PPM, COMPRESSED PNG (stdlib
    zlib), COMPRESSED GIF87a (pure-Python LZW), baseline JPEG
    (pure-numpy Huffman+IDCT, lossy), QOI (byte-oriented
    diff/run/index) and BMP (padded BGR rows) containers (dimensions parameterized by doc_id; the
    GIF variant quantizes its gradient to honor the 256-color table),
    and moving-gradient clips rotating between YUV4MPEG2 and
    LZW-compressed animated-GIF containers (frame count and cadence
    parameterized by doc_id) — all synthesized executor-side
    (:func:`encode_wav` / :func:`encode_ppm` / :func:`encode_png` /
    :func:`encode_y4m`, Arrow-batched), then header-parsed and decoded
    back by the DEFAULT decoder for duration/RMS/ZCR (audio),
    size/luminance/contrast (image) and frame-count/duration/motion
    (video) features. No fake decoder anywhere; binary column + typed
    metadata struct conventions as in MEDIA_SCHEMA."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from polygon_algotrading_env_spark.operators.flac import encode_flac
    from polygon_algotrading_env_spark.operators.multimodal import (
        encode_gif,
        encode_gif_anim,
        encode_bmp,
        encode_jpeg,
        encode_png,
        encode_ppm,
        encode_qoi,
        encode_wav,
        encode_y4m,
        extract_features,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rate = 8000
        for pdf in batches:
            blobs, kinds = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                if i % 3 == 0:
                    freq = 100.0 + (i % 40) * 10.0
                    dur_s = 0.05 + (i % 8) * 0.01
                    t = np.arange(int(rate * dur_s)) / rate
                    tone = 0.5 * np.sin(2 * np.pi * freq * t)
                    # container rotation: WAV (uncompressed) / FLAC
                    # (lossless) — both via decode_audio's dispatch
                    blobs.append(
                        encode_flac(tone, rate)
                        if (i // 3) % 2
                        else encode_wav(tone, rate)
                    )
                    kinds.append("audio")
                elif i % 3 == 1:
                    w, h = 8 + i % 16, 8 + (i // 3) % 16
                    yy, xx = np.mgrid[0:h, 0:w]
                    variant = (i // 3) % 6
                    if variant == 2:
                        # GIF variant: quantize the y-gradient to 8 levels
                        # so unique colors stay under the 256-entry table
                        px = np.stack(
                            [
                                (xx * 255 // max(w - 1, 1)),
                                (yy * 255 // max(h - 1, 1)) // 32 * 32,
                                np.full((h, w), i % 256),
                            ],
                            axis=2,
                        ).astype(np.uint8)
                    else:
                        px = np.stack(
                            [
                                (xx * 255 // max(w - 1, 1)),
                                (yy * 255 // max(h - 1, 1)),
                                np.full((h, w), i % 256),
                            ],
                            axis=2,
                        ).astype(np.uint8)
                    # container rotation: P6 PPM (uncompressed), PNG
                    # (zlib), GIF87a (LZW), baseline JPEG (Huffman+DCT,
                    # lossy), QOI (diff/run/index), BMP (padded BGR
                    # rows) — all via decode_image's magic-byte dispatch
                    blobs.append(
                        [
                            encode_ppm,
                            encode_png,
                            encode_gif,
                            encode_jpeg,
                            encode_qoi,
                            encode_bmp,
                        ][variant](px)
                    )
                    kinds.append("image")
                else:
                    t_f, h, w = 3 + i % 6, 8, 8
                    frames = np.zeros((t_f, h, w), np.uint8)
                    for fi in range(t_f):
                        frames[fi, :, (fi + i) % w] = 200 + i % 56
                    # container rotation: Y4M (uncompressed planar) /
                    # animated GIF (LZW) — both via decode_video
                    blobs.append(
                        encode_gif_anim(frames, fps=float(2 + i % 4))
                        if (i // 3) % 2
                        else encode_y4m(frames, fps_num=2 + i % 4)
                    )
                    kinds.append("video")
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "kind": kinds, "content": blobs}
            )

    media = docs.mapInPandas(
        _synth, schema="media_id bigint, kind string, content binary"
    ).select(
        "media_id",
        "kind",
        "content",
        F.named_struct(
            F.lit("mime"),
            F.when(F.col("kind") == "audio", F.lit("audio/wav"))
            .when(F.col("kind") == "video", F.lit("video/x-yuv4mpeg"))
            .when(
                F.hex(F.substring(F.col("content"), 1, 4)) == "89504E47",
                F.lit("image/png"),
            )
            .otherwise(F.lit("image/x-portable-pixmap")),
            F.lit("width"), F.lit(None).cast("int"),
            F.lit("height"), F.lit(None).cast("int"),
            F.lit("duration_s"), F.lit(None).cast("double"),
            F.lit("fps"), F.lit(None).cast("double"),
        ).alias("meta"),
    )
    feats = extract_features(media)  # default decoder: real WAV/PPM/Y4M parse
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        # feature[1,3,5] are duration/rms/zcr for audio, height/lum-mean/
        # red-mean for image, duration/width/lum-mean for video —
        # modality-appropriate descriptors in every branch
        F.round(F.element_at("feature", 1), 6).alias("f1"),
        F.round(F.element_at("feature", 3), 6).alias("f3"),
        F.round(F.element_at("feature", 5), 6).alias("f5"),
    )


# --- RSI (Cutler's) as a full oracle-checked indicator --------------------
@register(
    "rsi_14_per_event_type",
    headline=True,
    oracle="""
    WITH deltas AS (
      SELECT event_type, event_id, value,
             value - lag(value) OVER w AS d,
             row_number() OVER w       AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ), gl AS (
      SELECT event_type, event_id, rn,
             CASE WHEN d > 0 THEN d ELSE 0 END  AS gain,
             CASE WHEN d < 0 THEN -d ELSE 0 END AS loss
      FROM deltas
    ), avgs AS (
      SELECT event_type, event_id, rn,
             round(sum(gain) OVER f, 6) / count(*) OVER f AS ag,
             round(sum(loss) OVER f, 6) / count(*) OVER f AS al
      FROM gl
      WINDOW f AS (PARTITION BY event_type ORDER BY rn
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id,
           CASE WHEN al = 0 THEN 100.0
                ELSE 100.0 - 100.0 / (1.0 + ag / al) END AS rsi_14
    FROM avgs WHERE rn > 14
    """,
)
def rsi_14_per_event_type(spark, sf_dir):
    """RSI-14 (simple averaging) over the event stream, hash-exact via the
    stabilize-then-exact-ops pattern: gains/losses are exact 2-decimal
    differences, their windowed sums stabilized by round(·,6), and every
    subsequent op (divide, 100−100/(1+x)) is identical IEEE arithmetic on
    identical doubles in both engines.

    Scale shape: ``event_type`` is ~4-valued, so the textbook
    ``Window.partitionBy("event_type")`` plan funnels the whole stream
    through ≤4 tasks TWICE (lag pass + rolling pass) — the suite's worst
    measured 100× scaler before this rewrite. The stream is instead
    zone-decomposed (operators/zonedroll.py): range zones over
    (event_type, ts_ns, event_id), the last 14 rows carried across each
    boundary (13-row frame + 1 for the lag), every window partitioned by
    (event_type, zone) — parallel across zones for one symbol, results
    bit-identical to the global window by the carry-replication law."""
    from polygon_algotrading_env_spark.operators.zonedroll import (
        zoned_stream,
        zoning_mode,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts_ns", "value"
    )
    z = zoned_stream(
        ev, keys=["event_type"], order=["ts_ns", "event_id"], carry=14,
        mode=zoning_mode(sf_dir),
    )
    d = F.col("value") - F.lag("value").over(z.w)
    gl = z.frame.select(
        "event_type",
        "event_id",
        "ts_ns",
        "__tzone",
        "__carry",
        "__rnbase",
        z.row_number().alias("rn"),
        F.when(d > 0, d).otherwise(F.lit(0.0)).alias("gain"),
        F.when(d < 0, -d).otherwise(F.lit(0.0)).alias("loss"),
    )
    f = z.rows(-13, 0)
    avgs = z.finish(
        gl.select(
            "event_type",
            "event_id",
            "ts_ns",
            "rn",
            "__tzone",
            "__carry",
            "__rnbase",
            (
                F.round(F.sum("gain").over(f), 6) / F.count(F.lit(1)).over(f)
            ).alias("ag"),
            (
                F.round(F.sum("loss").over(f), 6) / F.count(F.lit(1)).over(f)
            ).alias("al"),
        )
    )
    return avgs.filter(F.col("rn") > 14).select(
        "event_type",
        "event_id",
        F.when(F.col("al") == 0, F.lit(100.0))
        .otherwise(100.0 - 100.0 / (1.0 + F.col("ag") / F.col("al")))
        .alias("rsi_14"),
    )


@register(
    "band_join_events_60s",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             epoch_ns(ts) // 1000000 AS ms
      FROM events
    )
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.event_type
    FROM e a JOIN e b
      ON a.event_type = b.event_type
     AND b.ms BETWEEN a.ms - 60000 AND a.ms + 60000
     AND a.event_id < b.event_id
    """,
)
def band_join_events_60s(spark, sf_dir):
    """Range (band) join: pairs of same-type events within ±60 s — the
    bucket-and-prune plan (quantize to 1 s cells → equi-join on cell →
    exact band predicate), never BroadcastNestedLoopJoin. Times compare in
    epoch millis via exact integer division (`DIV`): a double round-trip
    of 2024-era epoch nanos (~1.7e18 > 2^53) truncates some rows to the
    wrong millisecond and diverges from the oracle at band edges."""
    from polygon_algotrading_env_spark.operators.rangejoin import band_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.expr("ts_ns DIV 1000000").alias("ms")
    )
    left = ev.select(F.col("event_id").alias("id_a"), "event_type", F.col("ms"))
    right = ev.select(F.col("event_id").alias("id_b"), "event_type", F.col("ms").alias("ms_b"))
    return (
        band_join(
            left, right, "ms", "ms_b", low=-60000, high=60000,
            on="event_type", bucket_width=60000.0,
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "event_type")
    )


# --- ordered funnel: view -> click -> purchase ----------------------------
@register(
    "view_click_purchase_funnel",
    headline=True,
    oracle="""
    WITH ns AS (
      SELECT user_id, event_type, epoch_ns(ts) AS tns FROM events
    ),
    v AS (
      SELECT user_id, min(tns) AS t FROM ns
      WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(e.tns) AS t
      FROM ns e JOIN v ON e.user_id = v.user_id AND e.tns > v.t
      WHERE e.event_type = 'click' GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.tns) AS t
      FROM ns e JOIN c ON e.user_id = c.user_id AND e.tns > c.t
      WHERE e.event_type = 'purchase' GROUP BY 1
    )
    SELECT * FROM (
      SELECT 1 AS stage_no, 'view' AS stage,     count(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click',    count(*) FROM c
      UNION ALL
      SELECT 3, 'purchase', count(*) FROM p
    ) t
    """,
)
def view_click_purchase_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: users who viewed,
    then clicked strictly AFTER their first view, then purchased strictly
    after that first qualifying click. Each stage is a per-user min-ts
    aggregate equi-joined to the previous stage (the strict ts_ns
    inequality rides the join), so the plan is three hash aggregates +
    two joins on user_id — one shuffle family, no window over the raw
    stream, no row explosion. The exact-nanos tiebreak column makes the
    strict ordering engine-portable."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns"
    )

    def first_after(prev, etype):
        e = ev.where(F.col("event_type") == etype)
        if prev is not None:
            e = e.join(
                prev.withColumnRenamed("t", "__pt"), "user_id"
            ).where(F.col("ts_ns") > F.col("__pt"))
        return e.groupBy("user_id").agg(F.min("ts_ns").alias("t"))

    v = first_after(None, "view")
    c = first_after(v, "click")
    p = first_after(c, "purchase")
    rows = [
        (1, "view", v),
        (2, "click", c),
        (3, "purchase", p),
    ]
    out = None
    for no, name, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out


# --- weekly cohort retention ----------------------------------------------
@register(
    "weekly_cohort_retention",
    oracle="""
    WITH days AS (
      SELECT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events
    ),
    firsts AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY 1),
    act AS (SELECT DISTINCT user_id, d FROM days),
    cohort_size AS (
      SELECT d0 // 7 AS cohort_week, count(*) AS n_cohort
      FROM firsts GROUP BY 1
    ),
    activity AS (
      SELECT f.d0 // 7 AS cohort_week,
             (a.d // 7) - (f.d0 // 7) AS week_offset,
             count(DISTINCT a.user_id) AS n_active
      FROM act a JOIN firsts f ON a.user_id = f.user_id
      GROUP BY 1, 2
    )
    SELECT a.cohort_week, a.week_offset, a.n_active,
           round(a.n_active * 1.0 / c.n_cohort, 6) AS retention
    FROM activity a JOIN cohort_size c ON a.cohort_week = c.cohort_week
    """,
)
def weekly_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users bucketed by the epoch-week of their
    first event; each later epoch-week of activity increments that
    cohort's (cohort_week, week_offset) cell; retention = active share of
    the cohort. Pure integer epoch-week arithmetic (ts_ns DIV day DIV 7)
    sidesteps engine week-boundary conventions entirely. Plan: events
    collapse to distinct (user, day) FIRST, so every later join/aggregate
    runs on day-grain rows — bounded by users × days, never event
    count."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts_ns")
    days = ev.select(
        "user_id", F.expr("ts_ns DIV 86400000000000").alias("d")
    ).dropDuplicates(["user_id", "d"])
    firsts = days.groupBy("user_id").agg(F.min("d").alias("d0"))
    cohort_size = (
        firsts.groupBy(F.expr("d0 DIV 7").alias("cohort_week"))
        .agg(F.count(F.lit(1)).alias("n_cohort"))
    )
    activity = (
        days.join(firsts, "user_id")
        .groupBy(
            F.expr("d0 DIV 7").alias("cohort_week"),
            F.expr("(d DIV 7) - (d0 DIV 7)").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    return activity.join(F.broadcast(cohort_size), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )


# --- RFM segmentation -----------------------------------------------------
@register(
    "rfm_user_segments",
    oracle="""
    WITH rfm AS (
      SELECT user_id,
             max(epoch_ns(ts))        AS last_ns,
             count(*)                 AS frequency,
             round(sum(value), 4)     AS monetary
      FROM events GROUP BY 1
    ),
    cuts AS (
      SELECT quantile_cont(last_ns * 1.0, 0.5)   AS r_med,
             quantile_cont(frequency * 1.0, 0.5) AS f_med,
             quantile_cont(monetary, 0.5)        AS m_med
      FROM rfm
    )
    SELECT concat(CASE WHEN last_ns * 1.0 > r_med THEN 'R1' ELSE 'R0' END,
                  CASE WHEN frequency * 1.0 > f_med THEN 'F1' ELSE 'F0' END,
                  CASE WHEN monetary > m_med THEN 'M1' ELSE 'M0' END)
                                        AS segment,
           count(*)                     AS n_users,
           round(sum(monetary), 4)      AS segment_value
    FROM rfm CROSS JOIN cuts
    GROUP BY 1
    """,
)
def rfm_user_segments(spark, sf_dir):
    """RFM segmentation: users scored above/below the population MEDIAN
    on recency (last activity), frequency (event count), and monetary
    (summed value), then counted per R/F/M octant — the classic
    engagement-cohort cut. One per-user aggregate, one 1-row median
    model broadcast back, one octant rollup. Median boundaries are the
    same interpolated definition in both engines (bit-identical), and
    strict > comparisons keep boundary users deterministically in the
    low bucket. Monetary is rounded to its input grid BEFORE the median
    and segment sums so both engines cut and sum identical values."""
    ev = load_table(spark, sf_dir, "events")
    rfm = ev.groupBy("user_id").agg(
        F.max("ts_ns").alias("last_ns"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("value"), 4).alias("monetary"),
    )
    cuts = rfm.agg(
        F.expr("percentile(last_ns * 1.0, 0.5)").alias("r_med"),
        F.expr("percentile(frequency * 1.0, 0.5)").alias("f_med"),
        F.expr("percentile(monetary, 0.5)").alias("m_med"),
    )
    seg = F.concat(
        F.when(F.col("last_ns") * 1.0 > F.col("r_med"), "R1").otherwise("R0"),
        F.when(F.col("frequency") * 1.0 > F.col("f_med"), "F1").otherwise("F0"),
        F.when(F.col("monetary") > F.col("m_med"), "M1").otherwise("M0"),
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("monetary"), 4).alias("segment_value"),
        )
    )


# --- behavioral transition matrix -----------------------------------------
@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts)) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def event_transition_matrix(spark, sf_dir):
    """First-order behavioral Markov matrix: P(next event type | current)
    per user journey — the transition probabilities behind funnel design
    and next-action models. One lead() window over the per-user shuffle,
    a 25-cell count aggregate, and row-normalization over the cell
    relation (vocab-sized, so the normalizing window is trivially
    small). Exact-nanos ordering keeps sequences engine-identical;
    p is an exact integer ratio rounded at 6dp."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_ns"
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).where(
        F.col("next_type").isNotNull()
    )
    c = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn), 6).alias("p"),
    )


@register(
    "kaplan_meier_fulfillment",
    oracle="""
    WITH life AS (
      SELECT o.o_orderkey,
             CAST(floor((epoch(min(l.l_shipdate)) - epoch(o.o_orderdate))
                        / 86400) AS BIGINT) AS ship_days,
             CAST(floor((epoch(TIMESTAMP '1997-01-01')
                         - epoch(o.o_orderdate)) / 86400) AS BIGINT)
               AS horizon_days
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    obs AS (
      SELECT CASE WHEN ship_days <= horizon_days THEN ship_days
                  ELSE horizon_days END AS days,
             CASE WHEN ship_days <= horizon_days THEN 1 ELSE 0 END AS shipped
      FROM life
    ),
    tbl AS (
      SELECT days, sum(shipped) AS d, count(*) AS leaving
      FROM obs GROUP BY days
    ),
    lt AS (
      SELECT days, d,
             (SELECT count(*) FROM obs)
               - coalesce(sum(leaving) OVER (ORDER BY days
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS at_risk
      FROM tbl
    )
    SELECT days,
           CAST(d AS BIGINT)       AS n_shipped,
           CAST(at_risk AS BIGINT) AS n_at_risk,
           round(exp(sum(ln(1.0 - d * 1.0 / at_risk))
                     OVER (ORDER BY days ROWS UNBOUNDED PRECEDING)), 6)
             AS survival
    FROM lt WHERE d > 0
    """,
)
def kaplan_meier_fulfillment(spark, sf_dir):
    """Kaplan-Meier survival of order-fulfillment time: S(t) = Π(1−dᵢ/nᵢ)
    over days-to-first-shipment, with orders NOT yet shipped by the
    1997-01-01 observation cutoff RIGHT-CENSORED at their elapsed age —
    the estimator that answers 'what fraction of orders are still
    unshipped after t days?' without the downward bias a naive average
    over shipped-only orders bakes in. One fact aggregate reduces
    lineitems to first-ship per order; the life table is day-grain; the
    running product is exp(Σ ln(·)) over the ordered day relation —
    sequential on identical rationals, so both engines emit the same
    curve. Exact epoch arithmetic throughout."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    life = (
        li.join(
            F.broadcast(orders.select("o_orderkey", "o_orderdate")),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.min("l_shipdate").alias("first_ship"))
        .select(
            F.floor(
                (
                    F.unix_timestamp("first_ship")
                    - F.unix_timestamp("o_orderdate")
                )
                / 86400
            ).alias("ship_days"),
            F.floor(
                (
                    F.unix_timestamp(F.lit("1997-01-01").cast("timestamp"))
                    - F.unix_timestamp("o_orderdate")
                )
                / 86400
            ).alias("horizon_days"),
        )
    )
    obs = life.select(
        F.when(
            F.col("ship_days") <= F.col("horizon_days"), F.col("ship_days")
        )
        .otherwise(F.col("horizon_days"))
        .alias("days"),
        F.when(F.col("ship_days") <= F.col("horizon_days"), 1)
        .otherwise(0)
        .alias("shipped"),
    )
    tbl = obs.groupBy("days").agg(
        F.sum("shipped").alias("d"), F.count(F.lit(1)).alias("leaving")
    )
    w = Window.orderBy("days")
    # total at risk = window sum over the (day-grain, tiny) life table —
    # no separate count() job against the fact-sized relation.
    lt = tbl.withColumn(
        "at_risk",
        F.sum("leaving").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        - F.coalesce(
            F.sum("leaving").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    surv = F.exp(
        F.sum(F.log(1.0 - F.col("d") * 1.0 / F.col("at_risk"))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return (
        lt.where(F.col("d") > 0)
        .select(
            "days",
            F.col("d").cast("bigint").alias("n_shipped"),
            F.col("at_risk").cast("bigint").alias("n_at_risk"),
            F.round(surv, 6).alias("survival"),
        )
    )


@register(
    "ab_test_conversion_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                       BETWEEN '0' AND '7'
                  THEN 'A' ELSE 'B' END AS variant,
             CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                THEN 1 ELSE 0 END) >= 15
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1
    ),
    arms AS (
      SELECT variant, count(*) AS n, sum(converted) AS conv
      FROM assign GROUP BY 1
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 'A' THEN n END)    AS n_a,
             max(CASE WHEN variant = 'A' THEN conv END) AS c_a,
             max(CASE WHEN variant = 'B' THEN n END)    AS n_b,
             max(CASE WHEN variant = 'B' THEN conv END) AS c_b
      FROM arms
    )
    SELECT n_a, n_b,
           round(c_a * 1.0 / n_a, 6) AS rate_a,
           round(c_b * 1.0 / n_b, 6) AS rate_b,
           round((c_a * 1.0 / n_a - c_b * 1.0 / n_b)
                 / sqrt(((c_a + c_b) * 1.0 / (n_a + n_b))
                        * (1.0 - (c_a + c_b) * 1.0 / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)), 6) AS z_stat
    FROM wide
    """,
)
def ab_test_conversion_ztest(spark, sf_dir):
    """Experiment readout: two-proportion z-test of per-user conversion
    between hash-assigned variants (md5 first hex digit — the same
    deterministic assignment discipline as hash_split, so the 'experiment'
    is reproducible across engines and runs; an 8/8 split of hex 0-7 vs
    8-f). Conversion (>= 15 purchases — a threshold metric; any-purchase
    saturates at 100% on this fixture and degenerates the variance)
    collapses the event stream to one row per user FIRST (z-tests assume
    independent units — users, not events), arms
    are a 2-row aggregate, and the pooled-variance z folds in one more
    1-row pass. Exact integer counts → identical IEEE ratios."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 15,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1).between(
                "0", "7"
            ),
            "A",
        )
        .otherwise("B")
        .alias("variant"),
        "converted",
    )
    arms = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("c_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("c_b"),
    )
    p_a = F.col("c_a") * 1.0 / F.col("n_a")
    p_b = F.col("c_b") * 1.0 / F.col("n_b")
    pool = (F.col("c_a") + F.col("c_b")) * 1.0 / (F.col("n_a") + F.col("n_b"))
    return wide.select(
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("rate_a"),
        F.round(p_b, 6).alias("rate_b"),
        F.round(
            (p_a - p_b)
            / F.sqrt(
                pool * (1.0 - pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            6,
        ).alias("z_stat"),
    )


@register(
    "chi2_eventtype_dayofweek",
    oracle="""
    WITH obs AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow,
             count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type, dow, o,
             sum(o) OVER (PARTITION BY event_type) AS row_tot,
             sum(o) OVER (PARTITION BY dow)        AS col_tot,
             sum(o) OVER ()                        AS n
      FROM obs
    )
    SELECT count(*)                                        AS n_cells,
           round(sum((o - row_tot * col_tot * 1.0 / n)
                     * (o - row_tot * col_tot * 1.0 / n)
                     / (row_tot * col_tot * 1.0 / n)), 6)  AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT)     AS dof
    FROM m
    """,
)
def chi2_eventtype_dayofweek(spark, sf_dir):
    """Categorical-association audit: Pearson chi-square of event type vs
    day-of-week — 'does the traffic mix shift by weekday?' as one number
    plus its degrees of freedom (a uniform generator should sit near
    dof). The contingency table is a 35-cell aggregate; margins are
    windows over those cells, never a second scan; expected counts are
    exact rationals so both engines square identical residuals.
    DuckDB's dayofweek(=0-6, Sunday 0) vs Spark's dayofweek(1-7) differ
    by a constant shift that the statistic is invariant to — the oracle
    keeps each engine's native numbering out of the hash by aggregating
    the cells away."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql import Window

    m = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("dow")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("row_tot") * F.col("col_tot") * 1.0 / F.col("n")
    return m.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
            "chi2"
        ),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("bigint").alias("dof"),
    )


@register(
    "volume_concentration_hhi",
    oracle="""
    WITH u AS (
      SELECT event_type, user_id, sum(value) AS v
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, v,
             sum(v) OVER (PARTITION BY event_type) AS tot
      FROM u
    )
    SELECT event_type,
           count(*)                                   AS n_users,
           round(sum((v / tot) * (v / tot)), 6)       AS hhi,
           round(max(v / tot), 6)                     AS top_share
    FROM s
    GROUP BY 1
    """,
)
def volume_concentration_hhi(spark, sf_dir):
    """Herfindahl-Hirschman concentration of traded volume across users
    per symbol (1/n = perfectly even, →1 = one whale) plus the top
    participant's share — the wash-trading / dominance screen run on
    venue surveillance and the flow-concentration input to market-impact
    models. Per-user sums are one hash aggregate; shares square against
    a per-symbol window total over the USER-grain relation, never the
    raw stream."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(F.sum("value").alias("v"))
    s = u.withColumn(
        "tot", F.sum("v").over(Window.partitionBy("event_type"))
    )
    share = F.col("v") / F.col("tot")
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.sum(share * share), 6).alias("hhi"),
        F.round(F.max(share), 6).alias("top_share"),
    )


@register(
    "cohort_revenue_curve",
    oracle="""
    WITH purch AS (
      SELECT user_id, ts, value,
             CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
      FROM events WHERE event_type = 'purchase'
    ),
    cohort AS (
      SELECT user_id, min(wk) AS cohort_wk FROM purch GROUP BY 1
    ),
    cells AS (
      SELECT c.cohort_wk,
             p.wk - c.cohort_wk AS age_wk,
             sum(p.value)       AS rev,
             count(DISTINCT p.user_id) AS n_buyers
      FROM purch p JOIN cohort c ON p.user_id = c.user_id
      GROUP BY 1, 2
    ),
    sized AS (
      SELECT cohort_wk, count(*) AS cohort_size
      FROM cohort GROUP BY 1
    )
    SELECT ce.cohort_wk, ce.age_wk,
           CAST(ce.n_buyers AS BIGINT)              AS n_buyers,
           round(ce.rev, 4)                         AS revenue,
           round(sum(ce.rev) OVER (PARTITION BY ce.cohort_wk
                                   ORDER BY ce.age_wk
                                   ROWS UNBOUNDED PRECEDING)
                 / s.cohort_size, 6)                AS cum_ltv_per_user
    FROM cells ce JOIN sized s ON ce.cohort_wk = s.cohort_wk
    """,
)
def cohort_revenue_curve(spark, sf_dir):
    """Cohort LTV curves: users grouped by first-purchase epoch-week, and
    each cohort's CUMULATIVE revenue per original member by cohort age —
    the payback-period curve finance reads off retention dashboards
    (dividing by cohort SIZE, not active buyers, so churn shows as
    flattening rather than survivorship-biased growth). Integer
    epoch-week arithmetic both engines; cells are cohort×age grain; the
    cumulative sum is a window over that tiny relation."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "value",
        F.floor(F.unix_timestamp("ts") / 604800).alias("wk"),
    )
    cohort = purch.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    cells = (
        purch.join(F.broadcast(cohort), "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("age_wk"))
        .agg(
            F.sum("value").alias("rev"),
            F.countDistinct("user_id").alias("n_buyers"),
        )
    )
    sized = cohort.groupBy("cohort_wk").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    w = Window.partitionBy("cohort_wk").orderBy("age_wk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cells.join(F.broadcast(sized), "cohort_wk")
        .select(
            "cohort_wk",
            "age_wk",
            F.col("n_buyers").cast("bigint").alias("n_buyers"),
            F.round("rev", 4).alias("revenue"),
            F.round(
                F.sum("rev").over(w) / F.col("cohort_size"), 6
            ).alias("cum_ltv_per_user"),
        )
    )


@register("video_frame_features_from_docs", oracle=None)
def video_frame_features_from_docs(spark, sf_dir):
    """REAL video frame-sampling end-to-end: deterministic Y4M clips
    synthesized executor-side (cadence/frames parameterized by doc_id),
    sampled at 1 frame/sec via the Y4M decode (operators/multimodal.py:
    sample_video_frames), each sampled frame re-encoded as P6 and scored
    by the IMAGE feature extractor — the video→image handoff as one
    registry-visible pipeline. Rows-only: codec e2e is pinned by the
    multimodal test suite; per-frame features are floats of synthetic
    pixels with no SQL-oracle formulation."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from polygon_algotrading_env_spark.operators.multimodal import (
        encode_y4m,
        extract_features,
        sample_video_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(200)

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                t_f, h, w = 4 + i % 6, 8, 8
                frames = np.zeros((t_f, h, w), np.uint8)
                for fi in range(t_f):
                    frames[fi, :, (fi + i) % w] = 180 + i % 76
                blobs.append(encode_y4m(frames, fps_num=2 + i % 3))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(blobs),
                    "content": blobs,
                }
            )

    media = docs.mapInPandas(
        _synth, schema="media_id bigint, kind string, content binary"
    )
    frames = sample_video_frames(media, every_s=1.0, max_frames=4)
    as_images = frames.select(
        (F.col("media_id") * 1000 + F.col("frame_idx")).alias("media_id"),
        F.lit("image").alias("kind"),
        "content",
    )
    feats = extract_features(as_images)
    return feats.select(
        "media_id",
        "n_bytes",
        F.round(F.element_at("feature", 4), 6).alias("lum_mean"),
        F.round(F.element_at("feature", 5), 6).alias("lum_std"),
    )


# --- first/last-touch attribution -----------------------------------------
@register(
    "attribution_touch_points",
    oracle="""
    WITH ns AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts) AS tns FROM events
    ),
    p AS (
      SELECT user_id, event_id AS purchase_event_id, tns AS purchase_ts_ns
      FROM ns WHERE event_type = 'purchase'
    ),
    lc AS (
      SELECT p.purchase_event_id, max(c.tns) AS last_click_ts_ns
      FROM p JOIN ns c
        ON c.user_id = p.user_id AND c.tns < p.purchase_ts_ns
      WHERE c.event_type = 'click'
      GROUP BY 1
    ),
    fv AS (
      SELECT p.purchase_event_id, min(v.tns) AS first_view_ts_ns
      FROM p JOIN ns v
        ON v.user_id = p.user_id AND v.tns < p.purchase_ts_ns
      WHERE v.event_type = 'view'
      GROUP BY 1
    )
    SELECT p.user_id, p.purchase_event_id, p.purchase_ts_ns,
           lc.last_click_ts_ns,
           fv.first_view_ts_ns,
           CASE WHEN lc.last_click_ts_ns IS NULL THEN NULL
                ELSE p.purchase_ts_ns - lc.last_click_ts_ns
           END AS click_to_buy_ns,
           CASE WHEN fv.first_view_ts_ns IS NULL THEN NULL
                ELSE p.purchase_ts_ns - fv.first_view_ts_ns
           END AS view_to_buy_ns
    FROM p
    LEFT JOIN lc USING (purchase_event_id)
    LEFT JOIN fv USING (purchase_event_id)
    """,
)
def attribution_touch_points(spark, sf_dir):
    """Marketing attribution per conversion: every purchase annotated
    with its LAST-touch click (the as-of predecessor, strictly before)
    and FIRST-touch view, plus exact-nanosecond conversion latencies —
    NULL-preserving for purchases with no prior touch. Last-touch rides
    the engine's as-of join (union+LOCF, ONE (user, time) shuffle — see
    operators/asof.py); first-touch is a per-user min-aggregate
    broadcast back and the strict-before predicate applied at the
    purchase row. The oracle replays both as per-purchase range
    aggregates (quadratic per user — oracle-scale only; the Spark plan
    never pairs rows). All payloads exact BIGINT nanos."""
    from polygon_algotrading_env_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts_ns"
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts_ns").alias("purchase_ts_ns"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ns").alias("click_ts_ns")
    )
    last = asof_join(
        p,
        clicks,
        on="user_id",
        left_ts="purchase_ts_ns",
        right_ts="click_ts_ns",
        direction="backward",
        allow_exact_matches=False,
    ).select(
        "user_id",
        "purchase_event_id",
        "purchase_ts_ns",
        F.col("click_ts_ns").alias("last_click_ts_ns"),
    )
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ns").alias("fv_ts_ns"))
    )
    out = last.join(F.broadcast(first_view), "user_id", "left").select(
        "user_id",
        "purchase_event_id",
        "purchase_ts_ns",
        "last_click_ts_ns",
        F.when(
            F.col("fv_ts_ns") < F.col("purchase_ts_ns"), F.col("fv_ts_ns")
        ).alias("first_view_ts_ns"),
    )
    return out.select(
        "user_id",
        "purchase_event_id",
        "purchase_ts_ns",
        "last_click_ts_ns",
        "first_view_ts_ns",
        (F.col("purchase_ts_ns") - F.col("last_click_ts_ns")).alias(
            "click_to_buy_ns"
        ),
        (F.col("purchase_ts_ns") - F.col("first_view_ts_ns")).alias(
            "view_to_buy_ns"
        ),
    )

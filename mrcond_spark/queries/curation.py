"""Corpus-hygiene tier (round-5 additions): boilerplate passage removal and
hashed-n-gram importance weighting.

Two curation steps every large-scale pretraining pipeline runs between raw
ingestion and mixture assembly, both absent from the existing dedup tier
because they act WITHIN documents (q117 rewrites texts) or score them
against a target distribution (q118), rather than dropping whole rows:

- q117: C4-style boilerplate stripping — the unit is a fixed-width token
  passage, and a passage repeated across many DISTINCT documents is
  boilerplate (navigation chrome, license headers, templated intros) and
  is cut from every document that carries it.
- q118: DSIR-style importance weights (Xie et al., "Data Selection for
  Language Models via Importance Resampling", arXiv:2302.03169): score
  each document by the log-likelihood ratio of a target distribution vs
  the raw distribution over HASHED token buckets — the hashing makes the
  feature space fixed-width (B buckets) no matter how large the vocabulary
  gets, which is the whole trick that lets the weighting run at corpus
  scale as two bounded aggregates plus a broadcast join.

Both carry full DuckDB hash oracles. Float discipline: q118's only
transcendental (``ln``) is computed once per BUCKET (64 rows), rounded to
7 decimals, and cast to DECIMAL before the per-document sum — so the
data-sized arithmetic is exact-decimal and order-independent in both
engines.

Reference parity note: f-squirrel/mrcond is a CDC connector with no batch
surface (SURVEY §1); this module belongs to the mandated north-star
extension, same as queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import text
from . import register

#: q117 passage width (tokens) and boilerplate document-frequency threshold:
#: a width-5 passage seen in more than 2 distinct documents is boilerplate.
#: Calibrated so the synthetic corpus has real removals at every sf
#: (sf0.01: 35 of 5,318 distinct passages; sf0.1: 222 of 52,286).
PASSAGE_W = 5
MAX_DF = 2

#: q118 hashed-feature space: 64 buckets, 6 hex chars of md5 (24 bits) mod 64.
N_BUCKETS = 64


@register(
    "q117_boilerplate_removal",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(arr) AS tok, UNNEST(range(len(arr))) AS pos
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS arr
              FROM documents)
    ), segs AS (
        SELECT doc_id, CAST(pos // {PASSAGE_W} AS INT) AS seg_id,
               string_agg(tok, ' ' ORDER BY pos) AS seg
        FROM toks GROUP BY doc_id, pos // {PASSAGE_W}
    ), dfreq AS (
        SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
    ), kept AS (
        SELECT s.doc_id, s.seg_id, s.seg
        FROM segs s JOIN dfreq USING (seg) WHERE dfreq.df <= {MAX_DF}
    ), tot AS (
        SELECT doc_id, COUNT(*) AS total_segs FROM segs GROUP BY doc_id
    ), keptagg AS (
        SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_id) AS clean_text,
               COUNT(*) AS kept_segs
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(k.clean_text, '') AS clean_text,
           CAST(COALESCE(k.kept_segs, 0) AS INT) AS kept_segs,
           CAST(t.total_segs AS INT) AS total_segs
    FROM tot t LEFT JOIN keptagg k USING (doc_id)
    ORDER BY doc_id
    """,
    doc="C4-style boilerplate passage removal: split every document into "
    f"non-overlapping {PASSAGE_W}-token passages, count each distinct "
    "passage's document frequency corpus-wide, cut passages appearing in "
    f"more than {MAX_DF} distinct documents, and reassemble the cleaned "
    "text in original passage order. All JVM built-ins (posexplode / "
    "array_sort(collect_list) — no Python). 100 TB: the passage shuffle "
    "is uniform ((doc,seg) keys); the df table holds only DISTINCT "
    "passages with map-side partial counts; the df join back is hot-keyed "
    "exactly on the boilerplate passages — the AQE skew-join split "
    "handles those few heavy keys (each joins to a single df row, so "
    "duplication cost is nil). Reassembly shuffles (doc_id) once",
    tags=("E1", "E5"),
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split(F.trim("text"), text.WS_CLASS + "+")).alias("pos", "tok")
    )
    from ..operators import materialize_once

    # segs (scan + tokenize explode + passage reassembly — the heaviest
    # stage) feeds THREE branches (dfreq, kept, tot) on different keys;
    # without a materialization point each branch re-executes it
    segs = materialize_once(
        toks.groupBy("doc_id", F.floor(F.col("pos") / PASSAGE_W).cast("int").alias("seg_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))), lambda s: s["tok"]
                ),
                " ",
            ).alias("seg")
        ),
        eager=False,
    )
    dfreq = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("df"))
    kept = segs.join(dfreq, "seg").filter(F.col("df") <= MAX_DF)
    tot = segs.groupBy("doc_id").agg(F.count("*").cast("int").alias("total_segs"))
    keptagg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_id", "seg"))), lambda s: s["seg"]
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").cast("int").alias("kept_segs"),
    )
    return (
        tot.join(keptagg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("kept_segs", F.lit(0)).alias("kept_segs"),
            "total_segs",
        )
        .orderBy("doc_id")
    )


@register(
    "q118_importance_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), bucketed AS (
        SELECT doc_id, lang,
               CAST(('0x' || substr(md5(tok), 1, 6)) AS BIGINT) % {N_BUCKETS} AS bucket
        FROM toks
    ), docb AS (
        SELECT doc_id, bucket, COUNT(*) AS cnt FROM bucketed GROUP BY doc_id, bucket
    ), per_bucket AS (
        SELECT bucket,
               COUNT(*) AS cr,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
        FROM bucketed GROUP BY bucket
    ), totals AS (
        SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM per_bucket
    ), loglr AS (
        SELECT bucket,
               CAST(ROUND(
                   ln((ct + 1.0) / (tt + {N_BUCKETS})) - ln((cr + 1.0) / (tr + {N_BUCKETS})),
                   7) AS DECIMAL(20,7)) AS llr
        FROM per_bucket CROSS JOIN totals
    )
    SELECT d.doc_id,
           CAST(CAST(SUM(CAST(d.cnt AS DECIMAL(12,0)) * l.llr) AS DECIMAL(38,7)) AS DOUBLE) AS logweight
    FROM docb d JOIN loglr l USING (bucket)
    GROUP BY d.doc_id
    ORDER BY doc_id
    """,
    doc="DSIR hashed-n-gram importance weights (arXiv:2302.03169): "
    "per-document log-likelihood ratio of the target distribution "
    "(lang='en' docs) vs the raw corpus distribution over "
    f"{N_BUCKETS} hashed unigram buckets, add-1 smoothed. The bucket "
    "hash is engine-portable seeded md5 (the q96 idiom). 100 TB shape: "
    "ONE pass builds the (doc,bucket) counts and the per-bucket "
    "raw/target counts (conditional sum — no second scan); the "
    "log-ratio table is B=64 rows, broadcast into the per-doc sum; the "
    "only transcendental is computed per bucket, rounded, and cast to "
    "DECIMAL so the data-sized sum is exact and order-independent. "
    "Resampling against these weights is q90/q93's hash-threshold idiom",
    tags=("E5", "B31"),
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import ensure_parallelism

    # md5-per-token over the exploded corpus is a heavy per-row stage that
    # must not inherit a single-split local scan (the round-10 sf1 sweep
    # measured 117.5 s with the whole tokenize+hash stage serialized on
    # one core by a one-file 6 MB scan vs 16.2 s widened, JVM startup
    # included; no-op on real multi-split tables).
    d = ensure_parallelism(load(spark, sf, "documents"))
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.trim("text"), text.WS_CLASS + "+")).alias("tok")
    )
    bucketed = toks.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("long") % N_BUCKETS
        ).alias("bucket"),
    )
    from ..operators import materialize_once

    # ONE corpus pass: aggregate to (doc, lang, bucket) counts once and
    # materialize — lang is per-doc, so this IS docb with lang attached,
    # and per_bucket folds from these partials instead of re-scanning.
    # (The previous shape re-executed the scan+tokenize+md5 THREE times:
    # docb, and per_bucket's subtree once each for totals and loglr.)
    g = materialize_once(
        bucketed.groupBy("doc_id", "lang", "bucket").agg(F.count("*").alias("cnt")),
        eager=False,
    )
    docb = g.select("doc_id", "bucket", "cnt")
    per_bucket = materialize_once(
        g.groupBy("bucket").agg(
            F.sum("cnt").alias("cr"),
            F.sum(F.when(F.col("lang") == "en", F.col("cnt")).otherwise(0)).alias("ct"),
        ),
        eager=False,
    )
    totals = per_bucket.agg(F.sum("cr").alias("tr"), F.sum("ct").alias("tt"))
    loglr = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("ct") + 1.0) / (F.col("tt") + N_BUCKETS))
            - F.log((F.col("cr") + 1.0) / (F.col("tr") + N_BUCKETS)),
            7,
        )
        .cast("decimal(20,7)")
        .alias("llr"),
    )
    return (
        docb.join(F.broadcast(loglr), "bucket")
        .groupBy("doc_id")
        # cnt is narrowed to DECIMAL(12,0) so the product's precision
        # (12+20+1=33) fits DECIMAL(38,7) without Spark's precision-loss
        # scale truncation — keeps the data-sized sum exact at scale 7.
        .agg(
            F.sum(F.col("cnt").cast("decimal(12,0)") * F.col("llr"))
            .cast("decimal(38,7)")
            .cast("double")
            .alias("logweight")
        )
        .orderBy("doc_id")
    )


#: q124 per-language gate percentile: documents below their LANGUAGE's p25
#: verbosity score are cut (a global cutoff would miscalibrate across
#: languages whose score distributions differ — zh's chars/token baseline is
#: nothing like de's).
GATE_Q = 0.25


@register(
    "q124_adaptive_quality_gate",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               CAST(n_chars AS DOUBLE)
                 / NULLIF(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                          t -> t != '')), 0) AS score
        FROM documents
    ), thr AS (
        SELECT lang, quantile_disc(score, {GATE_Q}) AS thr FROM feat GROUP BY lang
    )
    SELECT f.doc_id, f.lang,
           ROUND(f.score, 6) AS score_r,
           ROUND(t.thr, 6) AS lang_thr
    FROM feat f JOIN thr t USING (lang)
    WHERE f.score >= t.thr
    ORDER BY doc_id
    """,
    doc="adaptive per-language quality gate: score every document by "
    "chars-per-token (verbosity), compute each language's p25 score with "
    "an exact percentile_disc (a DATA value — no interpolation, no float "
    "boundary), and keep documents at or above their OWN language's "
    "threshold. Fixed global cutoffs over-prune terse scripts and "
    "under-prune verbose ones; gating within-language calibrates the "
    "knife. 100 TB: the threshold table is |languages| rows — one "
    "per-lang sorted-agg percentile, broadcast back; the gate itself is "
    "a narrow filter. Unbounded-cardinality group keys would swap the "
    "exact percentile for approx_percentile (q32's sketch)",
    tags=("E5", "B11", "B31"),
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import materialize_once

    d = load(spark, sf, "documents")
    tc = text.token_count(F.col("text"))
    # empty/whitespace-only docs (0 tokens) get a NULL score and fall out of
    # the >= gate — a bare division would raise DIVIDE_BY_ZERO under ANSI
    # while the oracle's NULLIF silently dropped the row (divergence+crash)
    feat = d.select(
        "doc_id",
        "lang",
        F.when(tc > 0, F.col("n_chars").cast("double") / tc).alias("score"),
    )
    # feat feeds both the threshold aggregate and the gate probe side —
    # materialized so the corpus tokenize runs once, not twice
    feat = materialize_once(feat, eager=False)
    thr = feat.groupBy("lang").agg(
        F.expr(f"percentile_disc({GATE_Q}) WITHIN GROUP (ORDER BY score)").alias("thr")
    )
    return (
        feat.join(F.broadcast(thr), "lang")
        .filter(F.col("score") >= F.col("thr"))
        .select(
            "doc_id",
            "lang",
            F.round("score", 6).alias("score_r"),
            F.round("thr", 6).alias("lang_thr"),
        )
        .orderBy("doc_id")
    )


#: q121 head gate: tokens with corpus frequency below this are excluded from
#: the Zipf fit (the rank-frequency head is where the power law lives, and
#: the gate is what bounds the ranked set at scale: <= total_tokens/MINFREQ
#: entries survive regardless of vocabulary size).
MIN_FREQ = 5


@register(
    "q121_zipf_slope",
    oracle=f"""
    WITH toks AS (
        SELECT lang, UNNEST(string_split_regex(trim(text), '\\s+')) AS tok
        FROM documents
    ), freq AS (
        SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok
        HAVING COUNT(*) >= {MIN_FREQ}
    ), ranked AS (
        SELECT lang, c,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, tok) AS rnk
        FROM freq
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_head,
           ROUND(regr_slope(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 5) AS zipf_slope,
           ROUND(regr_r2(ln(CAST(c AS DOUBLE)), ln(CAST(rnk AS DOUBLE))), 5) AS fit_r2
    FROM ranked GROUP BY lang ORDER BY lang
    """,
    doc="Zipf rank-frequency audit per language: least-squares slope of "
    "ln(freq) on ln(rank) over the frequency head (corpus health check — "
    "natural text sits near slope -1; a drifting slope flags templated or "
    "degenerate scrape batches). 100 TB: the token count is ONE uniform "
    f"(lang,tok) shuffle with map-side partials; the >= {MIN_FREQ} head "
    "gate bounds the ranked set at total_tokens/min_freq rows BEFORE the "
    "per-lang ranking window, so the window never sees the vocabulary "
    "tail; the regression itself is an algebraic aggregate (one pass, "
    "rounded to absorb co-moment merge-order ulps, same rule as q106)",
    tags=("E5", "B15", "B24"),
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf, "documents")
    toks = d.select("lang", F.explode(F.split(F.trim("text"), text.WS_CLASS + "+")).alias("tok"))
    freq = (
        toks.groupBy("lang", "tok")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= MIN_FREQ)
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), "tok")
    ranked = freq.withColumn("rnk", F.row_number().over(w))
    ln_c = F.log(F.col("c").cast("double"))
    ln_r = F.log(F.col("rnk").cast("double"))
    return (
        ranked.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_head"),
            F.round(F.regr_slope(ln_c, ln_r), 5).alias("zipf_slope"),
            F.round(F.regr_r2(ln_c, ln_r), 5).alias("fit_r2"),
        )
        .orderBy("lang")
    )


@register(
    "q122_quality_calibration",
    oracle="""
    WITH feat AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
                 / len(string_split_regex(lower(trim(text)), '\\s+')) AS uniq_ratio
        FROM documents
    )
    SELECT doc_id, source,
           ROUND(uniq_ratio, 6) AS uniq_ratio_r,
           ROUND(PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY uniq_ratio NULLS LAST), 6) AS pct_in_source
    FROM feat
    ORDER BY doc_id
    """,
    doc="per-source quality-score calibration: map each document's "
    "unique-token ratio (the Gopher-style repetition signal, q89's "
    "numerator) to its percent_rank WITHIN its source, making quality "
    "thresholds comparable across sources whose raw score distributions "
    "differ (a fixed global cutoff over-prunes verbose sources and "
    "under-prunes templated ones). Ties share a percent_rank (peer-group "
    "semantics) so the result is deterministic without a tiebreak. 100 TB: "
    "the ratio is a narrow per-row expression; the window partitions by "
    "source — with FEW mega-sources, swap the exact percent_rank for the "
    "distributed percentile-cutpoint bucketing in `operators/ntile.py` "
    "(same recipe that replaced the global NTILE), trading exact ranks "
    "for epsilon-quantile bins",
    tags=("E5", "B15"),
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf, "documents")
    arr = F.split(F.lower(F.trim("text")), text.WS_CLASS + "+")
    feat = d.select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(arr)).cast("double") / F.size(arr)
        ).alias("uniq_ratio"),
    )
    # NULLS LAST pinned on both sides (Spark default NULLS FIRST vs
    # DuckDB NULLS LAST): a NULL-text doc has a NULL ratio and would
    # otherwise shift every percent_rank in its source between engines
    w = Window.partitionBy("source").orderBy(F.asc_nulls_last("uniq_ratio"))
    return (
        feat.select(
            "doc_id",
            "source",
            F.round("uniq_ratio", 6).alias("uniq_ratio_r"),
            F.round(F.percent_rank().over(w), 6).alias("pct_in_source"),
        )
        .orderBy("doc_id")
    )

"""Text-retrieval tier (round-5 additions): exact set-similarity join,
BM25 ranked retrieval, rank fusion, and boolean retrieval.

The dedup tier answers "which documents are near-duplicates" with
approximate methods (MinHash q47, SimHash q48, SemDeDup q99); this tier
adds the EXACT retrieval primitives a corpus platform needs next:

- q123: the exact all-pairs similarity join (prefix filtering, AllPairs/
  PPJoin family) — guaranteed-complete near-dup pairs at a Jaccard
  threshold, the ground-truth generator the approximate tiers are
  calibrated against;
- q125: BM25 ranked retrieval over the corpus for a fixed query — the
  canonical lexical scorer (Robertson/Spärck Jones probabilistic relevance
  framework), built on the same df/tf statistics as the q114 inverted
  index;
- q130: reciprocal-rank fusion of heterogeneous rankings (rank-only, so no
  score calibration is needed);
- q135: boolean AND/NOT retrieval — the posting-list merge primitive.

All carry full DuckDB hash oracles. Float discipline: q125's only
transcendental (``ln`` in idf) is computed once per QUERY TERM, rounded to
7 decimals; each per-(doc,term) contribution is rounded and cast to
DECIMAL before the per-document sum, so the data-sized arithmetic is
order-independent in both engines (the q118 recipe).

Reference parity note: f-squirrel/mrcond is a CDC connector with no batch
surface (SURVEY §1); this module belongs to the mandated north-star
extension, same as queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..operators import dedup, text
from ..operators.setsim import prefix_setsim_join
from . import register


def _sql_in(terms):
    # explicit IN-list rendering: repr of a 1-tuple would emit a trailing
    # comma that only some SQL parsers tolerate; embedded single quotes are
    # doubled so a future apostrophe-bearing term can't break the oracle SQL
    return "(" + ", ".join("'" + t.replace("'", "''") + "'" for t in terms) + ")"

#: q123 shingle width and Jaccard threshold (rational: gates stay integer).
#: 3/4 is the near-dup regime; measured at sf0.1 it generates 4.4x fewer
#: candidate pairs than 1/2 (70,731 vs 309,803) while the true-pair set is
#: identical (the planted near-dups sit at J ~= 1).
SHINGLE_N = 3
T_NUM, T_DEN = 3, 4

#: q125 query terms (mixed document frequency: one rare, two common) and the
#: standard BM25 free parameters
BM25_TERMS = ("dup", "spark", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


@register(
    "q123_setsim_join",
    oracle=f"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(0, greatest(len(toks) - {SHINGLE_N}, 0) + 1),
            i -> array_to_string(toks[i+1:i+{SHINGLE_N}], ' ')))) AS g
        FROM toked
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           CAST(p.inter AS BIGINT) AS inter,
           CAST(sa.sz AS BIGINT) AS sz_a,
           CAST(sb.sz AS BIGINT) AS sz_b,
           ROUND(CAST(p.inter AS DOUBLE)
                 / CAST(sa.sz + sb.sz - p.inter AS DOUBLE), 6) AS jaccard
    FROM pairs p
    JOIN sz sa ON p.id_a = sa.doc_id
    JOIN sz sb ON p.id_b = sb.doc_id
    WHERE {T_DEN} * p.inter >= {T_NUM} * (sa.sz + sb.sz - p.inter)
    ORDER BY id_a, id_b
    """,
    doc="EXACT all-pairs set-similarity self-join at Jaccard >= "
    f"{T_NUM}/{T_DEN} over {SHINGLE_N}-gram shingle sets "
    "(`operators/setsim.prefix_setsim_join`, AllPairs/PPJoin prefix "
    "filtering) — complete ground truth where MinHash/SimHash are "
    "probabilistic. The oracle goes all-pairs (fine at sf0.01); the Spark "
    "plan never does: candidates come from an equi-join on frequency-"
    "ordered PREFIX shingles only (recall exactly 1 by the prefix-length "
    "theorem; hot boilerplate grams sort last and never enter a prefix, "
    "capping the join-key skew by construction), then one exact JVM "
    "array_intersect verify per candidate. Every gate is integer "
    "arithmetic — no float threshold ambiguity anywhere",
    tags=("E2", "B26"),
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import materialize_once

    # NO ensure_parallelism here (round-11 measured): widening the scan to
    # 32 partitions before the eager shingle checkpoint regressed q123's
    # sf1 spark wall from ~44 s to 310.6 s (and q144's 85 -> 177 s) — the
    # setsim pipeline's own shuffles set downstream width, and the fat
    # checkpointed arrays appear to run better as few large tasks. The
    # guard pays only where the UDF stage itself dominates AND downstream
    # work re-shuffles thin rows (q88/q118) — measure before applying.
    d = load(spark, sf, "documents")
    # The shingle arrays feed FOUR plan branches (frequency count, ordered
    # assembly, and both verify sides); one evaluation + stored blocks beats
    # four UDF passes here (measured 11.7 s -> ~6 s at sf0.1) — unlike the
    # single-consumer shingle stages the repo's recompute rule covers.
    sets = materialize_once(
        d.select(
            "doc_id",
            dedup.shingle_udf(SHINGLE_N, drop_empty=True)(F.col("text")).alias("sh"),
        )
    )
    out = prefix_setsim_join(sets, id_col="doc_id", set_col="sh", t_num=T_NUM, t_den=T_DEN)
    return out.orderBy("id_a", "id_b")


@register(
    "q125_bm25_topk",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  t -> t != '')) AS tok
        FROM documents
    ), dl AS (
        SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id
    ), corpus AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
        FROM dl
    ), tf AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks
        WHERE tok IN {_sql_in(BM25_TERMS)} GROUP BY doc_id, tok
    ), dfq AS (
        SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks
        WHERE tok IN {_sql_in(BM25_TERMS)} GROUP BY tok
    ), idf AS (
        SELECT tok,
               ROUND(ln(1 + ((c.n_docs - df) + 0.5) / (df + 0.5)), 7) AS idf
        FROM dfq CROSS JOIN corpus c
    ), contrib AS (
        SELECT t.doc_id,
               CAST(ROUND(
                   (i.idf * (t.tf * {BM25_K1 + 1}))
                   / (t.tf + {BM25_K1} * ({1.0 - BM25_B} + ({BM25_B} * CAST(d.dl AS DOUBLE)) / c.avgdl)),
               7) AS DECIMAL(20,7)) AS c7
        FROM tf t
        JOIN idf i USING (tok)
        JOIN dl d USING (doc_id)
        CROSS JOIN corpus c
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(CAST(SUM(c7) AS DECIMAL(38,7)) AS DOUBLE) AS score
    FROM contrib GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
    """,
    doc=f"BM25 top-{BM25_TOPK} retrieval for the fixed query "
    f"{BM25_TERMS!r} (k1={BM25_K1}, b={BM25_B}): the canonical lexical "
    "ranker, sharing its df/tf statistics with the q114 inverted index. "
    "100 TB shape: ONE token shuffle feeds doc-length, per-term tf, and "
    "per-term df; the idf table is |query| rows and the corpus scalars "
    "(N, avgdl) one row — both broadcast into the per-doc scoring join, "
    "which shuffles only the docs containing a query term (an IN-list "
    "pushdown-able gate). The ln idf is rounded per TERM, each (doc,term) "
    "contribution rounded to 7 dp and decimal-summed, so the score is "
    "bit-stable; top-k has a total (score DESC, doc_id) tiebreak",
    tags=("E5", "B18"),
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    tk = d.select("doc_id", F.explode(text.tokens(F.col("text"))).alias("tok"))
    dl = tk.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    matches = tk.filter(F.col("tok").isin(*BM25_TERMS))
    tf = matches.groupBy("doc_id", "tok").agg(F.count("*").cast("double").alias("tf"))
    # df re-aggregates the (doc, term) tf rows — one row per matching doc —
    # instead of re-scanning the token stream with a countDistinct
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = dfq.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.round(
            F.log(
                F.lit(1)
                + ((F.col("n_docs") - F.col("df")) + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ),
            7,
        ).alias("idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.round(
                (F.col("idf") * (F.col("tf") * F.lit(BM25_K1 + 1)))
                / (
                    F.col("tf")
                    + F.lit(BM25_K1)
                    * (
                        F.lit(1.0 - BM25_B)
                        + (F.lit(BM25_B) * F.col("dl").cast("double")) / F.col("avgdl")
                    )
                ),
                7,
            )
            .cast("decimal(20,7)")
            .alias("c7"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_terms"),
            F.sum("c7").cast("decimal(38,7)").cast("double").alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(BM25_TOPK)
    )


#: q130 RRF constant (the standard k=60 from Cormack/Clarke/Buettcher) and
#: per-language result depth
RRF_K = 60
RRF_TOPN = 5


@register(
    "q130_rrf_fusion",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang, n_chars,
               CAST(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))) AS DOUBLE)
                 / len(string_split_regex(lower(trim(text)), '\\s+')) AS uniq_ratio
        FROM documents
    ), ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY uniq_ratio DESC, doc_id) AS r_q,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS r_l
        FROM feat
    ), fused AS (
        SELECT doc_id, lang, r_q, r_l,
               1.0 / ({RRF_K} + r_q) + 1.0 / ({RRF_K} + r_l) AS rrf
        FROM ranked
    )
    SELECT lang, doc_id,
           CAST(r_q AS BIGINT) AS r_q,
           CAST(r_l AS BIGINT) AS r_l,
           ROUND(rrf, 6) AS rrf6
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY rrf DESC, doc_id) AS rn
        FROM fused
    ) WHERE rn <= {RRF_TOPN}
    ORDER BY lang, doc_id
    """,
    doc=f"reciprocal-rank fusion (k={RRF_K}) of two per-language document "
    "rankings — unique-token quality and raw length — keeping each "
    f"language's top {RRF_TOPN}: the standard way to merge heterogeneous "
    "retrieval signals (BM25 q125, cosine q41) without score calibration, "
    "because only RANKS enter the formula. Every window partitions by "
    "lang (no global single-reducer ranking — the corpus-wide plan guard "
    "forbids it); the fused score is a fixed two-term double expression "
    "(not an aggregation), so it is bit-identical across engines and the "
    "final top-N has a total (rrf DESC, doc_id) tiebreak",
    tags=("B15", "B18", "E5"),
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf, "documents")
    arr = F.split(F.lower(F.trim("text")), text.WS_CLASS + "+")
    feat = d.select(
        "doc_id",
        "lang",
        "n_chars",
        (F.size(F.array_distinct(arr)).cast("double") / F.size(arr)).alias("uniq_ratio"),
    )
    wq = Window.partitionBy("lang").orderBy(F.desc("uniq_ratio"), "doc_id")
    wl = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    ranked = feat.select(
        "doc_id",
        "lang",
        F.row_number().over(wq).alias("r_q"),
        F.row_number().over(wl).alias("r_l"),
    )
    fused = ranked.withColumn(
        "rrf",
        F.lit(1.0) / (F.lit(RRF_K) + F.col("r_q")) + F.lit(1.0) / (F.lit(RRF_K) + F.col("r_l")),
    )
    wr = Window.partitionBy("lang").orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= RRF_TOPN)
        .select(
            "lang",
            "doc_id",
            F.col("r_q").cast("bigint").alias("r_q"),
            F.col("r_l").cast("bigint").alias("r_l"),
            F.round("rrf", 6).alias("rrf6"),
        )
        .orderBy("lang", "doc_id")
    )


#: q135 boolean query: documents containing ALL of MUST and NONE of MUST_NOT
BOOL_MUST = ("spark", "window")
BOOL_MUST_NOT = ("dup",)


@register(
    "q135_boolean_retrieval",
    oracle=f"""
    WITH toks AS (
        SELECT DISTINCT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  t -> t != '')) AS tok
        FROM documents
    ), hits AS (
        SELECT doc_id,
               COUNT(DISTINCT CASE WHEN tok IN {_sql_in(BOOL_MUST)} THEN tok END) AS n_must,
               MAX(CASE WHEN tok IN {_sql_in(BOOL_MUST_NOT)} THEN 1 ELSE 0 END) AS has_neg
        FROM toks
        WHERE tok IN {_sql_in(BOOL_MUST + BOOL_MUST_NOT)}
        GROUP BY doc_id
    )
    SELECT h.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars
    FROM hits h JOIN documents d USING (doc_id)
    WHERE h.n_must = {len(BOOL_MUST)} AND h.has_neg = 0
    ORDER BY doc_id
    """,
    doc=f"boolean retrieval: documents matching ALL of {BOOL_MUST!r} and "
    f"NONE of {BOOL_MUST_NOT!r} — the posting-list AND/NOT primitive "
    "under every search engine, sharing the q114/q125 token statistics. "
    "The IN-list gate prunes the token stream BEFORE the aggregate (at "
    "100 TB with a real inverted index this is a posting-list merge; "
    "here it is one (doc)-keyed aggregate over only the query terms' "
    "postings — map-side partials, then a join back for display "
    "columns). MUST is counted DISTINCT so repeated terms cannot fake "
    "coverage; MUST_NOT is a flag max, turning the exclusion into part "
    "of the same single pass instead of a second anti join",
    tags=("E5", "B6", "B7"),
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    d = load(spark, sf, "documents")
    all_terms = BOOL_MUST + BOOL_MUST_NOT
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(text.tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok").isin(*all_terms))
    hits = toks.groupBy("doc_id").agg(
        F.countDistinct(
            F.when(F.col("tok").isin(*BOOL_MUST), F.col("tok"))
        ).alias("n_must"),
        F.max(
            F.when(F.col("tok").isin(*BOOL_MUST_NOT), F.lit(1)).otherwise(F.lit(0))
        ).alias("has_neg"),
    )
    return (
        hits.filter((F.col("n_must") == len(BOOL_MUST)) & (F.col("has_neg") == 0))
        .join(d.select("doc_id", "lang", "n_chars"), "doc_id")
        .select("doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars"))
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# q144 — exact containment join (verbatim-inclusion / subsumption dedup)
# --------------------------------------------------------------------------
@register(
    "q144_containment_join",
    oracle=f"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t != '') AS toks
        FROM documents
    ), sh AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
            range(0, greatest(len(toks) - {SHINGLE_N}, 0) + 1),
            i -> array_to_string(toks[i+1:i+{SHINGLE_N}], ' ')))) AS g
        FROM toked
    ), sz AS (
        SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id != b.doc_id
        GROUP BY 1, 2
    )
    SELECT p.id_a, p.id_b,
           CAST(p.inter AS BIGINT) AS inter,
           CAST(sa.sz AS BIGINT) AS sz_a,
           CAST(sb.sz AS BIGINT) AS sz_b,
           ROUND(CAST(p.inter AS DOUBLE) / CAST(sa.sz AS DOUBLE), 6)
               AS containment
    FROM pairs p
    JOIN sz sa ON p.id_a = sa.doc_id
    JOIN sz sb ON p.id_b = sb.doc_id
    WHERE {T_DEN} * p.inter >= {T_NUM} * sa.sz
    ORDER BY id_a, id_b
    """,
    doc="EXACT containment self-join at |A∩B|/|A| >= "
    f"{T_NUM}/{T_DEN} over {SHINGLE_N}-gram shingle sets "
    "(`operators/setsim.prefix_containment_join`) — the ASYMMETRIC "
    "complement to q123: Jaccard misses subset relationships (a passage "
    "quoted inside a much longer document scores low Jaccard but "
    "containment ~1), and verbatim inclusion is exactly the signal "
    "training-corpus dedup needs for boilerplate subsumption. Ordered "
    "pairs, directed gate on the CONTAINED side's size. The oracle goes "
    "all-shared-gram pairs (fine at sf0.01); the Spark plan posts "
    "rare-first PREFIX elements on the probe side only (containment form "
    "of the prefix theorem — recall exactly 1), so the index side's hot "
    "boilerplate grams match almost no probes. Integer gates throughout",
    tags=("E2", "B26"),
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import materialize_once
    from ..operators.setsim import prefix_containment_join

    # no ensure_parallelism — same measured regression as q123 (85 -> 177 s)
    d = load(spark, sf, "documents")
    # same four-consumer shingle reuse rationale as q123
    sets = materialize_once(
        d.select(
            "doc_id",
            dedup.shingle_udf(SHINGLE_N, drop_empty=True)(F.col("text")).alias("sh"),
        )
    )
    out = prefix_containment_join(
        sets, id_col="doc_id", set_col="sh", t_num=T_NUM, t_den=T_DEN
    )
    return out.orderBy("id_a", "id_b")

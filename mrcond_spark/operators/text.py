"""Text-analysis operators for training-data curation (SURVEY §2.4 E5).

All expressions are JVM built-ins (split/regexp/aggregate) — no Python in the
hot path; they compose into select()/groupBy() pipelines that scale linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
}

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

#: the engine's whitespace class, spelled EXPLICITLY instead of ``\s``:
#: Java regex ``\s`` is ``[ \t\n\x0B\f\r]`` while RE2 (DuckDB) ``\s`` is
#: ``[ \t\n\f\r]`` — they disagree on VERTICAL TAB, so a ``\x0B`` in any
#: document silently diverges every token count / split / normalization
#: between the Spark side and its oracle. The 43 oracle strings keep RE2
#: ``\s``; every Spark-side (Java/Python) regex uses this class, which
#: matches RE2's set exactly in all three engines. (Python ``re`` ``\s``
#: is worse still — Unicode-aware — another reason to spell it out.)
WS_CLASS = "[ \\t\\n\\f\\r]"


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties removed (``WS_CLASS`` split —
    RE2-identical, see the constant's note)."""
    return F.filter(F.split(F.lower(F.trim(col)), WS_CLASS + "+"), lambda t: t != "")


def tokens_null_safe(col: Column) -> Column:
    """``tokens`` with NULL text treated as empty (-> empty token array).

    The oracle-side mirror is ``string_split_regex(lower(trim(coalesce(x,
    ''))), '\\s+')`` + empty filter. Queries whose downstream can't absorb a
    NULL array (set-similarity joins, SNM blocking keys, span extraction)
    use this variant so the tokenization contract lives in ONE audited spot
    rather than inline copies that can drift from their oracles.
    """
    return tokens(F.coalesce(col, F.lit("")))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


#: BPE-pre-tokenizer-ish lexeme pattern: alphanumeric runs or punctuation runs
#: (whitespace delimits). RE2-compatible AND engine-identical: the whitespace
#: set is spelled explicitly (``\s`` differs between Java and RE2 on \x0B —
#: see WS_CLASS), and the oracle embeds this exact string, so both engines
#: run the same pattern by construction.
BPE_ISH_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\f\r]+"


def bpe_ish_tokens(col: Column) -> Column:
    """Sub-word-ish lexemes the way a BPE pre-tokenizer chunks text before
    merges: maximal alphanumeric runs and punctuation runs."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-pre-tokenizer-ish lexemes (see ``bpe_ish_tokens``)."""
    return F.size(bpe_ish_tokens(col))


def lang_id_heuristic(col: Column) -> Column:
    """Marker-word vote language ID: argmax over per-language stopword hits."""
    toks = tokens(col)
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))))
        for lang, markers in _LANG_MARKERS.items()
    ]
    best = F.greatest(*[s for _, s in scores])
    out = F.lit("unknown")
    # first language reaching the max wins (deterministic order)
    for lang, s in reversed(scores):
        out = F.when(s == best, F.lit(lang)).otherwise(out) if lang != "unknown" else out
    return F.when(best <= 0, F.lit("unknown")).otherwise(out)


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features, integer-exact
    where used for oracle checks (ratios in basis points via integer math)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    # [^\w + WS_CLASS]: the oracle's RE2 '[^\w\s]' — \w agrees between the
    # engines ([0-9A-Za-z_]); \s does not (\x0B), hence the explicit class
    n_punct = (n_chars - F.length(F.regexp_replace(t, "[^\\w \\t\\n\\f\\r]", ""))).cast("bigint")
    n_stop = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, x: acc
        + F.when(x.isin(*_EN_STOPWORDS), F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint")),
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        n_punct.alias("q_punct"),
        n_stop.alias("q_stopwords"),
        F.floor(n_punct * 10000 / F.greatest(n_chars, F.lit(1))).cast("bigint").alias("punct_bp"),
        F.floor(n_stop * 10000 / F.greatest(n_tokens, F.lit(1))).cast("bigint").alias("stop_bp"),
    )


def doc_fingerprint(col: Column, window: int = 4) -> Column:
    """Winnowing-style fingerprint: min over rolling shingle hashes — a single
    BIGINT content fingerprint robust to small edits at the margins.

    NOTE: pass a *pre-tokenized array column* through
    ``doc_fingerprint_from_tokens`` in hot paths — referencing the tokenize
    expression inside the per-shingle lambda re-evaluates it per element
    (Catalyst doesn't CSE across higher-order-function lambdas), turning the
    fingerprint O(len^2).
    """
    return doc_fingerprint_from_tokens(tokens(col), window)


def doc_fingerprint_from_tokens(
    tok_col: Column, window: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """``hash_fn="xxhash64"`` is the production default (fastest JVM path);
    ``hash_fn="md5"`` derives the 60-bit hash from md5's first 15 hex chars —
    bit-identical computable in other engines (DuckDB:
    ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)``), which is what makes the
    fingerprint cross-engine hash-checkable."""
    if hash_fn == "md5":
        from . import md5_hash60 as shingle_hash
    else:
        shingle_hash = F.xxhash64
    shingle_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tok_col) - window, F.lit(0))),
        lambda i: shingle_hash(F.concat_ws(" ", F.slice(tok_col, i + 1, window))),
    )
    return F.array_min(shingle_hashes)


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
) -> DataFrame:
    """Corpus-level collocation mining: pointwise mutual information of
    adjacent token pairs. Returns ``(w1, w2, c_pair, pmi)`` for every
    within-doc adjacent bigram occurring at least ``min_count`` times,
    with ``pmi = ln(p(w1,w2) / (p(w1) p(w2)))`` over corpus-total bigram /
    unigram distributions — the standard phrase-detection signal a
    tokenizer-training or boilerplate-mining pass computes.

    Determinism: counts are exact integers in any engine; the single
    float expression is evaluated on identical inputs with an identical
    operation tree, so results agree to the last ulp of ``ln`` — declared
    queries round to 6 dp.

    Scale shape (100 TB): ONE tokenize pass materialized (the token
    arrays feed FOUR plan branches — pair counts, unigram counts, and the
    two corpus-total scalars; unmaterialized, Catalyst re-tokenizes the
    whole corpus per branch: measured 17.4 -> 9.7 s at sf1 and ~1.7 ->
    ~1.3 s warm at sf0.1 for the checkpointed form); bigram expansion is
    narrow (JVM ``split``/``transform``); then three hash aggregates —
    bigram counts (keyed on the pair, map-side partials bound hot pairs),
    unigram counts (vocab-sized), corpus totals (scalar) — and two joins
    of the pair table against the vocab-sized unigram table on a single
    token key. The scalar totals ride a broadcast; nothing collects.
    """
    from . import materialize_once

    # NO ensure_parallelism here (round-11 checkpoint-layout sweep measured
    # and REVERTED it): the tokenize is a cheap JVM expression, so widening
    # the one-split bench scan with a round-robin repartition costs more
    # than the single-core map sides it saves (q108 interleaved median
    # 0.79 -> 1.04 s with the guard). The guard pays only where the frozen
    # stage is an expensive Python-UDF pass (ngram_novelty's shingler:
    # 2.42 -> 1.66 s with it) — measure per site, never blanket-apply.
    tok = materialize_once(
        df.select(tokens(F.col(text_col)).alias("__toks")), eager=False
    )
    toks = F.col("__toks")
    # adjacent pairs via two shifted slices (ANSI-safe: no indexed access);
    # n_adj = max(len-1, 0) makes 0- and 1-token docs yield empty pair lists
    n_adj = F.greatest(F.size(toks) - 1, F.lit(0))
    pairs = tok.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, n_adj),
                F.slice(toks, 2, n_adj),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    unigrams = tok.select(F.explode(toks).alias("w"))

    pair_counts = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_pair"))
    uni_counts = unigrams.groupBy("w").agg(F.count("*").alias("c_w"))
    n_pairs = pairs.groupBy().agg(F.count("*").alias("n_pairs"))
    n_toks = unigrams.groupBy().agg(F.count("*").alias("n_toks"))

    c1 = uni_counts.select(F.col("w").alias("w1"), F.col("c_w").alias("c_w1"))
    c2 = uni_counts.select(F.col("w").alias("w2"), F.col("c_w").alias("c_w2"))
    out = (
        pair_counts.filter(F.col("c_pair") >= min_count)
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_toks))
    )
    # identical arithmetic tree in the DuckDB oracle: (c_pair*n_toks*n_toks)
    # computed left-assoc in double, divided by (n_pairs*c_w1*c_w2)
    pmi = F.log(
        (F.col("c_pair").cast("double") * F.col("n_toks") * F.col("n_toks"))
        / (F.col("n_pairs").cast("double") * F.col("c_w1") * F.col("c_w2"))
    )
    return out.select(
        "w1", "w2", F.col("c_pair").cast("bigint").alias("c_pair"), pmi.alias("pmi")
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram novelty: the share of a doc's distinct word n-grams
    first seen in THAT doc, scanning the corpus in ``id_col`` (ingestion)
    order — the dedup-adjacent crawl metric whose collapse flags a source
    that has started re-serving old content. Returns
    ``(id_col, n_grams, n_novel, novelty_bp)`` with novelty in basis points.

    Two data-sized stages, both safe at scale: one shuffle on the gram for
    first-occurrence (map-side partial MIN bounds hot grams), and one
    gram-keyed join back — a gram is novel iff its global first occurrence
    IS this doc. Requires ``id_col`` to be unique (ties would make "first"
    ambiguous). Shingling reuses the Arrow-batched dedup shingler.

    The gram table feeds BOTH branches, so it is materialized once rather
    than re-running the Arrow shingle UDF per branch (measured A/B at
    sf0.1, warm min: recompute 1.72 s vs materialize 1.25 s — the shuffle
    survives either way; the saved work is the second UDF pass). At 100 TB
    the materialization is O(corpus tokens) executor storage — a
    production pipeline writes this stage to a table (materialize_once
    contract), which is the same decision.

    ``ensure_parallelism`` on the input is the q118/q88 single-split guard
    at another site (round-11 checkpoint-layout sweep): the sf0.1
    documents parquet reads as ONE split, so the Arrow shingle UDF — the
    operator's dominant stage — and the 26 MB gram explode ran on one
    core, and the eager checkpoint froze that layout for both consumer
    branches' map sides. This operator matches the guard's documented
    pay-off criteria exactly (UDF stage dominates; downstream re-shuffles
    thin gram rows — unlike setsim's fat-array checkpoints where the same
    guard measured 2-7x WORSE): interleaved A/B at sf0.1, median 2.42 ->
    1.66 s, hash-identical at sf0.01. No-op on multi-split inputs.
    """
    from . import ensure_parallelism, materialize_once
    from .dedup import shingle_udf

    grams = materialize_once(
        ensure_parallelism(df).select(
            F.col(id_col).alias("__id"),
            F.explode(F.array_distinct(shingle_udf(n)(F.col(text_col)))).alias("g"),
        )
    )
    firsts = grams.groupBy("g").agg(F.min("__id").alias("first_seen"))
    return (
        grams.join(firsts, "g")
        .groupBy("__id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum((F.col("first_seen") == F.col("__id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_grams",
            "n_novel",
            F.floor(10000 * F.col("n_novel") / F.col("n_grams"))
            .cast("bigint")
            .alias("novelty_bp"),
        )
    )

"""Edge-row regression pins for the NULL/empty-text latent divergences
found in the round-9 llm.py review pass.

The shipped testdata has no NULL and no zero-length ``documents.text``
(min length 44 at every SF), so the sf-based oracle suite can never
exercise these branches — each test here builds a tiny synthetic
documents.parquet containing exactly the poison rows and checks the
declared Spark query against its own DuckDB oracle on the same file:

- q85: empty text must chunk to ZERO rows (an unguarded
  ``sequence(0, -1)`` auto-steps down and emitted phantom chunks
  [0, -1]);
- q43: NULL text must land in a NULL bucket, not crash the Arrow UDF
  (``astype('int32')`` raises on the NaN that ``str.len()`` yields);
- q74: a doc_id GAP inside a same-lang stretch must break the cluster
  in BOTH engines (the oracle's run detection previously checked only
  lang, silently load-bearing on gapless ids);
- q158: a source whose docs are all empty/whitespace (src_tokens = 0)
  must yield a NULL-epochs row, not a Spark ANSI DIVIDE_BY_ZERO crash;
- q163: a NULL group key must land in 'test' in BOTH engines (DuckDB's
  concat() SKIPS NULL args where Spark's propagates — the oracle uses
  NULL-propagating ``||`` for exactly this row);
- vertical tab (\\x0B): Java regex ``\\s`` matches it, RE2 (DuckDB)
  ``\\s`` does not — the Spark side spells the whitespace class
  explicitly (text.WS_CLASS) so tokenization/normalization agree;
- non-ASCII text: Spark's levenshtein counts code points, DuckDB's
  counts BYTES — the edit-distance queries ASCII-fold heads on both
  sides so the metrics coincide.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mrcond_spark.queries import all_queries


def _write_documents(spark, path: str, rows: list[tuple]) -> None:
    df = spark.createDataFrame(
        rows, "doc_id bigint, lang string, source string, text string, n_chars int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "documents.parquet"))


def _key(row: tuple):
    # None-safe total order (None sorts first within its column)
    return tuple((v is not None, v) for v in row)


def _oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet'"
        )
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        return cols, sorted(map(tuple, res.fetchall()), key=_key)
    finally:
        con.close()


def _spark_rows(df):
    return df.columns, sorted(map(tuple, df.collect()), key=_key)


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("edge-docs"))
    rows = [
        # doc_id 0: empty text, selected by q85's doc_id % 20 == 0 gate
        (0, "en", "web", "", 0),
        # doc_id 20: NULL text, also on the q85 gate and feeding q43
        (20, "en", "web", None, 0),
        # normal rows; note the GAP at doc_id 2 inside an 'en' stretch
        (1, "en", "web", "alpha beta gamma delta " * 12, 276),
        (3, "en", "web", "epsilon zeta eta theta " * 12, 276),
        (4, "de", "web", "kappa lambda mu nu " * 10, 190),
        (5, "de", "web", "xi omicron pi rho " * 10, 190),
        (40, "fr", "web", "sigma tau upsilon phi " * 9, 198),
    ]
    _write_documents(spark, path, rows)
    return path


def test_q85_empty_and_null_text_chunk_to_zero_rows(spark, edge_dir):
    q = all_queries()["q85_doc_chunks"]
    scols, srows = _spark_rows(q.spark(spark, edge_dir))
    ocols, orows = _oracle(edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    # doc 0 (len 0) and doc 20 (NULL) are both on the %20 gate: zero chunks
    # from doc 0, zero from doc 20 (NULL length -> NULL range -> no rows);
    # doc 40 contributes normal chunks
    assert all(r[0] == 40 for r in srows)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows


def test_q43_null_text_buckets_as_null_not_crash(spark, edge_dir):
    q = all_queries()["q43_pandas_udf_hist"]
    scols, srows = _spark_rows(q.spark(spark, edge_dir))
    ocols, orows = _oracle(edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows
    assert any(r[0] is None for r in srows), "NULL text must produce a NULL bucket"


@pytest.fixture(scope="module")
def governance_edge_dir(spark, tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("edge-gov"))
    rows = [
        # a source whose every doc is empty/whitespace: src_tokens = 0
        (1, "en", "empty-src", "", 0),
        (2, "en", "empty-src", "   ", 3),
        # a NULL source (split key) with real text
        (3, "en", None, "alpha beta gamma delta " * 6, 138),
        # normal ballast
        (4, "en", "web", "epsilon zeta eta theta " * 6, 138),
        (5, "de", "news", "kappa lambda mu nu xi " * 5, 110),
    ]
    _write_documents(spark, path, rows)
    return path


def test_q158_zero_token_source_yields_null_epochs_row(spark, governance_edge_dir):
    q = all_queries()["q158_source_epochs"]
    scols, srows = _spark_rows(q.spark(spark, governance_edge_dir))
    ocols, orows = _oracle(governance_edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows
    by_src = {r[0]: r for r in srows}
    row = by_src["empty-src"]
    # src_tokens == 0 -> weight 0.0, epochs NULL (0/0), and NO crash
    assert row[scols.index("src_tokens")] == 0
    assert row[scols.index("weight")] == 0.0
    assert row[scols.index("epochs")] is None


def test_q163_null_group_key_lands_in_test_in_both_engines(spark, governance_edge_dir):
    q = all_queries()["q163_group_split"]
    scols, srows = _spark_rows(q.spark(spark, governance_edge_dir))
    ocols, orows = _oracle(governance_edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows
    splits = {r[scols.index("split")] for r in srows}
    assert "test" in splits, "the NULL-source doc must be filed under 'test'"


def test_q74_id_gap_breaks_cluster_in_both_engines(spark, edge_dir):
    q = all_queries()["q74_dedup_clusters"]
    scols, srows = _spark_rows(q.spark(spark, edge_dir))
    ocols, orows = _oracle(edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows
    reps = dict(srows)
    # doc 0 and 1 are id-adjacent same-lang -> one cluster; the GAP at
    # doc_id 2 separates the same-lang doc 3 into its own cluster
    assert reps[0] == 0 and reps[1] == 0 and reps[3] == 3
    # ids 3,4 are adjacent but different lang; 4,5 adjacent same lang
    assert reps[4] == 4 and reps[5] == 4


@pytest.fixture(scope="module")
def regex_edge_dir(spark, tmp_path_factory) -> str:
    """Docs containing a vertical tab and non-ASCII text — the two
    characters on which Java/RE2/byte-wise primitives disagree."""
    path = str(tmp_path_factory.mktemp("edge-regex"))
    rows = [
        # \x0B between words: Java \s splits here, RE2 \s does not
        (1, "en", "web", "alpha\x0bbeta gamma delta epsilon", 29),
        (2, "en", "web", "alpha beta gamma delta epsilon", 30),
        # accented head: byte-length != code-point-length
        (3, "fr", "web", "café au lait café au lait ration", 31),
        (4, "fr", "web", "cafe au lait cafe au lait rations", 33),
        (5, "de", "news", "zeta eta theta iota kappa lambda", 32),
    ]
    _write_documents(spark, path, rows)
    return path


@pytest.mark.parametrize(
    "qname",
    [
        "q142_char_entropy",      # \s char-class count
        "q141_token_kl_drift",    # shared tokenizer split
        "q61_bpe_token_stats",    # BPE pattern's whitespace member
        "q139_edit_blocking_pairs",  # levenshtein verify gate
        "q180_edit_distance_join",   # Ed-Join exact-distance verify
    ],
)
def test_regex_contract_holds_on_vtab_and_non_ascii(spark, regex_edge_dir, qname):
    q = all_queries()[qname]
    scols, srows = _spark_rows(q.spark(spark, regex_edge_dir))
    ocols, orows = _oracle(regex_edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows


@pytest.fixture(scope="module")
def setsim_edge_dir(spark, tmp_path_factory) -> str:
    """Edge whitespace + token-less docs for the set-similarity joins:
    a trailing newline must not grow a phantom gram (the pair below is a
    true Jaccard-1.0 duplicate), and NULL/empty/whitespace-only docs must
    join to NOTHING (not pair with each other at similarity 1.0)."""
    path = str(tmp_path_factory.mktemp("edge-setsim"))
    body = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "en", "web", body, len(body)),
        (2, "en", "web", body + "\n", len(body) + 1),
        (3, "en", "web", "", 0),
        (4, "en", "web", None, 0),
        (5, "en", "web", " \t ", 3),
        (6, "de", "web", "iota kappa lambda mu nu xi omicron pi rho", 41),
    ]
    _write_documents(spark, path, rows)
    return path


@pytest.mark.parametrize("qname", ["q123_setsim_join", "q144_containment_join"])
def test_setsim_edge_whitespace_and_empty_docs(spark, setsim_edge_dir, qname):
    q = all_queries()[qname]
    scols, srows = _spark_rows(q.spark(spark, setsim_edge_dir))
    ocols, orows = _oracle(setsim_edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows
    pair_ids = {(r[0], r[1]) for r in srows}
    assert (1, 2) in pair_ids, "trailing-newline twin must be found as a dup"
    for a, b in pair_ids:
        assert a not in (3, 4, 5) and b not in (3, 4, 5), (
            "token-less docs must join to nothing"
        )


def test_q122_null_text_percent_rank_pinned_nulls_last(spark, edge_dir):
    # edge_dir has a NULL-text doc (id 20): its uniq_ratio is NULL, and an
    # unpinned window order (Spark NULLS FIRST vs DuckDB NULLS LAST) would
    # shift every percent_rank in the source
    q = all_queries()["q122_quality_calibration"]
    scols, srows = _spark_rows(q.spark(spark, edge_dir))
    ocols, orows = _oracle(edge_dir, q.oracle)
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert sorted((tuple(r[i] for i in perm) for r in srows), key=_key) == orows

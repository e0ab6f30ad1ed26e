"""E7 UDF-surface queries: every Python-boundary mechanism Spark offers,
each with a deterministic DuckDB oracle (SURVEY §2.4 E7).

- q51: grouped-map ``applyInPandas`` (per-group top-k rank)
- q52: Python UDTF (table function exploding tokens with positions)
- q53: grouped-agg ``pandas_udf`` (per-group threshold count)
- q164: Arrow-native grouped map ``applyInArrow`` (per-group histogram)

All closures are self-contained (executor-safe without the package).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load
from . import register


@register(
    "q51_applyinpandas_topk",
    oracle="""
    SELECT o_orderpriority, o_orderkey, rn
    FROM (
      SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 5
    ORDER BY o_orderpriority, rn
    """,
    doc="grouped-map applyInPandas: per-priority top-5 orders by price "
    "(integer output -> hash-oracle safe; mechanism test for E7)",
    tags=("E7",),
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(5)
        return pd.DataFrame(
            {
                "o_orderpriority": s["o_orderpriority"],
                "o_orderkey": s["o_orderkey"],
                "rn": range(1, len(s) + 1),
            }
        )

    o = load(spark, sf, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .applyInPandas(topk, schema="o_orderpriority STRING, o_orderkey LONG, rn INT")
        .orderBy("o_orderpriority", "rn")
    )


@register(
    "q52_udtf_tokens",
    oracle="""
    SELECT r_regionkey, CAST(i AS INT) AS pos, lower(string_split(r_name, ' ')[i]) AS token
    FROM region, (SELECT UNNEST(range(1, 9)) AS i)
    WHERE i <= len(string_split(r_name, ' '))
    ORDER BY r_regionkey, pos
    """,
    doc="Python UDTF: one output row per (position, token) of each region "
    "name — the lateral table-function mechanism (E7)",
    tags=("E7",),
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, token STRING")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i + 1, tok.lower()

    spark.udtf.register("q52_tokenize", Tokenize)
    load(spark, sf, "region").createOrReplaceTempView("q52_region")
    return spark.sql(
        """
        SELECT r_regionkey, t.pos, t.token
        FROM q52_region, LATERAL q52_tokenize(r_name) AS t
        ORDER BY r_regionkey, t.pos
        """
    )


@register(
    "q53_grouped_agg_udf",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="grouped-agg pandas_udf: per-type count of high-value events (E7)",
    tags=("E7",),
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    @pandas_udf("long")
    def n_high(v: pd.Series) -> int:
        return int((v > 50).sum())

    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(n_high(F.col("value")).alias("n_high"))
        .orderBy("event_type")
    )


@register(
    "q164_arrow_grouped_hist",
    oracle="""
    SELECT l_returnflag,
           CAST((CAST(l_quantity AS INT) - 1) // 10 AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag, CAST((CAST(l_quantity AS INT) - 1) // 10 AS INT)
    ORDER BY l_returnflag, bin
    """,
    doc="grouped-map applyInArrow: per-returnflag quantity histogram "
    "(fixed width-10 bins over the integer 1..50 domain) computed "
    "Arrow-NATIVE — batches stay pyarrow Tables end to end, numpy "
    "bincount on zero-copy buffers, no pandas materialization (the "
    "newest and cheapest grouped-map mechanism, completing the E7 "
    "surface next to q51's applyInPandas). Self-contained closure; "
    "integer output -> hash-oracle safe. 100 TB: identical shuffle "
    "shape to any grouped map — one exchange on the group key, Arrow "
    "IPC both ways; prefer this over applyInPandas whenever the "
    "per-group logic is array arithmetic",
    tags=("E7",),
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    def hist(table):  # pyarrow.Table -> pyarrow.Table
        import numpy as np
        import pyarrow as pa

        flag = table.column("l_returnflag")[0].as_py()
        q = table.column("l_quantity").to_numpy(zero_copy_only=False)
        bins = ((q.astype(np.int64) - 1) // 10).astype(np.int64)
        counts = np.bincount(bins, minlength=5)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "l_returnflag": pa.array([flag] * len(nz), pa.string()),
                "bin": pa.array(nz.astype(np.int32), pa.int32()),
                "n": pa.array(counts[nz], pa.int64()),
            }
        )

    li = load(spark, sf, "lineitem").select("l_returnflag", "l_quantity")
    return (
        li.groupBy("l_returnflag")
        .applyInArrow(hist, schema="l_returnflag STRING, bin INT, n BIGINT")
        .orderBy("l_returnflag", "bin")
    )

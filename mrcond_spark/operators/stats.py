"""Cross-engine-exact moment statistics (mean / stddev per key).

The standardization half of q115 and the streaming anomaly gate share this
definition. Moments are computed from SUM(value) and SUM(value^2) with
per-term ``DECIMAL`` casts — exact, order-independent sums — then combined
in double with a fixed operation tree, so ``mu`` and ``sd`` are
bit-identical in Spark and the DuckDB oracle (no Welford merge-order
drift). One partial->final hash aggregate; the output is |keys|-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def moment_stats(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Per-key ``(n, mu, sd)`` with sample (n-1) standard deviation.

    Keys with a single row get ``sd = NaN`` via an explicit ``n > 1``
    branch (a bare ``/(n-1)`` would raise DIVIDE_BY_ZERO under Spark's
    default ANSI mode instead of producing the documented NaN — the whole
    training job would die on one rare key); keys with zero spread get
    ``sd = 0``. Callers joining this back for z-scores should treat both
    as "no standardization possible".
    """
    s = df.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(28,12)")).cast("double").alias("__s1"),
        F.sum((F.col(value_col) * F.col(value_col)).cast("decimal(38,18)"))
        .cast("double")
        .alias("__s2"),
    )
    mu = F.col("__s1") / F.col("n")
    var = F.when(
        F.col("n") > 1,
        (F.col("__s2") - F.col("n") * mu * mu) / (F.col("n") - F.lit(1.0)),
    ).otherwise(F.lit(float("nan")))
    return s.select(*key_cols, "n", mu.alias("mu"), F.sqrt(var).alias("sd"))

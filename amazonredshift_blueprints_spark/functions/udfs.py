"""Vectorized Python UDF surface: pandas_udf + grouped applyInPandas.

Reference basis: Redshift exposes Python UDFs/UDAFs that users could call
from SQL passed through the reference's hand-off sites
(store_query_results.py:103, execute_sql.py:77); the reference itself
defines none. Spark's equivalents are the Arrow-batched pandas UDF
(scalar) and ``applyInPandas`` (grouped aggregate / map), which are the
ONLY sanctioned Python hot paths in this engine: Arrow batch transfer
beats row-at-a-time Python UDFs by 10-100× and keeps executor memory
bounded by the batch size.

Determinism contract (same rules as operators/similarity.py): float
reductions happen over 1e-6-quantized int64 values — numpy's pairwise
float summation and SQL engines' sequential summation would otherwise
disagree in the last ulp and flip the driver's value hashes.

100 TB notes: both operators are narrow per-partition work after at most
one shuffle (the groupBy key for applyInPandas). State per Python worker
is one Arrow batch (scalar) or one group (grouped) — bound group sizes
or pre-aggregate when a key can be huge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

QUANT = 1_000_000


@F.pandas_udf(DoubleType())
def vector_norm_q(embeddings: pd.Series) -> pd.Series:
    """L2 norm of an array<float> column, quantized-exact (scalar pandas UDF).

    Per value: q = round(x_f64 * 1e6) as int64; norm = sqrt(sum(q*q)).
    The integer sum is exact, so the one sqrt is the only float op —
    bit-identical across engines and partition orders.
    """

    def norm(vec) -> float:
        q = np.round(np.asarray(vec, dtype=np.float64) * QUANT).astype(np.int64)
        return float(np.sqrt(float(np.dot(q, q))))

    return embeddings.map(norm)


def embedding_norms(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, l2_norm_q) via the vectorized scalar UDF."""
    return df.select(F.col(id_col), vector_norm_q(F.col(vec_col)).alias("l2_norm_q"))


USER_STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value_q", LongType()),
        StructField("mean_value", DoubleType()),
    ]
)


def user_event_stats(events: DataFrame, *, user_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-user stats via grouped ``applyInPandas`` (the UDAF surface).

    One shuffle on the group key; each group is handed to Python as one
    pandas DataFrame. Sum runs over 1e-6-quantized int64 (exact); the
    mean is a single double division of exact integers.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        q = np.round(pdf[value_col].to_numpy(dtype=np.float64) * QUANT).astype(np.int64)
        n = len(q)
        s = int(q.sum())
        return pd.DataFrame(
            {
                "user_id": [int(pdf[user_col].iloc[0])],
                "n_events": [n],
                "sum_value_q": [s],
                "mean_value": [(s / QUANT) / n],
            }
        )

    return events.select(user_col, value_col).groupBy(user_col).applyInPandas(
        stats, USER_STATS_SCHEMA
    )


def arrow_dot_norms(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dot_q, norm6) via ``mapInArrow`` — the third rung of the
    Python-UDF ladder (scalar pandas UDF ``vector_norm_q`` →
    ``applyInPandas`` → RAW ARROW): batches arrive as
    ``pyarrow.RecordBatch``, zero pandas materialization, the closest
    Python gets to the JVM columnar layout. Worth the lower-level API
    when per-batch overhead dominates (narrow rows, wide fleets).

    Same determinism contract as the pandas rungs: components quantize
    to 1e-6 integers, ``dot_q`` is the exact integer self-dot, and
    ``norm6`` is the one sqrt rounded to 6 dp — engine-exact.
    """
    import pyarrow as pa

    def batches(it):
        for rb in it:
            tbl = pa.Table.from_batches([rb])
            ids = tbl.column(id_col).to_numpy()
            dots = np.empty(len(ids), dtype=np.int64)
            for i, vec in enumerate(tbl.column(vec_col).to_pylist()):
                q = np.round(
                    np.asarray(vec, dtype=np.float64) * QUANT
                ).astype(np.int64)
                dots[i] = int(q @ q)
            # SQL ROUND is half-up; np.round is half-to-even — floor(x
            # * 1e6 + 0.5) replicates the SQL behavior for positives
            norm6 = np.floor(np.sqrt(dots.astype(np.float64)) * 1e6 + 0.5) / 1e6
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int64()),
                 pa.array(dots, pa.int64()),
                 pa.array(norm6, pa.float64())],
                names=["vec_id", "dot_q", "norm6"],
            )

    return df.select(F.col(id_col), F.col(vec_col)).mapInArrow(
        batches, "vec_id long, dot_q long, norm6 double"
    )

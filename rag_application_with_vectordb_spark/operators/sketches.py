"""Mergeable frequent-items sketching (Misra-Gries) as a
propose-then-verify operator pair.

The sketch stage is constant-memory per partition and partition-
DEPENDENT; the exact-verify stage makes the final output partition-
independent — the same propose/verify discipline the ANN rerank and
pHash blocking paths use. See ``misra_gries_candidates`` for the
guarantee that makes this sound.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["misra_gries_candidates"]

def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int = 8
) -> DataFrame:
    """Per-partition Misra-Gries frequent-items sketch (capacity
    counters per partition), Arrow-batched.

    The RETURNED relation is partition-dependent (different splits
    propose different supersets) but carries the MG guarantee: any item
    with global frequency > n/(capacity+1) survives in EVERY
    partition's sketch for its share of rows, so the union of
    partition candidates contains every global heavy hitter no matter
    how rows are distributed. Callers MUST therefore verify with an
    exact count of the candidates only (see
    ``plans.relational2.heavy_hitters_verified``) — the verified output
    is then partition-INDEPENDENT even though this stage is not.
    State is ``capacity`` counters per partition: constant memory at
    any scale, mergeable by union.
    """
    from ..session import _ship_package

    _ship_package(df.sparkSession)

    schema = T.StructType(
        [
            T.StructField("candidate", T.StringType()),
            T.StructField("mg_count", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for v in pdf[key_col]:
                v = str(v)
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:  # decrement-all step
                    for k in list(counters):
                        counters[k] -= 1
                        if counters[k] == 0:
                            del counters[k]
        yield pd.DataFrame(
            {"candidate": list(counters), "mg_count": list(counters.values())}
        )

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        run, schema
    )

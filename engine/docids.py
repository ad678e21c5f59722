"""Deterministic dense docID assignment (SURVEY.md B3).

``doc_id`` = global rank of ``(conv_id, turn_idx)`` in the stable corpus
order, dense 0..N-1, REPRODUCIBLE across cluster sizes and partition counts
— required for rank-identity across the N / 4N scaling runs.

Implementation: ``repartitionByRange`` on the sort keys (range partitions
are ordered by partition id) + ``sortWithinPartitions``, persist so the
sampled range boundaries are computed once, count rows per partition,
driver-side cumsum -> per-partition base offsets, then a ``mapInArrow``
pass adds ``base + local_index``. Avoids ``monotonically_increasing_id``
(not dense, partition-layout dependent) and a global ``row_number()``
window (single-partition bottleneck at scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def assign_doc_ids(df: DataFrame, keys: tuple[str, ...] = ("conv_id", "turn_idx"),
                   n_parts: int | None = None) -> DataFrame:
    """Returns the input with an extra ``doc_id:long`` column, rows
    range-partitioned and sorted by ``keys`` (partition i holds doc_ids
    [offset_i, offset_{i+1}) — a doc-range sliced layout downstream build
    stages rely on)."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    part = (df.repartitionByRange(n_parts, *keys)
              .sortWithinPartitions(*keys)
              .persist(StorageLevel.MEMORY_AND_DISK))
    counts = part.groupBy(F.spark_partition_id().alias("pid")).count().collect()
    offsets: dict[int, int] = {}
    base = 0
    for row in sorted(counts, key=lambda r: r["pid"]):
        offsets[row["pid"]] = base
        base += row["count"]
    bc = spark.sparkContext.broadcast(offsets)
    out_schema = T.StructType(df.schema.fields + [T.StructField("doc_id", T.LongType(), False)])

    def add_ids(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        pos = bc.value.get(pid, 0)
        for b in batches:
            n = b.num_rows
            ids = pa.array(np.arange(pos, pos + n, dtype=np.int64), type=pa.int64())
            pos += n
            yield b.append_column("doc_id", ids)

    out = part.mapInArrow(add_ids, out_schema)
    # expose the persisted base so callers can unpersist it once their own
    # materialization no longer depends on recomputing the sort
    out._graft_cached_base = part
    return out

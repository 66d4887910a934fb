"""Custom stateful streaming operator: running per-group sketch state.

``applyInPandasWithState`` keeps one serialized sketch blob per group key in
the state store; each micro-batch folds its rows into the state with the
same numpy kernels and emits the group's running totals + estimate.  This is
the arbitrary-stateful analog of the foreachBatch fold in stream_build.py —
state lives in Spark's checkpointed state store (per-group, partitioned),
not on the driver, so it scales with the key space and survives restarts
with the stream checkpoint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField, StructType)

from ..sketches import HLLParams, HLLSketch

OUTPUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("n_docs", LongType()),
    StructField("n_tokens", LongType()),
    StructField("distinct_estimate", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n_docs", LongType()),
    StructField("n_tokens", LongType()),
    StructField("hll", BinaryType()),
])


def _make_update_fn(b: int):
    sketch = HLLSketch(HLLParams(b=b))

    def update(key, pdfs, state: GroupState):
        import numpy as np
        if state.exists:
            n_docs, n_tokens, blob = state.get
            _, hll_state = HLLSketch.deserialize(bytes(blob))
        else:
            n_docs, n_tokens = 0, 0
            hll_state = sketch.empty()
        for pdf in pdfs:
            arrs = [a for a in pdf["tokens"].to_numpy() if a is not None and len(a)]
            if arrs:
                flat = np.concatenate(arrs).astype(np.int32, copy=False)
                sketch.update_i32(hll_state, flat)
                n_tokens += int(flat.size)
            n_docs += len(pdf)
        state.update((n_docs, n_tokens, bytearray(sketch.serialize(hll_state))))
        yield pd.DataFrame({"source": [key[0]], "n_docs": [n_docs],
                            "n_tokens": [n_tokens],
                            "distinct_estimate": [sketch.estimate(hll_state)]})

    return update


def running_source_sketches(spark: SparkSession, source_dir: str, schema,
                            b: int = 12, max_files_per_trigger: int = 1):
    """Stream the token table; maintain a per-source running HLL in the
    state store; return the LAST emitted row per source (update mode,
    availableNow to completion against a memory sink)."""
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger)
              .parquet(source_dir))
    running = (stream.select("source", "tokens")
               .groupBy("source")
               .applyInPandasWithState(
                   _make_update_fn(b), OUTPUT_SCHEMA, STATE_SCHEMA,
                   "update", GroupStateTimeout.NoTimeout))
    name = f"running_src_{abs(id(stream)) % 99999}"
    q = (running.writeStream.outputMode("update")
         .format("memory").queryName(name)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # update-mode memory sink appends each emission; keep the last per source
    return spark.sql(f"""
        SELECT source, n_docs, n_tokens, distinct_estimate FROM (
          SELECT *, row_number() OVER (PARTITION BY source ORDER BY n_docs DESC) rn
          FROM {name}) WHERE rn = 1
    """).drop("rn")

"""Streaming exact deduplication — a custom stateful operator via
applyInPandasWithState (the Structured Streaming analog of the batch
dedup_exact in operators/dedup.py).

Keyed by sha2(text): the FIRST document with a given hash (min doc_id
within its micro-batch) is emitted; every later arrival — same batch or
any future batch — is suppressed by a per-key boolean state. At 100 TB
the state is one tiny row per distinct hash, hash-partitioned by the
shuffle; no raw text is ever held in state.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "hash string, doc_id long, text string"
STATE_SCHEMA = "seen boolean"


def dedup_stream(docs_stream: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Streaming DataFrame of first-seen documents (hash, doc_id, text)."""
    hashed = docs_stream.select(
        F.sha2(F.col(text_col), 256).alias("hash"),
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def emit_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # hash already emitted in an earlier batch
        best = None
        for pdf in pdfs:
            cand = pdf.loc[pdf["doc_id"].idxmin()]
            if best is None or cand["doc_id"] < best["doc_id"]:
                best = cand
        state.update((True,))
        yield pd.DataFrame(
            {"hash": [key[0]], "doc_id": [int(best["doc_id"])], "text": [best["text"]]}
        )

    return hashed.groupBy("hash").applyInPandasWithState(
        emit_first,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_dedup_log(
    deduped: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Append first-seen docs to a parquet log, exactly-once."""
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )

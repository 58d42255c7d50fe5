"""Result sinks — the Spark restatement of the reference's OutputManager
(/root/reference/core/OutputManager.hh): per-thread buffered files become
per-task files; the new→original id remap at output time
(OutputManager.hh:97) becomes a join with vertex_map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remap_to_origin(
    matches: DataFrame, vertex_map: DataFrame, cols: list[str] | None = None
) -> DataFrame:
    """Replace hash-id match columns with human-readable origins
    (repo/path) by joining vertex_map per column — the ids.bin reverse
    mapping done relationally."""
    cols = cols or [c for c in matches.columns if c.startswith("v")]
    out = matches
    for c in cols:
        vm = vertex_map.select(
            F.col("id").alias(c),
            F.concat_ws("/", "repo", "path").alias(f"{c}_origin"),
        )
        out = out.join(vm, c, "left")
    return out


def write_matches_csv(matches: DataFrame, out_dir: str, header: bool = True) -> None:
    """CSV match dump — one file per task, like one file per thread
    (OutputManager.hh:92-143)."""
    matches.write.mode("overwrite").option("header", str(header).lower()).csv(out_dir)


def write_matches_parquet(matches: DataFrame, out_dir: str) -> None:
    """Packed binary dump (the BIN sink analog, OutputManager.hh:80-91) —
    parquet is the columnar equivalent of packed 4-byte ids."""
    matches.write.mode("overwrite").parquet(out_dir)


def write_results_table(df: DataFrame, path: str, mode: str = "append") -> None:
    """Results-table sink (stdout-print analog for driver-visible results,
    but durable): append to a parquet/Iceberg-style table."""
    df.write.mode(mode).parquet(path)

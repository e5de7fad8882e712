"""SQL-library materializer (reference de_polars/data_partitioner.py:
15-213): discover a directory of ``.sql`` files, run each through the
engine, write results as parquet mirroring the library's folder layout.

Spark-first difference: results are written by the DISTRIBUTED parquet
sink (``df.write``, optional ``partitionBy``), not collected to the
driver — the reference's ``write_parquet`` materialized every result in
driver memory, which caps output size at one machine.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

from pyspark.sql import DataFrame

from de_polars_spark.engine.core import SparkEngine


def extract_query_metadata(sql_content: str) -> dict[str, str]:
    """``-- Description:`` / ``-- Partitioning:`` / ``-- Output:`` header
    comments (data_partitioner.py:88-102)."""
    metadata: dict[str, str] = {}
    for line in sql_content.splitlines():
        line = line.strip()
        for tag in ("Description", "Partitioning", "Output"):
            marker = f"-- {tag}:"
            if line.startswith(marker):
                metadata[tag.lower()] = line[len(marker):].strip()
    return metadata


class DataPartitioner:
    def __init__(
        self,
        engine: SparkEngine,
        output_base_dir: str = "cur2_data",
        query_library_path: str = "cur2_query_library",
    ):
        self.engine = engine
        self.output_base_dir = output_base_dir
        self.query_library_path = query_library_path

    # -- discovery ------------------------------------------------------ #
    def discover_sql_files(self) -> dict[str, list[str]]:
        """category -> relative .sql paths (data_partitioner.py:53-77)."""
        categories: dict[str, list[str]] = {}
        pattern = os.path.join(self.query_library_path, "**", "*.sql")
        for path in sorted(glob.glob(pattern, recursive=True)):
            rel = os.path.relpath(path, self.query_library_path)
            category = os.path.dirname(rel) or "."
            categories.setdefault(category, []).append(rel)
        return categories

    def load_sql_query(self, query_path: str) -> str:
        full = os.path.join(self.query_library_path, query_path)
        if not os.path.exists(full):
            raise FileNotFoundError(f"SQL file not found: {full}")
        with open(full, "r", encoding="utf-8") as fh:
            return fh.read()

    # -- materialization ------------------------------------------------ #
    def run_sql_file(
        self, sql_file_path: str, partition_by: Optional[list[str]] = None
    ) -> str:
        """Execute one library query and write its result as parquet at
        ``<output>/<category>/<stem>.parquet`` (data_partitioner.py:
        105-142). A ``-- Partitioning: col[,col]`` header, or the
        ``partition_by`` argument, becomes a hive ``partitionBy``."""
        sql = self.load_sql_query(sql_file_path)
        metadata = extract_query_metadata(sql)
        df: DataFrame = self.engine.query(sql)
        stem = os.path.splitext(os.path.basename(sql_file_path))[0]
        out = os.path.join(
            self.output_base_dir, os.path.dirname(sql_file_path), f"{stem}.parquet"
        )
        cols = partition_by
        if cols is None and metadata.get("partitioning"):
            cols = [c.strip() for c in metadata["partitioning"].split(",") if c.strip()]
        writer = df.write.mode("overwrite")
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(out)
        return out

    def run_sql_files(self, sql_file_paths: list[str]) -> dict[str, str]:
        """Batch materialization; failures recorded, not fatal
        (data_partitioner.py:145-186)."""
        results: dict[str, str] = {}
        for path in sql_file_paths:
            try:
                results[path] = self.run_sql_file(path)
            except Exception as exc:
                results[path] = f"ERROR: {exc}"
        return results

    def list_available_sql_files(self) -> list[dict]:
        """Inventory with metadata (data_partitioner.py:188-213, returning
        data instead of printing)."""
        out = []
        for category, files in sorted(self.discover_sql_files().items()):
            for rel in files:
                entry = {
                    "category": category,
                    "file": rel,
                    "table_name": os.path.splitext(os.path.basename(rel))[0],
                }
                try:
                    entry.update(extract_query_metadata(self.load_sql_query(rel)))
                except OSError:
                    pass
                out.append(entry)
        return out

"""DFS-equivalent file store: store/retrieve/delete wrappers.

The reference's DFS half (S1-S5, SURVEY.md §2.1) — block splitting,
least-loaded placement, x2 replication, re-replication on node death
(file_operation.ex:146-556, master_node.ex:148-326) — is storage-layer
work that Spark delegates to HDFS/S3/local FS.  What remains of the
PUBLIC API (store_file / retrieve_file / delete_file,
lib/mini_hadoop.ex:6-16) is a thin catalog of named line-oriented files:

* ``store_file``  — ingest a local text file into the store as parquet
  ``(line_idx, line)``; the line index makes retrieval order-exact
  while the data stays splittable/distributed (the analogue of
  ``split_on_newline: true`` record-aligned blocks,
  file_operation.ex:159-183).
* ``retrieve_file`` — reassemble the file in line order
  (file_operation.ex:299-443's index-ordered reassembly, done by an
  orderBy instead of manual block stitching).
* ``delete_file`` — drop the file's directory (file_operation.ex:
  445-556 without the per-replica bookkeeping).

Replication factor, block placement and heartbeats have no analogue
here on purpose: at 100 TB those belong to the object store.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F


class FileStore:
    """Named file catalog rooted at a warehouse directory."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, filename: str) -> str:
        if "/" in filename or filename.startswith("."):
            raise ValueError(f"invalid store filename: {filename!r}")
        return os.path.join(self.root, filename)

    def exists(self, filename: str) -> bool:
        return os.path.isdir(self._path(filename))

    def list_files(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.root) if os.path.isdir(os.path.join(self.root, d))
        )

    def store_file(self, filename: str, local_path: str) -> int:
        """Ingest a local text file; returns the line count.

        zipWithIndex pins each line's position so retrieval is
        order-exact regardless of partitioning."""
        if self.exists(filename):
            raise FileExistsError(f"file already exists in store: {filename}")
        if not os.path.exists(local_path):
            raise FileNotFoundError(local_path)
        rdd = self.spark.sparkContext.textFile(local_path).zipWithIndex()
        df = self.spark.createDataFrame(
            rdd.map(lambda li: (li[1], li[0])), "line_idx long, line string"
        )
        df.write.parquet(self._path(filename))
        # count what was WRITTEN (one cheap metadata-only scan), not the
        # source lineage — re-running textFile would re-read the local
        # file a third time and could disagree if it was appended to
        return self.spark.read.parquet(self._path(filename)).count()

    def retrieve_file(self, filename: str, local_path: str) -> int:
        """Reassemble the stored file to a local path in line order.

        Deliberate deviation from the reference: on a partially-
        retrievable file the reference marks the operation completed-
        with-warning and returns the bytes it could reassemble
        (file_operation.ex:418-423).  Here retrieval is all-or-raise —
        a missing parquet part fails the read outright — for the same
        reason the C5 failure-accounting deviation exists (see
        engine/mapreduce.py): silently returning partial data is the
        one behavior a data pipeline cannot detect downstream; Spark's
        fail-loud read surfaces the storage fault instead."""
        if not self.exists(filename):
            raise FileNotFoundError(f"not in store: {filename}")
        df = self.spark.read.parquet(self._path(filename)).orderBy(F.col("line_idx"))
        os.makedirs(os.path.dirname(local_path) or ".", exist_ok=True)
        n = 0
        with open(local_path, "w", encoding="utf-8") as f:
            for row in df.toLocalIterator():
                f.write(row.line)
                f.write("\n")
                n += 1
        return n

    def delete_file(self, filename: str) -> bool:
        if not self.exists(filename):
            return False
        shutil.rmtree(self._path(filename))
        return True

    def file_info(self, filename: str) -> dict:
        """Stored-file metadata — the ``file_op_info`` analogue
        (mini_hadoop.ex:75-80): line count, on-disk bytes, and block
        (parquet part-file) count standing in for the reference's
        per-block replica map."""
        if not self.exists(filename):
            raise FileNotFoundError(f"not in store: {filename}")
        path = self._path(filename)
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        size = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if os.path.isfile(os.path.join(path, f))
        )
        n_lines = self.spark.read.parquet(path).count()
        return {
            "filename": filename,
            "n_lines": n_lines,
            "n_blocks": len(parts),
            "total_bytes": size,
        }

"""Embedding export: buffered shard writer + warehouse loading hooks.

Ref parity: `python/gigl/common/data/export.py:52-211` EmbeddingExporter —
buffers (node_id, embedding) rows, flushes size-capped Avro shards to GCS,
then `load_embeddings_to_bigquery` loads them into a table. TPU-native
version writes npz shards locally/URI (Avro/BQ are cloud-backend plugins via
the same register_backend hook as GcsUri); the un-enumeration join happens in
the post processor (gigl_tpu.orchestration).
"""

from __future__ import annotations

import io
import json
from typing import Iterator, List, Optional, Tuple

import numpy as np

from gigl_tpu.data.uri import Uri, UriFactory
from gigl_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class EmbeddingExporter:
    """Buffer embeddings in memory; flush size-capped shards.

    Ref parity: EmbeddingExporter (export.py:52-150): context-managed buffer
    with `min_shard_size_threshold_bytes`-style flushing; shard file pattern
    `embeddings_shard_{n}`.
    """

    def __init__(self, export_dir, *, shard_size_bytes: int = 64 * 1024 * 1024,
                 file_prefix: str = "embeddings"):
        self.export_dir = UriFactory.create(export_dir)
        self.shard_size_bytes = shard_size_bytes
        self.file_prefix = file_prefix
        self._ids: List[np.ndarray] = []
        self._embs: List[np.ndarray] = []
        self._buffered_bytes = 0
        self._shard_idx = 0
        self._written: List[Uri] = []

    def add_embeddings(self, node_ids: np.ndarray, embeddings: np.ndarray):
        node_ids = np.asarray(node_ids)
        embeddings = np.asarray(embeddings)
        if node_ids.shape[0] != embeddings.shape[0]:
            raise ValueError(
                f"ids ({node_ids.shape[0]}) != embeddings "
                f"({embeddings.shape[0]})")
        self._ids.append(node_ids)
        self._embs.append(embeddings)
        self._buffered_bytes += node_ids.nbytes + embeddings.nbytes
        if self._buffered_bytes >= self.shard_size_bytes:
            self.flush()

    def flush(self) -> Optional[Uri]:
        if not self._ids:
            return None
        ids = np.concatenate(self._ids)
        embs = np.concatenate(self._embs)
        buf = io.BytesIO()
        np.savez_compressed(buf, node_ids=ids, embeddings=embs)
        uri = self.export_dir.join(
            f"{self.file_prefix}_shard_{self._shard_idx:05d}.npz")
        uri.write_bytes(buf.getvalue())
        logger.info("wrote %d embedding rows to %s", len(ids), uri)
        self._written.append(uri)
        self._shard_idx += 1
        self._ids, self._embs, self._buffered_bytes = [], [], 0
        return uri

    @property
    def written_shards(self) -> List[Uri]:
        return list(self._written)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.flush()
        return False


def read_embedding_shards(
    export_dir,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (node_ids, embeddings) per shard under export_dir."""
    d = UriFactory.create(export_dir)
    for child in d.list_children():
        if child.uri.endswith(".npz"):
            with np.load(io.BytesIO(child.read_bytes())) as z:
                yield z["node_ids"], z["embeddings"]


def load_embeddings_to_table(
    export_dir, table_writer=None
) -> int:
    """Load all shards into a warehouse table via a pluggable writer.

    Ref parity: load_embeddings_to_bigquery (export.py:152-211). The writer
    is `fn(node_ids, embeddings) -> None`; None collects rows and returns the
    count (dry-run/local mode). Returns total rows loaded.
    """
    total = 0
    for ids, embs in read_embedding_shards(export_dir):
        if table_writer is not None:
            table_writer(ids, embs)
        total += len(ids)
    return total


def warehouse_embedding_writer(warehouse, bq_table_path: str,
                               embedding_dim: int):
    """Build a ``table_writer`` that loads shards into a warehouse table
    (data/warehouse.py — the reference's load_embeddings_to_bigquery
    target, bq.py load_rows_to_bq). Creates/empties the table with the
    reference's (node_id INTEGER, emb_0..emb_{D-1} FLOAT) row shape."""
    schema = [("node_id", "INTEGER")] + [
        (f"emb_{i}", "FLOAT") for i in range(embedding_dim)]
    warehouse.create_or_empty_bq_table(bq_table_path, schema)

    def write(node_ids, embeddings):
        rows = [
            {"node_id": int(n),
             **{f"emb_{i}": float(v) for i, v in enumerate(e)}}
            for n, e in zip(node_ids, embeddings)
        ]
        warehouse.load_rows_to_bq(bq_table_path, rows)

    return write

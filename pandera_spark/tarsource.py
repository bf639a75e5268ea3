"""WebDataset-style tar-shard I/O: ``format("tar_shards")`` + writer.

Large multimodal training corpora ship as directories of ``.tar``
shards whose members pair by basename (``000123.jpg`` + ``000123.txt``
+ ``000123.json`` = one sample) — the WebDataset layout.  Spark has no
native reader for it; this module adds one via the Spark 4 Python Data
Source API (same integration surface as ``datasource.py``):

- **read**: one :class:`InputPartition` per tar file — the natural
  WebDataset parallel unit (shards are sized for exactly this).  Rows
  are ``(shard, key, ext, data, size)``, one per member; media bytes
  stay opaque ``binary`` (decode downstream with the
  ``operators/codecs.py`` Arrow paths).  Member order inside a shard
  is preserved per tar semantics; a re-executed task re-reads the same
  file, so the source is retry-safe/deterministic.
- **group** (:func:`group_samples`): pivot members into one row per
  (shard, key) with an ``ext -> bytes`` map — the sample view.  One
  aggregation; bytes shuffle once, keyed by sample.
- **write** (:func:`write_tar_shards`): export a grouped frame back to
  tar shards, one file per Spark partition via ``foreachPartition``
  (repartition first to choose the shard count).  Files land as
  ``<prefix>-<partition id>.tar`` through a write-then-rename so a
  retried task overwrites atomically rather than appending.  POSIX
  paths only (tests, local staging); object-store export should go
  through parquet ``sharding.write_shards`` instead.

Driver-side file listing uses Python ``glob`` — for object stores,
list externally and pass ``files`` (comma-separated) instead of
``path``.
"""

from __future__ import annotations

import glob as _glob
import io as _io
import os
import tarfile
from typing import Iterator, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    HAS_PYTHON_DATASOURCE = True
except ImportError:  # pragma: no cover - env has pyspark 4.1
    HAS_PYTHON_DATASOURCE = False
    DataSource = DataSourceReader = object

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value):
            self.value = value


_FORMAT_NAME = "tar_shards"
_SCHEMA_DDL = (
    "shard string, key string, ext string, data binary, size long"
)


def _split_member(name: str) -> Tuple[str, str]:
    """WebDataset key split: everything up to the FIRST dot in the
    basename is the sample key, the rest is the extension (so
    ``x.seg.png`` pairs with ``x.txt`` under key ``x``)."""
    base = name.rsplit("/", 1)[-1]
    if "." in base:
        key, ext = base.split(".", 1)
    else:
        key, ext = base, ""
    prefix = name[: len(name) - len(base)]
    return prefix + key, ext


class _TarFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _TarShardReader(DataSourceReader):
    def __init__(self, files: Sequence[str]):
        self._files = list(files)

    def partitions(self) -> Sequence[InputPartition]:
        return [_TarFilePartition(p) for p in self._files]

    def read(self, partition: _TarFilePartition) -> Iterator[Tuple]:
        shard = os.path.basename(partition.path)
        with tarfile.open(partition.path, "r") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                fh = tf.extractfile(member)
                if fh is None:  # pragma: no cover - non-regular member
                    continue
                data = fh.read()
                key, ext = _split_member(member.name)
                yield (shard, key, ext, data, len(data))


class TarShardDataSource(DataSource):
    """``spark.read.format("tar_shards").option("path", glob)`` —
    see module docstring.  Options: ``path`` (glob pattern) or
    ``files`` (comma-separated explicit list; wins when both given)."""

    @classmethod
    def name(cls) -> str:
        return _FORMAT_NAME

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> _TarShardReader:
        files_opt = self.options.get("files")
        if files_opt:
            files = [f for f in files_opt.split(",") if f]
        else:
            pattern = self.options.get("path")
            if not pattern:
                raise ValueError(
                    "tar_shards requires a 'path' glob or 'files' list"
                )
            files = sorted(_glob.glob(pattern))
        if not files:
            raise ValueError("tar_shards matched no files")
        return _TarShardReader(files)


def register(spark) -> None:
    if not HAS_PYTHON_DATASOURCE:  # pragma: no cover
        raise RuntimeError(
            "tar_shards needs pyspark >= 4.0 (Python Data Source API)"
        )
    spark.dataSource.register(TarShardDataSource)


def read_tar_shards(spark, path_glob: str) -> DataFrame:
    """Convenience wrapper: register + read a shard glob."""
    register(spark)
    return (
        spark.read.format(_FORMAT_NAME).option("path", path_glob).load()
    )


def group_samples(df: DataFrame) -> DataFrame:
    """Member rows -> sample rows: ``(shard, key, parts: map<ext,
    binary>, n_parts, total_bytes)``.  One aggregation keyed by
    (shard, key); duplicate extensions within a sample keep the LAST
    member (tar replay order), matching tar extraction semantics."""
    return (
        df.groupBy("shard", "key")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("ext"), F.col("data")))
            ).alias("parts"),
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.sum("size").cast("long").alias("total_bytes"),
        )
    )


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    *,
    prefix: str = "shard",
    key_col: str = "key",
    parts_col: str = "parts",
) -> None:
    """Export a grouped frame (see :func:`group_samples`) to tar
    shards: one ``<prefix>-<NNNNN>.tar`` per Spark partition.
    ``repartition(n)`` / ``repartitionByRange`` first to choose shard
    count and sample placement.  POSIX filesystem only."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, parts_col]

    def write_partition(rows):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"{prefix}-{pid:05d}.tar")
        tmp = final + ".inprogress"
        wrote = False
        with tarfile.open(tmp, "w") as tf:
            for row in rows:
                wrote = True
                key = row[key_col]
                parts = row[parts_col] or {}
                for ext in sorted(parts):
                    payload = bytes(parts[ext])
                    name = f"{key}.{ext}" if ext else str(key)
                    info = tarfile.TarInfo(name=name)
                    info.size = len(payload)
                    tf.addfile(info, _io.BytesIO(payload))
        if wrote:
            os.replace(tmp, final)  # atomic: retries overwrite
        else:
            os.remove(tmp)  # no empty shards

    df.select(*cols).foreachPartition(write_partition)

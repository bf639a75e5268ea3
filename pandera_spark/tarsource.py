"""WebDataset-style tar-shard I/O: ``format("tar_shards")`` + writer.

Large multimodal training corpora ship as directories of ``.tar``
shards whose members pair by basename (``000123.jpg`` + ``000123.txt``
+ ``000123.json`` = one sample) — the WebDataset layout.  Spark has no
native reader for it; this module adds one via the Spark 4 Python Data
Source API (same integration surface as ``datasource.py``):

- **read**: one :class:`InputPartition` per tar file — the natural
  WebDataset parallel unit (shards are sized for exactly this), or
  member-range splits of oversized tars when ``max_shard_bytes`` is
  set.  Rows are ``(shard, key, ext, data, size, ordinal)``, one per
  member, where ``ordinal`` is the member's tar replay index (the
  dedup tiebreaker for :func:`group_samples`); media bytes
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
    "shard string, key string, ext string, data binary, size long, "
    "ordinal long"
)

# tar format: member data is padded to 512-byte blocks after a
# 512-byte header.  Used by the driver-side split scanner to step
# between member headers without reading payloads.
_TAR_BLOCK = 512


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
    """One read task: a whole tar, or (with ``max_shard_bytes``) a
    contiguous member range starting at a header ``offset``.
    ``ordinal0`` is the shard-global index of the range's first member
    so ordinals stay comparable across splits of the same shard."""

    def __init__(
        self,
        path: str,
        offset: int = 0,
        n_members: int = -1,
        ordinal0: int = 0,
    ):
        self.path = path
        self.offset = offset
        self.n_members = n_members
        self.ordinal0 = ordinal0


def _scan_member_ranges(
    path: str, max_bytes: int
) -> "list[Tuple[int, int, int]]":
    """Driver-side split plan for one oversized tar: walk the member
    HEADERS only (tarfile seeks past payloads on real files) and group
    consecutive members into ranges of <= ``max_bytes`` payload.
    Returns ``[(offset, n_members, ordinal0), ...]``; a single member
    larger than ``max_bytes`` gets its own range (never split
    mid-member)."""
    ranges: "list[Tuple[int, int, int]]" = []
    with tarfile.open(path, "r") as tf:
        start = 0
        n = 0
        acc = 0
        ord0 = 0
        total = 0
        for member in tf:
            if n and acc + member.size > max_bytes:
                ranges.append((start, n, ord0))
                start, n, acc, ord0 = member.offset, 0, 0, total
            n += 1
            acc += member.size
            total += 1
        if n:
            ranges.append((start, n, ord0))
    return ranges or [(0, -1, 0)]


class _TarShardReader(DataSourceReader):
    def __init__(self, files: Sequence[str], max_shard_bytes: int = 0):
        self._files = list(files)
        self._max_bytes = int(max_shard_bytes)

    def partitions(self) -> Sequence[InputPartition]:
        if self._max_bytes <= 0:
            return [_TarFilePartition(p) for p in self._files]
        parts = []
        for p in self._files:
            if os.path.getsize(p) <= self._max_bytes:
                parts.append(_TarFilePartition(p))
                continue
            for off, n, ord0 in _scan_member_ranges(p, self._max_bytes):
                parts.append(_TarFilePartition(p, off, n, ord0))
        return parts

    def read(self, partition: _TarFilePartition) -> Iterator[Tuple]:
        shard = os.path.basename(partition.path)
        limit = partition.n_members
        ordinal = partition.ordinal0
        with open(partition.path, "rb") as raw:
            if partition.offset:
                raw.seek(partition.offset)
            # stream mode ("r|") would forbid the seek-based skip
            # tarfile does between members; "r:" on the seekable
            # handle reads headers + requested payloads only
            with tarfile.open(fileobj=raw, mode="r:") as tf:
                emitted = 0
                for member in tf:
                    if 0 <= limit <= emitted:
                        break
                    emitted += 1
                    if not member.isfile():
                        ordinal += 1
                        continue
                    fh = tf.extractfile(member)
                    if fh is None:  # pragma: no cover
                        ordinal += 1
                        continue
                    data = fh.read()
                    key, ext = _split_member(member.name)
                    yield (shard, key, ext, data, len(data), ordinal)
                    ordinal += 1


class TarShardDataSource(DataSource):
    """``spark.read.format("tar_shards").option("path", glob)`` —
    see module docstring.  Options: ``path`` (glob pattern) or
    ``files`` (comma-separated explicit list; wins when both given);
    ``max_shard_bytes`` (optional) splits any tar bigger than this
    into multiple member-range partitions via a driver-side header
    scan, so one 10 GB shard does not become one task."""

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
        max_bytes = int(self.options.get("max_shard_bytes", 0) or 0)
        return _TarShardReader(files, max_shard_bytes=max_bytes)


def register(spark) -> None:
    if not HAS_PYTHON_DATASOURCE:  # pragma: no cover
        raise RuntimeError(
            "tar_shards needs pyspark >= 4.0 (Python Data Source API)"
        )
    spark.dataSource.register(TarShardDataSource)


def read_tar_shards(
    spark, path_glob: str, *, max_shard_bytes: int = 0
) -> DataFrame:
    """Convenience wrapper: register + read a shard glob."""
    register(spark)
    reader = spark.read.format(_FORMAT_NAME).option("path", path_glob)
    if max_shard_bytes:
        reader = reader.option("max_shard_bytes", str(max_shard_bytes))
    return reader.load()


def group_samples(df: DataFrame) -> DataFrame:
    """Member rows -> sample rows: ``(shard, key, parts: map<ext,
    binary>, n_parts, total_bytes)``.  One aggregation keyed by
    (shard, key); duplicate extensions within a sample keep the
    HIGHEST-``ordinal`` member — the reader's explicit tar replay
    index, matching tar extraction semantics (a replaced member wins)
    without relying on ``collect_list`` post-shuffle order, which
    Spark does not guarantee.  The winner filter is a higher-order
    expression over the per-sample list (samples hold a handful of
    members, so the O(k^2) exists-scan is constant work per row) —
    bytes still shuffle exactly once."""
    ms = F.collect_list(
        F.struct(
            F.col("ext"), F.col("data"), F.col("size"), F.col("ordinal")
        )
    )
    grouped = df.groupBy("shard", "key").agg(ms.alias("__ms"))
    latest = F.filter(
        F.col("__ms"),
        lambda m: ~F.exists(
            F.col("__ms"),
            lambda o: (o["ext"] == m["ext"])
            & (o["ordinal"] > m["ordinal"]),
        ),
    )
    return grouped.select(
        "shard",
        "key",
        F.map_from_entries(
            F.transform(latest, lambda m: F.struct(m["ext"], m["data"]))
        ).alias("parts"),
        F.size(latest).cast("long").alias("n_parts"),
        F.aggregate(
            latest,
            F.lit(0).cast("long"),
            lambda acc, m: acc + m["size"],
        ).alias("total_bytes"),
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

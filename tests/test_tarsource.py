"""WebDataset-style tar shard source: read, group, roundtrip write."""

import io
import os
import tarfile

import pytest

from pandera_spark.tarsource import (
    _split_member,
    group_samples,
    read_tar_shards,
    write_tar_shards,
)


def _make_tar(path, members):
    with tarfile.open(path, "w") as tf:
        for name, payload in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))


@pytest.fixture()
def shards(tmp_path):
    _make_tar(
        tmp_path / "train-00000.tar",
        [
            ("000000.txt", b"hello"),
            ("000000.img", b"\x89PNGfake"),
            ("000001.txt", b"world"),
            ("000001.img", b"\x89PNGfake2"),
        ],
    )
    _make_tar(
        tmp_path / "train-00001.tar",
        [
            ("000002.txt", b"third"),
            ("000002.meta.json", b"{}"),
        ],
    )
    return str(tmp_path / "train-*.tar")


def test_split_member_first_dot_rule():
    assert _split_member("000123.jpg") == ("000123", "jpg")
    assert _split_member("x.seg.png") == ("x", "seg.png")
    assert _split_member("dir/a.txt") == ("dir/a", "txt")
    assert _split_member("noext") == ("noext", "")


def test_read_tar_shards_one_row_per_member(spark, shards):
    df = read_tar_shards(spark, shards)
    rows = df.collect()
    assert len(rows) == 6
    assert df.columns == ["shard", "key", "ext", "data", "size", "ordinal"]
    by = {(r.shard, r.key, r.ext): r for r in rows}
    r = by[("train-00000.tar", "000000", "txt")]
    assert bytes(r.data) == b"hello" and r.size == 5
    assert ("train-00001.tar", "000002", "meta.json") in by
    # ordinal is the tar replay index, per shard
    ords = sorted(
        r.ordinal for r in rows if r.shard == "train-00000.tar"
    )
    assert ords == [0, 1, 2, 3]
    # one partition per tar file
    assert df.rdd.getNumPartitions() == 2


def test_duplicate_extension_keeps_last_member(spark, tmp_path):
    # valid tar semantics: a later member with the same name replaces
    # the earlier one on extraction; group_samples must agree and must
    # not crash map_from_entries with a duplicate key
    _make_tar(
        tmp_path / "dup-00000.tar",
        [
            ("a.txt", b"first"),
            ("a.img", b"pix"),
            ("a.txt", b"second"),
        ],
    )
    df = read_tar_shards(spark, str(tmp_path / "dup-*.tar"))
    g = group_samples(df).collect()
    assert len(g) == 1
    row = g[0]
    assert row.n_parts == 2
    assert bytes(row.parts["txt"]) == b"second"
    assert row.total_bytes == len(b"second") + len(b"pix")


def test_max_shard_bytes_splits_big_tar(spark, tmp_path):
    members = [(f"{i:06d}.bin", bytes([i % 251]) * 4096) for i in range(8)]
    _make_tar(tmp_path / "big-00000.tar", members)
    whole = read_tar_shards(spark, str(tmp_path / "big-*.tar"))
    assert whole.rdd.getNumPartitions() == 1
    split = read_tar_shards(
        spark, str(tmp_path / "big-*.tar"), max_shard_bytes=8192
    )
    assert split.rdd.getNumPartitions() > 1
    # same rows either way, ordinals shard-global across splits
    a = sorted((r.key, r.ordinal, bytes(r.data)) for r in whole.collect())
    b = sorted((r.key, r.ordinal, bytes(r.data)) for r in split.collect())
    assert a == b
    assert [x[1] for x in a] == list(range(8))


def test_group_samples_pivots_members(spark, shards):
    df = read_tar_shards(spark, shards)
    g = {r.key: r for r in group_samples(df).collect()}
    assert len(g) == 3
    assert g["000000"].n_parts == 2
    assert set(g["000000"].parts.keys()) == {"txt", "img"}
    assert bytes(g["000000"].parts["txt"]) == b"hello"
    assert g["000002"].total_bytes == len(b"third") + len(b"{}")


def test_write_tar_shards_roundtrip(spark, shards, tmp_path):
    df = read_tar_shards(spark, shards)
    grouped = group_samples(df).repartition(2, "key")
    out = str(tmp_path / "export")
    write_tar_shards(grouped, out, prefix="part")
    written = sorted(os.listdir(out))
    assert all(w.startswith("part-") and w.endswith(".tar") for w in written)
    back = group_samples(read_tar_shards(spark, os.path.join(out, "*.tar")))
    got = {r.key: r for r in back.collect()}
    assert set(got) == {"000000", "000001", "000002"}
    assert bytes(got["000002"].parts["meta.json"]) == b"{}"
    assert bytes(got["000001"].parts["img"]) == b"\x89PNGfake2"


def test_read_requires_matching_files(spark, tmp_path):
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception, match="matched no files|no files"):
        read_tar_shards(spark, str(tmp_path / "nope-*.tar")).collect()

"""Tar-shard (WebDataset layout) tests.

The writer and parser are adjudicated against stdlib ``tarfile`` —
a third implementation derived from the same POSIX spec — in BOTH
directions, so neither side is validated merely by the other.
"""

from __future__ import annotations

import io
import tarfile

import pytest

from aws_glue_pyspark_incrementality_and_parallelism_spark.operators.archive import (
    pack_shards,
    tar_members,
    tar_write,
    unpack_shards,
)
from aws_glue_pyspark_incrementality_and_parallelism_spark.sources.io import load_table

from .conftest import SF_SMALL

MEMBERS = [
    ("000000000001.txt", b"hello tar"),
    ("dir-style-name.txt", b""),  # empty payload: zero data blocks
    ("000000000003.txt", b"x" * 513),  # crosses a block boundary
]


def test_stdlib_reads_our_archive():
    blob = tar_write(MEMBERS)
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_we_read_stdlib_archive():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, payload in MEMBERS:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    assert tar_members(buf.getvalue()) == MEMBERS


def test_corrupted_checksum_raises():
    blob = bytearray(tar_write(MEMBERS))
    blob[0] ^= 0xFF  # flip a name byte without fixing the checksum
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(blob))


def test_non_file_entries_skipped():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        d = tarfile.TarInfo("subdir")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        info = tarfile.TarInfo("kept.txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"data"))
    assert tar_members(buf.getvalue()) == [("kept.txt", b"data")]


def test_shard_pack_unpack_corpus(spark):
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    shards = pack_shards(docs, docs_per_shard=64)
    members = unpack_shards(shards)
    n_docs = docs.count()
    assert members.count() == n_docs
    # shard ids follow the pure assignment expression
    got = sorted(r.shard_id for r in shards.select("shard_id").collect())
    assert got == sorted({i // 64 for i in range(n_docs)})


def test_ustar_prefix_long_paths():
    """Spec-valid USTAR long paths (prefix field) must round-trip; the
    stdlib writer splits >100-char paths into prefix + name."""
    long_name = "/".join(["deeply"] * 20) + "/member.txt"  # > 100 chars
    assert len(long_name) > 100
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo(long_name)
        info.size = 4
        tf.addfile(info, io.BytesIO(b"data"))
    assert tar_members(buf.getvalue()) == [(long_name, b"data")]


def test_oversized_payload_rejected():
    class FakeBytes(bytes):
        def __len__(self):
            return 8 * 2**30  # 8 GiB: one past the 11-octal-digit field

    with pytest.raises(ValueError, match="payload too large"):
        tar_write([("big.txt", FakeBytes())])

"""Puffin / roaring-bitmap format tests (Iceberg v3 deletion vectors).

The reference repo is v1-only (daskberg/ice.py reads no delete files);
these cover the from-scratch format layer in daskberg_spark/iceberg/puffin.py.
"""

import os
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from daskberg_spark.iceberg.puffin import (
    DV_MAGIC,
    MAGIC,
    deserialize_r32,
    dv_blob,
    dv_decode,
    dv_decode_file,
    read_blob,
    read_puffin_footer,
    roaring64_deserialize,
    roaring64_serialize,
    write_puffin,
)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        max_size=2000,
    )
)
def test_roaring64_roundtrip_sparse(positions):
    assert roaring64_deserialize(roaring64_serialize(positions)) == sorted(
        set(positions)
    )


def test_roaring64_dense_bitmap_container():
    # >4096 values in one 2^16 chunk forces the bitset container
    positions = list(range(70, 70 + 6000))
    data = roaring64_serialize(positions)
    assert roaring64_deserialize(data) == positions
    # container count 1, and the serialized size reflects an 8 KiB bitset
    assert len(data) > 8192


def test_roaring64_container_boundaries():
    positions = [0, 65535, 65536, 131071, 2**32 - 1, 2**32, 2**32 + 65536]
    assert roaring64_deserialize(roaring64_serialize(positions)) == positions


def test_r32_run_container_decode():
    # hand-encode the run-container layout (cookie 12347 + run bitset):
    # the writer never emits it, but real RoaringBitmap implementations
    # with run optimization do
    cookie = 12347 | ((1 - 1) << 16)
    buf = (
        struct.pack("<I", cookie)
        + b"\x01"  # container 0 is a run container
        + struct.pack("<HH", 3, 9)  # key 3, cardinality 10
        + struct.pack("<H", 2)  # two runs
        + struct.pack("<HH", 5, 4)  # 5..9
        + struct.pack("<HH", 100, 4)  # 100..104
    )
    values, off = deserialize_r32(buf)
    base = 3 << 16
    assert values == [base + v for v in [5, 6, 7, 8, 9, 100, 101, 102, 103, 104]]
    assert off == len(buf)


def test_dv_blob_magic_and_crc(tmp_path):
    blob = dv_blob([1, 5, 9])
    assert blob[4:8] == DV_MAGIC
    assert dv_decode(blob) == [1, 5, 9]
    corrupted = blob[:-1] + bytes([blob[-1] ^ 0xFF])
    try:
        dv_decode(corrupted)
        raise AssertionError("CRC corruption not detected")
    except ValueError as e:
        assert "CRC" in str(e)


def test_puffin_container_roundtrip(tmp_path):
    p = str(tmp_path / "x.puffin")
    blobs = [
        {
            "type": "deletion-vector-v1",
            "fields": [],
            "snapshot-id": 7,
            "sequence-number": 2,
            "properties": {"referenced-data-file": f"/data/{i}.parquet",
                           "cardinality": "3"},
            "data": dv_blob([i, i + 10, i + 70000]),
        }
        for i in range(3)
    ]
    metas = write_puffin(p, blobs, properties={"created-by": "daskberg-spark"})
    with open(p, "rb") as f:
        assert f.read(4) == MAGIC
    foot = read_puffin_footer(p)
    assert foot["properties"] == {"created-by": "daskberg-spark"}
    assert [b["offset"] for b in foot["blobs"]] == [m["offset"] for m in metas]
    for i, m in enumerate(foot["blobs"]):
        assert dv_decode(read_blob(p, m)) == [i, i + 10, i + 70000]
        assert dv_decode_file(p, m["offset"], m["length"]) == [
            i,
            i + 10,
            i + 70000,
        ]
    # blobs are tightly packed after the head magic
    assert foot["blobs"][0]["offset"] == 4
    size = os.path.getsize(p)
    payload_len = size - 12 - 4 - sum(m["length"] for m in metas) - 4
    assert payload_len > 0

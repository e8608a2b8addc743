"""Puffin / roaring-bitmap format tests (Iceberg v3 deletion vectors).

The reference repo is v1-only (daskberg/ice.py reads no delete files);
these cover the from-scratch format layer in daskberg_spark/iceberg/puffin.py.
"""

import os
import struct

import pytest

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


# -- known-answer byte vectors (RoaringFormatSpec / Puffin spec layouts) ------
#
# Round-trip tests cannot catch a SELF-CONSISTENT encoding drift (writer
# and reader wrong in the same way).  These vectors are hand-assembled
# from the published spec layouts, independent of the module's code
# paths, and assert exact serialized bytes in BOTH directions.


def test_r32_array_container_known_bytes():
    """Array-container vector, hand-assembled per RoaringFormatSpec:
    cookie 12346, container count, (key, card-1) headers, absolute
    offsets, u16 value arrays."""
    from daskberg_spark.iceberg.puffin import deserialize_r32, serialize_r32

    values = [1, 2, 100000]  # keys 0 ([1,2]) and 1 ([0x86A0])
    expected = bytes.fromhex(
        "3a300000"  # u32 LE cookie 12346 (no-run)
        "02000000"  # u32 LE container count 2
        "0000" "0100"  # header: key 0, cardinality-1 = 1
        "0100" "0000"  # header: key 1, cardinality-1 = 0
        "18000000"  # offset of container 0: 8 + 4*2 + 4*2 = 24
        "1c000000"  # offset of container 1: 24 + 2*2 = 28
        "0100" "0200"  # container 0: u16 values 1, 2
        "a086"  # container 1: u16 value 0x86A0 (100000 & 0xFFFF)
    )
    assert serialize_r32(values) == expected
    got, off = deserialize_r32(expected)
    assert got == values and off == len(expected)


def test_r32_bitset_container_known_bytes():
    """Bitset-container vector: cardinality > 4096 switches to the 8 KiB
    bitset; expected bytes built independently bit-by-bit."""
    from daskberg_spark.iceberg.puffin import deserialize_r32, serialize_r32

    values = list(range(5001))  # one key-0 container, card 5001 > 4096
    bits = bytearray(8192)
    for v in values:
        bits[v // 8] |= 1 << (v % 8)
    expected = (
        bytes.fromhex("3a300000" "01000000" "0000" "8813" "10000000")
        + bytes(bits)
    )  # header card-1 = 5000 = 0x1388; container at 8 + 4 + 4 = 16
    assert serialize_r32(values) == expected
    got, off = deserialize_r32(expected)
    assert got == values and off == len(expected)


def test_r32_run_container_known_bytes():
    """Run-container READ vector (writers with run optimization emit
    these): cookie 12347 with container-count-1 in the high 16 bits, a
    run-marker bitset, no offsets below 4 containers, then
    (n_runs, start, length-1) triples."""
    from daskberg_spark.iceberg.puffin import deserialize_r32

    encoded = bytes.fromhex(
        "3b300000"  # u32 LE cookie 12347, (count-1)=0 in high bits
        "01"  # run-marker bitset: container 0 is a run
        "0000" "0400"  # header: key 0, cardinality-1 = 4
        "0100"  # 1 run
        "0a00" "0400"  # start 10, length-1 = 4  -> 10..14
    )
    got, off = deserialize_r32(encoded)
    assert got == [10, 11, 12, 13, 14] and off == len(encoded)


def test_roaring64_multi_bucket_known_bytes():
    """64-bit portable layout vector spanning three high-32 buckets:
    u64 LE bucket count, then per bucket u32 LE key + 32-bit roaring."""
    from daskberg_spark.iceberg.puffin import (
        roaring64_deserialize,
        roaring64_serialize,
    )

    positions = [3, (1 << 32) + 5, (1 << 32) + 7, 5 << 32]
    r32_single = "3a300000" "01000000" "0000" "{card_m1}" "10000000"
    expected = bytes.fromhex(
        "0300000000000000"  # u64 LE bucket count 3
        "00000000"  # bucket key 0
        + r32_single.format(card_m1="0000") + "0300"  # [3]
        + "01000000"  # bucket key 1
        + r32_single.format(card_m1="0100") + "0500" "0700"  # [5, 7]
        + "05000000"  # bucket key 5
        + r32_single.format(card_m1="0000") + "0000"  # [0]
    )
    assert roaring64_serialize(positions) == expected
    assert roaring64_deserialize(expected) == positions


def test_dv_blob_known_bytes():
    """deletion-vector-v1 blob vector per the Iceberg v3 spec: u32 BE
    length of (magic + vector), magic d1d33964, the 64-bit bitmap, u32
    BE CRC-32 of magic + vector — expected assembled independently."""
    import struct
    import zlib

    from daskberg_spark.iceberg.puffin import dv_blob, dv_decode

    vector = bytes.fromhex(
        "0100000000000000"  # 1 bucket
        "00000000"  # key 0
        "3a300000" "02000000"
        "0000" "0100" "0100" "0000"
        "18000000" "1c000000"
        "0100" "0200" "a086"
    )
    body = bytes.fromhex("d1d33964") + vector
    expected = (
        struct.pack(">I", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )
    assert dv_blob([1, 2, 100000]) == expected
    assert dv_decode(expected) == [1, 2, 100000]


def test_puffin_container_known_layout(tmp_path):
    """Puffin container layout vector: a file hand-assembled per the
    Puffin spec (Magic, blobs, Magic, JSON payload, u32 LE payload size,
    u32 flags 0, Magic) must read back through the module's reader, and
    the module's writer must produce exactly that physical layout."""
    import json
    import struct

    from daskberg_spark.iceberg.puffin import (
        MAGIC,
        read_blob,
        read_puffin_footer,
        write_puffin,
    )

    blob_bytes = b"\x01\x02\x03\x04\x05"
    payload = json.dumps(
        {
            "blobs": [
                {
                    "type": "some-blob",
                    "fields": [1],
                    "snapshot-id": 9,
                    "sequence-number": 3,
                    "offset": 4,
                    "length": 5,
                }
            ],
            "properties": {"created-by": "hand"},
        }
    ).encode()
    hand = (
        MAGIC
        + blob_bytes
        + MAGIC
        + payload
        + struct.pack("<I", len(payload))
        + b"\x00\x00\x00\x00"
        + MAGIC
    )
    p = str(tmp_path / "hand.puffin")
    with open(p, "wb") as f:
        f.write(hand)
    foot = read_puffin_footer(p)
    assert foot["properties"] == {"created-by": "hand"}
    assert read_blob(p, foot["blobs"][0]) == blob_bytes

    # writer side: same physical layout (positions checked structurally)
    p2 = str(tmp_path / "own.puffin")
    metas = write_puffin(
        p2,
        [{"type": "some-blob", "fields": [1], "data": blob_bytes}],
        properties={"created-by": "hand"},
    )
    raw = open(p2, "rb").read()
    assert raw[:4] == MAGIC
    assert raw[4:9] == blob_bytes and metas[0]["offset"] == 4
    assert raw[9:13] == MAGIC
    (psize,) = struct.unpack("<I", raw[-12:-8])
    assert raw[-8:-4] == b"\x00\x00\x00\x00" and raw[-4:] == MAGIC
    assert json.loads(raw[13 : 13 + psize])["properties"] == {
        "created-by": "hand"
    }
    assert 13 + psize == len(raw) - 12


def test_lz4_block_truncation_raises_not_prefix():
    """Regression: a token claiming more literals than remain returned
    the readable prefix silently — corruption must be loud."""
    from daskberg_spark.iceberg.puffin import _lz4_block_decompress

    with pytest.raises(ValueError, match="truncated literals"):
        _lz4_block_decompress(bytes([10 << 4]) + b"abc")
    with pytest.raises(ValueError, match="truncated"):
        _lz4_block_decompress(bytes([15 << 4]))  # extension byte missing


def test_footer_reader_rejects_bogus_sizes(tmp_path):
    from daskberg_spark.iceberg.puffin import MAGIC, read_puffin_footer

    short = tmp_path / "short.puffin"
    short.write_bytes(b"PFA1")
    with pytest.raises(ValueError, match="too short"):
        read_puffin_footer(str(short))
    bogus = tmp_path / "bogus.puffin"
    bogus.write_bytes(
        MAGIC + b"x" * 24 + b"\xff\xff\xff\x7f" + b"\x00" * 4 + MAGIC
    )
    with pytest.raises(ValueError, match="exceeds file"):
        read_puffin_footer(str(bogus))


def test_read_blob_refuses_compressed_codecs(tmp_path):
    from daskberg_spark.iceberg.puffin import read_blob, write_puffin

    p = str(tmp_path / "z.puffin")
    metas = write_puffin(
        p, [{"type": "t", "fields": [1], "data": b"abc"}]
    )
    assert read_blob(p, metas[0]) == b"abc"
    meta = dict(metas[0], **{"compression-codec": "zstd"})
    with pytest.raises(NotImplementedError, match="zstd"):
        read_blob(p, meta)

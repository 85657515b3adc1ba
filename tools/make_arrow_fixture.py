#!/usr/bin/env python3
"""Regenerate the Arrow IPC interop fixture read by ArrowIpcSpec.

The fixture is a pyarrow-written STREAM-format file (.arrows) covering
the type subset sources.ArrowIpc supports — int64, float64, float32,
utf8, binary, list<float32> — with nulls, empty strings/lists, unicode,
and TWO record batches (so the reader's batch loop is exercised).

Run: python3 tools/make_arrow_fixture.py
Writes: src/main/resources/graft/fixtures/interop.arrows
"""
import pyarrow as pa

schema = pa.schema([
    pa.field("id", pa.int64(), nullable=True),
    pa.field("score", pa.float64(), nullable=True),
    pa.field("ratio", pa.float32(), nullable=True),
    pa.field("text", pa.utf8(), nullable=True),
    pa.field("payload", pa.binary(), nullable=True),
    pa.field("emb", pa.list_(pa.field("item", pa.float32(), nullable=True)),
             nullable=True),
])

b1 = pa.record_batch([
    pa.array([1, None, 3], type=pa.int64()),
    pa.array([1.5, -2.25, None], type=pa.float64()),
    pa.array([0.5, None, 7.75], type=pa.float32()),
    pa.array(["hello", "", None], type=pa.utf8()),
    pa.array([b"\x00\x01\xff", None, b""], type=pa.binary()),
    pa.array([[1.0, 2.5], None, []],
             type=pa.list_(pa.field("item", pa.float32(), nullable=True))),
], schema=schema)

b2 = pa.record_batch([
    pa.array([42, 43], type=pa.int64()),
    pa.array([3.125, 0.0], type=pa.float64()),
    pa.array([-1.5, 2.0], type=pa.float32()),
    pa.array(["naïve 日本語", "z"], type=pa.utf8()),
    pa.array([b"abc", b"\x7f"], type=pa.binary()),
    pa.array([[0.25], [9.0, -8.5, 7.0]],
             type=pa.list_(pa.field("item", pa.float32(), nullable=True))),
], schema=schema)

out = "src/main/resources/graft/fixtures/interop.arrows"
with pa.ipc.new_stream(out, schema) as w:
    w.write_batch(b1)
    w.write_batch(b2)
print("wrote", out)

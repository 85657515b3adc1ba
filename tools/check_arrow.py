#!/usr/bin/env python3
"""Validate graft-written Arrow IPC shards with pyarrow (the reverse
half of the ArrowIpc interop contract; the forward half is
ArrowIpcSpec decoding the pyarrow-written fixture).

Usage: python3 tools/check_arrow.py <dir-with-part-*.arrows>

Reads every shard with pyarrow.ipc.open_stream and prints schema + row
counts; any framing/flatbuffer/layout error raises loudly.
"""
import sys, glob
import pyarrow as pa
import pyarrow.ipc

d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/arrow_out"
total = 0
for f in sorted(glob.glob(f"{d}/part-*.arrows")):
    with pa.ipc.open_stream(f) as r:
        t = r.read_all()
    t.validate(full=True)
    total += t.num_rows
    print(f, t.num_rows, t.schema.names)
print("OK", total, "rows")

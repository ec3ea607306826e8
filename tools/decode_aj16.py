#!/usr/bin/env python3
"""Decode the reference's Adobe-Japan1-6.map (gzip'd Haskell Data.Binary
Map Int ByteString) to study which CID ranges our derivation misses.

Data.Binary encoding: Map = Int64 BE count, then (key, value) pairs in
ascending key order; Int is Int64 BE; lazy ByteString = Int64 BE length +
bytes.
"""
import gzip, struct, sys, json

raw = gzip.open("/root/reference/data/map/Adobe-Japan1-6.map").read()
off = 0
def u64():
    global off
    v = struct.unpack_from(">q", raw, off)[0]
    off += 8
    return v

n = u64()
m = {}
for _ in range(n):
    k = u64()
    ln = u64()
    v = raw[off:off+ln]; off += ln
    m[k] = v.decode("utf-8", "replace")

print("entries:", len(m), "min:", min(m), "max:", max(m), file=sys.stderr)
json.dump(m, open(sys.argv[1], "w") if len(sys.argv) > 1 else sys.stdout,
          ensure_ascii=False)

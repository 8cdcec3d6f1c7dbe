"""Decode the ``qz`` field of a driver BENCH_r*.json artifact.

The bench line carries EVERY per-query timing compressed into ``qz``
(see bench.py: sorted names + int centiseconds, zlib+base64) because a
flat full-name map cannot fit the driver's 2000-char stdout tail. This
prints the full name → seconds map, slowest first.

Usage: python tools/decode_bench.py BENCH_r06.json
       python tools/decode_bench.py            # newest BENCH_r*.json
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import decode_qz  # noqa: E402


def main() -> int:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        arts = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
        if not arts:
            print("no BENCH_r*.json found", file=sys.stderr)
            return 1
        path = arts[-1]
    art = json.loads(open(path).read())
    # `parsed` can EXIST with value null (pre-qz artifacts whose line
    # overflowed the tail) — .get's default only covers a missing key
    parsed = art.get("parsed") or art
    qz = parsed.get("qz")
    if not qz:
        print(f"{path}: no qz field (pre-r6 artifact?)", file=sys.stderr)
        return 1
    times = decode_qz(qz)
    for name, sec in sorted(times.items(), key=lambda kv: kv[1], reverse=True):
        print(f"{sec:8.2f}  {name}")
    print(f"\n{len(times)} queries, {sum(times.values()):.2f} s total ({path})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

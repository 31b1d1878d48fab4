#!/usr/bin/env python3
"""Regenerate src/main/resources/graft/bench_ref.txt from a clean,
idle-machine, fresh-JVM bench record (the judge-verified clean pair of
the round). The file arms Bench's parallelism-collapse tripwire: each
line is `<query> <best wall s> <best cpu s>`; the `# sf` header pins
the scale factor the signature is valid for (the tripwire disarms on
any other corpus).

Since r19 Bench records cpu_s as the BEST run's own CPU (it was the
min across runs before), so the (wall, cpu) pair written here is a
single run's true parallelism signature — not a cross-run mix that
could shift rule A's arming threshold (r18 advice). Only regenerate
from records produced by an r19+ Bench.

usage: tools/gen_bench_ref.py BENCH_rNN_clean.json
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r17_clean.json"
d = json.load(open(src))
assert d.get("fresh_jvm") is True, f"{src} is not a fresh-JVM record"
assert not d.get("tainted"), f"{src} is itself tainted: {d['tainted']}"
queries, cpus = d["queries"], d["cpu_s"]
out = "src/main/resources/graft/bench_ref.txt"
with open(out, "w") as f:
    f.write(f"# clean-pair cpu/wall reference, generated from {src}\n")
    f.write(f"# sf {d['sf']}\n")
    for name in sorted(queries):
        w, c = queries[name], cpus.get(name, -1)
        if isinstance(w, (int, float)) and isinstance(c, (int, float)) and w > 0 and c >= 0:
            f.write(f"{name} {w} {c}\n")
print(f"wrote {out}: {len(queries)} queries from {src} (sf {d['sf']})")

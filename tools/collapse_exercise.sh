#!/bin/bash
# Prove the parallelism-collapse tripwire fires end-to-end (round-18,
# r17 verdict item 1): pin the bench to ONE core — the starvation class
# (cgroup CPU quota / core mask / memory-bus contention) that inflates
# walls while external CPU stays near ZERO, which the ext-CPU taint is
# blind to by construction. Asserts the emitted record carries the
# starved query in both `collapsed` and `tainted`.
#
# Must run at the committed bench_ref SF (the tripwire disarms on any
# other corpus). The subset pairs a rule-B trigger (t79: short clean
# wall, heavy under starvation) with a fast control query.
#
# usage: tools/collapse_exercise.sh [outFile] [cpuList]
set -u
OUT="${1:-TAINT_collapse_exercise.json}"
CPUS="${2:-0}"

SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
SPARK_GRAFT_BENCH_ONLY="${SPARK_GRAFT_BENCH_ONLY:-q01,t79}" \
SPARK_GRAFT_BENCH_REPEAT=1 \
SPARK_GRAFT_BENCH_OUT="$OUT" \
  taskset -c "$CPUS" tools/runmain.sh graft.Bench > /dev/null 2>&1

python3 - "$OUT" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
assert d["fresh_jvm"] is True, "bench did not run in the fresh child JVM"
assert d["collapse_armed"] is True, "collapse tripwire was not armed (SF mismatch or missing bench_ref)"
assert d["collapsed"], f"core-masked run was NOT collapse-tainted: cpu_s={d['cpu_s']}"
assert set(d["collapsed"]) <= set(d["tainted"]), "collapsed names missing from tainted"
print(f"collapse exercise PASSED: collapsed={d['collapsed']} "
      f"ext_cpu_total={d['ext_cpu_total']}s (the ext-CPU check alone saw nothing)")
EOF

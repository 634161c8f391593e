#!/bin/bash
# Two-cluster-size scaling evidence (sandbox stand-in for N vs 4N
# executors): the same job on the same input at local[2] and local[8]
# (and local[32] for the saturation point), each level in its OWN JVM —
# back-to-back sessions in one JVM contaminate the second measurement
# via accumulated heap/GC state, and generation must not share the JVM
# with a timed run.
set -e
EVENTS=${SPARK_GRAFT_BENCH_EVENTS:-12000000}
RAW=${SPARK_GRAFT_BENCH_RAW:-/tmp/cdc-raw-$EVENTS/raw}
LEVELS=${SPARK_GRAFT_BENCH_LEVELS:-"2 8 32"}
OUT=${1:-/tmp/scaling_bench.jsonl}
: > "$OUT"

if [ ! -d "$RAW" ]; then
  # generation-only invocation (its JVM exits before any timed run)
  SPARK_GRAFT_BENCH_EVENTS=$EVENTS SPARK_GRAFT_BENCH_RAW=$RAW \
  SPARK_GRAFT_BENCH_CORES="" SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
    sbt -batch "runMain graft.CdcBench" >/dev/null 2>&1 || true
fi

for CORES in $LEVELS; do
  # pin the whole JVM to exactly CORES cpus: otherwise GC / netty /
  # codegen threads of a local[N] run spill onto the other host cores and
  # inflate small-N throughput (an N-core executor has N cores, full stop)
  LAST=$((CORES - 1))
  SPARK_GRAFT_BENCH_EVENTS=$EVENTS SPARK_GRAFT_BENCH_RAW=$RAW \
  SPARK_GRAFT_BENCH_CORES=$CORES SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
    taskset -c 0-$LAST sbt -batch "runMain graft.CdcBench" 2>/dev/null \
    | sed -n 's/^\[info\] \({.*\)$/\1/p' | grep '"metric"' >> "$OUT"
done

python3 - "$OUT" <<'EOF'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1])]
runs.sort(key=lambda r: r["cores"])
out = {"metric": "cdc_scaling", "runs": runs}
pairs = [(a, b) for a in runs for b in runs if b["cores"] == 4 * a["cores"]]
for a, b in pairs:
    out[f"eff_{a['cores']}to{b['cores']}"] = round(
        (b["eventsPerSec"] / a["eventsPerSec"]) / 4, 3)
print(json.dumps(out))
EOF

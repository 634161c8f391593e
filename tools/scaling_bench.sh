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

ITERS=${SPARK_GRAFT_BENCH_ITERS:-3}
for i in $(seq 1 $ITERS); do
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
done

# best-of-N per level: the sandbox VM shows ±30% run-to-run noise
# (shared-host steal); best-of isolates the machine's noise floor.
python3 - "$OUT" <<'EOF'
import json, sys
runs = [json.loads(l) for l in open(sys.argv[1])]
best = {}
for r in runs:
    c = r["cores"]
    if c not in best or r["eventsPerSec"] > best[c]["eventsPerSec"]:
        best[c] = r
levels = sorted(best)
out = {"metric": "cdc_scaling",
       "best": [best[c] for c in levels],
       "allRuns": [{"cores": r["cores"], "eventsPerSec": r["eventsPerSec"]} for r in runs]}
for a in levels:
    if 4 * a in best:
        out[f"eff_{a}to{4*a}"] = round(
            (best[4*a]["eventsPerSec"] / best[a]["eventsPerSec"]) / 4, 3)
print(json.dumps(out))
EOF

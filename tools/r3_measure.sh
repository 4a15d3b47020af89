#!/bin/bash
# Round-3 on-TPU measurement queue — run when the axon tunnel is up.
# Serializes the probes (each first-compile starves the single-core Mosaic
# compile helper if run concurrently).  Outputs land in /tmp/r3_measure/.
set -u
OUT=${1:-/tmp/r3_measure}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 2400 "$@" > "$OUT/$name.log" 2>&1
  echo "exit=$? ($name)"
  tail -15 "$OUT/$name.log"
}

run smoke      python tools/tpu_smoke.py
# Session-3 queue: splat sum-rule/dyn-chunk variants, the force-span gap probe,
# and the 16M plane-resident config (never yet timed on-chip).
run splat9     python -u protos/time_splat9.py 32
run forces2    python -u protos/time_forces2.py 32
run bench16m   python -u tools/bench_16m.py

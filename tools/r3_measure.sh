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
run variants   python protos/time_plane_variants.py 30
run rebin_v5v6 python protos/time_rebin_v5split.py 64 1.3 8,128 32
run splat_tcs  python protos/time_splat5.py 64
run splat4     python protos/time_splat4.py 64

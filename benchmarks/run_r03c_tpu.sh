#!/bin/bash
# Round-3c: retry config5 (bdg through the jit boundary — closure arrays
# were inlined into the remote-compile upload, HTTP 413) and the scale
# sweep (device_time instead of an x-carrying scan, which OOMed at 10M),
# both now on the device-fill block-dense build path.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r03c_${name}.log" 2>&1
  echo "=== $name exit $? ($(date +%H:%M:%S)) ==="
  tail -3 "/tmp/r03c_${name}.log" | grep -v WARNING || true
}

run probe python -c "import jax, jax.numpy as j; print(float(j.sum(j.arange(8.0))), jax.devices()[0].platform)"
grep -q "tpu" /tmp/r03c_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

run config5_smoke python benchmarks/config5_r03.py --nodes 4096 --iters 2 --out /tmp/config5_smoke.json
run config5 python benchmarks/config5_r03.py
run scale python benchmarks/scale_sweep_r03.py

echo "ALL DONE"

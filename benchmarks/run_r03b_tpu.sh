#!/bin/bash
# Round-3b TPU refresh: re-measure every artifact with value-synced
# scan-diff timing (block_until_ready on the axon tunnel acknowledges
# enqueue, not execution — benchmarks/_timing.py). Serial: ONE TPU
# client at a time. Logs to /tmp/r03b_<name>.log; continues on failure.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r03b_${name}.log" 2>&1
  echo "=== $name exit $? ($(date +%H:%M:%S)) ==="
  tail -3 "/tmp/r03b_${name}.log" | grep -v WARNING || true
}

run probe python -c "import jax, jax.numpy as j; print(float(j.sum(j.arange(8.0))), jax.devices()[0].platform)"
grep -q "tpu" /tmp/r03b_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 1. config5 smoke at 4k validates the OOM fix + rewritten timing cheaply
run config5_smoke python benchmarks/config5_r03.py --nodes 4096 --iters 2 --out /tmp/config5_smoke.json

# 2. config5 full 1M (the OOM fix target)
run config5 python benchmarks/config5_r03.py

# 3. scale sweep with honest timing
run scale python benchmarks/scale_sweep_r03.py

# 4. trained-draft speculation, honest timing
run spec python benchmarks/spec_trained.py

# 5. suite refresh (graphsage fix + device_time rows)
run suite python benchmarks/suite.py --json BENCH_SUITE.json

# 6. headline bench (gate-row loop lengths fixed)
run bench python bench.py

echo "ALL DONE"

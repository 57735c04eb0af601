#!/bin/bash
# Round-3e: chain-integrity self-check, then re-measure scale/suite/config5
# with the 1e-38 carry chains (the *0.0 chains were algebraically folded
# under --xla_allow_excess_precision and bodies got DCE'd), the deg/pad
# unit-lane operands removed (128x tile padding — 4.77 GB at 10M), and
# the fused gated-MHA Pallas kernel in config5's forward paths.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "${STEP_TIMEOUT:-5400}" "$@" > "/tmp/r03e_${name}.log" 2>&1
  echo "=== $name exit $? ($(date +%H:%M:%S)) ==="
  tail -3 "/tmp/r03e_${name}.log" | grep -v WARNING || true
}

run probe python -c "import jax, jax.numpy as j; print(float(j.sum(j.arange(8.0))), jax.devices()[0].platform)"
grep -q "tpu" /tmp/r03e_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 0. timing self-check: device_time on a known matmul must land near the
# bf16 roofline AND scale linearly with iteration count
run timecheck python - <<'EOF'
import sys; sys.path.insert(0, 'benchmarks')
import jax.numpy as jnp
from _timing import device_time
x = jnp.ones((4096, 4096), jnp.bfloat16)
step = lambda x: (x @ x) * (1.0 / 4096)
d1 = device_time(step, x, short=3, long=23)
d2 = device_time(step, x, short=3, long=43)
tf = 137.4e9 / d1 / 1e12
print(f"device_time: {d1*1e3:.3f} ms ({tf:.1f} TFLOP/s), 2x-iters ratio {d2/d1:.2f}")
assert 30 < tf < 200, tf          # physically sane for a v5e bf16 matmul
assert 0.7 < d2 / d1 < 1.4, (d1, d2)   # per-iteration time is stable
print("CHAIN OK")
EOF
grep -q "CHAIN OK" /tmp/r03e_timecheck.log || { echo "TIMING CHAIN BROKEN - aborting"; exit 1; }

run config5_smoke python benchmarks/config5_r03.py --nodes 4096 --iters 2 --out /tmp/config5_smoke.json
run config5 python benchmarks/config5_r03.py
run scale python benchmarks/scale_sweep_r03.py
run suite python benchmarks/suite.py --json BENCH_SUITE.json
run bench python bench.py

echo "ALL DONE"

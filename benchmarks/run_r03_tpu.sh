#!/bin/bash
# Round-3 TPU artifact refresh — run serially (ONE TPU client at a time;
# two concurrent clients wedge the axon tunnel). Each step logs to
# /tmp/r03_<name>.log and continues on failure.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "${STEP_TIMEOUT:-3600}" "$@" > "/tmp/r03_${name}.log" 2>&1
  echo "=== $name exit $? ($(date +%H:%M:%S)) ==="
  tail -3 "/tmp/r03_${name}.log" | grep -v WARNING || true
}

# 0. tiny probe (fails fast if the tunnel is down)
run probe python -c "import jax, jax.numpy as j; print(float(j.sum(j.arange(8.0))), jax.devices()[0].platform)"
grep -q "tpu" /tmp/r03_probe.log || { echo "TUNNEL DOWN - aborting"; exit 1; }

# 1. headline bench (also enforces perf gates + roofline row)
run bench python bench.py

# 2. config-5 with temporal gate reuse (smoke at 4k first, then 1M)
run config5_smoke python benchmarks/config5_r03.py --nodes 4096 --iters 2 --out /tmp/config5_smoke.json
run config5 python benchmarks/config5_r03.py

# 3. north-star scale sweep with end-to-end stand-up times
run scale python benchmarks/scale_sweep_r03.py

# 4. attention latency incl. the CGT batch-32 row
run attn python benchmarks/attention_latency.py --json ATTENTION_BENCH.json

# 5. trained-draft speculative decoding on the chip
run spec python benchmarks/spec_trained.py

# 6. full suite refresh
run suite python benchmarks/suite.py --json BENCH_SUITE.json

echo "ALL DONE"

# commit the refreshed measurement artifacts (JSON records only)
cd /root/repo
git add -A ./*.json 2>/dev/null
git commit -q -m "Round-3 TPU artifact refresh (bench/config5/scale/attention/spec/suite)

No-Verification-Needed: measurement JSON artifacts only, no code" || true
git log --oneline -1

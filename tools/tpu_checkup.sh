#!/bin/bash
# One-shot TPU validation + profiling run for when the axon tunnel is up.
# Produces: /tmp/bench_tpu.json (driver metric), /tmp/bench_tpu.err
# (enc/dec split + serving diagnostic), /tmp/phase_tpu.err (encode batch
# phase timing), /tmp/serve_phase.err (serving phase timing).
set -x
cd /root/repo
timeout 30 python -c "import jax; print(jax.devices())" || { echo "TUNNEL DOWN"; exit 1; }
# 1. full bench (kernel probe runs inside; falls back to scan on Mosaic failure)
timeout 900 python bench.py > /tmp/bench_tpu.json 2> /tmp/bench_tpu.err
tail -3 /tmp/bench_tpu.err; cat /tmp/bench_tpu.json
# 2. single-stream batch phase timing (16 frames, 1080p)
SPTC_TIMING=1 BENCH_SERVING=0 timeout 700 python bench.py > /dev/null 2> /tmp/phase_tpu.err
grep sptc-timing /tmp/phase_tpu.err | tail -24
# 3. serving phase timing at the 64x360p profile
SPTC_TIMING=1 BENCH_SERVE_STEPS=2 timeout 700 python - > /dev/null 2> /tmp/serve_phase.err <<'EOF'
import bench
bench._enable_compile_cache()
bench.serving_diag()
EOF
grep -E "sptc-timing|bench-serving" /tmp/serve_phase.err | tail -30

#!/bin/bash
# Serialized TPU measurement queue — run when the axon tunnel is healthy
# (round 3 staged these; the tunnel wedged 2026-08-17 21:07 UTC before
# they could run — BASELINE.md "staged but not yet run" entries).
# One chip-toucher at a time; each prints ONE JSON line.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== probe $(date -u) ==="
timeout 300 python -c "import jax; print('devices:', jax.devices())" || exit 1
echo "=== default bench (bf16 headline + interleaved int8 extras) ==="
timeout 3000 python bench.py
echo "=== BENCH_MODE=int8_xunet (segmentation executor A/B) ==="
BENCH_MODE=int8_xunet timeout 3000 python bench.py
echo "=== flagship entry compile check ==="
timeout 1200 python __graft_entry__.py
echo "=== done $(date -u) ==="

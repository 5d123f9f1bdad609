#!/bin/bash
# Serialized TPU measurement queue — run when the axon tunnel is healthy.
# One chip-toucher at a time; each prints ONE JSON line.
# (The round-3 wedge-blocked entries ran on recovery 2026-08-19 02:24 UTC;
# results in BASELINE.md. Later additions keep the queue current.)
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== probe $(date -u) ==="
timeout 300 python -c "import jax; print('devices:', jax.devices())" || exit 1
echo "=== default bench (bf16 headline + interleaved int8 extras) ==="
timeout 3000 python bench.py
echo "=== BENCH_MODE=int8_xunet (segmentation executor A/B) ==="
BENCH_MODE=int8_xunet timeout 3000 python bench.py
echo "=== BENCH_MODE=int8_src864 (XYZ crop→resize geometry, int8 A/B) ==="
BENCH_MODE=int8_src864 timeout 3000 python bench.py
echo "=== BENCH_MODE=int8_tta (full TTA ladder, int8 A/B) ==="
BENCH_MODE=int8_tta timeout 3000 python bench.py
echo "=== BENCH_MODE=resize_ab (src864 MXU matmul resize vs f32 gather) ==="
BENCH_MODE=resize_ab timeout 3000 python bench.py
echo "=== BENCH_MODE=multiscale (3-scale union NMS, MXU vs gather rescale) ==="
BENCH_MODE=multiscale timeout 3000 python bench.py
echo "=== flagship entry compile check ==="
timeout 1200 python __graft_entry__.py
echo "=== done $(date -u) ==="

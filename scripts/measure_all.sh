#!/bin/bash
# Round-2 measurement runbook: run after the chip is free.
# Results land in /tmp/bench_r2/.
set -u
mkdir -p /tmp/bench_r2
cd /root/repo

echo "=== stage breakdown (batch 64) ==="
timeout 1200 python scripts/bench_stages.py --batch 64 --iters 20 \
    2>&1 | tee /tmp/bench_r2/stages_b64.txt

echo "=== e2e int8 batch 64 ==="
timeout 900 env VICKERS_BENCH_QUANT=1 python bench.py \
    2>&1 | tee /tmp/bench_r2/e2e_int8_b64.txt
echo "=== e2e bf16 batch 64 ==="
timeout 900 env VICKERS_BENCH_QUANT=0 python bench.py \
    2>&1 | tee /tmp/bench_r2/e2e_bf16_b64.txt
echo "=== e2e int8 batch 128 ==="
timeout 900 env VICKERS_BENCH_QUANT=1 VICKERS_BENCH_BATCH=128 python bench.py \
    2>&1 | tee /tmp/bench_r2/e2e_int8_b128.txt
echo "=== e2e int8 batch 256 ==="
timeout 900 env VICKERS_BENCH_QUANT=1 VICKERS_BENCH_BATCH=256 python bench.py \
    2>&1 | tee /tmp/bench_r2/e2e_int8_b256.txt
echo "done"

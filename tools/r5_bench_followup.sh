#!/bin/bash
# Follow-ups for the r5 batch: entries that hit the 40-min compile timeout
# (sdxl e2e/serving — the relay compile helper degraded to ~25-min
# SDXL-size compiles) or OOMed at batch 8 with text towers resident
# (pixart/sd3 e2e — T5-XXL/16-ch-VAE stacks need batch 4).
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/flash_tpu_jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
L=${1:-/tmp/r5_bench_followup.log}
{
echo "=== e2e sdxl b8 chunk2 (3600) ===";  timeout 3600 python bench.py --e2e --model sdxl --batch 8 --decode-chunk 2 --iters 4
echo "=== serving sdxl b8 chunk2 (3600) ==="; timeout 3600 python bench.py --serving --model sdxl --batch 8 --decode-chunk 2 --iters 4
echo "=== e2e pixart b4 chunk2 ===";       timeout 3600 python bench.py --e2e --model pixart --batch 4 --decode-chunk 2 --iters 4
echo "=== e2e sd3 b4 chunk2 ===";          timeout 3600 python bench.py --e2e --model sd3 --batch 4 --decode-chunk 2 --iters 4
echo "=== serving pixart b4 chunk2 ===";   timeout 3600 python bench.py --serving --model pixart --batch 4 --decode-chunk 2 --iters 4
echo "=== serving sd3 b4 chunk2 ===";      timeout 3600 python bench.py --serving --model sd3 --batch 4 --decode-chunk 2 --iters 4
echo DONE
} >> "$L" 2>&1

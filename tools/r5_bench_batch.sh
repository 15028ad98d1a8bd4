#!/bin/bash
# Round-5 measurement batch (VERDICT r4 #2/#3/#7): headline x4, train x4,
# e2e x4 (+sd3 --t5 operating point), serving x4. One TPU job at a time
# (single-tenant tunnel). Each line prints one JSON record to the log.
cd /root/repo
# persistent compile cache: e2e and serving share generate graphs, and the
# driver's end-of-round bench.py rides the same cache
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/flash_tpu_jax_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
L=${1:-/tmp/r5_bench_batch.log}
{
echo "=== headline sdxl ===";  timeout 1800 python bench.py --model sdxl
echo "=== headline sd3 ===";   timeout 1800 python bench.py --model sd3
echo "=== headline pixart ==="; timeout 1800 python bench.py --model pixart
echo "=== headline sd15 ===";  timeout 1800 python bench.py --model sd15
echo "=== train sd15 K32 ==="; timeout 2400 python bench.py --train --model sd15
echo "=== train sdxl K32 ==="; timeout 2400 python bench.py --train --model sdxl
echo "=== train pixart K16 ==="; timeout 2400 python bench.py --train --model pixart --k 16
echo "=== train sd3 K32 ===";  timeout 2400 python bench.py --train --model sd3
echo "=== e2e sdxl b8 chunk4 ==="; timeout 2400 python bench.py --e2e --model sdxl --batch 8 --decode-chunk 4 --iters 4
echo "=== e2e sd15 b8 ===";    timeout 2400 python bench.py --e2e --model sd15 --batch 8 --iters 4
echo "=== e2e pixart b8 chunk4 ==="; timeout 2400 python bench.py --e2e --model pixart --batch 8 --decode-chunk 4 --iters 4
echo "=== e2e sd3 b8 chunk4 ==="; timeout 2400 python bench.py --e2e --model sd3 --batch 8 --decode-chunk 4 --iters 4
echo "=== e2e sd3 t5 b2 chunk1 ==="; timeout 2400 python bench.py --e2e --model sd3 --t5 --batch 2 --decode-chunk 1 --iters 4
echo "=== serving sdxl b8 chunk4 ==="; timeout 2400 python bench.py --serving --model sdxl --batch 8 --decode-chunk 4 --iters 4
echo "=== serving sd15 b8 ==="; timeout 2400 python bench.py --serving --model sd15 --batch 8 --iters 4
echo "=== serving pixart b8 chunk4 ==="; timeout 2400 python bench.py --serving --model pixart --batch 8 --decode-chunk 4 --iters 4
echo "=== serving sd3 b8 chunk4 ==="; timeout 2400 python bench.py --serving --model sd3 --batch 8 --decode-chunk 4 --iters 4
echo DONE
} >> "$L" 2>&1

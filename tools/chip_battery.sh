#!/bin/bash
# Round-2 measurement battery — run when the TPU tunnel is back.
# Collects bench + A/Bs + traces into /tmp/chip_battery/.
set -u
OUT=/tmp/chip_battery
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "=== 1. bench (warm the serve cache for the driver) ==="
timeout 3000 python bench.py >$OUT/bench.txt 2>&1
tail -2 $OUT/bench.txt

echo "=== 2. tower attention A/B (routing decision) ==="
timeout 1800 python tools/ab_tower_attention.py >$OUT/ab_tower.txt 2>&1
tail -6 $OUT/ab_tower.txt

echo "=== 3. serve trace (fusion ops gone? next hotspots) ==="
rm -rf /tmp/serve_trace
timeout 1800 python tools/profile_serve.py >$OUT/serve_trace.txt 2>&1
TRACE=$(grep TRACE $OUT/serve_trace.txt | tail -1 | awk '{print $2}')
[ -n "$TRACE" ] && python tools/xplane_summary.py "$TRACE" 40 \
    >$OUT/serve_ops.txt 2>&1 && head -5 $OUT/serve_ops.txt

echo "=== 4. panoptic stage trace ==="
rm -rf /tmp/pan_trace
timeout 1800 python tools/profile_panoptic.py >$OUT/pan_trace.txt 2>&1
TRACE=$(grep TRACE $OUT/pan_trace.txt | tail -1 | awk '{print $2}')
[ -n "$TRACE" ] && python tools/xplane_summary.py "$TRACE" 40 \
    >$OUT/pan_ops.txt 2>&1 && head -5 $OUT/pan_ops.txt

echo "=== 5. batched + joint-memory serving A/B ==="
BENCH_MANY=4 timeout 1500 python bench.py >$OUT/bench_many.txt 2>&1
tail -2 $OUT/bench_many.txt
BENCH_INIT_VIEWS=4 timeout 1500 python bench.py >$OUT/bench_jointmem.txt 2>&1
tail -2 $OUT/bench_jointmem.txt

echo "=== 6. train step (kernel changes affect fwd) ==="
timeout 1800 python tools/train_step_bench.py >$OUT/train_step.txt 2>&1
tail -5 $OUT/train_step.txt

echo "battery done -> $OUT"

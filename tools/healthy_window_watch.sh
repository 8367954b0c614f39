#!/bin/bash
# Wait for a healthy (unthrottled) CPU window, then run the full sf0.1
# bench and the 2-vs-8 scaling protocol back-to-back. This VM is
# intermittently hypervisor-throttled (single-core 1500^2 matmul: ~0.18s
# healthy, >0.45s degraded); bench artifacts taken in a degraded window
# mis-state cross-round regressions, so measurement waits for health.
# Usage: tools/healthy_window_watch.sh [threshold_sec=0.28] [max_wait_min=150]
set -u
cd /root/repo
THRESH=${1:-0.28}
MAXWAIT=${2:-150}
probe() {
  python - <<'EOF'
import time, numpy as np
a = np.ones((1500, 1500))
vals = []
for _ in range(3):
    t0 = time.perf_counter(); a @ a; vals.append(time.perf_counter() - t0)
print(round(sorted(vals)[1], 3))
EOF
}
start=$(date +%s)
while true; do
  c=$(probe)
  now=$(date +%s)
  waited=$(( (now - start) / 60 ))
  echo "$(date +%H:%M:%S) calib=${c}s waited=${waited}m"
  if python -c "import sys; sys.exit(0 if float('$c') < float('$THRESH') else 1)"; then
    echo "healthy window detected (calib=$c) — running bench"
    break
  fi
  if [ "$waited" -ge "$MAXWAIT" ]; then
    echo "max wait exceeded — running bench anyway (degraded, calib=$c)"
    break
  fi
  sleep 120
done
python bench.py > /tmp/bench_r4_healthy.log 2>&1
echo "bench done: $(tail -1 /tmp/bench_r4_healthy.log | head -c 200)"
python bench.py --scaling > /tmp/scaling_r4.log 2>&1
echo "scaling done: $(tail -1 /tmp/scaling_r4.log | head -c 300)"

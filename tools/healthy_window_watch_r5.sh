#!/bin/bash
# Round-5 healthy-window watcher. Probes the hypervisor throttle every
# 2 minutes; on the first healthy window (single-core 1500^2 matmul
# median < threshold) runs the 2-vs-8 scaling protocol and the full
# sf0.1 bench back-to-back, stamping calibration before and after each
# so the artifact proves the window held. Unlike the r4 watcher this
# one does NOT force-fire on timeout — a degraded artifact is already
# on record twice; only healthy evidence is worth committing.
# Usage: tools/healthy_window_watch_r5.sh [threshold_sec=0.28] [max_wait_min=290]
set -u
cd /root/repo
THRESH=${1:-0.28}
MAXWAIT=${2:-290}
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
    echo "healthy window detected (calib=$c) — running scaling then bench"
    break
  fi
  if [ "$waited" -ge "$MAXWAIT" ]; then
    echo "max wait exceeded without a healthy window — NOT running (degraded evidence already on record)"
    exit 2
  fi
  sleep 120
done
CALIB_START=$c
python bench.py --scaling > /tmp/scaling_r5.log 2>&1
SCALING_RC=$?
CALIB_MID=$(probe)
python bench.py > /tmp/bench_r5_healthy.log 2>&1
BENCH_RC=$?
CALIB_END=$(probe)
python - "$CALIB_START" "$CALIB_MID" "$CALIB_END" "$SCALING_RC" "$BENCH_RC" <<'EOF'
import json, sys
calib_start, calib_mid, calib_end = map(float, sys.argv[1:4])
scaling_rc, bench_rc = map(int, sys.argv[4:6])
out = {}
if scaling_rc == 0:
    line = open("/tmp/scaling_r5.log").read().strip().splitlines()[-1]
    d = json.loads(line)
    d["cpu_calibration_start_sec"] = calib_start
    d["cpu_calibration_mid_sec"] = calib_mid
    json.dump(d, open("BENCH/scaling_2_vs_8_r5.json", "w"), indent=1)
    out["scaling"] = {k: d.get(k) for k in ("scaling_efficiency", "scaling_efficiency_median")}
if bench_rc == 0:
    line = open("/tmp/bench_r5_healthy.log").read().strip().splitlines()[-1]
    d = json.loads(line)
    d["cpu_calibration_window_start_sec"] = calib_mid
    d["cpu_calibration_window_end_sec"] = calib_end
    json.dump(d, open("BENCH/bench_r5_healthy_sf0.1_cpus32.json", "w"), indent=1)
    out["bench_headline"] = d.get("value")
print("ARTIFACTS WRITTEN:", json.dumps(out))
EOF

# Rehearsal continuation #18 (2026-08-19): DPM serving-throughput rows.
# Waits for queue 17 (the quality curve) to release the chip, then times the
# DPM-Solver++(2M) serving points with perf_sweep (full-size flagship model,
# real chip).  Launch: nohup sh rehearsal/run_stages18.sh > /tmp/stages18.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

# Bounded wait: give up after 6 h rather than spinning forever if queue 17
# crashed before its final DONE echo (ADVICE r3 low finding).
deadline=$(( $(date +%s) + 21600 ))
while ! grep -q "STAGES17 DONE" /tmp/stages17.log 2>/dev/null; do
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 17 never finished within 6h — giving up"; exit 1
  fi
  sleep 20
done

timeout 1800 python script/perf_sweep.py \
  folded256_b8_ddim32 folded256_b8_dpm32 folded256_b8_dpm32_s15_band \
  > rehearsal/perf_dpm.log 2>&1
echo "STAGES18 exit=$? $(date -u)"

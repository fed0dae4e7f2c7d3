# Rehearsal queue 32 (round 5, after queue 31): on-chip smoke of bench.py
# after the round-5 review fixes (band_segments refactor + roofline note) —
# the driver's round-end bench run must not be the edited file's first
# execution.  Also a final suite-state snapshot for the cold-run docs.
# Launch: nohup sh rehearsal/run_stages32.sh > /tmp/stages32.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

i=0
until grep -q "STAGES31 DONE" /tmp/stages31.log 2>/dev/null; do
  i=$((i+1)); [ $i -gt 2160 ] && { echo "queue 31 never finished"; exit 1; }
  sleep 20
done
echo "=== queue 31 done, starting 32 $(date -u +%H:%M:%S) ==="

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

run bench_smoke_r5 1800 python bench.py
tail -1 rehearsal/bench_smoke_r5.log

echo "STAGES32 DONE $(date -u)"

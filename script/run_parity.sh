# Weights-available parity runbook: run every staged gate in order and emit
# one JSON verdict (SKIPPED gates list the exact missing checkpoint files).
# usage: sh script/run_parity.sh [CKPT_DIR] [flags...]
ckpt=${1:-checkpoints}; [ $# -ge 1 ] && shift
exec python script/run_parity.py --ckpt_dir "$ckpt" "$@"

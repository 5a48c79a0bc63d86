#!/usr/bin/env bash
# One-shot TPU measurement battery — run when the axon tunnel is up:
#   bash scripts/chip_battery.sh [outfile]
# Appends one section per mode to the log; each step is individually
# time-boxed so a hung tunnel cannot wedge the whole battery.
set -u
OUT="${1:-chip_battery.log}"
cd "$(dirname "$0")/.."

run() {
    local name="$1"; shift
    echo "=== $name @ $(date -u +%FT%TZ) ===" >> "$OUT"
    timeout "$BUDGET" "$@" >> "$OUT" 2>&1
    echo "--- rc=$? ---" >> "$OUT"
}

echo "==== chip battery start $(date -u +%FT%TZ) ====" >> "$OUT"
BUDGET=120  run probe   python -c "import jax; print(jax.devices())"
# 600: a code change that touches any traced program re-pays tunnel
# compiles even with the persistent cache (s5 + s6 both saw rc=124 at
# a 300 s box on the first post-change run)
BUDGET=600  run tiny    python -u bench.py --tiny
# LEAD LEG = the driver default since round 5: the literal BASELINE.json
# north star — two-phase MolQA (design + retro with the reference eval
# budgets). First run on a cold XLA cache pays ~15 min of tunnel
# compiles; the persistent cache makes repeat invocations warm
# (measured r4: 1452s cold -> see log warm)
BUDGET=2700 run molqa   python -u bench.py                  # driver default
BUDGET=900  run e2e     python -u bench.py --mode e2e       # Phase-1-only (kv8 on)
BUDGET=600  run denoise python -u bench.py --mode denoise
BUDGET=900  run serve   python -u bench.py --mode serve
BUDGET=900  run train   python -u bench.py --mode train
BUDGET=900  run retro   python -u bench.py --mode retro
# non-default parity legs (1200s: a 900s serve leg timed out when the
# 1-core host was shared with a pytest lane — compiles are client-side)
BUDGET=1200 run serve_kv8    python -u bench.py --mode serve --kv8
# bf16-KV e2e pins b96: b128 bf16 KV does not fit v5e HBM (measured
# s4-s6 — the OOM re-exec ladder recovers to 96 but pays a wasted
# ~10-min b128 compile first, blowing any sane box). b96 kv8 below is
# the apples-to-apples partner.
BUDGET=1800 run e2e_bf16kv   python -u bench.py --mode e2e --no-kv8 --batch 96
BUDGET=1200 run e2e_b96      python -u bench.py --mode e2e --batch 96
# learned-weights operating point: re-run the reference-protocol
# two-phase eval at the trained synth-stack checkpoint (train once with
# `python scripts/train_tiny_stack.py`; this leg only re-evals)
if [ -d saves/synth-stack/mmsft ]; then
    BUDGET=2700 run trained_stack python -u scripts/train_tiny_stack.py \
        --stages eval --stack-dir saves/synth-stack
fi
echo "==== chip battery done $(date -u +%FT%TZ) ====" >> "$OUT"
tail -40 "$OUT"

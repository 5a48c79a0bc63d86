#!/usr/bin/env bash
# Poll the axon TPU tunnel; when it answers, run the chip battery once.
#   bash scripts/tunnel_watch.sh [max_probes] [sleep_s]
# Exits 0 after a battery run, 1 if the tunnel never came back.
set -u
cd "$(dirname "$0")/.."
MAX="${1:-40}"
SLEEP="${2:-480}"
for i in $(seq 1 "$MAX"); do
    echo "probe $i/$MAX @ $(date -u +%FT%TZ)"
    if timeout 120 python -c "import jax; print(jax.devices())"; then
        echo "tunnel UP @ $(date -u +%FT%TZ) — running battery"
        bash scripts/chip_battery.sh chip_battery.log
        exit 0
    fi
    sleep "$SLEEP"
done
echo "tunnel never recovered after $MAX probes"
exit 1

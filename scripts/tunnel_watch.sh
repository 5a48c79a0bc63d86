#!/usr/bin/env bash
# Poll the axon TPU tunnel; when it answers, run the chip battery once
# (or a custom command via WATCH_CMD).
#   bash scripts/tunnel_watch.sh [max_probes] [sleep_s]
#   WATCH_CMD="python bench.py" bash scripts/tunnel_watch.sh 20 300
# Exits 0 after the run, 1 if the tunnel never came back.
#
# The probe must ALLOCATE AND SYNC, not just list devices: a wedged
# tunnel (measured r4) still answers jax.devices() while every real
# allocation hangs — a devices-only probe false-positives.
set -u
cd "$(dirname "$0")/.."
MAX="${1:-40}"
SLEEP="${2:-480}"
for i in $(seq 1 "$MAX"); do
    echo "probe $i/$MAX @ $(date -u +%FT%TZ)"
    if timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((1024, 1024, 64), jnp.bfloat16)   # 128 MB real allocation
assert float(np.asarray(x[0, 0, :2]).sum()) == 2.0  # forced sync
print('alloc+sync OK:', jax.devices())
"; then
        echo "tunnel UP @ $(date -u +%FT%TZ) — running"
        if [ -n "${WATCH_CMD:-}" ]; then
            eval "$WATCH_CMD"
        else
            bash scripts/chip_battery.sh chip_battery.log
        fi
        exit $?
    fi
    sleep "$SLEEP"
done
echo "tunnel never recovered after $MAX probes"
exit 1

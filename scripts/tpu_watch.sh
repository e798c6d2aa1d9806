#!/bin/bash
# Relay-revival watcher: probe the tunneled TPU every PERIOD seconds with
# a short liveness program; the moment a probe completes, hand off to the
# full measurement campaign (scripts/tpu_campaign.sh) and exit.
#
# One chip process at a time (rig rule): while this watcher is running,
# do NOT start any other chip process. The probe itself is the only chip
# process it spawns, strictly sequentially.
#
# Usage: bash scripts/tpu_watch.sh [logdir] [period_s]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_campaign}"
PERIOD="${2:-2400}"
mkdir -p "$LOG"
cd "$REPO"

say() { echo "[watch $(date +%H:%M:%S)] $*" | tee -a "$LOG/watch.log"; }

say "watcher start (probe period ${PERIOD}s)"
# Hard lifetime cap: the driver runs bench.py on the chip at round end,
# and a concurrent probe could wedge the relay session — die well before.
DEADLINE=$((SECONDS + ${3:-28800}))
n=0
while :; do
  if [ "$SECONDS" -ge "$DEADLINE" ]; then
    say "lifetime cap reached — exiting without campaign"
    exit 2
  fi
  n=$((n + 1))
  say "probe #$n"
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8), jnp.bfloat16)
print('alive:', jax.devices(), float((x @ x).block_until_ready()[0, 0]))
" >"$LOG/probe.log" 2>&1; then
    say "RELAY ALIVE: $(tail -1 "$LOG/probe.log")"
    say "starting campaign"
    bash scripts/tpu_campaign.sh "$LOG"
    say "campaign rc=$? — watcher exiting"
    exit 0
  fi
  say "probe #$n dead; sleeping ${PERIOD}s"
  sleep "$PERIOD"
done

#!/bin/bash
# On-chip measurement campaign for the content-adaptive device pipeline.
#
# Runs every pending measurement ONE CHIP PROCESS AT A TIME (two
# concurrent chip processes wedge this rig's relay session permanently —
# docs/design.md rule 6) with per-step timeouts, logging to a directory.
# Safe to re-run: XLA compiles persist in /tmp/sentencepiece_tpu_jax_cache,
# so a killed step's completed compiles still speed up the retry.
#
# Usage: bash scripts/tpu_campaign.sh [logdir]   (default /tmp/tpu_campaign)
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_campaign}"
mkdir -p "$LOG"
cd "$REPO"

say() { echo "[campaign $(date +%H:%M:%S)] $*" | tee -a "$LOG/campaign.log"; }

run_step() {  # run_step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  say "step $name (timeout ${tmo}s): $*"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  say "step $name done rc=$rc in $((SECONDS-t0))s -> $LOG/$name.log"
  return $rc
}

# 0. liveness: a tiny matmul must complete (backend init + dispatch +
#    readback). If this hangs, the relay is down — abort, don't queue
#    work into a dead session.
say "liveness probe"
if ! timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((8, 8), jnp.bfloat16)
print('alive:', jax.devices(), float((x @ x).block_until_ready()[0, 0]))
" >"$LOG/liveness.log" 2>&1; then
  say "RELAY DEAD (liveness probe hung/failed) — aborting campaign"
  exit 1
fi
say "relay alive: $(tail -1 "$LOG/liveness.log")"

# 1. the driver benchmark (both pipeline metrics, bit-exactness gated;
#    has its own wedge supervisor). Longest leash: cold compiles.
run_step bench 4800 python bench.py

# 2. stage localization: where does the pipeline's time go now?
for st in matmul full normalize walk encode populate scan smallbatch; do
  run_step "slowness_$st" 900 python scripts/probe_slowness.py "$st"
done

# 3. charsmap big-trie walk A/B: XOR-gather vs col_bits MXU one-hot.
run_step walk_mxu 900 env SPM_TPU_CHARSMAP_MXU=1 \
  python scripts/probe_slowness.py walk

# 4. gather cost model (per-op vs per-element; taa_mxu vs serial cases).
run_step gather 1200 python scripts/probe_gather.py

# 5. the Pallas question: XLA scan vs Mosaic kernel, bit-exactness gated.
run_step pallas_ab 1800 python scripts/ab_pallas_scan.py

# 6. device unigram EM train_step throughput (loop-program timing).
run_step em_chip 1200 python scripts/probe_em_chip.py

say "campaign complete; logs in $LOG"
say "next: update README (device-pipeline numbers), docs/design.md"
say "      (rule 7 cost model + the Pallas table) from these logs"

#!/bin/bash
# On-chip work queue: probe until the (possibly wedged) axon tunnel
# answers, then run queued chip work in a crash-safe order, logging to
# /tmp/onchip_queue.log. Run detached:
#   nohup scripts/dev/onchip_queue.sh & echo $! > /tmp/queue.pid
#
# ORDER MATTERS: known-safe paths (re-validation + serve table) run
# FIRST; the int4 Pallas probes run LAST because unproven Mosaic
# kernels can hard-crash the TPU worker (the int8 misalignment failure
# mode) and take the tunnel down with them. A probe after each risky
# step records whether the tunnel survived.
#
# Edit the phase lists below per session; this file is the durable
# recipe (round 9 contents kept as the example).
LOG=/tmp/onchip_queue.log
cd /root/repo || exit 1

probe() {
  timeout 150 python -c "import jax, jax.numpy as jnp; x=jnp.ones((256,256)); print(float((x@x)[0,0]))" >/dev/null 2>&1
}

echo "$(date +%H:%M:%S) queue runner start (safe-order v3)" >> "$LOG"
# Escalating backoff between probes: every failed probe is itself a
# hung client that the timeout SIGTERMs — the exact kill-mid-run
# pattern CLAUDE.md says can re-wedge the tunnel. Long fully-idle
# windows (up to 40 min) give it the best chance to recover.
SLEEP=600
until probe; do
  echo "$(date +%H:%M:%S) wedged (next probe in ${SLEEP}s)" >> "$LOG"
  sleep "$SLEEP"
  [ "$SLEEP" -lt 2400 ] && SLEEP=$((SLEEP + 600))
done
echo "$(date +%H:%M:%S) PROBE_OK — starting on-chip queue" >> "$LOG"

run() {
  local t="$1"; shift
  echo "=== $(date +%H:%M:%S) [timeout ${t}s] $*" >> "$LOG"
  timeout "$t" "$@" >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
  sleep 10
}

# Phase A: re-validation sweep (VERDICT item 8) — known-safe code paths.
# Outer timeouts must EXCEED bench.py's own guard worst case
# ((720s probe budget + inner timeout) x 2 attempts), or a mid-queue
# wedge gets the supervisor SIGTERM'd mid-retry — the exact mid-run
# kill CLAUDE.md warns causes the next wedge — and eats the structured
# error line. headline/int8 inner=1800 -> 5100; hessian/epig/knn
# inner=1500 -> 4500; family/serve inner=2400 -> 6300.
run 5100 python bench.py
run 4500 python bench.py --metric hessian
run 4500 python bench.py --metric epig
run 4500 python bench.py --metric knn
run 6300 python bench.py --metric family
run 5100 python bench.py --metric int8
# Phase B: serving AOT table (VERDICT item 6 numbers)
run 6300 python bench.py --metric serve
# Phase C: int4 experiments LAST (worker-crash risk)
echo "=== $(date +%H:%M:%S) phase C: int4 probes (crash-risk lane)" >> "$LOG"
run 1500 python scripts/dev/bench_int4_mxu.py
probe && echo "$(date +%H:%M:%S) post-int4mxu probe OK" >> "$LOG" \
      || echo "$(date +%H:%M:%S) post-int4mxu probe FAILED" >> "$LOG"
run 2400 python scripts/dev/bench_mlp_int4.py both
probe && echo "$(date +%H:%M:%S) post-mlpint4 probe OK" >> "$LOG" \
      || echo "$(date +%H:%M:%S) post-mlpint4 probe FAILED" >> "$LOG"
echo "$(date +%H:%M:%S) QUEUE DONE" >> "$LOG"

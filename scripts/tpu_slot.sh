# Shared TPU-slot discipline for background runner scripts.  Source me.
#
# Protocol (CLAUDE.md "Hard rules"):
#   * every python that may touch the TPU tunnel runs under
#     `flock /tmp/tpu.lock` — one TPU process at a time;
#   * the driver's bench.py raises /tmp/tpu.yield when it wants the chip
#     (round-2 verdict Weak #1: the official bench starved on the lock
#     behind a long A/B queue).  yield_wait blocks BETWEEN runs while the
#     sentinel exists, so bench only ever waits for the in-flight run.
#
# Usage in a runner:
#   source "$(dirname "$0")/tpu_slot.sh"
#   ...
#   yield_wait; flock "$LOCK" python ... # before every flocked python
LOCK=/tmp/tpu.lock
YIELD=/tmp/tpu.yield

yield_wait() {
  while [ -e "$YIELD" ]; do
    # Stale-sentinel guard: bench.py removes the sentinel at exit; if it
    # was SIGKILLed the file lingers.  Ignore (and clear) sentinels older
    # than 45 min — longer than any bench run, shorter than a queue.
    now=$(date +%s)
    mt=$(stat -c %Y "$YIELD" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt 2700 ]; then
      rm -f "$YIELD"
      break
    fi
    sleep 15
  done
}

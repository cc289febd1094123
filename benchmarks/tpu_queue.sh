#!/bin/bash
# Sequential TPU job queue: one real chip, contention corrupts chained
# timings, so every hardware measurement runs through here one at a time.
#
# Protocol (VERDICT r3 Weak #6 / ADVICE r3):
#   * flock on /tmp/tpu_queue.lock — a second invocation exits instead of
#     interleaving jobs and corrupting both runs' timings;
#   * a hard DEADLINE (first argument, seconds from now; default 3600):
#     jobs that would start after it are skipped and logged, so the chip
#     is free when the round driver fires its bench/multichip captures;
#   * per-run log prefix (queue run id) so committed logs are never a
#     mid-run mixture of two invocations.
#
# Usage: tpu_queue.sh [deadline_secs] [job ...]
#   jobs: device | coupling | train_mega | serving | bench  (default: all)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p benchmarks/queue_logs

exec 9>/tmp/tpu_queue.lock
if ! flock -n 9; then
    echo "tpu_queue: another queue holds the chip lock — refusing to run" >&2
    exit 1
fi

DEADLINE_SECS="${1:-3600}"
shift || true
JOBS=("$@")
[ ${#JOBS[@]} -eq 0 ] && JOBS=(device coupling train_mega serving bench)
DEADLINE=$(( $(date +%s) + DEADLINE_SECS ))
RUN_ID="$(date +%m%d_%H%M%S)"
QLOG="benchmarks/queue_logs/queue.log"

log() { echo "[$RUN_ID $(date +%H:%M:%S)] $*" >> "$QLOG"; }

run_job() {
    # run_job <name> <timeout> <cmd...>
    local name="$1" tmo="$2"; shift 2
    local now left
    now=$(date +%s); left=$(( DEADLINE - now ))
    if [ "$left" -le 60 ]; then
        log "$name SKIPPED (deadline: ${left}s left)"
        return 0
    fi
    [ "$tmo" -gt "$left" ] && tmo="$left"
    log "$name start (timeout ${tmo}s)"
    timeout "$tmo" "$@" > "benchmarks/queue_logs/${RUN_ID}_${name}.log" 2>&1
    log "$name done rc=$?"
}

log "queue start deadline=+${DEADLINE_SECS}s jobs=${JOBS[*]}"
for job in "${JOBS[@]}"; do
    case "$job" in
        device)
            run_job device_suite 1800 env GLOWTTS_RUN_DEVICE=1 \
                python -m pytest tests/test_device_parity.py -q ;;
        coupling)
            run_job coupling 2400 python benchmarks/profile_coupling.py ;;
        train_mega)
            run_job train_mega 2400 python benchmarks/profile_train_mega.py ;;
        serving)
            run_job serving 1800 python benchmarks/profile_serving.py ;;
        bench)
            run_job bench 1200 python bench.py ;;
        *)
            log "unknown job '$job' skipped" ;;
    esac
done
log "queue complete"

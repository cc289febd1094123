#!/bin/bash
# Sequential TPU job queue: one real chip, contention corrupts chained
# timings, so every hardware measurement runs through here one at a time.
# Each job is bounded; logs land in benchmarks/queue_logs/.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
mkdir -p benchmarks/queue_logs
log() { echo "[$(date +%H:%M:%S)] $*" >> benchmarks/queue_logs/queue.log; }

log "queue start"
log "1: profile_coupling"
timeout 2400 python benchmarks/profile_coupling.py \
    > benchmarks/queue_logs/coupling.log 2>&1
log "1 done rc=$?"

log "2: profile_train_mega"
timeout 2400 python benchmarks/profile_train_mega.py \
    > benchmarks/queue_logs/train_mega.log 2>&1
log "2 done rc=$?"

log "3: v8 convergence (curriculum)"
timeout 3000 python benchmarks/convergence_run.py \
    --corpus v8 --warmup 500 --freeze 2000 --lr 3e-4 --steps 8000 \
    --state-file /tmp/v8_state.pkl \
    --out benchmarks/convergence_v8_lock.json \
    > benchmarks/queue_logs/v8.log 2>&1
log "3 done rc=$?"

log "4: device parity suite"
GLOWTTS_RUN_DEVICE=1 timeout 1800 python -m pytest \
    tests/test_device_parity.py -q \
    > benchmarks/queue_logs/device_suite.log 2>&1
log "4 done rc=$?"

log "5: bench.py"
timeout 1800 python bench.py > benchmarks/queue_logs/bench.log 2>&1
log "5 done rc=$?"
log "queue complete"

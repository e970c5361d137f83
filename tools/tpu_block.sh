#!/bin/bash
# One-client-at-a-time TPU work block with wedge detection (CLAUDE.md
# discipline). The axon tunnel serves ONE jax client; a client started while
# another is live — or within ~a minute of one exiting — can wedge
# permanently (futex wait, no output). This runner serializes jobs, watches
# each job's log for output, kills silent jobs, cools down, and retries once.
#
# Usage:
#   tools/tpu_block.sh probe
#       Bounded trivial-matmul tunnel health check (exit 0 = healthy).
#   tools/tpu_block.sh run <logfile> <cmd...>
#       Run one TPU job under the watchdog, then cool down.
#   tools/tpu_block.sh r4queue
#       The round-4 queue from CLAUDE.md (gray extension, gray-patch
#       extension, overlap attribution, bench confirmation), in order,
#       stopping on first unrecoverable wedge.
#
# Watchdog: if the log grows nothing for SILENT_S seconds the job is killed
# by PID (never by pattern), the tunnel cools down COOLDOWN_S, and the job is
# retried once. First-compile of a new (config, batch) shape is 1-3.5 min, so
# SILENT_S must stay well above that.

set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"

SILENT_S=${SILENT_S:-600}
COOLDOWN_S=${COOLDOWN_S:-120}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-300}

probe() {
    echo "[tpu_block] probing tunnel (timeout ${PROBE_TIMEOUT}s)..."
    timeout "$PROBE_TIMEOUT" python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
v = float((x @ x).sum())
print(f"[tpu_block] tunnel ok: {jax.devices()} sum={v} {time.time()-t0:.1f}s")
EOF
    local rc=$?
    if [ $rc -ne 0 ]; then
        echo "[tpu_block] tunnel WEDGED (probe rc=$rc). Leave it idle" \
             ">=50 min before the next client." >&2
    fi
    return $rc
}

# run_once <logfile> <cmd...>  -> 0 ok, 1 job failed, 2 wedged (killed silent)
run_once() {
    local log=$1; shift
    : > "$log"
    "$@" >> "$log" 2>&1 &
    local pid=$!
    echo "[tpu_block] started pid=$pid log=$log: $*"
    local last_size=0 silent=0
    while kill -0 "$pid" 2>/dev/null; do
        sleep 15
        local size
        size=$(stat -c %s "$log" 2>/dev/null || echo 0)
        if [ "$size" -gt "$last_size" ]; then
            last_size=$size; silent=0
        else
            silent=$((silent + 15))
            if [ "$silent" -ge "$SILENT_S" ]; then
                echo "[tpu_block] no output for ${SILENT_S}s — wedged;" \
                     "killing pid=$pid" >&2
                kill "$pid" 2>/dev/null; sleep 5
                kill -9 "$pid" 2>/dev/null
                return 2
            fi
        fi
    done
    wait "$pid"
}

run() {
    local log=$1; shift
    run_once "$log" "$@"
    local rc=$?
    if [ $rc -eq 2 ]; then
        echo "[tpu_block] cooling down ${COOLDOWN_S}s, then retrying once"
        sleep "$COOLDOWN_S"
        run_once "$log" "$@"
        rc=$?
        [ $rc -eq 2 ] && echo "[tpu_block] wedged twice — tunnel needs" \
                              "~50 min idle; stopping." >&2
    fi
    echo "[tpu_block] job done rc=$rc; cooldown ${COOLDOWN_S}s"
    sleep "$COOLDOWN_S"
    return $rc
}

r4queue() {
    probe || return 2
    sleep "$COOLDOWN_S"
    # (gray extension dropped: the end-of-round-3 CPU ranking sweep showed
    # the raw curve asymptoting at ~28.845 train-slice by epoch 84, rising
    # ~0.001 dB/epoch — 150 more epochs buys ~nothing. See CLAUDE.md.)
    # 2. gray-patch extension (oscillating; rank with select_checkpoint
    #    after). Flags MUST match the original checkpoints_gp run (default
    #    steps/epoch, scan 50, eval-sets 5); ~29.6 s/epoch -> 90->250 is
    #    ~80 min.
    run /tmp/gp_ext.log python train.py --config gray-patch --textured \
        --epochs 250 --scan 50 --pixel-loss 1000 --g-ema 0.999 --seed 42 \
        --eval --eval-sets 5 --checkpoint-dir checkpoints_gp \
        --log-every 500 --resume || return $?
    # 3. overlap-inference attribution on real hardware
    run /tmp/attr_overlap.log python tools/attr_overlap.py || return $?
    # 4. confirm both north-star bench lines on a healthy tunnel, then stop
    run /tmp/bench_confirm.log python bench.py || return $?
    echo "[tpu_block] r4queue complete. Selection/scoring runs are" \
         "CPU-pinned: tools/select_checkpoint.py --dir <ckpts> --cpu"
}

case "${1:-}" in
    probe)   probe ;;
    run)     shift; run "$@" ;;
    r4queue) r4queue ;;
    *) echo "usage: $0 probe | run <log> <cmd...> | r4queue" >&2; exit 64 ;;
esac

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
#       The round-4 queue from CLAUDE.md: early bench confirmation, the
#       rgb-full long rerun WITH the full recipe (the round-3 800-epoch run
#       was invalid — its queue command omitted --pixel-loss 1000), the
#       gray-patch-batch 100->250 extension (the only variant never
#       extended), npz-integrity checks after each training job (a kill
#       mid-epoch TRUNCATES the in-flight save — round-3 lesson), then
#       TPU-side checkpoint selections. Stops on first unrecoverable wedge.
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

# run_train <ckpt_dir> <log> <cmd...> — run() for TRAINING jobs: a watchdog
# kill truncates the in-flight np.savez, so the torn last-epoch pair must be
# deleted BEFORE the --resume retry (np.load on the torn npz would crash the
# retry immediately) and again after the job ends (so later selections never
# see it).
run_train() {
    local ckpt_dir=$1 log=$2; shift 2
    run_once "$log" "$@"
    local rc=$?
    if [ $rc -eq 2 ]; then
        check_last_epoch "$ckpt_dir"
        echo "[tpu_block] cooling down ${COOLDOWN_S}s, then retrying once"
        sleep "$COOLDOWN_S"
        run_once "$log" "$@"
        rc=$?
        [ $rc -eq 2 ] && echo "[tpu_block] wedged twice — tunnel needs" \
                              "~50 min idle; stopping." >&2
    fi
    check_last_epoch "$ckpt_dir"
    echo "[tpu_block] job done rc=$rc; cooldown ${COOLDOWN_S}s"
    sleep "$COOLDOWN_S"
    return $rc
}

# check_last_epoch <ckpt_dir> — a kill mid-epoch truncates the in-flight
# np.savez (round 3: ep245 net_D was a BadZipFile and crashed the ranker).
# Validate the newest epoch's G/D pair; delete the pair if either is torn.
# LEGACY-ONLY since save_checkpoint went atomic (tmp + os.replace): new
# saves can't tear; kept for stray .tmp cleanup and pre-atomic dirs.
check_last_epoch() {
    python - "$1" <<'EOF'
import os, sys, re
import numpy as np
d = sys.argv[1]
# Derive the run-name prefix from the files themselves: the checkpoint
# basename is <cfg.name>_<epoch>_net_<G|D>.npz and cfg.name varies per run
# (e.g. dcgan-sr-test-1) — a hardcoded prefix would never match, so a torn
# pair would be reported but not deleted.
found = {}
for f in os.listdir(d):
    if f.endswith(".npz.tmp"):   # atomic-save residue from a killed save
        os.remove(os.path.join(d, f))
        print(f"[tpu_block] removed stray {f}")
        continue
    m = re.match(r"(.+)_(\d+)_net_[GD]\.npz$", f)
    if m:
        found[int(m.group(2))] = m.group(1)
if not found:
    sys.exit(0)
ep = max(found)
pair = [os.path.join(d, f"{found[ep]}_{ep}_net_{x}.npz") for x in "GD"]
try:
    for p in pair:
        with np.load(p) as z:
            for k in z.files:
                z[k]
    print(f"[tpu_block] {d} last epoch {ep}: intact")
except Exception as e:
    print(f"[tpu_block] {d} epoch {ep} TORN ({e!r}); deleting the pair")
    for p in pair:
        if os.path.exists(p):
            os.remove(p)
EOF
}

# newest epoch number in a checkpoint dir (empty if none)
last_epoch() {
    ls "$1" 2>/dev/null | grep -oE '_[0-9]+_net_G' | grep -oE '[0-9]+' \
        | sort -n | tail -1
}

r4queue() {
    probe || return 2
    sleep "$COOLDOWN_S"
    # 1. confirm both north-star bench lines early, while the tunnel is
    #    known-good (round-3 end saw a jammed tunnel eat the driver bench)
    run /tmp/bench_confirm.log python bench.py || return $?
    # 2. rgb-full long rerun WITH the correct recipe (round-3's 800-epoch
    #    run omitted --pixel-loss 1000 and was invalid: 22.0 dB train-slice
    #    at ep244 vs 24.19 at ep1 with px). FRESH dir — checkpoints_rgb
    #    holds the invalid no-px branches and must not be resumed into.
    #    Curve is monotone ~+0.85 dB/octave; fixture is 210 ep, so 400 ep
    #    projects ~+0.8 dB. ~2.4-5 s/epoch warm on a good tunnel.
    run_train checkpoints_rgb2 /tmp/rgb_ext.log python train.py \
        --config rgb-full --textured \
        --epochs 400 --scan 10 --pixel-loss 1000 --g-ema 0.999 --seed 42 \
        --eval --eval-sets 5 --checkpoint-dir checkpoints_rgb2 \
        --log-every 500 --resume || return $?
    # 3. gray-patch-batch extension 100->250 (the ONLY variant never
    #    extended; fixture ep63/100, oscillating scheme). Same recipe as
    #    the round-2 fixture run (textured, px1000, seed 42); EMA shadow is
    #    passive (does not perturb the raw branch), ranked alongside.
    run_train checkpoints_gpb /tmp/gpb_ext.log python train.py \
        --config gray-patch-batch \
        --textured --epochs 250 --scan 50 --pixel-loss 1000 --g-ema 0.999 \
        --seed 42 --eval --eval-sets 5 --checkpoint-dir checkpoints_gpb \
        --log-every 500 --resume || return $?
    # 4. selections ON THE TPU (CPU ranking is ~10 min/epoch — don't).
    #    rgb: monotone curve, rank the tail 12 epochs only, raw + EMA.
    local rgb_ep
    rgb_ep=$(last_epoch checkpoints_rgb2)
    if [ -n "$rgb_ep" ]; then
        local lo=$((rgb_ep > 11 ? rgb_ep - 11 : 1))
        run /tmp/sel_rgb2_raw.log python tools/select_checkpoint.py \
            --dir checkpoints_rgb2 --config rgb-full \
            --epochs "$lo:$((rgb_ep + 1))" --select-sets 3 --full || return $?
        run /tmp/sel_rgb2_ema.log python tools/select_checkpoint.py \
            --dir checkpoints_rgb2 --config rgb-full \
            --epochs "$lo:$((rgb_ep + 1))" --select-sets 3 --full --ema || return $?
    fi
    #    gpb: oscillating — rank ALL epochs, raw + EMA.
    run /tmp/sel_gpb_raw.log python tools/select_checkpoint.py \
        --dir checkpoints_gpb --config gray-patch-batch --select-sets 3 --full || return $?
    run /tmp/sel_gpb_ema.log python tools/select_checkpoint.py \
        --dir checkpoints_gpb --config gray-patch-batch --select-sets 3 \
        --full --ema || return $?
    echo "[tpu_block] r4queue complete — leave the tunnel QUIET now." \
         "Winners beat the fixtures? Promote via tools/export_fixture.py," \
         "score held-out via the eval harness, update PARITY.md."
    # DO NOT re-extend gray-3/gray/gray-2/overlap: measured converged or
    # peaked (PARITY.md round-3 extension sweep).
}

case "${1:-}" in
    probe)   probe ;;
    run)     shift; run "$@" ;;
    r4queue) r4queue ;;
    *) echo "usage: $0 probe | run <log> <cmd...> | r4queue" >&2; exit 64 ;;
esac

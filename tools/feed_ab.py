"""One-process paired A/B for feed-path flags (controls tunnel drift).

Cross-run A/Bs of feed timing are UNUSABLE over the axon tunnel: its
host->device bandwidth drifts by >1.5x between client launches (measured
round 4: warm baseline epochs 6.4 s in one run, 10.3-12.5 s twenty minutes
later on the same idle host), so whichever mode runs second loses. This
tool alternates the mode under test epoch-by-epoch inside ONE jax client,
so both modes sample the same tunnel, and reports paired per-round times.

Round-4 result (rgb-full synthetic, 32 steps, scan 8, --feed-bf16 feed):
--stage-ahead won all 5 paired rounds, median epoch 9.14 s vs 10.35 s
(~12% faster; sign test p = 1/32).

Usage (serialize through tools/tpu_block.sh like any TPU client):
    bash tools/tpu_block.sh run /tmp/feed_ab.log \
        python tools/feed_ab.py --config rgb-full --steps 32 --scan 8 \
            --feed-bf16 --rounds 5 --flag stage_ahead

The harness matches train.py's synthetic path (cli.build_data); the flag
under test must be a boolean train_epochs keyword (currently stage_ahead).
"""
import argparse
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--config", default="rgb-full")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--feed-bf16", action="store_true")
    ap.add_argument("--flag", default="stage_ahead",
                    help="boolean train_epochs kwarg to alternate")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to CPU (smoke-testing the harness)")
    args = ap.parse_args(argv)

    if not args.cpu:
        # TPU-only shared cache; under --cpu leave the env var unset so
        # pin_cpu routes to its host-fingerprinted XLA:CPU dir instead of
        # polluting .jax_cache with host-specific AOT entries
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                              os.path.join(os.getcwd(), ".jax_cache"))
    import numpy as np
    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.cli import build_data
    from dcgan_sr_tpu.train import (build_train_step, init_train_state,
                                    train_epochs)
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    cfg = get_config(args.config)
    cfg.manualSeed = 1234
    ns = types.SimpleNamespace(synthetic=True, textured=False,
                               native_loader=False, data_root=None)
    _, batch_fn = build_data(cfg, ns)
    if args.feed_bf16:
        import ml_dtypes
        inner = batch_fn

        def batch_fn(epoch, i):  # noqa: F811 — mirrors cli.py's wrapper
            return jax.tree_util.tree_map(
                lambda x: x.astype(ml_dtypes.bfloat16)
                if getattr(x, "dtype", None) == np.float32 else x,
                inner(epoch, i))

    state = init_train_state(cfg, jax.random.PRNGKey(cfg.manualSeed))
    step_fn = jax.jit(build_train_step(cfg), donate_argnums=(0,))
    multi = jit_multi_step(cfg) if args.scan > 1 else None

    def run_epoch(state, flag_value):
        t0 = time.perf_counter()
        state, m = train_epochs(cfg, state, batch_fn, step_fn=step_fn,
                                niter=1, steps_per_epoch=args.steps,
                                scan_steps=args.scan, multi_step_fn=multi,
                                **{args.flag: flag_value})
        # fetch a metric so the clock stops after the full device chain
        _ = float(list(m.values())[0])
        return state, time.perf_counter() - t0

    state, warm = run_epoch(state, False)  # compile warmup, not scored
    print(f"warmup epoch: {warm:.3f}s", flush=True)

    times = {False: [], True: []}
    wins = 0
    for r in range(args.rounds):
        # ABBA: alternate within-round order so monotonic tunnel-bandwidth
        # drift inside the run cancels across round PAIRS. With an odd
        # --rounds the last round has no partner, leaving a one-round
        # residual bias toward whichever arm it runs first — use an even
        # --rounds when the margin is marginal.
        order = (False, True) if r % 2 == 0 else (True, False)
        for flag_value in order:
            state, dt = run_epoch(state, flag_value)
            times[flag_value].append(dt)
            print(f"round {r} {args.flag}={flag_value}: {dt:.3f}s",
                  flush=True)
        wins += times[True][-1] < times[False][-1]

    for flag_value in (False, True):
        v = sorted(times[flag_value])
        print(f"{args.flag}={flag_value}: median {v[len(v) // 2]:.3f}s  "
              f"all={[round(x, 2) for x in times[flag_value]]}")
    print(f"{args.flag}=True won {wins}/{args.rounds} paired rounds")


if __name__ == "__main__":
    main()

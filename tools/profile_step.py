"""Per-variant step-time measurement on the real TPU.

Times the fused gray-3 train step (bf16, batch 100) under different execution
knobs — baseline, compact_params (2-D master-weight Adam layout), fast_ops,
pallas preprocess — plus forward-only G, and prints a JSON summary.  Used to
attribute step time between conv compute, optimizer, and preprocessing, and
to verify each opt-in lever actually wins before enabling it anywhere
(CLAUDE.md discipline: measure, keep negative results).

Usage: python tools/profile_step.py [--batch 100] [--steps 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_variant(name, cfg, shape, k, reps):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    state = init_train_state(cfg, jax.random.PRNGKey(0))
    mstep = jit_multi_step(cfg)
    rng = np.random.RandomState(0)
    sb = jax.device_put(jnp.asarray(rng.rand(k, *shape), jnp.float32))
    state, m = mstep(state, sb)
    float(m["errG"][-1])  # full-chain host fetch (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = mstep(state, sb)
    float(m["errG"][-1])
    dt = (time.perf_counter() - t0) / (reps * k)
    return dt


def time_forward(cfg, batch, k, reps):
    """G forward alone (inference path) for fwd/bwd attribution."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dcgan_sr_tpu.models import apply_network, generator_spec
    from dcgan_sr_tpu.train import init_train_state

    spec = generator_spec(cfg)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def many(params, bn, xs):
        def one(carry, x):
            out, _st = apply_network(spec, params, x, bn, train=True,
                                     compute_dtype=dtype)
            return carry, out.mean()
        _c, outs = lax.scan(one, 0, xs)
        return outs.sum()

    f = jax.jit(many)
    rng = np.random.RandomState(0)
    xs = jax.device_put(jnp.asarray(rng.rand(k, batch, 1, 32, 32), jnp.float32))
    float(f(state.g_params, state.g_state, xs))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = f(state.g_params, state.g_state, xs)
    float(v)
    return (time.perf_counter() - t0) / (reps * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from dcgan_sr_tpu.core import get_config

    dtype = "float32" if args.fp32 else "bfloat16"
    shape = (args.batch, 1, 64, 64)
    base = dict(batchSize=args.batch, compute_dtype=dtype)
    variants = {
        "baseline": dict(base),
        "compact_params": dict(base, compact_params=True),
        "fast_ops": dict(base, fast_ops=True),
        "pallas_preprocess": dict(base, use_pallas=True),
        "compact+pallas": dict(base, compact_params=True, use_pallas=True),
    }
    out = {}
    for name, overrides in variants.items():
        cfg = get_config("gray-3", env_override=False, **overrides)
        dt = time_variant(name, cfg, shape, args.steps, args.reps)
        out[name] = round(dt * 1e3, 3)
        print(f"{name:20s} {dt * 1e3:7.3f} ms/step "
              f"({args.batch / dt:,.0f} img/s)", flush=True)

    cfg = get_config("gray-3", env_override=False, **base)
    fwd = time_forward(cfg, args.batch, args.steps, args.reps)
    out["g_forward_only"] = round(fwd * 1e3, 3)
    print(f"{'g_forward_only':20s} {fwd * 1e3:7.3f} ms/step", flush=True)

    print(json.dumps({"dtype": dtype, "batch": args.batch,
                      "ms_per_step": out}))


if __name__ == "__main__":
    main()

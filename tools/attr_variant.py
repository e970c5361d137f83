#!/usr/bin/env python3
"""In-step per-layer attribution for any variant (docs/fused_bulge.md
methodology, applied to rgb-full and gray-patch-batch per VERDICT r2 #8).

Measures, on the real TPU with scanned timing (>=20 iters inside ONE jit,
gradients folded into the scan carry so XLA cannot dead-code them — CLAUDE.md
measurement rules):

  step           the full fused train step (ms)
  g_fwd          generator forward alone
  g_fwd_bwd      generator forward+backward (grads consumed)
  d_fwd          discriminator forward alone
  d_fwd_bwd      discriminator forward+backward
  layer table    G fwd+bwd of every spec prefix; successive diffs attribute
                 per-layer (+BN/act) cost

Usage: python tools/attr_variant.py --config rgb-full [--batch 100]
       [--steps 20] [--reps 3] [--fp32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# XLA's C++ logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads
# (at `import jax`), so pin_cpu() setting it in-process is too late to mute
# the cpu_aot_loader pseudo-feature load messages. Set it before any jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcgan_sr_tpu.utils.measure import timed_scan as _timed  # noqa: E402




def scan_apply(spec, params, bn, xs, *, dtype, grad):
    """Scanned G/D fwd (grad=False) or fwd+bwd (grad=True) over xs (k, ...)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dcgan_sr_tpu.models import apply_network

    def fwd_scalar(p, x):
        out, _ = apply_network(spec, p, x, bn, train=True, compute_dtype=dtype)
        return out.astype(jnp.float32).mean()

    def one(carry, x):
        if grad:
            v, g = jax.value_and_grad(fwd_scalar)(params, x)
            gsum = sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree_util.tree_leaves(g))
            return carry + v + gsum, None
        return carry + fwd_scalar(params, x), None

    c, _ = lax.scan(one, jnp.zeros(()), xs)
    return c


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="rgb-full")
    ap.add_argument("--batch", type=int, default=None,
                    help="images per step (patch variants: patches derive)")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--ngf", type=int, default=None,
                    help="width override (CPU smoke tests)")
    ap.add_argument("--ndf", type=int, default=None)
    ap.add_argument("--layers", action="store_true", default=True)
    ap.add_argument("--no-layers", dest="layers", action="store_false")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke tests; numbers are not "
                         "TPU attribution)")
    args = ap.parse_args()

    import numpy as np
    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        # standalone TPU runs must reuse the shared .jax_cache — first
        # compiles through the tunnel are 1-3.5 min per program
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)
    import jax.numpy as jnp
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.models import (discriminator_spec, generator_spec,
                                     init_network)
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    dtype_s = "float32" if args.fp32 else "bfloat16"
    overrides = dict(compute_dtype=dtype_s)
    if args.batch is not None:
        overrides["batchSize"] = args.batch
    if args.ngf is not None:
        overrides["ngf"] = args.ngf
    if args.ndf is not None:
        overrides["ndf"] = args.ndf
    cfg = get_config(args.config, env_override=False, **overrides)
    dtype = jnp.bfloat16 if not args.fp32 else None
    k, reps = args.steps, args.reps
    b = cfg.step_batch                   # patches for patch variants
    hw = cfg.train_size                  # 8 for patch variants, 64 otherwise
    rng = np.random.RandomState(0)
    out = {"config": cfg.variant, "dtype": dtype_s, "step_batch": b}

    # full step
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    mstep = jit_multi_step(cfg)
    sb = jax.device_put(jnp.asarray(
        rng.rand(k, b, cfg.nc, hw, hw), jnp.float32))

    state, m = mstep(state, sb)  # compile (state is donated: rebind each call)
    float(m["errG"][-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = mstep(state, sb)
    float(m["errG"][-1])
    dt = (time.perf_counter() - t0) / (reps * k)
    out["step_ms"] = round(dt * 1e3, 3)
    print(f"{'full step':24s} {dt*1e3:7.3f} ms  ({b/dt:,.0f} img-eq/s)",
          flush=True)

    g_spec = generator_spec(cfg)
    d_spec = discriminator_spec(cfg)
    lr_hw = hw // 2
    g_in = jax.device_put(jnp.asarray(
        rng.rand(k, b, cfg.nc, lr_hw, lr_hw), jnp.float32))
    d_in = jax.device_put(jnp.asarray(
        rng.rand(k, b, cfg.nc, hw, hw), jnp.float32))

    for name, spec, xs in (("g", g_spec, g_in), ("d", d_spec, d_in)):
        params, bn = init_network(jax.random.PRNGKey(1), spec)
        for grad in (False, True):
            f = jax.jit(lambda p, s, x, sp=spec, g=grad:
                        scan_apply(sp, p, s, x, dtype=dtype, grad=g))
            dt = _timed(f, (params, bn, xs), reps, k)
            tag = f"{name}_fwd" + ("_bwd" if grad else "")
            out[tag + "_ms"] = round(dt * 1e3, 3)
            print(f"{tag:24s} {dt*1e3:7.3f} ms", flush=True)

    if args.layers:
        print("-- G prefix ablation (fwd+bwd; diff = that layer's cost) --",
              flush=True)
        prev = 0.0
        rows = []
        for n in range(1, len(g_spec) + 1):
            sub = g_spec[:n]
            params, bn = init_network(jax.random.PRNGKey(1), sub)
            f = jax.jit(lambda p, s, x, sp=sub:
                        scan_apply(sp, p, s, x, dtype=dtype, grad=True))
            dt = _timed(f, (params, bn, g_in), reps, k) * 1e3
            l = g_spec[n - 1]
            desc = l["kind"] + (f" {l.get('cin')}->{l.get('cout')}"
                                if "cin" in l else "")
            rows.append({"layer": desc, "prefix_ms": round(dt, 3),
                         "delta_ms": round(dt - prev, 3)})
            print(f"  {desc:28s} prefix {dt:7.3f} ms   +{dt - prev:6.3f} ms",
                  flush=True)
            prev = dt
        out["g_layers"] = rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()

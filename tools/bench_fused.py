"""Measure the fused convT+BN+ReLU+conv Pallas kernels against XLA's unfused
composition at the gray-3 bulge geometry (B=100, 16ch 256 -> 8ch 512 -> 16ch
256).  Decides whether a fuse-bulge config flag would earn its keep
(CLAUDE.md discipline: opt-in until measured faster; record negative
results — the verdict lives in docs/fused_bulge.md).

Timing follows CLAUDE.md "Measurement methodology": the measured body runs
inside a lax.scan within ONE jit (>=20 iters) so per-dispatch tunnel
overhead (~2-3 ms) is amortized, and the checksum fetch depends on the full
chain so nothing is dead-code-eliminated.

Usage: python tools/bench_fused.py [--batch 100] [--hw 256] [--dtype bf16]
       [--kernel bulge|nhwc] [--tm 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--hw", type=int, default=256)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--kernel", default="bulge", choices=["bulge", "nhwc"])
    ap.add_argument("--tm", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20,
                    help="scan length inside the timing jit")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dcgan_sr_tpu.ops import nn as N

    if args.kernel == "bulge":
        from dcgan_sr_tpu.ops.pallas_bulge import fused_bulge_fwd as fused_fn
    else:
        from dcgan_sr_tpu.ops.pallas_fused import (
            fused_convT_bn_relu_conv as fused_fn)

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.RandomState(0)
    b, hw = args.batch, args.hw
    x = jax.device_put(jnp.asarray(rng.rand(b, 16, hw, hw), dt))
    wT = jax.device_put(jnp.asarray(0.05 * rng.randn(16, 8, 4, 4), dt))
    wC = jax.device_put(jnp.asarray(0.05 * rng.randn(16, 8, 4, 4), dt))
    scale = jnp.ones(8, jnp.float32)
    bias = jnp.zeros(8, jnp.float32)

    def unfused(x, wT, scale, bias, wC):
        h = N.conv_transpose2d(x, wT, 2, 1, compute_dtype=dt)
        hf = h.astype(jnp.float32)
        mean = hf.mean(axis=(0, 2, 3))
        var = (hf * hf).mean(axis=(0, 2, 3)) - mean * mean
        hn = (hf - mean[None, :, None, None]) * (
            scale / jnp.sqrt(var + 1e-5))[None, :, None, None] \
            + bias[None, :, None, None]
        hr = jnp.maximum(hn, 0.0).astype(dt)
        return N.conv2d(hr, wC, 2, 1, compute_dtype=dt), (mean, var)

    def fused(x, wT, scale, bias, wC):
        return fused_fn(x, wT, scale, bias, wC, tm=args.tm)

    def scanned(f):
        @jax.jit
        def run(x, wT, scale, bias, wC):
            def body(c, _):
                y, (m, v) = f(x * (1.0 + 0.0 * c), wT, scale, bias, wC)
                return c + jnp.sum(y.astype(jnp.float32)) * 1e-9 + m.sum(), None
            c, _ = jax.lax.scan(body, jnp.float32(0.0),
                                None, length=args.iters)
            return c
        return run

    def timeit(f, tag):
        run = scanned(f)
        float(run(x, wT, scale, bias, wC))  # compile + warm
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            s = float(run(x, wT, scale, bias, wC))  # full-chain fetch
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        print(f"{tag:10s} {best:8.3f} ms/iter  (checksum {s:.4e})", flush=True)
        return best

    t_ref = timeit(unfused, "unfused")
    t_fused = timeit(fused, "fused")
    y_ref, _ = jax.jit(unfused)(x, wT, scale, bias, wC)
    y_fused, _ = jax.jit(fused)(x, wT, scale, bias, wC)
    err = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32)
                                - y_fused.astype(jnp.float32))))
    print(json.dumps({"batch": b, "hw": hw, "dtype": args.dtype,
                      "kernel": args.kernel,
                      "tm": args.tm, "unfused_ms": round(t_ref, 3),
                      "fused_ms": round(t_fused, 3),
                      "speedup": round(t_ref / t_fused, 3),
                      "max_abs_diff": err}))


if __name__ == "__main__":
    main()

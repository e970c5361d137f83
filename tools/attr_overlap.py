#!/usr/bin/env python3
"""In-program stage attribution for the overlap-SR inference pipeline — the
second north-star metric (BASELINE.md 'Patch-overlap inference >10x';
reference pipeline train-gray-patch-batch-overlap.lua:377-704).

Measures, on the real TPU with scanned timing (>=20 iters inside ONE jit,
stage outputs folded into the scan carry so XLA cannot dead-code them —
CLAUDE.md measurement rules), cumulative stage programs:

  extract   tile extraction + per-tile 2x2 degrade
  gen       + the batched generator over the N*225-tile batch
  naive     + the naive stitch
  seam      + the scan-based seam DP + ownership gather (the full pipeline)

Successive diffs attribute per-stage cost; XLA cost analysis of the full
program gives the HBM-traffic roofline fraction.

Usage: python tools/attr_overlap.py [--images 64] [--steps 20] [--reps 3]
       [--fp32] [--cpu] [--ngf 16]

--sweep-bn instead measures the FULL pipeline under four generator-batch
structures, isolating where the missing roofline fraction lives (round-3
verdict: the parity pipeline sits at ~65% of HBM roofline, unattributed):

  vmap_train   per-image 225-tile batches, train-mode BN (PARITY pipeline)
  vmap_eval    per-image batches, running-stats BN (isolates BN-stat cost,
               same vmap structure)
  flat_eval    ONE (N*225)-tile batch, running-stats BN (exact vs vmap_eval;
               isolates the vmap/batch-structure cost)
  flat_pooled  ONE (N*225)-tile batch, train-mode BN pooling stats across
               images (ablation only — different math from the reference)
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcgan_sr_tpu.utils.measure import timed_scan as _timed  # noqa: E402




def sweep_bn(args):
    """Full-pipeline MP/s + per-dispatch HBM bytes under the four
    generator-batch structures (see module docstring)."""
    import numpy as np
    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)
    import jax.numpy as jnp
    from jax import lax
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.image.ops import box_downsample2
    from dcgan_sr_tpu.image.patches import (extract_overlap_patches,
                                            stitch_overlap_naive)
    from dcgan_sr_tpu.infer.seam_device import seam_stitch_device
    from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
    from dcgan_sr_tpu.models import apply_network, generator_spec
    from dcgan_sr_tpu.train import init_train_state

    overrides = {"ngf": args.ngf} if args.ngf is not None else {}
    cfg = get_config("gray-patch-batch-overlap", env_override=False,
                     **overrides)
    dtype = None if args.fp32 else jnp.bfloat16
    spec = generator_spec(cfg)
    patch, ov = cfg.patchSize, cfg.overlap
    fine = (cfg.fineSize, cfg.fineSize)
    n, k, reps = args.images, args.steps, args.reps

    st = init_train_state(cfg, jax.random.PRNGKey(0))
    params, bn = st.g_params, st.g_state
    xs = jnp.asarray(np.random.RandomState(0).rand(k, n, *fine), jnp.float32)

    def stitch(fake):  # (T, p, p) -> scalar folding both stitches
        return (stitch_overlap_naive(fake, fine, patch, ov)
                .astype(jnp.float32).mean()
                + seam_stitch_device(fake, fine, patch, ov)
                .astype(jnp.float32).mean())

    def flat_pooled(images):
        # ablation: one (N*T)-tile dispatch with TRAIN-mode BN (stats pooled
        # across images — not reference math, structure probe only)
        tiles = jax.vmap(
            lambda im: extract_overlap_patches(im, patch, ov))(images)
        nt = tiles.shape[0] * tiles.shape[1]
        lr = box_downsample2(tiles.reshape(nt, patch, patch))[:, None]
        fake, _ = apply_network(spec, params, lr, bn, train=True,
                                compute_dtype=dtype)
        return jax.vmap(stitch)(
            fake[:, 0].reshape(n, -1, patch, patch)).sum()

    def from_sr_fn(bn_eval, flat):
        sr = make_overlap_sr_fn(cfg, compute_dtype=dtype, bn_eval=bn_eval,
                                flat_tiles=flat)

        def run(images):
            out = sr(params, bn, images)
            return (out["naive"].astype(jnp.float32).mean()
                    + out["seam"].astype(jnp.float32).mean())
        return run

    pipelines = {
        "vmap_train": from_sr_fn(False, False),
        "vmap_eval": from_sr_fn(True, False),
        "flat_eval": from_sr_fn(True, True),
        "flat_pooled": flat_pooled,
    }
    results = {"images_per_dispatch": n, "scan_steps": k,
               "dtype": "float32" if args.fp32 else "bfloat16"}
    mp = n * fine[0] * fine[1] / 1e6
    for name, body in pipelines.items():
        def scanned(images_k, _body=body):
            def sbody(c, imgs):
                return c + _body(imgs), None
            c, _ = lax.scan(sbody, jnp.zeros(()), images_k)
            return c

        ms = _timed(jax.jit(scanned), (xs,), reps, k) * 1e3
        results[name + "_ms"] = round(ms, 3)
        results[name + "_mp_per_s"] = round(mp / (ms / 1e3), 2)
        try:  # per-dispatch traffic/flops: lower ONE unscanned dispatch
            ca = jax.jit(body).lower(xs[0]).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            results[name + "_gb"] = round(
                ca.get("bytes accessed", 0.0) / 1e9, 3)
            results[name + "_gflop"] = round(ca.get("flops", 0.0) / 1e9, 2)
            results[name + "_gb_per_s"] = round(
                results[name + "_gb"] / (ms / 1e3), 1)
        except Exception as e:
            results[name + "_cost_error"] = str(e)[:120]

    print(json.dumps(results, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--ngf", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (smoke tests; numbers are not "
                         "TPU attribution)")
    ap.add_argument("--sweep-bn", action="store_true",
                    help="measure the four generator-batch structures "
                         "(vmap/flat x train/eval BN) instead of the stage "
                         "attribution")
    args = ap.parse_args()
    if args.sweep_bn:
        return sweep_bn(args)

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
    from jax import lax
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.image.ops import box_downsample2
    from dcgan_sr_tpu.image.patches import (extract_overlap_patches,
                                            stitch_overlap_naive)
    from dcgan_sr_tpu.infer.seam_device import seam_stitch_device
    from dcgan_sr_tpu.models import apply_network, generator_spec
    from dcgan_sr_tpu.train import init_train_state

    overrides = {}
    if args.ngf is not None:
        overrides["ngf"] = args.ngf
    cfg = get_config("gray-patch-batch-overlap", env_override=False,
                     **overrides)
    dtype = None if args.fp32 else jnp.bfloat16
    spec = generator_spec(cfg)
    patch, ov = cfg.patchSize, cfg.overlap
    fine = (cfg.fineSize, cfg.fineSize)
    n, k, reps = args.images, args.steps, args.reps

    st = init_train_state(cfg, jax.random.PRNGKey(0))
    params, bn = st.g_params, st.g_state
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.rand(k, n, *fine), jnp.float32)

    def one_image(stage, image):
        tiles = extract_overlap_patches(image, patch, ov)
        lr = box_downsample2(tiles)[:, None]
        if stage == "extract":
            return lr.astype(jnp.float32).mean()
        fake, _ = apply_network(spec, params, lr, bn, train=True,
                                compute_dtype=dtype)
        fake = fake[:, 0]
        if stage == "gen":
            return fake.astype(jnp.float32).mean()
        acc = stitch_overlap_naive(fake, fine, patch, ov).astype(
            jnp.float32).mean()
        if stage == "naive":
            return acc
        return acc + seam_stitch_device(fake, fine, patch, ov).astype(
            jnp.float32).mean()

    results = {"images_per_dispatch": n, "scan_steps": k,
               "dtype": "float32" if args.fp32 else "bfloat16"}
    stage_fns = {}
    for stage in ("extract", "gen", "naive", "seam"):
        def scanned(images_k, _stage=stage):
            def body(c, imgs):
                v = jax.vmap(lambda im: one_image(_stage, im))(imgs)
                return c + v.sum(), None
            c, _ = lax.scan(body, jnp.zeros(()), images_k)
            return c

        fn = jax.jit(scanned)
        stage_fns[stage] = fn
        ms = _timed(fn, (xs,), reps, k) * 1e3
        results[stage + "_ms"] = round(ms, 3)
        mp = n * fine[0] * fine[1] / 1e6
        results[stage + "_mp_per_s"] = round(mp / (ms / 1e3), 2)

    prev = "extract"
    for stage in ("gen", "naive", "seam"):
        results[f"delta_{stage}_ms"] = round(
            results[stage + "_ms"] - results[prev + "_ms"], 3)
        prev = stage

    # roofline: HBM bytes of the full per-dispatch program.  Lower ONE
    # dispatch (no scan): XLA's cost_analysis counts a lax.scan body once,
    # NOT times the trip count, so analysing the scanned program and dividing
    # by k under-reports by k (the round-3 attr numbers had this bug).
    try:
        def one_dispatch(imgs):
            return jax.vmap(lambda im: one_image("seam", im))(imgs).sum()

        ca = jax.jit(one_dispatch).lower(xs[0]).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        results["bytes_accessed_per_step_gb"] = round(
            ca.get("bytes accessed", 0.0) / 1e9, 3)
        results["flops_per_step_g"] = round(
            ca.get("flops", 0.0) / 1e9, 2)
    except Exception as e:  # cost analysis is best-effort over the tunnel
        results["cost_analysis_error"] = str(e)[:120]

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Overlap-variant quality protocol: naive stitch vs seam-cut stitch vs
bilinear, on held-out textured images.

The reference's final section (train-gray-patch-batch-overlap.lua:377-704)
prints PSNR/SSIM of the naively stitched and seam-stitched generator outputs
against the bilinear control for single train/test images. This tool runs the
same comparison over full 100-image held-out sets through the fully
on-device overlap pipeline (extract 225 overlapping tiles -> batched G ->
naive + seam-DP stitch, infer/tiled.py).

Usage:
  python tools/overlap_protocol.py --ckpt checkpoints_ov/..._net_G.npz \
      [--sets 10000:10005] [--both-seams] [--cpu]
"""

import argparse
import os
import sys

# XLA's C++ logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads
# (at `import jax`), so pin_cpu() setting it in-process is too late to mute
# the cpu_aot_loader pseudo-feature load messages. Set it before any jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="…_net_G.npz checkpoint")
    ap.add_argument("--config", default="gray-patch-batch-overlap")
    ap.add_argument("--sets", default="10000:10005",
                    help="a:b file_set slice (100 imgs each — this tool's "
                         "COMMITTED textured protocol; 10000+ = held out "
                         "from the images 1..10000 training stream, "
                         "mirroring train-gray-patch-batch.lua:489's "
                         "500-image held-out split)")
    ap.add_argument("--ema", action="store_true",
                    help="score the EMA branch (checkpoint needs ema keys)")
    ap.add_argument("--bn-eval", action="store_true",
                    help="normalize BN with training running stats instead "
                         "of per-image tile-batch stats (the parity default "
                         "reproduces the reference's single-image batches, "
                         "whose stats are unrepresentative — PARITY.md)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        # TPU runs reuse the shared .jax_cache (first compiles through the
        # tunnel are 1-3.5 min per program)
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)
    import numpy as np

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.synthetic import TexturedImages
    from dcgan_sr_tpu.evaluation import evaluate_overlap_slice
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import load_branch

    cfg = get_config(args.config,
                     **({"g_ema": 0.999} if args.ema else {}))
    template = init_train_state(cfg, jax.random.PRNGKey(0))

    data = np.load(args.ckpt)
    params = load_branch(data, "ema" if args.ema else "params",
                         template.g_params)
    g_state = load_branch(data, "state", template.g_state)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    a, b = (int(x) for x in args.sets.split(":"))
    # batch_size=100 is part of the COMMITTED textured protocol (every
    # PARITY.md overlap row was measured at 100 images/set) — the harness
    # default is cfg.batchSize (20), the reference's file-addressing unit
    res = evaluate_overlap_slice(cfg, params, g_state, src, range(a, b),
                                 bn_eval=args.bn_eval, batch_size=100)
    for name, psnr, ssim in (
            ("bilinear", res.psnr_bilinear, res.ssim_bilinear),
            ("naive-stitch", res.psnr_naive, res.ssim_naive),
            ("seam-stitch", res.psnr_seam, res.ssim_seam)):
        print(f"{name:13s} PSNR {psnr:.5f}  SSIM {ssim:.6f}")
    print(f"({res.n_images} images)")


if __name__ == "__main__":
    main()

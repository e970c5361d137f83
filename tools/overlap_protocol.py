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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="…_net_G.npz checkpoint")
    ap.add_argument("--config", default="gray-patch-batch-overlap")
    ap.add_argument("--sets", default="10000:10005",
                    help="a:b file_set slice (100 imgs each; 10000+ = "
                         "held-out, train-gray-patch-batch.lua:489)")
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
    import jax.numpy as jnp
    import numpy as np

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.synthetic import TexturedImages
    from dcgan_sr_tpu.image.ops import box_downsample2, resize_bilinear
    from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
    from dcgan_sr_tpu.metrics import cal_psnr_batch, cal_ssim_batch
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import _SAFE

    cfg = get_config(args.config,
                     **({"g_ema": 0.999} if args.ema else {}))
    template = init_train_state(cfg, jax.random.PRNGKey(0))

    import jax.tree_util as jtu
    data = np.load(args.ckpt)

    def load_branch(key, tree):
        flat, treedef = jtu.tree_flatten_with_path({key: tree})
        new = [data["/".join(_SAFE.sub("_", str(p)) for p in path)]
               .astype(np.float32) for path, _ in flat]
        return jtu.tree_unflatten(treedef, new)[key]

    params = load_branch("ema" if args.ema else "params",
                         template.g_params)
    g_state = load_branch("state", template.g_state)

    sr = make_overlap_sr_fn(cfg, bn_eval=args.bn_eval)

    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    a, b = (int(x) for x in args.sets.split(":"))
    tot = np.zeros(6)
    n = 0
    for fs in range(a, b):
        hr = jnp.asarray(src.load_batch(fs, 100))[:, 0]       # (B, H, W)
        out = sr(params, g_state, hr)
        bil = resize_bilinear(box_downsample2(hr), cfg.fineSize, cfg.fineSize)
        for i, img in enumerate((bil, out["naive"], out["seam"])):
            tot[2 * i] += float(cal_psnr_batch(hr, img).sum())
            tot[2 * i + 1] += float(cal_ssim_batch(hr, img).sum())
        n += hr.shape[0]
        print(f"file_set {fs} done ({n} imgs)", flush=True)

    for name, i in (("bilinear", 0), ("naive-stitch", 1), ("seam-stitch", 2)):
        print(f"{name:13s} PSNR {tot[2*i]/n:.5f}  SSIM {tot[2*i+1]/n:.6f}")


if __name__ == "__main__":
    main()

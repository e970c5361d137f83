#!/usr/bin/env python3
"""Upscale images with a trained generator — the user-facing inference CLI.

Covers the reference's sample-making flows (SURVEY.md §3.3/§3.4) as a tool:
full-image SR, grid-patch SR, or overlap-tile SR with seam-cut stitching,
from either a framework checkpoint (.npz, train/checkpoint.py) or a reference
Torch checkpoint (.t7, compat/).

Examples:
  python tools/upscale.py --config gray-3 --ckpt ckpt/dcgan-sr-tpu_1_net_G.npz \
      --input face.jpg --output face_sr.png
  python tools/upscale.py --config gray-patch-batch-overlap --mode overlap \
      --t7 reference_net_G.t7 --input face.jpg --output face_sr.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--ckpt", help="framework checkpoint (…_net_G.npz)")
    ap.add_argument("--t7", help="reference Torch checkpoint (net_G.t7)")
    ap.add_argument("--input", required=True, help="image file (any size)")
    ap.add_argument("--output", required=True, help="output PNG path")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "full", "grid", "overlap"])
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.folder import _resize_chw
    from dcgan_sr_tpu.image.io import load_image, save_image
    from dcgan_sr_tpu.image.ops import box_downsample2, to_display
    from dcgan_sr_tpu.infer.tiled import (make_generator_fn, sr_full_image,
                                          sr_grid_patches, sr_overlap_image)
    from dcgan_sr_tpu.metrics import cal_psnr
    from dcgan_sr_tpu.models import generator_spec
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config(args.config)  # env-var overrides apply (ngf=…, etc.)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    g_params = state.g_params

    if args.t7:
        from dcgan_sr_tpu.compat import import_torch_generator
        g_params = import_torch_generator(args.t7, generator_spec(cfg),
                                          g_params)
        print(f"loaded Torch checkpoint {args.t7}")
    elif args.ckpt:
        import jax.tree_util as jtu
        from dcgan_sr_tpu.train.checkpoint import _SAFE
        data = np.load(args.ckpt)
        flat, treedef = jtu.tree_flatten_with_path({"params": g_params})
        new = [data["/".join(_SAFE.sub("_", str(p)) for p in path)]
               .astype(np.float32) for path, _ in flat]
        g_params = jtu.tree_unflatten(treedef, new)["params"]
        print(f"loaded checkpoint {args.ckpt}")
    else:
        print("WARNING: no checkpoint given; using random init")

    img = load_image(args.input, nc=cfg.nc)
    img = _resize_chw(img, cfg.fineSize, cfg.fineSize)
    hw = img[0] if cfg.nc == 1 else img
    gen = make_generator_fn(cfg)

    mode = args.mode
    if mode == "auto":
        mode = ("overlap" if cfg.variant.endswith("overlap")
                else "grid" if cfg.patch_based else "full")

    if mode == "overlap":
        res = sr_overlap_image(cfg, gen, g_params, state.g_state, hw)
        fake = res["seam"]
    elif mode == "grid":
        fake = sr_grid_patches(cfg, gen, g_params, state.g_state, hw)
    else:
        fake, _ = sr_full_image(cfg, gen, g_params, state.g_state, hw)

    save_image(args.output, np.clip(np.asarray(to_display(fake)), 0, 1))
    lr = box_downsample2(hw)
    from dcgan_sr_tpu.image.ops import resize_bilinear
    bil = resize_bilinear(lr, cfg.fineSize, cfg.fineSize)
    print(f"mode={mode}  PSNR(G)={float(cal_psnr(hw, fake)):.3f}  "
          f"PSNR(bilinear)={float(cal_psnr(hw, bil)):.3f}")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

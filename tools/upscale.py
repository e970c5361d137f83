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

# XLA's C++ logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads
# (at `import jax`), so pin_cpu() setting it in-process is too late to mute
# the cpu_aot_loader pseudo-feature load messages. Set it before any jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


_IMG_EXT = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".pgm")


def batch_upscale(args, cfg, g_params, g_state):
    """Directory mode: ONE jitted SR program over all images, optionally
    sharded over the device mesh (--dp).  Patch configs run the overlap-tile
    pipeline; full-image configs (rgb-full/gray/gray-2/gray-3) run their
    net-2x generator on whole images.  Images of mixed sizes are edge-padded
    to a common pipeline-legal (Hp, Wp) and cropped back — the tiled path
    generalizes by construction (train-gray-patch-batch-overlap.lua:387-399).

    Default is the reference's eval protocol (degrade internally, restore at
    native size, PSNR vs the originals); --true-2x treats every image as
    LOW-RES and emits 2Hx2W outputs (no ground truth, so no PSNR lines)."""
    import time

    import jax
    import jax.numpy as jnp

    from dcgan_sr_tpu.image.io import load_image, save_image
    from dcgan_sr_tpu.image.ops import box_downsample2, resize_bilinear
    from dcgan_sr_tpu.infer.tiled import (lr_pad_dim, make_full_sr_fn,
                                          make_overlap_sr_fn, overlap_pad_dim)
    from dcgan_sr_tpu.metrics import cal_psnr, cal_psnr_batch

    names = sorted(n for n in os.listdir(args.input)
                   if n.lower().endswith(_IMG_EXT))
    if not names:
        sys.exit(f"no images in {args.input}")
    nc, tiled = cfg.nc, cfg.patch_based
    imgs = [load_image(os.path.join(args.input, n), nc=nc) for n in names]
    imgs = [im[0] if nc == 1 else im for im in imgs]   # (H,W) / (C,H,W)
    sizes = [im.shape[-2:] for im in imgs]

    p, ov = cfg.patchSize, cfg.overlap

    def pad_dim(d):
        if args.true_2x:
            # LR inputs: overlap tiling needs lr-legal extents; the net-2x
            # full-image G maps any integer extent to exactly twice itself
            return lr_pad_dim(d, p, ov) if tiled else d
        return overlap_pad_dim(d, p, ov) if tiled else d + (d % 2)

    Hp = pad_dim(max(h for h, _ in sizes))
    Wp = pad_dim(max(w for _, w in sizes))
    batch = np.stack([
        np.pad(im, [(0, 0)] * (im.ndim - 2)
               + [(0, Hp - im.shape[-2]), (0, Wp - im.shape[-1])],
               mode="edge") for im in imgs])

    mesh = None
    n = len(batch)
    if args.dp:
        from dcgan_sr_tpu.parallel import create_mesh
        ndev = len(jax.devices())
        mesh = create_mesh(ndev)
        pad_n = (-n) % ndev              # shardable image count
        if pad_n:
            # modular row indexing: pad_n rows, no transient full copies
            batch = np.concatenate([batch, batch[np.arange(pad_n) % n]])
    if tiled:
        fine = (2 * Hp, 2 * Wp) if args.true_2x else (Hp, Wp)
        ov_fn = make_overlap_sr_fn(cfg, mesh=mesh, fine=fine,
                                   lr_input=args.true_2x,
                                   bn_eval=args.bn_eval,
                                   both_seams=args.both_seams,
                                   self_ensemble=args.self_ensemble,
                                   ensemble_batched=args.ensemble_batched)
        fn = lambda pp, ss, x: ov_fn(pp, ss, x)["seam"]  # noqa: E731
    else:
        full_fn = make_full_sr_fn(cfg, mesh=mesh, lr_input=args.true_2x,
                                  bn_eval=args.bn_eval,
                                  self_ensemble=args.self_ensemble,
                                  ensemble_batched=args.ensemble_batched)
        if nc == 1:
            fn = lambda pp, ss, x: full_fn(pp, ss, x[:, None])[:, 0]  # noqa: E731
        else:
            fn = full_fn
    # pm1 variants (rgb-full, gray) train on [-1,1] (donkey_folder.lua:69):
    # drive the pipeline in the generator's range, map back for save/score
    pm1 = cfg.data_range == "pm1"
    t0 = time.perf_counter()
    out = fn(g_params, g_state,
             jnp.asarray(batch * 2.0 - 1.0 if pm1 else batch))
    sr_all = np.asarray(out)[:n]
    if pm1:
        sr_all = (sr_all + 1.0) * 0.5
    dt = time.perf_counter() - t0
    os.makedirs(args.output, exist_ok=True)

    def psnr(a, b):
        if nc == 1:
            return float(cal_psnr(a, b))
        # multi-channel: per-channel PSNR averaged (the harness's convention)
        return float(np.asarray(cal_psnr_batch(a, b)).mean())

    scale = 2 if args.true_2x else 1
    for name, im, padded, (h, w), sr in zip(names, imgs, batch, sizes, sr_all):
        sr = sr[..., :scale * h, :scale * w]
        dst = os.path.join(args.output, os.path.splitext(name)[0] + "_sr.png")
        save_image(dst, np.clip(np.asarray(sr), 0, 1))
        if args.true_2x:    # input IS the LR — no ground truth to score
            print(f"{name}: {h}x{w} -> {scale * h}x{scale * w}")
        else:
            # baseline from the PADDED image then crop — box_downsample2
            # needs even extents (odd-size originals crash it); same
            # discipline as the single-image path below
            bil = np.asarray(resize_bilinear(box_downsample2(padded),
                                             Hp, Wp))[..., :h, :w]
            print(f"{name}: {h}x{w}  PSNR(G)={psnr(im, sr):.3f}  "
                  f"PSNR(bilinear)={psnr(im, bil):.3f}")
    mp = sum(scale * scale * h * w for h, w in sizes) / 1e6
    print(f"batch: {n} images ({mp:.2f} MP) in {dt:.2f}s incl. compile "
          f"({'sharded over ' + str(len(jax.devices())) + ' devices' if mesh is not None else 'single device'})")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--ckpt", help="framework checkpoint (…_net_G.npz)")
    ap.add_argument("--t7", help="reference Torch checkpoint (net_G.t7)")
    ap.add_argument("--input", required=True,
                    help="image file (any size), or a DIRECTORY of images "
                         "for batch mode: ONE jitted (optionally sharded) SR "
                         "program over all images — overlap-tile pipeline "
                         "for patch configs, full-image net-2x G for "
                         "rgb-full/gray/gray-2/gray-3")
    ap.add_argument("--output", required=True,
                    help="output PNG path (batch mode: output directory)")
    ap.add_argument("--dp", action="store_true",
                    help="batch mode: shard images over all visible devices")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "full", "grid", "overlap"])
    ap.add_argument("--resize", type=int, default=None, metavar="N",
                    help="optionally resize the input to NxN first (the old "
                         "fixed-64 behavior was --resize 64); default is "
                         "native-size SR with pad-and-crop tiling")
    ap.add_argument("--bn-eval", action="store_true",
                    help="normalize BN with the checkpoint's RUNNING stats "
                         "instead of the input's own batch stats. Reference "
                         "parity is batch stats (it never calls :evaluate()),"
                         " but a lone image's batch stats are unrepresentative"
                         " — measured: batch-stats single-image SR loses to "
                         "bilinear on every held-out protocol image, running-"
                         "stats wins on every one (PARITY.md)")
    ap.add_argument("--true-2x", action="store_true",
                    help="treat --input as the LOW-RES image (or directory "
                         "of LR images) and emit 2Hx2W output. Patch "
                         "configs extract tiles at half "
                         "geometry (bit-identical to the trained regime, "
                         "infer/tiled.py lr_input); full-image configs "
                         "(rgb-full/gray/gray-2/gray-3) feed the LR "
                         "straight to their net-2x G. Without this flag the "
                         "tool runs the reference's eval protocol: degrade "
                         "internally, restore at the input's own size")
    ap.add_argument("--both-seams", action="store_true",
                    help="overlap mode: intent-mode stitching (interior "
                         "patches keep the top seam outside the left band) "
                         "instead of the committed reference behavior")
    ap.add_argument("--ema", action="store_true",
                    help="use the EMA generator branch of a --ckpt trained "
                         "with --g-ema (smoothed weights; PARITY.md)")
    ap.add_argument("--self-ensemble", type=int, default=1, metavar="N",
                    choices=(1, 2, 4, 8),
                    help="average G over N dihedral transforms of its input "
                         "(all modes; per-tile in grid/overlap — "
                         "infer/ensemble.py; measured +1.26 dB on the "
                         "gray-3 fixture at 8)")
    ap.add_argument("--ensemble-batched", action="store_true",
                    help="run the N ensemble members as ONE (N*B)-batch "
                         "generator dispatch — the right schedule for this "
                         "one-shot tool (no scan amortizes per-dispatch "
                         "overhead); exact with --bn-eval, pooled-BN-stats "
                         "variant in train mode (infer/ensemble.py)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        # TPU runs reuse the shared .jax_cache (first compiles through the
        # tunnel are 1-3.5 min per program)
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.folder import _resize_chw
    from dcgan_sr_tpu.image.io import load_image, save_image
    from dcgan_sr_tpu.image.ops import box_downsample2
    from dcgan_sr_tpu.infer.tiled import (make_generator_fn, sr_full_image,
                                          sr_grid_patches, sr_overlap_image)
    from dcgan_sr_tpu.metrics import cal_psnr
    from dcgan_sr_tpu.models import generator_spec
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config(args.config)  # env-var overrides apply (ngf=…, etc.)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    g_params, g_state = state.g_params, state.g_state

    if args.t7:
        from dcgan_sr_tpu.compat import import_torch_generator
        g_params, g_state = import_torch_generator(
            args.t7, generator_spec(cfg), g_params, g_state)
        print(f"loaded Torch checkpoint {args.t7}")
    elif args.ckpt:
        from dcgan_sr_tpu.train.checkpoint import load_branch, npz_branches

        data = np.load(args.ckpt)
        branches = npz_branches(data)
        if args.ema:
            if "ema" not in branches:
                sys.exit("--ema needs a checkpoint trained with --g-ema "
                         "(no 'ema' branch found)")
            g_params = load_branch(data, "ema", g_params)
        else:
            g_params = load_branch(data, "params", g_params)
        if "state" in branches:
            g_state = load_branch(data, "state", g_state)
        elif args.bn_eval:
            sys.exit("--bn-eval needs BN running stats, but this checkpoint "
                     "has no 'state' branch")
        print(f"loaded checkpoint {args.ckpt}")
    else:
        print("WARNING: no checkpoint given; using random init")

    if os.path.isdir(args.input):
        return batch_upscale(args, cfg, g_params, g_state)

    img = load_image(args.input, nc=cfg.nc)
    if args.resize:
        img = _resize_chw(img, args.resize, args.resize)
    hw = img[0] if cfg.nc == 1 else img
    H, W = hw.shape[-2], hw.shape[-1]

    # pm1 variants (rgb-full, gray) train on [-1,1] (donkey_folder.lua:69,
    # trainHook mul(2):add(-1)): drive the generator in its training range
    # and map the output back to [0,1] for saving/scoring — same discipline
    # as the eval harness (feeding [0,1] to a pm1 G measured -4 dB, PARITY.md)
    pm1 = cfg.data_range == "pm1"

    if args.true_2x:
        hw_np = np.asarray(hw)
        if cfg.patch_based:     # overlap-tile true-2x (half-geometry tiles)
            from dcgan_sr_tpu.infer.tiled import lr_pad_dim, make_overlap_sr_fn
            p, ov = cfg.patchSize, cfg.overlap
            Hp, Wp = lr_pad_dim(H, p, ov), lr_pad_dim(W, p, ov)
            if (Hp, Wp) != (H, W):
                hw_np = np.pad(hw_np, [(0, Hp - H), (0, Wp - W)], mode="edge")
                print(f"padded LR {H}x{W} -> {Hp}x{Wp} for overlap tiling")
            fn = make_overlap_sr_fn(cfg, fine=(2 * Hp, 2 * Wp), lr_input=True,
                                    bn_eval=args.bn_eval,
                                    both_seams=args.both_seams,
                                    self_ensemble=args.self_ensemble,
                                    ensemble_batched=args.ensemble_batched)
            net_in = hw_np * 2.0 - 1.0 if pm1 else hw_np
            sr = np.asarray(fn(g_params, g_state, net_in[None])["seam"])[0]
        else:                   # full-image net-2x G: feed the LR directly
            from dcgan_sr_tpu.infer.tiled import make_full_sr_fn
            fn = make_full_sr_fn(cfg, lr_input=True, bn_eval=args.bn_eval,
                                 self_ensemble=args.self_ensemble,
                                 ensemble_batched=args.ensemble_batched)
            net_in = hw_np * 2.0 - 1.0 if pm1 else hw_np
            x = net_in[None, None] if cfg.nc == 1 else net_in[None]
            sr = np.asarray(fn(g_params, g_state, x))[0]
            sr = sr[0] if cfg.nc == 1 else sr
        if pm1:
            sr = (sr + 1.0) * 0.5
        sr = sr[..., :2 * H, :2 * W]
        save_image(args.output, np.clip(np.asarray(sr), 0, 1))
        print(f"true-2x: {H}x{W} -> {2 * H}x{2 * W}")
        print(f"wrote {args.output}")
        return
    gen = make_generator_fn(cfg, bn_eval=args.bn_eval,
                            self_ensemble=args.self_ensemble,
                            ensemble_batched=args.ensemble_batched)

    mode = args.mode
    if mode == "auto":
        mode = ("overlap" if cfg.variant.endswith("overlap")
                else "grid" if cfg.patch_based else "full")
    # native-size SR: pad to the mode's tiling requirement, crop after.
    # The reference's patch machinery exists exactly so a tiny fixed-size G
    # covers any image (train-gray-patch-batch-overlap.lua:387-399); here
    # rectangular H x W generalizes by construction.
    def pad_to(d):
        p, ov = cfg.patchSize, cfg.overlap
        if mode == "grid":
            q = p if p % 2 == 0 else 2 * p   # patch grid + even (degrade)
            return max(-(-d // q) * q, p)
        if mode == "overlap":
            from dcgan_sr_tpu.infer.tiled import overlap_pad_dim
            return overlap_pad_dim(d, p, ov)
        return d + (d % 2)                    # full-conv G: even dims

    Hp, Wp = pad_to(H), pad_to(W)
    hw_np = np.asarray(hw)
    if (Hp, Wp) != (H, W):
        pad = [(0, Hp - H), (0, Wp - W)]
        if hw_np.ndim == 3:
            pad = [(0, 0)] + pad
        pad_mode = ("reflect" if Hp - H < H and Wp - W < W else "edge")
        hw_np = np.pad(hw_np, pad, mode=pad_mode)
        print(f"padded {H}x{W} -> {Hp}x{Wp} for {mode} tiling")

    net_in = hw_np * 2.0 - 1.0 if pm1 else hw_np
    if mode == "overlap":
        res = sr_overlap_image(cfg, gen, g_params, g_state, net_in,
                               both_seams=args.both_seams)
        fake = res["seam"]
    elif mode == "grid":
        fake = sr_grid_patches(cfg, gen, g_params, g_state, net_in)
    else:
        fake, _ = sr_full_image(cfg, gen, g_params, g_state, net_in)

    fake = np.asarray(fake)[..., :H, :W]
    if pm1:
        fake = (fake + 1.0) * 0.5
    save_image(args.output, np.clip(np.asarray(fake), 0, 1))
    from dcgan_sr_tpu.image.ops import resize_bilinear
    bil = np.asarray(resize_bilinear(box_downsample2(hw_np), Hp, Wp))[..., :H, :W]
    hw_n = np.asarray(hw)
    print(f"mode={mode}  size={H}x{W}  "
          f"PSNR(G)={float(cal_psnr(hw_n, fake)):.3f}  "
          f"PSNR(bilinear)={float(cal_psnr(hw_n, bil)):.3f}")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()

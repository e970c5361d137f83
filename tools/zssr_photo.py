"""Single-image self-trained SR ("zero-shot" SR): train the generator on
random crops of YOUR photo, evaluate on a held-out region of the same photo.

The reference trains only on CelebA; its models carry a face prior that does
not transfer to arbitrary photographs (measured: the textured-fixture-trained
gray-3 G loses to bilinear by ~7 dB on matplotlib's grace_hopper portrait).
Internal-statistics training (Shocher et al.'s ZSSR insight — PAPERS.md
pattern; implemented here from scratch on our stack) closes that gap with the
framework's existing pieces: the gray-3 hourglass (train-gray-3.lua:52-73
topology), the fused train step, the pixel-loss surplus knob, and the
full-image inference path.

Protocol: the photo is split into a train region (top `1 - holdout`) and a
held-out region (bottom). Training samples random fineSize crops (+hflip)
from the train region only; evaluation reports PSNR/SSIM of G vs the
bilinear control on the held-out region (the reference's yardstick,
train-gray-3.lua:395-400).

Usage:
  python tools/zssr_photo.py --input photo.jpg [--steps 3000]
      [--pixel-loss 1000] [--holdout 0.25] [--ckpt-out dir] [--bf16] [--cpu]
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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--scan", type=int, default=20,
                    help="steps fused per dispatch (lax.scan super-batch)")
    ap.add_argument("--pixel-loss", type=float, default=1000.0)
    ap.add_argument("--gan-weight", type=float, default=0.0,
                    help="adversarial gradient scale for G. Default 0: on a "
                         "single image D overfits and destabilizes G "
                         "(measured on grace_hopper, PARITY.md: gan_weight 1 "
                         "loses to bilinear by 1.4 dB, gan_weight 0 beats it "
                         "by +1.9 dB); raise it for texture hallucination")
    ap.add_argument("--holdout", type=float, default=0.25,
                    help="bottom fraction of the photo held out for eval")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ckpt-out", default=None,
                    help="directory to save the trained G checkpoint")
    ap.add_argument("--sr-out", default=None,
                    help="write the held-out region's SR result PNG here")
    ap.add_argument("--bf16", action="store_true")
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
    import jax.numpy as jnp

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.image.io import load_image, save_display
    from dcgan_sr_tpu.image.ops import box_downsample2, resize_bilinear
    from dcgan_sr_tpu.infer.tiled import make_generator_fn, sr_full_image
    from dcgan_sr_tpu.metrics import cal_psnr, cal_ssim
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    cfg = get_config(args.config, env_override=False, batchSize=args.batch,
                     pixel_loss_weight=args.pixel_loss,
                     gan_weight=args.gan_weight,
                     compute_dtype="bfloat16" if args.bf16 else None)
    cfg.manualSeed = args.seed
    fs = cfg.fineSize

    img = load_image(args.input, nc=cfg.nc)          # (nc, H, W) in [0, 1]
    pm1 = cfg.data_range == "pm1"                    # Tanh-head configs train
    # on [-1,1] (donkey hook mul(2):add(-1)); crops and eval inputs must be
    # mapped into that range or the generator is evaluated out-of-domain
    H, W = img.shape[-2], img.shape[-1]
    split = int(H * (1.0 - args.holdout))
    assert split >= fs and W >= fs, (H, W, fs)
    train_region = img[..., :split, :]
    # held-out region: even dims for the 2x2 degrade
    test_region = img[..., split + (H - split) % 2:, : W - W % 2]
    print(f"photo {H}x{W}: train rows [0,{split}), held-out "
          f"{test_region.shape[-2]}x{test_region.shape[-1]}")

    rng = np.random.RandomState(args.seed)

    def sample_crops(n):
        ys = rng.randint(0, split - fs + 1, size=n)
        xs = rng.randint(0, W - fs + 1, size=n)
        out = np.empty((n, cfg.nc, fs, fs), np.float32)
        for i, (y, x) in enumerate(zip(ys, xs)):
            c = train_region[:, y:y + fs, x:x + fs]
            if rng.rand() < 0.5:
                c = c[..., ::-1]
            out[i] = c
        return out * 2.0 - 1.0 if pm1 else out

    state = init_train_state(cfg, jax.random.PRNGKey(args.seed))
    mstep = jit_multi_step(cfg)
    n_dispatch = max(-(-args.steps // args.scan), 1)  # ceil: run AT LEAST
    total_steps = n_dispatch * args.scan              # args.steps, report actual
    if total_steps != args.steps:
        print(f"rounding {args.steps} steps up to {total_steps} "
              f"({n_dispatch} dispatches of --scan {args.scan})")
    t0 = time.time()
    for d in range(n_dispatch):
        sb = jnp.asarray(sample_crops(args.scan * args.batch).reshape(
            args.scan, args.batch, cfg.nc, fs, fs))
        state, m = mstep(state, sb)
        if d % 10 == 0 or d == n_dispatch - 1:
            print(f"step {(d + 1) * args.scan}/{total_steps}"
                  f"  Err_G {float(m['errG'][-1]):.4f}"
                  f"  Err_D {float(m['errD'][-1]):.4f}"
                  f"  ({time.time() - t0:.1f}s)", flush=True)

    if args.ckpt_out:
        from dcgan_sr_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(args.ckpt_out, cfg.name, total_steps, state)
        print(f"saved checkpoint to {args.ckpt_out}")

    # ---- held-out eval: G vs bilinear on the unseen region -----------------
    # both BN modes: batch stats (reference parity) and the training run's
    # running stats (the right mode for a single unseen image — PARITY.md)
    hw = test_region[0] if cfg.nc == 1 else test_region
    bil = np.asarray(resize_bilinear(box_downsample2(hw),
                                     hw.shape[-2], hw.shape[-1]))
    res = {
        "psnr_bilinear": float(cal_psnr(hw, bil)),
        "ssim_bilinear": float(cal_ssim(hw, bil)),
        "steps": total_steps, "holdout_hw": list(test_region.shape[-2:]),
        "train_time_s": round(time.time() - t0, 1),
    }
    fake = None
    hw_in = hw * 2.0 - 1.0 if pm1 else hw
    for tag, bn_eval in (("batchstats", False), ("runstats", True)):
        gen = make_generator_fn(cfg, bn_eval=bn_eval)
        fake, _ = sr_full_image(cfg, gen, state.g_params, state.g_state, hw_in)
        fake = np.asarray(fake)
        if pm1:
            fake = (fake + 1.0) * 0.5  # back to [0,1] for the PSNR yardstick
        res[f"psnr_generator_{tag}"] = float(cal_psnr(hw, fake))
        res[f"ssim_generator_{tag}"] = float(cal_ssim(hw, fake))
    if args.sr_out:
        save_display(args.sr_out, fake)
        print(f"wrote {args.sr_out}")
    print("ZSSR_PHOTO " + json.dumps(res))


if __name__ == "__main__":
    main()

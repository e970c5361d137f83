#!/usr/bin/env python3
"""Rank per-epoch checkpoints by TRAIN-slice PSNR and report the winner's
held-out numbers — honest model selection for the quality protocol.

The reference has no model selection (it evaluates whatever the last epoch
left behind, train-gray-3.lua:354-535). GAN training oscillates: on the
150-epoch textured run the train-slice PSNR swings by >3 dB between
neighboring epochs and collapses after epoch ~104 (D destabilization;
PARITY.md). Selecting the epoch on the TRAIN slice (never the test slice)
and then scoring that one checkpoint on the held-out slice keeps the
reported test number unbiased.

Usage:
  python tools/select_checkpoint.py --dir checkpoints_quality \
      [--config gray-3] [--epochs 50:91] [--select-sets 3] [--full]

With --full, the winner is re-scored on the full 21-set (2,100-image)
train and test slices in the reference's print format.
"""

import argparse
import os
import sys
import zipfile

# XLA's C++ logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads
# (at `import jax`), so pin_cpu() setting it in-process is too late to mute
# the cpu_aot_loader pseudo-feature load messages. Set it before any jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True, help="checkpoint directory")
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--epochs", default=None,
                    help="a:b python-range slice of epochs (default: all found)")
    ap.add_argument("--select-sets", type=int, default=3,
                    help="train file_sets used for ranking (100 imgs each)")
    ap.add_argument("--full", action="store_true",
                    help="full 2,100-image train+test eval of the winner")
    ap.add_argument("--ema", action="store_true",
                    help="score the EMA branch of checkpoints trained with "
                         "--g-ema (requires the ema keys in the npz)")
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

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.synthetic import TexturedImages
    from dcgan_sr_tpu.evaluation.harness import evaluate_slice
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import latest_epoch, load_checkpoint

    cfg = get_config(args.config, **({"g_ema": 0.999} if args.ema else {}))
    src = TexturedImages(cfg.fineSize, nc=cfg.nc,
                         seed=1234)
    template = init_train_state(cfg, jax.random.PRNGKey(0))

    if args.epochs:
        a, b = args.epochs.split(":")
        epochs = range(int(a), int(b))
    else:
        epochs = range(1, (latest_epoch(args.dir, cfg.name) or 0) + 1)

    best = None
    for ep in epochs:
        try:
            st = load_checkpoint(args.dir, cfg.name, ep, template)
        except FileNotFoundError:
            continue
        except (zipfile.BadZipFile, ValueError, KeyError, OSError) as e:
            # a torn npz (pre-atomic-save kill mid-write) must not abort
            # the whole ranking — skip it loudly and keep scoring
            print(f"epoch {ep}: SKIPPED unreadable checkpoint ({e!r})",
                  flush=True)
            continue
        params = st.g_ema_params if args.ema else st.g_params
        r = evaluate_slice(cfg, None, params, st.g_state, src,
                           range(args.select_sets), batch_size=100)
        print(f"epoch {ep}: train-slice PSNR {r.psnr_generator:.3f} "
              f"SSIM {r.ssim_generator:.5f}", flush=True)
        if best is None or r.psnr_generator > best[1]:
            best = (ep, r.psnr_generator)

    if best is None:
        sys.exit(f"no checkpoints for {cfg.name} in {args.dir}")
    print(f"BEST by train-slice PSNR: epoch {best[0]} ({best[1]:.3f} dB)")

    if args.full:
        st = load_checkpoint(args.dir, cfg.name, best[0], template)
        final_params = st.g_ema_params if args.ema else st.g_params
        if cfg.patch_based:
            # 500/500 split mirroring the reference's counts
            # (train-gray-patch-batch.lua:365-367,487-489). NOTE: at this
            # tool's batch_size=100 the file_set indices address DIFFERENT
            # image numbers than the reference's batchSize-20 addressing —
            # fine on the procedural textured set (any index renders, 10000+
            # is held out from the images 1..10000 training stream), and
            # these exact slices are the COMMITTED fixture-selection protocol
            slices = (("Train-set", range(0, 5)),
                      ("Test-set", range(10000, 10005)))
        else:
            slices = (("Train-set", range(0, 21)),
                      ("Test-set", range(2000, 2021)))
        for tag, sets in slices:
            # file_set = 100 images in every reference protocol
            # (train-gray-3.lua:360, train-gray-patch-batch.lua:365-367)
            r = evaluate_slice(cfg, None, final_params, st.g_state, src, sets,
                               batch_size=100)
            r.print_reference_style(tag=tag)


if __name__ == "__main__":
    main()

"""CLI: `python train.py --config <variant>` — the seven entry scripts, unified.

Reproduces the reference's L6 layer (SURVEY.md §1): config with env-var
overrides, data pipeline selection, training loop with the reference log line,
end-of-run eval (PSNR/SSIM vs the bilinear control) and sample dumps through
the min-max display normalizer.

Data: `--data-root` points at CelebA (`.../img_align_celeba/Img`); without it
(or with --synthetic) a deterministic procedural image source stands in, so
every variant runs end-to-end on any machine.
"""

from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from .core import get_config
from .data import (FolderDataset, IndexedCelebA, PrefetchLoader,
                   SyntheticImages, TexturedImages)
from .evaluation import evaluate_slice
from .image import box_downsample2, resize_bilinear
from .image.io import save_display
from .image.ops import rgb2gray
from .infer.tiled import make_generator_fn, sr_full_image, sr_overlap_image
from .metrics import cal_psnr, cal_ssim
from .parallel import build_dp_train_step, create_mesh, shard_batch
from .train import build_train_step, init_train_state, train_epochs
from .train.checkpoint import latest_epoch, load_checkpoint


def _per_host(batch):
    """Multi-host feed: each process keeps only its slice of the global
    batch (parallel.mesh.local_batch_slice); no-op on a single host.
    Pytree-aware: device_augment batches are (canvas, tops, lefts, flips)
    tuples whose leaves all lead with the batch dim."""
    if jax.process_count() > 1:
        from .parallel.mesh import local_batch_slice
        n = len(jax.tree_util.tree_leaves(batch)[0])
        sl = local_batch_slice(n)
        return jax.tree_util.tree_map(lambda x: x[sl], batch)
    return batch


def build_data(cfg, args):
    """Returns (loader, batch_fn(epoch, step) -> (step_batch, nc, hw, hw))."""
    if (cfg.dataset == "folder" and not args.synthetic
            and not getattr(args, "textured", False)):
        root = args.data_root or os.environ.get(
            "DATA_ROOT", "/CelebA/Img/img_align_celeba")
        if os.path.isdir(root):
            ds = FolderDataset(root, cfg.loadSize, cfg.fineSize, cfg.nc,
                               verbose=True)
            dev_pre = cfg.device_preprocess
            dev_aug = cfg.device_augment
            if dev_aug:
                # raw loadSize canvases; crop/hflip happen in the train step
                sample = lambda rng: ds.sample_canvas(cfg.batchSize, rng)
            else:
                sample = lambda rng: ds.sample(cfg.batchSize, rng,
                                               normalize=not dev_pre)
            loader = PrefetchLoader(
                sample, n_threads=cfg.nThreads,
                manual_seed=cfg.manualSeed or 0)

            def batch_fn(epoch, i):
                batch = _per_host(loader.get_batch())
                if dev_pre or dev_aug:
                    # raw [0,1] RGB (for device_augment a (canvas, tops,
                    # lefts, flips) tuple): crop/hflip and gray-convert +
                    # normalize + degrade run fused inside the train step
                    return batch
                if cfg.nc == 1:
                    return np.asarray(rgb2gray(batch))[:, None]
                return batch
            return loader, batch_fn
        print(f"DATA_ROOT {root} not found; falling back to synthetic data")
    if cfg.device_augment or cfg.device_preprocess:
        # these knobs expect the folder path's raw-RGB feed; the indexed/
        # synthetic sources pre-normalize on the host
        print("device_augment/device_preprocess need the folder data path; "
              "disabled for this run")
        cfg.device_augment = False
        cfg.device_preprocess = False

    # indexed / synthetic path (sequential file order like train-gray-3)
    if getattr(args, "textured", False):
        src = TexturedImages(cfg.fineSize, nc=cfg.nc, seed=1234)  # fixed seed: a *fixture* set
    elif args.synthetic or cfg.dataset == "synthetic":
        src = SyntheticImages(cfg.fineSize, nc=cfg.nc,
                              seed=cfg.manualSeed or 1234)
    else:
        from .data.indexed import DEFAULT_ROUTE
        route = args.data_root or DEFAULT_ROUTE
        src = None
        if getattr(args, "native_loader", False):
            from .data import native
            if native.available():
                src = native.NativeIndexedLoader(
                    route, cfg.fineSize, nc=cfg.nc,
                    n_threads=max(cfg.nThreads, 1) * 2)
                print("using native C++ indexed loader")
            else:
                print("native loader requested but libdcgansr.so not built "
                      "(make -C native); falling back to Python loader")
        if src is None:
            src = IndexedCelebA(route, cfg.fineSize, nc=cfg.nc,
                                n_threads=cfg.nThreads)
        if not src.exists():
            print(f"indexed CelebA not found at {route}; using synthetic data")
            src = SyntheticImages(cfg.fineSize, nc=cfg.nc,
                                  seed=cfg.manualSeed or 1234)

    imgs_per_step = cfg.images_consumed_per_step

    def batch_fn(epoch, i):
        hr = src.load_batch(i, imgs_per_step)  # (imgs, nc, fine, fine) [0,1]
        if cfg.patch_based:
            # pure-numpy grid extraction (host path must not touch the device)
            b, ps = hr.shape[0], cfg.patchSize
            n = cfg.fineSize // ps
            hr = (hr[:, 0].reshape(b, n, ps, n, ps)
                  .transpose(0, 1, 3, 2, 4)
                  .reshape(b * n * n, 1, ps, ps))
        if cfg.data_range == "pm1":
            hr = hr * 2 - 1
        return np.ascontiguousarray(_per_host(hr))

    return src, batch_fn


def dump_samples(cfg, state, out_dir, sample):
    """End-of-run PNG dumps through toDisplayTensor semantics (train.lua:306-326).

    `sample`: ONE image in the LOADER range [0,1] — (H, W), (1, H, W), or
    (C, H, W).  Range/channel conventions mirror the eval harness
    (evaluation/harness.py): a 3-channel sample is gray-converted when
    cfg.nc == 1 (the trainHook's rgb2gray) — the pre-conversion COLOR image
    is also saved, like testSample's real_none_color_sample.png
    (train-gray.lua:326) — the generator is driven in its TRAINING range
    (pm1 variants get the trainHook's mul(2):add(-1), donkey_folder.lua:69),
    and outputs are mapped back to [0,1] so the printed PSNR/SSIM are
    comparable across variants.  Every saved PNG gets the reference's
    max/min/sum/std stats lines (train-gray.lua:334-380), computed on the
    [0,1]-mapped tensor that is saved.
    """
    from .utils.stats import print_tensor_stats

    os.makedirs(out_dir, exist_ok=True)

    def _dump(name, arr):
        # save + the reference's per-tensor stats lines, named by file stem
        arr = np.asarray(arr)
        save_display(os.path.join(out_dir, name + ".png"), arr)
        print_tensor_stats(name, arr)

    gen = make_generator_fn(cfg)
    hr01 = jnp.asarray(sample, jnp.float32)
    if hr01.ndim == 3 and cfg.nc == 1:
        if hr01.shape[0] == 3:
            # testSample saves the pre-rgb2gray color image first
            # (train-gray.lua:326)
            _dump("real_none_color_sample", hr01)
            hr01 = rgb2gray(hr01)          # (3, H, W) -> (H, W)
        else:
            hr01 = hr01[0]
    pm1 = cfg.data_range == "pm1"
    net_in = hr01 * 2.0 - 1.0 if pm1 else hr01
    _dump("real_none_sample", hr01)
    lr = box_downsample2(net_in)
    _dump("real_reduced_sample", (lr + 1.0) * 0.5 if pm1 else lr)
    bil = resize_bilinear(lr, cfg.fineSize, cfg.fineSize)
    if cfg.variant == "gray-patch-batch-overlap":
        res = sr_overlap_image(cfg, gen, state.g_params, state.g_state, net_in)
        naive, fake = res["naive"], res["seam"]
        if pm1:
            naive = (naive + 1.0) * 0.5
        _dump("fake_none_sample", naive)
        fake_name = "fake_none_overlap_sample"
    elif cfg.patch_based:
        from .infer.tiled import sr_grid_patches
        fake = sr_grid_patches(cfg, gen, state.g_params, state.g_state, net_in)
        fake_name = "fake_none_sample"
    else:
        # multi-channel configs (rgb-full) feed (1, C, h, w); single-channel
        # reuse the (H, W) helper
        if net_in.ndim == 3:
            fake = gen(state.g_params, state.g_state,
                       box_downsample2(net_in)[None])[0]
        else:
            fake, _ = sr_full_image(cfg, gen, state.g_params, state.g_state,
                                    net_in)
        fake_name = "fake_none_sample"
    if pm1:
        bil = (bil + 1.0) * 0.5
        fake = (fake + 1.0) * 0.5
    _dump("real_bilinear_sample", bil)
    _dump(fake_name, fake)

    def channel_mean(metric, a, b):
        if a.ndim == 2:
            return float(metric(a, b))
        return float(np.mean([float(metric(a[c], b[c]))
                              for c in range(a.shape[0])]))

    print("PSNR btwn real & bilinear: %.4f" % channel_mean(cal_psnr, hr01, bil))
    print("PSNR btwn real & fake: %.4f" % channel_mean(cal_psnr, hr01, fake))
    print("SSIM btwn real & bilinear: %.4f" % channel_mean(cal_ssim, hr01, bil))
    print("SSIM btwn real & fake: %.4f" % channel_mean(cal_ssim, hr01, fake))
    # polarity rescue check (train-gray-patch-batch.lua:673-680)
    if cfg.patch_based:
        from .evaluation import polarity_rescue
        img, psnr, inverted = polarity_rescue(np.asarray(hr01), np.asarray(fake))
        if inverted:
            _dump("fake_none_sample_reversed", img)
            print("PSNR btwn real & fake_reversed: %.4f" % psnr)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="gray-3",
                    help="one of the 7 reference variants")
    ap.add_argument("--steps", type=int, default=None,
                    help="steps per epoch (default: ntrain/batchSize)")
    ap.add_argument("--scan", type=int, default=1,
                    help="fuse K steps into one lax.scan program (one "
                         "dispatch per K steps; epoch math unchanged)")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--textured", action="store_true",
                    help="texture-rich procedural fixture set (fixed seed "
                         "1234) where bilinear is beatable — the quality-"
                         "parity protocol data")
    ap.add_argument("--native-loader", action="store_true",
                    help="decode via the C++ worker-pool loader (make -C native)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--eval", action="store_true", dest="do_eval")
    ap.add_argument("--eval-sets", type=int, default=2,
                    help="file_sets per eval slice")
    ap.add_argument("--samples-dir", default=None)
    ap.add_argument("--dp", action="store_true",
                    help="data-parallel over all local devices")
    ap.add_argument("--feed-bf16", action="store_true",
                    help="ship image batches host->device as bfloat16 "
                         "(HALVES the feed transfer — the tunnel moves "
                         "~38 MB/s, so a scanned f32 super-batch costs "
                         "~0.5-1.3 s/epoch; measured round 4). The step "
                         "upcasts to f32 at entry, so all training math is "
                         "unchanged except bf16 rounding of input pixels; "
                         "compute precision is governed by --bf16 as before")
    ap.add_argument("--stage-ahead", action="store_true",
                    help="double-buffer the feed: build + device_put chunk "
                         "c+1 while the device computes chunk c (dispatch "
                         "is async). Hides host batch work and the tunnel "
                         "transfer behind compute; same batches in the "
                         "same order, so training math is unchanged")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (fp32 params)")
    ap.add_argument("--use-pallas", action="store_true",
                    help="fused Pallas preprocess kernel in the train step")
    ap.add_argument("--device-preprocess", action="store_true",
                    help="feed raw [0,1] images; grayscale-convert/normalize/"
                         "degrade run fused on device (folder variants)")
    ap.add_argument("--device-augment", action="store_true",
                    help="feed raw loadSize canvases; the donkey hook's "
                         "random crop + hflip ALSO run on device in the "
                         "train step (implies --device-preprocess; folder "
                         "variants)")
    ap.add_argument("--compact-params", action="store_true",
                    help="2-D master-weight layout: Adam's elementwise "
                         "passes run on exactly-tiled tensors (ops/compact.py)")
    ap.add_argument("--fast-ops", action="store_true",
                    help="sub-pixel/s2d conv rewrites (exact; measured slower "
                         "than XLA's emitter on this toolchain)")
    ap.add_argument("--gan-weight", type=float, default=None, metavar="W",
                    help="scale on G's adversarial gradient (1.0 = parity; "
                         "0 = pure reconstruction CNN with --pixel-loss)")
    ap.add_argument("--pixel-loss", type=float, default=None, metavar="W",
                    help="add W * MSE(fake, real) to G's objective "
                         "(surplus over the reference; ~+3 dB at W=100)")
    ap.add_argument("--g-ema", type=float, default=None, metavar="D",
                    help="keep an EMA copy of G (decay D, e.g. 0.999) and "
                         "also report its eval scores — smooths the measured "
                         "epoch-to-epoch GAN oscillation (PARITY.md)")
    ap.add_argument("--self-ensemble", type=int, default=1, metavar="N",
                    choices=(1, 2, 4, 8),
                    help="eval-time geometric self-ensemble: average G over "
                         "N dihedral transforms of the input "
                         "(infer/ensemble.py; surplus over the reference — "
                         "measured +1.26 dB on the gray-3 fixture at 8)")
    ap.add_argument("--ensemble-batched", action="store_true",
                    help="run the N ensemble members as ONE (N*B)-batch "
                         "generator dispatch instead of N sequential ones "
                         "(exact under running-stats BN; pooled-BN-stats "
                         "variant in train mode — infer/ensemble.py)")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (the TPU plugin ignores "
                         "JAX_PLATFORMS; this sets the jax config directly)")
    ap.add_argument("--metrics-jsonl", default=None,
                    help="also write per-step metrics to this JSONL file")
    ap.add_argument("--log-every", type=int, default=1,
                    help="metric fetch/log cadence; >1 lets dispatch run "
                         "ahead of the host (per-step fetch syncs the device)")
    ap.add_argument("--profile-dir", default=None,
                    help="capture a jax.profiler trace of the run")
    args = ap.parse_args(argv)

    if args.cpu:
        from dcgan_sr_tpu.utils.cache import pin_cpu
        pin_cpu(jax)
    else:
        # TPU runs reuse the shared .jax_cache (first compiles through the
        # tunnel are 1-3.5 min per program)
        from dcgan_sr_tpu.utils.cache import enable_tpu_cache
        enable_tpu_cache(jax)

    overrides = {}
    if args.bf16:
        overrides["compute_dtype"] = "bfloat16"
    if args.use_pallas:
        overrides["use_pallas"] = True
    if args.fast_ops:
        overrides["fast_ops"] = True
    if args.pixel_loss is not None:
        overrides["pixel_loss_weight"] = args.pixel_loss
    if args.gan_weight is not None:
        overrides["gan_weight"] = args.gan_weight
    if args.g_ema is not None:
        overrides["g_ema"] = args.g_ema
    if args.device_preprocess:
        overrides["device_preprocess"] = True
    if args.device_augment:
        overrides["device_augment"] = True
        overrides["device_preprocess"] = True
    if args.compact_params:
        overrides["compact_params"] = True
    cfg = get_config(args.config, **overrides)
    if args.seed is not None:
        cfg.manualSeed = args.seed
    if cfg.manualSeed is None:
        cfg.manualSeed = int(np.random.randint(1, 10001))  # train.lua:30
    print(f"config: {cfg}")
    print(f"Random Seed: {cfg.manualSeed}")

    loader, batch_fn = build_data(cfg, args)
    if args.feed_bf16:
        # cast float image leaves on the host; int/bool offset leaves
        # (device_augment tuples) pass through. The train step upcasts to
        # f32 at entry (train/step.py), so only transfer bytes change.
        import ml_dtypes
        _inner_batch_fn = batch_fn

        def batch_fn(epoch, i):
            return jax.tree_util.tree_map(
                lambda x: x.astype(ml_dtypes.bfloat16)
                if getattr(x, "dtype", None) == np.float32 else x,
                _inner_batch_fn(epoch, i))

    key = jax.random.PRNGKey(cfg.manualSeed)
    state = init_train_state(cfg, key)

    start_epoch = 0
    if args.resume and args.checkpoint_dir:
        ep = latest_epoch(args.checkpoint_dir, cfg.name)
        if ep is not None:
            state = load_checkpoint(args.checkpoint_dir, cfg.name, ep, state,
                                    seed_missing_ema=True)
            start_epoch = ep
            print(f"resumed from epoch {ep}")

    prepare = None
    multi_step_fn = None
    if args.dp and jax.device_count() > 1:
        from .parallel import build_dp_multi_step
        mesh = create_mesh()
        step_fn = build_dp_train_step(cfg, mesh)
        # batch_dim 1 shards the B axis of a (K, B, ...) scan super-batch;
        # the canvas leaf (max ndim) decides — device_augment tuples carry
        # (B,) offset leaves that shard on the same spec prefix
        prepare = lambda b: shard_batch(
            b, mesh,
            batch_dim=max(x.ndim for x in jax.tree_util.tree_leaves(b)) - 4)
        if args.scan > 1:
            multi_step_fn = build_dp_multi_step(cfg, mesh)
        print(f"data-parallel over {jax.device_count()} devices")
    else:
        step_fn = jax.jit(build_train_step(cfg), donate_argnums=(0,))
        if args.scan > 1:
            from .train.multi_step import jit_multi_step
            multi_step_fn = jit_multi_step(cfg)

    epochs = args.epochs if args.epochs is not None else cfg.niter
    if args.steps is not None:
        steps = args.steps
    else:
        imgs = cfg.images_consumed_per_step
        ntrain = cfg.ntrain if math.isfinite(cfg.ntrain) else 1000
        steps = max(int(ntrain) // imgs, 1)

    logger = None
    if args.metrics_jsonl:
        from .utils.logging import MetricsLogger
        logger = MetricsLogger(jsonl_path=args.metrics_jsonl)

    from .utils.profiling import profile_trace
    t0 = time.perf_counter()
    with profile_trace(args.profile_dir, enabled=args.profile_dir is not None):
        state, _ = train_epochs(cfg, state, batch_fn, step_fn=step_fn,
                                niter=epochs, steps_per_epoch=steps,
                                checkpoint_dir=args.checkpoint_dir,
                                prepare_batch=prepare, logger=logger,
                                log_every=args.log_every,
                                scan_steps=args.scan,
                                multi_step_fn=multi_step_fn,
                                start_epoch=start_epoch,
                                stage_ahead=args.stage_ahead)
    if logger is not None:
        logger.close()

    if cfg.compact_params:
        # eval/inference/export consume 4-D conv weights
        from .models import discriminator_spec, generator_spec
        from .ops.compact import unpack_state
        state = unpack_state(state, generator_spec(cfg),
                             discriminator_spec(cfg))

    if args.do_eval:
        if not hasattr(loader, "load_batch"):
            print("eval requires an indexed/synthetic loader")
        elif cfg.variant == "gray-patch-batch-overlap":
            # the overlap variant's own eval scores bilinear vs naive-stitch
            # vs seam-stitch through the tiled pipeline
            # (train-gray-patch-batch-overlap.lua:423-424,453-454,703-704)
            from .evaluation import evaluate_overlap_slice
            from .infer.tiled import make_overlap_sr_fn
            sr = make_overlap_sr_fn(cfg, self_ensemble=args.self_ensemble,
                                    ensemble_batched=args.ensemble_batched)
            evaluate_overlap_slice(
                cfg, state.g_params, state.g_state, loader,
                range(args.eval_sets), sr_fn=sr,
            ).print_reference_style("Train-set")
            ts = cfg.test_file_set_start
            evaluate_overlap_slice(
                cfg, state.g_params, state.g_state, loader,
                range(ts, ts + args.eval_sets), sr_fn=sr,
            ).print_reference_style("Test-set")
            if state.g_ema_params is not None:
                evaluate_overlap_slice(
                    cfg, state.g_ema_params, state.g_state, loader,
                    range(ts, ts + args.eval_sets), sr_fn=sr,
                ).print_reference_style("Test-set-EMA")
        else:
            gen = make_generator_fn(cfg, self_ensemble=args.self_ensemble,
                                    ensemble_batched=args.ensemble_batched)
            train_res = evaluate_slice(cfg, gen, state.g_params, state.g_state,
                                       loader, range(args.eval_sets))
            train_res.print_reference_style("Train-set")
            # test slice base depends on the variant's file-addressing
            # batch (config.test_file_set_start)
            test_start = cfg.test_file_set_start
            test_res = evaluate_slice(cfg, gen, state.g_params, state.g_state,
                                      loader,
                                      range(test_start, test_start + args.eval_sets))
            test_res.print_reference_style("Test-set")
            if state.g_ema_params is not None:
                for tag, sets in (("Train-set-EMA", range(args.eval_sets)),
                                  ("Test-set-EMA",
                                   range(test_start,
                                         test_start + args.eval_sets))):
                    evaluate_slice(cfg, gen, state.g_ema_params, state.g_state,
                                   loader, sets).print_reference_style(tag)

    if args.samples_dir:
        # dump_samples takes ONE image in the LOADER range [0,1], all
        # channels — it applies the gray/pm1 conventions itself
        if hasattr(loader, "load_one"):
            sample = loader.load_one(1)
        else:
            batch = batch_fn(1, 0)
            if isinstance(batch, tuple):
                # device_augment (canvas, tops, lefts, flips): apply the
                # first image's drawn crop AND flip for the dump, so the
                # sample is the trainHook crop for that draw (raw [0,1];
                # gray/normalize happen inside dump_samples)
                canvas, tops, lefts, flips = batch
                t, l, fs = int(tops[0]), int(lefts[0]), cfg.fineSize
                sample = canvas[0, :, t:t + fs, l:l + fs]
                if bool(flips[0]):
                    sample = sample[:, :, ::-1]
            elif cfg.device_preprocess:
                # raw [0,1] images; gray/normalize run on-device in the step
                sample = batch[0]
            else:
                # host path: batch is already gray-converted AND in the
                # training range — map pm1 back to the loader range
                sample = batch[0]
                if cfg.data_range == "pm1":
                    sample = (sample + 1.0) * 0.5
        dump_samples(cfg, state, args.samples_dir, sample)

    print("Total time: %.3f" % (time.perf_counter() - t0))
    if hasattr(loader, "close"):
        loader.close()
    return state


if __name__ == "__main__":
    main()

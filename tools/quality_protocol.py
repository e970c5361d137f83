"""Quality-parity protocol: JAX twin of the trained-torch baseline + the
cross-stack agreement check.

Three measurements (VERDICT.md round-1 'next round' #1):
  1. OUR stack trains the same protocol the torch baseline trained
     (same committed textured fixture set, same init seed, same reference
     step semantics) and scores it with the reference eval
     (train-gray-3.lua:354-535 shape).
  2. The TORCH-trained weights are imported (compat.pytorch_bridge) and
     scored by OUR fused eval harness on the same slices — torch-evaluated
     vs JAX-evaluated numbers for the SAME network must agree.
  3. The imported generator's forward outputs are bit-compared against
     torch's forward on the same inputs.

Reads /tmp/torch_baseline/{result.json,torch_weights.npz} produced by
tools/torch_baseline.py; prints a markdown table fragment for PARITY.md.

Usage: python tools/quality_protocol.py [--torch-dir /tmp/torch_baseline]
       [--cpu]
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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_torch_weights_into_params(npz, tag, seq, params):
    """Rebuild params from torch_baseline's positional npz dump."""
    import torch.nn as nn
    import jax.numpy as jnp

    out = [dict(p) for p in params]
    mods = list(seq)
    pi = iter([p for p in out if p])
    cur = None
    for i, m in enumerate(mods):
        if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
            cur = next(pi)
            cur["w"] = jnp.asarray(npz[f"{tag}_{i}_w"])
        elif isinstance(m, nn.BatchNorm2d):
            cur["bn_scale"] = jnp.asarray(npz[f"{tag}_{i}_bn_w"])
            cur["bn_bias"] = jnp.asarray(npz[f"{tag}_{i}_bn_b"])
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-dir", default="/tmp/torch_baseline")
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--skip-twin", action="store_true",
                    help="only run the cross-stack agreement checks")
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
    from dcgan_sr_tpu.data import TexturedImages
    from dcgan_sr_tpu.evaluation import evaluate_slice
    from dcgan_sr_tpu.models import (apply_network, discriminator_spec,
                                     generator_spec, init_network)
    from dcgan_sr_tpu.train import build_train_step, init_train_state, train_epochs

    with open(os.path.join(args.torch_dir, "result.json")) as f:
        tres = json.load(f)
    print("torch baseline:", json.dumps(tres["train"]), json.dumps(tres["test"]))
    batch, ntrain = 20, tres["ntrain"]
    epochs, seed, eval_sets = tres["epochs"], tres["seed"], 5

    cfg = get_config(args.config, env_override=False,
                     batchSize=batch, ntrain=ntrain)
    cfg.manualSeed = seed
    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)

    rows = []

    # ---- 1. JAX twin: same protocol, our stack -----------------------------
    if not args.skip_twin:
        state = init_train_state(cfg, jax.random.PRNGKey(seed))
        step = jax.jit(build_train_step(cfg), donate_argnums=(0,))

        def batch_fn(epoch, i):
            return jnp.asarray(src.load_batch(i, batch))

        state, _ = train_epochs(cfg, state, batch_fn, step_fn=step,
                                niter=epochs,
                                steps_per_epoch=ntrain // batch, log_every=20)
        tw_train = evaluate_slice(cfg, None, state.g_params, state.g_state,
                                  src, range(eval_sets))
        tw_test = evaluate_slice(cfg, None, state.g_params, state.g_state,
                                 src, range(2000, 2000 + eval_sets))
        rows.append(("ours (JAX, same protocol/seed)", tw_train, tw_test))

    # ---- 2. torch-trained weights scored by OUR harness --------------------
    from dcgan_sr_tpu.compat.pytorch_bridge import spec_to_torch
    npz = np.load(os.path.join(args.torch_dir, "torch_weights.npz"))
    g_spec = generator_spec(cfg)
    g_params0, g_state0 = init_network(jax.random.PRNGKey(0), g_spec)
    g_seq = spec_to_torch(g_spec)
    g_params_t = load_torch_weights_into_params(npz, "g", g_seq, g_params0)
    im_train = evaluate_slice(cfg, None, g_params_t, g_state0, src,
                              range(eval_sets))
    im_test = evaluate_slice(cfg, None, g_params_t, g_state0, src,
                             range(2000, 2000 + eval_sets))
    rows.append(("torch-trained, OUR eval", im_train, im_test))

    # ---- 3. forward bit-compare on one batch -------------------------------
    import torch
    from dcgan_sr_tpu.compat.pytorch_bridge import copy_params_to_torch
    copy_params_to_torch(g_seq, g_params_t)
    g_seq.train()
    hr = src.load_batch(0, batch)
    lr = hr.reshape(batch, 1, 32, 2, 32, 2).mean(axis=(3, 5))
    with torch.no_grad():
        t_out = g_seq(torch.from_numpy(lr)).numpy()
    j_out, _ = apply_network(g_spec, g_params_t, jnp.asarray(lr), g_state0,
                             train=True)
    diff = float(np.abs(np.asarray(j_out) - t_out).max())
    print(f"forward bit-compare (torch vs JAX, imported weights): "
          f"max |diff| = {diff:.3e}")

    # ---- table --------------------------------------------------------------
    def fmt(r):
        return (f"{r.psnr_generator:.3f} / {r.ssim_generator:.4f} "
                f"(bilinear {r.psnr_bilinear:.3f} / {r.ssim_bilinear:.4f})")

    print("\n| stack | train PSNR/SSIM | test PSNR/SSIM |")
    print("|---|---|---|")
    tt, te = tres["train"], tres["test"]
    print(f"| torch-CPU trained+evaluated | {tt['psnr_generator']:.3f} / "
          f"{tt['ssim_generator']:.4f} (bilinear {tt['psnr_bilinear']:.3f} / "
          f"{tt['ssim_bilinear']:.4f}) | {te['psnr_generator']:.3f} / "
          f"{te['ssim_generator']:.4f} (bilinear {te['psnr_bilinear']:.3f} / "
          f"{te['ssim_bilinear']:.4f}) |")
    for name, tr, ts in rows:
        print(f"| {name} | {fmt(tr)} | {fmt(ts)} |")
    print(f"\nforward max|diff| = {diff:.3e}")


if __name__ == "__main__":
    main()

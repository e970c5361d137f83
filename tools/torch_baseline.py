"""Trained torch-CPU baseline for the quality-parity protocol.

Runs the reference training semantics (train-gray-3.lua:229-350: fDx D-real/
D-fake BCE, fGx through a frozen D, torch/optim adam) as an actual PyTorch
model on the SAME committed textured fixture set our TPU runs use, then scores
it with the reference eval protocol (train-gray-3.lua:354-535: mean PSNR/SSIM
of generator and bilinear control over fixed train/test slices) — computed
here with torch/numpy/scipy only, independent of the JAX stack.

Outputs a JSON line with the numbers plus a weights .npz that
tests/tools can import into our params (compat.pytorch_bridge) to show the
two stacks score the same trained network identically.

Usage: python tools/torch_baseline.py --epochs 12 --ntrain 2000 --out /tmp/tb
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dcgan_sr_tpu.core import get_config  # noqa: E402
from dcgan_sr_tpu.data import TexturedImages  # noqa: E402
from dcgan_sr_tpu.compat.pytorch_bridge import (  # noqa: E402
    Torch7Adam, copy_params_to_torch, spec_to_torch)


# ---- reference metrics, numpy/scipy only (train-gray-3.lua:143-221) --------
def np_psnr(a, b):
    mse = float(np.sum((a - b) ** 2) / (a.shape[-2] * a.shape[-1]))
    return 99.0 if mse <= 0 else 10.0 * np.log10(1.0 / mse)


def _gaussian11():
    size, sigma = 11, 1.5
    c = size / 2 + 0.5
    i = np.arange(1, size + 1, dtype=np.float64)
    g1 = np.exp(-(((i - c) / sigma) ** 2) / 2)
    k = np.outer(g1, g1)
    return (k / k.sum()).astype(np.float64)


def np_ssim(a, b):
    from scipy.signal import convolve2d
    k1, k2, L = 0.01, 0.03, 255.0
    c1, c2 = (k1 * L) ** 2, (k2 * L) ** 2
    x = (a.astype(np.float64) + 1.0) / 2.0 * 255.0
    y = (b.astype(np.float64) + 1.0) / 2.0 * 255.0
    win = _gaussian11()
    mu1 = convolve2d(x, win, mode="full")
    mu2 = convolve2d(y, win, mode="full")
    s1 = convolve2d(x * x, win, mode="full") - mu1 * mu1
    s2 = convolve2d(y * y, win, mode="full") - mu2 * mu2
    s12 = convolve2d(x * y, win, mode="full") - mu1 * mu2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return float(m.mean())


def reference_step(g, d, optG, optD, hr, crit, torch):
    """fDx + fGx (train-gray-3.lua:229-328); returns (errD, errG)."""
    b = hr.shape[0]
    optD.zero_grad()
    err_real = crit(d(hr), torch.ones(b))
    err_real.backward()
    lr_img = hr.reshape(b, 1, hr.shape[2] // 2, 2, hr.shape[3] // 2, 2) \
               .mean(dim=(3, 5))
    fake = g(lr_img)
    err_fake = crit(d(fake.detach()), torch.zeros(b))
    err_fake.backward()
    optG.zero_grad()
    for p in d.parameters():
        p.requires_grad_(False)  # fGx only calls updateGradInput (:268)
    err_g = crit(d(fake), torch.ones(b))
    err_g.backward()
    for p in d.parameters():
        p.requires_grad_(True)
    optD.step()
    optG.step()
    return float(err_real + err_fake), float(err_g)


def evaluate(g, src, file_sets, batch, torch):
    """Reference protocol slice eval: per-image PSNR/SSIM of bilinear and G."""
    import torch.nn.functional as F
    sums = np.zeros(4)
    n = 0
    g.train()  # reference never switches to evaluate() — batch stats
    with torch.no_grad():
        for fs in file_sets:
            hr = torch.from_numpy(src.load_batch(fs, batch))  # (B,1,H,W) [0,1]
            b, _, H, W = hr.shape
            lr = hr.reshape(b, 1, H // 2, 2, W // 2, 2).mean(dim=(3, 5))
            bil = F.interpolate(lr, size=(H, W), mode="bilinear",
                                align_corners=True)
            fake = g(lr)
            hrn, biln, fkn = (t.numpy()[:, 0] for t in (hr, bil, fake))
            for i in range(b):
                sums += [np_psnr(hrn[i], biln[i]), np_psnr(hrn[i], fkn[i]),
                         np_ssim(hrn[i], biln[i]), np_ssim(hrn[i], fkn[i])]
                n += 1
    return dict(psnr_bilinear=sums[0] / n, psnr_generator=sums[1] / n,
                ssim_bilinear=sums[2] / n, ssim_generator=sums[3] / n,
                n_images=n)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--ntrain", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--eval-sets", type=int, default=5)
    ap.add_argument("--out", default="/tmp/torch_baseline")
    args = ap.parse_args(argv)

    import torch
    import torch.nn as nn
    torch.manual_seed(args.seed)
    torch.set_num_threads(os.cpu_count() or 8)

    cfg = get_config(args.config, env_override=False)
    cfg.manualSeed = args.seed

    # identical init to our runs: JAX init_network -> copy into torch.
    # Pin the CPU backend: this tool must never grab the (single) TPU tunnel
    # out from under a concurrent training run.
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dcgan_sr_tpu.models import (discriminator_spec, generator_spec,
                                     init_network)
    g_spec, d_spec = generator_spec(cfg), discriminator_spec(cfg)
    key = jax.random.PRNGKey(args.seed)
    kg, kd = jax.random.split(key)
    g_params, _ = init_network(kg, g_spec)
    d_params, _ = init_network(kd, d_spec)
    g = copy_params_to_torch(spec_to_torch(g_spec), g_params)
    d = copy_params_to_torch(spec_to_torch(d_spec), d_params)

    optG, optD = Torch7Adam(g.parameters()), Torch7Adam(d.parameters())
    crit = nn.BCELoss()
    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)

    steps = max(args.ntrain // args.batch, 1)
    t0 = time.time()
    for epoch in range(1, args.epochs + 1):
        for i in range(steps):
            hr = torch.from_numpy(src.load_batch(i, args.batch))
            err_d, err_g = reference_step(g, d, optG, optD, hr, crit, torch)
        print(f"Epoch: [{epoch}][{steps}/{steps}] "
              f"Err_G: {err_g:.6f} Err_D: {err_d:.4f} "
              f"({time.time() - t0:.1f}s)", flush=True)

    train_res = evaluate(g, src, range(args.eval_sets), args.batch, torch)
    test_res = evaluate(g, src, range(2000, 2000 + args.eval_sets),
                        args.batch, torch)

    os.makedirs(args.out, exist_ok=True)
    # save conv/bn tensors positionally for re-import via pytorch_bridge
    tensors = {}
    for tag, net in (("g", g), ("d", d)):
        for i, m in enumerate(net):
            if isinstance(m, (nn.Conv2d, nn.ConvTranspose2d)):
                tensors[f"{tag}_{i}_w"] = m.weight.detach().numpy()
            elif isinstance(m, nn.BatchNorm2d):
                tensors[f"{tag}_{i}_bn_w"] = m.weight.detach().numpy()
                tensors[f"{tag}_{i}_bn_b"] = m.bias.detach().numpy()
    np.savez(os.path.join(args.out, "torch_weights.npz"), **tensors)

    result = {"config": args.config, "epochs": args.epochs,
              "ntrain": args.ntrain, "seed": args.seed,
              "train": train_res, "test": test_res,
              "train_time_s": round(time.time() - t0, 1)}
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("TORCH_BASELINE " + json.dumps(result))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark: training throughput (images/sec) of the flagship gray-3 config
on one TPU chip, vs the reference's CPU throughput.

The reference publishes no numbers (BASELINE.md); the north-star target is
>10x its CPU images/sec.  The baseline here is a faithful torch-CPU
re-enactment of the reference's per-step work (fDx: D fwd/bwd real, box
downsample, G fwd, D fwd/bwd fake; fGx: backprop through D into G; two Adam
updates — train-gray-3.lua:229-328), measured once and cached in
BASELINE_MEASURED.json.

Prints ONE JSON line:
  {"metric": "train_images_per_sec", "value": N, "unit": "images/sec",
   "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = 100
STEPS = 20
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def measure_torch_cpu_baseline(batch=BATCH, steps=3):
    """Reference per-step work in torch-CPU (same models, losses, optimizer)."""
    import numpy as np
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    ngf, ndf = 8, 64

    class Flatten(nn.Module):
        def forward(self, x):
            return x.reshape(x.shape[0])

    netG = nn.Sequential(  # train-gray-3.lua:52-73
        nn.UpsamplingNearest2d(scale_factor=2),
        nn.ConvTranspose2d(1, ngf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 4), nn.ReLU(True),
        nn.ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 2), nn.ReLU(True),
        nn.ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf), nn.ReLU(True),
        nn.Conv2d(ngf, ngf * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 2), nn.ReLU(True),
        nn.Conv2d(ngf * 2, ngf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ngf * 4), nn.ReLU(True),
        nn.Conv2d(ngf * 4, 1, 4, 2, 1, bias=False), nn.Sigmoid(),
    )
    netD = nn.Sequential(  # train-gray-3.lua:77-95
        nn.Conv2d(1, ndf, 4, 2, 1, bias=False), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 2), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 4), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False),
        nn.BatchNorm2d(ndf * 8), nn.LeakyReLU(0.2, True),
        nn.Conv2d(ndf * 8, 1, 4, 1, 0, bias=False), nn.Sigmoid(), Flatten(),
    )
    crit = nn.BCELoss()
    optG = torch.optim.Adam(netG.parameters(), lr=2e-4, betas=(0.5, 0.999))
    optD = torch.optim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999))
    rng = np.random.RandomState(0)

    def one_step():
        hr = torch.from_numpy(rng.rand(batch, 1, 64, 64).astype("float32"))
        optD.zero_grad()
        out_real = netD(hr)
        err_real = crit(out_real, torch.ones(batch))
        err_real.backward()
        lr_img = hr.reshape(batch, 1, 32, 2, 32, 2).mean(dim=(3, 5))
        fake = netG(lr_img)
        out_fake = netD(fake.detach())
        err_fake = crit(out_fake, torch.zeros(batch))
        err_fake.backward()
        optD.step()
        optG.zero_grad()
        out_fake2 = netD(fake)
        err_g = crit(out_fake2, torch.ones(batch))
        err_g.backward()
        optG.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def get_baseline():
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    ips = measure_torch_cpu_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump({"torch_cpu_images_per_sec": ips,
                   "config": "gray-3", "batch": BATCH,
                   "note": "torch-CPU re-enactment of train-gray-3.lua "
                           "per-step work (fDx+fGx+2 Adam)"}, f, indent=1)
    return ips


def measure_tpu(batch=BATCH, k=STEPS, reps=3):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    cfg = get_config("gray-3", env_override=False, batchSize=batch,
                     compute_dtype="bfloat16")
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    mstep = jit_multi_step(cfg)  # k steps fused into one program (lax.scan)

    rng = np.random.RandomState(0)
    super_batch = jax.device_put(jnp.asarray(
        rng.rand(k, batch, 1, 64, 64), jnp.float32))
    state, m = mstep(state, super_batch)  # compile
    float(m["errG"][-1])
    # NB: block_until_ready does not synchronize through the axon tunnel;
    # fetching a value that depends on the whole step chain does.
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m = mstep(state, super_batch)
    float(m["errG"][-1])  # chain-dependent host fetch forces full execution
    dt = (time.perf_counter() - t0) / (reps * k)
    return batch / dt


def main():
    baseline = get_baseline()
    ips = measure_tpu()
    print(json.dumps({
        "metric": "train_images_per_sec",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / baseline, 2),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Secondary benchmark: patch-overlap SR inference throughput (upscaled MP/s)
on one TPU chip vs a torch-CPU re-enactment of the reference pipeline
(train-gray-patch-batch-overlap.lua:377-704: 225-tile extraction, per-tile 2x2
degrade, generator over the tile batch, naive + seam-cut stitch).

BASELINE.md target: >10x the reference CPU upscaled MP/sec.
Prints one JSON line (same schema as bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")
N_IMAGES = 64

_META_KEYS = {"note", "regenerated", "host"}


def record_regen(data, regen_keys):
    """Stamp provenance for a (possibly partial) baseline regeneration:
    append which keys were re-measured on which host, and set 'host' to the
    current host ONLY when no previously-measured value is retained —
    otherwise mark it mixed, so bench lines never attribute a retained
    number to the new host (shared by bench.py's get_baselines)."""
    from dcgan_sr_tpu.utils.cache import machine_fingerprint
    host = machine_fingerprint()[1]
    data.setdefault("regenerated", []).append(
        {"variants": sorted(regen_keys), "host": host})
    retained = [k for k in data
                if k not in _META_KEYS and k not in regen_keys]
    data["host"] = host if not retained else (
        "mixed — per-key provenance in 'regenerated'")
    return data


def measure_torch_cpu(n_images=4):
    import numpy as np
    import torch
    import torch.nn as nn

    from dcgan_sr_tpu.infer.seam import seam_stitch

    torch.manual_seed(0)
    ngf = 16
    netG = nn.Sequential(  # overlap:76-103 topology
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
    netG.train()  # reference never switches to eval
    rng = np.random.RandomState(0)

    def one(img):
        tiles = np.stack([img[4 * (i // 15):4 * (i // 15) + 8,
                              4 * (i % 15):4 * (i % 15) + 8]
                          for i in range(225)])
        lr = tiles.reshape(225, 4, 2, 4, 2).mean(axis=(2, 4))
        with torch.no_grad():
            fake = netG(torch.from_numpy(lr[:, None]).float()).numpy()[:, 0]
        out = np.zeros((64, 64), np.float32)
        for i in range(225):  # naive stitch
            out[4 * (i // 15):4 * (i // 15) + 8,
                4 * (i % 15):4 * (i % 15) + 8] = fake[i]
        seam_stitch(fake, 64, 8, 4)
        return out

    imgs = rng.rand(n_images, 64, 64).astype(np.float32)
    one(imgs[0])  # warmup
    t0 = time.perf_counter()
    for img in imgs:
        one(img)
    dt = time.perf_counter() - t0
    return n_images * 64 * 64 / 1e6 / dt  # upscaled MP/s


def measure_tpu(n_images=N_IMAGES, reps=3, self_ensemble=1, scan_steps=20,
                ensemble_batched=False, bn_eval=False):
    """Sustained MP/s of the on-device overlap pipeline.

    The measured body is `scan_steps` pipeline invocations inside ONE jitted
    `lax.scan` — per-dispatch tunnel overhead (~2-3 ms RPC + host fetch) is
    NOT pipeline cost, and a single-dispatch loop understates the program by
    ~36% (measured: 8.6 MP/s single-dispatch vs 13.5 MP/s in-program,
    tools/attr_overlap.py).  Both stitched outputs fold into the scan carry
    so XLA cannot dead-code the stitching."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dcgan_sr_tpu.utils.cache import enable_tpu_cache
    enable_tpu_cache(jax)  # driver runs bench.py directly, without the
    #                        tpu_block shell export; tunnel compiles are
    #                        1-3.5 min per program without the cache

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config("gray-patch-batch-overlap", env_override=False)
    st = init_train_state(cfg, jax.random.PRNGKey(0))
    # bn_eval=True is the documented intent/quality mode (running-stats BN,
    # +5.6 dB over parity BN at overlap inference — PARITY.md) and defaults
    # to the flat (N*T)-tile generator dispatch, measured faster than the
    # vmapped per-image parity pipeline (docs/attr_variants.md round-4 sweep).
    run = make_overlap_sr_fn(cfg, compute_dtype=jnp.bfloat16,
                             bn_eval=bn_eval,
                             self_ensemble=self_ensemble,
                             ensemble_batched=ensemble_batched)

    @jax.jit
    def scanned(params, state, batches):
        def body(acc, imgs):
            out = run(params, state, imgs)
            return (acc + jnp.float32(out["naive"].sum())
                    + jnp.float32(out["seam"].sum())), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), batches)
        return acc

    batches = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(scan_steps, n_images, 64, 64),
        jnp.float32))
    float(scanned(st.g_params, st.g_state, batches))  # compile + sync
    rep_mps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = scanned(st.g_params, st.g_state, batches)
        float(acc)  # chain-dependent host fetch forces full execution
        dt = (time.perf_counter() - t0) / scan_steps
        rep_mps.append(n_images * 64 * 64 / 1e6 / dt)
    return rep_mps


def overlap_record(bn_eval=False):
    """Measure the TPU overlap-SR pipeline and build the driver JSON record,
    lazily measuring + caching the torch-CPU baseline in BASELINE_FILE.
    Single source of truth for the record — bench.py calls this too.

    bn_eval=False is the parity pipeline (per-image train-mode BN — the
    reference's convention, overlap:427-431, same math as the torch-CPU
    baseline).  bn_eval=True is the recommended quality mode (running-stats
    BN, +5.6 dB — PARITY.md) via the flat (N*T)-tile dispatch; its
    vs_baseline divides by the SAME parity torch-CPU baseline, since that is
    the pipeline a reference user runs either way."""
    data = {}
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
    if "torch_cpu_overlap_mp_per_sec" not in data:
        data["torch_cpu_overlap_mp_per_sec"] = measure_torch_cpu()
        record_regen(data, ["torch_cpu_overlap_mp_per_sec"])
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f, indent=1)
    from dcgan_sr_tpu.utils.measure import median_spread
    mps, spread = median_spread(measure_tpu(bn_eval=bn_eval), 3)
    return {
        "metric": "overlap_sr_upscaled_mp_per_sec"
                  + ("_bn_eval" if bn_eval else ""),
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / data["torch_cpu_overlap_mp_per_sec"], 2),
        "rep_spread": spread,
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--self-ensemble", type=int, default=1,
                    choices=(1, 2, 4, 8),
                    help="measure the dihedral-averaged pipeline's MP/s "
                         "instead (quality surplus costing; the driver "
                         "record always benches the parity pipeline)")
    ap.add_argument("--ensemble-batched", action="store_true",
                    help="run the N ensemble members as ONE (N*T)-tile "
                         "generator dispatch (infer/ensemble.py batched "
                         "form) instead of N sequential dispatches")
    ap.add_argument("--bn-eval", action="store_true",
                    help="measure the running-stats/flat-tile quality mode "
                         "instead of the parity pipeline")
    args = ap.parse_args()
    if args.self_ensemble != 1:
        # The batched ensemble multiplies the tile batch by N; shrink the
        # per-dispatch image count to keep the fused program inside HBM
        # (64 imgs x 225 tiles x 8 members OOMs a 16G v5e). MP/s is
        # per-image-normalized, so the smaller dispatch only slightly
        # understates throughput.
        from dcgan_sr_tpu.utils.measure import median_spread
        mps, spread = median_spread(measure_tpu(
            n_images=max(8, N_IMAGES // args.self_ensemble),
            self_ensemble=args.self_ensemble,
            ensemble_batched=args.ensemble_batched,
            bn_eval=args.bn_eval), 3)
        form = "_batched" if args.ensemble_batched else ""
        mode = "_bn_eval" if args.bn_eval else ""
        print(json.dumps({
            "metric": "overlap_sr_upscaled_mp_per_sec_"
                      f"tta{args.self_ensemble}{form}{mode}",
            "value": round(mps, 3), "unit": "MP/s",
            "rep_spread": spread}))
    else:
        print(json.dumps(overlap_record(bn_eval=args.bn_eval)))


if __name__ == "__main__":
    main()

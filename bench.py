#!/usr/bin/env python3
"""Benchmark: training throughput (images/sec) on one TPU chip vs the
reference's CPU throughput, for the flagship shapes:

  gray-3           batch 100 of 64x64 gray    (train-gray-3.lua geometry)
  rgb-full         batch 100 of 64x64 RGB     (train.lua geometry)
  gray-patch-batch 1,280-patch effective batch of 8x8 (patch-batch geometry)

The reference publishes no numbers (BASELINE.md); the north-star target is
>10x its CPU images/sec.  Each baseline is a torch-CPU re-enactment of the
reference's per-step work (fDx: D fwd/bwd real, box downsample, G fwd,
D fwd/bwd fake; fGx: backprop through D into G; two Adam updates —
train-gray-3.lua:229-328) with each variant's OWN label scheme, including
rgb-full's per-image quarter-MSE fake targets (train.lua:237-245).  The
baseline is vectorized torch (the reference's Lua per-pixel downsample and
per-image label loops are replaced by tensor ops), so it is GENEROUS to the
reference and vs_baseline is conservative.  Measured once and cached in
BASELINE_MEASURED.json.

Prints one JSON line per config; the FLAGSHIP (gray-3) line is LAST:
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

# variant -> (config overrides, per-step input shape, images per step)
SHAPES = {
    "gray-3": (dict(batchSize=BATCH), (BATCH, 1, 64, 64), BATCH),
    "rgb-full": (dict(batchSize=BATCH), (BATCH, 3, 64, 64), BATCH),
    # 20 images x 64 patches = 1,280-patch effective batch
    # (train-gray-patch-batch.lua:10,21,113-122); throughput counted in
    # images like the reference's epoch accounting
    "gray-patch-batch": (dict(), (1280, 1, 8, 8), 20),
}


def measure_torch_cpu_baseline(variant, steps=3):
    """Reference per-step work in torch-CPU (same models, losses, optimizer)."""
    import numpy as np
    import torch
    import torch.nn as nn

    from dcgan_sr_tpu.compat.pytorch_bridge import spec_to_torch
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.models import discriminator_spec, generator_spec

    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    overrides, shape, imgs = SHAPES[variant]
    cfg = get_config(variant, env_override=False, **overrides)
    netG = spec_to_torch(generator_spec(cfg))
    netD = spec_to_torch(discriminator_spec(cfg))
    crit = nn.BCELoss() if cfg.loss == "bce" else nn.MSELoss()
    optG = torch.optim.Adam(netG.parameters(), lr=2e-4, betas=(0.5, 0.999))
    optD = torch.optim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999))
    rng = np.random.RandomState(0)
    b, _, h, w = shape

    def fake_labels(hr, fake):
        # the reference computes D's fake targets per image on the host
        # (train.lua:237-245 quarter-MSE, train-gray.lua:258-265 H*W-MSE);
        # constants otherwise (train-gray-3.lua label:fill)
        if cfg.fake_label == "per_image_quarter_mse":
            return (hr - fake).pow(2).reshape(b, -1).sum(1) / (
                4 * shape[1] * h * w)
        if cfg.fake_label == "per_image_mse":
            return (hr - fake).pow(2).reshape(b, -1).sum(1) / (h * w)
        return torch.full((b,), float(cfg.fake_label))

    def one_step():
        hr = torch.from_numpy(rng.rand(*shape).astype("float32"))
        if cfg.data_range == "pm1":
            hr = hr * 2 - 1
        optD.zero_grad()
        out_real = netD(hr)
        err_real = crit(out_real, torch.full((b,), float(cfg.real_label)))
        err_real.backward()
        lr_img = hr.reshape(b, shape[1], h // 2, 2, w // 2, 2).mean(dim=(3, 5))
        fake = netG(lr_img)
        out_fake = netD(fake.detach())
        err_fake = crit(out_fake, fake_labels(hr, fake.detach()))
        err_fake.backward()
        optD.step()
        optG.zero_grad()
        out_fake2 = netD(fake)
        err_g = crit(out_fake2, torch.full((b,), float(cfg.g_label)))
        err_g.backward()
        optG.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = (time.perf_counter() - t0) / steps
    return imgs / dt


def get_baselines():
    data = {}
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
        if "torch_cpu_images_per_sec" in data:  # round-1 single-config format
            data = {"gray-3": data["torch_cpu_images_per_sec"],
                    "note": data.get("note", "")}
    regen = []
    for variant in SHAPES:
        if variant not in data:
            data[variant] = measure_torch_cpu_baseline(variant)
            regen.append(variant)
    if regen:
        # Never clobber the committed note (it records the label-scheme and
        # cross-host-comparability caveats); instead append a regeneration
        # record naming WHICH variants were re-measured and on what host, so
        # baselines from different machines are never silently mixed.
        data.setdefault("note", (
            "torch-CPU re-enactment of the reference per-step work "
            "(fDx+fGx+2 Adam) per variant, images/sec"))
        import bench_infer
        bench_infer.record_regen(data, regen)
        with open(BASELINE_FILE, "w") as f:
            json.dump(data, f, indent=1)
    return data


def _host_desc():
    from dcgan_sr_tpu.utils.cache import machine_fingerprint
    return machine_fingerprint()[1]


def cpu_anchor(reps=5):
    """Fixed CPU-only workload timed in seconds per rep — a host-speed anchor
    stamped on every bench line.  Cross-round readers compare anchors: equal
    anchor + moved TPU numbers => tunnel drift or a real program regression;
    moved anchor => the round landed on a different/changed host (round-4
    VERDICT: the r04 ~5% dip was undecidable from the artifact alone)."""
    import numpy as np
    rng = np.random.RandomState(0)
    a = rng.rand(768, 768).astype(np.float64)
    b = a @ a  # warmup (BLAS thread pool spin-up)
    t0 = time.perf_counter()
    for _ in range(reps):
        b = a @ (b / np.linalg.norm(b))  # renormalize: bounded, defeats DCE
    return (time.perf_counter() - t0) / reps


def tunnel_probe():
    """Time of the first tiny TPU round trip (backend init + one dispatch).
    A healthy tunnel probes in ~3-90 s depending on cache state; a wedged one
    hangs (CLAUDE.md).  Stamped on bench lines as tunnel-health provenance."""
    import jax.numpy as jnp
    t0 = time.perf_counter()
    float(jnp.ones((8, 128)).sum())
    return time.perf_counter() - t0


def measure_tpu(variant, k=STEPS, reps=3):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dcgan_sr_tpu.utils.cache import enable_tpu_cache
    enable_tpu_cache(jax)  # driver runs bench.py directly, without the
    #                        tpu_block shell export; tunnel compiles are
    #                        1-3.5 min per program without the cache
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    overrides, shape, imgs = SHAPES[variant]
    cfg = get_config(variant, env_override=False,
                     compute_dtype="bfloat16", **overrides)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    mstep = jit_multi_step(cfg)  # k steps fused into one program (lax.scan)

    rng = np.random.RandomState(0)
    super_batch = jax.device_put(jnp.asarray(
        rng.rand(k, *shape), jnp.float32))
    state, m = mstep(state, super_batch)  # compile
    float(m["errG"][-1])
    # NB: block_until_ready does not synchronize through the axon tunnel;
    # fetching a value that depends on the whole step chain does.  Each rep
    # is timed separately (chain fetch per rep, ~2-3 ms on a ~400 ms body)
    # so the JSON line can carry the run-to-run spread.
    rep_ips = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, m = mstep(state, super_batch)
        float(m["errG"][-1])  # chain-dependent fetch forces full execution
        rep_ips.append(imgs * k / (time.perf_counter() - t0))
    return rep_ips


def measure_overlap_inference():
    """Second north-star metric (BASELINE.md: patch-overlap inference MP/s,
    reference pipeline train-gray-patch-batch-overlap.lua:377-704). Reuses
    bench_infer.py's measurement in-process — same tunnel client, no second
    jax client (CLAUDE.md tunnel discipline).  Two records: the parity
    pipeline (per-image train-mode BN, the reference's math) and the
    recommended bn_eval quality mode (running-stats BN + flat tile batch —
    +5.6 dB AND faster, docs/attr_variants.md round-4 sweep)."""
    import bench_infer
    return [bench_infer.overlap_record(),
            bench_infer.overlap_record(bn_eval=True)]


def main():
    from dcgan_sr_tpu.utils.cache import enable_tpu_cache, machine_fingerprint
    import jax
    enable_tpu_cache(jax)
    host_tag, host_desc = machine_fingerprint()
    anchor = round(cpu_anchor(), 4)
    probe = round(tunnel_probe(), 1)  # first TPU touch of this client
    baselines = get_baselines()
    baseline_host = baselines.get("host", "unknown (see BASELINE_MEASURED)")
    # header record: full provenance in one place (per-line stamps repeat the
    # compact fields in case the driver trims the tail to the last few lines)
    print(json.dumps({
        "metric": "bench_selfcert", "value": probe, "unit": "s (tunnel probe)",
        "host": host_tag, "host_desc": host_desc, "cpu_anchor_s": anchor,
        "baseline_host": baseline_host,
        "baseline_note": "vs_baseline comparable only within one baseline "
                         "regeneration (BASELINE_MEASURED.json 'note'); "
                         "'value' fields are comparable across rounds",
    }), flush=True)
    lines = measure_overlap_inference()
    from dcgan_sr_tpu.utils.measure import median_spread
    for variant in ("rgb-full", "gray-patch-batch", "gray-3"):  # flagship last
        # median rep + min/median/max spread — distinguishes host noise from
        # a real regression when rounds land on different machines
        ips, spread = median_spread(measure_tpu(variant), 1)
        suffix = "" if variant == "gray-3" else "_" + variant.replace("-", "_")
        lines.append({
            "metric": f"train_images_per_sec{suffix}",
            "value": round(ips, 1),
            "unit": "images/sec",
            "vs_baseline": round(ips / baselines[variant], 2),
            "rep_spread": spread,
        })
    for rec in lines:
        rec.update(host=host_tag, cpu_anchor_s=anchor, tunnel_probe_s=probe,
                   baseline_host=baseline_host)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

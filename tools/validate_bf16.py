#!/usr/bin/env python3
"""Validate bf16-compute training against fp32 (SURVEY.md §7.5: "bf16 compute
with fp32 params where PSNR parity allows — validate!").

Trains the flagship config twice from identical init/data — once fp32-HIGHEST,
once bf16 — and compares end-of-run eval PSNR/SSIM.  Passes if the bf16 run's
quality is within tolerance of fp32's.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(steps=100, batch=100, tol_psnr=1.0, tol_ssim=0.02):
    import jax
    import jax.numpy as jnp

    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data import SyntheticImages
    from dcgan_sr_tpu.evaluation import evaluate_slice
    from dcgan_sr_tpu.infer.tiled import make_generator_fn
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.multi_step import jit_multi_step

    src = SyntheticImages(fine_size=64, nc=1, seed=11)
    k = 20
    batches = jnp.asarray(
        np.stack([src.load_batch(s, batch) for s in range(k)]))

    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = get_config("gray-3", env_override=False, batchSize=batch,
                         compute_dtype=dtype)
        state = init_train_state(cfg, jax.random.PRNGKey(5))
        mstep = jit_multi_step(cfg)
        for _ in range(steps // k):
            state, m = mstep(state, batches)
        gen = make_generator_fn(cfg)  # eval in fp32 for both
        res = evaluate_slice(cfg, gen, state.g_params, state.g_state, src,
                             range(100, 102), batch_size=50)
        results[dtype] = res
        print(f"{dtype:9s}: G-PSNR {res.psnr_generator:.3f}  "
              f"G-SSIM {res.ssim_generator:.4f}  "
              f"(bilinear {res.psnr_bilinear:.3f})  errG {float(m['errG'][-1]):.3f}")

    dp = abs(results["bfloat16"].psnr_generator - results["float32"].psnr_generator)
    ds = abs(results["bfloat16"].ssim_generator - results["float32"].ssim_generator)
    ok = dp <= tol_psnr and ds <= tol_ssim
    print(f"delta PSNR {dp:.3f} dB (tol {tol_psnr}), delta SSIM {ds:.4f} "
          f"(tol {tol_ssim}) -> {'PASS' if ok else 'FAIL'}")
    return ok


if __name__ == "__main__":
    sys.exit(0 if run() else 1)

"""Dataset-wide evaluation harness — the reference's parity yardstick.

Reproduces train-gray-3.lua:354-535 (SURVEY.md §3.5): over fixed dataset
slices, per batch:
  load+scale -> 2x box downsample -> bilinear upscale control -> G forward ->
  per-image PSNR and SSIM for BOTH generator and bilinear vs ground truth,
  accumulated into slice means.

Slices: train = file_sets [0, ntrain/100); test = file_sets [2000, 2020]
(images 200,001-202,100).  The patch-batch protocol evaluates 500 train and
500 test images from file_set 10000 with patch reassembly
(train-gray-patch-batch.lua:365-367,487-489) and adds the polarity rescue:
PSNR < 13 dB -> score 1-x instead (:673-680).

The whole per-batch pipeline (degrade, bilinear control, generator with
per-batch BN stats, PSNR+SSIM sums) is ONE jitted program per config shape;
the host only feeds batches and accumulates four floats.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..image.ops import box_downsample2, resize_bilinear
from ..image.patches import extract_grid_patches, reassemble_grid_patches
from ..metrics import cal_psnr_batch, cal_ssim_batch


@dataclasses.dataclass
class EvalResult:
    psnr_bilinear: float
    psnr_generator: float
    ssim_bilinear: float
    ssim_generator: float
    n_images: int

    def print_reference_style(self, tag="Train-set", log_fn=print):
        n = self.n_images
        log_fn(f"[{tag}] PSNR btwn real_none & real_bilinear: "
               f"{self.psnr_bilinear:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] PSNR btwn real_none & fake_none: "
               f"{self.psnr_generator:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] SSIM btwn real_none & real_bilinear: "
               f"{self.ssim_bilinear:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] SSIM btwn real_none & fake_none: "
               f"{self.ssim_generator:.8f}, train-Size: {n}")


@dataclasses.dataclass
class OverlapEvalResult:
    """Bilinear control vs naive last-writer-wins stitch vs seam-cut stitch —
    the overlap variant's defining comparison
    (train-gray-patch-batch-overlap.lua:423-424,453-454,703-704)."""
    psnr_bilinear: float
    psnr_naive: float
    psnr_seam: float
    ssim_bilinear: float
    ssim_naive: float
    ssim_seam: float
    n_images: int

    def print_reference_style(self, tag="Test-set", log_fn=print):
        n = self.n_images
        log_fn(f"[{tag}] PSNR btwn real_none & real_bilinear: "
               f"{self.psnr_bilinear:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] PSNR btwn real_none & fake_none: "
               f"{self.psnr_naive:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] PSNR btwn real_none & fake_none_overlap: "
               f"{self.psnr_seam:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] SSIM btwn real_none & real_bilinear: "
               f"{self.ssim_bilinear:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] SSIM btwn real_none & fake_none: "
               f"{self.ssim_naive:.8f}, train-Size: {n}")
        log_fn(f"[{tag}] SSIM btwn real_none & fake_none_overlap: "
               f"{self.ssim_seam:.8f}, train-Size: {n}")


_OVERLAP_SCORE_CACHE: dict = {}


def _overlap_score_fn(fine):
    """One jitted program for the per-batch scoring: bilinear control +
    all six PSNR/SSIM sums (otherwise each metric is its own eager dispatch —
    ~2-3 ms RPC apiece over the axon tunnel, CLAUDE.md)."""
    fn = _OVERLAP_SCORE_CACHE.get(fine)
    if fn is None:
        def run(hr, naive, seam):
            bil = resize_bilinear(box_downsample2(hr), fine, fine)
            imgs = (bil, naive, seam)
            return jnp.stack(
                [cal_psnr_batch(hr, img).sum() for img in imgs]
                + [cal_ssim_batch(hr, img).sum() for img in imgs])
        fn = _OVERLAP_SCORE_CACHE[fine] = jax.jit(run)
    return fn


def evaluate_overlap_slice(cfg, params, state, loader, file_sets, *,
                           batch_size=None, bn_eval=False, sr_fn=None):
    """Mean PSNR/SSIM of bilinear / naive-stitch / seam-stitch over the given
    file_set indices, through the fully on-device overlap pipeline
    (extract overlapping tiles -> batched G -> naive + seam-DP stitch,
    infer/tiled.make_overlap_sr_fn). The overlap variant's own eval
    (train-gray-patch-batch-overlap.lua:377-704) scores exactly these three
    against the ground truth. Grayscale protocol (nc=1), like the reference.

    `sr_fn` overrides the compiled pipeline (reuse across slices).

    `batch_size` defaults to cfg.batchSize: the reference addresses files as
    file_num = file_set * batchSize + k (overlap:247), so the file_set
    indices only name the protocol's slices (test = 10000+ -> images
    200,001+ at batchSize 20, train-gray-patch-batch.lua:489) when the
    batch matches. The committed textured protocol passes batch_size=100
    explicitly (tools/overlap_protocol.py)."""
    from ..infer.tiled import make_overlap_sr_fn

    batch_size = batch_size or cfg.batchSize
    sr = sr_fn if sr_fn is not None else make_overlap_sr_fn(cfg, bn_eval=bn_eval)
    score = _overlap_score_fn(cfg.fineSize)
    tot = np.zeros(6)
    n = 0
    for fs in file_sets:
        hr = jnp.asarray(loader.load_batch(fs, batch_size))[:, 0]  # (B, H, W)
        out = sr(params, state, hr)
        tot += np.asarray(score(hr, out["naive"], out["seam"]))
        n += int(hr.shape[0])
    return OverlapEvalResult(
        psnr_bilinear=tot[0] / n, psnr_naive=tot[1] / n, psnr_seam=tot[2] / n,
        ssim_bilinear=tot[3] / n, ssim_naive=tot[4] / n, ssim_seam=tot[5] / n,
        n_images=n)


_EVAL_FN_CACHE: dict = {}


def _eval_batch_fn(cfg, with_ssim, gen_fn=None):
    """Build (and cache) the jitted per-batch eval program for a config.

    gen_fn(params, state, lr_batch) -> hr_batch overrides the generator
    (e.g. a bf16 or t7-imported apply fn); None rebuilds from cfg."""
    from ..models import apply_network, generator_spec

    key = (cfg.variant, cfg.fineSize, cfg.patchSize, cfg.patch_based,
           cfg.ngf, cfg.nc, with_ssim)
    if gen_fn is None:
        cache = _EVAL_FN_CACHE
    else:
        # per-function cache so two different gen_fns never collide (and a
        # dead function's id can't alias a live one's cache entry)
        try:
            cache = gen_fn._eval_cache
        except AttributeError:
            cache = {}
            try:
                gen_fn._eval_cache = cache
            except AttributeError:
                pass  # unsettable callable: compile fresh each call
    fn = cache.get(key)
    if fn is not None:
        return fn

    fine, patch, patch_based = cfg.fineSize, cfg.patchSize, cfg.patch_based
    if gen_fn is None:
        spec = generator_spec(cfg)

        def apply_gen(params, state, x):
            out, _ = apply_network(spec, params, x, state, train=True)
            return out
    else:
        apply_gen = gen_fn

    nc = cfg.nc
    pm1 = cfg.data_range == "pm1"

    def _score(metric, ref, img):
        # (B, H, W) single-channel protocol (the reference's, gray variants);
        # multi-channel (B, C, H, W): per-channel metric averaged over C
        # (the reference defines no RGB protocol — train.lua prints none)
        if nc == 1:
            return metric(ref, img).sum()
        b, c = ref.shape[0], ref.shape[1]
        flat = metric(ref.reshape(b * c, *ref.shape[2:]),
                      img.reshape(b * c, *img.shape[2:]))
        return flat.reshape(b, c).mean(axis=1).sum()

    def run(params, state, hr):
        hr2d = hr[:, 0] if nc == 1 else hr          # (B,H,W) or (B,C,H,W)
        # pm1 variants (rgb-full, gray): the generator trains on [-1,1] data
        # (trainHook mul(2):add(-1), donkey_folder.lua:69) and the reference's
        # eval feeds it the SAME normalized stream (train-gray.lua:325-385 —
        # its calPSNR is even computed on the pm1 scale). We drive G in its
        # training range, then map everything back to [0,1] for scoring so
        # the bilinear control and the cross-variant table stay comparable.
        net_in = hr2d * 2.0 - 1.0 if pm1 else hr2d
        lr = box_downsample2(net_in)
        bil = resize_bilinear(lr, fine, fine)
        if patch_based:
            tiles = extract_grid_patches(net_in, patch)
            b, p2, p, _ = tiles.shape
            lr_tiles = box_downsample2(tiles).reshape(b * p2, 1, p // 2, p // 2)
            fk = apply_gen(params, state, lr_tiles)
            fake = reassemble_grid_patches(
                fk[:, 0].reshape(b, p2, p, p), fine, fine)
        else:
            fk = apply_gen(params, state, lr[:, None] if nc == 1 else lr)
            fake = fk[:, 0] if nc == 1 else fk
        if pm1:
            bil = (bil + 1.0) * 0.5
            fake = (fake + 1.0) * 0.5
        out = [_score(cal_psnr_batch, hr2d, bil),
               _score(cal_psnr_batch, hr2d, fake)]
        if with_ssim:
            out += [_score(cal_ssim_batch, hr2d, bil),
                    _score(cal_ssim_batch, hr2d, fake)]
        else:
            out += [jnp.zeros(()), jnp.zeros(())]
        return jnp.stack(out)

    fn = jax.jit(run)
    cache[key] = fn
    return fn


def evaluate_slice(cfg, gen_fn, params, state, loader, file_sets, *,
                   batch_size=None, with_ssim=True):
    """Mean PSNR/SSIM over the given file_set indices.

    loader.load_batch(file_set, batch_size) -> (B, nc, H, W) in [0,1].
    For patch variants the generator runs per 8x8 tile and the image is
    reassembled before scoring (train-gray-patch-batch.lua:417-442).
    `gen_fn(params, state, lr_batch) -> hr_batch` is the generator used
    inside the fused eval program (so bf16 / t7-imported generators score
    as themselves); pass None to rebuild the fp32 generator from cfg.
    """
    batch_size = batch_size or cfg.batchSize
    run = _eval_batch_fn(cfg, with_ssim, gen_fn)
    tot = np.zeros(4)
    n = 0
    for fs in file_sets:
        hr = jnp.asarray(loader.load_batch(fs, batch_size))  # (B, nc, H, W)
        tot += np.asarray(run(params, state, hr))
        n += int(hr.shape[0])  # actual rows: a short final batch must not
        #                        skew the slice means
    return EvalResult(psnr_bilinear=tot[0] / n, psnr_generator=tot[1] / n,
                      ssim_bilinear=tot[2] / n, ssim_generator=tot[3] / n,
                      n_images=n)


def polarity_rescue(real_hw, fake_hw, threshold=13.0):
    """train-gray-patch-batch.lua:673-680: if PSNR < 13 dB, try 1-x.

    Returns (image, psnr, inverted?).
    """
    from ..metrics import cal_psnr
    p = float(cal_psnr(jnp.asarray(real_hw), jnp.asarray(fake_hw)))
    if p < threshold:
        inv = 1.0 - jnp.asarray(fake_hw)
        return inv, float(cal_psnr(jnp.asarray(real_hw), inv)), True
    return jnp.asarray(fake_hw), p, False

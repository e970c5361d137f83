"""Inference paths: full-image SR, grid-patch SR, and overlap+stitch SR.

Mirrors the reference's three sample-making pipelines:
  full image:   netG:forward on the whole downsampled image (train-gray-3.lua:564-580)
  grid patches: extract -> batched G -> reassemble (train-gray-patch.lua:551-604)
  overlap:      225-tile extraction -> batched G -> naive + seam-cut stitches
                (train-gray-patch-batch-overlap.lua:377-704)

Everything except the seam DP runs on device: patch extraction, per-patch box
downsample, the batched generator (a single MXU-friendly (L*L, 1, p/2, p/2)
batch), and the naive stitch.  The seam DP (microseconds of work) runs on
host — see infer/seam.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..image.ops import box_downsample2
from ..image.patches import (
    extract_grid_patches,
    extract_overlap_patches,
    reassemble_grid_patches,
    stitch_overlap_naive,
)
from ..models import apply_network, generator_spec
from .seam import seam_stitch


def overlap_pad_dim(d, patch, overlap):
    """Smallest overlap-legal even extent >= d: (d' - overlap) must divide by
    (patch - overlap) for the stride-overlap tiling
    (train-gray-patch-batch-overlap.lua:387-399) and d' must be even for the
    2x2 degrade. With q = patch - overlap even and overlap odd no even d'
    exists (d' = overlap mod q fixes its parity) — raise rather than loop."""
    q = patch - overlap
    d2 = max(d, patch)
    d2 += (q - (d2 - overlap) % q) % q
    if d2 % 2:
        if q % 2 == 0:
            raise ValueError(
                f"overlap geometry unsatisfiable: patchSize-overlap={q} is "
                f"even while overlap={overlap} is odd, so every legal tiling "
                "extent is odd and the 2x2 degrade cannot apply; adjust "
                "patchSize/overlap")
        d2 += q  # q odd: one step flips parity
    return d2


def make_generator_fn(cfg, jit=True, bn_eval=False, self_ensemble=1,
                      ensemble_batched=False):
    """Returns gen(params, state, lr_batch) -> hr_batch, (B, nc, h, w) in/out.

    Default runs in train mode (batch statistics) — the reference never
    switches its nets to evaluate mode, so inference parity requires batch
    stats too.  `bn_eval=True` is the intent mode for SINGLE-image/small-
    batch inference: BN normalizes with the checkpoint's running statistics
    (state), which a lone image's own batch stats cannot stand in for.
    Measured on the textured protocol: single-image batch-stats inference
    LOSES to bilinear on every held-out image (17-28 dB) while the same
    checkpoint's running stats win on every one (28-32 dB) — see PARITY.md.

    `self_ensemble=N` (2/4/8) averages the forward over N dihedral
    transforms of the input (infer/ensemble.py) — inference-time quality
    surplus (measured +1.26 dB on the gray-3 fixture at 8).
    `ensemble_batched=True` runs the N members as ONE (N*B)-batch generator
    call instead of N calls — the MXU-friendly form (exact: see
    ensemble.py; square inputs only).
    """
    spec = generator_spec(cfg)

    def gen(params, state, lr):
        out, _ = apply_network(spec, params, lr, state, train=not bn_eval)
        return out

    if self_ensemble != 1:
        from .ensemble import self_ensemble as wrap
        gen = wrap(gen, self_ensemble, batched=ensemble_batched)

    return jax.jit(gen) if jit else gen


def sr_full_image(cfg, gen_fn, params, state, img_hw):
    """Full-image 2x SR of one (H, W) or (C, H, W) image; returns
    (hr_fake, lr) arrays with the input's channel layout."""
    lr = box_downsample2(jnp.asarray(img_hw))
    if lr.ndim == 2:                      # (H, W) -> (1, 1, H, W)
        return gen_fn(params, state, lr[None, None])[0, 0], lr
    return gen_fn(params, state, lr[None])[0], lr


def sr_grid_patches(cfg, gen_fn, params, state, img_hw):
    """Non-overlapping patch SR with reassembly (train-gray-patch.lua:551-604).

    Works at the image's native (H, W) — H and W must be multiples of
    patchSize (the upscale tool pads-and-crops to guarantee this)."""
    patch = cfg.patchSize
    img_hw = jnp.asarray(img_hw)
    h, w = img_hw.shape[-2], img_hw.shape[-1]
    hr_patches = extract_grid_patches(img_hw, patch)
    lr_patches = box_downsample2(hr_patches)
    fake = gen_fn(params, state, lr_patches[:, None])[:, 0]
    return reassemble_grid_patches(fake, h, w)


def sr_overlap_image(cfg, gen_fn, params, state, img_hw, *, both_seams=False,
                     device_seam=True):
    """Overlap-tile SR: returns dict with naive and seam-stitched outputs.

    device_seam=True runs the batched lax.scan seam DP on device
    (infer/seam_device.py, bit-identical in both modes); False uses the host
    NumPy replay.  Runs at the image's native (H, W): each dim must satisfy
    (dim - overlap) % (patch - overlap) == 0 (the upscale tool pads-and-crops
    to guarantee this).
    """
    patch, ov = cfg.patchSize, cfg.overlap
    img_hw = jnp.asarray(img_hw)
    fine = (img_hw.shape[-2], img_hw.shape[-1])
    hr_tiles = extract_overlap_patches(img_hw, patch, ov)
    lr_tiles = box_downsample2(hr_tiles)
    fake_tiles = gen_fn(params, state, lr_tiles[:, None])[:, 0]
    naive = stitch_overlap_naive(fake_tiles, fine, patch, ov)
    if device_seam:
        from .seam_device import seam_stitch_device
        seam = seam_stitch_device(fake_tiles, fine, patch, ov,
                                  both_seams=both_seams)
    else:
        seam = jnp.asarray(seam_stitch(np.asarray(fake_tiles), fine, patch, ov,
                                       both_seams=both_seams))
    return {"tiles": fake_tiles, "naive": naive, "seam": seam}


def make_full_sr_fn(cfg, *, compute_dtype=None, mesh=None, bn_eval=False,
                    self_ensemble=1, ensemble_batched=False, lr_input=False):
    """One jitted program: batched FULL-IMAGE SR of (N, nc, H, W) images.

    The full-image counterpart of make_overlap_sr_fn for the non-patch
    variants (rgb-full/gray/gray-2/gray-3).  Every one of those generators
    is a fully-convolutional net-2x map (e.g. train.lua:97-113: three
    2x FullConvolutions then two stride-2 convolutions), so any integer
    input extent maps to exactly twice itself:

      lr_input=False (default) runs the reference's eval protocol
        (train-gray-3.lua:564-580): degrade 2x2-box internally, restore at
        the input's own (even) size — output matches the input shape.
      lr_input=True is TRUE 2x upscaling: the batch is LOW-RES input fed
        straight to the generator, (N, nc, H, W) -> (N, nc, 2H, 2W).

    Inputs and outputs are in the generator's own data range
    (cfg.data_range: the pm1 variants train on [-1,1], donkey_folder.lua:69)
    — callers own the conversion, exactly like make_overlap_sr_fn.

    BN statistics under train mode (`bn_eval=False`) are PER IMAGE (each
    image runs as its own batch-of-1, vmapped) — the reference's
    single-image testSample forward (train-gray.lua:326-380) normalizes
    with exactly that batch, and it keeps every image's result independent
    of what it happens to be batched with (serving coalesces arbitrary
    requests; the directory tool pads for shardability).  The 100-image
    POOLED-batch protocol the reference's eval loop uses lives in
    evaluation/harness.py, not here.  `bn_eval=True` (running stats) is
    batch-independent by construction.

    With `mesh`, images shard over the data axis (params/state replicate),
    mirroring make_overlap_sr_fn's serving topology.
    """
    spec = generator_spec(cfg)

    def gen(params, state, lr):
        out, _ = apply_network(spec, params, lr, state, train=not bn_eval,
                               compute_dtype=compute_dtype)
        return out

    if self_ensemble != 1:
        from .ensemble import self_ensemble as wrap
        gen = wrap(gen, self_ensemble, batched=ensemble_batched)

    def run(params, state, images):
        lr = images if lr_input else box_downsample2(images)
        if bn_eval:
            return gen(params, state, lr)
        # train-mode BN: per-image batch-1 statistics (see docstring)
        return jax.vmap(lambda im: gen(params, state, im[None])[0])(lr)

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = cfg.data_axis
    img_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(run, in_shardings=(rep, rep, img_sharding),
                     out_shardings=img_sharding)

    def sharded_run(params, state, images):
        images = jax.device_put(images, img_sharding)
        return jitted(params, state, images)

    return sharded_run


def lr_pad_dim(d, patch, overlap):
    """Smallest extent >= d a LOW-RES input can be padded to so that its 2x
    output extent is overlap-legal (the lr_input mode of make_overlap_sr_fn);
    returns the LR extent — the output extent is twice it."""
    return overlap_pad_dim(2 * d, patch, overlap) // 2


def make_overlap_sr_fn(cfg, *, compute_dtype=None, mesh=None, fine=None,
                       bn_eval=False, both_seams=False, self_ensemble=1,
                       ensemble_batched=False, flat_tiles=None,
                       lr_input=False):
    """One jitted program: batched overlap SR of (N, H, W) images ->
    dict of stacked naive and seam-stitched outputs.  The whole pipeline —
    tile extraction, per-tile box downsample, the batched generator over
    N*L*L tiles, the naive stitch and the scan-based seam DP — runs on
    device; nothing round-trips to the host (the reference crosses the
    device boundary once per image and stitches on the host, SURVEY.md §3.4).

    With `mesh`, images shard over the data axis and each chip runs its
    slice's full pipeline independently (the tiled-inference path sharded
    over ICI — SURVEY.md §5 long-context row); params replicate.

    `fine` overrides the image size as (H, W) — both dims must satisfy
    (dim - overlap) % (patch - overlap) == 0; default cfg.fineSize square.
    `bn_eval` normalizes BN with running stats instead of per-image tile
    batch stats (see make_generator_fn).  `self_ensemble=N` averages each
    tile's SR over N dihedral transforms (infer/ensemble.py) before
    stitching — per-image BN batch stats are invariant under the group.
    `ensemble_batched=True` runs the N members as ONE (N*T)-tile generator
    dispatch instead of N sequential ones (ensemble.py: exact under
    bn_eval/no-BN; the pooled-joint-batch variant under train-mode BN).

    `flat_tiles` flattens the generator call to ONE (N*T)-tile batch instead
    of vmapping the per-image pipeline.  Under `bn_eval` (running stats —
    no cross-tile coupling) this is EXACT and measured faster on hardware
    (docs/attr_variants.md round-4 sweep), so it defaults on there; under
    train-mode BN it would pool statistics across images (different math
    from the reference's per-image 225-tile batches, overlap:427-431), so
    requesting it raises.  Default None = bn_eval.

    `lr_input=True` is TRUE 2x upscaling: images are (N, H/2, W/2) LOW-RES
    inputs and the output is (N, H, W) with `fine` = (H, W) the OUTPUT size.
    Instead of degrading internally (the reference's eval protocol,
    overlap:402-407, which every other mode mirrors), tiles are extracted
    from the LR image at HALF geometry (patch/2 at stride overlap/2).
    Because the 2x2 box degrade and the tile gather commute on the
    even-aligned tile grid, those LR tiles are BIT-IDENTICAL to the
    protocol's degraded HR tiles — the generator sees exactly its training
    regime (exactness-tested vs the protocol pipeline on degraded inputs).
    Requires even patchSize and overlap.
    """
    from ..models import apply_network, generator_spec
    from .seam_device import seam_stitch_device

    patch, ov = cfg.patchSize, cfg.overlap
    fine = (cfg.fineSize, cfg.fineSize) if fine is None else tuple(fine)
    spec = generator_spec(cfg)
    if flat_tiles is None:
        flat_tiles = bn_eval
    if flat_tiles and not bn_eval:
        raise ValueError(
            "flat_tiles requires bn_eval=True: a flat (N*T)-tile batch pools "
            "train-mode BN statistics across images, which is not the "
            "reference's per-image math")
    if lr_input and (patch % 2 or ov % 2):
        raise ValueError(
            "lr_input requires even patchSize and overlap (tiles are "
            f"extracted at half geometry); got {patch}/{ov}")
    # tile size / stride AS EXTRACTED from the input image: half geometry on
    # an LR input (no internal degrade), full geometry + degrade otherwise
    ep, eov = (patch // 2, ov // 2) if lr_input else (patch, ov)

    def extract_lr(image):
        """input image -> (T, 1, patch/2, patch/2) generator input tiles."""
        tiles = extract_overlap_patches(image, ep, eov)
        if not lr_input:
            tiles = box_downsample2(tiles)
        return tiles[:, None]

    def gen_tiles(params, state, lr):
        fake, _ = apply_network(spec, params, lr, state, train=not bn_eval,
                                compute_dtype=compute_dtype)
        return fake

    if self_ensemble != 1:
        from .ensemble import self_ensemble as wrap
        gen_tiles = wrap(gen_tiles, self_ensemble, batched=ensemble_batched)

    def stitch_image(fake):
        return (stitch_overlap_naive(fake, fine, patch, ov),
                seam_stitch_device(fake, fine, patch, ov,
                                   both_seams=both_seams))

    def one_image(params, state, image):
        # BN statistics are per-image (the reference feeds one image's 225
        # tiles as the generator batch, overlap:427-431) — vmapping the whole
        # per-image pipeline preserves that
        lr = extract_lr(image)                               # (T, 1, p/2, p/2)
        fake = gen_tiles(params, state, lr)[:, 0]
        return stitch_image(fake)

    def run_flat(params, state, images):
        lr = jax.vmap(extract_lr)(images)                    # (N, T, 1, ·, ·)
        n, t = lr.shape[0], lr.shape[1]
        fake = gen_tiles(params, state, lr.reshape((n * t,) + lr.shape[2:]))
        fake = fake[:, 0].reshape(n, t, patch, patch)
        naive, seam = jax.vmap(stitch_image)(fake)
        return {"naive": naive, "seam": seam}

    def run_vmapped(params, state, images):
        naive, seam = jax.vmap(one_image, in_axes=(None, None, 0))(
            params, state, images)
        return {"naive": naive, "seam": seam}

    run = run_flat if flat_tiles else run_vmapped

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = cfg.data_axis
    img_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    jitted = jax.jit(run, in_shardings=(rep, rep, img_sharding),
                     out_shardings={"naive": img_sharding,
                                    "seam": img_sharding})

    def sharded_run(params, state, images):
        images = jax.device_put(images, img_sharding)
        return jitted(params, state, images)

    return sharded_run

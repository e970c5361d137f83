"""The fused GAN train step: fDx + fGx + both Adam updates as ONE XLA program.

Reference structure (train.lua:208-283, call stack SURVEY.md §3.1):
  fDx: get batch -> D fwd/bwd on real -> box-downsample (host loop!) ->
       G fwd -> per-image MSE (host loop!) -> D fwd/bwd on fake -> adam(D)
  fGx: REUSES netD.output from the fake pass -> backprop through D into G
       (no re-forward) -> adam(G)

Here the whole pair is one jitted function: downsample, G forward, both D
forwards, all three losses, both Adam updates fused on device — the
pathological host syncs of the reference (SURVEY.md §3.1 hot-loop notes)
disappear.  The computation-graph reuse of fGx is expressed with jax.vjp: one
G forward, one D-fake forward, and three pullbacks sharing residuals.

Intent-vs-bug note: the reference updates D's params before fGx runs, then
backprops through D modules whose weights were updated in place but whose
cached activations are stale (SpatialConvolution:updateGradInput mixes new
weights with old outputs).  We implement the intent — G's gradient flows
through the pre-update D that actually produced `netD.output` — which is the
standard DCGAN formulation and the only self-consistent reading.

BN ordering parity: D normalizes the real batch with real-batch stats and the
fake batch with fake-batch stats, in that order (train.lua:218,243) — each
`apply_network` call here computes its own batch stats, and the running-stat
state threads real-pass -> fake-pass.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..image.ops import box_downsample2
from ..losses.schemes import criterion, make_labels
from ..models import apply_network, discriminator_spec, generator_spec, init_network
from ..ops.adam import adam_init, adam_update


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    g_params: Any
    g_state: Any
    g_opt: Any
    d_params: Any
    d_state: Any
    d_opt: Any
    # EMA copy of g_params (cfg.g_ema > 0) or None — None flattens to an
    # empty subtree, so the pytree structure (and every existing checkpoint)
    # is unchanged when the feature is off
    g_ema_params: Any = None

    def tree_flatten(self):
        return ((self.g_params, self.g_state, self.g_opt,
                 self.d_params, self.d_state, self.d_opt,
                 self.g_ema_params), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_train_state(cfg, key):
    kg, kd = jax.random.split(key)
    g_spec, d_spec = generator_spec(cfg), discriminator_spec(cfg)
    g_params, g_state = init_network(kg, g_spec)
    d_params, d_state = init_network(kd, d_spec)
    state = TrainState(
        g_params=g_params, g_state=g_state, g_opt=adam_init(g_params),
        d_params=d_params, d_state=d_state, d_opt=adam_init(d_params),
        g_ema_params=(jax.tree_util.tree_map(jnp.copy, g_params)
                      if getattr(cfg, "g_ema", 0.0) > 0 else None),
    )
    if getattr(cfg, "compact_params", False):
        # padding-friendly 2-D master weights (ops/compact.py); checkpoints
        # written under this flag store the packed layout — resume with the
        # same flag, or unpack_state for eval/inference interchange
        from ..ops.compact import pack_state
        state = pack_state(state, g_spec, d_spec)
    return state


def build_train_step(cfg, *, axis_name=None):
    """Returns train_step(state, hr_batch) -> (state, metrics).

    hr_batch: (B, C, H, W) in the variant's data range.  With `axis_name`
    (inside shard_map) gradients/losses are pmean-reduced over the
    data-parallel axis and BN uses cross-replica statistics.
    """
    g_spec = generator_spec(cfg)
    d_spec = discriminator_spec(cfg)
    crit = criterion(cfg)
    if cfg.loss == "bce":
        # fold D's Sigmoid head into the loss (bce_with_logits): identical
        # math to BCECriterion-on-sigmoid, but stable when D saturates
        # (prevents inf/nan gradients in the bf16 path)
        from ..losses.schemes import bce_with_logits_loss
        d_spec = tuple(dict(l, act=None) if l.get("act") == "sigmoid" else l
                       for l in d_spec)
        crit = bce_with_logits_loss
    compute_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    fast = cfg.fast_ops
    adam_kw = dict(lr=cfg.lr, beta1=cfg.beta1, beta2=cfg.beta2, eps=cfg.eps)

    if getattr(cfg, "compact_params", False):
        from ..ops.compact import unpack_params

        def unpack_g(pg):
            return unpack_params(pg, g_spec)

        def unpack_d(pd):
            return unpack_params(pd, d_spec)
    else:
        unpack_g = unpack_d = lambda p: p  # noqa: E731

    use_pallas = cfg.use_pallas
    device_preprocess = cfg.device_preprocess
    rgb_to_gray = device_preprocess and cfg.nc == 1
    to_pm1 = device_preprocess and cfg.data_range == "pm1"
    device_augment = getattr(cfg, "device_augment", False)
    fine_size = cfg.fineSize

    def step(state: TrainState, hr):
        # bf16 FEED support (--feed-bf16): the host can ship image leaves as
        # bfloat16 to halve the host->device transfer (the axon tunnel moves
        # ~38 MB/s, so a scanned super-batch costs ~1 s/epoch in f32 —
        # measured round 4). Upcast at entry: every op below sees float32
        # exactly as with an f32 feed; only the input pixels carry bf16
        # rounding (the compute path's own precision is unchanged).
        hr = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if x.dtype == jnp.bfloat16 else x, hr)
        if device_augment:
            # donkey trainHook's crop + hflip pixel work on device
            # (donkey_folder.lua:52-70 -> image/ops.py crop_hflip_at). The
            # batch is (canvas, tops, lefts, flips): the loader draws the
            # offsets on the host with the reference's SINGLE uniform over
            # the full aspect-resized image (data/folder.py sample_canvas),
            # so the crop distribution is exactly the donkey's — an on-chip
            # second uniform composed with the host pre-crop would be
            # triangular instead. Scalar offsets shard with the batch under
            # scan and shard_map like any other leading-B leaf.
            from ..image.ops import crop_hflip_at
            hr, tops, lefts, flips = hr
            hr = crop_hflip_at(hr, tops, lefts, flips, fine_size)
        if use_pallas or device_preprocess:
            # fused device-side preprocess (ops/pallas_kernels.py): optional
            # rgb->gray + [0,1]->[-1,1] + 2x2 degrade in one HBM pass;
            # interpret mode keeps CPU test meshes working
            import jax as _jax
            from ..ops.pallas_kernels import pallas_preprocess
            hr, lr_img = pallas_preprocess(
                hr, rgb_to_gray=rgb_to_gray, to_pm1=to_pm1,
                interpret=_jax.default_backend() != "tpu")
        else:
            lr_img = box_downsample2(hr)

        # --- G forward (single forward, pullback shared with the G update) --
        def g_fwd(pg):
            fake, gs = apply_network(g_spec, unpack_g(pg), lr_img, state.g_state,
                                     train=True, compute_dtype=compute_dtype,
                                     axis_name=axis_name, fast=fast)
            return fake, gs

        fake, g_vjp, g_state_new = jax.vjp(g_fwd, state.g_params, has_aux=True)

        # --- D on real (own batch stats; first running-stat update) ---------
        def d_real_loss(pd):
            out, ds = apply_network(d_spec, unpack_d(pd), hr, state.d_state,
                                    train=True, compute_dtype=compute_dtype,
                                    axis_name=axis_name, fast=fast)
            real_vec = jnp.full(out.shape, cfg.real_label, jnp.float32)
            return crit(out, real_vec), ds

        (err_d_real, d_state_mid), gd_real = jax.value_and_grad(
            d_real_loss, has_aux=True)(state.d_params)

        # --- D on fake (one forward, pullback shared by D-fake and G losses) -
        fake_sg = jax.lax.stop_gradient(fake)
        _, fake_vec, g_vec = make_labels(cfg, hr, fake_sg)
        fake_vec = jax.lax.stop_gradient(fake_vec)

        def d_fake_fwd(pd, x):
            out, ds = apply_network(d_spec, unpack_d(pd), x, d_state_mid,
                                    train=True, compute_dtype=compute_dtype,
                                    axis_name=axis_name, fast=fast)
            return out, ds

        out_fake, d_fake_vjp, d_state_new = jax.vjp(
            d_fake_fwd, state.d_params, fake, has_aux=True)

        err_d_fake, d_fake_cot = jax.value_and_grad(
            lambda o: crit(o, fake_vec))(out_fake)
        gd_fake, _ = d_fake_vjp(d_fake_cot)
        # fDx accumulates real+fake gradients before one adam step (train.lua:208-253)
        gd = jax.tree_util.tree_map(jnp.add, gd_real, gd_fake)

        # --- G loss: reuse D's fake-pass outputs/pullback (fGx, train.lua:256-272)
        err_g, g_cot = jax.value_and_grad(lambda o: crit(o, g_vec))(out_fake)
        if cfg.gan_weight != 1.0:
            g_cot = g_cot * cfg.gan_weight
        _, dfake = d_fake_vjp(g_cot)
        pixel_loss = jnp.zeros(())
        if cfg.pixel_loss_weight > 0:
            # surplus pixel-reconstruction term (not in the reference): the
            # cotangent of w * mean((fake-hr)^2) adds directly to D's pullback
            pixel_loss = jnp.mean((fake - hr) ** 2)
            dfake = dfake + (cfg.pixel_loss_weight * 2.0 / fake.size) * (fake - hr)
        (gg,) = g_vjp(dfake)

        if axis_name is not None:
            gd = jax.lax.pmean(gd, axis_name)
            gg = jax.lax.pmean(gg, axis_name)
            err_d_real = jax.lax.pmean(err_d_real, axis_name)
            err_d_fake = jax.lax.pmean(err_d_fake, axis_name)
            err_g = jax.lax.pmean(err_g, axis_name)
            pixel_loss = jax.lax.pmean(pixel_loss, axis_name)

        d_params, d_opt = adam_update(state.d_params, gd, state.d_opt, **adam_kw)
        g_params, g_opt = adam_update(state.g_params, gg, state.g_opt, **adam_kw)

        ema = state.g_ema_params
        if ema is not None and cfg.g_ema > 0:
            d_ = cfg.g_ema
            ema = jax.tree_util.tree_map(
                lambda e, p: d_ * e + (1.0 - d_) * p, ema, g_params)

        new_state = TrainState(
            g_params=g_params, g_state=g_state_new, g_opt=g_opt,
            d_params=d_params, d_state=d_state_new, d_opt=d_opt,
            g_ema_params=ema,
        )
        metrics = {
            "errD": err_d_real + err_d_fake,
            "errD_real": err_d_real,
            # gray-2 scales only the *printed* errD_real (train-gray-2.lua:209)
            "errD_real_reported": err_d_real * cfg.report_scale_real,
            "errD_fake": err_d_fake,
            "errG": err_g,
            "pixel_loss": pixel_loss,
        }
        return new_state, metrics

    return step


def jit_train_step(cfg, **jit_kw):
    """Convenience: the single-device step jitted with state donation."""
    step = build_train_step(cfg)
    return jax.jit(step, donate_argnums=(0,), **jit_kw)

"""Geometric self-ensemble (infer/ensemble.py): wiring correctness (inverse
transforms actually invert, so an equivariant generator is a fixed point) and
the measured quality surplus on the committed gray-3 fixture. Capability
surplus over the reference (its eval is a single forward,
train-gray-3.lua:354-535)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcgan_sr_tpu.infer.ensemble import dihedral_plan, self_ensemble

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "gray3_textured_net_G.npz")


def test_equivariant_fn_is_fixed_point():
    # 2x nearest upsample commutes with every dihedral transform, so the
    # ensemble mean must equal the plain forward (up to the mean's float
    # rounding) — any mistake in an inverse transform breaks this by whole
    # pixel values, not 1e-7.
    def up(params, state, x):
        return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)

    x = jnp.asarray(np.random.RandomState(0).rand(3, 1, 8, 8), jnp.float32)
    for n in (2, 4, 8):
        np.testing.assert_allclose(
            np.asarray(self_ensemble(up, n)(None, None, x)),
            np.asarray(up(None, None, x)), rtol=1e-6)


def test_non_equivariant_fn_averages_members():
    # A horizontal gradient is NOT flip-equivariant: the 2-member ensemble of
    # the identity-shaped fn must equal (f(x) + flip(f(flip(x))))/2.
    def f(params, state, x):
        return x * jnp.arange(x.shape[-1], dtype=x.dtype)

    x = jnp.asarray(np.random.RandomState(1).rand(2, 1, 6, 6), jnp.float32)
    got = self_ensemble(f, 2)(None, None, x)
    want = (f(None, None, x)
            + jnp.flip(f(None, None, jnp.flip(x, -1)), -1)) / 2
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_rectangular_inputs_fall_back_to_flip_group():
    assert len(dihedral_plan(4, 4, 8)) == 8
    assert len(dihedral_plan(4, 6, 8)) == 4          # odd rot90 needs square
    assert dihedral_plan(4, 6, 2) == ((0, False), (0, True))
    # every rectangle-legal member preserves the shape
    def ident(params, state, x):
        return x
    x = jnp.zeros((1, 1, 4, 6))
    assert self_ensemble(ident, 8)(None, None, x).shape == x.shape


def test_ensemble_jits_to_one_program():
    def ident(params, state, x):
        return x
    fn = jax.jit(self_ensemble(ident, 8))
    x = jnp.asarray(np.random.RandomState(2).rand(1, 1, 4, 4), jnp.float32)
    np.testing.assert_allclose(np.asarray(fn(None, None, x)),
                               np.asarray(x), rtol=1e-6)


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="fixture not committed")
def test_gray3_fixture_self_ensemble_lift_heldout():
    # Measured (full 100-image held-out file_set 2001): base 30.955 dB,
    # flip2 31.723, D4 32.214 — the +1.26 dB eval-time surplus recorded in
    # PARITY.md. This probe re-checks the lift on the first 32 images.
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.synthetic import TexturedImages
    from dcgan_sr_tpu.evaluation.harness import evaluate_slice
    from dcgan_sr_tpu.infer.tiled import make_generator_fn
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import load_branch

    cfg = get_config("gray-3", env_override=False)
    data = np.load(FIXTURE)
    tmpl = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", tmpl.g_params)
    state = load_branch(data, "state", tmpl.g_state)
    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)

    scores = {}
    for n in (1, 8):
        gen = make_generator_fn(cfg, self_ensemble=n)
        r = evaluate_slice(cfg, gen, params, state, src, [2001],
                           batch_size=32, with_ssim=False)
        scores[n] = r.psnr_generator
    assert scores[8] > scores[1] + 0.5, scores


OVERLAP_FIXTURE = os.path.join(REPO, "fixtures", "overlap_textured_net_G.npz")


@pytest.mark.slow  # 2x (8 images x 225 tiles x {1,8} members) on CPU
@pytest.mark.skipif(not os.path.isfile(OVERLAP_FIXTURE),
                    reason="fixture not committed")
def test_overlap_pipeline_self_ensemble_lift():
    # Measured (64 held-out images): seam 30.140 -> 30.883 dB at N=8,
    # naive 29.686 -> 30.614 (bilinear 28.301) — PARITY.md surplus table.
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.data.synthetic import TexturedImages
    from dcgan_sr_tpu.image.ops import box_downsample2  # noqa: F401
    from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
    from dcgan_sr_tpu.metrics.psnr_ssim import cal_psnr_batch
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import load_branch

    cfg = get_config("gray-patch-batch-overlap", env_override=False)
    data = np.load(OVERLAP_FIXTURE)
    tmpl = init_train_state(cfg, jax.random.PRNGKey(0))
    params = load_branch(data, "params", tmpl.g_params)
    g_state = load_branch(data, "state", tmpl.g_state)
    src = TexturedImages(cfg.fineSize, nc=1, seed=1234)
    hr = jnp.asarray(src.load_batch(62500, 8))[:, 0]

    seam = {}
    for n in (1, 8):
        out = make_overlap_sr_fn(cfg, bn_eval=True, self_ensemble=n)(
            params, g_state, hr)
        seam[n] = float(cal_psnr_batch(hr, out["seam"]).mean())
    assert seam[8] > seam[1] + 0.3, seam


def test_batched_mode_vs_sequential():
    # With RUNNING-stats BN (bn_eval) the batched form is the same math in
    # one dispatch — exact to float tolerance. With train-mode BN it pools
    # the members' (slightly diverging) deeper-layer batch moments — a
    # close variant, bounded here (see ensemble.py docstring).
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.infer.tiled import make_generator_fn
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config("gray-3", env_override=False, ngf=8)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.RandomState(4).rand(4, 1, 32, 32), jnp.float32)
    for bn_eval, tol in ((True, 1e-5), (False, 2e-3)):
        seq = make_generator_fn(cfg, bn_eval=bn_eval, self_ensemble=8)(
            st.g_params, st.g_state, x)
        bat = make_generator_fn(cfg, bn_eval=bn_eval, self_ensemble=8,
                                ensemble_batched=True)(
            st.g_params, st.g_state, x)
        np.testing.assert_allclose(np.asarray(bat), np.asarray(seq),
                                   rtol=tol, atol=tol)


def test_batched_mode_rectangles_use_flip_subgroup():
    def ident(params, state, x):
        return x
    x = jnp.asarray(np.random.RandomState(5).rand(2, 1, 4, 6), jnp.float32)
    got = self_ensemble(ident, 8, batched=True)(None, None, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-6)


@pytest.mark.slow  # two full 8-member overlap-pipeline compiles on CPU
def test_overlap_pipeline_batched_ensemble_matches_sequential():
    # make_overlap_sr_fn(ensemble_batched=True) must reproduce the
    # sequential per-member pipeline under bn_eval (exact form) — the
    # one-dispatch mode bench_infer's TTA costing measures.
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.infer.tiled import make_overlap_sr_fn
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config("gray-patch-batch-overlap", env_override=False, ngf=4)
    st = init_train_state(cfg, jax.random.PRNGKey(6))
    imgs = jnp.asarray(np.random.RandomState(7).rand(2, 16, 16), jnp.float32)
    outs = {}
    for batched in (False, True):
        fn = make_overlap_sr_fn(cfg, fine=(16, 16), bn_eval=True,
                                self_ensemble=8, ensemble_batched=batched)
        outs[batched] = fn(st.g_params, st.g_state, imgs)
    for k in ("naive", "seam"):
        np.testing.assert_allclose(np.asarray(outs[True][k]),
                                   np.asarray(outs[False][k]),
                                   rtol=1e-5, atol=1e-5)

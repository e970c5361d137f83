"""EMA generator branch (cfg.g_ema): math, neutrality when off, checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.train import build_train_step, init_train_state
from dcgan_sr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

TINY = dict(ngf=4, ndf=8)


def _batches(k=3):
    return jnp.asarray(np.random.RandomState(0).rand(k, 8, 1, 8, 8),
                       jnp.float32)


def test_off_by_default_and_training_unchanged():
    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(1))
    assert st.g_ema_params is None
    cfg_ema = get_config("gray-patch-batch", env_override=False, g_ema=0.5,
                         **TINY)
    st_e = init_train_state(cfg_ema, jax.random.PRNGKey(1))
    step = jax.jit(build_train_step(cfg))
    step_e = jax.jit(build_train_step(cfg_ema))
    for hr in _batches():
        st, _ = step(st, hr)
        st_e, _ = step_e(st_e, hr)
    assert st.g_ema_params is None
    # the EMA branch observes training without influencing it
    diffs = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                                   st.g_params, st_e.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_ema_matches_manual_recurrence():
    d = 0.5  # large (1-d) so drift is far above fp32 noise
    cfg = get_config("gray-patch-batch", env_override=False, g_ema=d, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(2))
    expected = jax.tree_util.tree_map(np.asarray, st.g_params)
    step = jax.jit(build_train_step(cfg))
    for hr in _batches():
        st, _ = step(st, hr)
        expected = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * np.asarray(p), expected,
            st.g_params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()),
        st.g_ema_params, expected)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-6


def test_ema_checkpoint_roundtrip(tmp_path):
    cfg = get_config("gray-patch-batch", env_override=False, g_ema=0.9, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    step = jax.jit(build_train_step(cfg))
    for hr in _batches(2):
        st, _ = step(st, hr)
    save_checkpoint(str(tmp_path), cfg.name, 1, st)
    template = init_train_state(cfg, jax.random.PRNGKey(4))
    st2 = load_checkpoint(str(tmp_path), cfg.name, 1, template)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), st.g_ema_params,
        st2.g_ema_params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    # EMA has drifted away from the live params after 2 steps
    d2 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), st2.g_params,
        st2.g_ema_params)
    assert max(jax.tree_util.tree_leaves(d2)) > 0.0


def test_resume_ema_from_non_ema_checkpoint(tmp_path):
    """Loading --g-ema from a checkpoint saved WITHOUT the EMA branch raises
    a clear error by default (EMA scorers must not silently rank raw params),
    and seeds g_ema_params from the loaded generator params when the resume
    call site opts in (ADVICE r2); checkpoints carry an explicit
    __branches__ manifest."""
    from dcgan_sr_tpu.train.checkpoint import (checkpoint_path, load_branch,
                                               npz_branches)

    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(5))
    step = jax.jit(build_train_step(cfg))
    for hr in _batches(2):
        st, _ = step(st, hr)
    save_checkpoint(str(tmp_path), cfg.name, 1, st)

    data = np.load(checkpoint_path(str(tmp_path), cfg.name, 1, "G"))
    assert npz_branches(data) == {"params", "state", "opt"}
    # the promoted load_branch restores a single branch tool-style
    p = load_branch(data, "params", st.g_params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - np.asarray(b)).max()), p, st.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

    cfg_ema = get_config("gray-patch-batch", env_override=False, g_ema=0.9,
                         **TINY)
    template = init_train_state(cfg_ema, jax.random.PRNGKey(6))
    import pytest
    with pytest.raises(ValueError, match="no EMA branch"):
        load_checkpoint(str(tmp_path), cfg_ema.name, 1, template)
    st2 = load_checkpoint(str(tmp_path), cfg_ema.name, 1, template,
                          seed_missing_ema=True)
    assert st2.g_ema_params is not None
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        st2.g_ema_params, st.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_ema_through_scan_matches_sequential():
    """The EMA branch threads the lax.scan carry (--scan + --g-ema)."""
    from dcgan_sr_tpu.train.multi_step import build_multi_step

    cfg = get_config("gray-patch-batch", env_override=False, g_ema=0.7, **TINY)
    batches = _batches(3)

    step = jax.jit(build_train_step(cfg))
    s_seq = init_train_state(cfg, jax.random.PRNGKey(6))
    for hr in batches:
        s_seq, _ = step(s_seq, hr)

    s_scan = init_train_state(cfg, jax.random.PRNGKey(6))
    s_scan, _ = jax.jit(build_multi_step(cfg))(s_scan, batches)

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        s_seq.g_ema_params, s_scan.g_ema_params)
    # scan recompiles the body in a different fusion context (same tolerance
    # as test_multi_step_equals_sequential)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

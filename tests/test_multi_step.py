"""Multi-step scan runner: equivalence with sequential single steps."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.losses.schemes import bce_loss, bce_with_logits_loss
from dcgan_sr_tpu.train import build_train_step, init_train_state
from dcgan_sr_tpu.train.multi_step import build_multi_step

TINY = dict(ngf=4, ndf=8)


def test_multi_step_equals_sequential():
    cfg = get_config("gray-3", env_override=False, **TINY)
    k = 3
    batches = jnp.asarray(
        np.random.RandomState(0).rand(k, 4, 1, 64, 64), jnp.float32)

    step = jax.jit(build_train_step(cfg))
    s_seq = init_train_state(cfg, jax.random.PRNGKey(5))
    errs = []
    for i in range(k):
        s_seq, m = step(s_seq, batches[i])
        errs.append(float(m["errG"]))

    mstep = jax.jit(build_multi_step(cfg))
    s_scan = init_train_state(cfg, jax.random.PRNGKey(5))
    s_scan, ms = mstep(s_scan, batches)

    np.testing.assert_allclose(np.asarray(ms["errG"]), errs, rtol=1e-5, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.g_params, s_scan.g_params)
    # scan recompiles the body in a different fusion context; tiny fp32
    # reassociation differences accumulate over k Adam steps
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_bce_with_logits_matches_bce():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(64) * 3, jnp.float32)
    target = jnp.asarray(rng.randint(0, 2, 64), jnp.float32)
    a = float(bce_with_logits_loss(logits, target))
    b = float(bce_loss(jax.nn.sigmoid(logits), target))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_bce_with_logits_stable_at_saturation():
    logits = jnp.asarray([500.0, -500.0])
    target = jnp.asarray([0.0, 1.0])
    v = float(bce_with_logits_loss(logits, target))
    assert np.isfinite(v) and v > 100
    g = jax.grad(lambda l: bce_with_logits_loss(l, target))(logits)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.abs(np.asarray(g)) <= 1.0)


def test_train_epochs_scan_equals_stepwise():
    """The --scan CLI path (full chunks + remainder tail through the loop
    driver) must match plain stepwise train_epochs."""
    from dcgan_sr_tpu.train import train_epochs

    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    rng = np.random.RandomState(7)
    batches = rng.rand(5, 16, 1, 8, 8).astype(np.float32)
    batch_fn = lambda e, i: batches[i]

    def quiet(*a, **k):
        pass

    s_seq = init_train_state(cfg, jax.random.PRNGKey(9))
    s_seq, m_seq = train_epochs(cfg, s_seq, batch_fn, niter=1,
                                steps_per_epoch=5, log_fn=quiet)
    s_scan = init_train_state(cfg, jax.random.PRNGKey(9))
    s_scan, m_scan = train_epochs(cfg, s_scan, batch_fn, niter=1,
                                  steps_per_epoch=5, log_fn=quiet,
                                  scan_steps=2)  # 2+2+tail(1)

    np.testing.assert_allclose(float(m_scan["errG"]), float(m_seq["errG"]),
                               rtol=1e-5, atol=1e-6)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_seq.g_params,
        s_scan.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5


def test_dp_multi_step_matches_single_device():
    """shard_map'd scanned DP == single-device scan (cross-replica BN+pmean)."""
    from dcgan_sr_tpu.parallel import build_dp_multi_step, create_mesh, shard_batch
    from dcgan_sr_tpu.train.multi_step import build_multi_step

    cfg = get_config("gray-3", env_override=False, **TINY)
    k = 2
    batches = jnp.asarray(
        np.random.RandomState(3).rand(k, 8, 1, 64, 64), jnp.float32)

    s0 = init_train_state(cfg, jax.random.PRNGKey(11))
    s_single, m_single = jax.jit(build_multi_step(cfg))(s0, batches)

    mesh = create_mesh(8)
    s0b = init_train_state(cfg, jax.random.PRNGKey(11))
    sharded = shard_batch(batches, mesh, batch_dim=1)
    s_dp, m_dp = build_dp_multi_step(cfg, mesh)(s0b, sharded)

    np.testing.assert_allclose(np.asarray(m_dp["errG"]),
                               np.asarray(m_single["errG"]),
                               rtol=1e-4, atol=1e-5)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), s_single.g_params,
        s_dp.g_params)
    # two Adam sign-steps of lr=2e-4 bound fp32 reassociation noise
    assert max(jax.tree_util.tree_leaves(diffs)) < 2 * 2e-4


def test_train_epochs_start_epoch_resume(tmp_path):
    """start_epoch resume contract: only epochs start+1..niter run, with
    CONTINUED checkpoint numbering (a resumed run must never renumber from 1
    and clobber the prior run's checkpoints)."""
    from dcgan_sr_tpu.train import train_epochs
    from dcgan_sr_tpu.train.checkpoint import latest_epoch

    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    rng = np.random.RandomState(11)
    batch_fn = lambda e, i: rng.rand(16, 1, 8, 8).astype(np.float32)
    seen = []

    def log(line):
        seen.append(line)

    state = init_train_state(cfg, jax.random.PRNGKey(2))
    state, _ = train_epochs(cfg, state, batch_fn, niter=3, steps_per_epoch=1,
                            log_fn=log, checkpoint_dir=str(tmp_path),
                            start_epoch=1)
    text = "".join(seen)
    assert "Epoch: [2][" in text and "Epoch: [3][" in text
    assert "Epoch: [1][" not in text
    names = sorted(p.name for p in tmp_path.iterdir())
    assert any("_2_net_G" in n for n in names)
    assert any("_3_net_G" in n for n in names)
    assert not any("_1_net_G" in n for n in names)
    assert latest_epoch(str(tmp_path), cfg.name) == 3

def test_train_epochs_stage_ahead_equals_plain():
    """--stage-ahead double-buffers the feed (build + device_put of chunk
    c+1 under chunk c's compute) but consumes the SAME batches in the SAME
    order — final params must match the plain loop bit-for-bit. Covers full
    chunks + the k=1 remainder tail and a batch_fn whose output depends on
    call order (an exhausting iterator would misbehave if staging skipped
    or reordered builds)."""
    from dcgan_sr_tpu.train import train_epochs

    cfg = get_config("gray-patch-batch", env_override=False, **TINY)
    rng = np.random.RandomState(13)
    batches = rng.rand(5, 16, 1, 8, 8).astype(np.float32)
    calls = []

    def batch_fn(e, i):
        calls.append((e, i))
        return batches[i]

    def quiet(*a, **k):
        pass

    s_plain = init_train_state(cfg, jax.random.PRNGKey(21))
    s_plain, m_plain = train_epochs(cfg, s_plain, batch_fn, niter=2,
                                    steps_per_epoch=5, log_fn=quiet,
                                    scan_steps=2)
    plain_calls, calls[:] = list(calls), []

    s_sa = init_train_state(cfg, jax.random.PRNGKey(21))
    s_sa, m_sa = train_epochs(cfg, s_sa, batch_fn, niter=2,
                              steps_per_epoch=5, log_fn=quiet,
                              scan_steps=2, stage_ahead=True)
    assert calls == plain_calls  # same builds, same order
    assert float(m_sa["errG"]) == float(m_plain["errG"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_plain.g_params, s_sa.g_params)

def test_save_checkpoint_atomic(tmp_path):
    """save_checkpoint writes via same-dir .tmp + os.replace: no .tmp
    leftovers on success, both npz files load intact, and a stray .tmp
    (what a mid-save kill leaves behind) is invisible to latest_epoch
    and resume — the round-3 torn-npz failure mode can't recur."""
    from dcgan_sr_tpu.train import init_train_state
    from dcgan_sr_tpu.train.checkpoint import (checkpoint_path,
                                               latest_epoch,
                                               load_checkpoint,
                                               save_checkpoint)

    cfg = get_config("gray-3", env_override=False, **TINY)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    save_checkpoint(str(tmp_path), cfg.name, 1, st)

    names = sorted(f.name for f in tmp_path.iterdir())
    assert not any(n.endswith(".tmp") for n in names)
    for net in ("G", "D"):
        with np.load(checkpoint_path(str(tmp_path), cfg.name, 1, net)) as d:
            assert "__branches__" in d.files  # fully written, not torn

    # a killed-mid-save epoch-2 leaves only a partial .tmp: resume must
    # still pick epoch 1 and load cleanly
    torn = checkpoint_path(str(tmp_path), cfg.name, 2, "G") + ".tmp"
    with open(torn, "wb") as f:
        f.write(b"PK\x03\x04 truncated")
    assert latest_epoch(str(tmp_path), cfg.name) == 1
    load_checkpoint(str(tmp_path), cfg.name, 1, st)


def test_train_epochs_default_steps_counts_images_per_step():
    """With no explicit steps_per_epoch, the loop must derive it from IMAGES
    per step, not batchSize: gray-patch's batchSize (64) counts patches from
    ONE image, so ntrain images = ntrain steps (train-gray-patch.lua:21) —
    dividing by 64 would silently train on ~1.6% of each epoch."""
    from dcgan_sr_tpu.train import train_epochs

    cfg = get_config("gray-patch", env_override=False, ntrain=3, **TINY)
    assert cfg.images_per_step == 1 and cfg.batchSize == 64
    rng = np.random.RandomState(3)
    seen = []

    def batch_fn(epoch, i):
        seen.append((epoch, i))
        return rng.rand(cfg.step_batch, 1, 8, 8).astype(np.float32)

    state = init_train_state(cfg, jax.random.PRNGKey(2))
    train_epochs(cfg, state, batch_fn, niter=1, log_fn=lambda *a, **k: None)
    assert [i for _, i in seen] == [0, 1, 2]  # 3 images -> 3 one-image steps

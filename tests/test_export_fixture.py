"""tools/export_fixture.py: branch promotion into a committed fixture npz.

The exporter turns a selection winner's checkpoint into the params+state
fixture format every fixture-quality test loads; `--branch ema` must promote
the EMA tree into `params` exactly (consumers always read `params` — the
branch decision is made once, at export)."""

import os
import sys

import numpy as np
import jax
import pytest

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.train import init_train_state
from dcgan_sr_tpu.train.checkpoint import load_branch, npz_branches, save_checkpoint

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from export_fixture import export  # noqa: E402


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = get_config("gray-patch", env_override=False, g_ema=0.999)
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    # make the EMA branch distinguishable from params
    st.g_ema_params = jax.tree_util.tree_map(lambda x: x + 1.0, st.g_params)
    d = tmp_path_factory.mktemp("ck")
    save_checkpoint(str(d), cfg.name, 1, st)
    return cfg, st, os.path.join(str(d), f"{cfg.name}_1_net_G.npz")


@pytest.mark.parametrize("branch", ["raw", "ema"])
def test_export_promotes_branch_exactly(ckpt, branch, tmp_path):
    cfg, st, path = ckpt
    out = str(tmp_path / f"fx_{branch}.npz")
    export(path, out, branch)
    data = np.load(out)
    assert npz_branches(data) == {"params", "state"}
    src = st.g_ema_params if branch == "ema" else st.g_params
    got_p = load_branch(data, "params", st.g_params)
    got_s = load_branch(data, "state", st.g_state)
    for a, b in zip(jax.tree_util.tree_leaves(got_p),
                    jax.tree_util.tree_leaves(src)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(got_s),
                    jax.tree_util.tree_leaves(st.g_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_ema_requires_ema_branch(tmp_path):
    cfg = get_config("gray-patch", env_override=False)  # no --g-ema
    st = init_train_state(cfg, jax.random.PRNGKey(3))
    save_checkpoint(str(tmp_path), cfg.name, 1, st)
    path = os.path.join(str(tmp_path), f"{cfg.name}_1_net_G.npz")
    with pytest.raises(SystemExit, match="no EMA branch"):
        export(path, str(tmp_path / "fx.npz"), "ema")

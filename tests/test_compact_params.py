"""Compact 2-D master-param layout (ops/compact.py): pure layout change —
the train step must produce identical losses and identical (repacked) params
to the 4-D baseline step, since pack/unpack are reshapes."""

import numpy as np
import jax
import jax.numpy as jnp

from dcgan_sr_tpu.core import get_config
from dcgan_sr_tpu.models import discriminator_spec, generator_spec
from dcgan_sr_tpu.ops.compact import (pack_params, pack_state, unpack_params,
                                      unpack_state)
from dcgan_sr_tpu.train import build_train_step, init_train_state


def test_pack_unpack_roundtrip():
    cfg = get_config("gray-3", env_override=False, ngf=4, ndf=8)
    state = init_train_state(cfg, jax.random.PRNGKey(0))
    g_spec = generator_spec(cfg)
    packed = pack_params(state.g_params)
    for p in packed:
        if "w" in p:
            assert p["w"].ndim == 2
    back = unpack_params(packed, g_spec)
    for a, b in zip(state.g_params, back):
        if "w" in a:
            np.testing.assert_array_equal(np.asarray(a["w"]),
                                          np.asarray(b["w"]))


def test_compact_step_bit_identical():
    cfg4 = get_config("gray-3", env_override=False, ngf=4, ndf=8, batchSize=4)
    cfg2 = get_config("gray-3", env_override=False, ngf=4, ndf=8, batchSize=4,
                      compact_params=True)
    g_spec, d_spec = generator_spec(cfg4), discriminator_spec(cfg4)

    state4 = init_train_state(cfg4, jax.random.PRNGKey(3))
    state2 = pack_state(state4, g_spec, d_spec)

    step4 = jax.jit(build_train_step(cfg4))
    step2 = jax.jit(build_train_step(cfg2))

    rng = np.random.RandomState(0)
    for it in range(3):
        hr = jnp.asarray(rng.rand(4, 1, 64, 64).astype(np.float32))
        state4, m4 = step4(state4, hr)
        state2, m2 = step2(state2, hr)
        for k in m4:
            np.testing.assert_allclose(float(m4[k]), float(m2[k]),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"{k} step {it}")

    un = unpack_state(state2, g_spec, d_spec)
    for a, b in zip(state4.g_params, un.g_params):
        if "w" in a:
            np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                       rtol=1e-6, atol=1e-7)
    for a, b in zip(state4.d_params, un.d_params):
        if "w" in a:
            np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                       rtol=1e-6, atol=1e-7)

"""Pallas TPU kernels: the device-side preprocessing stage.

The reference's donkey threads decode, grayscale-convert, scale and normalize
on the host (donkey_folder.lua:52-70), and its training loop re-downsamples on
the host every step (train.lua:225-230).  Here the post-decode pipeline is ONE
Pallas kernel per batch: grayscale convert + [0,1]->[-1,1] normalize + 2x2 box
degrade, a single pass over HBM producing both the D input (hr) and the G
input (lr).

Implementation notes (Mosaic/TPU constraints):
  - the 2x2 box mean is expressed as two small matmuls lr = P_h @ x @ P_w^T
    with 0.5-weighted pair-sum matrices — strided sublane/lane gathers don't
    lower on TPU, matmuls ride the MXU;
  - grid is one program per image; a (C, 64, 64) float image block plus the
    pooling matrices sit comfortably in VMEM.

Used behind cfg.use_pallas; the jnp composition in image/ops.py is the
always-available reference path, and tests pin them equal (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_mean_matrix(n):
    """(n/2, n) matrix averaging adjacent pairs: P[i, 2i] = P[i, 2i+1] = 0.5."""
    p = np.zeros((n // 2, n), np.float32)
    idx = np.arange(n // 2)
    p[idx, 2 * idx] = 0.5
    p[idx, 2 * idx + 1] = 0.5
    return p


def _preprocess_kernel(x_ref, ph_ref, pw_ref, hr_ref, lr_ref, *,
                       rgb_to_gray, to_pm1, c_out):
    if rgb_to_gray:
        # reference weights .21/.72/.07 (train-gray.lua:54-76)
        gray = 0.21 * x_ref[0, 0] + 0.72 * x_ref[0, 1] + 0.07 * x_ref[0, 2]
        chans = [gray]
    else:
        chans = [x_ref[0, c] for c in range(c_out)]
    ph, pw = ph_ref[...], pw_ref[...]
    for c, x in enumerate(chans):
        if to_pm1:
            x = x * 2.0 - 1.0  # donkey_folder.lua:68
        hr_ref[0, c] = x
        # 2x2 box degrade (train.lua:226-230) as P_h @ x @ P_w^T on the MXU;
        # HIGHEST keeps fp32 multiplies (DEFAULT would round through bf16)
        t = jnp.dot(ph, x, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        lr_ref[0, c] = jnp.dot(t, pw.T, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("rgb_to_gray", "to_pm1", "interpret"))
def pallas_preprocess(x, *, rgb_to_gray=False, to_pm1=False, interpret=False):
    """(B, C, H, W) [0,1] floats -> (hr, lr): fused convert/normalize/degrade.

    hr: (B, C', H, W); lr: (B, C', H/2, W/2); C' = 1 if rgb_to_gray else C.
    """
    b, c, h, w = x.shape
    c_out = 1 if rgb_to_gray else c
    kernel = functools.partial(_preprocess_kernel, rgb_to_gray=rgb_to_gray,
                               to_pm1=to_pm1, c_out=c_out)
    ph = jnp.asarray(_pair_mean_matrix(h))
    pw = jnp.asarray(_pair_mean_matrix(w))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h // 2, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w // 2, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, c_out, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, h // 2, w // 2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c_out, h, w), x.dtype),
            jax.ShapeDtypeStruct((b, c_out, h // 2, w // 2), x.dtype),
        ),
        interpret=interpret,
    )(x, ph, pw)

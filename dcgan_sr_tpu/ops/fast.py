"""MXU-efficient rewrites of the k4s2p1 conv pair (exact, not approximate).

Why: every generator in the reference family has tiny channel counts (1-64)
at large spatial sizes (SURVEY.md §2.1).  On TPU, a conv's output channels map
to MXU lanes (128 wide); Co=8 uses 6% of the MXU.  These rewrites trade a
2.25x tap-padding overhead for 4x more lanes (net ~1.8x), and chain so the
fold transforms between layers are free relayouts:

  conv_transpose2d k4s2p1  ==  conv k3s1p1 emitting (Co,u,v) sub-pixel
                               channels, then depth_to_space(2)
    derivation: out[2p+u] = sum_t x[(2p+u+1-t)/2] w[t] for t = u+1 (mod 2);
    as a k3 window i = p-1+alpha:
      u=0: alpha=0 -> w[3], alpha=1 -> w[1]
      u=1: alpha=1 -> w[2], alpha=2 -> w[0]     (others structurally zero)

  conv2d k4s2p1            ==  conv k3s1p1 on space_to_depth(x, 2) input
    derivation: out[j] = sum_t w[t] x[2j-1+t]; x[2(j+gamma)+u]:
      gamma=-1: u=1 -> w[0]
      gamma= 0: u=0 -> w[1], u=1 -> w[2]
      gamma=+1: u=0 -> w[3]                     (others structurally zero)

Both products are bit-identical to the originals up to float reassociation
(the structural zeros contribute exact 0s).  Tested against ops.nn in
tests/test_fast_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .nn import _DN, _precision


def space_to_depth(x, f=2):
    """(B, C, H, W) -> (B, C*f*f, H/f, W/f); channel order (c, u, v)."""
    b, c, h, w = x.shape
    y = x.reshape(b, c, h // f, f, w // f, f)
    y = y.transpose(0, 1, 3, 5, 2, 4)  # (b, c, u, v, h/f, w/f)
    return y.reshape(b, c * f * f, h // f, w // f)


def depth_to_space(x, f=2):
    """Inverse of space_to_depth: (B, C*f*f, H, W) -> (B, C, H*f, W*f)."""
    b, cff, h, w = x.shape
    c = cff // (f * f)
    y = x.reshape(b, c, f, f, h, w)
    y = y.transpose(0, 1, 4, 2, 5, 3)  # (b, c, h, u, w, v)
    return y.reshape(b, c, h * f, w * f)


def _subpixel_kernel(w):
    """(Ci, Co, 4, 4) convT weight -> (4*Co, Ci, 3, 3) sub-pixel conv kernel.

    Output channel order ((co, u, v)) matches space_to_depth so
    depth_to_space recovers the true layout.
    """
    ci, co = w.shape[0], w.shape[1]
    z = jnp.zeros((ci, co), w.dtype)

    def tap(u, a):
        # 1-D factor: phase u, window offset a in {0,1,2} -> w index or None
        m = {(0, 0): 3, (0, 1): 1, (1, 1): 2, (1, 2): 0}
        return m.get((u, a))

    # K[(co,u,v), ci, a, b] = w[ci, co, t_u(a), t_v(b)] (or 0)
    blocks = []
    for u in (0, 1):
        for v in (0, 1):
            taps = []
            for a in (0, 1, 2):
                row = []
                for b_ in (0, 1, 2):
                    tu, tv = tap(u, a), tap(v, b_)
                    if tu is None or tv is None:
                        row.append(z)
                    else:
                        row.append(w[:, :, tu, tv])
                taps.append(jnp.stack(row, axis=-1))
            blocks.append(jnp.stack(taps, axis=-2))  # (Ci, Co, 3, 3)
    # stack phases: (4, Ci, Co, 3, 3) -> (Co, 4, Ci, 3, 3) -> (4*Co, Ci, 3, 3)
    k = jnp.stack(blocks, axis=0)
    k = k.transpose(2, 0, 1, 3, 4).reshape(4 * co, ci, 3, 3)
    return k


def conv_transpose2d_subpixel(x, w, *, compute_dtype=None):
    """Exact k4s2p1 transposed conv via sub-pixel k3s1p1 conv (+d2s).

    x: (B, Ci, H, W); w: (Ci, Co, 4, 4) torch layout -> (B, Co, 2H, 2W).
    """
    k = _subpixel_kernel(w)
    prec = _precision(compute_dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        k = k.astype(compute_dtype)
        y = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=_DN, precision=prec)
    else:
        y = lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=_DN, precision=prec,
                                     preferred_element_type=jnp.float32)
    return depth_to_space(y, 2)


def _s2d_kernel(w):
    """(Co, Ci, 4, 4) stride-2 conv weight -> (Co, 4*Ci, 3, 3) folded kernel.

    Input channel order ((ci, u, v)) matches space_to_depth(x, 2).
    """
    co, ci = w.shape[0], w.shape[1]
    z = jnp.zeros((co, ci), w.dtype)

    def tap(u, g):
        # 1-D factor: input sub-phase u, folded window offset g in {0,1,2}
        m = {(1, 0): 0, (0, 1): 1, (1, 1): 2, (0, 2): 3}
        return m.get((u, g))

    ch_blocks = []
    for u in (0, 1):
        for v in (0, 1):
            taps = []
            for g in (0, 1, 2):
                row = []
                for h_ in (0, 1, 2):
                    tu, tv = tap(u, g), tap(v, h_)
                    if tu is None or tv is None:
                        row.append(z)
                    else:
                        row.append(w[:, :, tu, tv])
                taps.append(jnp.stack(row, axis=-1))
            ch_blocks.append(jnp.stack(taps, axis=-2))  # (Co, Ci, 3, 3)
    # (4, Co, Ci, 3, 3) -> (Co, Ci, 4, 3, 3) -> (Co, 4*Ci, 3, 3)
    k = jnp.stack(ch_blocks, axis=0)
    k = k.transpose(1, 2, 0, 3, 4).reshape(co, ci * 4, 3, 3)
    return k


def conv2d_s2d(x, w, *, compute_dtype=None):
    """Exact k4s2p1 stride-2 conv via k3s1p1 conv on s2d-folded input.

    x: (B, Ci, H, W); w: (Co, Ci, 4, 4) -> (B, Co, H/2, W/2).
    """
    xf = space_to_depth(x, 2)
    k = _s2d_kernel(w)
    prec = _precision(compute_dtype)
    if compute_dtype is not None:
        xf = xf.astype(compute_dtype)
        k = k.astype(compute_dtype)
        return lax.conv_general_dilated(xf, k, (1, 1), ((1, 1), (1, 1)),
                                        dimension_numbers=_DN, precision=prec)
    return lax.conv_general_dilated(xf, k, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=_DN, precision=prec,
                                    preferred_element_type=jnp.float32)

"""Fused convT(k4s2p1)+BN+ReLU+conv(k4s2p1) in the Mosaic-safe flat-lane form.

Second-generation bulge kernel (see docs/fused_bulge.md for the measured
motivation and the lowering constraints that killed the first NHWC draft,
ops/pallas_fused.py).  Targets the gray-3 generator's hot pair
(/root/reference/train-gray-3.lua:60-66): SpatialFullConvolution Ci->Cm
doubling HxW, BatchNorm (train-mode biased batch stats), ReLU, and
SpatialConvolution Cm->Co halving back — without materializing the
2x-resolution hidden tensor in HBM.

Layout: NCHW with H*W flattened into ONE lane dimension, x as (B, C, H*W).
Everything Mosaic needs then lines up:

  * a band window (tm+2 rows, with halo) is a lane slice at multiples of W
    (>=128) of the resident full-image block — no overlapping BlockSpecs,
    no manual DMA;
  * the im2col shifts are static lane offsets of one rolled copy;
  * parity/tap packing is a sublane concatenation;
  * the whole convT band is ONE matmul (4*Cm, 6*Ci) @ (6*Ci, L) and the
    consumer band ONE matmul (Co, 16*Cm) @ (16*Cm, tm*W).

Index map (derived in docs/fused_bulge.md; pinned by tests):
  pieces  P[(ti,tjp,ci), (u,c)] = x[Mt-1+u+ti, c-1+tjp],  tjp in {0,1,2}
  hidden  O[(di,dj,cm), (u,c)]  = h[2*(Mt+u)-di, 2*c+dj]
  weights Wp[(di,dj,cm),(ti,tjp,ci)] = wT[ci,cm, 3-di-2ti, 3-dj-2tj]
          with tj = tjp-dj in {0,1} (other combos zero)
  consumer tap (a,b) of y[m,n] reads O[(di,dj)] at (u,c) =
          (m-Mt + (a>=2), n + {b0:-1, b1:0, b2:0, b3:+1})
          with di = (1-a) mod 2, dj = (b+1) mod 2.

The 6-piece packing pads K from 96 to the same 128 the 4-piece K=64 form
pads to, so full h-column coverage costs nothing: both matmuls sit at the
structural 12.5% MXU ceiling for these channel counts (docs/fused_bulge.md).

MEASURED NEGATIVE RESULT (docs/fused_bulge.md): lowers and is exact on the
real chip, but 3.6x slower than XLA's unfused composition — the VMEM im2col
staging (Mosaic cannot concat values at different lane offsets) costs ~4x
the matmul time. Kept as a measured artifact, not wired into any config;
exactness pinned against the unfused composition (tests/test_pallas_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SLACK = 128          # lane slack past (tm+1)*w so every tap slice is static
_WSLACK = 256         # window slack past (tm+2)*w feeding the piece slices


# ---------------------------------------------------------------------------
# host-side weight packing
# ---------------------------------------------------------------------------

def pack_wT(wT):
    """(Ci, Cm, 4, 4) IOHW -> (4*Cm, 6*Ci) for the convT band matmul."""
    ci, cm = wT.shape[0], wT.shape[1]
    out = jnp.zeros((4 * cm, 6 * ci), wT.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for ti in (0, 1):
                for tj in (0, 1):
                    tjp = tj + dj
                    r = (di * 2 + dj) * cm
                    c = (ti * 3 + tjp) * ci
                    blk = wT[:, :, 3 - di - 2 * ti, 3 - dj - 2 * tj]
                    out = out.at[r:r + cm, c:c + ci].set(blk.T)
    return out


def pack_wC(wC):
    """(Co, Cm, 4, 4) OIHW -> (Co, 16*Cm) for the consumer band matmul.

    Q row block k2 = a*4+b holds the O[(di(a), dj(b))] tap slice, so
    column block k2 carries wC[:, :, a, b]."""
    co, cm = wC.shape[0], wC.shape[1]
    out = jnp.zeros((co, 16 * cm), wC.dtype)
    for a in range(4):
        for b in range(4):
            k2 = a * 4 + b
            out = out.at[:, k2 * cm:(k2 + 1) * cm].set(wC[:, :, a, b])
    return out


# ---------------------------------------------------------------------------
# in-kernel band helpers
# ---------------------------------------------------------------------------

def _prec(dtype):
    # fp32 parity path must not round through bf16 (CLAUDE.md gotcha);
    # bf16 path keeps native MXU precision
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else
            jax.lax.Precision.DEFAULT)


def _band_window(x_ref, t, *, tm, w, ci):
    """(ci, (tm+2)*w + _WSLACK) window: image rows [t*tm-1, t*tm+tm+1).

    The flat input is padded with zero lanes front-shifted handling: for
    t == 0 the slice would start at row -1; we instead load from row 0 and
    roll right by one row, zeroing the first row's lanes."""
    wlen = (tm + 2) * w + _WSLACK
    first = t == 0
    # expressed as <dynamic>*128 so Mosaic can statically prove alignment
    lo128 = jnp.where(first, 0, t * (tm * (w // 128)) - (w // 128))
    xw = x_ref[0, :, pl.ds(lo128 * 128, wlen)]
    f = jax.lax.broadcasted_iota(jnp.int32, (ci, wlen), 1)
    rolled = jnp.roll(xw, w, axis=1)
    return jnp.where(first, jnp.where(f < w, 0.0, rolled), xw)


def _pieces(xw, p_s, *, tm, w, ci):
    """6 shifted copies staged into the (6*ci, L) scratch, L=(tm+1)*w+_SLACK.

    piece(ti, tjp)[u, c] = x[row0+u+ti, c-1+tjp]; column-wrap lanes (which
    alias the neighbouring row's far edge) zeroed.  Staged through VMEM
    because Mosaic cannot concatenate values whose lane offsets differ
    (stores canonicalize the layout)."""
    L = (tm + 1) * w + _SLACK
    xr = jnp.roll(xw, 1, axis=1)  # xr[:, f] = xw[:, f-1]
    f = jax.lax.broadcasted_iota(jnp.int32, (ci, L), 1)
    cmod = jax.lax.rem(f, w)
    for ti in (0, 1):
        for tjp in (0, 1, 2):
            off = ti * w + tjp  # into xr == offset ti*w + tjp - 1 into xw
            p = jax.lax.slice_in_dim(xr, off, off + L, axis=1)
            if tjp == 0:
                p = jnp.where(cmod == 0, 0.0, p)      # x col -1
            elif tjp == 2:
                p = jnp.where(cmod == w - 1, 0.0, p)  # x col w
            k = ti * 3 + tjp
            p_s[k * ci:(k + 1) * ci, :] = p
    return p_s[...]


def _hidden(x_ref, wp_ref, p_s, t, *, tm, w, ci, cm):
    """O (4*cm, L) fp32: O[(di,dj,cm),(u,c)] = h[2*(t*tm+u)-di, 2c+dj]."""
    xw = _band_window(x_ref, t, tm=tm, w=w, ci=ci)
    p = _pieces(xw, p_s, tm=tm, w=w, ci=ci)
    return jnp.dot(wp_ref[...], p, preferred_element_type=jnp.float32,
                   precision=_prec(p.dtype))


def _o_iotas(tm, w, cm):
    L = (tm + 1) * w + _SLACK
    sub = jax.lax.broadcasted_iota(jnp.int32, (4 * cm, L), 0)
    f = jax.lax.broadcasted_iota(jnp.int32, (4 * cm, L), 1)
    return sub, f


# ---------------------------------------------------------------------------
# phase 1: batch statistics of the hidden tensor
# ---------------------------------------------------------------------------

def _stats_kernel(x_ref, wp_ref, out_ref, p_s, *, tm, w, ci, cm):
    t = pl.program_id(1)
    o = _hidden(x_ref, wp_ref, p_s, t, tm=tm, w=w, ci=ci, cm=cm)
    # each band owns h rows [2*t*tm, 2*(t+1)*tm): di=0 -> u in [0, tm),
    # di=1 -> u in [1, tm+1); slack lanes excluded
    sub, f = _o_iotas(tm, w, cm)
    di1 = sub >= 2 * cm
    ok = (di1 & (f >= w) & (f < (tm + 1) * w)) | (~di1 & (f < tm * w))
    om = jnp.where(ok, o, 0.0)
    s = jnp.sum(om, axis=1)
    sq = jnp.sum(om * om, axis=1)
    out_ref[0, 0] = jnp.stack([s, sq], axis=0)


# ---------------------------------------------------------------------------
# phase 2: recompute, normalize, consume
# ---------------------------------------------------------------------------

def _consume(o_n, wc_ref, q_s, *, tm, w, cm, co):
    """One matmul: y band (co, tm*w) from the normalized parity planes.

    The 16 tap slices are staged through the (16*cm, N) scratch (same
    lane-offset canonicalization story as _pieces)."""
    N = tm * w
    orr = jnp.roll(o_n, 1, axis=1)  # orr[:, f] = o_n[:, f-1]
    f = jax.lax.broadcasted_iota(jnp.int32, (cm, N), 1)
    nmod = jax.lax.rem(f, w)
    for a in range(4):
        di = (1 - a) % 2
        su = 1 if a >= 2 else 0
        for b in range(4):
            dj = (b + 1) % 2
            sc = (-1, 0, 0, 1)[b]
            k = di * 2 + dj
            base = su * w + sc + 1  # +1 compensates the roll
            blk = jax.lax.slice_in_dim(orr, k * cm, (k + 1) * cm, axis=0)
            q = jax.lax.slice_in_dim(blk, base, base + N, axis=1)
            if b == 0:
                q = jnp.where(nmod == 0, 0.0, q)          # h col -1 pad
            elif b == 3:
                q = jnp.where(nmod == w - 1, 0.0, q)      # h col 2w pad
            k2 = a * 4 + b
            q_s[k2 * cm:(k2 + 1) * cm, :] = q
    return jnp.dot(wc_ref[...], q_s[...], preferred_element_type=jnp.float32,
                   precision=_prec(q_s.dtype))


def _main_kernel(x_ref, wp_ref, wc_ref, st_ref, y_ref, p_s, q_s, *, tm, w,
                 ci, cm, co, nb, out_dtype):
    t = pl.program_id(1)
    o = _hidden(x_ref, wp_ref, p_s, t, tm=tm, w=w, ci=ci, cm=cm)
    L = o.shape[1]
    st = st_ref[...]                                        # (128, 8) fp32
    mu = jax.lax.slice(st, (0, 0), (4 * cm, 1))             # (4cm, 1)
    gain = jax.lax.slice(st, (0, 1), (4 * cm, 2))
    beta = jax.lax.slice(st, (0, 2), (4 * cm, 3))
    o_n = (o - jnp.broadcast_to(mu, (4 * cm, L))) \
        * jnp.broadcast_to(gain, (4 * cm, L)) \
        + jnp.broadcast_to(beta, (4 * cm, L))
    o_n = jnp.maximum(o_n, 0.0)
    # h edge rows (-1 and 2h) are the consumer's zero padding, not
    # activations: di=1,u=0 at t==0 is h row -1; di=0,u=tm at t==nb-1 is 2h.
    # Slack lanes are zeroed too (they would otherwise carry beta).
    sub, f = _o_iotas(tm, w, cm)
    first = t == 0
    last = t == nb - 1
    bad = (first & (sub >= 2 * cm) & (f < w)) \
        | (last & (sub < 2 * cm) & (f >= tm * w) & (f < (tm + 1) * w)) \
        | (f >= (tm + 1) * w)
    o_n = jnp.where(bad, 0.0, o_n).astype(out_dtype)
    y = _consume(o_n, wc_ref, q_s, tm=tm, w=w, cm=cm, co=co)
    y_ref[0] = y.astype(y_ref.dtype)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("eps", "tm", "interpret"))
def fused_bulge_fwd(x, wT, scale, bias, wC, *, eps=1e-5, tm=32,
                    interpret=False):
    """y = conv_k4s2p1(relu(bn(convT_k4s2p1(x)))) without materializing the
    2x-resolution hidden tensor in HBM.

    x: (B, Ci, H, W) with W % 128 == 0, H % tm == 0; wT: (Ci, Cm, 4, 4) IOHW;
    wC: (Co, Cm, 4, 4) OIHW; scale/bias: (Cm,) fp32.  Returns
    (y: (B, Co, H, W), (mean, biased_var)) with train-mode batch statistics
    of the hidden tensor, as ops.nn.batch_norm would produce.
    """
    bsz, ci, h, w = x.shape
    cm = wT.shape[1]
    co = wC.shape[0]
    assert w % 128 == 0 and h % tm == 0, (h, w, tm)
    assert (4 * cm) % 8 == 0 and (4 * cm) <= 128 and ci % 8 == 0, (ci, cm)
    nb = h // tm

    # flat spatial lanes + zero slack: the last band's window reads one row
    # past the image (two when nb == 1, where the t==0 roll-handled window
    # spans rows [0, tm+2)) plus _WSLACK lanes
    xf = jnp.concatenate(
        [x.reshape(bsz, ci, h * w),
         jnp.zeros((bsz, ci, 2 * w + _WSLACK), x.dtype)], axis=2)
    wp = pack_wT(wT).astype(x.dtype)
    wc = pack_wC(wC).astype(x.dtype)

    grid = (bsz, nb)
    flat = h * w + 2 * w + _WSLACK
    x_spec = pl.BlockSpec((1, ci, flat), lambda b, t: (b, 0, 0))
    wp_spec = pl.BlockSpec((4 * cm, 6 * ci), lambda b, t: (0, 0))

    sums = pl.pallas_call(
        functools.partial(_stats_kernel, tm=tm, w=w, ci=ci, cm=cm),
        grid=grid,
        in_specs=[x_spec, wp_spec],
        out_specs=pl.BlockSpec((1, 1, 2, 4 * cm), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, nb, 2, 4 * cm), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((6 * ci, (tm + 1) * w + _SLACK), x.dtype)],
        interpret=interpret,
    )(xf, wp)
    s4 = sums[:, :, 0, :].sum(axis=(0, 1)).reshape(4, cm)
    q4 = sums[:, :, 1, :].sum(axis=(0, 1)).reshape(4, cm)
    n = bsz * (2 * h) * (2 * w)
    mean = s4.sum(axis=0) / n
    var = q4.sum(axis=0) / n - mean * mean   # biased (torch BN train mode)
    gain = scale / jnp.sqrt(var + eps)
    # stats block (128, 8): per-(di,dj,cm) sublane columns mu/gain/beta
    st = jnp.stack([jnp.tile(mean, 4), jnp.tile(gain, 4),
                    jnp.tile(bias.astype(jnp.float32), 4)], axis=1)
    st = jnp.pad(st, ((0, 128 - 4 * cm), (0, 5))).astype(jnp.float32)

    y = pl.pallas_call(
        functools.partial(_main_kernel, tm=tm, w=w, ci=ci, cm=cm, co=co,
                          nb=nb, out_dtype=x.dtype),
        grid=grid,
        in_specs=[x_spec, wp_spec,
                  pl.BlockSpec((co, 16 * cm), lambda b, t: (0, 0)),
                  pl.BlockSpec((128, 8), lambda b, t: (0, 0))],
        out_specs=pl.BlockSpec((1, co, tm * w), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((bsz, co, h * w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((6 * ci, (tm + 1) * w + _SLACK), x.dtype),
            pltpu.VMEM((16 * cm, tm * w), x.dtype)],
        interpret=interpret,
    )(xf, wp, wc, st)
    return y.reshape(bsz, co, h, w), (mean, var)

"""Device-resident seam-cut stitching: all 225 tiles' DP seams in parallel.

The reference runs the minimum-error-boundary DP sequentially per patch on the
host (overlap:457-694).  The key observation making it parallel: each patch's
composite depends only on the GENERATOR TILES of itself and its left/top
neighbor — never on the evolving canvas — and the canvas's last-writer-wins
ordering reduces to the same ownership gather as the naive stitch.  So:

  1. batched DP over all tiles at once (lax.scan over the 8 rows, vectorized
     across 225 seams), with the reference's exact tie-breaking (last-argmin
     seam start, stay/+1/-1 backtrack preference);
  2. per-patch composites via per-row masks;
  3. one ownership gather assembles the canvas.

Bit-identical to infer.seam.seam_stitch (committed-behavior mode); tested in
tests/test_seam_device.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

def _dp_paths(delta):
    """delta: (N, P, V) -> cumulative min-path table (N, P, V) via scan."""
    big = jnp.inf

    def step(prev, d_row):
        left = jnp.concatenate([jnp.full(prev.shape[:-1] + (1,), big),
                                prev[..., :-1]], axis=-1)
        right = jnp.concatenate([prev[..., 1:],
                                 jnp.full(prev.shape[:-1] + (1,), big)], axis=-1)
        cur = d_row + jnp.minimum(jnp.minimum(left, prev), right)
        return cur, cur

    first, rest = delta[:, 0], delta[:, 1:]
    _, rows = lax.scan(step, first, jnp.swapaxes(rest, 0, 1))
    return jnp.concatenate([first[:, None], jnp.swapaxes(rows, 0, 1)], axis=1)


def _backtrack(path):
    """path: (N, P, V) -> 1-based seam indices (N, P), reference tie-breaks."""
    n, p, v = path.shape
    last = path[:, -1, :]
    mn = last.min(axis=-1, keepdims=True)
    eq = last == mn
    # LAST argmin in b order (overlap:516-520 overwrites on equality)
    start = (v - 1) - jnp.argmax(eq[:, ::-1], axis=-1) + 1  # 1-based

    def step(nb, row):
        # row: (N, V) path values at this a; nb: (N,) 1-based next index.
        # V is tiny (the overlap width, typically 4): branchless selects beat
        # gathers on TPU by a wide margin.
        def gather(idx):  # 1-based, clamped
            ic = jnp.clip(idx - 1, 0, v - 1)
            out = row[:, 0]
            for j in range(1, v):
                out = jnp.where(ic == j, row[:, j], out)
            return out

        at = gather(nb)
        below = gather(nb - 1)
        above = gather(nb + 1)
        # interior: prefer stay, then +1, then -1 (overlap:536-544)
        tri = jnp.minimum(jnp.minimum(at, below), above)
        interior = jnp.where(at == tri, nb,
                             jnp.where(above == tri, nb + 1, nb - 1))
        # nb == 1: stay if path[1] <= path[2] else 2 (overlap:523-528)
        lo = jnp.where(gather(jnp.ones_like(nb)) <=
                       gather(jnp.full_like(nb, 2)), 1, 2)
        # nb == V: stay if path[V] <= path[V-1] else V-1 (overlap:529-534)
        hi = jnp.where(gather(jnp.full_like(nb, v)) <=
                       gather(jnp.full_like(nb, v - 1)), v, v - 1)
        out = jnp.where(nb == 1, lo, jnp.where(nb == v, hi, interior))
        return out, out

    rows = jnp.swapaxes(path[:, :-1, :], 0, 1)[::-1]  # a = P-2 .. 0
    _, idxs = lax.scan(step, start, rows)
    idxs = idxs[::-1]  # back to a ascending
    return jnp.concatenate([jnp.swapaxes(idxs, 0, 1), start[:, None]], axis=1)


def _left_composites(tiles, line, patch, overlap):
    """Composite every tile against its left neighbor: (N, P, P)."""
    n = tiles.shape[0]
    prev = tiles[jnp.maximum(jnp.arange(n) - 1, 0)]
    delta = jnp.abs(prev[:, :, patch - overlap:] - tiles[:, :, :overlap])
    idx = _backtrack(_dp_paths(delta))  # (N, P) 1-based column counts
    cols = jnp.arange(patch)[None, None, :]          # 0-based column
    take_prev = cols < idx[:, :, None]               # first idx cols from prev
    prev_band = prev[:, :, patch - overlap:]
    prev_full = jnp.concatenate(
        [prev_band, jnp.zeros((n, patch, patch - overlap), tiles.dtype)], axis=2)
    return jnp.where(take_prev, prev_full, tiles)


def _top_composites(tiles, line, patch, overlap):
    """Composite every tile against its top neighbor: (N, P, P)."""
    n = tiles.shape[0]
    prev = tiles[jnp.maximum(jnp.arange(n) - line, 0)]
    delta = jnp.abs(prev[:, patch - overlap:, :] - tiles[:, :overlap, :])
    idx = _backtrack(_dp_paths(jnp.swapaxes(delta, 1, 2)))  # per column
    rows = jnp.arange(patch)[None, :, None]
    take_prev = rows < jnp.swapaxes(idx[:, :, None], 1, 2)
    prev_band = prev[:, patch - overlap:, :]
    prev_full = jnp.concatenate(
        [prev_band, jnp.zeros((n, patch - overlap, patch), tiles.dtype)], axis=1)
    return jnp.where(take_prev, prev_full, tiles)


def seam_stitch_device(tiles, fine, patch, overlap, *, both_seams=False):
    """JIT-able seam stitch of (Lh*Lw, patch, patch) tiles -> `fine` canvas.

    `fine` is an int (square, the reference case) or (H, W).  Matches
    infer.seam.seam_stitch exactly in BOTH modes: committed behavior
    (both_seams=False — interior patches take the left composite over their
    whole footprint) and intent mode (both_seams=True — interior patches
    take the left composite in the left overlap band, the top composite
    elsewhere; the evident intent of overlap:625-692).
    """
    from ..image.patches import _ownership, _overlap_lines

    lh, lw = _overlap_lines(fine, patch, overlap)
    n = lh * lw
    tiles = jnp.asarray(tiles)
    # the top neighbor sits one full patch-row earlier: stride = lw
    left = _left_composites(tiles, lw, patch, overlap)
    top = _top_composites(tiles, lw, patch, overlap)

    xi = jnp.arange(n) // lw
    yi = jnp.arange(n) % lw
    if both_seams:
        # interior: left seam owns columns [0, overlap), top seam the rest
        band = (jnp.arange(patch) < overlap)[None, None, :]
        interior = jnp.where(band, left, top)
        comp = jnp.where(((xi > 0) & (yi > 0))[:, None, None], interior,
                         jnp.where((yi > 0)[:, None, None], left,
                                   jnp.where((xi > 0)[:, None, None], top,
                                             tiles)))
    else:
        # committed selection: (0,0) raw; row 0 -> left; col 0 -> top;
        # interior -> left (the left composite overwrites the top one)
        use_left = yi > 0
        comp = jnp.where(use_left[:, None, None], left,
                         jnp.where((xi > 0)[:, None, None], top, tiles))

    # ownership gather (same last-writer map as the naive stitch)
    pi, off_r, off_c = _ownership(fine, patch, overlap)
    return comp[pi, off_r[:, None], off_c[None, :]]

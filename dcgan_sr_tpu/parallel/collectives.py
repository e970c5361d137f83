"""First-class collectives wrapper — the 'distributed communication backend'.

The reference has no inter-device communication at all (no NCCL/MPI anywhere,
SURVEY.md §2.5); the TPU build's backend is XLA collectives over ICI.  This
thin, testable layer is the single place the rest of the framework calls into,
so swapping/auditing the collective implementation is one file.
"""

from __future__ import annotations

import jax
from jax import lax


def psum(x, axis_name):
    return lax.psum(x, axis_name)


def pmean(x, axis_name):
    return lax.pmean(x, axis_name)


def all_gather(x, axis_name, *, axis=0, tiled=True):
    return lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def ppermute(x, axis_name, perm):
    return lax.ppermute(x, axis_name, perm)


def reduce_scatter(x, axis_name, *, scatter_dimension=0):
    return lax.psum_scatter(x, axis_name, scatter_dimension=scatter_dimension,
                            tiled=True)


def axis_index(axis_name):
    return lax.axis_index(axis_name)


def axis_size(axis_name):
    return lax.psum(1, axis_name)

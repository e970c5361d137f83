"""Profiling hooks: jax.profiler traces around measured regions.

The reference's only instrumentation is torch.Timer wall clocks (SURVEY.md §5
tracing row); here the same timers exist (utils/timers.py) plus real XLA
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir, enabled=True):
    """Context manager: capture a jax.profiler trace of the enclosed region."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_cost_analysis(jitted, *example_args):
    """XLA's own FLOP/byte estimates for a jitted function (used to check the
    step against the HBM roofline; see bench notes)."""
    comp = jitted.lower(*example_args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return dict(ca)

"""Scanned-timing helper for TPU measurement tools (the CLAUDE.md
measurement methodology, single home — tools/attr_variant.py,
tools/attr_overlap.py and ad-hoc probes import it so a methodology fix
lands everywhere at once)."""

import time


def timed_scan(fn, args, reps, k):
    """Compile, then time `reps` dispatches of a k-iteration scanned program;
    returns seconds per scanned iteration.

    `fn(*args)` must return a SCALAR depending on the full computation chain:
    the axon tunnel does not synchronize through block_until_ready, so
    fetching the value is the only reliable fence; and XLA dead-code-
    eliminates anything the scalar does not depend on (fold gradients into
    the scan carry).  Per-dispatch tunnel overhead (~2-3 ms RPC) amortizes
    over the k in-program iterations — k >= 20 measures the program, not
    the RPC."""
    float(fn(*args))
    t0 = time.perf_counter()
    v = 0.0
    for _ in range(reps):
        v = fn(*args)
    float(v)
    return (time.perf_counter() - t0) / (reps * k)


def median_spread(reps, nd):
    """(median, [min, median, max]) of a list of rep measurements, rounded to
    `nd` decimals — the one spread format every bench JSON line carries
    (BENCH_r04+ schema: median as 'value', spread distinguishing host noise
    from a real regression across rounds/machines)."""
    reps = sorted(reps)
    med = reps[len(reps) // 2]
    return med, [round(reps[0], nd), round(med, nd), round(reps[-1], nd)]

"""Per-machine XLA:CPU persistent compile cache selection.

XLA:CPU AOT results embed the compile host's CPU feature set; loading an
entry produced on a different machine fails the feature check and falls back
to a FULL recompile after paying the failed-load cost — a cache dir shared
across machines is slower than no cache at all (measured: 12.9 s vs 3.4 s
for the fused gray-3 train step). TPU program cache entries are keyed by the
TPU target, not the host, so the shared `.jax_cache` stays correct for TPU.

`pin_cpu()` is the one call every CPU-pinned entry point (tests conftest,
CLI/tools `--cpu`) should make: it pins the platform AND routes the compile
cache to a host-fingerprinted directory, unless the caller already set
JAX_COMPILATION_CACHE_DIR explicitly.
"""

import hashlib
import os
import platform

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def machine_fingerprint():
    """(short-hash, human description) of this host's stable CPU identity.

    Hashing only the cpuinfo `flags` line is not discriminating enough:
    XLA:CPU also embeds pseudo-features (+prefer-no-scatter/-gather) chosen
    from the CPU *model*, so two hosts with identical flag lines can still
    reject each other's AOT entries (seen in round 3: every load failed the
    feature check and forced a full recompile). Key on the STABLE identity
    lines of the first processor block — model name, vendor, family, model,
    stepping AND flags — but not the volatile ones (`cpu MHz` changes with
    frequency scaling, which would mint a fresh empty cache dir per run).

    The same tag stamps bench JSON lines so cross-round readers can tell
    host changes from tunnel drift (BENCH artifacts, round-4 VERDICT item).
    """
    stable = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "flags")
    try:
        with open("/proc/cpuinfo") as f:
            text = f.read()
        lines = text.split("\n\n", 1)[0].splitlines()
        block = "\n".join(l for l in lines
                          if l.split(":", 1)[0].strip() in stable)
        model = next((l.split(":", 1)[1].strip() for l in lines
                      if l.startswith("model name")), "unknown")
        desc = f"{text.count('model name')} cores, {model}"
    except OSError:
        block = platform.processor()
        desc = block or "unknown"
    tag = hashlib.sha1((platform.machine() + block).encode()).hexdigest()[:10]
    return tag, desc


def machine_cpu_cache_dir(root=_REPO):
    """Compile-cache dir keyed by this host's CPU identity (see
    machine_fingerprint for why the key uses only stable cpuinfo lines)."""
    return os.path.join(root, ".jax_cache_cpu_" + machine_fingerprint()[0])


def enable_tpu_cache(jax, min_compile_secs=0.5):
    """Route the persistent compile cache to the shared `.jax_cache`.

    TPU program cache entries are keyed by the TPU target (not the host), so
    one repo-local dir is safe to share across machines.  Every ad-hoc TPU
    entry point should call this right after `import jax`: first compiles
    through the tunnel cost 1-3.5 min per (config, batch) shape, so an
    uncached run wastes minutes (tools/tpu_block.sh exports the same dir in
    the shell for jobs it launches; this covers tools run standalone).
    An explicitly exported JAX_COMPILATION_CACHE_DIR still wins.
    """
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or os.path.join(_REPO, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache


def pin_cpu(jax, min_compile_secs=0.5):
    """Pin jax to CPU and enable the per-machine persistent compile cache.

    Must run after `import jax` but before any operation touches the backend
    (the axon TPU plugin force-prepends itself to JAX_PLATFORMS, so env vars
    alone cannot pin the platform).
    """
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU prints a page-long LOG(ERROR) on cache loads whose embedded
    # feature list names XLA-internal pseudo-features (+prefer-no-*); the
    # entries load fine (measured) — the message is noise. NOTE: the C++
    # logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads, so
    # in-process sets (even at module top, before any jax import) are
    # BEST-EFFORT — measured round 3: a shell-level
    # `TF_CPP_MIN_LOG_LEVEL=3 python ...` export always suppresses the
    # load-time messages, while the same value set via os.environ before
    # `import jax` sometimes does not. Entry points still set it at module
    # top (tests/conftest.py, tools/*, train.py --cpu) as the cheap layer;
    # export it in the shell when clean stderr matters.
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    # an explicitly exported cache dir wins; otherwise per-machine default
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") \
        or machine_cpu_cache_dir()
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache

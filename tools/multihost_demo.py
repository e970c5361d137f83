#!/usr/bin/env python3
"""Real multi-process DP run: N processes x M virtual CPU devices, one mesh.

Upgrades the simulated per-host feed semantics (tests/test_multihost_feed.py)
to a REAL `jax.distributed` run: every process materializes ONLY its
`local_batch_slice` of the global batch — the pod-scale feed discipline the
single-host reference never needed (its donkey pool feeds one GPU,
/root/reference/data/data.lua + train.lua:168-169) — forms the global sharded
array with `make_array_from_process_local_data`, and executes the
cross-replica DP train step (`parallel/dp.py`). The losses it prints are
replicated outputs: every process must report the same numbers, and (because
BN and grads are cross-replica) the numbers must match a single-process run
over the identical global batch regardless of the process topology.

Launch (2 processes x 4 virtual devices = one 8-device mesh):
    python tools/multihost_demo.py --procs 2 --id 0 &
    python tools/multihost_demo.py --procs 2 --id 1
Single-process control (same global math):
    python tools/multihost_demo.py --procs 1 --id 0 --local-devices 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# XLA's C++ logger latches TF_CPP_MIN_LOG_LEVEL when the backend .so loads
# (at `import jax`), so pin_cpu() setting it in-process is too late to mute
# the cpu_aot_loader pseudo-feature load messages. Set it before any jax import.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--id", type=int, default=0)
    ap.add_argument("--coordinator", default="localhost:12355")
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--config", default="gray-3")
    ap.add_argument("--batch", type=int, default=16, help="GLOBAL batch")
    ap.add_argument("--ngf", type=int, default=8)
    ap.add_argument("--ndf", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}")
    import jax
    from dcgan_sr_tpu.utils.cache import pin_cpu
    pin_cpu(jax)

    from dcgan_sr_tpu.parallel.mesh import (create_mesh, initialize_distributed,
                                            local_batch_slice)
    initialize_distributed(args.coordinator, args.procs, args.id)
    assert jax.process_count() == args.procs
    assert jax.device_count() == args.procs * args.local_devices

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dcgan_sr_tpu.core import get_config
    from dcgan_sr_tpu.parallel.dp import build_dp_train_step
    from dcgan_sr_tpu.train import init_train_state

    cfg = get_config(args.config, env_override=False, batchSize=args.batch,
                     ngf=args.ngf, ndf=args.ndf)
    mesh = create_mesh()
    axis = cfg.data_axis
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))

    # Params/optimizer state: identical init on every process, replicated.
    state = init_train_state(cfg, jax.random.PRNGKey(1))
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state)

    step = build_dp_train_step(cfg, mesh)
    b, hw = cfg.step_batch, cfg.train_size
    rng = np.random.RandomState(0)
    out = {}
    for i in range(args.steps):
        # The honest per-host feed: draw the GLOBAL batch deterministically,
        # materialize only this host's slice, assemble the global array.
        full = rng.rand(b, cfg.nc, hw, hw).astype(np.float32)
        local = full[local_batch_slice(b)]
        hr = jax.make_array_from_process_local_data(
            batched, local, global_shape=full.shape)
        state, m = step(state, hr)
        out = {k: float(v) for k, v in m.items()}
    print(json.dumps({"process": jax.process_index(),
                      "procs": args.procs, **out}), flush=True)


if __name__ == "__main__":
    main()

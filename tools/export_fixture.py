#!/usr/bin/env python3
"""Export a selection winner's checkpoint as a committed fixture npz.

Fixtures carry only the generator `params` and `state` branches (what the
fixture-quality tests and demo tools load); the optimizer moments are
training state, not part of the artifact. `--branch ema` promotes the EMA
branch into `params` — fixture consumers always read `params`, so the
chosen branch is decided once here, at export (PARITY.md records which).

Usage:
  python tools/export_fixture.py --ckpt checkpoints_gp/dcgan-sr-tpu_35_net_G.npz \
      --out fixtures/graypatch_textured_net_G.npz [--branch ema]

Pure-numpy (no jax): safe to run next to a live TPU client.
"""

import argparse

import numpy as np


def export(ckpt, out, branch="raw"):
    data = np.load(ckpt)
    src_prefix = "_ema_/" if branch == "ema" else "_params_/"
    if branch == "ema" and not any(k.startswith("_ema_/") for k in data.files):
        raise SystemExit(f"{ckpt} has no EMA branch (saved without --g-ema)")
    tree = {}
    for k in data.files:
        if k.startswith(src_prefix):
            tree["_params_/" + k[len(src_prefix):]] = data[k]
        elif k.startswith("_state_/"):
            tree[k] = data[k]
    np.savez(out, __branches__=np.array(["params", "state"]), **tree)
    n_p = sum(1 for k in tree if k.startswith("_params_/"))
    n_s = sum(1 for k in tree if k.startswith("_state_/"))
    print(f"{out}: {n_p} param + {n_s} state arrays from {branch} branch of {ckpt}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="…_net_G.npz checkpoint")
    ap.add_argument("--out", required=True, help="fixture npz path")
    ap.add_argument("--branch", choices=("raw", "ema"), default="raw")
    args = ap.parse_args()
    export(args.ckpt, args.out, args.branch)


if __name__ == "__main__":
    main()

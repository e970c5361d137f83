"""Checkpoint / resume.

The reference's `torch.save('checkpoints/<name>_<epoch>_net_G.t7', ...)` is
committed but disabled (train.lua:297-299); the rebuild makes per-epoch
checkpoints of G/D params AND both Adam states real, with resume (SURVEY.md §5
checkpoint row).  Format: a single .npz of flattened pytree leaves keyed by
tree path — dependency-free, host-portable, and loadable without the model.
"""

from __future__ import annotations

import os
import re

import jax
import numpy as np

from .step import TrainState

_SAFE = re.compile(r"[^A-Za-z0-9_.-]+")


def _key(path):
    """Npz key for a tree path — the ON-DISK checkpoint key format; every
    save/load site must build keys through this one helper."""
    return "/".join(_SAFE.sub("_", str(p)) for p in path)


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {_key(path): np.asarray(leaf) for path, leaf in flat}


def checkpoint_path(directory, name, epoch, net):
    # mirrors 'checkpoints/<name>_<epoch>_net_G.t7' naming
    return os.path.join(directory, f"{name}_{epoch}_net_{net}.npz")


def npz_branches(data):
    """Branch names ('params'/'state'/'opt'/'ema') present in a saved net npz.

    Prefers the explicit `__branches__` manifest (written since round 3);
    falls back to sniffing the flatten-path prefixes for older checkpoints."""
    if "__branches__" in getattr(data, "files", ()):
        return {str(b) for b in data["__branches__"]}
    return {m.group(1) for k in data.files
            if (m := re.match(r"_([A-Za-z0-9]+)_", k))}


def load_branch(data, key, template):
    """Restore ONE branch of a saved net npz into `template`'s tree structure
    (float32 leaves). `data` is an open np.load handle."""
    flat, treedef = jax.tree_util.tree_flatten_with_path({key: template})
    new = [np.asarray(data[_key(path)], np.float32) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, new)[key]


def save_checkpoint(directory, name, epoch, state: TrainState):
    """Atomic per-net npz saves: each file is written to a same-directory
    `.tmp` and `os.replace`d into place, so a process killed mid-save can
    never leave a truncated `.npz` (a torn save used to crash any later
    `np.load` — e.g. checkpoint ranking); at worst a stray `.tmp` remains,
    which `latest_epoch` (anchored on `.npz$`) and every loader ignore."""
    os.makedirs(directory, exist_ok=True)
    g = {"params": state.g_params, "state": state.g_state, "opt": state.g_opt}
    if state.g_ema_params is not None:
        g["ema"] = state.g_ema_params
    d = {"params": state.d_params, "state": state.d_state, "opt": state.d_opt}
    for net, tree in (("G", g), ("D", d)):
        path = checkpoint_path(directory, name, epoch, net)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, __branches__=np.array(sorted(tree)),
                     **_flatten_with_paths(tree))
        os.replace(tmp, path)
    return epoch


def load_checkpoint(directory, name, epoch, template: TrainState,
                    seed_missing_ema=False) -> TrainState:
    """Restore into the (freshly initialized) template's tree structure.

    If the template carries an EMA branch but the npz was saved without one,
    the default is a clear error: callers that *score* the EMA branch (e.g.
    tools/select_checkpoint.py --ema) must not silently rank raw params
    labeled as EMA. Resume call sites pass seed_missing_ema=True to seed the
    EMA from the loaded params and keep smoothing from there."""
    new = {}
    g_tmpl = {"params": template.g_params, "state": template.g_state,
              "opt": template.g_opt}
    if template.g_ema_params is not None:
        g_tmpl["ema"] = template.g_ema_params
    seed_ema = False
    for net, tree in (("G", g_tmpl),
                      ("D", {"params": template.d_params,
                             "state": template.d_state,
                             "opt": template.d_opt})):
        data = np.load(checkpoint_path(directory, name, epoch, net))
        if net == "G" and "ema" in tree and "ema" not in npz_branches(data):
            if not seed_missing_ema:
                raise ValueError(
                    f"checkpoint {checkpoint_path(directory, name, epoch, net)} "
                    "has no EMA branch (saved without --g-ema); pass "
                    "seed_missing_ema=True to seed the EMA from the loaded "
                    "params (resume), or load/score the raw branch instead")
            print("checkpoint has no EMA branch; seeding g_ema_params from "
                  "the loaded generator params")
            tree = {k: v for k, v in tree.items() if k != "ema"}
            seed_ema = True
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in flat:
            key = _key(path)
            arr = data[key]
            if arr.shape != np.shape(leaf):
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{arr.shape} vs {np.shape(leaf)}")
            leaves.append(arr.astype(np.asarray(leaf).dtype))
        new[net] = jax.tree_util.tree_unflatten(treedef, leaves)
    ema = new["G"].get("ema")
    if ema is None and seed_ema:
        ema = jax.tree_util.tree_map(np.copy, new["G"]["params"])
    return TrainState(
        g_params=new["G"]["params"], g_state=new["G"]["state"], g_opt=new["G"]["opt"],
        d_params=new["D"]["params"], d_state=new["D"]["state"], d_opt=new["D"]["opt"],
        g_ema_params=ema,
    )


def latest_epoch(directory, name):
    if not os.path.isdir(directory):
        return None
    pat = re.compile(re.escape(name) + r"_(\d+)_net_G\.npz$")
    epochs = [int(m.group(1)) for f in os.listdir(directory)
              if (m := pat.match(f))]
    return max(epochs) if epochs else None


# ---- orbax backend (optional): async, multi-host-aware checkpoints ---------

def save_checkpoint_orbax(directory, name, epoch, state: TrainState):
    """Orbax/tensorstore backend — the production path for pod-scale runs
    (npz above stays the dependency-free default)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"{name}_orbax_{epoch}"))
    tree = {
        "g_params": state.g_params, "g_state": state.g_state,
        "g_opt": state.g_opt, "d_params": state.d_params,
        "d_state": state.d_state, "d_opt": state.d_opt,
    }
    if state.g_ema_params is not None:
        tree["g_ema"] = state.g_ema_params
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def load_checkpoint_orbax(directory, name, epoch, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"{name}_orbax_{epoch}"))
    tmpl = {
        "g_params": template.g_params, "g_state": template.g_state,
        "g_opt": template.g_opt, "d_params": template.d_params,
        "d_state": template.d_state, "d_opt": template.d_opt,
    }
    if template.g_ema_params is not None:
        tmpl["g_ema"] = template.g_ema_params
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, tmpl)
    return TrainState(
        g_params=restored["g_params"], g_state=restored["g_state"],
        g_opt=restored["g_opt"], d_params=restored["d_params"],
        d_state=restored["d_state"], d_opt=restored["d_opt"],
        g_ema_params=restored.get("g_ema"),
    )

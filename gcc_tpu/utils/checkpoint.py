"""Checkpointing: params + state + cfg in a single msgpack file.

Keeps the reference's checkpoint *contract* (models/Pix2Pix.py:636-658):
a mapping with network entries ('G', 'D' or 'G_A'/'G_B'/'D_A'/'D_B'),
'epoch', 'cfg' = (filter_cfgs, channel_cfgs), and the best-metric value —
so eval can rebuild the pruned topology from the checkpoint alone
(test.py:140-151). Unlike the reference we also store optimizer state when
asked, enabling true resume (the reference cannot resume, SURVEY.md §5).

Filenames follow the reference: model_<epoch>.ckpt / model_best_<dir>.ckpt.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from flax import serialization


def _to_numpy(tree):
    """numpy-ify leaves; tuples become lists (msgpack has no tuple type)."""
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if tree is None or isinstance(tree, (int, float, str, bool, bytes)):
        return tree
    return np.asarray(tree)


def save_checkpoint(path: str, payload: dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = serialization.msgpack_serialize(_to_numpy(payload))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def ckpt_name(save_dir: str, epoch: Optional[int] = None,
              isbest: bool = False, direction: str = "AtoB") -> str:
    if isbest:
        return os.path.join(save_dir, f"model_best_{direction}.ckpt")
    return os.path.join(save_dir, f"model_{epoch}.ckpt")


def save_state(path: str, state) -> None:
    """Full training state (params + opt states + EMA + rng) for true resume
    — the reference cannot resume (no optimizer state saved, SURVEY.md §5)."""
    from flax import serialization as ser
    save_checkpoint(path, {"state": ser.to_state_dict(state)})


def load_state(path: str, template):
    """Restore a full state onto a freshly-initialized template (preserves
    optax NamedTuple structure, which raw msgpack cannot carry)."""
    from flax import serialization as ser
    payload = load_checkpoint(path)
    return ser.from_state_dict(template, payload["state"])


def combine_best_models(best_AtoB: dict, best_BtoA: dict) -> dict:
    """CycleGAN per-direction best merge (utils/util.py:305-332): G_A/D_A
    from the best-AtoB checkpoint, G_B/D_B from the best-BtoA one."""
    out = dict(best_AtoB)
    out["G_B"] = best_BtoA["G_B"]
    out["D_B"] = best_BtoA["D_B"]
    return out


def restore_cfg(ckpt: dict):
    """cfg tuple from a checkpoint; msgpack round-trips tuples as lists."""
    cfg = ckpt.get("cfg")
    if cfg is None:
        return (None, None)
    a, b = cfg
    to_list = lambda v: None if v is None else [int(x) for x in v]
    return (to_list(a), to_list(b))

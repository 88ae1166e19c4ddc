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

# Bumped whenever the on-disk layout changes incompatibly. Files written
# before versioning existed carry no marker and load as version 0 (the
# current layout — nothing has changed yet, only the marker is new).
SCHEMA_VERSION = 1
_SCHEMA_KEY = "__gcc_tpu_schema__"


class CheckpointError(RuntimeError):
    """Actionable checkpoint failure (corrupt/truncated/version-mismatched)."""


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
    """Atomic, versioned save: write to a temp file, fsync, then rename.

    A SIGKILL/power-loss mid-write leaves either the old file or nothing —
    never a torn checkpoint under the final name (the preemption handler in
    cli/train.py relies on this)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    body = dict(_to_numpy(payload))
    body[_SCHEMA_KEY] = SCHEMA_VERSION
    data = serialization.msgpack_serialize(body)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_checkpoint(path: str) -> dict:
    """Load + validate. Raises CheckpointError (not a raw msgpack error) on
    truncated/corrupt files or a schema newer than this build understands."""
    try:
        with open(path, "rb") as f:
            raw = f.read()
    except FileNotFoundError:
        raise CheckpointError(
            f"checkpoint not found: {path}"
        ) from None
    if not raw:
        raise CheckpointError(
            f"checkpoint {path} is empty (0 bytes) — likely a torn write from "
            "an interrupted save; fall back to the previous epoch's checkpoint."
        )
    try:
        ckpt = serialization.msgpack_restore(raw)
    except Exception as e:
        raise CheckpointError(
            f"checkpoint {path} is corrupt or truncated ({type(e).__name__}: {e}). "
            "If this was written during a preemption/crash, use the previous "
            "epoch's model_<N>.ckpt instead."
        ) from e
    if not isinstance(ckpt, dict):
        raise CheckpointError(
            f"checkpoint {path} does not contain a mapping "
            f"(got {type(ckpt).__name__}) — not a GCC-TPU checkpoint."
        )
    version = ckpt.pop(_SCHEMA_KEY, 0)
    if version > SCHEMA_VERSION:
        raise CheckpointError(
            f"checkpoint {path} has schema version {version}, but this build "
            f"only understands <= {SCHEMA_VERSION}. Upgrade gcc_tpu or re-export "
            "the checkpoint with `python -m gcc_tpu.cli.convert`."
        )
    return ckpt


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
    if "state" not in payload:
        raise CheckpointError(
            f"{path} is a model checkpoint (G/D/cfg), not a full-state resume "
            "checkpoint — point --continue_train at a state_*.ckpt file."
        )
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

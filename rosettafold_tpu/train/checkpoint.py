"""Checkpoint save/restore (orbax-backed, msgpack fallback).

The reference's checkpoint story is nominal only (Lightning base class with
nothing configured; SURVEY.md §5). Here: full pytree save/restore for params and
optimizer state, usable for train-resume and for publishing inference weights.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, pytree: Any) -> None:
    """Save a pytree checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, pytree, force=True)
        ckptr.wait_until_finished()
    except Exception:
        # msgpack fallback (flax serialization), single file inside the dir
        os.makedirs(path, exist_ok=True)
        from flax import serialization

        with open(os.path.join(path, "checkpoint.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(pytree))


def restore(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint. `target` (a pytree of like-shaped arrays) guides
    structure/dtype; required for the msgpack fallback."""
    path = os.path.abspath(path)
    msgpack_file = os.path.join(path, "checkpoint.msgpack")
    if os.path.exists(msgpack_file):
        from flax import serialization

        assert target is not None, "msgpack restore requires a target pytree"
        with open(msgpack_file, "rb") as f:
            return serialization.from_bytes(target, f.read())

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape")
            else x,
            target,
        )
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)

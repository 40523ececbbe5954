"""Checkpoint save/restore (orbax-backed, msgpack fallback).

The reference's checkpoint story is nominal only (Lightning base class with
nothing configured; SURVEY.md §5). Here: full pytree save/restore for params and
optimizer state, usable for train-resume and for publishing inference weights.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

# one long-lived checkpointer so async saves share a background thread pool
# and wait_until_finished() has something to join
_CKPTR = None


def _checkpointer():
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        # StandardCheckpointer is an AsyncCheckpointer: save() returns after
        # the device->host copy; serialization runs on a background thread
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_until_finished() -> None:
    """Block until every in-flight async save has committed to disk."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save(path: str, pytree: Any, *, async_: bool = False) -> None:
    """Save a pytree checkpoint to `path` (a directory).

    async_=True returns as soon as the device->host copy is done (orbax's
    async path): training resumes while serialization/fsync runs on a
    background thread — the pod-scale pattern where a multi-GB state would
    otherwise stall every chip for seconds. Call wait_until_finished()
    (or a later sync save) before reading the checkpoint back.
    """
    path = os.path.abspath(path)
    try:
        ckptr = _checkpointer()
        # join any still-running previous save first: repeated saves target
        # the same 'latest' dir, and overlapping commits to one path race.
        # By the next ckpt_every-step save the old one is long done, so this
        # wait is ~free; the overlap happens during the training steps.
        ckptr.wait_until_finished()
        ckptr.save(path, pytree, force=True)
        if not async_:
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
    # an async save to this path may still be committing on the background
    # thread; join it so we never read a half-written directory
    wait_until_finished()
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

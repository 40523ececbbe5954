"""Training loop driver: fit() over a batch iterator with checkpointing/logging.

The Lightning-Trainer-shaped capability the reference only gestures at
(pl.LightningModule base with empty hooks, rosettafold_pytorch.py:1175,1291-1298),
done functionally: one jit-compiled train step, optional ('dp','sp') mesh,
periodic metric logging and orbax checkpoints, resume from the latest checkpoint.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

from ..config import RoseTTAFoldConfig
from ..parallel.mesh import make_mesh, replicated, shard_batch, shard_params
from . import checkpoint as ckpt
from .step import TrainState, create_train_state, make_train_step


def fit(
    config: RoseTTAFoldConfig,
    data: Iterator[dict],
    steps: int,
    *,
    seed: int = 0,
    learning_rate: float = 1e-3,
    ckpt_dir: Optional[str] = None,
    ckpt_every: int = 500,
    log_every: int = 50,
    n_devices: Optional[int] = None,
    sp: int = 1,
    tp: int = 1,
    accum_steps: int = 1,
    moment_dtype: str = "float32",
    log_fn=print,
) -> TrainState:
    """Run `steps` optimizer updates; returns the final TrainState."""
    rng = jax.random.PRNGKey(seed)
    mesh = (make_mesh(n_devices, sp=sp, tp=tp)
            if (n_devices and n_devices > 1) else None)

    def to_model_batch(raw):
        b = {k: jnp.asarray(v) for k, v in raw.items()}
        return shard_batch(mesh, b) if mesh is not None else b

    with jax.set_mesh(mesh) if mesh is not None else contextlib.nullcontext():
        batch = to_model_batch(next(data))
        state = create_train_state(config, rng, batch, learning_rate,
                                   accum_steps=accum_steps,
                                   moment_dtype=moment_dtype)
        start_step = 0
        if ckpt_dir and os.path.exists(os.path.join(ckpt_dir, "latest")):
            state = ckpt.restore(os.path.join(ckpt_dir, "latest"), target=state)
            start_step = int(state.step)
            log_fn(f"resumed from step {start_step}")
        if mesh is not None:
            if tp > 1:
                # Megatron layout: attention/FF kernels shard over 'tp' (the
                # optax moment trees mirror the param structure, so the same
                # name-matched rule lays them out identically)
                state = shard_params(state, mesh)
            else:
                state = jax.device_put(state, replicated(mesh))

        step_fn = make_train_step(config, donate=True)
        t0 = time.perf_counter()
        for i in range(start_step, steps):
            if i > start_step:
                batch = to_model_batch(next(data))
            state, metrics = step_fn(state, batch, rng)
            if log_every and (i + 1) % log_every == 0:
                dt = (time.perf_counter() - t0) / log_every
                t0 = time.perf_counter()
                log_fn(
                    f"step {i + 1}/{steps} loss={float(metrics['total']):.4f} "
                    f"drmsd={float(metrics['drmsd']):.3f} "
                    f"grad={float(metrics['grad_norm']):.2f} {dt * 1e3:.0f} ms/step"
                )
            if ckpt_dir and (i + 1) % ckpt_every == 0:
                # async: training continues while the background thread
                # serializes; the final sync save below joins everything
                ckpt.save(os.path.join(ckpt_dir, "latest"), state,
                          async_=True)
        if ckpt_dir:
            ckpt.save(os.path.join(ckpt_dir, "latest"), state)
        return state

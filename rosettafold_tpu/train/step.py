"""Training step: optimizer state, jitted/sharded update, eval step.

A thin functional train loop replacing the reference's empty Lightning hooks
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1291-1298). The step
is a single pjit-compiled function; under a mesh, inputs arrive batch-sharded
(parallel/mesh.py) and XLA emits the gradient all-reduce across 'dp'/'sp'.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ..config import RoseTTAFoldConfig
from ..models.rosettafold import RoseTTAFold
from .losses import rosettafold_loss


class TrainState(train_state.TrainState):
    """flax TrainState; dropout rng folded from the step counter per update."""


def create_train_state(
    config: RoseTTAFoldConfig,
    rng: jax.Array,
    sample_batch: Dict[str, jnp.ndarray],
    learning_rate: float = 1e-3,
    weight_decay: float = 1e-4,
    grad_clip: float = 1.0,
    accum_steps: int = 1,
    moment_dtype: str = "float32",
) -> TrainState:
    """accum_steps > 1: optax.MultiSteps gradient accumulation (an effective
    batch of accum_steps microbatches per optimizer update — the single-chip
    answer to config-5's bsz=4 when B=4 exceeds HBM). moment_dtype="bfloat16"
    halves the Adam first-moment memory (mu_dtype)."""
    model = RoseTTAFold(config=config)
    params = jax.jit(model.init)(
        rng, sample_batch["msa"], sample_batch["seq"], sample_batch["aa_idx"]
    )["params"]
    mu_dtype = jnp.bfloat16 if moment_dtype == "bfloat16" else None
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(learning_rate, weight_decay=weight_decay, mu_dtype=mu_dtype),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def make_train_step(config: RoseTTAFoldConfig, donate: bool = True):
    """Returns a jitted train_step(state, batch, rng) -> (state, metrics).

    batch: {"msa": (B,N,L) int, "seq": (B,L) int, "aa_idx": (B,L) int,
            "xyz": (B,L,3,3) float true coords,
            "mask": (B,L) optional bool/float valid-residue mask}.
    """
    model = RoseTTAFold(config=config)

    def loss_fn(params, batch, rng):
        outputs = model.apply(
            {"params": params},
            batch["msa"],
            batch["seq"],
            batch["aa_idx"],
            deterministic=False,
            rngs={"dropout": rng},
        )
        return rosettafold_loss(outputs, batch["xyz"], residue_mask=batch.get("mask"))

    def train_step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, Any]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return state.apply_gradients(grads=grads), metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(config: RoseTTAFoldConfig):
    model = RoseTTAFold(config=config)

    def eval_step(params, batch):
        outputs = model.apply(
            {"params": params}, batch["msa"], batch["seq"], batch["aa_idx"]
        )
        _, metrics = rosettafold_loss(outputs, batch["xyz"], residue_mask=batch.get("mask"))
        return metrics

    return jax.jit(eval_step)


def make_forward(config: RoseTTAFoldConfig):
    """Jitted inference forward: (params, msa, seq, aa_idx) -> (logits, xyz, plddt)."""
    model = RoseTTAFold(config=config)

    @jax.jit
    def forward(params, msa, seq, aa_idx):
        return model.apply({"params": params}, msa, seq, aa_idx)

    return forward

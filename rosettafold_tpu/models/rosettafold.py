"""The three-track RoseTTAFold model: blocks and top-level API.

Re-design of /root/reference/rosettafold_pytorch/rosettafold_pytorch.py:923-1298.
Public contract (reference :1273-1289): apply(params, msa, seq, aa_idx) ->
(logits{theta,phi,omega,dist}, xyz, plddt) with
  msa (B, N, L) int tokens, seq (B, L) int, aa_idx (B, L) int,
  logits[*] (B, L, L, bins), xyz (B, L, 3, 3), plddt (B, L).

Block hyperparameters are hardwired exactly like the reference: 12 tied/MSA
heads, d_proj=32, 8 axial heads, 4 pair->MSA heads, distance bins [8,12,16,20],
per-block n_neighbors with the final block fixed at 32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import RoseTTAFoldConfig
from .embeddings import MsaEmbedding, PairEmbedding
from .heads import PredictionHead
from .msa import (
    MsaUpdateUsingSelfAttention,
    MsaUpdateWithPair,
    MsaUpdateWithPairAndCoord,
)
from .pair import PairUpdateWithAxialAttention, PairUpdateWithMsa
from .structure import CoordUpdateWithMsaAndPair, InitialCoordGenerationWithMsaAndPair


class TwoTrackBlock(nn.Module):
    """MSA self-att -> pair-from-MSA -> pair axial att -> MSA-from-pair
    (reference :923-968)."""

    d_msa: int
    d_pair: int
    n_encoder_layers: int
    p_dropout: float = 0.1
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    long_chunk: Optional[int] = None
    conv_chunk: Optional[int] = None  # row-chunked pair convs (long-L inference)
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, deterministic: bool = True):
        msa, att = MsaUpdateUsingSelfAttention(
            d_msa=self.d_msa,
            d_ff=self.d_msa * 4,
            n_heads=12,
            p_dropout=self.p_dropout,
            n_encoder_layers=self.n_encoder_layers,
            feature_seed=self.feature_seed,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="msa_update_using_self_att",
        )(msa, deterministic=deterministic)
        pair = PairUpdateWithMsa(
            d_msa=self.d_msa,
            d_proj=32,
            d_pair=self.d_pair,
            n_heads=12,
            long_chunk=self.long_chunk,
            attn_impl=self.attn_impl,
            row_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="pair_update_with_msa",
        )(msa, pair, att, deterministic=deterministic)
        pair = PairUpdateWithAxialAttention(
            d_pair=self.d_pair,
            d_ff=self.d_pair * 4,
            n_heads=8,
            p_dropout=self.p_dropout,
            n_encoder_layers=self.n_encoder_layers,
            feature_seed=self.feature_seed + 100,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            long_chunk=self.long_chunk,
            ff_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="pair_update_with_axial_attention",
        )(pair, deterministic=deterministic)
        msa = MsaUpdateWithPair(
            d_msa=self.d_msa,
            d_pair=self.d_pair,
            n_heads=4,
            n_encoder_layers=self.n_encoder_layers,
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            name="msa_update_with_pair",
        )(msa, pair, deterministic=deterministic)
        return msa, pair


class ThreeTrackBlock(nn.Module):
    """Two-track ops + SE(3) coordinate update + structure->MSA feedback
    (reference :971-1046)."""

    d_msa: int
    d_pair: int
    d_node: int
    d_edge: int
    d_state: int
    n_encoder_layers: int
    n_neighbors: int
    p_dropout: float = 0.1
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    se3_impl: str = "dense"
    se3_bucket_capacity: Any = None
    knn_exclude_self: bool = True
    long_chunk: Optional[int] = None
    conv_chunk: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, xyz, seq_onehot, aa_idx, deterministic: bool = True,
                 k_dynamic=None):
        msa, pair = TwoTrackBlock(
            self.d_msa,
            self.d_pair,
            self.n_encoder_layers,
            self.p_dropout,
            feature_seed=self.feature_seed,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            long_chunk=self.long_chunk,
            conv_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="two_track",
        )(msa, pair, deterministic=deterministic)

        state, xyz = CoordUpdateWithMsaAndPair(
            d_msa=self.d_msa,
            d_pair=self.d_pair,
            d_node=self.d_node,
            d_edge=self.d_edge,
            d_state=self.d_state,
            n_neighbors=self.n_neighbors,
            p_dropout=self.p_dropout,
            se3_impl=self.se3_impl,
            bucket_capacity=self.se3_bucket_capacity,
            knn_exclude_self=self.knn_exclude_self,
            attn_impl=self.attn_impl,
            name="coord_update_with_msa_and_pair",
        )(xyz, msa, pair, aa_idx, seq_onehot, deterministic=deterministic,
          k_dynamic=k_dynamic)

        msa = MsaUpdateWithPairAndCoord(
            d_msa=self.d_msa,
            d_state=self.d_state,
            d_trfm_inner=32,
            d_ff=self.d_msa * 4,
            distance_bins=(8, 12, 16, 20),
            p_dropout=self.p_dropout,
            dtype=self.dtype,
            name="msa_update_with_pair_and_coord",
        )(xyz, state, msa, deterministic=deterministic)

        return msa, pair, xyz


class FinalBlock(nn.Module):
    """ThreeTrackBlock minus the structure->MSA feedback, plus the plDDT head
    (reference :1049-1127). n_neighbors fixed at 32 by the caller."""

    d_msa: int
    d_pair: int
    d_node: int
    d_edge: int
    d_state: int
    n_encoder_layers: int
    n_neighbors: int = 32
    p_dropout: float = 0.1
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    se3_impl: str = "dense"
    se3_bucket_capacity: Any = None
    knn_exclude_self: bool = True
    long_chunk: Optional[int] = None
    conv_chunk: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, xyz, seq_onehot, aa_idx, deterministic: bool = True):
        msa, pair = TwoTrackBlock(
            self.d_msa,
            self.d_pair,
            self.n_encoder_layers,
            self.p_dropout,
            feature_seed=self.feature_seed,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            long_chunk=self.long_chunk,
            conv_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="two_track",
        )(msa, pair, deterministic=deterministic)

        state, xyz = CoordUpdateWithMsaAndPair(
            d_msa=self.d_msa,
            d_pair=self.d_pair,
            d_node=self.d_node,
            d_edge=self.d_edge,
            d_state=self.d_state,
            n_neighbors=self.n_neighbors,
            p_dropout=self.p_dropout,
            se3_impl=self.se3_impl,
            bucket_capacity=self.se3_bucket_capacity,
            knn_exclude_self=self.knn_exclude_self,
            attn_impl=self.attn_impl,
            name="coord_update_with_msa_and_pair",
        )(xyz, msa, pair, aa_idx, seq_onehot, deterministic=deterministic)

        plddt = nn.Dense(1, name="plddt_head")(state)[..., 0]  # (B, L)
        return msa, pair, xyz, plddt


class _ScannedTwoTrack(nn.Module):
    """nn.scan body for the two-track stack (scan_blocks=True): one trace for
    all blocks, stacked params. Performer feature projections are shared
    across scanned blocks (documented divergence from the per-block seeds of
    the unscanned path — scan mode is a compile-time/perf mode, the unscanned
    path is the parity mode)."""

    d_msa: int
    d_pair: int
    n_encoder_layers: int
    p_dropout: float
    performer_dim_head: int
    attn_impl: str
    long_chunk: Any
    conv_chunk: Any
    dtype: Any
    deterministic: bool
    shard_pair_flag: bool

    @nn.compact
    def __call__(self, carry, _):
        msa, pair = carry
        msa, pair = TwoTrackBlock(
            self.d_msa,
            self.d_pair,
            self.n_encoder_layers,
            self.p_dropout,
            feature_seed=42,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            long_chunk=self.long_chunk,
            conv_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="block",
        )(msa, pair, self.deterministic)
        if self.shard_pair_flag:
            from ..parallel.mesh import shard_pair_constraint

            pair = shard_pair_constraint(pair)
        return (msa, pair), None


class _ScannedThreeTrack(nn.Module):
    """nn.scan body for the three-track stack; the per-block neighbor budget
    arrives as the scanned input k (top-k computed at the static max K and
    masked down per block)."""

    d_msa: int
    d_pair: int
    d_node: int
    d_edge: int
    d_state: int
    n_encoder_layers: int
    n_neighbors_max: int
    p_dropout: float
    performer_dim_head: int
    attn_impl: str
    se3_impl: str
    se3_bucket_capacity: Any
    knn_exclude_self: bool
    long_chunk: Any
    conv_chunk: Any
    dtype: Any
    deterministic: bool
    shard_pair_flag: bool

    @nn.compact
    def __call__(self, carry, k, seq_onehot, aa_idx):
        msa, pair, xyz = carry
        msa, pair, xyz = ThreeTrackBlock(
            self.d_msa,
            self.d_pair,
            self.d_node,
            self.d_edge,
            self.d_state,
            self.n_encoder_layers,
            n_neighbors=self.n_neighbors_max,
            p_dropout=self.p_dropout,
            feature_seed=1042,
            performer_dim_head=self.performer_dim_head,
            attn_impl=self.attn_impl,
            se3_impl=self.se3_impl,
            se3_bucket_capacity=self.se3_bucket_capacity,
            knn_exclude_self=self.knn_exclude_self,
            long_chunk=self.long_chunk,
            conv_chunk=self.conv_chunk,
            dtype=self.dtype,
            name="block",
        )(msa, pair, xyz, seq_onehot, aa_idx, self.deterministic, k_dynamic=k)
        if self.shard_pair_flag:
            from ..parallel.mesh import shard_pair_constraint

            pair = shard_pair_constraint(pair)
        return (msa, pair, xyz), None


class RoseTTAFold(nn.Module):
    """Top-level three-track model (reference :1175-1289).

    Construct from a RoseTTAFoldConfig:
        model = RoseTTAFold(config=RoseTTAFoldConfig())
        params = model.init(rng, msa, seq, aa_idx)
        logits, xyz, plddt = model.apply(params, msa, seq, aa_idx)
    """

    config: RoseTTAFoldConfig

    @nn.compact
    def __call__(
        self,
        msa,
        seq,
        aa_idx,
        template: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[dict, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

        if cfg.remat:
            # deterministic flag stays static (last positional arg)
            two_track_cls = nn.remat(TwoTrackBlock, static_argnums=(3,))
            three_track_cls = nn.remat(ThreeTrackBlock, static_argnums=(6,))
            final_cls = nn.remat(FinalBlock, static_argnums=(6,))
            init_cls = nn.remat(InitialCoordGenerationWithMsaAndPair, static_argnums=(5,))
            head_cls = nn.remat(PredictionHead, static_argnums=(2,))
        else:
            two_track_cls, three_track_cls = TwoTrackBlock, ThreeTrackBlock
            final_cls = FinalBlock
            init_cls = InitialCoordGenerationWithMsaAndPair
            head_cls = PredictionHead

        def shard_pair(p):
            if not cfg.shard_pair:
                return p
            from ..parallel.mesh import shard_pair_constraint

            return shard_pair_constraint(p)

        msa_emb = MsaEmbedding(
            d_input=cfg.d_input,
            d_msa=cfg.d_msa,
            max_len=cfg.max_len,
            p_pe_drop=cfg.p_dropout,
            name="msa_emb",
        )(msa, aa_idx, deterministic=deterministic)

        pair = PairEmbedding(
            d_input=cfg.d_input,
            d_pair=cfg.d_pair,
            max_len=cfg.max_len,
            p_pe_drop=cfg.p_dropout,
            use_template=cfg.use_template,
            d_template=cfg.d_template,
            name="pair_emb",
        )(seq, aa_idx, template, deterministic=deterministic)

        seq_onehot = jax.nn.one_hot(seq, cfg.d_input, dtype=msa_emb.dtype)
        if dtype is not None:
            # bf16 pair residual stream (profiles/l1024_r3: the f32 stream is
            # ~1.1 s/forward of elementwise traffic at L=1024)
            pair = pair.astype(dtype)
        pair = shard_pair(pair)

        x = msa_emb
        if cfg.scan_blocks:
            body = _ScannedTwoTrack
            if cfg.remat:
                body = nn.remat(body)
            scan_tt = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=cfg.n_two_track_blocks,
            )(
                cfg.d_msa,
                cfg.d_pair,
                cfg.n_encoder_layers,
                cfg.p_dropout,
                cfg.performer.dim_head,
                cfg.attn_impl,
                cfg.long_chunk,
                cfg.head_chunk,
                dtype,
                deterministic,
                cfg.shard_pair,
                name="two_track_scan",
            )
            (x, pair), _ = scan_tt((x, pair), None)
        else:
            for i in range(cfg.n_two_track_blocks):
                x, pair = two_track_cls(
                    cfg.d_msa,
                    cfg.d_pair,
                    cfg.n_encoder_layers,
                    cfg.p_dropout,
                    feature_seed=42 + 1000 * i,
                    performer_dim_head=cfg.performer.dim_head,
                    attn_impl=cfg.attn_impl,
                    long_chunk=cfg.long_chunk,
                    conv_chunk=cfg.head_chunk,
                    dtype=dtype,
                    name=f"two_track_{i}",
                )(x, pair, deterministic)
                pair = shard_pair(pair)

        xyz = init_cls(
            d_msa=cfg.d_msa,
            d_pair=cfg.d_pair,
            d_node=cfg.d_node,
            d_edge=cfg.d_edge,
            n_heads=4,
            n_layers=4,
            p_dropout=cfg.p_dropout,
            dtype=dtype,
            name="initial_coords",
        )(x, pair, seq_onehot, aa_idx, deterministic)

        n_tt = cfg.n_three_track_blocks - 1
        if cfg.scan_blocks and n_tt > 0:
            ks = jnp.asarray([cfg.n_neighbors[i] for i in range(n_tt)], jnp.int32)
            body3 = _ScannedThreeTrack
            if cfg.remat:
                body3 = nn.remat(body3)
            scan_3t = nn.scan(
                body3,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(0, nn.broadcast, nn.broadcast),
                length=n_tt,
            )(
                cfg.d_msa,
                cfg.d_pair,
                cfg.d_node,
                cfg.d_edge,
                cfg.d_state,
                cfg.n_encoder_layers,
                max(cfg.n_neighbors[:n_tt]),
                cfg.p_dropout,
                cfg.performer.dim_head,
                cfg.attn_impl,
                cfg.se3_impl,
                cfg.se3_bucket_capacity,
                cfg.knn_exclude_self,
                cfg.long_chunk,
                cfg.head_chunk,
                dtype,
                deterministic,
                cfg.shard_pair,
                name="three_track_scan",
            )
            (x, pair, xyz), _ = scan_3t((x, pair, xyz), ks, seq_onehot, aa_idx)
        else:
            for i in range(n_tt):
                x, pair, xyz = three_track_cls(
                    cfg.d_msa,
                    cfg.d_pair,
                    cfg.d_node,
                    cfg.d_edge,
                    cfg.d_state,
                    cfg.n_encoder_layers,
                    n_neighbors=cfg.n_neighbors[i],
                    p_dropout=cfg.p_dropout,
                    feature_seed=42 + 1000 * (cfg.n_two_track_blocks + i),
                    performer_dim_head=cfg.performer.dim_head,
                    attn_impl=cfg.attn_impl,
                    se3_impl=cfg.se3_impl,
                    se3_bucket_capacity=cfg.se3_bucket_capacity,
                    knn_exclude_self=cfg.knn_exclude_self,
                    long_chunk=cfg.long_chunk,
                    conv_chunk=cfg.head_chunk,
                    dtype=dtype,
                    name=f"three_track_{i}",
                )(x, pair, xyz, seq_onehot, aa_idx, deterministic)
                pair = shard_pair(pair)

        x, pair, xyz, plddt = final_cls(
            cfg.d_msa,
            cfg.d_pair,
            cfg.d_node,
            cfg.d_edge,
            cfg.d_state,
            cfg.n_encoder_layers,
            n_neighbors=32,
            p_dropout=cfg.p_dropout,
            feature_seed=42 + 9000,
            performer_dim_head=cfg.performer.dim_head,
            attn_impl=cfg.attn_impl,
            se3_impl=cfg.se3_impl,
            se3_bucket_capacity=cfg.se3_bucket_capacity,
            knn_exclude_self=cfg.knn_exclude_self,
            long_chunk=cfg.long_chunk,
            conv_chunk=cfg.head_chunk,
            dtype=dtype,
            name="final_block",
        )(x, pair, xyz, seq_onehot, aa_idx, deterministic)

        logits = head_cls(
            in_channels=cfg.d_pair,
            n_res_blocks=4,
            p_dropout=cfg.p_dropout,
            dtype=dtype,
            row_chunk=cfg.head_chunk,
            conv_impl=cfg.attn_impl,
            remat_towers=cfg.remat,
            name="prediction_head",
        )(pair, deterministic)

        # Public contract: float32 outputs regardless of the compute dtype.
        logits = {k: v.astype(jnp.float32) for k, v in logits.items()}
        return logits, xyz.astype(jnp.float32), plddt.astype(jnp.float32)

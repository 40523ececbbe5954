"""Structure-track modules: dense graph transformer, initial coordinate
generation, and the SE(3) coordinate refinement.

Re-designs of /root/reference/rosettafold_pytorch/rosettafold_pytorch.py:613-862.
The kNN graph becomes a static boolean mask (ops/knn.py); the SE(3) transformer
runs on dense masked neighborhoods (models/se3.py).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn

from .dropout import Dropout
import jax
import jax.numpy as jnp

from ..ops import knn
from .msa import PositionWiseWeightFactor
from .se3 import SE3Transformer

N_IDX, CA_IDX, C_IDX = 0, 1, 2


class GraphTransformer(nn.Module):
    """Dense graph-transformer attention with edge features in the logits and the
    values (reference :613-664)."""

    d_node_in: int
    d_node_out: int
    d_edge: int
    n_heads: int
    p_dropout: float = 0.15
    dtype: Any = None

    @nn.compact
    def __call__(self, node, edge, edge_mask=None, *, deterministic: bool = True):
        h, dh = self.n_heads, self.d_node_out
        scale = dh**-0.5
        B, L, _ = node.shape

        q = nn.Dense(dh * h, dtype=self.dtype, name="node_to_q")(node).reshape(B, L, h, dh)
        k = nn.Dense(dh * h, dtype=self.dtype, name="node_to_k")(node).reshape(B, L, h, dh)
        v = nn.Dense(dh * h, dtype=self.dtype, name="node_to_v")(node).reshape(B, L, h, dh)
        q, k, v = (jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v))

        e = nn.Dense(dh * h, use_bias=False, dtype=self.dtype, name="edge_emb")(edge)
        e = jnp.transpose(e.reshape(B, L, L, h, dh), (0, 3, 1, 2, 4))  # b h i j d

        logit = jnp.einsum("bhid,bhjd->bhij", q, k,
                           preferred_element_type=jnp.float32)
        logit = logit + jnp.einsum("bhid,bhijd->bhij", q, e,
                                   preferred_element_type=jnp.float32)
        att = logit * scale
        if edge_mask is not None:
            att = att + (1.0 - edge_mask[:, None].astype(att.dtype)) * -1e9
        att = nn.softmax(att, axis=-1).astype(v.dtype)
        att = Dropout(self.p_dropout)(att, deterministic=deterministic)

        upd = jnp.einsum("bhij,bhjd->bhid", att, v,
                         preferred_element_type=jnp.float32)
        upd = upd + jnp.einsum("bhij,bhijd->bhid", att, e,
                               preferred_element_type=jnp.float32)
        upd = jnp.transpose(upd, (0, 2, 1, 3)).reshape(B, L, h * dh)

        node_upd = nn.Dense(dh * h, dtype=self.dtype, name="node_update")(node)
        return node_upd.astype(jnp.float32) + upd


class GraphTransformerBlock(nn.Module):
    """attn -> LN -> Linear + ELU -> residual (reference :667-676)."""

    d_node_in: int
    d_node_out: int
    d_edge: int
    n_heads: int
    p_dropout: float = 0.15
    dtype: Any = None

    @nn.compact
    def __call__(self, node, edge, edge_mask=None, *, deterministic: bool = True):
        x = GraphTransformer(
            self.d_node_in, self.d_node_out, self.d_edge, self.n_heads,
            self.p_dropout, dtype=self.dtype, name="attn",
        )(node, edge, edge_mask, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = nn.elu(nn.Dense(self.d_node_in, name="to_out")(x))
        return x + node


def signed_sequence_separation(aa_idx: jnp.ndarray) -> jnp.ndarray:
    """sign(i - j) * log(|i - j| + 1) clamped to [0, 5.5] (reference :735-749).
    (The clamp zeroes the negative half — reproduced faithfully.)"""
    dist = (aa_idx[:, :, None] - aa_idx[:, None, :]).astype(jnp.float32)
    feat = jnp.sign(dist) * jnp.log(jnp.abs(dist) + 1.0)
    return jnp.clip(feat, 0.0, 5.5)[..., None]


class InitialCoordGenerationWithMsaAndPair(nn.Module):
    """Initial backbone coordinates from MSA+pair via 4 dense graph-transformer
    blocks on the fully-connected graph (reference :679-749).

    The reference keeps its blocks in a plain Python list (unregistered-params
    bug, :699-702); here they are registered modules.
    """

    d_msa: int
    d_pair: int
    d_node: int = 64
    d_edge: int = 64
    n_heads: int = 4
    n_layers: int = 4
    p_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, seq_onehot, aa_idx, deterministic: bool = True):
        msa = nn.LayerNorm(epsilon=1e-5, name="ln_msa")(msa)
        pair = nn.LayerNorm(epsilon=1e-5, name="ln_pair")(pair)

        w = PositionWiseWeightFactor(self.d_msa, 1, self.p_dropout, name="poswise")(
            msa, deterministic=deterministic
        )[:, :, 0]  # (B, N, L, 1)

        node = jnp.concatenate([jnp.sum(msa * w, axis=1), seq_onehot], axis=-1)
        node = nn.elu(nn.Dense(self.d_node, name="node_embed")(node))

        edge = jnp.concatenate([pair, signed_sequence_separation(aa_idx)], axis=-1)
        edge = nn.elu(nn.Dense(self.d_edge, name="edge_embed")(edge))

        for i in range(self.n_layers):
            node = GraphTransformerBlock(
                self.d_node, self.d_node, self.d_edge, self.n_heads,
                self.p_dropout, dtype=self.dtype, name=f"block_{i}",
            )(node, edge, None, deterministic=deterministic)

        xyz = nn.Dense(9, name="to_out")(node)
        return xyz.reshape(*xyz.shape[:2], 3, 3)  # (B, L, atom[N,CA,C], xyz)


class CoordUpdateWithMsaAndPair(nn.Module):
    """SE(3)-equivariant coordinate refinement (reference :752-862).

    Node features: position-weighted MSA sum + query one-hot; edge features:
    projected pair; neighborhoods: kNN over CA + sequence band, as a static mask.
    Type-0 input = node features; type-1 input = atom offsets from CA. The output
    type-1 is a displacement applied CA-first, then N/C relative to the new CA.
    """

    d_msa: int
    d_pair: int
    d_node: int = 64
    d_edge: int = 64
    d_state: int = 32
    n_neighbors: int = 64
    p_dropout: float = 0.1
    # "dense": exact incoming sets on an (L, L) mask (parity path, O(L^2)).
    # "scatter": EXACT src-major edge list with segment-op aggregation,
    #            O(L*S) memory - the exact long-sequence path.
    # "bucket": EXACT incoming sets bucketed into C static dst-major slots
    #           (ops/knn.knn_bucket_indices), O(L*C) memory — runs the fused
    #           Pallas SE(3) kernel on the exact edge rule; residual overflow
    #           (none on measured coordinate distributions at the default C)
    #           drops furthest edges and is sown as a diagnostic.
    # "gather": (L, S) forward-topk approximation (fastest long-seq path;
    #           divergence from the exact rule quantified in tests/test_se3.py).
    se3_impl: str = "dense"
    # "bucket" capacity C; None = min(2*K, L) + 2*(kmin-1) (covers the
    # measured reverse-kNN indegree maxima, ~2.2*K).
    bucket_capacity: Optional[int] = None
    # False = reference-exact compat (self edges kept when top-k spans all nodes,
    # rosettafold_pytorch.py:844-847); True = the repo's equivariance-safe default.
    knn_exclude_self: bool = True
    # "pallas": fused SE(3) attention kernel (ops/pallas/se3_attend.py) for
    # the dense/gather layouts; scatter keeps the XLA segment-op path.
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, xyz, msa, pair, aa_idx, seq_onehot, *,
                 deterministic: bool = True, k_dynamic=None):
        msa = nn.LayerNorm(epsilon=1e-5, name="ln_msa")(msa)
        pair = nn.LayerNorm(epsilon=1e-5, name="ln_pair")(pair)

        w = PositionWiseWeightFactor(self.d_msa, 1, self.p_dropout, name="poswise")(
            msa, deterministic=deterministic
        )[:, :, 0]

        node = jnp.concatenate([jnp.sum(msa * w, axis=1), seq_onehot], axis=-1)
        node = nn.Dense(self.d_node, name="node_embed")(node)
        node = nn.LayerNorm(epsilon=1e-5, name="node_ln")(nn.elu(node))

        edge = nn.Dense(self.d_edge, name="edge_embed")(pair)
        edge = nn.LayerNorm(epsilon=1e-5, name="edge_ln")(nn.elu(edge))  # (B,i,j,de)

        ca = xyz[:, :, CA_IDX]
        src_idx = dst_idx = None
        if self.se3_impl == "scatter":
            # EXACT src-major edge list: slot s of src i points at dst
            # idx[b,i,s] = the reference edge rule topk(i) + band (:844-852),
            # O(L*S) memory; aggregation at dst via segment ops.
            dst_idx, mask = knn.knn_gather_indices(
                xyz, aa_idx, self.n_neighbors, k_dynamic=k_dynamic
            )
            ca_dst = jax.vmap(lambda c, i: c[i])(ca, dst_idx)  # (B, I, S, 3)
            rel_pos = ca_dst - ca[:, :, None, :]  # dst - src
            edge_w = jnp.take_along_axis(edge, dst_idx[..., None], axis=2)
        elif self.se3_impl in ("gather", "bucket"):
            # (B, L, S) dst-major gathered neighborhoods: O(L*S) edge tensors.
            # "gather" fills the slots with the forward-topk approximation;
            # "bucket" fills them with the EXACT reverse-topk incoming sets
            # (capacity-bounded, overflow sown as a diagnostic).
            if self.se3_impl == "bucket":
                src_idx, mask, overflow = knn.knn_bucket_indices(
                    xyz, aa_idx, self.n_neighbors,
                    capacity=self.bucket_capacity, k_dynamic=k_dynamic,
                )
                self.sow("diagnostics", "se3_bucket_overflow", overflow)
            else:
                src_idx, mask = knn.knn_gather_indices(
                    xyz, aa_idx, self.n_neighbors, k_dynamic=k_dynamic
                )
            ca_src = jax.vmap(lambda c, i: c[i])(ca, src_idx)  # (B, L, S, 3)
            rel_pos = ca[:, :, None, :] - ca_src
            # w[b, j, s] = edge[b, src_idx[b,j,s], j] (edge is src-major (i, j))
            edge_t = jnp.swapaxes(edge, 1, 2)  # (B, j, i, de)
            edge_w = jnp.take_along_axis(
                edge_t, src_idx[..., None], axis=2
            )
        else:
            # Static dense kNN mask; dst-major (L, L) layouts (exact parity).
            cond = knn.knn_adjacency(
                xyz, aa_idx, self.n_neighbors, exclude_self=self.knn_exclude_self,
                k_dynamic=k_dynamic,
            )  # (B, i, j)
            mask = knn.incoming_mask(cond)  # (B, j, i)
            rel_pos = ca[:, :, None, :] - ca[:, None, :, :]  # [b,j,i] = x_j - x_i
            edge_w = jnp.swapaxes(edge, 1, 2)  # w[b, j, i] = edge[b, i, j]

        h0 = node[..., None]  # (B, L, d_node, 1)
        h1 = xyz - ca[:, :, None, :]  # (B, L, 3 atoms, 3)

        out = SE3Transformer(
            num_layers=2,
            num_channels=16,
            n_heads=4,
            num_degrees=2,
            l0_in_features=self.d_node,
            l1_in_features=3,
            l0_out_features=self.d_state,
            l1_out_features=3,
            num_edge_features=self.d_edge,
            impl=self.attn_impl,
            name="se3",
        )(h0, h1, edge_w, rel_pos, mask, src_idx=src_idx, dst_idx=dst_idx)

        state = out[0][..., 0]  # (B, L, d_state)
        disp = out[1]  # (B, L, 3, 3)

        ca_new = ca + disp[:, :, CA_IDX]
        n_new = ca_new + disp[:, :, N_IDX]
        c_new = ca_new + disp[:, :, C_IDX]
        xyz_new = jnp.stack([n_new, ca_new, c_new], axis=2)
        return state, xyz_new

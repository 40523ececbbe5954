"""MSA-track modules.

TPU-native re-designs of the reference MSA-track modules
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:184-409, 559-610,
865-920). All attention math is expressed as batched einsums that XLA tiles onto
the MXU; the tied row attention additionally has a fused Pallas path (ops/pallas)
selected via attn_impl="pallas".
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn

from .dropout import Dropout
import jax.numpy as jnp

from .attention import FeedForward, PerformerSelfAttention


class PositionWiseWeightFactor(nn.Module):
    """Soft weight of each MSA row against the query, per position and head.

    Reference :184-217. msa (B, N, L, d_msa) -> (B, N, h, L, 1), softmax over N.
    The reference applies dropout *after* the softmax (:217), breaking the sum-to-1
    property when p_dropout > 0; we reproduce that faithfully.
    """

    d_msa: int
    n_heads: int = 12
    p_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, *, deterministic: bool = True):
        assert self.d_msa % self.n_heads == 0, (
            f"[PositionWiseWeightFactor]: d_msa ({self.d_msa}) must be divisible by "
            f"n_heads ({self.n_heads})."
        )
        d_head = self.d_msa // self.n_heads
        scale = d_head**-0.5

        query = msa[:, 0]  # (B, L, d)
        q = nn.Dense(self.d_msa, dtype=self.dtype, name="to_q")(query)
        k = nn.Dense(self.d_msa, dtype=self.dtype, name="to_k")(msa)

        B, L = q.shape[0], q.shape[1]
        q = q.reshape(B, L, self.n_heads, d_head) * scale
        k = k.reshape(B, k.shape[1], L, self.n_heads, d_head)

        logits = jnp.einsum("blhd,bnlhd->blhn", q, k,
                            preferred_element_type=jnp.float32)
        att = nn.softmax(logits, axis=-1).astype(q.dtype)  # over N
        att = jnp.transpose(att, (0, 3, 2, 1))[..., None]  # (B, N, h, L, 1)
        return Dropout(self.p_dropout)(att, deterministic=deterministic)


class SoftTiedAttentionOverResidues(nn.Module):
    """Row-tied attention over residues (reference :220-267).

    One L x L attention map shared by all N MSA rows: logits are summed over the
    sequence axis after scaling the queries by the position-wise weights. Optionally
    returns the symmetrized per-head map (B, L, L, h) as the MSA->pair signal.
    """

    d_msa: int
    n_heads: int = 12
    p_dropout: float = 0.1
    return_att: bool = False
    attn_impl: str = "xla"  # "xla" | "pallas" (fused flash kernel; no att map)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.d_msa % self.n_heads == 0
        h, d_head = self.n_heads, self.d_msa // self.n_heads
        scale = d_head**-0.5
        B, N, L, _ = x.shape

        q = nn.Dense(self.d_msa, dtype=self.dtype, name="to_q")(x).reshape(B, N, L, h, d_head)
        k = nn.Dense(self.d_msa, dtype=self.dtype, name="to_k")(x).reshape(B, N, L, h, d_head)
        v = nn.Dense(self.d_msa, dtype=self.dtype, name="to_v")(x).reshape(B, N, L, h, d_head)

        w = PositionWiseWeightFactor(
            self.d_msa, h, self.p_dropout, dtype=self.dtype, name="poswise_weight"
        )(x, deterministic=deterministic)  # (B, N, h, L, 1)
        q = q * jnp.transpose(w, (0, 1, 3, 2, 4)) * scale  # (B, N, L, h, d)

        # any L: the kernel pad-shims to the next 128 multiple internally
        use_pallas = self.attn_impl == "pallas" and not self.return_att
        if use_pallas:
            from ..ops.pallas.tied_attention import tied_flash_attention
            from ..parallel.mesh import tp_shard_map

            def fold(t):  # (B, N, L, h, d) -> (B*h, L, N*d)
                t = jnp.transpose(t, (0, 3, 2, 1, 4))
                return t.reshape(B * h, L, N * d_head)

            # under a tp>1 mesh the kernel runs per head shard (B*h is
            # b-major/h-minor, so splitting it over 'tp' splits head blocks —
            # matching the head-stacked to_q/k/v kernel sharding)
            out = tp_shard_map(tied_flash_attention, fold(q), fold(k), fold(v))
            out = out.reshape(B, h, L, N, d_head)
            out = jnp.transpose(out, (0, 3, 2, 1, 4)).reshape(B, N, L, self.d_msa)
        else:
            logits = jnp.einsum("bnihd,bnjhd->bhij", q, k,
                                preferred_element_type=jnp.float32)
            att = nn.softmax(logits, axis=-1)
            out = jnp.einsum(
                "bhij,bnjhd->bnihd", att.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(v.dtype).reshape(B, N, L, self.d_msa)

        out = nn.Dense(self.d_msa, dtype=self.dtype, name="to_out")(out)
        out = Dropout(self.p_dropout)(out, deterministic=deterministic)

        if self.return_att:
            att_sym = 0.5 * (att + jnp.swapaxes(att, -1, -2))
            return out, jnp.transpose(att_sym, (0, 2, 3, 1))  # (B, i, j, h)
        return out


class EncoderLayer(nn.Module):
    """Pre-LN transformer layer; tied attention or Performer (reference :284-354)."""

    d_msa: int
    d_ff: int
    n_heads: int = 12
    p_dropout: float = 0.1
    tied: bool = False
    performer: bool = False
    return_att: bool = False
    generalized_attention: bool = False
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.tied:
            attn = SoftTiedAttentionOverResidues(
                self.d_msa,
                self.n_heads,
                self.p_dropout,
                return_att=self.return_att,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name="attn",
            )
        elif self.performer:
            if self.return_att:
                raise NotImplementedError(
                    "PerformerSelfAttention does not support return_att."
                )
            attn = PerformerSelfAttention(
                dim=self.d_msa,
                heads=self.n_heads,
                dim_head=self.performer_dim_head,
                p_dropout=self.p_dropout,
                generalized_attention=self.generalized_attention,
                feature_seed=self.feature_seed,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name="attn",
            )
        else:
            raise NotImplementedError

        orig = x
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        if self.return_att:
            x, att = attn(x, deterministic=deterministic)
        else:
            x = attn(x, deterministic=deterministic)
        x = orig + Dropout(self.p_dropout)(x, deterministic=deterministic)

        # FF residual: LN -> FF -> Dropout, added to x (reference :326-332).
        y = nn.LayerNorm(epsilon=1e-5, name="ff_ln")(x)
        y = FeedForward(self.d_msa, self.d_ff, self.p_dropout, dtype=self.dtype,
                        name="ff")(y, deterministic=deterministic)
        y = Dropout(self.p_dropout)(y, deterministic=deterministic)
        x = x + y

        if self.return_att:
            return x, att
        return x


class MsaUpdateUsingSelfAttention(nn.Module):
    """Tied row attention stack, then Performer column attention stack (:357-409).

    Returns the updated MSA and the (symmetrized) attention map from the LAST tied
    layer.
    """

    d_msa: int
    d_ff: int
    n_heads: int = 12
    p_dropout: float = 0.1
    n_encoder_layers: int = 4
    feature_seed: int = 42
    performer_dim_head: int = 64
    attn_impl: str = "xla"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        att = None
        for i in range(self.n_encoder_layers):
            # Only the LAST tied layer's attention map feeds the pair update
            # (reference :400-401); earlier layers may use the fused kernel.
            need_att = i == self.n_encoder_layers - 1
            layer = EncoderLayer(
                self.d_msa,
                self.d_ff,
                self.n_heads,
                self.p_dropout,
                tied=True,
                return_att=need_att,
                attn_impl=self.attn_impl,
                dtype=self.dtype,
                name=f"residue_wise_{i}",
            )
            if need_att:
                x, att = layer(x, deterministic=deterministic)
            else:
                x = layer(x, deterministic=deterministic)

        # Sequence-wise attention: attend over N for each residue position. The
        # reference transposes to (b, l, n, d) and flattens rows; our Performer
        # attends over the second-to-last axis, so a single swap suffices.
        x = jnp.swapaxes(x, 1, 2)  # (B, L, N, d)
        for i in range(self.n_encoder_layers):
            x = EncoderLayer(
                self.d_msa,
                self.d_ff,
                self.n_heads,
                self.p_dropout,
                performer=True,
                feature_seed=self.feature_seed + i,
                performer_dim_head=self.performer_dim_head,
                dtype=self.dtype,
                name=f"sequence_wise_{i}",
            )(x, deterministic=deterministic)
        x = jnp.swapaxes(x, 1, 2)
        return x, att


class MsaUpdateWithPairLayer(nn.Module):
    """Pair-biased MSA update (reference :559-595).

    The symmetrized pair map projects to per-head attention logits; the same
    pair-derived attention is applied to every MSA row.
    """

    d_msa: int
    d_pair: int
    n_heads: int = 4
    p_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, *, deterministic: bool = True):
        h = self.n_heads
        d_head = self.d_msa // h
        B, N, L, _ = msa.shape

        # pair2att: symmetrize -> LN -> Linear(h) -> Dropout -> softmax over j.
        p = 0.5 * (pair + jnp.swapaxes(pair, 1, 2))
        p = nn.LayerNorm(epsilon=1e-5, name="pair_ln")(p)
        logits = nn.Dense(h, name="pair2att")(p)
        logits = Dropout(self.p_dropout)(logits, deterministic=deterministic)
        att = nn.softmax(jnp.transpose(logits, (0, 3, 1, 2)), axis=-1)  # (B,h,i,j)

        # msa2value: LN -> Linear -> heads.
        v = nn.LayerNorm(epsilon=1e-5, name="msa_ln")(msa)
        v = nn.Dense(self.d_msa, dtype=self.dtype, name="msa2value")(v).reshape(
            B, N, L, h, d_head
        )

        upd = jnp.einsum(
            "bhij,bnjhd->bnihd", att.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(v.dtype).reshape(B, N, L, self.d_msa)
        upd = Dropout(self.p_dropout)(upd, deterministic=deterministic)

        x = msa + upd
        # ff: Residual(LN -> FF(d_msa, d_msa)) with dropout on the branch (:578-584).
        y = nn.LayerNorm(epsilon=1e-5, name="ff_ln")(x)
        y = FeedForward(self.d_msa, self.d_msa, self.p_dropout, dtype=self.dtype,
                        name="ff")(y, deterministic=deterministic)
        y = Dropout(self.p_dropout)(y, deterministic=deterministic)
        return x + y


class MsaUpdateWithPair(nn.Module):
    """N-layer stack of MsaUpdateWithPairLayer (reference :598-610).

    The reference stores these layers in a plain Python list (a bug: their params are
    invisible to the optimizer, :602-605); here they are properly registered.
    """

    d_msa: int
    d_pair: int
    n_heads: int = 4
    n_encoder_layers: int = 4
    p_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, msa, pair, *, deterministic: bool = True):
        for i in range(self.n_encoder_layers):
            msa = MsaUpdateWithPairLayer(
                self.d_msa, self.d_pair, self.n_heads, self.p_dropout,
                dtype=self.dtype, name=f"layer_{i}"
            )(msa, pair, deterministic=deterministic)
        return msa


class MsaUpdateWithPairAndCoord(nn.Module):
    """Structure -> MSA feedback via distance-binned attention (reference :865-920).

    Four heads, one per CA-distance bin [8, 12, 16, 20] A; head h may only attend
    where dist < bin_h. Q/K come from the SE(3) state, V from the MSA; the same
    attention map applies to all MSA rows. The reference scales by
    (d_state // n_heads)^-0.5 even though the head dim is d_trfm_inner (:874,:879) —
    reproduced.
    """

    d_msa: int
    d_state: int
    d_trfm_inner: int = 32
    d_ff: int = 384 * 4
    distance_bins: Tuple[int, ...] = (8, 12, 16, 20)
    p_dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz, state, msa, *, deterministic: bool = True):
        h = len(self.distance_bins)
        scale = (self.d_state // h) ** -0.5
        B, N, L, _ = msa.shape

        state = nn.LayerNorm(epsilon=1e-5, name="ln_state")(state)
        msa = nn.LayerNorm(epsilon=1e-5, name="ln_msa")(msa)

        q = nn.Dense(self.d_trfm_inner * h, name="to_q")(state)
        k = nn.Dense(self.d_trfm_inner * h, name="to_k")(state)
        v = nn.Dense(self.d_msa, dtype=self.dtype, name="to_v")(msa)

        q = q.reshape(B, L, h, self.d_trfm_inner).transpose(0, 2, 1, 3) * scale
        k = k.reshape(B, L, h, self.d_trfm_inner).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, L, h, self.d_msa // h).transpose(0, 3, 1, 2, 4)  # b h n l d

        ca = xyz[:, :, 1]  # CA_IDX = 1
        pdist = jnp.sqrt(
            jnp.sum((ca[:, :, None, :] - ca[:, None, :, :]) ** 2, axis=-1) + 1e-12
        )
        bins = jnp.asarray(self.distance_bins, dtype=pdist.dtype)
        mask = (pdist[:, None] < bins[None, :, None, None]).astype(q.dtype)  # b h i j

        logits = jnp.einsum("bhid,bhjd->bhij", q, k) + (1.0 - mask) * -1e9
        att = nn.softmax(logits, axis=-1)

        out = jnp.einsum("bhij,bhnjd->bhnid", att.astype(v.dtype), v,
                         preferred_element_type=jnp.float32).astype(v.dtype)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, N, L, self.d_msa)
        msa = msa + nn.LayerNorm(epsilon=1e-5, name="ln_out")(out)

        y = nn.LayerNorm(epsilon=1e-5, name="ff_ln")(msa)
        y = FeedForward(self.d_msa, self.d_ff, self.p_dropout, dtype=self.dtype,
                        name="ff")(y, deterministic=deterministic)
        return msa + y

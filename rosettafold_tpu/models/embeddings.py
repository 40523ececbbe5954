"""MSA / pair input embeddings.

Re-designs of the reference embedding modules
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:57-181) as flax modules.
Notable divergences from the reference (both are reference *bugs* we fix while keeping
numerics identical on the defaults):
  * PE tables are trace-time constants, not un-registered CPU attributes (:63).
  * The query/target segment index is derived from the MSA shape, not a fresh CPU
    tensor per call (:115).
"""

from __future__ import annotations

import flax.linen as nn

from .dropout import Dropout
import jax.numpy as jnp

from ..ops.sinusoidal import sinusoidal_table, gather_pe


class SinusoidalPositionalEncoding(nn.Module):
    """1D sinusoidal PE added to the MSA embedding (reference :57-76).

    Call: x (B, N, L, dim), aa_idx (B, L) int -> (B, N, L, dim), with dropout on the
    sum (reference :76).
    """

    dim: int
    max_len: int
    p_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, aa_idx, *, deterministic: bool = True):
        table = sinusoidal_table(self.max_len, self.dim, dtype=x.dtype)
        pe = gather_pe(table, aa_idx)  # (B, L, dim)
        out = x + pe[:, None, :, :]
        return Dropout(self.p_dropout)(out, deterministic=deterministic)


class SinusoidalPositionalEncoding2D(nn.Module):
    """Pair PE (reference :79-103): concat of row-tiled and col-tiled half-dim tables.

    Call: x (B, L, L, dim), aa_idx (B, L) -> (B, L, L, dim). The reference defines a
    dropout here but never applies it in forward (:93 vs :95-103); we match that and
    apply none.
    """

    dim: int
    max_len: int
    p_dropout: float = 0.1  # kept for constructor parity; unused, like the reference

    @nn.compact
    def __call__(self, x, aa_idx):
        table = sinusoidal_table(self.max_len, self.dim // 2, dtype=x.dtype)
        pe = gather_pe(table, aa_idx)  # (B, L, dim/2)
        L = aa_idx.shape[1]
        pe_i = jnp.broadcast_to(pe[:, :, None, :], (pe.shape[0], L, L, pe.shape[-1]))
        pe_j = jnp.broadcast_to(pe[:, None, :, :], (pe.shape[0], L, L, pe.shape[-1]))
        return x + jnp.concatenate([pe_i, pe_j], axis=-1)


class MsaEmbedding(nn.Module):
    """Token + positional + query-segment embedding of the MSA (reference :106-120).

    Call: msa (B, N, L) int tokens, aa_idx (B, L) -> (B, N, L, d_msa). Row 0 of the
    MSA is flagged as the query sequence; the segment embedding is added *after*
    the PE dropout, exactly as in the reference (:119).
    """

    d_input: int = 21
    d_msa: int = 384
    max_len: int = 260
    p_pe_drop: float = 0.1

    @nn.compact
    def __call__(self, msa, aa_idx, *, deterministic: bool = True):
        n_seq = msa.shape[-2]
        tok = nn.Embed(self.d_input, self.d_msa, name="to_embedding")(msa)
        x = SinusoidalPositionalEncoding(
            self.d_msa, self.max_len, self.p_pe_drop, name="pos_enc"
        )(tok, aa_idx, deterministic=deterministic)

        # query_idx: row 0 -> 0 (query), rows 1.. -> 1 (targets); reference :115-117.
        query_idx = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.ones((n_seq - 1,), jnp.int32)]
        )
        seg = nn.Embed(2, self.d_msa, name="query_enc")(query_idx)  # (N, d_msa)
        return x + seg[None, :, None, :]


class PairEmbedding(nn.Module):
    """Initial pair representation (reference :123-181).

    Call: seq (B, L) int, aa_idx (B, L), template optional (B, L, L, d_template)
    -> (B, L, L, d_pair). Features: per-residue embedding tiled along each pair axis,
    the unsigned log sequence-separation, and (optionally) a LayerNormed template
    feature, projected to d_pair and summed with the 2D PE.
    """

    d_input: int = 21
    d_pair: int = 288
    max_len: int = 260
    p_pe_drop: float = 0.1
    use_template: bool = False
    d_template: int = 64

    @nn.compact
    def __call__(self, seq, aa_idx, template=None, *, deterministic: bool = True):
        if not self.use_template and template is not None:
            raise ValueError(
                "[PairEmbedding]: template is not None but use_template is False"
            )
        L = seq.shape[-1]
        half = self.d_pair // 2
        emb = nn.Embed(self.d_input, half, name="embed_seq")(seq)  # (B, L, half)

        # reference :155-157: "left" tiles along the first pair axis (value = emb[j]),
        # "right" along the second (value = emb[i]).
        left = jnp.broadcast_to(emb[:, None, :, :], (emb.shape[0], L, L, half))
        right = jnp.broadcast_to(emb[:, :, None, :], (emb.shape[0], L, L, half))
        seq_sep = self._sequence_separation(aa_idx)

        feats = [left, right, seq_sep]
        if self.use_template:
            if template is None:
                raise ValueError("[PairEmbedding]: use_template=True requires template")
            feats.append(nn.LayerNorm(epsilon=1e-5, name="ln_template")(template))

        x = jnp.concatenate(feats, axis=-1)
        x = nn.Dense(self.d_pair, name="proj")(x)
        return SinusoidalPositionalEncoding2D(
            self.d_pair, self.max_len, self.p_pe_drop, name="pos_enc"
        )(x, aa_idx)

    @staticmethod
    def _sequence_separation(aa_idx):
        """log(|i - j| + 1), unsigned (reference :177-181). (B, L, L, 1)."""
        dist = aa_idx[:, :, None] - aa_idx[:, None, :]
        return jnp.log(jnp.abs(dist).astype(jnp.float32) + 1.0)[..., None]

"""SE(3)-equivariant transformer on dense masked neighborhoods.

TPU-native replacement for the reference's DGL-based SE(3) stack
(/root/reference/rosettafold_pytorch/equivariant_attention/modules.py and
se3_modules.py). The architectural divergence (SURVEY.md §7): instead of a dynamic
edge-list graph with C++ message passing, all edge quantities live on a dense
(B, L_dst, L_src, ...) layout with a boolean incoming-edge mask, so every step is a
static-shape batched einsum (MXU) or a masked softmax (VPU). Semantics match the
reference exactly:

  * features are dicts {degree: (B, L, multiplicity, 2*degree+1)};
  * attention normalizes over *incoming* edges of each destination node
    (edge_softmax, modules.py:764) -> masked softmax over the src axis;
  * the TFN convolution reduces with a mean over incoming edges (modules.py:241)
    -> masked mean with true neighbor counts;
  * all equivariant math runs in float32 (the reference disables autocast,
    se3_modules.py:73,164).

Feature dict keys are ints (degrees). Edge tensors are dst-major:
T[b, j, i] describes the edge i -> j (src i, dst j); rel_pos[b, j, i] = x_j - x_i.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from ..ops import so3

Features = Dict[int, jnp.ndarray]


class Fiber:
    """Degree -> multiplicity structure descriptor (reference fibers.py:13-116)."""

    def __init__(self, dictionary: Optional[Dict[int, int]] = None, num_degrees: Optional[int] = None,
                 num_channels: Optional[int] = None):
        if dictionary is None:
            dictionary = {d: num_channels for d in range(num_degrees)}
        self.dict = {int(k): int(v) for k, v in sorted(dictionary.items())}
        self.degrees = tuple(self.dict.keys())
        self.structure = tuple((m, d) for d, m in self.dict.items())
        self.n_features = sum(m * (2 * d + 1) for d, m in self.dict.items())

    @staticmethod
    def combine(f1: "Fiber", f2: "Fiber") -> "Fiber":
        new = dict(f1.dict)
        for d, m in f2.dict.items():
            new[d] = new.get(d, 0) + m
        return Fiber(new)

    @staticmethod
    def combine_max(f1: "Fiber", f2: "Fiber") -> "Fiber":
        new = dict(f1.dict)
        for d, m in f2.dict.items():
            new[d] = max(new.get(d, 0), m)
        return Fiber(new)

    @staticmethod
    def combine_selectively(f1: "Fiber", f2: "Fiber") -> "Fiber":
        """Sum multiplicities only for degrees already present in f1
        (reference fibers.py:82-91)."""
        new = dict(f1.dict)
        for d in f1.degrees:
            if d in f2.dict:
                new[d] += f2.dict[d]
        return Fiber(new)

    def __repr__(self):
        return f"Fiber({self.dict})"


def fiber2head(feats: Features, n_heads: int, fiber: Fiber) -> jnp.ndarray:
    """Pack per-degree tensors (..., m, 2d+1) into (..., h, sum(m/h*(2d+1)))
    (reference fibers.py:163-170)."""
    parts = []
    for d in fiber.degrees:
        v = feats[d]
        m = fiber.dict[d]
        parts.append(v.reshape(*v.shape[:-2], n_heads, (m // n_heads) * (2 * d + 1)))
    return jnp.concatenate(parts, axis=-1)


class RadialFunc(nn.Module):
    """Radial profile MLP (reference modules.py:246-284): (edge_dim+1) -> 32 -> 32
    -> num_freq*in*out with LayerNorm+ReLU, kaiming-uniform init."""

    num_freq: int
    in_dim: int
    out_dim: int
    edge_dim: int = 0
    mid_dim: int = 32

    @nn.compact
    def __call__(self, feat):
        kaiming = nn.initializers.he_uniform()
        x = nn.Dense(self.mid_dim, kernel_init=kaiming, name="fc1")(feat)
        x = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.mid_dim, kernel_init=kaiming, name="fc2")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_freq * self.in_dim * self.out_dim, kernel_init=kaiming,
                     name="fc3")(x)
        return x.reshape(*x.shape[:-1], self.out_dim, self.in_dim, self.num_freq)


class PairwiseConv(nn.Module):
    """Per-edge SE(3) kernel between two degrees (reference modules.py:287-325):
    kernel = sum_freq RadialFunc(feat) * basis."""

    degree_in: int
    nc_in: int
    degree_out: int
    nc_out: int
    edge_dim: int = 0

    return_radial: bool = False  # skip kernel assembly; caller fuses the einsums

    @nn.compact
    def __call__(self, feat, basis):
        num_freq = 2 * min(self.degree_in, self.degree_out) + 1
        R = RadialFunc(num_freq, self.nc_in, self.nc_out, self.edge_dim, name="rp")(feat)
        if self.return_radial:
            return R  # (..., nc_out, nc_in, nf)
        B = basis[f"{self.degree_in},{self.degree_out}"]  # (..., 2do+1, 2di+1, nf)
        # kernel[..., o, mo, c, mi] = sum_f R[..., o, c, f] * B[..., mo, mi, f]
        return jnp.einsum("...ocf,...mnf->...omcn", R, B,
                          precision=lax.Precision.HIGHEST)


def _masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    neg = jnp.asarray(-1e9, logits.dtype)
    logits = jnp.where(mask, logits, neg)
    att = nn.softmax(logits, axis=axis)
    # Zero out fully-masked rows (cannot occur with the kmin band, but be safe).
    return jnp.where(mask, att, 0.0)


class GConvSE3Partial(nn.Module):
    """Node -> edge partial convolution (reference modules.py:561-680), used for
    the K and V embeddings of the attention.

    Output per degree: (B, m_out, 2*d_out+1, J, S) — channel dims FIRST, edge
    dims (dst J, src-slot S) LAST. TPU buffers tile the trailing two axes as
    (8, 128); putting the big edge axes there keeps every materialized edge
    tensor compact, where a (..., m, 2d+1)-trailing layout pads 10-50x (the
    cause of training OOMs at full size)."""

    f_in: Fiber
    f_out: Fiber
    edge_dim: int = 0
    # src_major: edge tensors are keyed (src I, slot S -> dst); src features
    # are the node features themselves (no gather). Used by the exact scatter
    # path (se3_impl="scatter").
    src_major: bool = False
    # Relative-position injection (reference modules.py:583-639): 'cat' appends
    # x_dst - x_src as an extra degree-1 input channel; 'add' adds it to the
    # first degree-1 channel (only when multiplicity > 1). Unused by the model
    # (x_ij=None at every call site) but part of the public surface.
    x_ij: str = None

    @nn.compact
    def __call__(self, h: Features, edge_feat, basis, rel_pos=None) -> Features:
        assert self.x_ij in (None, "cat", "add")
        if self.x_ij is not None:
            assert rel_pos is not None, "x_ij modes need rel_pos (dst - src)"
        out = {}
        for do in self.f_out.degrees:
            mo = self.f_out.dict[do]
            msg = None
            for di in self.f_in.degrees:
                mi = self.f_in.dict[di]
                mi_k = mi + 1 if (self.x_ij == "cat" and di == 1) else mi
                # Fused form of PairwiseConv + message: never materializes the
                # per-edge (mo, 2do+1, mi, 2di+1) kernel tensor; XLA contracts
                # src x basis first (cheap) then radial weights. Intermediate
                # and output layouts keep (J, S) as the trailing axes.
                R = PairwiseConv(
                    di, mi_k, do, mo, self.edge_dim, return_radial=True,
                    name=f"pc_{di}_{do}",
                )(edge_feat, basis)  # (B,J,S,mo_c,mi_k,nf)
                B = basis[f"{di},{do}"]  # (B,J,S,2do+1,2di+1,nf)
                R_rel = None
                if di == 1 and self.x_ij == "cat":
                    R, R_rel = R[..., :mi, :], R[..., mi, :]  # split extra channel
                elif di == 1 and self.x_ij == "add" and mi > 1:
                    R_rel = R[..., 0, :]  # rel adds into channel 0's kernel
                if h[di].ndim == 4 and self.src_major:
                    # src-major edge layout (B, I, S, ...): src feature is the
                    # row itself, shared by all S slots
                    t = jnp.einsum("bismnf,bicn->bmfcis", B, h[di],
                                   precision=lax.Precision.HIGHEST)
                    contrib = jnp.einsum("bisocf,bmfcis->bomis", R, t,
                                         precision=lax.Precision.HIGHEST)
                elif h[di].ndim == 4:
                    # dense layout: src features (B, I, mi, 2di+1), S == I == L
                    t = jnp.einsum("bjimnf,bicn->bmfcji", B, h[di],
                                   precision=lax.Precision.HIGHEST)
                    contrib = jnp.einsum("bjiocf,bmfcji->bomji", R, t,
                                         precision=lax.Precision.HIGHEST)
                else:
                    # gather layout: pre-gathered src features (B, J, S, mi, 2di+1)
                    t = jnp.einsum("bjsmnf,bjscn->bmfcjs", B, h[di],
                                   precision=lax.Precision.HIGHEST)
                    contrib = jnp.einsum("bjsocf,bmfcjs->bomjs", R, t,
                                         precision=lax.Precision.HIGHEST)
                if R_rel is not None:
                    # per-edge degree-1 "feature" = rel_pos: contract basis
                    # with rel (2di+1 = 3), then the per-channel radial weight
                    t_rel = jnp.einsum("bxymnf,bxyn->bxymf", B, rel_pos,
                                       precision=lax.Precision.HIGHEST)
                    contrib = contrib + jnp.einsum(
                        "bxyof,bxymf->bomxy", R_rel, t_rel,
                        precision=lax.Precision.HIGHEST,
                    )
                msg = contrib if msg is None else msg + contrib
            if self.x_ij == "cat" and 1 not in self.f_in.degrees:
                # rel-only degree-1 input (reference m_ori == 0 case)
                R1 = PairwiseConv(1, 1, do, mo, self.edge_dim,
                                  return_radial=True, name=f"pc_1_{do}")(
                    edge_feat, basis
                )[..., 0, :]
                B1 = basis[f"1,{do}"]
                t_rel = jnp.einsum("bxymnf,bxyn->bxymf", B1, rel_pos,
                                   precision=lax.Precision.HIGHEST)
                msg = msg + jnp.einsum("bxyof,bxymf->bomxy", R1, t_rel,
                                       precision=lax.Precision.HIGHEST)
            out[do] = msg  # (B, m_out, 2do+1, J, S)
        return out


class GConvSE3(nn.Module):
    """TFN graph convolution with masked-mean aggregation over incoming edges
    (reference modules.py:114-243). Used by the (dead-code but public) TFN model."""

    f_in: Fiber
    f_out: Fiber
    self_interaction: bool = False
    edge_dim: int = 0
    flavor: str = "skip"

    @nn.compact
    def __call__(self, h: Features, edge_feat, basis, mask, h_src: Features = None) -> Features:
        partial = GConvSE3Partial(self.f_in, self.f_out, self.edge_dim, name="partial")(
            h_src if h_src is not None else h, edge_feat, basis
        )
        counts = jnp.maximum(jnp.sum(mask, axis=-1), 1)  # (B, J)
        out = {}
        for do in self.f_out.degrees:
            mo = self.f_out.dict[do]
            # partial[do]: (B, m, 2d+1, J, S); mask (B, J, S)
            msg = jnp.where(mask[:, None, None], partial[do], 0.0)
            agg = jnp.sum(msg, axis=-1)  # (B, m, 2d+1, J)
            agg = jnp.moveaxis(agg, -1, 1) / counts[:, :, None, None]  # (B,J,m,2d+1)
            if self.self_interaction:
                if self.flavor == "TFN":
                    W = self.param(
                        f"self_W_{do}",
                        nn.initializers.normal(1.0 / math.sqrt(mo)),
                        (mo, mo),
                    )
                    agg = jnp.einsum("oc,blcm->blom", W, agg, precision=lax.Precision.HIGHEST)
                elif self.flavor == "skip" and do in self.f_in.degrees:
                    mi = self.f_in.dict[do]
                    W = self.param(
                        f"self_W_{do}",
                        nn.initializers.normal(1.0 / math.sqrt(mi)),
                        (mo, mi),
                    )
                    agg = agg + jnp.einsum("oc,blcm->blom", W, h[do],
                                           precision=lax.Precision.HIGHEST)
            out[do] = agg
        return out


class G1x1SE3(nn.Module):
    """Per-degree linear channel mixing (reference modules.py:328-361)."""

    f_in: Fiber
    f_out: Fiber
    learnable: bool = True  # kept for parity; params are always learnable here

    @nn.compact
    def __call__(self, feats: Features) -> Features:
        out = {}
        for do in self.f_out.degrees:
            if do not in feats:
                continue
            mi = self.f_in.dict[do]
            mo = self.f_out.dict[do]
            W = self.param(
                f"W_{do}", nn.initializers.normal(1.0 / math.sqrt(mi)), (mo, mi)
            )
            out[do] = jnp.einsum("oc,...cm->...om", W, feats[do],
                                 precision=lax.Precision.HIGHEST)
        return out


class GNormBias(nn.Module):
    """Norm-gated nonlinearity with learned bias: ReLU(|v| + b) * v/|v|
    (reference modules.py:364-406)."""

    fiber: Fiber
    eps: float = 1e-12

    @nn.compact
    def __call__(self, feats: Features) -> Features:
        out = {}
        for d in self.fiber.degrees:
            v = feats[d]
            m = self.fiber.dict[d]
            bias = self.param(f"bias_{d}", nn.initializers.normal(1.0), (m,))
            norm = jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), self.eps
            )
            phase = v / norm
            gated = nn.relu(norm[..., 0] + bias)
            out[d] = gated[..., None] * phase
        return out


class GNormSE3(nn.Module):
    """Norm-gated nonlinearity with a learnable MLP on norms
    (reference modules.py:476-542). num_layers=0 -> LayerNorm + ReLU on norms."""

    fiber: Fiber
    num_layers: int = 0
    eps: float = 1e-12

    @nn.compact
    def __call__(self, feats: Features) -> Features:
        out = {}
        for d in self.fiber.degrees:
            v = feats[d]
            m = self.fiber.dict[d]
            norm = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), self.eps)
            phase = v / norm
            t = norm[..., 0]
            if self.num_layers == 0:
                t = nn.LayerNorm(epsilon=1e-5, name=f"ln_{d}")(t)
                t = nn.relu(t)
            else:
                for i in range(self.num_layers):
                    t = nn.LayerNorm(epsilon=1e-5, name=f"ln_{d}_{i}")(t)
                    t = nn.relu(t)
                    t = nn.Dense(
                        m,
                        kernel_init=nn.initializers.he_uniform(),
                        use_bias=(i == self.num_layers - 1),
                        name=f"fc_{d}_{i}",
                    )(t)
            out[d] = t[..., None] * phase
        return out


class GAttentiveSelfInt(nn.Module):
    """Attention-based self-interaction over the channel Gram matrix
    (reference modules.py:409-473)."""

    f_in: Fiber
    f_out: Fiber
    eps: float = 1e-12

    @nn.compact
    def __call__(self, feats: Features) -> Features:
        out = {}
        for d in self.f_in.degrees:
            v = feats[d]  # (..., m_in, 2d+1)
            m_in = self.f_in.dict[d]
            m_out = self.f_out.dict[d]
            gram = jnp.einsum("...ac,...bc->...ab", v, v, precision=lax.Precision.HIGHEST)
            gram = gram.reshape(*gram.shape[:-2], m_in * m_in)
            sign = jnp.sign(gram)
            gram = sign * jnp.maximum(jnp.abs(gram), self.eps)
            t = nn.LayerNorm(epsilon=1e-5, name=f"ln_{d}")(gram)
            t = nn.leaky_relu(t, negative_slope=0.01)
            t = nn.Dense(
                m_in * m_out,
                kernel_init=nn.initializers.he_uniform(),
                name=f"fc_{d}",
            )(t)
            att = nn.softmax(t.reshape(*t.shape[:-1], m_out, m_in), axis=-1)
            out[d] = jnp.einsum("...nm,...md->...nd", att, v,
                                precision=lax.Precision.HIGHEST)
        return out


class GMABSE3(nn.Module):
    """Equivariant multi-head attention over incoming edges
    (reference modules.py:683-774): per-edge key . dst-query dot, scaled by
    sqrt(n_key_features), masked softmax over src, attention-weighted sum."""

    f_value: Fiber
    f_key: Fiber
    n_heads: int

    @nn.compact
    def __call__(self, v: Features, k: Features, q: Features, mask,
                 dst_idx=None) -> Features:
        # v/k per degree: (B, m, 2d+1, J, S) edge-last; q per degree: (B, J, m, 2d+1).
        # dst_idx (B, I, S): src-major exact-scatter mode — edge tensors are
        # keyed (src, slot) and slot s of src i points at dst dst_idx[b,i,s];
        # softmax and aggregation group by dst via segment ops (the DGL
        # edge_softmax semantics on the exact reference edge set).
        h = self.n_heads
        k_parts = []
        for d in self.f_key.degrees:
            m = self.f_key.dict[d]
            kd = k[d].reshape(k[d].shape[0], h, (m // h) * (2 * d + 1), *k[d].shape[-2:])
            k_parts.append(kd)
        kh = jnp.concatenate(k_parts, axis=2)  # (B, h, ck, J, S)
        qh = fiber2head(q, h, self.f_key)  # (B, J, h, ck)

        if dst_idx is not None:
            return self._scatter_attend(v, kh, qh, mask, dst_idx)

        e = jnp.einsum("bhcjs,bjhc->bhjs", kh, qh, precision=lax.Precision.HIGHEST)
        e = e / math.sqrt(self.f_key.n_features)
        att = _masked_softmax(e, mask[:, None], axis=-1)  # softmax over src s

        out = {}
        for d in self.f_value.degrees:
            m = self.f_value.dict[d]
            vd = v[d].reshape(
                v[d].shape[0], h, m // h, 2 * d + 1, *v[d].shape[-2:]
            )  # (B, h, m/h, 2d+1, J, S)
            agg = jnp.einsum("bhjs,bhcmjs->bjhcm", att, vd,
                             precision=lax.Precision.HIGHEST)
            out[d] = agg.reshape(*agg.shape[:2], m, 2 * d + 1)
        return out

    def _scatter_attend(self, v: Features, kh, qh, valid, dst_idx) -> Features:
        """Exact edge_softmax + sum over the src-major edge list.

        kh (B, h, ck, I, S); qh (B, L, h, ck); dst_idx/valid (B, I, S)."""
        h = self.n_heads
        B_, I, S = dst_idx.shape
        L = qh.shape[1]
        E = I * S
        ids_flat = jnp.where(valid, dst_idx, L).reshape(B_, E)  # invalid -> seg L

        # q gathered at each edge's dst
        q_edge = jax.vmap(lambda qb, ib: qb[ib])(qh, dst_idx)  # (B, I, S, h, ck)
        e = jnp.einsum("bhcis,bishc->bhis", kh, q_edge,
                       precision=lax.Precision.HIGHEST)
        e = e / math.sqrt(self.f_key.n_features)
        e = jnp.where(valid[:, None], e, -jnp.inf).reshape(B_, h, E)

        # segment max over dst (numerically stable softmax), then exp/sum
        seg_max = jax.vmap(
            lambda eb, ib: jax.ops.segment_max(
                jnp.swapaxes(eb, 0, 1), ib, num_segments=L + 1
            )
        )(e, ids_flat)  # (B, L+1, h)
        seg_max = jnp.nan_to_num(seg_max, neginf=0.0)
        mx_edge = jax.vmap(lambda mb, ib: mb[ib])(seg_max, ids_flat)  # (B, E, h)
        z = jnp.exp(e - jnp.swapaxes(mx_edge, 1, 2))  # (B, h, E)
        z = jnp.where(jnp.isfinite(e), z, 0.0)
        denom = jax.vmap(
            lambda zb, ib: jax.ops.segment_sum(
                jnp.swapaxes(zb, 0, 1), ib, num_segments=L + 1
            )
        )(z, ids_flat)  # (B, L+1, h)
        den_edge = jax.vmap(lambda db, ib: db[ib])(denom, ids_flat)  # (B, E, h)
        att = z / jnp.maximum(jnp.swapaxes(den_edge, 1, 2), 1e-20)  # (B, h, E)

        out = {}
        for d in self.f_value.degrees:
            m = self.f_value.dict[d]
            vd = v[d].reshape(v[d].shape[0], h, m // h, 2 * d + 1, E)
            weighted = att[:, :, None, None] * vd  # (B, h, c, 2d+1, E)
            flat = weighted.reshape(B_, -1, E)  # (B, F, E)
            agg = jax.vmap(
                lambda wb, ib: jax.ops.segment_sum(
                    jnp.swapaxes(wb, 0, 1), ib, num_segments=L + 1
                )
            )(flat, ids_flat)[:, :L]  # (B, L, F)
            out[d] = agg.reshape(B_, L, h, m // h, 2 * d + 1).reshape(
                B_, L, m, 2 * d + 1
            )
        return out


class GSE3Res(nn.Module):
    """Equivariant attention block with skip connection
    (reference modules.py:777-857): V,K from partial convolutions, Q from 1x1,
    GMABSE3 attention, then 'cat' skip + projection (1x1 or attentive)."""

    f_in: Fiber
    f_out: Fiber
    edge_dim: int = 0
    div: float = 4
    n_heads: int = 1
    learnable_skip: bool = True
    skip: str = "cat"
    selfint: str = "1x1"
    x_ij: str = None
    # "pallas": fused edge-last kernel for the V/K partial convs + attention
    # (ops/pallas/se3_attend.py) on the dense/gather layouts; falls back to
    # the XLA einsum path for scatter (dst_idx) and x_ij modes.
    impl: str = "xla"

    @nn.compact
    def __call__(self, h: Features, edge_feat, basis, mask, h_src: Features = None,
                 dst_idx=None, rel_pos=None, src_idx=None, prep=None) -> Features:
        # src_idx (B, J, S): gather-layout neighbor indices — the fused path
        # gathers node features directly in plane layout (no h_src needed).
        # prep: se3_attend.Prepped invariants hoisted by SE3Transformer (the
        # feat/basis/mask plane transposes are identical for every layer).
        f_mid_out = Fiber({d: int(m // self.div) for d, m in self.f_out.dict.items()})
        f_mid_in = Fiber(
            {d: m for d, m in f_mid_out.dict.items() if d in self.f_in.degrees}
        )

        src_major = dst_idx is not None
        fused = (
            self.impl == "pallas"
            and dst_idx is None
            and self.x_ij is None
            and mask is not None
            and self.f_in.degrees == (0, 1)
            and f_mid_out.degrees == (0, 1)
            and f_mid_in.degrees == (0, 1)
        )
        if h_src is None and src_idx is not None and not fused:
            # XLA gather fallback still needs pre-gathered src features
            h_src = {
                d: jax.vmap(lambda hb, ib: hb[ib])(h[d], src_idx) for d in h
            }
        src = h_src if h_src is not None else h
        v_mod = GConvSE3Partial(self.f_in, f_mid_out, self.edge_dim,
                                src_major=src_major, x_ij=self.x_ij, name="v")
        k_mod = GConvSE3Partial(self.f_in, f_mid_in, self.edge_dim,
                                src_major=src_major, x_ij=self.x_ij, name="k")
        q = G1x1SE3(self.f_in, f_mid_in, name="q")(h)

        if fused:
            from ..ops.pallas import se3_attend

            # bind v/k on tiny dummies (DCE'd) to create/read the identical
            # param trees (same trick as the fused conv, models/resnet.py)
            dummy_h = {d: jnp.zeros((1, 1, 1, m, 2 * d + 1))
                       for d, m in self.f_in.dict.items()}
            dummy_feat = jnp.zeros((1, 1, 1, self.edge_dim + 1))
            dummy_basis = {
                f"{di},{do}": jnp.zeros(
                    (1, 1, 1, 2 * do + 1, 2 * di + 1, 2 * min(di, do) + 1))
                for di in self.f_in.degrees for do in (0, 1)
            }
            _ = v_mod(dummy_h, dummy_feat, dummy_basis)
            _ = k_mod(dummy_h, dummy_feat, dummy_basis)
            meta = se3_attend.build_meta(
                self.f_in.dict, f_mid_out.dict, f_mid_in.dict,
                self.n_heads, self.edge_dim)
            stacked = se3_attend.stack_weights(
                v_mod.variables["params"], k_mod.variables["params"], meta)
            qh = fiber2head(q, self.n_heads, f_mid_in)
            qh = qh.reshape(*qh.shape[:2], -1)  # (B, J, H*ck)
            dense = h[0].ndim == 4 and h_src is None and src_idx is None
            T = se3_attend.default_tile(dense)
            if prep is None:
                prep = se3_attend.prep_invariants(edge_feat, basis, mask, T)
            Jp, S = prep.maskf.shape[1:3]
            if dense:
                hp = se3_attend.prep_h_planes_dense(h, meta.f_in, Jp, S, T)
            elif src_idx is not None:
                hp = se3_attend.gather_h_planes(
                    h, meta.f_in, src_idx, Jp, S, T)
            else:
                hp = se3_attend.planes_from_gathered(
                    h_src, meta.f_in, Jp, S, T)
            qhp = se3_attend.prep_qh(qh, Jp)
            z = se3_attend.gse3_attend_planes(
                prep, hp[0], hp[1], qhp, stacked, meta, dense, T,
                mask.shape[1])
        else:
            v = v_mod(src, edge_feat, basis, rel_pos=rel_pos)
            k = k_mod(src, edge_feat, basis, rel_pos=rel_pos)
            z = GMABSE3(f_mid_out, f_mid_in, self.n_heads, name="attn")(
                v, k, q, mask, dst_idx=dst_idx
            )

        if self.skip == "cat":
            # GCat semantics (reference modules.py:903-928): concat only degrees
            # present in the attention output fiber.
            cat_fiber = Fiber(
                {
                    d: m + (self.f_in.dict.get(d, 0))
                    for d, m in f_mid_out.dict.items()
                }
            )
            z = {
                d: jnp.concatenate([z[d], h[d]], axis=-2) if d in h else z[d]
                for d in f_mid_out.degrees
            }
            if self.selfint == "att":
                return GAttentiveSelfInt(cat_fiber, self.f_out, name="project")(z)
            return G1x1SE3(cat_fiber, self.f_out, self.learnable_skip, name="project")(z)
        elif self.skip == "sum":
            z = G1x1SE3(f_mid_out, self.f_out, self.learnable_skip, name="project")(z)
            return {
                d: z[d] + h[d] if d in h and h[d].shape[-2] == z[d].shape[-2] else z[d]
                for d in self.f_out.degrees
            }
        raise ValueError(self.skip)


class SE3Transformer(nn.Module):
    """SE(3)-transformer wrapper (reference se3_modules.py:83-171): num_layers x
    (GSE3Res + GNormBias) + a final GSE3Res with div=1, one head, attentive
    self-interaction.

    Call:
      h0 (B, L, l0_in, 1), h1 (B, L, l1_in, 3),
      edge_feat (B, L_dst, S, edge_dim), rel_pos (B, L_dst, S, 3)
      [= x_dst - x_src], mask (B, L_dst, S) bool.
    Dense layout: S == L (src axis is global). Gather layout: pass src_idx
    (B, L_dst, S) neighbor indices; per-layer node features are gathered to
    (B, L_dst, S, ...) so memory is O(L*S) instead of O(L^2).
    Returns {0: (B, L, l0_out, 1), 1: (B, L, l1_out, 3)}.

    The basis/radii are computed once per call (get_basis_and_r semantics,
    se3_modules.py:164-170); the basis sees stop_gradient(rel_pos). All math f32.
    """

    num_layers: int = 2
    num_channels: int = 16
    num_degrees: int = 2
    n_heads: int = 4
    div: int = 4
    si_m: str = "1x1"
    si_e: str = "att"
    l0_in_features: int = 32
    l0_out_features: int = 32
    l1_in_features: int = 3
    l1_out_features: int = 3
    num_edge_features: int = 32
    x_ij: str = None  # 'cat'/'add' relative-position injection (public surface)
    impl: str = "xla"  # "pallas": fused se3_attend kernel in every GSE3Res

    @nn.compact
    def __call__(self, h0, h1, edge_feat, rel_pos, mask, src_idx=None,
                 dst_idx=None) -> Features:
        f_in = Fiber({0: self.l0_in_features, 1: self.l1_in_features})
        f_mid = Fiber(num_degrees=self.num_degrees, num_channels=self.num_channels)
        if self.l1_out_features > 0:
            f_out = Fiber({0: self.l0_out_features, 1: self.l1_out_features})
        else:
            f_out = Fiber({0: self.l0_out_features})

        basis = so3.equivariant_basis(rel_pos, self.num_degrees - 1)
        r = so3.edge_radii(rel_pos)
        feat = jnp.concatenate([edge_feat, r], axis=-1).astype(jnp.float32)

        def gather_src(h):
            if src_idx is None:
                return None
            return {
                d: jax.vmap(lambda hb, ib: hb[ib])(h[d], src_idx)
                for d in h
            }

        h = {0: h0.astype(jnp.float32), 1: h1.astype(jnp.float32)}
        fin = f_in
        # fused kernel on the dense AND gather layouts; scatter (dst_idx)
        # keeps the XLA segment-op path
        impl = self.impl if dst_idx is None else "xla"
        prep = None
        if impl == "pallas" and self.x_ij is None and mask is not None:
            # hoist the layer-invariant feat/basis/mask plane transposes out
            # of the per-layer kernel wrapper — the per-layer prep cost is
            # what made the fused kernel lose through the gather path
            # (BENCHMARKS.md "SE(3) fused kernel")
            from ..ops.pallas import se3_attend

            prep = se3_attend.prep_invariants(
                feat, basis, mask, se3_attend.default_tile(src_idx is None))
        for i in range(self.num_layers):
            h = GSE3Res(
                fin,
                f_mid,
                edge_dim=self.num_edge_features,
                div=self.div,
                n_heads=self.n_heads,
                skip="cat",
                selfint=self.si_m,
                x_ij=self.x_ij,
                impl=impl,
                name=f"res_{i}",
            )(h, feat, basis, mask,
              h_src=None if impl == "pallas" else gather_src(h),
              dst_idx=dst_idx, rel_pos=rel_pos, src_idx=src_idx, prep=prep)
            h = GNormBias(f_mid, name=f"norm_{i}")(h)
            fin = f_mid
        h = GSE3Res(
            f_mid,
            f_out,
            edge_dim=self.num_edge_features,
            div=1,
            n_heads=min(1, 2),
            skip="cat",
            selfint=self.si_e,
            x_ij=self.x_ij,
            impl=impl,
            name="res_out",
        )(h, feat, basis, mask,
          h_src=None if impl == "pallas" else gather_src(h),
          dst_idx=dst_idx, rel_pos=rel_pos, src_idx=src_idx, prep=prep)
        return h


class TFN(nn.Module):
    """Non-attentive tensor-field network (reference se3_modules.py:12-80).
    Constructed nowhere in the model but part of the public surface."""

    num_layers: int = 2
    num_channels: int = 32
    num_nonlin_layers: int = 1
    num_degrees: int = 3
    l0_in_features: int = 32
    l0_out_features: int = 32
    l1_in_features: int = 3
    l1_out_features: int = 3
    num_edge_features: int = 32
    use_self: bool = True

    @nn.compact
    def __call__(self, h0, h1, edge_feat, rel_pos, mask, src_idx=None) -> Features:
        f_in = Fiber({0: self.l0_in_features, 1: self.l1_in_features})
        f_mid = Fiber(num_degrees=self.num_degrees, num_channels=self.num_channels)
        if self.l1_out_features > 0:
            f_out = Fiber({0: self.l0_out_features, 1: self.l1_out_features})
        else:
            f_out = Fiber({0: self.l0_out_features})

        basis = so3.equivariant_basis(rel_pos, self.num_degrees - 1)
        r = so3.edge_radii(rel_pos)
        feat = jnp.concatenate([edge_feat, r], axis=-1).astype(jnp.float32)

        def gather_src(h):
            if src_idx is None:
                return None
            return {
                d: jax.vmap(lambda hb, ib: hb[ib])(h[d], src_idx) for d in h
            }

        h = {0: h0.astype(jnp.float32), 1: h1.astype(jnp.float32)}
        fin = f_in
        for i in range(self.num_layers - 1):
            h = GConvSE3(
                fin, f_mid, self_interaction=self.use_self,
                edge_dim=self.num_edge_features, name=f"conv_{i}",
            )(h, feat, basis, mask, h_src=gather_src(h))
            h = GNormSE3(f_mid, num_layers=self.num_nonlin_layers, name=f"norm_{i}")(h)
            fin = f_mid
        h = GConvSE3(
            f_mid, f_out, self_interaction=self.use_self,
            edge_dim=self.num_edge_features, name="conv_out",
        )(h, feat, basis, mask, h_src=gather_src(h))
        return h


def fiber2tensor(feats: Features, fiber: Fiber) -> jnp.ndarray:
    """Concatenate per-degree features into a flat (..., n_features) tensor
    (reference fibers.py:153-160)."""
    parts = [
        feats[d].reshape(*feats[d].shape[:-2], fiber.dict[d] * (2 * d + 1))
        for d in fiber.degrees
    ]
    return jnp.concatenate(parts, axis=-1)


def tensor2fiber(x: jnp.ndarray, fiber: Fiber) -> Features:
    """Inverse of fiber2tensor (reference get_fiber_dict, fibers.py:119-137)."""
    out, idx = {}, 0
    for d in fiber.degrees:
        m = fiber.dict[d]
        length = m * (2 * d + 1)
        out[d] = x[..., idx : idx + length].reshape(*x.shape[:-1], m, 2 * d + 1)
        idx += length
    return out


def g_avg_pooling(feats: Features, node_mask=None, degree: int = 0) -> jnp.ndarray:
    """Masked mean over nodes (reference GAvgPooling, modules.py:931-954).

    feats[degree]: (B, L, m, 2d+1); node_mask (B, L) optional. Degree 0 returns
    (B, m); degree 1 returns (B, m, 3)."""
    v = feats[degree]
    if degree == 0:
        v = v[..., 0]
    if node_mask is None:
        return jnp.mean(v, axis=1)
    w = node_mask[:, :, None] if degree == 0 else node_mask[:, :, None, None]
    denom = jnp.maximum(jnp.sum(node_mask, axis=1), 1)
    denom = denom[:, None] if degree == 0 else denom[:, None, None]
    return jnp.sum(v * w, axis=1) / denom


def g_max_pooling(feats: Features, node_mask=None) -> jnp.ndarray:
    """Masked max over nodes of the degree-0 channel (reference GMaxPooling,
    modules.py:957-967). (B, L, m, 1) -> (B, m)."""
    v = feats[0][..., 0]
    if node_mask is not None:
        v = jnp.where(node_mask[:, :, None], v, -jnp.inf)
    return jnp.max(v, axis=1)


class ScalarActivation(nn.Module):
    """Scalar-field activation with optional learned bias (reference
    ScalarActivation3rdDim, utils_steerable.py:317-347): for (B, N, s) scalar
    fields, x -> activation(x + bias). Unused by the RoseTTAFold model (the
    reference keeps it as library surface); provided for parity."""

    n_dim: int
    activation: callable = jax.nn.relu
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.ndim == 3, "scalar fields are (B, N, s)"
        if self.use_bias and self.n_dim > 0:
            bias = self.param("bias", nn.initializers.zeros, (self.n_dim,))
            x = x + bias[None, None, :]
        return self.activation(x)

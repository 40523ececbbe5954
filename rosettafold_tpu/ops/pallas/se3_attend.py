"""Fused SE(3) neighborhood attention kernel (Pallas).

One GSE3Res layer's hot path (reference equivariant_attention/modules.py
246-325 and 683-774: the V/K partial convolutions + equivariant multi-head
attention) runs at ~5.6% of its bandwidth roofline as XLA einsums
(BENCHMARKS.md): every per-edge intermediate — the radial-MLP weights R
(up to mo*mi*nf floats/edge), the basis contraction t, the V/K messages,
the attention logits — is materialized in HBM between ops. This kernel
keeps the whole chain in VMEM per tile of T destination nodes:

    feat (ed, T*S) -> fc1 -> LN -> relu -> fc2 -> LN -> relu -> fc3
        = per-edge radial weights R^T (rows, T*S)       [one dot per stage]
    t[m,f,:] = sum_n basis[m,n,f] * h_src[:,n]          [VPU FMAs on planes]
    msg[o,m] = sum_{f,c} R[o,f,c] * t[m,f,c]            [VPU reduce]
    e[head]  = sum_ck k_msg * q_dst / sqrt(n_key)        -> masked softmax(S)
    out[o,m] = sum_S att[head(o)] * v_msg[o,m]

Layout: every per-edge scalar lives as a plane with the edge axes LAST —
(rows, T*S) 2D arrays with S padded to a multiple of 128 lanes, so
(T*S,) <-> (T, S) reshapes are tiling no-ops. The radial MLPs for all
2*|pairs| degree-pairs run as single stacked GEMMs with the edge axis in
lanes (M = 32*P sublanes). HBM traffic is the inputs once and the (J, F)
output — R/t/messages/logits never exist in HBM.

Supports the dense (S = L, src axis global, reference modules.py:114-243
masking semantics) and gather layouts; the src-major scatter path keeps the
XLA segment-op implementation. The layer-invariant planes (feat/basis/mask)
are prepped once per SE3Transformer call and shared by all GSE3Res layers
(prep_invariants), and gather-layout node features are gathered directly
into plane layout (gather_h_planes) — the per-layer transposes that made
the gather path lose to XLA in round 3's first pass no longer exist.

Backward: custom VJP through `xla_reference` (the same math as plain
einsums), row-chunked over destination nodes past 128 rows — the
whole-tensor recompute's per-edge temps have structured tiny trailing dims
(e.g. f32[J,S,3,3,16]) that pad 8-57x under TPU tiling and dominated the
L=512 train-step HBM peak; chunking bounds them by C/J (see _bwd_rule).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x, m):
    return -(-x // m) * m


class PairSpec(NamedTuple):
    branch: str  # 'v' | 'k'
    di: int
    do: int
    mi: int
    mo: int
    nf: int
    w3_off: int   # row offset into the stacked (permuted) fc3 weights
    w3_rows: int  # mo * nf * mi, before padding
    w3_pad: int   # rows padded to a multiple of 8


class Meta(NamedTuple):
    ed: int                      # edge feature dim (edge_dim + 1)
    pairs: Tuple[PairSpec, ...]  # v pairs then k pairs, (di, do) sorted
    f_in: Tuple[Tuple[int, int], ...]     # ((degree, mult), ...)
    f_value: Tuple[Tuple[int, int], ...]  # v output fiber (f_mid_out)
    f_key: Tuple[Tuple[int, int], ...]    # k output fiber (f_mid_in)
    n_heads: int


def build_meta(f_in_dict: Dict[int, int], f_value_dict: Dict[int, int],
               f_key_dict: Dict[int, int], n_heads: int, edge_dim: int) -> Meta:
    pairs: List[PairSpec] = []
    off = 0
    for branch, fiber in (("v", f_value_dict), ("k", f_key_dict)):
        for do in sorted(fiber):
            for di in sorted(f_in_dict):
                mi, mo = f_in_dict[di], fiber[do]
                nf = 2 * min(di, do) + 1
                rows = mo * nf * mi
                pad = _ceil_to(rows, 8)
                pairs.append(PairSpec(branch, di, do, mi, mo, nf, off, rows, pad))
                off += pad
    return Meta(
        ed=edge_dim + 1,
        pairs=tuple(pairs),
        f_in=tuple(sorted(f_in_dict.items())),
        f_value=tuple(sorted(f_value_dict.items())),
        f_key=tuple(sorted(f_key_dict.items())),
        n_heads=n_heads,
    )


def stack_weights(v_params, k_params, meta: Meta):
    """Stack the per-pair RadialFunc params (flax tree of GConvSE3Partial:
    pc_{di}_{do}/rp/{fc1,ln1,fc2,ln2,fc3}) into the kernel's GEMM operands.

    fc3 columns are PERMUTED from the reference (o, c, f) flattening
    (modules.py:283, x.view(-1, out, in, freq)) to (o, f, c) so that the
    in-kernel contraction reads contiguous mi-row blocks per (o, f).

    This runs inside every traced forward, so it is shaped as a handful of
    device ops: per-stage concats plus ONE static-index row-gather that
    applies all per-pair permutations and the 8-row padding at once."""
    w1, w2, m6, w3c, b3 = [], [], [], [], []
    perm_rows, off = [], 0
    for p in meta.pairs:
        rp = (v_params if p.branch == "v" else k_params)[f"pc_{p.di}_{p.do}"]["rp"]
        w1.append(rp["fc1"]["kernel"])           # (ed, 32)
        w2.append(rp["fc2"]["kernel"])           # (32, 32)
        m6.append(jnp.stack([
            rp["fc1"]["bias"], rp["ln1"]["scale"], rp["ln1"]["bias"],
            rp["fc2"]["bias"], rp["ln2"]["scale"], rp["ln2"]["bias"],
        ], axis=-1))                             # (32, 6)
        w3c.append(rp["fc3"]["kernel"])          # (32, rows)
        b3.append(rp["fc3"]["bias"])
        o, c, f = np.meshgrid(np.arange(p.mo), np.arange(p.mi),
                              np.arange(p.nf), indexing="ij")
        # row r = o*nf*mi + f*mi + c  <-  original column (o*mi + c)*nf + f
        perm = ((o * p.mi + c) * p.nf + f).transpose(0, 2, 1).reshape(-1) + off
        perm_rows.append(np.concatenate(
            [perm, np.full(p.w3_pad - p.w3_rows, -1, np.int64)]))
        off += p.w3_rows
    w3all = jnp.pad(jnp.concatenate(w3c, 1), ((0, 0), (0, 1)))  # (+1 zero col)
    b3all = jnp.pad(jnp.concatenate(b3, 0), (0, 1))
    idx = np.concatenate(perm_rows)
    idx = np.where(idx < 0, off, idx)            # pad rows -> the zero column
    return (jnp.concatenate(w1, 1).T.astype(jnp.float32),
            jnp.concatenate(m6, 0).astype(jnp.float32),
            jnp.concatenate(w2, 1).T.astype(jnp.float32),
            w3all.T[idx].astype(jnp.float32),
            b3all[idx][:, None].astype(jnp.float32))


def _head_cols(meta: Meta):
    """fiber2head column layout of q: per degree d the block is
    (h, (m//h)*(2d+1)), blocks concatenated over degrees (se3.py:69-77)."""
    offs, off = {}, 0
    for d, m in meta.f_key:
        offs[d] = off
        off += (m // meta.n_heads) * (2 * d + 1)
    return offs, off  # per-degree offset within a head block, head width ck


def _kernel(featT_ref, mask_ref, q_ref, h0_ref, h1_ref,
            b00_ref, b01_ref, b10_ref, b11_ref,
            w1t_ref, misc_ref, w2t_ref, w3t_ref, w3b_ref, o_ref, *,
            meta: Meta, T, S, bcast):
    f32 = jnp.float32
    TS = T * S
    SB = S // 128  # edge-flat arrays are S-block-major: (sb, t, lane) chunks
    f_in = dict(meta.f_in)
    basis_refs = {(0, 0): b00_ref, (0, 1): b01_ref,
                  (1, 0): b10_ref, (1, 1): b11_ref}

    # ---- stacked radial MLPs: fc1 over all pairs in ONE dot ----
    feat2 = featT_ref[0]                                   # (ed, TS)
    a1 = jax.lax.dot(w1t_ref[...], feat2,
                     preferred_element_type=f32)           # (32P, TS)
    a1 = a1 + misc_ref[:, 0:1]

    # per-edge-source feature planes; dense S==128 reads (K, S) once and
    # broadcasts across the tile in VMEM (S > 128 is pre-broadcast by prep —
    # the (K, T, S) reshape is only Mosaic-legal at S == 128)
    h_planes = {}
    for d, mi in meta.f_in:
        ref = h0_ref if d == 0 else h1_ref
        hp = ref[0]                                        # (K, TS) or (K, S)
        if bcast:
            K = hp.shape[0]
            hp = jnp.broadcast_to(hp[:, None, :], (K, T, S)).reshape(K, TS)
        h_planes[d] = hp

    # ---- per pair: LN -> relu -> fc2 -> LN -> relu -> fc3, then the
    # basis contraction and message accumulation, all on VMEM planes ----
    msg = {"v": {}, "k": {}}
    for pidx, p in enumerate(meta.pairs):
        r0 = 32 * pidx
        g = a1[r0:r0 + 32]                                 # (32, TS)
        mu = jnp.mean(g, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(g), axis=0, keepdims=True) - jnp.square(mu)
        g = (g - mu) * jax.lax.rsqrt(var + 1e-5)
        g = g * misc_ref[r0:r0 + 32, 1:2] + misc_ref[r0:r0 + 32, 2:3]
        g = jnp.maximum(g, 0.0)
        g = jax.lax.dot(w2t_ref[r0:r0 + 32], g,
                        preferred_element_type=f32) + misc_ref[r0:r0 + 32, 3:4]
        mu = jnp.mean(g, axis=0, keepdims=True)
        var = jnp.mean(jnp.square(g), axis=0, keepdims=True) - jnp.square(mu)
        g = (g - mu) * jax.lax.rsqrt(var + 1e-5)
        g = g * misc_ref[r0:r0 + 32, 4:5] + misc_ref[r0:r0 + 32, 5:6]
        g = jnp.maximum(g, 0.0)                            # (32, TS)
        rt = jax.lax.dot(w3t_ref[p.w3_off:p.w3_off + p.w3_pad], g,
                         preferred_element_type=f32)
        rt = rt + w3b_ref[p.w3_off:p.w3_off + p.w3_pad]    # (rows, TS)

        ni, no = 2 * p.di + 1, 2 * p.do + 1
        b = basis_refs[(p.di, p.do)][0]                    # (no*ni*nf, TS)
        hp = h_planes[p.di]                                # (ni*mi rows: n*mi+c)
        out_d = msg[p.branch].setdefault(p.do, {})
        for m in range(no):
            # t[f] = sum_n basis[m,n,f] * h[:, n]  -> (mi, TS) per f
            t_f = []
            for f in range(p.nf):
                acc = None
                for n in range(ni):
                    term = b[(m * ni + n) * p.nf + f:
                             (m * ni + n) * p.nf + f + 1] * hp[n * p.mi:
                                                               (n + 1) * p.mi]
                    acc = term if acc is None else acc + term
                t_f.append(acc)                            # (mi, TS)
            for o in range(p.mo):
                acc = None
                for f in range(p.nf):
                    r_blk = rt[o * p.nf * p.mi + f * p.mi:
                               o * p.nf * p.mi + (f + 1) * p.mi]
                    term = jnp.sum(r_blk * t_f[f], axis=0)  # (TS,)
                    acc = term if acc is None else acc + term
                key = (o, m)
                if key in out_d:
                    out_d[key] = out_d[key] + acc
                else:
                    out_d[key] = acc

    # ---- equivariant attention: e = k . q / sqrt(n_key), softmax over S ----
    # All (T, S) work runs per 128-lane S-block: flat chunk sb of a message
    # is contiguous (T*128,) -> (T, 128), and S-block sb of the natural-order
    # mask is the 128-aligned lane slice [:, sb*128:(sb+1)*128].
    H = meta.n_heads
    q = q_ref[0]                                           # (T, H*ck)
    maskf = mask_ref[0]                                    # (T, S) f32
    mchunks = [maskf[:, sb * 128:(sb + 1) * 128] > 0.5 for sb in range(SB)]
    head_offs, ck = _head_cols(meta)
    n_key = sum(m * (2 * d + 1) for d, m in meta.f_key)
    inv_sqrt = 1.0 / float(np.sqrt(n_key))

    def chunk(flat, sb):
        return flat[sb * T * 128:(sb + 1) * T * 128].reshape(T, 128)

    att = []  # per head: SB chunks of (T, 128) attention weights
    for hh in range(H):
        e_chunks = [jnp.zeros((T, 128), f32) for _ in range(SB)]
        for d, mk in meta.f_key:
            nd = 2 * d + 1
            mkh = mk // H
            for lc in range(mkh):
                c = hh * mkh + lc
                for m in range(nd):
                    col = hh * ck + head_offs[d] + lc * nd + m
                    kflat = msg["k"][d][(c, m)]
                    qc = q[:, col:col + 1]
                    for sb in range(SB):
                        e_chunks[sb] = e_chunks[sb] + chunk(kflat, sb) * qc
        e_chunks = [jnp.where(mc, ec * inv_sqrt, -1e9)
                    for ec, mc in zip(e_chunks, mchunks)]
        mx = jnp.max(e_chunks[0], axis=1, keepdims=True)
        for ec in e_chunks[1:]:
            mx = jnp.maximum(mx, jnp.max(ec, axis=1, keepdims=True))
        z_chunks = [jnp.where(mc, jnp.exp(ec - mx), 0.0)
                    for ec, mc in zip(e_chunks, mchunks)]
        den = z_chunks[0].sum(axis=1, keepdims=True)
        for zc in z_chunks[1:]:
            den = den + zc.sum(axis=1, keepdims=True)
        # the 1e-20 floor only matters on fully-masked padded dst rows,
        # which are sliced off by the caller
        den = jnp.maximum(den, 1e-20)
        att.append([zc / den for zc in z_chunks])

    # ---- attention-weighted sum over S, write (T, F) output columns ----
    col = 0
    for d, mv in meta.f_value:
        nd = 2 * d + 1
        mvh = mv // H
        for c in range(mv):
            a_chunks = att[c // mvh]
            for m in range(nd):
                vflat = msg["v"][d][(c, m)]
                val = jnp.sum(a_chunks[0] * chunk(vflat, 0),
                              axis=1, keepdims=True)       # (T, 1)
                for sb in range(1, SB):
                    val = val + jnp.sum(a_chunks[sb] * chunk(vflat, sb),
                                        axis=1, keepdims=True)
                o_ref[0, :, col:col + 1] = val.astype(o_ref.dtype)
                col += 1


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def default_tile(dense) -> int:
    # measured (BENCHMARKS.md): dense J=L wants more tiles in flight (8);
    # gather neighborhoods amortize per-program overheads better at 32
    return 8 if dense else 32


_BASIS_KEYS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _to_sbmajor(x, T, Jp, S):
    """Reorder a (..., Jp*S) edge-flat axis from (j, s)-major to S-block-major
    within each T-dst tile: (jt, sb, t, lane). Mosaic only supports the
    in-kernel flat->(T, lanes) reshape when lanes == 128, so every 128-lane
    S-block must be contiguous per tile. Identity when S == 128."""
    SB = S // 128
    if SB == 1:
        return x
    lead = x.shape[:-1]
    x = x.reshape(*lead, Jp // T, T, SB, 128)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, Jp * S)


def _from_sbmajor(x, T, Jp, S):
    SB = S // 128
    if SB == 1:
        return x
    lead = x.shape[:-1]
    x = x.reshape(*lead, Jp // T, SB, T, 128)
    x = jnp.swapaxes(x, -3, -2)
    return x.reshape(*lead, Jp * S)


class Prepped(NamedTuple):
    """Layer-invariant plane tensors: computed ONCE per SE3Transformer call
    and shared by every GSE3Res layer (edge features, mask and basis do not
    change between layers — reference se3_modules.py:164-170 computes
    basis+radii once per forward for the same reason)."""

    featT: Any   # (B, ed, Jp*S) f32
    maskf: Any   # (B, Jp, S) f32
    b00: Any     # (B, no*ni*nf, Jp*S) f32 planes, keys (di, do)
    b01: Any
    b10: Any
    b11: Any

    @property
    def basis_planes(self):
        return dict(zip(_BASIS_KEYS, (self.b00, self.b01, self.b10, self.b11)))


def prep_invariants(feat, basis, mask, T) -> Prepped:
    """Pad + transpose the layer-invariant edge tensors to plane layout.

    feat (B, J, S0, ed); basis dict '{di},{do}' -> (B, J, S0, no, ni, nf);
    mask (B, J, S0) bool. T is the dst tile the kernel will run with (Jp is
    padded to a multiple of it)."""
    B, J, S0 = mask.shape
    S = _ceil_to(S0, 128)
    Jp = _ceil_to(J, T)

    def pad_js(t, j_axis, s_axis):
        pads = [(0, 0)] * t.ndim
        pads[j_axis] = (0, Jp - J)
        pads[s_axis] = (0, S - S0)
        return jnp.pad(t, pads)

    ed = feat.shape[-1]
    featT = pad_js(feat, 1, 2).astype(jnp.float32)
    featT = jnp.moveaxis(featT, 3, 1).reshape(B, ed, Jp * S)
    featT = _to_sbmajor(featT, T, Jp, S)
    maskf = pad_js(mask.astype(jnp.float32), 1, 2)  # natural (B, Jp, S)

    planes = []
    for d_in, d_out in _BASIS_KEYS:
        b = basis[f"{d_in},{d_out}"].astype(jnp.float32)
        b = pad_js(b, 1, 2)  # (B, J, S, no, ni, nf)
        bp = jnp.transpose(b, (0, 3, 4, 5, 1, 2)).reshape(
            B, b.shape[3] * b.shape[4] * b.shape[5], Jp * S)
        planes.append(_to_sbmajor(bp, T, Jp, S))
    return Prepped(featT, maskf, *planes)


def prep_h_planes_dense(h, f_in, Jp, S, T):
    """Node features {d: (B, L, mi, 2d+1)} -> dense-src planes (rows n*mi+c).

    S == 128: (B, rows, S) — the kernel broadcasts across the dst tile in
    VMEM (cheapest read). S > 128: the in-kernel broadcast's (K, T, S)
    reshape is not Mosaic-legal, so the broadcast happens here instead:
    (B, rows, Jp*S) S-block-major planes, same as the gather layout."""
    planes = {}
    for d, mi in f_in:
        ni = 2 * d + 1
        t = h[d].astype(jnp.float32)
        B = t.shape[0]
        t = jnp.pad(t, ((0, 0), (0, S - t.shape[1]), (0, 0), (0, 0)))
        hp = jnp.moveaxis(t, (2, 3), (2, 1)).reshape(B, ni * mi, S)
        if S == 128:
            planes[d] = hp
        else:
            SB = S // 128
            full = jnp.broadcast_to(
                hp.reshape(B, ni * mi, 1, 1, SB, 128),
                (B, ni * mi, Jp // T, T, SB, 128))
            planes[d] = _to_sbmajor(
                full.reshape(B, ni * mi, Jp * S), T, Jp, S)
    return planes


def gather_h_planes(h, f_in, src_idx, Jp, S, T):
    """Gather node features directly INTO plane layout: one pass over the
    O(J*S) edge tensor instead of gather-then-transpose (the per-layer cost
    that made the fused kernel lose through the gather wrapper; BENCHMARKS.md
    'SE(3) fused kernel'). Padded (dst, slot) positions read node 0; the mask
    zeroes their attention weight in-kernel. The index array itself is
    reordered S-block-major so the single gather lands in kernel layout."""
    B, J, S0 = src_idx.shape
    idx = jnp.pad(src_idx, ((0, 0), (0, Jp - J), (0, S - S0))).reshape(B, Jp * S)
    idx = _to_sbmajor(idx, T, Jp, S)
    planes = {}
    for d, mi in f_in:
        ni = 2 * d + 1
        hp = jnp.moveaxis(h[d].astype(jnp.float32), (2, 3), (2, 1)).reshape(
            h[d].shape[0], ni * mi, h[d].shape[1])  # (B, rows, L)
        planes[d] = jax.vmap(lambda p, i: p[:, i])(hp, idx)  # (B, rows, Jp*S)
    return planes


def planes_from_gathered(h_src, f_in, Jp, S, T):
    """Pre-gathered (B, J, S0, mi, ni) neighborhoods -> plane layout (the
    legacy per-layer transpose path, kept for callers without src_idx)."""
    planes = {}
    for d, mi in f_in:
        ni = 2 * d + 1
        t = h_src[d].astype(jnp.float32)
        B, J, S0 = t.shape[:3]
        t = jnp.pad(t, ((0, 0), (0, Jp - J), (0, S - S0), (0, 0), (0, 0)))
        planes[d] = _to_sbmajor(
            jnp.transpose(t, (0, 4, 3, 1, 2)).reshape(B, ni * mi, Jp * S),
            T, Jp, S)
    return planes


def prep_qh(qh, Jp):
    return jnp.pad(qh.astype(jnp.float32),
                   ((0, 0), (0, Jp - qh.shape[1]), (0, 0)))


def _forward_planes(inv: Prepped, h0p, h1p, qhp, stacked, meta: Meta,
                    dense, T, J):
    B, Jp, S = inv.maskf.shape
    assert Jp % T == 0, (Jp, T)
    w1t, misc, w2t, w3t, w3b = stacked
    h_planes = {0: h0p, 1: h1p}
    basis_planes = inv.basis_planes
    featT, maskf = inv.featT, inv.maskf
    TS = T * S
    F = sum(m * (2 * d + 1) for d, m in meta.f_value)
    HCK = qhp.shape[-1]
    P32 = w1t.shape[0]
    NW3 = w3t.shape[0]

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, j: (0,) * len(shape))

    # dense S==128: (B, rows, S) shared-src planes, broadcast in-kernel;
    # otherwise (gather, or dense pre-broadcast at S>128): per-tile planes
    bcast = dense and S == 128
    if bcast:
        h_spec = lambda K: pl.BlockSpec((1, K, S), lambda b, j: (b, 0, 0))
    else:
        h_spec = lambda K: pl.BlockSpec((1, K, TS), lambda b, j: (b, 0, j))

    in_specs = [
        pl.BlockSpec((1, meta.ed, TS), lambda b, j: (b, 0, j)),   # featT
        pl.BlockSpec((1, T, S), lambda b, j: (b, j, 0)),          # mask
        pl.BlockSpec((1, T, HCK), lambda b, j: (b, j, 0)),        # q
        h_spec(h_planes[0].shape[1]),
        h_spec(h_planes[1].shape[1]),
    ]
    basis_args = []
    for key in ((0, 0), (0, 1), (1, 0), (1, 1)):
        bp = basis_planes[key]
        in_specs.append(pl.BlockSpec((1, bp.shape[1], TS),
                                     lambda b, j: (b, 0, j)))
        basis_args.append(bp)
    in_specs += [wspec((P32, meta.ed)), wspec((P32, 6)), wspec((P32, 32)),
                 wspec((NW3, 32)), wspec((NW3, 1))]

    kern = functools.partial(_kernel, meta=meta, T=T, S=S, bcast=bcast)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Jp, F), jnp.float32),
        grid=(B, Jp // T),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, F), lambda b, j: (b, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(featT, maskf, qhp, h_planes[0], h_planes[1], *basis_args,
      w1t, misc, w2t, w3t, w3b)

    out = out[:, :J]
    z, col = {}, 0
    for d, mv in meta.f_value:
        nd = 2 * d + 1
        z[d] = out[:, :, col:col + mv * nd].reshape(B, J, mv, nd)
        col += mv * nd
    return z


def xla_reference(feat, basis, h, mask, qh, stacked, meta: Meta, dense):
    """The same math as plain einsums over the stacked weights (tests and
    the recompute backward). Matches GConvSE3Partial + GMABSE3
    (se3.py:136-226, 385-427) bit-for-math on the unpadded inputs."""
    f32 = jnp.float32
    w1t, misc, w2t, w3t, w3b = stacked
    feat = feat.astype(f32)

    def ln(x, scale, bias):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    msg = {"v": {}, "k": {}}
    for pidx, p in enumerate(meta.pairs):
        r0 = 32 * pidx
        a = jnp.einsum("...e,ke->...k", feat, w1t[r0:r0 + 32]) + misc[r0:r0 + 32, 0]
        a = jax.nn.relu(ln(a, misc[r0:r0 + 32, 1], misc[r0:r0 + 32, 2]))
        a = jnp.einsum("...k,ok->...o", a, w2t[r0:r0 + 32]) + misc[r0:r0 + 32, 3]
        a = jax.nn.relu(ln(a, misc[r0:r0 + 32, 4], misc[r0:r0 + 32, 5]))
        rt = (jnp.einsum("...k,nk->...n", a, w3t[p.w3_off:p.w3_off + p.w3_rows])
              + w3b[p.w3_off:p.w3_off + p.w3_rows, 0])
        R = rt.reshape(*rt.shape[:-1], p.mo, p.nf, p.mi)  # permuted (o, f, c)
        b = basis[f"{p.di},{p.do}"].astype(f32)
        hd = h[p.di].astype(f32)
        if dense:
            t = jnp.einsum("bjimnf,bicn->bjimfc", b, hd)
        else:
            t = jnp.einsum("bjsmnf,bjscn->bjsmfc", b, hd)
        contrib = jnp.einsum("bjsofc,bjsmfc->bjsom", R, t)
        if p.do in msg[p.branch]:
            msg[p.branch][p.do] = msg[p.branch][p.do] + contrib
        else:
            msg[p.branch][p.do] = contrib

    H = meta.n_heads
    k_parts = []
    for d, mk in meta.f_key:
        kd = msg["k"][d]  # (B, J, S, mk, nd)
        k_parts.append(kd.reshape(*kd.shape[:3], H, (mk // H) * (2 * d + 1)))
    kh = jnp.concatenate(k_parts, axis=-1)                 # (B, J, S, H, ck)
    n_key = sum(m * (2 * d + 1) for d, m in meta.f_key)
    ck = kh.shape[-1]
    qr = qh.astype(f32).reshape(*qh.shape[:2], H, ck)      # (B, J, H, ck)
    e = jnp.einsum("bjshc,bjhc->bjsh", kh, qr) / float(np.sqrt(n_key))
    e = jnp.where(mask[..., None], e, -1e9)
    att = jax.nn.softmax(e, axis=2)
    att = jnp.where(mask[..., None], att, 0.0)             # (B, J, S, H)

    z = {}
    for d, mv in meta.f_value:
        nd = 2 * d + 1
        vd = msg["v"][d].reshape(*msg["v"][d].shape[:3], H, mv // H, nd)
        agg = jnp.einsum("bjsh,bjshcm->bjhcm", att, vd)
        z[d] = agg.reshape(*agg.shape[:2], mv, nd)
    return z


def _unprep(inv: Prepped, h0p, h1p, qhp, meta: Meta, dense, T):
    """Plane layout back to the (padded) original layouts, so xla_reference
    can serve as the recompute backward for the prepped forward. The padded
    dst rows / src slots are fully masked; the caller slices the output.

    Dense S>128 h planes are pre-broadcast per tile; the unprep reads tile 0
    (every tile holds the same values, so xla_reference computes the full
    dense gradient from it and the broadcast's vjp sums the rest as zeros)."""
    B, Jp, S = inv.maskf.shape
    featT = _from_sbmajor(inv.featT, T, Jp, S)
    feat = jnp.moveaxis(featT.reshape(B, meta.ed, Jp, S), 1, 3)
    basis = {}
    for (di, do), bp in inv.basis_planes.items():
        no, ni, nf = 2 * do + 1, 2 * di + 1, 2 * min(di, do) + 1
        bp = _from_sbmajor(bp, T, Jp, S)
        basis[f"{di},{do}"] = jnp.transpose(
            bp.reshape(B, no, ni, nf, Jp, S), (0, 4, 5, 1, 2, 3))
    h = {}
    for d, hp in ((0, h0p), (1, h1p)):
        ni = 2 * d + 1
        mi = hp.shape[1] // ni
        if dense and hp.shape[-1] == S:
            h[d] = jnp.transpose(hp.reshape(B, ni, mi, S), (0, 3, 2, 1))
        elif dense:
            hp = _from_sbmajor(hp, T, Jp, S).reshape(B, ni, mi, Jp, S)
            h[d] = jnp.transpose(hp[..., 0, :], (0, 3, 2, 1))
        else:
            hp = _from_sbmajor(hp, T, Jp, S)
            h[d] = jnp.transpose(
                hp.reshape(B, ni, mi, Jp, S), (0, 3, 4, 2, 1))
    return feat, basis, h, inv.maskf > 0.5, qhp


def _planes_reference(inv, h0p, h1p, qhp, stacked, meta, dense, T, J):
    feat, basis, h, mask, qh = _unprep(inv, h0p, h1p, qhp, meta, dense, T)
    z = xla_reference(feat, basis, h, mask, qh, stacked, meta, dense)
    return {d: v[:, :J] for d, v in z.items()}


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def gse3_attend_planes(inv: Prepped, h0p, h1p, qhp, stacked, meta: Meta,
                       dense, tile, J):
    """Fused V/K partial-conv + equivariant attention on pre-prepped plane
    tensors. `inv` (prep_invariants) is layer-invariant and shared across the
    GSE3Res layers of one SE3Transformer call; h0p/h1p/qhp are per-layer
    (prep_h_planes_dense / gather_h_planes / prep_qh). Returns
    {d: (B, J, m_v, 2d+1)} — the GMABSE3 output z."""
    return _forward_planes(inv, h0p, h1p, qhp, stacked, meta, dense, tile, J)


def _fwd_rule(inv, h0p, h1p, qhp, stacked, meta, dense, tile, J):
    out = _forward_planes(inv, h0p, h1p, qhp, stacked, meta, dense, tile, J)
    return out, (inv, h0p, h1p, qhp, stacked)


# Rows per chunk of the recompute backward (None = auto). The whole-tensor
# xla_reference vjp materializes per-edge temps with structured tiny trailing
# dims — f32[J,S,3,3,16]-shaped dot_generals pad 8-57x under TPU (4,128)/
# (8,128) tiling and were the top HBM allocations of the L=512 train-step OOM
# (19.6 GB; 4 of the top 9 were these temps at ~1 GB padded each). Chunking
# the backward over destination rows bounds them by C/J. Tests override this
# to force multi-chunk runs at tiny shapes.
_BWD_ROW_CHUNK = None


def _bwd_chunk_rows(Jp):
    if _BWD_ROW_CHUNK is not None:
        return min(_BWD_ROW_CHUNK, Jp)
    # Below ~128 dst rows (the L<=128 headline training regime) the padded
    # temps are < ~300 MB — the whole-tensor vjp is fine and faster.
    return 64 if Jp > 128 else None


def _bwd_rule(meta, dense, tile, J, res, g):
    inv, h0p, h1p, qhp, stacked = res
    B, Jp, S = inv.maskf.shape
    C = _bwd_chunk_rows(Jp)
    if C is None or C >= Jp:
        _, vjp = jax.vjp(
            lambda i_, h0_, h1_, q_, s_: _planes_reference(
                i_, h0_, h1_, q_, s_, meta, dense, tile, J),
            inv, h0p, h1p, qhp, stacked)
        return vjp(g)

    # Row-chunked recompute backward. The attention math is independent per
    # destination row j (the softmax runs over each row's own S slots), so
    # the vjp of xla_reference over a C-row slice is the exact slice of the
    # full vjp; only the weight grads (and dense-mode h, which is indexed by
    # src) sum across chunks.
    def unprep_diff(i_, h0_, h1_, q_):
        feat, basis, h, _, qh = _unprep(i_, h0_, h1_, q_, meta, dense, tile)
        return feat, basis, h, qh

    (feat, basis, h, qh), unprep_vjp = jax.vjp(
        unprep_diff, inv, h0p, h1p, qhp)
    mask = inv.maskf > 0.5

    # Pad the output cotangent J -> Jp rows (padded rows are fully masked:
    # their z is identically 0 and their grads vanish), then Jp -> n*C.
    Jc = _ceil_to(Jp, C)

    def pad_rows(t, to):
        return jnp.pad(t, [(0, 0), (0, to - t.shape[1])] +
                       [(0, 0)] * (t.ndim - 2))

    gp = {d: pad_rows(gd, Jc) for d, gd in g.items()}
    featp, qhp_f = pad_rows(feat, Jc), pad_rows(qh, Jc)
    basisp = {k: pad_rows(v, Jc) for k, v in basis.items()}
    maskp = pad_rows(mask, Jc)
    h_perrow = not dense
    hp_ = {d: pad_rows(v, Jc) for d, v in h.items()} if h_perrow else h

    def body(carry, ci):
        d_feat, d_b, d_h, d_qh, d_stacked = carry
        j0 = ci * C
        sl = lambda t: jax.lax.dynamic_slice_in_dim(t, j0, C, axis=1)
        mask_c = sl(maskp)
        h_c = {d: sl(v) for d, v in hp_.items()} if h_perrow else hp_

        def f(f_, b_, h_, q_, s_):
            return xla_reference(f_, b_, h_, mask_c, q_, s_, meta, dense)

        _, vjp_c = jax.vjp(f, sl(featp), {k: sl(v) for k, v in basisp.items()},
                           h_c, sl(qhp_f), stacked)
        df, db, dh, dq, ds = vjp_c({d: sl(v) for d, v in gp.items()})
        upd = lambda buf, v: jax.lax.dynamic_update_slice_in_dim(
            buf, v.astype(buf.dtype), j0, axis=1)
        d_feat = upd(d_feat, df)
        d_b = {k: upd(d_b[k], db[k]) for k in d_b}
        d_h = ({d: upd(d_h[d], dh[d]) for d in d_h} if h_perrow
               else jax.tree.map(lambda a, x: a + x.astype(a.dtype), d_h, dh))
        d_qh = upd(d_qh, dq)
        d_stacked = jax.tree.map(
            lambda a, x: a + x.astype(a.dtype), d_stacked, ds)
        return (d_feat, d_b, d_h, d_qh, d_stacked), None

    zeros = lambda t: jnp.zeros(t.shape, t.dtype)
    init = (zeros(featp), {k: zeros(v) for k, v in basisp.items()},
            jax.tree.map(zeros, hp_), zeros(qhp_f),
            jax.tree.map(zeros, stacked))
    (d_feat, d_b, d_h, d_qh, d_stacked), _ = jax.lax.scan(
        body, init, jnp.arange(Jc // C))

    crop = lambda t: t[:, :Jp]
    d_h = {d: crop(v) for d, v in d_h.items()} if h_perrow else d_h
    d_inv, d_h0p, d_h1p, d_qhp = unprep_vjp(
        (crop(d_feat), {k: crop(v) for k, v in d_b.items()}, d_h,
         crop(d_qh)))
    return d_inv, d_h0p, d_h1p, d_qhp, d_stacked


gse3_attend_planes.defvjp(_fwd_rule, _bwd_rule)


def gse3_attend(feat, basis, h, mask, qh, stacked, meta: Meta, dense,
                tile=None):
    """Single-layer convenience wrapper (preps inline, then runs the fused
    kernel). Multi-layer callers should prep_invariants once and call
    gse3_attend_planes per layer instead.

    feat (B, J, S, ed); basis: dict '{di},{do}' -> (B, J, S, no, ni, nf);
    h: {0: ..., 1: ...} node features — dense: (B, L, mi, ni) with S == L;
    gather: pre-gathered (B, J, S, mi, ni). mask (B, J, S) bool. qh
    (B, J, H*ck) from fiber2head. stacked: stack_weights(...) output.
    Returns {d: (B, J, m_v, 2d+1)} — the GMABSE3 output z."""
    T = tile if tile is not None else default_tile(dense)
    inv = prep_invariants(feat, basis, mask, T)
    Jp, S = inv.maskf.shape[1:3]
    if dense:
        hp = prep_h_planes_dense(h, meta.f_in, Jp, S, T)
    else:
        hp = planes_from_gathered(h, meta.f_in, Jp, S, T)
    qhp = prep_qh(qh, Jp)
    return gse3_attend_planes(inv, hp[0], hp[1], qhp, stacked, meta, dense,
                              T, mask.shape[1])

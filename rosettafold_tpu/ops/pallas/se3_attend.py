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
masking semantics) and gather ((J, S) pre-gathered neighborhoods) layouts;
the src-major scatter path keeps the XLA segment-op implementation.

Backward: custom VJP through `xla_reference` (the same math as plain
einsums); at training sizes the XLA recompute is bandwidth-equivalent to
the old forward, so memory is unchanged and the fused forward is the win.
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
            meta: Meta, T, S, dense):
    f32 = jnp.float32
    TS = T * S
    f_in = dict(meta.f_in)
    basis_refs = {(0, 0): b00_ref, (0, 1): b01_ref,
                  (1, 0): b10_ref, (1, 1): b11_ref}

    # ---- stacked radial MLPs: fc1 over all pairs in ONE dot ----
    feat2 = featT_ref[0]                                   # (ed, TS)
    a1 = jax.lax.dot(w1t_ref[...], feat2,
                     preferred_element_type=f32)           # (32P, TS)
    a1 = a1 + misc_ref[:, 0:1]

    # per-edge-source feature planes, broadcast across the tile for dense
    h_planes = {}
    for d, mi in meta.f_in:
        ref = h0_ref if d == 0 else h1_ref
        hp = ref[0]                                        # (K, TS) or (K, S)
        if dense:
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
    H = meta.n_heads
    q = q_ref[0]                                           # (T, H*ck)
    maskf = mask_ref[0]                                    # (T, S) f32
    head_offs, ck = _head_cols(meta)
    n_key = sum(m * (2 * d + 1) for d, m in meta.f_key)
    inv_sqrt = 1.0 / float(np.sqrt(n_key))

    att = []
    for hh in range(H):
        e = jnp.zeros((T, S), f32)
        for d, mk in meta.f_key:
            nd = 2 * d + 1
            mkh = mk // H
            for lc in range(mkh):
                c = hh * mkh + lc
                for m in range(nd):
                    col = hh * ck + head_offs[d] + lc * nd + m
                    e = e + (msg["k"][d][(c, m)].reshape(T, S)
                             * q[:, col:col + 1])
        e = e * inv_sqrt
        e = jnp.where(maskf > 0.5, e, -1e9)
        mx = jnp.max(e, axis=1, keepdims=True)
        z = jnp.exp(e - mx)
        z = jnp.where(maskf > 0.5, z, 0.0)
        # the 1e-20 floor only matters on fully-masked padded dst rows,
        # which are sliced off by the caller
        att.append(z / jnp.maximum(jnp.sum(z, axis=1, keepdims=True), 1e-20))

    # ---- attention-weighted sum over S, write (T, F) output columns ----
    col = 0
    for d, mv in meta.f_value:
        nd = 2 * d + 1
        mvh = mv // H
        for c in range(mv):
            a = att[c // mvh]
            for m in range(nd):
                val = jnp.sum(a * msg["v"][d][(c, m)].reshape(T, S),
                              axis=1, keepdims=True)       # (T, 1)
                o_ref[0, :, col:col + 1] = val.astype(o_ref.dtype)
                col += 1


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _prep_planes(feat, basis, h, mask, qh, meta: Meta, dense, T):
    """Pad + transpose the edge tensors to the kernel's plane layout."""
    B, J, S0 = mask.shape
    S = _ceil_to(S0, 128)
    Jp = _ceil_to(J, T)

    def pad_js(t, j_axis, s_axis):
        pads = [(0, 0)] * t.ndim
        pads[j_axis] = (0, Jp - J)
        pads[s_axis] = (0, S - S0)
        return jnp.pad(t, pads)

    featT = pad_js(feat, 1, 2).astype(jnp.float32)
    featT = jnp.moveaxis(featT, 3, 1).reshape(B, meta.ed, Jp * S)
    maskf = pad_js(mask.astype(jnp.float32), 1, 2)
    qhp = jnp.pad(qh.astype(jnp.float32), ((0, 0), (0, Jp - J), (0, 0)))

    h_planes = {}
    for d, mi in meta.f_in:
        ni = 2 * d + 1
        if dense:
            # h[d]: (B, L, mi, ni) node-major; src axis == S
            t = jnp.pad(h[d].astype(jnp.float32), ((0, 0), (0, S - S0),
                                                   (0, 0), (0, 0)))
            h_planes[d] = jnp.moveaxis(t, (2, 3), (2, 1)).reshape(
                B, ni * mi, S)  # rows n*mi + c
        else:
            t = pad_js(h[d].astype(jnp.float32), 1, 2)  # (B, J, S, mi, ni)
            h_planes[d] = jnp.transpose(t, (0, 4, 3, 1, 2)).reshape(
                B, ni * mi, Jp * S)

    basis_planes = {}
    for d_in, _ in meta.f_in:
        for d_out in sorted({p.do for p in meta.pairs}):
            b = basis[f"{d_in},{d_out}"].astype(jnp.float32)
            b = pad_js(b, 1, 2)  # (B, J, S, no, ni, nf)
            basis_planes[(d_in, d_out)] = jnp.transpose(
                b, (0, 3, 4, 5, 1, 2)
            ).reshape(B, b.shape[3] * b.shape[4] * b.shape[5], Jp * S)

    return featT, maskf, qhp, h_planes, basis_planes, S, Jp


def _forward(feat, basis, h, mask, qh, stacked, meta: Meta, dense, T):
    if T is None:
        # measured (BENCHMARKS.md): dense J=L wants more tiles in flight (8);
        # gather neighborhoods amortize per-program overheads better at 32
        T = 8 if dense else 32
    B, J = mask.shape[:2]
    w1t, misc, w2t, w3t, w3b = stacked
    featT, maskf, qhp, h_planes, basis_planes, S, Jp = _prep_planes(
        feat, basis, h, mask, qh, meta, dense, T)
    TS = T * S
    F = sum(m * (2 * d + 1) for d, m in meta.f_value)
    HCK = qh.shape[-1]
    P32 = w1t.shape[0]
    NW3 = w3t.shape[0]

    def wspec(shape):
        return pl.BlockSpec(shape, lambda b, j: (0,) * len(shape))

    if dense:
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

    kern = functools.partial(_kernel, meta=meta, T=T, S=S, dense=dense)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def gse3_attend(feat, basis, h, mask, qh, stacked, meta: Meta, dense, tile=None):
    """Fused V/K partial-conv + equivariant attention (one GSE3Res hot path).

    feat (B, J, S, ed); basis: dict '{di},{do}' -> (B, J, S, no, ni, nf);
    h: {0: ..., 1: ...} node features — dense: (B, L, mi, ni) with S == L;
    gather: pre-gathered (B, J, S, mi, ni). mask (B, J, S) bool. qh
    (B, J, H*ck) from fiber2head. stacked: stack_weights(...) output.
    Returns {d: (B, J, m_v, 2d+1)} — the GMABSE3 output z."""
    return _forward(feat, basis, h, mask, qh, stacked, meta, dense, tile)


def _fwd_rule(feat, basis, h, mask, qh, stacked, meta, dense, tile):
    out = _forward(feat, basis, h, mask, qh, stacked, meta, dense, tile)
    return out, (feat, basis, h, mask, qh, stacked)


def _bwd_rule(meta, dense, tile, res, g):
    feat, basis, h, mask, qh, stacked = res
    _, vjp = jax.vjp(
        lambda f_, b_, h_, q_, s_: xla_reference(f_, b_, h_, mask, q_, s_,
                                                 meta, dense),
        feat, basis, h, qh, stacked)
    df, db, dh, dq, ds = vjp(g)
    return df, db, dh, None, dq, ds


gse3_attend.defvjp(_fwd_rule, _bwd_rule)

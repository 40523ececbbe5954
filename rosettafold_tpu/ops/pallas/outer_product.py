"""Fused outer-product-mean kernel (Pallas).

The OPM (reference rosettafold_pytorch.py:412-427) computes

    op[b,i,j,(u,v)] = sum_n x[b,n,i,u] * y[b,n,j,v]      (u = v = d_proj = 32)
    out = LayerNorm(op) @ W + bias                        (u*v=1024 -> d_pair)

XLA materializes op as a (B, L, L, 1024) f32 intermediate — 4.3 GB at L=1024
— then LayerNorms and projects it: 43.6 ms standalone plus 7 x 12.9 ms layout
copies in context (profiles/l1024_r3/ANALYSIS.md). This kernel computes one
output row i per program with op_i living only in VMEM:

    op_i = Y_cat @ BD_i            -- ONE K = N*u MXU matmul, where
        Y_cat (L, N*u) is the j-side features (VMEM-resident for the whole
        grid: constant-index block), and
        BD_i[(n,v), (u,v')] = x[n,i,u] * delta_{v,v'} is the block-diagonal
        expansion of x_i, built from two tiny iota-masked dots (everything
        stays 2D — Mosaic has no legal relayout for the lane-splitting
        reshapes a gather-style construction would need).
    out_i = LN(op_i) @ W + bias    -- VPU LayerNorm + one (L,uv)x(uv,Dp) dot.

HBM traffic is x, y and the output only. Backward: custom VJP recomputes
through the row-chunked XLA reference (the same memory profile the training
path already uses via OPM chunk_size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, yt_ref, gb_ref, w_ref, b_ref, o_ref, *, n_seq, u, eps):
    f32 = jnp.float32
    cdt = yt_ref.dtype
    x_i = x_ref[0, 0]                   # (N, u)
    uv = u * u
    nu = n_seq * u

    # BD[(n,v), (u,v')] = x[n,u] * delta_{v,v'}, built 2D-only:
    #   xg[r, u']   = x[r // u, u']        (E1 @ x_i with E1[r,n]=[r//u==n])
    #   XG[r, c]    = xg[r, c // u]        (xg @ E2 with E2[u',c]=[u'==c//u])
    #   BD          = XG * [r%u == c%u]
    r_id = jax.lax.broadcasted_iota(jnp.int32, (nu, n_seq), 0)
    n_id = jax.lax.broadcasted_iota(jnp.int32, (nu, n_seq), 1)
    e1 = (r_id // u == n_id).astype(cdt)                     # (N*u, N)
    xg = jax.lax.dot(e1, x_i.astype(cdt), preferred_element_type=f32)
    u_id = jax.lax.broadcasted_iota(jnp.int32, (u, uv), 0)
    c_id = jax.lax.broadcasted_iota(jnp.int32, (u, uv), 1)
    e2 = (u_id == c_id // u).astype(cdt)                     # (u, u*u)
    xgc = jax.lax.dot(xg.astype(cdt), e2, preferred_element_type=f32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (nu, uv), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (nu, uv), 1)
    bd = jnp.where(rr % u == cc % u, xgc, 0.0).astype(cdt)   # (N*u, u*u)

    yt = yt_ref[0]                                           # (L, N*u)
    op = jax.lax.dot(yt, bd, preferred_element_type=f32)     # (L, uv) f32

    mu = jnp.mean(op, axis=-1, keepdims=True)
    var = jnp.mean((op - mu) ** 2, axis=-1, keepdims=True)
    gamma = gb_ref[0:1, :]                                   # (1, uv)
    beta = gb_ref[1:2, :]
    ln = (op - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    out = jax.lax.dot(ln.astype(cdt), w_ref[...],
                      preferred_element_type=f32)            # (L, Dp)
    o_ref[0, 0] = (out + b_ref[...].astype(f32)).astype(o_ref.dtype)


def _interpret():
    return jax.default_backend() not in ("tpu", "axon")


def _forward(x, y, gamma, beta, w, b, eps, out_dtype):
    """x, y: (B, N, L, u) [i-side, j-side]; returns (B, L, L, Dp)."""
    B, N, L, u = x.shape
    Dp = w.shape[-1]
    cdt = y.dtype

    yt = jnp.moveaxis(y, 1, 2).reshape(B, L, N * u)           # (B, L, N*u)
    xi = jnp.moveaxis(x, 1, 2).astype(jnp.float32)            # (B, L, N, u)
    gb = jnp.stack([gamma, beta], axis=0).astype(jnp.float32)  # (2, u*u)

    kern = functools.partial(_kernel, n_seq=N, u=u, eps=eps)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, L, L, Dp), out_dtype),
        grid=(B, L),
        in_specs=[
            pl.BlockSpec((1, 1, N, u), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, L, N * u), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((2, u * u), lambda b, i: (0, 0)),
            pl.BlockSpec((u * u, Dp), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Dp), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, L, Dp), lambda b, i: (b, i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(xi, yt, gb, w.astype(cdt), b.reshape(1, Dp))
    return out


def _row_block(x_rows, y, gamma, beta, w, b, eps, out_dtype):
    """The OPM math for a chunk of i-rows: outer-product sum over N, LayerNorm
    over (u*v), projection. Single source of truth for the plain-XLA forward
    (xla_reference) AND the backward recompute (_bwd) so an eps/dtype change
    cannot desynchronize them from each other (advisor r4)."""
    u = x_rows.shape[-1]
    op = jnp.einsum("bniu,bnjv->bijuv", x_rows, y)
    op = op.reshape(*op.shape[:3], u * u).astype(jnp.float32)
    mu = jnp.mean(op, axis=-1, keepdims=True)
    var = jnp.mean((op - mu) ** 2, axis=-1, keepdims=True)
    ln = (op - mu) * jax.lax.rsqrt(var + eps) * gamma + beta
    return (ln.astype(x_rows.dtype) @ w + b).astype(out_dtype)


def xla_reference(x, y, gamma, beta, w, b, eps, out_dtype, chunk=128):
    """Row-chunked plain-XLA OPM (backward recompute path; equals
    models/pair.OuterProductMean's math)."""
    B, N, L, u = x.shape

    def block(x_rows):
        return _row_block(x_rows, y, gamma, beta, w, b, eps, out_dtype)

    if L <= chunk:
        return block(x)
    outs = [block(x[:, :, i: i + chunk]) for i in range(0, L, chunk)]
    return jnp.concatenate(outs, axis=1)


# i-rows recomputed per backward scan step (tests shrink it to cover the
# scan + ragged-padding path at toy sizes)
_BWD_CHUNK = 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_outer_product_mean(x, y, gamma, beta, w, b, eps=1e-5,
                             out_dtype=jnp.float32):
    """Fused OPM: x (i-side) and y (j-side) are (B, N, L, u); gamma/beta are
    the (u*u,) LayerNorm affine, w (u*u, Dp), b (Dp,)."""
    return _forward(x, y, gamma, beta, w, b, eps, out_dtype)


def _fwd(x, y, gamma, beta, w, b, eps, out_dtype):
    return _forward(x, y, gamma, beta, w, b, eps, out_dtype), (x, y, gamma, beta, w, b)


def _bwd(eps, out_dtype, res, g):
    """Chunked-recompute backward, SERIALIZED via lax.scan.

    The r3 backward took jax.vjp of the whole unrolled chunk list; XLA then
    kept several chunks' (B, c, L, u*u) f32 op intermediates alive at once —
    6 x 256 MB of the L=512 train-step OOM's 4.84 GB overshoot came from this
    one op (see BENCHMARKS.md "Remote-compile helper limit"/training notes).
    scan makes the per-chunk recompute sequential by construction, so the
    backward's working set is ONE chunk regardless of L."""
    x, y, gamma, beta, w, b = res
    B, N, L, u = x.shape
    c = _BWD_CHUNK

    def block_fn(x_rows, y_, gamma_, beta_, w_, b_):
        return _row_block(x_rows, y_, gamma_, beta_, w_, b_, eps, out_dtype)

    if L <= c:
        _, vjp = jax.vjp(block_fn, x, y, gamma, beta, w, b)
        return vjp(g)

    f32 = jnp.float32
    Lp = -(-L // c) * c
    if Lp != L:
        # pad the i-side rows and their cotangent with zeros: vjp is linear
        # in g, so padded rows contribute exactly zero to every accumulator
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Lp - L), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, Lp - L), (0, 0), (0, 0)))

    def step(carry, i0):
        dy, dgamma, dbeta, dw, db = carry
        x_rows = jax.lax.dynamic_slice_in_dim(x, i0, c, axis=2)
        g_rows = jax.lax.dynamic_slice_in_dim(g, i0, c, axis=1)
        _, vjp = jax.vjp(block_fn, x_rows, y, gamma, beta, w, b)
        dxc, dyc, dgc, dbec, dwc, dbc = vjp(g_rows)
        carry = (dy + dyc.astype(f32), dgamma + dgc.astype(f32),
                 dbeta + dbec.astype(f32), dw + dwc.astype(f32),
                 db + dbc.astype(f32))
        return carry, dxc

    init = (jnp.zeros(y.shape, f32), jnp.zeros(gamma.shape, f32),
            jnp.zeros(beta.shape, f32), jnp.zeros(w.shape, f32),
            jnp.zeros(b.shape, f32))
    (dy, dgamma, dbeta, dw, db), dx_chunks = jax.lax.scan(
        step, init, jnp.arange(0, Lp, c))
    # (K, B, N, c, u) -> (B, N, Lp, u) -> drop row padding
    dx = jnp.moveaxis(dx_chunks, 0, 2).reshape(B, N, Lp, u)[:, :, :L]
    return (dx, dy.astype(y.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype), dw.astype(w.dtype), db.astype(b.dtype))


fused_outer_product_mean.defvjp(_fwd, _bwd)

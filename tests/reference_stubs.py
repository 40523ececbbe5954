"""Runnable stand-ins for the reference's uninstallable dependencies.

The parity suite (tests/test_parity.py) runs the *actual* reference package from
/root/reference against this repo. The reference imports four packages that are
not in this image: dgl, pytorch_lightning, performer_pytorch, lie_learn. This
module installs functional sys.modules stubs for all four so the reference code
executes unmodified:

  * dgl           — a minimal message-passing graph engine in pure torch
                    (segment mean/sum reductions, apply_edges with UDFs,
                    e_dot_v, edge_softmax grouped by destination node). This is
                    our own implementation of the DGL API surface the reference
                    touches (equivariant_attention/modules.py:217-243,655-680,
                    738-774; rosettafold_pytorch.py:853-860).
  * performer_pytorch — a faithful FAVOR+ SelfAttention (softmax-kernel and
                    generalized ReLU-kernel random-feature attention) whose
                    projection_matrix buffer can be injected, so both sides of a
                    parity test can share the same random features. NOTE: the
                    key-feature stabilizer is max over the last two axes
                    (matching rosettafold_tpu.ops.performer); the upstream
                    library uses a global max — the difference cancels in the
                    attention ratio up to the +eps term (<1e-4 relative).
  * lie_learn     — wigner_D_matrix delegated to this repo's own float64
                    Wigner-D (rosettafold_tpu.ops.so3.irr_repr_np), which is
                    validated against the reference's SO3 self-test identities
                    in tests/test_so3.py.
  * pytorch_lightning — LightningModule = torch.nn.Module (the reference only
                    subclasses it; every hook is a stub).

Call install() before importing the reference; load_reference() does both.
"""

from __future__ import annotations

import math
import sys
import types
from contextlib import contextmanager

import numpy as np
import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


# --------------------------------------------------------------------------- #
# mini-DGL: graphs as (src, dst) index tensors + segment reductions
# --------------------------------------------------------------------------- #


class _Rows:
    """Per-edge view of a node-data dict: rows[k] == data[k][idx]."""

    def __init__(self, data, idx):
        self._data, self._idx = data, idx

    def __getitem__(self, key):
        return self._data[key][self._idx]


class _EdgeBatch:
    """The object DGL hands to edge UDFs: .src / .dst index node data by the
    edge endpoints; .data is the edge-data dict itself."""

    def __init__(self, g):
        self.src = _Rows(g.ndata, g.src_idx)
        self.dst = _Rows(g.ndata, g.dst_idx)
        self.data = g.edata


class _Reducer:
    def __init__(self, op, msg_field, out_field):
        self.op, self.msg_field, self.out_field = op, msg_field, out_field


class _EDotV:
    """Builtin apply_edges fn: edata[lhs] . ndata[rhs][dst] -> edata[out],
    dot over the last axis with keepdim (new-DGL shape convention)."""

    def __init__(self, lhs, rhs, out):
        self.lhs, self.rhs, self.out = lhs, rhs, out

    def __call__(self, g):
        e = g.edata[self.lhs]
        v = g.ndata[self.rhs][g.dst_idx]
        return {self.out: (e * v).sum(dim=-1, keepdim=True)}


def _segment_sum(values, index, n):
    out = torch.zeros((n,) + values.shape[1:], dtype=values.dtype)
    out.index_add_(0, index, values)
    return out


def _segment_mean(values, index, n):
    s = _segment_sum(values, index, n)
    cnt = torch.zeros(n, dtype=values.dtype).index_add_(
        0, index, torch.ones(index.shape[0], dtype=values.dtype)
    )
    cnt = cnt.clamp(min=1.0).view((n,) + (1,) * (values.dim() - 1))
    return s / cnt


class MiniDGLGraph:
    def __init__(self, src, dst, num_nodes=None):
        self.src_idx = torch.as_tensor(src, dtype=torch.long)
        self.dst_idx = torch.as_tensor(dst, dtype=torch.long)
        if num_nodes is None:
            num_nodes = int(torch.max(torch.cat([self.src_idx, self.dst_idx])) + 1)
        self._num_nodes = int(num_nodes)
        self.ndata = {}
        self.edata = {}

    # the reference calls .to(device) right after construction
    def to(self, device):
        self.src_idx = self.src_idx.to(device)
        self.dst_idx = self.dst_idx.to(device)
        return self

    def number_of_nodes(self):
        return self._num_nodes

    def number_of_edges(self):
        return self.src_idx.shape[0]

    @contextmanager
    def local_scope(self):
        ndata, edata = dict(self.ndata), dict(self.edata)
        try:
            yield self
        finally:
            self.ndata, self.edata = ndata, edata

    def _edge_results(self, func):
        if isinstance(func, _EDotV):
            return func(self)
        return func(_EdgeBatch(self))

    def apply_edges(self, func):
        self.edata.update(self._edge_results(func))

    def update_all(self, message_func, reduce_func):
        msgs = self._edge_results(message_func)
        m = msgs[reduce_func.msg_field]
        if reduce_func.op == "sum":
            out = _segment_sum(m, self.dst_idx, self._num_nodes)
        elif reduce_func.op == "mean":
            out = _segment_mean(m, self.dst_idx, self._num_nodes)
        else:  # pragma: no cover
            raise NotImplementedError(reduce_func.op)
        self.ndata[reduce_func.out_field] = out


def mini_edge_softmax(graph, e):
    """Softmax over incoming edges per destination node (DGL edge_softmax)."""
    dst, n = graph.dst_idx, graph._num_nodes
    shape = (n,) + e.shape[1:]
    mx = torch.full(shape, float("-inf"), dtype=e.dtype)
    mx = mx.index_reduce(0, dst, e, "amax", include_self=True)
    z = torch.exp(e - mx[dst])
    denom = _segment_sum(z, dst, n)
    return z / denom[dst]


def _build_dgl_module():
    dgl = types.ModuleType("dgl")
    dgl.__version__ = "1.1.2"  # > 0.4.4 -> reference takes the new-DGL shape path
    dgl.DGLGraph = MiniDGLGraph

    def graph(edges, num_nodes=None):
        src, dst = edges
        return MiniDGLGraph(src, dst, num_nodes=num_nodes)

    dgl.graph = graph

    fn_mod = types.ModuleType("dgl.function")
    fn_mod.mean = lambda msg, out: _Reducer("mean", msg, out)
    fn_mod.sum = lambda msg, out: _Reducer("sum", msg, out)
    fn_mod.e_dot_v = _EDotV
    dgl.function = fn_mod

    nn_mod = types.ModuleType("dgl.nn")
    nn_pt = types.ModuleType("dgl.nn.pytorch")
    softmax_mod = types.ModuleType("dgl.nn.pytorch.softmax")
    softmax_mod.edge_softmax = mini_edge_softmax
    glob_mod = types.ModuleType("dgl.nn.pytorch.glob")

    class AvgPooling(nn.Module):  # only reached by GAvgPooling (unused by model)
        def forward(self, graph, feat):
            return feat.mean(dim=0, keepdim=True)

    class MaxPooling(nn.Module):
        def forward(self, graph, feat):
            return feat.max(dim=0, keepdim=True).values

    glob_mod.AvgPooling, glob_mod.MaxPooling = AvgPooling, MaxPooling
    nn_pt.softmax, nn_pt.glob = softmax_mod, glob_mod
    nn_mod.pytorch = nn_pt
    dgl.nn = nn_mod

    return {
        "dgl": dgl,
        "dgl.function": fn_mod,
        "dgl.nn": nn_mod,
        "dgl.nn.pytorch": nn_pt,
        "dgl.nn.pytorch.softmax": softmax_mod,
        "dgl.nn.pytorch.glob": glob_mod,
    }


# --------------------------------------------------------------------------- #
# performer_pytorch: FAVOR+ SelfAttention with injectable projection buffer
# --------------------------------------------------------------------------- #


def _torch_softmax_features(data, projection, is_query, eps=1e-4):
    d = data.shape[-1]
    m = projection.shape[0]
    normalizer = d ** -0.25
    ratio = m ** -0.5
    proj = torch.einsum("...ld,md->...lm", normalizer * data, projection)
    diag = (data ** 2).sum(dim=-1, keepdim=True) * (normalizer ** 2) / 2.0
    if is_query:
        stab = proj.amax(dim=-1, keepdim=True)
    else:
        stab = proj.amax(dim=(-1, -2), keepdim=True)
    return ratio * (torch.exp(proj - diag - stab.detach()) + eps)


def _torch_generalized_features(data, projection, kernel_fn, kernel_eps=1e-3):
    normalizer = data.shape[-1] ** -0.25
    if projection is None:
        return kernel_fn(normalizer * data) + kernel_eps
    proj = torch.einsum("...ld,md->...lm", normalizer * data, projection)
    return kernel_fn(proj) + kernel_eps


def _torch_linear_attention(q_feat, k_feat, v):
    k_sum = k_feat.sum(dim=-2)
    d_inv = 1.0 / torch.einsum("...lm,...m->...l", q_feat, k_sum)
    context = torch.einsum("...lm,...le->...me", k_feat, v)
    out = torch.einsum("...me,...lm->...le", context, q_feat)
    return out * d_inv[..., None]


class FastAttention(nn.Module):
    def __init__(
        self,
        dim_head,
        nb_features=None,
        generalized_attention=False,
        kernel_fn=None,
    ):
        super().__init__()
        self.dim_head = dim_head
        self.nb_features = nb_features or int(dim_head * math.ceil(math.log(dim_head)))
        self.generalized_attention = generalized_attention
        self.kernel_fn = kernel_fn if kernel_fn is not None else nn.ReLU()
        # gaussian orthogonal random features; injectable for parity tests
        blocks = []
        n_full, rem = divmod(self.nb_features, dim_head)
        g = torch.Generator().manual_seed(0)
        for _ in range(n_full + (rem > 0)):
            q, _ = torch.linalg.qr(torch.randn(dim_head, dim_head, generator=g))
            blocks.append(q.T)
        mat = torch.cat(blocks, dim=0)[: self.nb_features]
        mult = torch.randn(self.nb_features, dim_head, generator=g).norm(dim=1)
        self.register_buffer("projection_matrix", mult[:, None] * mat)

    def forward(self, q, k, v):
        proj = self.projection_matrix.to(q.dtype)
        if self.generalized_attention:
            qf = _torch_generalized_features(q, proj, self.kernel_fn)
            kf = _torch_generalized_features(k, proj, self.kernel_fn)
        else:
            qf = _torch_softmax_features(q, proj, is_query=True)
            kf = _torch_softmax_features(k, proj, is_query=False)
        return _torch_linear_attention(qf, kf, v)


class SelfAttention(nn.Module):
    """performer_pytorch.SelfAttention stand-in: q/k/v to heads*dim_head
    (no bias), FAVOR+ fast attention, output projection, dropout."""

    def __init__(
        self,
        dim,
        heads=8,
        dim_head=64,
        dropout=0.0,
        nb_features=None,
        generalized_attention=False,
        kernel_fn=None,
        **unused_kwargs,
    ):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.fast_attention = FastAttention(
            dim_head,
            nb_features=nb_features,
            generalized_attention=generalized_attention,
            kernel_fn=kernel_fn,
        )
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(dim, inner, bias=False)
        self.to_v = nn.Linear(dim, inner, bias=False)
        self.to_out = nn.Linear(inner, dim)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, **kwargs):
        b, l, _ = x.shape
        h, dh = self.heads, self.dim_head

        def split(t):  # (b, l, h*dh) -> (b, h, l, dh)
            return t.view(b, l, h, dh).transpose(1, 2)

        out = self.fast_attention(
            split(self.to_q(x)), split(self.to_k(x)), split(self.to_v(x))
        )
        out = out.transpose(1, 2).reshape(b, l, h * dh)
        return self.dropout(self.to_out(out))


def _build_performer_module():
    mod = types.ModuleType("performer_pytorch")
    mod.SelfAttention = SelfAttention
    mod.FastAttention = FastAttention
    return {"performer_pytorch": mod}


# --------------------------------------------------------------------------- #
# lie_learn + pytorch_lightning
# --------------------------------------------------------------------------- #


def _build_lie_learn_module():
    sys.path.insert(0, "/root/repo") if "/root/repo" not in sys.path else None
    from rosettafold_tpu.ops.so3 import irr_repr_np

    root = types.ModuleType("lie_learn")
    reps = types.ModuleType("lie_learn.representations")
    so3 = types.ModuleType("lie_learn.representations.SO3")
    wd = types.ModuleType("lie_learn.representations.SO3.wigner_d")
    wd.wigner_D_matrix = lambda l, a, b, c: irr_repr_np(
        int(l), float(a), float(b), float(c)
    )
    so3.wigner_d = wd
    reps.SO3 = so3
    root.representations = reps
    return {
        "lie_learn": root,
        "lie_learn.representations": reps,
        "lie_learn.representations.SO3": so3,
        "lie_learn.representations.SO3.wigner_d": wd,
    }


def _build_lightning_module():
    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = nn.Module
    return {"pytorch_lightning": pl}


# --------------------------------------------------------------------------- #
# install + load
# --------------------------------------------------------------------------- #


def install():
    """Install all stubs into sys.modules (idempotent; never overrides a real
    installed package)."""
    mods = {}
    if "dgl" not in sys.modules:
        mods.update(_build_dgl_module())
    if "performer_pytorch" not in sys.modules:
        mods.update(_build_performer_module())
    if "lie_learn" not in sys.modules:
        mods.update(_build_lie_learn_module())
    if "pytorch_lightning" not in sys.modules:
        mods.update(_build_lightning_module())
    sys.modules.update(mods)


def load_reference():
    """Install stubs, put /root/reference on sys.path, import the reference."""
    install()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import rosettafold_pytorch as ref  # noqa: F401

    return ref


def set_performer_projection(module: nn.Module, seed_fn):
    """Overwrite every FastAttention.projection_matrix buffer under `module`
    with this repo's deterministic gaussian-orthogonal features.

    seed_fn: maps the module's qualified name (e.g.
    'two_track_blocks.0....attn.fast_attention') to the integer feature seed the
    JAX side uses for the same layer, so both frameworks share the projection.
    """
    from rosettafold_tpu.ops.performer import gaussian_orthogonal_matrix

    for name, sub in module.named_modules():
        if isinstance(sub, FastAttention):
            seed = seed_fn(name)
            mat = gaussian_orthogonal_matrix(
                sub.nb_features, sub.dim_head, seed=seed
            )
            sub.projection_matrix.copy_(torch.from_numpy(np.asarray(mat)))

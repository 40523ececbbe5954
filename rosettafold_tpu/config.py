"""Model configuration.

Mirrors the constructor surface of the reference model
(/root/reference/rosettafold_pytorch/rosettafold_pytorch.py:1176-1191) as a frozen
dataclass, plus TPU-build knobs (attention/SE(3) implementation selection, dtype
policy) that have no reference counterpart.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PerformerConfig:
    """FAVOR+ linear-attention settings.

    The reference delegates to performer-pytorch
    (rosettafold_pytorch.py:10,313,505,512). We re-implement FAVOR+ natively; these
    defaults mirror performer-pytorch's SelfAttention defaults.
    """

    dim_head: int = 64
    nb_features: Optional[int] = None  # default: dim_head * ceil(log(dim_head))
    feature_seed: int = 42  # seed for the (fixed) random-feature projection
    kernel_eps: float = 1e-3  # generalized-kernel stabilizer
    softmax_eps: float = 1e-4  # softmax-kernel stabilizer


@dataclasses.dataclass(frozen=True)
class RoseTTAFoldConfig:
    """Hyperparameters of the three-track RoseTTAFold network.

    Defaults equal the reference defaults
    (rosettafold_pytorch.py:1176-1191); per-module hardwired constants
    (12/8/4 heads, d_proj=32, distance bins, kmin) are kept as constants in the
    modules, like the reference does.
    """

    d_input: int = 21
    d_msa: int = 384
    d_pair: int = 288
    d_node: int = 64
    d_edge: int = 64
    d_state: int = 32
    n_two_track_blocks: int = 3
    n_three_track_blocks: int = 4
    n_encoder_layers: int = 4
    max_len: int = 5000
    n_neighbors: Tuple[int, ...] = (128, 128, 64, 64, 64)
    p_dropout: float = 0.1
    use_template: bool = False
    d_template: int = 64

    performer: PerformerConfig = dataclasses.field(default_factory=PerformerConfig)

    # --- TPU-build knobs (no reference counterpart) ---
    # "xla": plain jnp/XLA ops. "pallas": fused Pallas kernels for hot attention.
    attn_impl: str = "xla"
    # "dense": masked L x L attention for the SE(3) module (exact, best for L<=384).
    # "scatter": exact src-major edge list + segment ops (O(L*S), XLA path).
    # "bucket": exact incoming sets bucketed into static dst-major slots
    #           (O(L*C)) — the exact edge rule on the fused-kernel layout.
    # "gather": (B, L, S) forward-topk approximation for long sequences.
    se3_impl: str = "dense"
    # "bucket" slot capacity; None = min(2*K, L) + 2*(kmin-1), which covers the
    # measured reverse-kNN indegree maxima (~2.2*K). Overflow beyond capacity
    # drops the furthest incoming edges and is sown under "diagnostics".
    se3_bucket_capacity: Optional[int] = None
    # False = reference-exact kNN compat: keep self edges when the top-k spans
    # all nodes (n_neighbors >= L), matching rosettafold_pytorch.py:844-847.
    # True (default) = always exclude self edges (equivariance-safe; PARITY.md #5).
    knn_exclude_self: bool = True
    # Row-chunking for the long-sequence path (bounds the outer-product and
    # FAVOR+ feature intermediates to O(chunk * L)); None = no chunking.
    long_chunk: Optional[int] = None
    # Row-chunk the prediction head's conv towers at inference (exact halos +
    # global InstanceNorm stats; models/resnet.py). Required at L >= 2048
    # where the unchunked conv temporaries alone exceed HBM. None = unchunked.
    head_chunk: Optional[int] = None
    # Rematerialize the two-/three-track blocks on the backward pass (trades
    # ~cbrt memory for recompute; enable for long-sequence / large-batch training).
    remat: bool = False
    # Shard the (B, L, L, d) pair tensor's first L axis over the mesh's 'sp'
    # axis at block boundaries (long-context sequence parallelism; no-op
    # without a mesh). parallel/mesh.shard_pair_constraint.
    shard_pair: bool = False
    # nn.scan over the repeated two-/three-track blocks: ONE trace for all
    # blocks (compile time /~n_blocks), stacked params. Perf/training mode —
    # params are NOT name-compatible with torch_import, FAVOR+ projections are
    # shared across scanned blocks, and per-block n_neighbors becomes a
    # scanned top-k mask at the static max K.
    scan_blocks: bool = False
    # Trunk compute dtype: "float32" (exact-parity default) or "bfloat16"
    # (MXU-native; softmax/LayerNorm/InstanceNorm statistics and the entire
    # SE(3) equivariant stack stay float32).
    compute_dtype: str = "float32"

    def n_neighbors_for_block(self, i: int) -> int:
        return self.n_neighbors[i]


# Test-sized config used throughout the unit tests (mirrors the small dims the
# reference tests use, tests/test_module.py:792-824).
def tiny_config(**overrides) -> RoseTTAFoldConfig:
    base = dict(
        d_msa=96,
        d_pair=72,
        d_node=32,
        d_edge=32,
        d_state=16,
        n_two_track_blocks=1,
        n_three_track_blocks=2,
        n_encoder_layers=1,
        max_len=128,
        n_neighbors=(8, 8),
        p_dropout=0.1,
    )
    base.update(overrides)
    return RoseTTAFoldConfig(**base)

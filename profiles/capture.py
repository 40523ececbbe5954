"""Capture an on-device jax.profiler trace of flagship-model forwards.

Usage: python profiles/capture.py <outdir> [L] [B] [N]
(env BENCH_* knobs from bench.py apply to the config: dtype/attn/se3/chunks).
Aggregate with: python profiles/aggregate_trace.py <outdir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rftpu_jax_cache")


def main():
    out = sys.argv[1]
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    N = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from rosettafold_tpu import RoseTTAFoldConfig
    from rosettafold_tpu.models.rosettafold import RoseTTAFold

    cfg = RoseTTAFoldConfig(
        max_len=max(260, L + 10),
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        attn_impl=os.environ.get("BENCH_ATTN", "pallas"),
        se3_impl=os.environ.get("BENCH_SE3", "dense" if L <= 384 else "bucket"),
        long_chunk=None if L <= 384 else int(os.environ.get("BENCH_CHUNK", 128)),
        head_chunk=(int(os.environ["BENCH_HEAD_CHUNK"])
                    if "BENCH_HEAD_CHUNK" in os.environ
                    else (256 if L > 1024 else None)),
    )
    model = RoseTTAFold(config=cfg)
    rng = jax.random.PRNGKey(0)
    msa = jax.random.randint(rng, (B, N, L), 0, 21)
    seq = msa[:, 0]
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))
    params = jax.jit(model.init)(rng, msa, seq, aa_idx)

    @jax.jit
    def fwd(params, msa, seq, aa_idx):
        out = model.apply(params, msa, seq, aa_idx)
        return jnp.sum(out[1].astype(jnp.float32))

    for _ in range(2):  # compile + warm
        float(fwd(params, msa, seq, aa_idx))
    jax.profiler.start_trace(out)
    for _ in range(2):
        float(fwd(params, msa, seq, aa_idx))
    jax.profiler.stop_trace()
    print("trace written to", out)


if __name__ == "__main__":
    main()

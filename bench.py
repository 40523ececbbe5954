"""Benchmark: end-to-end inference latency on the flagship model.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Config: BASELINE.json config 1 shapes (bsz=1, n_seq=8, L=128, d_msa=384,
d_pair=288, templates off) on whatever accelerator is available (the real TPU
chip under the driver). Metric: residue-pairs per second per chip
(L^2 * batch / latency). The upstream reference publishes no numbers and its
dependencies (dgl, performer-pytorch, lightning, lie_learn) are absent from this
image, so it cannot be measured here (BASELINE.md); vs_baseline is computed
against our own first recorded measurement (BASELINE_MEASURED.json) so
round-over-round improvement is visible. On the first ever run it is 1.0.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rftpu_jax_cache")

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")

B, N, L = 1, 8, 128
WARMUP, ITERS = 2, 10


def main():
    from rosettafold_tpu import RoseTTAFoldConfig
    from rosettafold_tpu.models.rosettafold import RoseTTAFold

    cfg = RoseTTAFoldConfig(max_len=260)
    model = RoseTTAFold(config=cfg)

    rng = jax.random.PRNGKey(0)
    msa = jax.random.randint(rng, (B, N, L), 0, 21)
    seq = msa[:, 0]
    aa_idx = jnp.tile(jnp.arange(L)[None], (B, 1))

    params = jax.jit(model.init)(rng, msa, seq, aa_idx)
    fwd = jax.jit(model.apply)

    for _ in range(WARMUP):
        jax.block_until_ready(fwd(params, msa, seq, aa_idx))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(fwd(params, msa, seq, aa_idx))
    latency = (time.perf_counter() - t0) / ITERS

    pairs_per_sec = B * L * L / latency

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("pairs_per_sec")
    vs_baseline = (pairs_per_sec / baseline) if baseline else 1.0
    if baseline is None:
        with open(BASELINE_FILE, "w") as f:
            json.dump(
                {
                    "pairs_per_sec": pairs_per_sec,
                    "latency_s": latency,
                    "config": {"B": B, "N": N, "L": L},
                    "note": "first measured value of this framework (reference "
                    "publishes no numbers and cannot run in this image)",
                },
                f,
                indent=2,
            )

    print(
        json.dumps(
            {
                "metric": f"inference residue-pairs/sec/chip (B={B},N={N},L={L}, fp32)",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

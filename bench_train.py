"""Training-step benchmark: one full train step (fwd + bwd + adamw update)
on the flagship architecture at env-configurable shapes.

Prints ONE JSON line {"metric", "value" (ms/step), "unit", ...}. The
reference has no training loop at all (its Lightning hooks are `pass`,
rosettafold_pytorch.py:1291-1298), so there is no upstream number to
compare; rows are recorded in BENCHMARKS.md "Training".

Knobs (env): BENCH_B/N/L, BENCH_DTYPE (bfloat16), BENCH_ATTN (pallas),
BENCH_SE3 (dense<=384 else bucket), BENCH_CHUNK (long_chunk),
BENCH_SCAN (scan_blocks), BENCH_REMAT (default 1), BENCH_ACCUM (accum
steps, default 1), BENCH_HEAD_CHUNK.

Timing: per-iteration scalar fetch (block_until_ready does not synchronize
on this tunneled runtime; see bench.py).
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/rftpu_jax_cache")

B = int(os.environ.get("BENCH_B", 1))
N = int(os.environ.get("BENCH_N", 8))
L = int(os.environ.get("BENCH_L", 128))
WARMUP, ITERS = 2, int(os.environ.get("BENCH_ITERS", 5))


def main():
    from rosettafold_tpu import RoseTTAFoldConfig
    from rosettafold_tpu.train.step import create_train_state, make_train_step

    cfg = RoseTTAFoldConfig(
        max_len=max(260, L + 10),
        compute_dtype=os.environ.get("BENCH_DTYPE", "bfloat16"),
        attn_impl=os.environ.get("BENCH_ATTN", "pallas"),
        se3_impl=os.environ.get("BENCH_SE3", "dense" if L <= 384 else "bucket"),
        long_chunk=(
            None
            if L <= 384 or os.environ.get("BENCH_CHUNK") == "0"
            else int(os.environ.get("BENCH_CHUNK", 128))
        ),
        scan_blocks=os.environ.get("BENCH_SCAN", "0") == "1",
        remat=os.environ.get("BENCH_REMAT", "1") == "1",
        head_chunk=(int(os.environ["BENCH_HEAD_CHUNK"])
                    if "BENCH_HEAD_CHUNK" in os.environ
                    else (512 if L > 1024 else None)),
    )

    rng = jax.random.PRNGKey(0)
    batch = {
        "msa": jax.random.randint(rng, (B, N, L), 0, 21),
        "seq": None,
        "aa_idx": jnp.tile(jnp.arange(L)[None], (B, 1)),
        "xyz": jax.random.normal(rng, (B, L, 3, 3)) * 3.0,
    }
    batch["seq"] = batch["msa"][:, 0]

    state = create_train_state(
        cfg, rng, batch,
        accum_steps=int(os.environ.get("BENCH_ACCUM", 1)),
        moment_dtype="bfloat16",
    )
    # BENCH_DONATE=1: alias the params/opt-state buffers in place (the
    # training default). Donation changes XLA's buffer scheduling in
    # nonmonotone ways at the HBM edge — at L=512 the donate=False schedule
    # measured ~250 MB lower peak — so it is a knob, not a constant. The
    # timed loop threads the state like a real fit() loop either way; each
    # iteration still syncs on a fetched scalar.
    train_step = make_train_step(
        cfg, donate=os.environ.get("BENCH_DONATE", "1") == "1")

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, rng)
        float(metrics["total"])  # sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(state, batch, rng)
        float(metrics["total"])
    ms = (time.perf_counter() - t0) / ITERS * 1e3

    print(json.dumps({
        "metric": f"train step (B={B},N={N},L={L}, {cfg.compute_dtype}+"
                  f"{cfg.attn_impl}, se3={cfg.se3_impl}, remat={cfg.remat}, "
                  f"scan={cfg.scan_blocks})",
        "value": round(ms, 1),
        "unit": "ms/step",
    }))


if __name__ == "__main__":
    main()

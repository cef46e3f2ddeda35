"""Micro-benchmark the fused matmul candidate scorer at Swin 128-img shapes.

Times ops/pallas_search.matmul_hessian_sims on the real device for each
Swin-B/384 stage's window-matmul shape, to localize the 128-img search
floor (BENCH_NOTES: search 45 -> 372 s going 32 -> 128 imgs).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from ptq4vit_tpu.ops.pallas_search import matmul_hessian_sims


def bench(S, G, R, Ci, Co, P=100, dtype=jnp.bfloat16, reps=3, mode="a"):
    k = jax.random.PRNGKey(0)
    A = jax.random.normal(k, (S, G, R, Ci), dtype)
    B = jax.random.normal(k, (S, G, Ci, Co), dtype)
    g = jax.random.normal(k, (S, G, R, Co), dtype)
    cands = jnp.linspace(0.01, 1.2, P)[:, None] * jnp.ones((1, G))
    fixed = jnp.ones((G,), jnp.float32) * 0.02
    # warm (device_get: block_until_ready returns early through the tunnel)
    jax.device_get(matmul_hessian_sims(A, B, g, cands, fixed, mode, 128, 128))
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(matmul_hessian_sims(A, B, g, cands, fixed, mode, 128, 128))
        best = min(best, time.time() - t0)
    steps = S * G
    print(f"S={S:5d} G={G:2d} R={R} Ci={Ci} Co={Co} P={P} mode={mode}: "
          f"{best*1e3:8.1f} ms  ({best/steps*1e6:7.1f} us/step, {steps} steps)",
          flush=True)
    return best


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    total = 0.0
    # Swin-B/384 stages at 128 imgs: (windows*imgs, heads, ws^2, head_dim)
    for S, G, depth in ((8192, 4, 2), (2048, 8, 2), (512, 16, 18), (128, 32, 2)):
        t = bench(S, G, 144, 32, 144)
        total += t * depth * 2 * 6  # blocks * 2 matmuls * ~6 scorer calls
    print(f"projected full-search scorer time: {total:.1f} s")
    # matmul2 orientation (p@v: Ci=ws^2, Co=head_dim) and the Swin-224
    # window-7 family, for per-shape fold/rowsum tuning
    bench(8192, 4, 144, 144, 32, mode="b")
    bench(512, 16, 144, 144, 32, mode="b")
    bench(2048, 3, 49, 32, 49)                       # swin-224 stage 0
    bench(512, 12, 49, 49, 32, mode="b")             # swin-224 stage 2 pv

"""Micro-benchmark the fused linear candidate scorers on the real device.

A/Bs the candidate-loop-in-kernel layout (PTQ4VIT_TPU_SCORER_PLOOP=1,
default) against the legacy grid-(P, M, O) layout (=0) at the shapes that
dominate Swin/ViT-B @128-img search time (calib_attribution: fc2 56.6 s,
proj 37.3, qkv 35.8, fc1 29.3 of the 257.7 s warm Swin search).  The
legacy layout re-DMAs every x/w/raw/grad tile once per candidate, so at
big-M ops it is ~8x DMA-bound; the p-loop layout reads each tile once.

Run with PTQ4VIT_TPU_SCORER_PLOOP=0 for the legacy arm.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from ptq4vit_tpu.ops.pallas_search import (linear_a_hessian_sims_i8,
                                           linear_w_hessian_sims_i8)


def bench(name, M, ic, oc, P=100, reps=3):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k1, (M, ic), jnp.float32)
    w = jax.random.normal(k2, (oc, ic), jnp.float32)
    raw = jax.random.normal(k3, (M, oc), jnp.float32)
    grad = jax.random.normal(k4, (M, oc), jnp.float32) * 1e-2
    a_sc = jnp.float32(0.03)
    x_lv = jnp.clip(jnp.round(x / a_sc), -128, 127).astype(jnp.int8)
    w_cands = jnp.linspace(0.005, 0.02, P).astype(jnp.float32)
    a_cands = jnp.linspace(0.01, 0.05, P).astype(jnp.float32)
    w_lv = jnp.clip(jnp.round(w / 0.01), -128, 127).astype(jnp.int8)
    w_sc = jnp.full((oc,), 0.01, jnp.float32)

    def w_call():
        return linear_w_hessian_sims_i8(x_lv, None, a_sc, None, w,
                                        w_cands, raw, grad, 128)

    def a_call():
        return linear_a_hessian_sims_i8(x, w_lv, w_sc, a_cands, raw,
                                        grad, 128)

    for tag, call in (("w", w_call), ("a", a_call)):
        jax.device_get(call())                       # compile + warm
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(call())
            best = min(best, time.time() - t0)
        print(f"{name:24s} {tag}-search M={M:8d} ic={ic:4d} oc={oc:4d} "
              f"P={P}: {best * 1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(),
          "ploop:", os.environ.get("PTQ4VIT_TPU_SCORER_PLOOP", "1"))
    # Swin-B/384 @128 imgs stage-0/1 linears (the search_by_kind leaders)
    bench("swin384_s0_fc1", 128 * 96 * 96, 128, 512)
    bench("swin384_s0_fc2", 128 * 96 * 96, 512, 128)
    bench("swin384_s1_fc1", 128 * 48 * 48, 256, 1024)
    # ViT-B/384 @128 imgs
    bench("vit384_fc1", 128 * 577, 768, 3072)
    bench("vit384_qkv", 128 * 577, 768, 2304)

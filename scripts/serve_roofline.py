#!/usr/bin/env python
"""Per-kernel roofline breakdown of the fused int8 serving path.

Times each fused kernel at its ViT-B/384 bs=32 serving shape against a raw
XLA int8 dot of the same shape (the practical MXU ceiling for that shape)
and derives where the end-to-end img/s lands vs the sum of kernel times.

Tunnel-proof method: host-side timing of a single dispatch is useless here
(~130 ms dispatch latency, and block_until_ready can return early on the
axon backend), so each kernel is repeated N times INSIDE one jitted
``lax.scan`` whose carry chains iteration i's output into iteration i+1's
input (a real data dependency XLA cannot elide), completion is forced with
``device_get`` of a scalar, and the per-iteration time is the difference
quotient between two iteration counts — per-dispatch overhead cancels.

Feeds the BENCH_NOTES serving-roofline section (VERDICT round-2 item 7).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ptq4vit_tpu.ops.int8_serve import q8_linear, fused_attention_qkv
    from ptq4vit_tpu.quant.qparams import MatMulQP

    B, N, d, heads = (int(os.environ.get("RB_BS", "32")), 577, 768, 12)
    hd = d // heads
    M = B * N
    rng = np.random.default_rng(0)
    n_lo = int(os.environ.get("RB_LO", "8"))
    n_hi = int(os.environ.get("RB_HI", "40"))
    best_of = int(os.environ.get("RB_BEST", "3"))

    def chained_ms(f, x0):
        """Per-iteration milliseconds of y = f(x) with a carried data
        dependency, difference quotient between n_lo and n_hi reps."""
        def runner(n):
            def body(c, _):
                y = f(c)
                # fold a scalar of the output back into the carry: a real
                # dependency chain, numerically a no-op (s * 1e-30)
                s = jnp.sum(y.astype(jnp.float32) if y.dtype != jnp.float32
                            else y) * 1e-30
                return c + s.astype(c.dtype), None
            g = jax.jit(lambda c: jnp.sum(
                jax.lax.scan(body, c, None, length=n)[0]
                .astype(jnp.float32)))
            jax.device_get(g(x0))           # compile + warm
            best = float("inf")
            for _ in range(best_of):
                t0 = time.time()
                jax.device_get(g(x0))
                best = min(best, time.time() - t0)
            return best
        return (runner(n_hi) - runner(n_lo)) / (n_hi - n_lo) * 1e3

    out = {"bs": B, "method": f"scan-diff {n_lo}->{n_hi}, best of "
                              f"{best_of}"}

    # raw MXU ceilings: plain int8 dot at each linear shape
    def ceil_dot(K, Nc):
        w = jnp.asarray(rng.integers(-127, 127, (K, Nc)), jnp.int8)
        x0 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
        def f(x):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y
        ms = chained_ms(f, x0)
        return ms, 2 * M * K * Nc / (ms / 1e3) / 1e12

    shapes = {"qkv": (d, 3 * d), "proj": (d, d), "fc1": (d, 4 * d),
              "fc2": (4 * d, d)}
    for nm, (K, Nc) in shapes.items():
        ms, tops = ceil_dot(K, Nc)
        out[f"ceil_{nm}_ms"] = round(ms, 3)
        out[f"ceil_{nm}_tops"] = round(tops, 1)

    # fused kernels at serving shapes (weights packed int8)
    def pack(K, Nc):
        w_intT = jnp.asarray(rng.integers(-127, 127, (K, Nc)), jnp.int8)
        ws = jnp.asarray(rng.random(Nc) * 0.01 + 0.001, jnp.float32)
        b = jnp.asarray(rng.standard_normal(Nc), jnp.float32)
        return w_intT, ws, b

    x = jnp.asarray(rng.standard_normal((B, N, d)), jnp.bfloat16)
    ln = (jnp.ones((d,), jnp.float32), jnp.zeros((d,), jnp.float32), 1e-6)

    w_intT, ws, b = pack(d, 3 * d)
    col = jnp.asarray(rng.random(3 * d) * 0.01 + 0.001, jnp.float32)
    f_qkv = lambda xx: q8_linear(
        xx, w_intT, ws, b, 0.02, None, a_qmax=128, postgelu=False,
        ln=ln, out_q="vec", out_scale=col, out_qmax=128)
    out["qkv_ms"] = round(chained_ms(f_qkv, x), 3)
    qkv_q = jax.jit(f_qkv)(x)

    shape7 = (1, heads, 1, 1, 1, 1, 1)
    qp1 = MatMulQP(A_interval=jnp.full(shape7, 0.02, jnp.float32),
                   B_interval=jnp.full(shape7, 0.02, jnp.float32))
    split = jnp.float32(2.0 ** -8)
    qp2 = MatMulQP(A_interval=split / 127.0,
                   B_interval=jnp.full(shape7, 0.02, jnp.float32),
                   split=split)
    f_attn = lambda qq: fused_attention_qkv(
        qq, heads, qp1, qp2, hd ** -0.5, in_q8=True, out_scale=0.02)
    out["attn_ms"] = round(chained_ms(f_attn, qkv_q), 3)
    # attention matmul FLOPs (3 dots with SoS): what the MXU would need
    attn_flops = 2 * B * heads * N * N * hd * 3
    out["attn_tops"] = round(attn_flops / (out["attn_ms"] / 1e3) / 1e12, 2)
    y_q = jax.jit(f_attn)(qkv_q)

    w_intT, ws, b = pack(d, d)
    res = x
    f_proj = lambda yy: q8_linear(
        yy, w_intT, ws, b, 0.02, None, a_qmax=128, postgelu=False,
        in_q="q8", float_dtype=jnp.bfloat16, residual=res)
    out["proj_ms"] = round(chained_ms(f_proj, y_q), 3)

    w_intT, ws, b = pack(d, 4 * d)
    f_fc1 = lambda xx: q8_linear(
        xx, w_intT, ws, b, 0.02, None, a_qmax=128, postgelu=False, ln=ln,
        epilogue="gelu", out_q="twin", out_scale=(0.02, 0.0013),
        out_qmax=128)
    out["fc1_ms"] = round(chained_ms(f_fc1, x), 3)
    z_q = jax.jit(f_fc1)(x)

    w_intT, ws, b = pack(4 * d, d)
    f_fc2 = lambda zz: q8_linear(
        zz, w_intT, ws, b, 0.02, 0.0013, a_qmax=128, postgelu=True,
        in_q="q8twin", float_dtype=jnp.bfloat16, residual=res)
    out["fc2_ms"] = round(chained_ms(f_fc2, z_q), 3)

    blk_ms = (out["qkv_ms"] + out["attn_ms"] + out["proj_ms"]
              + out["fc1_ms"] + out["fc2_ms"])
    out["block_ms"] = round(blk_ms, 3)
    out["blocks12_img_s"] = round(B / (12 * blk_ms / 1e3), 1)
    ceil_lin_ms = sum(out[f"ceil_{k}_ms"] for k in shapes)
    out["ceil_linears_ms"] = round(ceil_lin_ms, 3)
    out["lin_vs_ceil"] = round(
        (out["qkv_ms"] + out["proj_ms"] + out["fc1_ms"] + out["fc2_ms"])
        / ceil_lin_ms, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

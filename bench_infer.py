#!/usr/bin/env python
"""Serving-throughput benchmark: quantized ViT-B/384 inference, fp32
fake-quant path vs true-int8 MXU path vs raw FP32 (images/s, on-device
steady state — input transfer excluded so the number reflects the chip, not
the sandbox tunnel)."""
import json
import os
import time

import numpy as np


def main():
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        from bench import _await_healthy_device
        if not _await_healthy_device(
                max_wait_s=float(os.environ.get("BENCH_MAX_WAIT_S", "600"))):
            model = os.environ.get("BENCH_MODEL", "vit_base_patch16_384")
            bs = os.environ.get("BENCH_BS", "32")
            print(json.dumps({
                "metric": f"infer_images_per_s_{model}_bs{bs}",
                "value": None, "unit": "img/s",
                "error": "device unreachable (axon tunnel outage)"}))
            raise SystemExit(3)   # nonzero: queues must NOT mark this done
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import DEGRADED_BF16_TFLOPS as DEGRADED, _probe_tflops
    probe_tflops, probe_invalid = _probe_tflops()

    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import get_net
    from ptq4vit_tpu.utils.synthetic import synthetic_qstate

    model = os.environ.get("BENCH_MODEL", "vit_base_patch16_384")
    bs = int(os.environ.get("BENCH_BS", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    bits = int(os.environ.get("BENCH_BITS", "8"))  # 6 = the W6A6 grid half
    net = get_net(model)
    qstate = synthetic_qstate(net, ptq4vit().set_bits(bits, bits))
    x = jax.device_put(jnp.zeros((bs, 3, net.cfg.img_size, net.cfg.img_size),
                                 jnp.float32))

    def timed(fn):
        f = jax.jit(fn)
        # sync via a scalar fetch: on the axon backend block_until_ready
        # can return before execution ends; device_get of a dependent
        # scalar cannot (and moves only 4 bytes over the 1 MB/s D2H link)
        jax.device_get(f(net.params, x)[0, 0])        # compile
        t0 = time.time()
        for _ in range(iters):
            r = f(net.params, x)
        jax.device_get(r[0, 0])
        return bs * iters / (time.time() - t0)

    from ptq4vit_tpu.ops.pack import pack_weights
    packed = jax.device_put(pack_weights(net.params, qstate))

    fp32 = timed(lambda p, xx: net.forward(p, xx, net.cfg))
    fake = timed(lambda p, xx: net.forward(p, xx, net.cfg, qstate=qstate))
    int8 = timed(lambda p, xx: net.forward(p, xx, net.cfg, qstate=qstate,
                                           int8=True))
    bf16 = timed(lambda p, xx: net.forward(p, xx, net.cfg,
                                           compute_dtype=jnp.bfloat16))
    int8_bf16 = timed(lambda p, xx: net.forward(
        p, xx, net.cfg, qstate=qstate, int8=True,
        compute_dtype=jnp.bfloat16))
    packed_bf16 = timed(lambda p, xx: net.forward(
        p, xx, net.cfg, qstate=qstate, int8=True, packed=packed,
        compute_dtype=jnp.bfloat16))
    fused_bf16 = timed(lambda p, xx: net.forward(
        p, xx, net.cfg, qstate=qstate, int8="fused", packed=packed,
        compute_dtype=jnp.bfloat16))
    relaxed_bf16 = timed(lambda p, xx: net.forward(
        p, xx, net.cfg, qstate=qstate, int8="fused_relaxed", packed=packed,
        compute_dtype=jnp.bfloat16))
    print(json.dumps({
        "metric": f"infer_images_per_s_{model}_bs{bs}"
                  + (f"_w{bits}a{bits}" if bits != 8 else ""),
        # tunnel-weather stamp: healthy chip ~112 bf16 TFLOP/s (CLAUDE.md)
        **({"probe_bf16_tflops": probe_tflops}
           if probe_tflops is not None else {}),
        **({"probe_invalid": True} if probe_invalid else {}),
        # degraded tunnel window (probe below the healthy floor): the
        # img/s rows measure the weather, not the machine
        **({"window_degraded": True}
           if probe_tflops is not None and probe_tflops < DEGRADED else {}),
        "fp32": round(fp32, 1),
        "bf16": round(bf16, 1),
        "fake_quant": round(fake, 1),
        "int8": round(int8, 1),
        "int8_bf16": round(int8_bf16, 1),
        "int8_packed_bf16": round(packed_bf16, 1),
        "int8_fused_bf16": round(fused_bf16, 1),
        "int8_fused_relaxed_bf16": round(relaxed_bf16, 1),
        "int8_fused_vs_bf16": round(fused_bf16 / bf16, 2),
    }))


if __name__ == "__main__":
    main()

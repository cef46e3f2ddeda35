#!/usr/bin/env python
"""END-TO-END serving throughput: host images -> device logits, INCLUDING
the host->device input transfer (bench_infer.py deliberately excludes it).

Four modes cross {f32, uint8 on-device normalize} x {sync, pipelined}:
  f32_sync  — float32 NCHW staged per batch, logits fetched per batch
              (the naive serve loop; pays H2D + dispatch RTT + compute
              serially per batch)
  f32_pipe  — all batches dispatched before any result is read (JAX's
              async dispatch overlaps compute/RTT under the transfers)
  u8_sync   — uint8 NCHW + (x/255 - mean)/std on device (4x less H2D)
  u8_pipe   — uint8 + pipelined: the end-to-end production mode
              (ServingEngine(raw_uint8=True), caller reads results late)

On this sandbox's tunneled TPU (H2D ~75 MB/s) the f32 ingest ceiling for
ViT-B/384 is ~42 img/s against a 715 img/s device rate, so end-to-end
serving is ENTIRELY ingest-bound and uint8+pipelining is the whole game.
On a production host (PCIe ~10+ GB/s) the same levers matter from
~5600 img/s f32 ingest — i.e. for any multi-chip serving fleet.

Each batch is a DISTINCT host numpy array (no constant caching; every
transfer is real).  Completion forced by device_get of a logit scalar.

Prints ONE JSON line: img/s per mode + the weather probe.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    model_env = os.environ.get("BENCH_MODEL", "vit_base_patch16_384")
    bs_env = os.environ.get("BENCH_BS", "32")
    if os.environ.get("BENCH_SKIP_PROBE") != "1":
        from bench import _await_healthy_device
        if not _await_healthy_device(
                max_wait_s=float(os.environ.get("BENCH_MAX_WAIT_S", "600"))):
            print(json.dumps({
                "metric": f"serve_e2e_images_per_s_{model_env}_bs{bs_env}",
                "value": None, "unit": "img/s",
                "error": "device unreachable (axon tunnel outage)"}))
            raise SystemExit(3)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import DEGRADED_BF16_TFLOPS as DEGRADED, _probe_tflops
    probe_tflops, probe_invalid = _probe_tflops()

    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import get_net
    from ptq4vit_tpu.parallel.serve import ServingEngine
    from ptq4vit_tpu.utils.synthetic import synthetic_qstate

    model = os.environ.get("BENCH_MODEL", "vit_base_patch16_384")
    bs = int(os.environ.get("BENCH_BS", "32"))
    nb = int(os.environ.get("BENCH_NBATCH", "8"))
    net = get_net(model)
    qstate = synthetic_qstate(net, ptq4vit())
    img = net.cfg.img_size
    rng = np.random.default_rng(0)
    f32_batches = [rng.standard_normal((bs, 3, img, img)).astype(np.float32)
                   for _ in range(nb)]
    u8_batches = [rng.integers(0, 255, (bs, 3, img, img), dtype=np.uint8)
                  for _ in range(nb)]

    eng_f32 = ServingEngine(net, qstate)
    eng_u8 = ServingEngine(net, qstate, raw_uint8=True)

    def run(engine, batches, pipelined):
        # warm/compile on a throwaway batch
        jax.device_get(engine(batches[0])[0, 0])
        t0 = time.time()
        if pipelined:
            outs = [engine(b) for b in batches]
            for o in outs:
                jax.device_get(o[0, 0])
        else:
            for b in batches:
                jax.device_get(engine(b)[0, 0])
        return round(bs * len(batches) / (time.time() - t0), 1)

    out = {
        "metric": f"serve_e2e_images_per_s_{model}_bs{bs}",
        "unit": "img/s",
        "f32_sync": run(eng_f32, f32_batches, False),
        "f32_pipe": run(eng_f32, f32_batches, True),
        "u8_sync": run(eng_u8, u8_batches, False),
        "u8_pipe": run(eng_u8, u8_batches, True),
    }
    out["u8_pipe_vs_f32_sync"] = round(out["u8_pipe"] / out["f32_sync"], 2)
    if probe_tflops is not None:
        out["probe_bf16_tflops"] = probe_tflops
        if probe_invalid:
            out["probe_invalid"] = True
        if probe_tflops < DEGRADED:
            out["window_degraded"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""One calibration run with per-op search-time attribution, aggregated by
op kind — localizes where search seconds go at a given calib size.

Usage: python scripts/calib_attribution.py [model] [n_imgs]
"""
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.xla_cache")
# per-op attribution wants serial enqueue order (threads interleave it and
# the per-op times become approximate) — pin the default back to 1 here
os.environ.setdefault("PTQ4VIT_TPU_DISPATCH_THREADS", "1")

MODEL = sys.argv[1] if len(sys.argv) > 1 else "swin_base_patch4_window12_384"
CALIB = int(sys.argv[2]) if len(sys.argv) > 2 else 128


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import get_net
    from ptq4vit_tpu.utils.synthetic import synthetic_images

    net = get_net(MODEL)
    calib = synthetic_images(CALIB, net.cfg.img_size, seed=3)
    t0 = time.time()
    c = HessianQuantCalibrator(net, ptq4vit(), calib, sequential=False,
                               batch_size=4)
    qstate = c.batching_quant_calib(verbose=False)
    qstate = jax.device_get(qstate)
    minutes = (time.time() - t0) / 60.0
    r = c.report

    def kind(path):
        for k in ("matmul1", "matmul2", "qkv", "proj", "fc1", "fc2",
                  "reduction", "head", "patch_embed"):
            if k in path:
                return k
        return "other"

    by_kind = defaultdict(float)
    n_by_kind = defaultdict(int)
    for path, s in r.search_seconds.items():
        by_kind[kind(path)] += s
        n_by_kind[kind(path)] += 1
    print(json.dumps({
        "model": MODEL, "calib": CALIB, "minutes": round(minutes, 3),
        "capture_s": round(r.capture_seconds, 1),
        "search_s": round(sum(r.search_seconds.values()), 1),
        "target_s": round(r.target_seconds, 1),
        "sync_s": round(r.sync_seconds, 1),
        "search_by_kind_s": {k: round(v, 1) for k, v in
                             sorted(by_kind.items(), key=lambda kv: -kv[1])},
        "ops_by_kind": dict(n_by_kind),
    }))
    # top-10 single ops
    top = sorted(r.search_seconds.items(), key=lambda kv: -kv[1])[:10]
    for path, s in top:
        print(f"  {s:7.2f}s  {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Calibration-seed stability study — counterpart of the reference's
20-seed robustness experiment (README.md:74-75 in hahnyuan/PTQ4ViT):
recalibrate with K different random calibration subsets and report top-1
mean/std."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from test_vit import build_net_and_data, init_config, parse_args, \
    test_classification


def stability(name="vit_small_patch16_224", config="PTQ4ViT", seeds=5,
              args=None):
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.utils.datasets import ViTImageNetLoaderGenerator
    from ptq4vit_tpu.utils.synthetic import synthetic_images

    quant_cfg = init_config(config)
    if getattr(args, "quick", False):
        for kw in (quant_cfg.ptqsl_conv2d_kwargs, quant_cfg.ptqsl_linear_kwargs,
                   quant_cfg.ptqsl_matmul_kwargs):
            kw.update(eq_n=8, search_round=1)
    accs = []
    for seed in range(seeds):
        net, test_loader, _ = build_net_and_data(name, args, args.calib_size)
        if args.synthetic:
            calib = synthetic_images(args.calib_size, net.cfg.img_size,
                                     seed=seed)
        else:
            g = ViTImageNetLoaderGenerator(args.dataset_root, "imagenet", 32,
                                           32, 16, kwargs={"model": net})
            calib = g.calib_batch(num=args.calib_size, seed=seed)
        qstate = HessianQuantCalibrator(net, quant_cfg, calib,
                                        batch_size=4) \
            .batching_quant_calib(verbose=False)
        acc = test_classification(net, test_loader, qstate=qstate,
                                  max_iteration=args.max_iteration)
        accs.append(acc)
        print(f"seed {seed}: {acc:.4f}")
    print(f"mean {np.mean(accs):.4f} std {np.std(accs):.4f}")
    return accs


if __name__ == "__main__":
    args = parse_args(lambda p: (
        p.add_argument("--model", default="vit_small_patch16_224"),
        p.add_argument("--config", default="PTQ4ViT"),
        p.add_argument("--seeds", type=int, default=5)))
    stability(args.model, args.config, seeds=args.seeds, args=args)

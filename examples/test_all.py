#!/usr/bin/env python
"""Full benchmark grid — counterpart of the reference's example/test_all.py
(hahnyuan/PTQ4ViT): 13 models x calib {32,128} x bits {(8,8),(6,6)} x
configs {PTQ4ViT, BasePTQ}, with per-run calibration timing."""
import json
import os
import sys
import time
from itertools import product

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_vit import (build_net_and_data, init_config, multiprocess,
                      parse_args, test_classification)

from ptq4vit_tpu.configs import apply_modifier


def test_all(name, cfg_modifier=None, calib_size=32, config_name="PTQ4ViT",
             args=None):
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    quant_cfg = init_config(config_name)
    if cfg_modifier is not None:
        quant_cfg = cfg_modifier(quant_cfg)
    net, test_loader, calib = build_net_and_data(name, args, calib_size)

    calib_start_time = time.time()
    calibrator = HessianQuantCalibrator(net, quant_cfg, calib,
                                        sequential=False, batch_size=4)
    qstate = calibrator.batching_quant_calib()
    calib_end_time = time.time()

    acc = test_classification(net, test_loader, qstate=qstate,
                              max_iteration=args.max_iteration)

    # one JSON line per grid cell (same reporting idiom as bench.py)
    print(json.dumps({
        "model": name,
        "config": config_name,
        "calib_size": calib_size,
        "w_bit": quant_cfg.bit,
        "linear_kwargs": quant_cfg.ptqsl_linear_kwargs,
        "calib_minutes": round((calib_end_time - calib_start_time) / 60, 3),
        "capture_seconds": round(calibrator.report.capture_seconds, 2),
        "search_seconds": round(sum(
            calibrator.report.search_seconds.values()), 2),
        "top1": acc,
    }), flush=True)


class CfgModifier:
    """In-place config mutation (reference test_all.py:48-78)."""

    def __init__(self, **kwargs):
        for name, value in kwargs.items():
            setattr(self, name, value)

    def __call__(self, cfg):
        return apply_modifier(cfg, bit_setting=self.bit_setting,
                              linear_ptq_setting=self.linear_ptq_setting,
                              metric=self.metric)


cfg_modifier = CfgModifier  # reference-spelled alias


NAMES = [
    "vit_tiny_patch16_224",
    "vit_small_patch32_224",
    "vit_small_patch16_224",
    "vit_base_patch16_224",
    "vit_base_patch16_384",

    "deit_tiny_patch16_224",
    "deit_small_patch16_224",
    "deit_base_patch16_224",
    "deit_base_patch16_384",

    "swin_tiny_patch4_window7_224",
    "swin_small_patch4_window7_224",
    "swin_base_patch4_window7_224",
    "swin_base_patch4_window12_384",
]

if __name__ == "__main__":
    args = parse_args()
    metrics = ["hessian"]
    linear_ptq_settings = [(1, 1, 1)]  # n_V, n_H, n_a
    calib_sizes = [32, 128]
    bit_settings = [(8, 8), (6, 6)]   # weight, activation
    config_names = ["PTQ4ViT", "BasePTQ"]

    cfg_list = []
    for name, metric, lp, calib_size, bits, config_name in product(
            NAMES, metrics, linear_ptq_settings, calib_sizes, bit_settings,
            config_names):
        cfg_list.append({
            "name": name,
            "cfg_modifier": CfgModifier(linear_ptq_setting=lp, metric=metric,
                                        bit_setting=bits),
            "calib_size": calib_size,
            "config_name": config_name,
            "args": args,
        })

    if args.multiprocess:
        multiprocess(test_all, cfg_list, n_workers=args.n_workers)
    else:
        for cfg in cfg_list:
            test_all(**cfg)

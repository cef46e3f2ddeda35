#!/usr/bin/env python
"""Calibrate then export int8 weights — counterpart of the reference's
example/get_int.py (hahnyuan/PTQ4ViT): per-model ``int_weights/{name}.npz``
with int8 weight levels + per-layer intervals (+ optional uint8 twin-format
activation payloads via --activations)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from test_vit import build_net_and_data, init_config, parse_args


def get_int_weights(name="vit_base_patch16_384", config="PTQ4ViT",
                    args=None, out_dir="./int_weights", activations=False):
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.utils import integer as I
    quant_cfg = init_config(config)
    if getattr(args, "quick", False):
        for kw in (quant_cfg.ptqsl_conv2d_kwargs, quant_cfg.ptqsl_linear_kwargs,
                   quant_cfg.ptqsl_matmul_kwargs):
            kw.update(eq_n=8, search_round=1)
    net, _, calib = build_net_and_data(name, args, args.calib_size)
    calibrator = HessianQuantCalibrator(net, quant_cfg, calib,
                                        sequential=False, batch_size=4)
    qstate = calibrator.batching_quant_calib()

    int_weights = I.get_model_int_weight(net, qstate)
    os.makedirs(out_dir, exist_ok=True)
    payload = {f"weight:{k}": v for k, v in int_weights.items()}
    for opname, qp in qstate.items():
        import dataclasses
        for f in dataclasses.fields(qp):
            v = getattr(qp, f.name)
            if v is not None and hasattr(v, "shape"):
                payload[f"interval:{opname}:{f.name}"] = np.asarray(v)
    if activations:
        acts = I.get_model_int_activations(net, qstate, calib[:4])
        for opname, d in acts.items():
            for k, v in d.items():
                payload[f"act:{opname}:{k}"] = v
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez(out, **payload)
    print(f"saved {len(payload)} arrays to {out}")
    return out


if __name__ == "__main__":
    args = parse_args(lambda p: (
        p.add_argument("--model", default="vit_base_patch16_384"),
        p.add_argument("--config", default="PTQ4ViT"),
        p.add_argument("--activations", action="store_true")))
    get_int_weights(args.model, args.config, args=args,
                    activations=args.activations)

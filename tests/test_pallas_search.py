"""Pallas fused search scorer vs the straightforward XLA computation
(interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from ptq4vit_tpu.ops.pallas_search import linear_w_hessian_sims


def xla_reference(x, w, cands, raw, grad, qmax):
    sims = []
    for d in np.asarray(cands):
        w_sim = np.clip(np.round(w / d), -qmax, qmax - 1) * d
        out = x @ w_sim.T
        sims.append(-np.sum((grad * (raw - out)) ** 2))
    return np.asarray(sims, np.float32)


def test_fused_scorer_matches_xla(rng):
    M, ic, oc, P, qmax = 70, 48, 36, 5, 128
    x = rng.standard_normal((M, ic)).astype(np.float32)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    raw = (x @ w.T).astype(np.float32)
    grad = rng.standard_normal((M, oc)).astype(np.float32)
    cands = (np.abs(w).max() / 127.5
             * np.linspace(0.2, 1.2, P)).astype(np.float32)
    got = np.asarray(linear_w_hessian_sims(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(cands),
        jnp.asarray(raw), jnp.asarray(grad), qmax, interpret=True))
    ref = xla_reference(x, w, cands, raw, grad, qmax)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    # argmax (what the search consumes) must agree
    assert int(np.argmax(got)) == int(np.argmax(ref))


def test_search_linear_pallas_path_matches_xla(rng):
    """Full linear search with the fused scorer vs the XLA scorer —
    intervals must match (production case: n_V=n_H=n_a=1, hessian)."""
    import jax.numpy as jnp
    from ptq4vit_tpu.calib.search import _linear_search_jit, plan_chunks
    from ptq4vit_tpu.configs.policy import OpPolicy
    pol = OpPolicy(quantizer="linear", metric="hessian", eq_alpha=0.01,
                   eq_beta=1.2, eq_n=16, search_round=2, w_bit=8, a_bit=8)
    S, T, ic, oc = 4, 9, 24, 16
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S, T, ic)).astype(np.float32)
    raw = (x @ w.T + b).astype(np.float32)
    g = rng.standard_normal(raw.shape).astype(np.float32)
    P, bs = plan_chunks(pol.eq_n, S, T * oc)
    args = (jnp.asarray(w), jnp.asarray(b), jnp.asarray(x),
            jnp.asarray(raw), jnp.asarray(g), pol, P, bs)
    w1, a1 = _linear_search_jit(*args, use_pallas=False)
    w2, a2 = _linear_search_jit(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    # int8-scored fused path: same chosen intervals on these fixtures
    # (sims differ in the last ulp; argmax flips are rare and absent here)
    w3, a3 = _linear_search_jit(*args, use_pallas=True, int8_score=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a3), rtol=1e-6)


def test_search_linear_pallas_nv3_matches_xla(rng):
    """n_V=3 (qkv-like row blocks): fused scorer == XLA scorer."""
    import jax.numpy as jnp
    from ptq4vit_tpu.calib.search import _linear_search_jit, plan_chunks
    from ptq4vit_tpu.configs.policy import OpPolicy
    from ptq4vit_tpu.ops.pallas_search import pallas_tile_ok
    pol = OpPolicy(quantizer="linear", metric="hessian", eq_alpha=0.01,
                   eq_beta=1.2, eq_n=12, search_round=2, w_bit=8, a_bit=8,
                   n_V=3)
    S, T, ic, oc = 4, 9, 32, 3 * 128   # crb_r = 128 -> tileable
    assert pallas_tile_ok(oc, 3)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((S, T, ic)).astype(np.float32)
    raw = (x @ w.T + b).astype(np.float32)
    g = rng.standard_normal(raw.shape).astype(np.float32)
    P, bs = plan_chunks(pol.eq_n, S, T * oc)
    args = (jnp.asarray(w), jnp.asarray(b), jnp.asarray(x),
            jnp.asarray(raw), jnp.asarray(g), pol, P, bs)
    w1, a1 = _linear_search_jit(*args, use_pallas=False)
    w2, a2 = _linear_search_jit(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    # int8-scored fused path: same chosen intervals on these fixtures
    # (sims differ in the last ulp; argmax flips are rare and absent here)
    w3, a3 = _linear_search_jit(*args, use_pallas=True, int8_score=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a3), rtol=1e-6)


def test_pallas_tile_ok():
    from ptq4vit_tpu.ops.pallas_search import pallas_tile_ok
    assert pallas_tile_ok(1000, 1)          # head: any oc with n_V=1
    assert pallas_tile_ok(2304, 3)          # ViT-B qkv: crb 768
    assert not pallas_tile_ok(300, 3)       # crb 100: straddles tiles


def test_search_postgelu_pallas_matches_xla(rng):
    """Twin post-GELU path through both fused scorers == XLA scorers."""
    import jax.numpy as jnp
    from ptq4vit_tpu.calib.search import _linear_search_jit, plan_chunks
    from ptq4vit_tpu.configs.policy import OpPolicy
    pol = OpPolicy(quantizer="postgelu_linear", metric="hessian",
                   eq_alpha=0.01, eq_beta=1.2, eq_n=12, search_round=2,
                   w_bit=8, a_bit=8)
    S, T, ic, oc = 4, 9, 32, 24
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = np.abs(rng.standard_normal((S, T, ic))).astype(np.float32)
    x[:, :, ::4] *= -0.05
    raw = (x @ w.T + b).astype(np.float32)
    g = rng.standard_normal(raw.shape).astype(np.float32)
    P, bs = plan_chunks(pol.eq_n, S, T * oc)
    args = (jnp.asarray(w), jnp.asarray(b), jnp.asarray(x),
            jnp.asarray(raw), jnp.asarray(g), pol, P, bs)
    w1, a1 = _linear_search_jit(*args, use_pallas=False)
    w2, a2 = _linear_search_jit(*args, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    # int8-scored fused path: same chosen intervals on these fixtures
    # (sims differ in the last ulp; argmax flips are rare and absent here)
    w3, a3 = _linear_search_jit(*args, use_pallas=True, int8_score=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w3), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a3), rtol=1e-6)


# ---------------------------------------------------------------------------
# fused matmul scorer (matmul_hessian_sims)
# ---------------------------------------------------------------------------

def _np_mm_sims(A, B, grad, cands, fixed_int, mode, cq, fq_, sos=None):
    """Straightforward numpy reference of the kernel's int8 semantics."""
    S, G, R, Ci = A.shape
    Co = B.shape[-1]
    P = cands.shape[0]
    sims = np.zeros((P, G), np.float32)
    for g in range(G):
        for s in range(S):
            a, b, gr = A[s, g], B[s, g], grad[s, g]
            raw = a @ b
            for p in range(P):
                d = cands[p, g]
                if mode == "a":
                    alv = np.clip(np.round(a / d), -cq, cq - 1)
                    blv = np.clip(np.round(b / fixed_int[g]), -fq_, fq_ - 1)
                    out = (alv @ blv) * (d * fixed_int[g])
                elif mode == "b":
                    alv = np.clip(np.round(a / fixed_int[g]), -fq_, fq_ - 1)
                    blv = np.clip(np.round(b / d), -cq, cq - 1)
                    out = (alv @ blv) * (fixed_int[g] * d)
                else:
                    split, a_int, s_hi, s_lo = sos
                    hi = np.clip(np.round(np.clip(a, split, 1.0) * (fq_ - 1)),
                                 0, fq_ - 1)
                    lo = np.clip(np.round(np.clip(a, 0.0, split) / a_int),
                                 0, fq_ - 1)
                    blv = np.clip(np.round(b / d), -cq, cq - 1)
                    out = ((hi @ blv) * s_hi + (lo @ blv) * s_lo) * d
                dd = gr * (raw - out)
                sims[p, g] += -np.sum(dd * dd)
    return sims


def test_matmul_fused_scorer_matches_numpy(rng):
    from ptq4vit_tpu.ops.pallas_search import matmul_hessian_sims
    S, G, R, Ci, Co, P = 3, 2, 10, 6, 7, 5
    A = rng.standard_normal((S, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S, G, Ci, Co)).astype(np.float32)
    grad = rng.standard_normal((S, G, R, Co)).astype(np.float32)
    base = np.abs(A).max(axis=(0, 2, 3)) / 127.5
    cands = (base[None, :] *
             np.linspace(0.3, 1.2, P)[:, None]).astype(np.float32)
    bint = (np.abs(B).max(axis=(0, 2, 3)) / 127.5).astype(np.float32)
    for mode, cnds, fixed in (("a", cands, bint),
                              ("b", (bint[None, :] * np.linspace(
                                  0.3, 1.2, P)[:, None]).astype(np.float32),
                               base)):
        got = np.asarray(matmul_hessian_sims(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(grad),
            jnp.asarray(cnds), jnp.asarray(fixed), mode, 128, 128,
            interpret=True))
        ref = _np_mm_sims(A, B, grad, cnds, fixed, mode, 128, 128)
        np.testing.assert_allclose(got, ref, rtol=1e-4)
        assert (np.argmax(got, axis=0) == np.argmax(ref, axis=0)).all()


def test_matmul_fused_scorer_sos_matches_numpy(rng):
    import torch
    from ptq4vit_tpu.ops.pallas_search import matmul_hessian_sims
    S, G, R, Co, P = 3, 2, 10, 7, 5
    logits = rng.standard_normal((S, G, R, R)).astype(np.float32) * 3
    A = torch.softmax(torch.from_numpy(logits), -1).numpy()
    B = rng.standard_normal((S, G, R, Co)).astype(np.float32)
    grad = rng.standard_normal((S, G, R, Co)).astype(np.float32)
    bint = (np.abs(B).max(axis=(0, 2, 3)) / 127.5).astype(np.float32)
    cands = (bint[None, :] *
             np.linspace(0.3, 1.2, P)[:, None]).astype(np.float32)
    split = np.float32(1 / 2 ** 4)
    a_int = np.float32(split / 127)
    s_hi = np.float32(1.0 / 127)
    sos = (split, a_int, s_hi, a_int)
    got = np.asarray(matmul_hessian_sims(
        jnp.asarray(A), jnp.asarray(B), jnp.asarray(grad),
        jnp.asarray(cands), jnp.ones((G,), jnp.float32), "b_sos", 128, 128,
        sos=tuple(jnp.float32(v) for v in sos), interpret=True))
    ref = _np_mm_sims(A, B, grad, cands, None, "b_sos", 128, 128, sos=sos)
    np.testing.assert_allclose(got, ref, rtol=1e-4)
    assert (np.argmax(got, axis=0) == np.argmax(ref, axis=0)).all()


def test_matmul_search_pallas_path_matches_xla(rng):
    """Full matmul search with the fused scorer == the XLA int8 scorer
    (same intervals on the parity fixtures), for both quantizers."""
    import torch
    from ptq4vit_tpu.calib.search import _matmul_search_jit, plan_chunks
    from ptq4vit_tpu.configs.policy import OpPolicy
    for quantizer in ("matmul", "sos_matmul"):
        pol = OpPolicy(quantizer=quantizer, metric="hessian", eq_alpha=0.2,
                       eq_beta=1.2, eq_n=8, search_round=2, a_bit=8,
                       b_bit=8)
        S, G, R, Ci, Co = 4, 3, 6, 5, 7
        A = rng.standard_normal((S, G, R, Ci)).astype(np.float32)
        if quantizer == "sos_matmul":
            Ci = R
            logits = rng.standard_normal((S, G, R, R)).astype(np.float32) * 3
            A = torch.softmax(torch.from_numpy(logits), -1).numpy()
        B = rng.standard_normal((S, G, Ci, Co)).astype(np.float32)
        grad = rng.standard_normal((S, G, R, Co)).astype(np.float32)
        P, bs = plan_chunks(pol.eq_n, S, G * R * Co)
        args = (jnp.asarray(A), jnp.asarray(B), None, jnp.asarray(grad),
                pol, P, bs, G)
        a1, b1 = _matmul_search_jit(*args, int8_score=True)
        a2, b2 = _matmul_search_jit(*args, use_pallas=True)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-6)


def test_matmul_scorer_head_folding_bitwise_equal(rng, monkeypatch):
    """Head folding (F heads -> one dense-K dot with a block-diagonal fixed
    operand) is EXACT: sims are bitwise equal to the unfolded kernel at
    Swin window shapes, for every mode.  ROWSUM=0 pins the exact-summation
    epilogue — the (faster, default) rowsum epilogue reduces rows first,
    which changes fp32 sum order vs the unfolded kernel (covered by
    test_matmul_scorer_rowsum_variant_close)."""
    from ptq4vit_tpu.ops import pallas_search as ps
    monkeypatch.setenv("PTQ4VIT_TPU_MM_ROWSUM", "0")
    S, G, R, Ci, Co, P = 4, 8, 49, 32, 49, 5
    A = rng.standard_normal((S, G, R, Ci)).astype(np.float32)
    Asm = np.exp(A) / np.exp(A).sum(-1, keepdims=True)
    B = rng.standard_normal((S, G, Ci, Co)).astype(np.float32)
    grad = rng.standard_normal((S, G, R, Co)).astype(np.float32)
    base = np.abs(A).max(axis=(0, 2, 3)) / 127.5
    cands = (base[None, :] *
             np.linspace(0.3, 1.2, P)[:, None]).astype(np.float32)
    bint = (np.abs(B).max(axis=(0, 2, 3)) / 127.5).astype(np.float32)
    split = np.float32(1 / 2 ** 4)
    sos = (split, np.float32(split / 127), np.float32(1 / 127),
           np.float32(split / 127))

    def run(mode, a):
        ps.matmul_hessian_sims._clear_cache()  # fold factor read at trace
        return np.asarray(ps.matmul_hessian_sims(
            jnp.asarray(a), jnp.asarray(B), jnp.asarray(grad),
            jnp.asarray(cands), jnp.asarray(bint), mode, 128, 128,
            sos=tuple(jnp.float32(v) for v in sos) if mode == "b_sos"
            else None, interpret=True))

    for mode in ("a", "b", "b_sos"):
        a = Asm if mode == "b_sos" else A
        monkeypatch.setenv("PTQ4VIT_TPU_MM_FOLD", "1")
        ref = run(mode, a)
        for F in (2, 4):
            monkeypatch.setenv("PTQ4VIT_TPU_MM_FOLD", str(F))
            np.testing.assert_array_equal(ref, run(mode, a), err_msg=mode)


def test_mm_fold_factor_model_shapes():
    """The fold heuristic picks F=4 at Swin window shapes (where lane/K
    padding wastes 4-8x MACs) and F=1 at ViT shapes (no padding waste to
    recover, folding would only grow VMEM tiles)."""
    from ptq4vit_tpu.ops.pallas_search import _mm_fold_factor
    for g in (4, 8, 16, 32):                  # Swin-B/384 stages, window 144
        assert _mm_fold_factor(g, 32, 144) == 4      # matmul1 q@k^T
        assert _mm_fold_factor(g, 144, 32) == 4      # matmul2 p@v
    assert _mm_fold_factor(8, 32, 49) == 4           # Swin-224, window 49
    assert _mm_fold_factor(8, 49, 32) == 4
    assert _mm_fold_factor(12, 64, 577) == 1         # ViT-B/384
    assert _mm_fold_factor(12, 577, 64) == 1


def test_matmul_scorer_rowsum_variant_close(rng, monkeypatch):
    """The rowsum epilogue (row-reduce before the per-head masked sums,
    DEFAULT since the r4 device A/B showed it 1.3-1.5x the exact-order
    epilogue at Swin window shapes) changes only fp32 summation order —
    sims match the PTQ4VIT_TPU_MM_ROWSUM=0 exact mode to 1e-6."""
    from ptq4vit_tpu.ops import pallas_search as ps
    S, G, R, Ci, Co, P = 3, 8, 49, 32, 49, 5
    A = rng.standard_normal((S, G, R, Ci)).astype(np.float32)
    B = rng.standard_normal((S, G, Ci, Co)).astype(np.float32)
    grad = rng.standard_normal((S, G, R, Co)).astype(np.float32)
    base = np.abs(A).max(axis=(0, 2, 3)) / 127.5
    cands = (base[None, :] *
             np.linspace(0.3, 1.2, P)[:, None]).astype(np.float32)
    bint = (np.abs(B).max(axis=(0, 2, 3)) / 127.5).astype(np.float32)

    def run():
        ps.matmul_hessian_sims._clear_cache()
        return np.asarray(ps.matmul_hessian_sims(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(grad),
            jnp.asarray(cands), jnp.asarray(bint), "a", 128, 128,
            interpret=True))

    monkeypatch.setenv("PTQ4VIT_TPU_MM_ROWSUM", "0")
    ref = run()
    monkeypatch.setenv("PTQ4VIT_TPU_MM_ROWSUM", "1")
    np.testing.assert_allclose(ref, run(), rtol=1e-6)


def test_linear_scorer_ploop_bitwise_equal(rng, monkeypatch):
    """The candidate-loop-in-kernel layout (grid (M, O), default) must be
    BITWISE equal to the legacy grid-(P, M, O) layout for all four linear
    scorers: per-candidate op order is identical and the per-candidate
    accumulation sweeps (m, o) tiles in the same order — only the DMA
    schedule changes (each tile read once per call instead of P times)."""
    from ptq4vit_tpu.ops import pallas_search as ps
    M, ic, oc, P, qmax, n_V = 70, 48, 36, 7, 128, 1
    x = rng.standard_normal((M, ic)).astype(np.float32)
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    raw = (x @ w.T).astype(np.float32)
    grad = rng.standard_normal((M, oc)).astype(np.float32)
    w_cands = (np.abs(w).max() / 127.5
               * np.linspace(0.2, 1.2, P)).astype(np.float32)
    a_sc = np.float32(np.abs(x).max() / 127.5)
    a_cands = (a_sc * np.linspace(0.2, 1.2, P)).astype(np.float32)
    x_lv = np.clip(np.round(x / a_sc), -128, 127).astype(np.int8)
    x_neg = np.clip(np.round(x / 0.01), -128, 0).astype(np.int8)
    w_lv = np.clip(np.round(w / w_cands[3]), -128, 127).astype(np.int8)
    w_sc = np.full((oc,), w_cands[3], np.float32)
    w_sim = (np.clip(np.round(w / w_cands[3]), -qmax, qmax - 1)
             * w_cands[3]).astype(np.float32)
    # oc=36 with n_V=3 -> crb 12: exercises the multi-row-block SMEM path
    w_cands_nv = (w_cands[:, None]
                  * np.array([[1.0, 0.9, 1.1]], np.float32))

    calls = {
        "w_f32": lambda: ps.linear_w_hessian_sims(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_cands),
            jnp.asarray(raw), jnp.asarray(grad), qmax, interpret=True),
        "w_f32_nv": lambda: ps.linear_w_hessian_sims(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(w_cands_nv),
            jnp.asarray(raw), jnp.asarray(grad), qmax, interpret=True),
        "w_i8": lambda: ps.linear_w_hessian_sims_i8(
            jnp.asarray(x_lv), None, jnp.asarray(a_sc), None,
            jnp.asarray(w), jnp.asarray(w_cands), jnp.asarray(raw),
            jnp.asarray(grad), qmax, interpret=True),
        "w_i8_twin": lambda: ps.linear_w_hessian_sims_i8(
            jnp.asarray(x_lv), jnp.asarray(x_neg), jnp.asarray(a_sc),
            jnp.asarray(np.float32(0.01)), jnp.asarray(w),
            jnp.asarray(w_cands), jnp.asarray(raw), jnp.asarray(grad),
            qmax, interpret=True),
        "a_f32": lambda: ps.linear_a_hessian_sims(
            jnp.asarray(x), jnp.asarray(w_sim), jnp.asarray(a_cands),
            jnp.asarray(raw), jnp.asarray(grad), 128, interpret=True),
        "a_f32_pg": lambda: ps.linear_a_hessian_sims(
            jnp.asarray(np.abs(x)), jnp.asarray(w_sim),
            jnp.asarray(a_cands), jnp.asarray(raw), jnp.asarray(grad),
            128, postgelu=True, a_neg=0.01, interpret=True),
        "a_i8": lambda: ps.linear_a_hessian_sims_i8(
            jnp.asarray(x), jnp.asarray(w_lv), jnp.asarray(w_sc),
            jnp.asarray(a_cands), jnp.asarray(raw), jnp.asarray(grad),
            128, interpret=True),
        "a_i8_pg": lambda: ps.linear_a_hessian_sims_i8(
            jnp.asarray(np.abs(x)), jnp.asarray(w_lv), jnp.asarray(w_sc),
            jnp.asarray(a_cands), jnp.asarray(raw), jnp.asarray(grad),
            128, postgelu=True, a_neg=0.01, interpret=True),
    }
    fns = (ps.linear_w_hessian_sims, ps.linear_w_hessian_sims_i8,
           ps.linear_a_hessian_sims, ps.linear_a_hessian_sims_i8)
    for name, call in calls.items():
        for f in fns:
            f._clear_cache()
        got = np.asarray(call())                     # ploop default
        monkeypatch.setenv("PTQ4VIT_TPU_SCORER_PLOOP", "0")
        for f in fns:
            f._clear_cache()
        ref = np.asarray(call())                     # legacy grid layout
        monkeypatch.delenv("PTQ4VIT_TPU_SCORER_PLOOP")
        np.testing.assert_array_equal(got, ref, err_msg=name)

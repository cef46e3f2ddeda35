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

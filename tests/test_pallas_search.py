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

"""Bit-parity tests of the core fake-quant formulas against a torch oracle.

The oracle re-implements the documented reference formulas (see SURVEY.md §2.1)
directly in torch (CPU) so every jnp primitive is cross-checked against the
framework the reference was written in, without importing reference code.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ptq4vit_tpu.quant import fakequant as fq
from ptq4vit_tpu.quant import metrics as M


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_candidate_grid_values():
    g = np.asarray(fq.candidate_grid(0.01, 1.2, 100))
    ref = np.asarray([0.01 + i * (1.2 - 0.01) / 100 for i in range(101)],
                     np.float32)
    assert g.shape == (101,)
    np.testing.assert_allclose(g, ref, rtol=0, atol=1e-7)


def test_sos_split_grid():
    g = np.asarray(fq.sos_split_grid())
    np.testing.assert_allclose(g, [2.0 ** (-i) for i in range(20)])


@pytest.mark.parametrize("bit", [8, 6, 4])
def test_fake_quant_matches_torch(rng, bit):
    x = rng.standard_normal((64, 48)).astype(np.float32) * 3
    qmax = 2 ** (bit - 1)
    interval = np.float32(np.abs(x).max() / (qmax - 0.5))
    ours = np.asarray(fq.fake_quant(jnp.asarray(x), interval, qmax))
    ref = (t(x) / interval).round_().clamp_(-qmax, qmax - 1).mul_(interval)
    np.testing.assert_array_equal(ours, ref.numpy())


def test_round_half_even_parity():
    # torch.round and jnp.round must both round half to even
    x = np.asarray([0.5, 1.5, 2.5, -0.5, -1.5, -2.5], np.float32)
    np.testing.assert_array_equal(np.asarray(jnp.round(x)),
                                  torch.round(t(x)).numpy())


def test_blocked_weight_quant_matches_torch(rng):
    oc, ic, n_V, n_H, qmax = 12, 8, 3, 2, 128
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    interval = np.asarray(
        fq.blocked_weight_interval_init(jnp.asarray(w), n_V, n_H, qmax))
    # oracle: torch view/round/clamp/mul (reference linear.py:152-155 formula)
    wt = t(w).view(n_V, oc // n_V, n_H, ic // n_H)
    it = t(interval)
    ref_interval = (wt.abs().amax([1, 3], keepdim=True) / (qmax - 0.5))
    np.testing.assert_allclose(interval, ref_interval.numpy(), rtol=1e-6)
    ref = ((wt / it).round_().clamp_(-qmax, qmax - 1) * it).view(oc, ic)
    ours = np.asarray(
        fq.fake_quant_weight_blocked(jnp.asarray(w), jnp.asarray(interval), qmax))
    np.testing.assert_array_equal(ours, ref.numpy())


def test_grouped_act_quant_matches_torch(rng):
    n_a, qmax = 4, 32
    x = rng.standard_normal((2, 7, 16)).astype(np.float32)
    interval = np.asarray(
        fq.grouped_act_interval_init(jnp.asarray(x), n_a, qmax))
    xt = t(x)
    # oracle: chunk on last dim == group view (reference linear.py:166)
    xg = torch.cat(torch.chunk(xt.unsqueeze(-2), chunks=n_a, dim=-1), dim=-2)
    ref_int = (xg.abs().amax([0, 1, 3]) / (qmax - 0.5)).unsqueeze(-1)
    np.testing.assert_allclose(interval, ref_int.numpy(), rtol=1e-6)
    it = t(interval)
    ref = ((xg / it).round_().clamp_(-qmax, qmax - 1) * it).reshape(xt.shape)
    ours = np.asarray(
        fq.fake_quant_act_grouped(jnp.asarray(x), jnp.asarray(interval), qmax))
    np.testing.assert_array_equal(ours, ref.numpy())


def test_twin_post_gelu_matches_torch(rng):
    n_a, qmax = 2, 128
    # post-GELU-like data: mostly positive, negative tail in [-0.17, 0)
    x = np.abs(rng.standard_normal((3, 5, 8))).astype(np.float32)
    x[0] *= -0.05
    pos = np.asarray(fq.grouped_act_interval_init(jnp.asarray(x), n_a, qmax,
                                                  signed=False))
    neg = np.float32(fq.GELU_NEG_CLIP / qmax)
    ours = np.asarray(
        fq.twin_quant_post_gelu(jnp.asarray(x), jnp.asarray(pos), neg, qmax))
    xt = t(x)
    xg = torch.cat(torch.chunk(xt.unsqueeze(-2), chunks=n_a, dim=-1), dim=-2)
    pt = t(pos)
    x_pos = (xg / pt).round_().clamp_(0, qmax - 1).mul_(pt)
    x_neg = (xg / neg).round_().clamp_(-qmax, 0).mul_(neg)
    ref = (x_pos + x_neg).reshape(xt.shape)
    np.testing.assert_array_equal(ours, ref.numpy())


@pytest.mark.parametrize("split", [0.5, 2.0 ** -5, 2.0 ** -12])
def test_sos_quant_matches_torch(rng, split):
    qmax = 128
    x = rng.random((2, 3, 6, 6)).astype(np.float32)  # softmax-like in [0,1)
    ours = np.asarray(fq.sos_quant_softmax(jnp.asarray(x), split, qmax))
    xt = t(x)
    interval = split / (qmax - 1)
    x_high = (xt.clamp(split, 1) * (qmax - 1)).round_().clamp_(0, qmax - 1) / (qmax - 1)
    x_low = (xt.clamp(0, split) / interval).round_().clamp_(0, qmax - 1) * interval
    ref = x_high + x_low
    # 1-ulp dequant differences allowed (XLA reciprocal-multiply rewrite)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-7, atol=1e-9)


@pytest.mark.parametrize("shape,grid", [((2, 12, 9, 9), (12, 1, 1)),
                                        ((2, 5, 9, 7), (3, 2, 4))])
def test_matmul_operand_quant_matches_torch(rng, shape, grid):
    n_G, n_V, n_H = grid
    qmax = 128
    x = rng.standard_normal(shape).astype(np.float32)
    interval = np.asarray(
        fq.matmul_operand_interval_init(jnp.asarray(x), n_G, n_V, n_H, qmax))
    assert interval.shape == (1, n_G, 1, n_V, 1, n_H, 1)
    ours = np.asarray(
        fq.fake_quant_matmul_operand(jnp.asarray(x), jnp.asarray(interval), qmax))
    # oracle: pad -> view -> quant -> unpad (reference matmul.py:124-138)
    B, G, R, C = shape
    crb_g, crb_r, crb_c = -(-G // n_G), -(-R // n_V), -(-C // n_H)
    pg, pr, pc = crb_g * n_G - G, crb_r * n_V - R, crb_c * n_H - C
    xt = torch.nn.functional.pad(t(x), [0, pc, 0, pr, 0, pg])
    xb = xt.view(-1, n_G, crb_g, n_V, crb_r, n_H, crb_c)
    ref_int = xb.abs().amax([0, 2, 4, 6], keepdim=True) / (qmax - 0.5)
    np.testing.assert_allclose(interval, ref_int.numpy(), rtol=1e-6)
    it = t(interval)
    xq = (xb / it).round_().clamp_(-qmax, qmax - 1) * it
    xq = xq.view(-1, n_G * crb_g, n_V * crb_r, n_H * crb_c)
    ref = xq[:, :G, :R, :C]
    # 1-ulp dequant differences allowed (XLA reciprocal-multiply rewrite)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-7, atol=1e-9)


@pytest.mark.parametrize("metric", ["cosine", "pearson", "L1_norm", "L2_norm",
                                    "linear_weighted_L2_norm",
                                    "square_weighted_L2_norm", "hessian"])
def test_similarity_matches_torch(rng, metric):
    raw = rng.standard_normal((4, 7, 16)).astype(np.float32)
    sim = (raw + 0.05 * rng.standard_normal((4, 7, 16))).astype(np.float32)
    grad = rng.standard_normal((4, 7, 16)).astype(np.float32)
    ours = np.asarray(M.similarity(jnp.asarray(raw), jnp.asarray(sim), metric,
                                   raw_grad=jnp.asarray(grad)))
    tr, ts, tg = t(raw), t(sim), t(grad)
    if metric == "cosine":
        ref = torch.nn.functional.cosine_similarity(tr, ts, dim=-1)
    elif metric == "pearson":
        ref = torch.nn.functional.cosine_similarity(
            tr - tr.mean(-1, keepdim=True), ts - ts.mean(-1, keepdim=True), dim=-1)
    else:
        if metric == "L1_norm":
            s = -(tr - ts).abs()
        elif metric == "L2_norm":
            s = -((tr - ts) ** 2)
        elif metric == "linear_weighted_L2_norm":
            s = -tr.abs() * (tr - ts) ** 2
        elif metric == "square_weighted_L2_norm":
            s = -((tr * (tr - ts)) ** 2)
        else:
            s = -((tg * (tr - ts)) ** 2)
        ref = s.mean(-1)
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-6, atol=2e-7)

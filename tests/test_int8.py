"""int8 MXU execution path: must reproduce the fake-quant forward up to
fp32 rescale rounding (int32 accumulation is exact)."""
import jax.numpy as jnp
import numpy as np

from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
from ptq4vit_tpu.configs import ptq4vit, base_ptq
from ptq4vit_tpu.ops.int8 import linear_int8, matmul_int8
from ptq4vit_tpu.quant.qparams import (LinearQP, MatMulQP, apply_linear,
                                       apply_matmul)
from tests.test_calibrator import small_cfg
from tests.test_capture import tiny_net


def test_linear_int8_matches_fake_quant(rng):
    oc, ic, n_V = 12, 16, 3
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    x = rng.standard_normal((4, 7, ic)).astype(np.float32)
    w4 = w.reshape(n_V, oc // n_V, 1, ic)
    qp = LinearQP(
        w_interval=jnp.asarray(np.abs(w4).max((1, 3), keepdims=True) / 127.5),
        a_interval=jnp.asarray([[np.float32(np.abs(x).max() / 127.5)]]))
    ref = np.asarray(apply_linear(jnp.asarray(x), jnp.asarray(w),
                                  jnp.asarray(b), qp))
    got = np.asarray(linear_int8(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), qp))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_postgelu_linear_int8_matches_fake_quant(rng):
    from ptq4vit_tpu.quant.fakequant import GELU_NEG_CLIP
    oc, ic = 6, 8
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    x = np.abs(rng.standard_normal((3, 5, ic))).astype(np.float32)
    x[0] *= -0.05
    qp = LinearQP(
        w_interval=jnp.asarray(np.abs(w).max() / 127.5).reshape(1, 1, 1, 1),
        a_interval=jnp.asarray([[np.float32(x.max() / 127.5)]]),
        a_neg_interval=jnp.float32(GELU_NEG_CLIP / 128), postgelu=True)
    ref = np.asarray(apply_linear(jnp.asarray(x), jnp.asarray(w), None, qp))
    got = np.asarray(linear_int8(jnp.asarray(x), jnp.asarray(w), None, qp))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_matmul_int8_matches_fake_quant(rng):
    G = 3
    A = rng.standard_normal((2, G, 6, 5)).astype(np.float32)
    B = rng.standard_normal((2, G, 5, 7)).astype(np.float32)
    shape = (1, G, 1, 1, 1, 1, 1)
    qp = MatMulQP(
        A_interval=jnp.asarray(
            np.abs(A).max((0, 2, 3)).reshape(shape) / 127.5),
        B_interval=jnp.asarray(
            np.abs(B).max((0, 2, 3)).reshape(shape) / 127.5))
    ref = np.asarray(apply_matmul(jnp.asarray(A), jnp.asarray(B), qp))
    got = np.asarray(matmul_int8(jnp.asarray(A), jnp.asarray(B), qp))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_sos_matmul_int8_matches_fake_quant(rng):
    G = 2
    A = rng.random((2, G, 6, 6)).astype(np.float32)  # softmax-like
    B = rng.standard_normal((2, G, 6, 4)).astype(np.float32)
    shape = (1, G, 1, 1, 1, 1, 1)
    split = jnp.float32(2.0 ** -5)
    qp = MatMulQP(
        A_interval=split / 127,
        B_interval=jnp.asarray(
            np.abs(B).max((0, 2, 3)).reshape(shape) / 127.5),
        split=split)
    ref = np.asarray(apply_matmul(jnp.asarray(A), jnp.asarray(B), qp))
    got = np.asarray(matmul_int8(jnp.asarray(A), jnp.asarray(B), qp))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_full_model_int8_forward(rng):
    """End-to-end: calibrated tiny ViT, int8 engine vs fake-quant logits."""
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    for cfg in (small_cfg(ptq4vit()), small_cfg(base_ptq())):
        qstate = HessianQuantCalibrator(net, cfg, calib, batch_size=4) \
            .batching_quant_calib(verbose=False)
        x = jnp.asarray(calib[:4])
        fake = np.asarray(net.apply(x, qstate=qstate))
        int8 = np.asarray(net.apply(x, qstate=qstate, int8=True))
        np.testing.assert_allclose(int8, fake, rtol=1e-3, atol=1e-3)


def test_bf16_compute_mode_close_to_f32(rng):
    """Serving mode: bf16 activations + int8 matmuls stays close to the
    fp32 int8 path (top-1 decisions should rarely differ)."""
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    x = jnp.asarray(calib[:4])
    f32 = np.asarray(net.forward(net.params, x, net.cfg, qstate=qstate,
                                 int8=True))
    bf16 = np.asarray(net.forward(net.params, x, net.cfg, qstate=qstate,
                                  int8=True, compute_dtype=jnp.bfloat16))
    assert bf16.dtype == np.dtype(jnp.bfloat16)
    rel = np.abs(bf16.astype(np.float32) - f32).max() / \
        (np.abs(f32).max() + 1e-9)
    assert rel < 0.1
    # FP (unquantized) bf16 mode also runs
    fp_bf = net.forward(net.params, x, net.cfg, compute_dtype=jnp.bfloat16)
    assert fp_bf.dtype == jnp.bfloat16

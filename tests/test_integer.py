"""Integer-export bit-compatibility tests vs torch oracles of the reference
formulas (uint8 twin layouts, blocked int8 weights, padded matmul operands)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
from ptq4vit_tpu.configs import ptq4vit
from ptq4vit_tpu.quant.fakequant import GELU_NEG_CLIP
from ptq4vit_tpu.quant.qparams import LinearQP, MatMulQP
from ptq4vit_tpu.utils import integer as I
from tests.test_calibrator import small_cfg
from tests.test_capture import tiny_net


def test_int_weight_roundtrip(rng):
    oc, ic, n_V = 12, 8, 3
    w = rng.standard_normal((oc, ic)).astype(np.float32)
    w4 = w.reshape(n_V, oc // n_V, 1, ic)
    interval = np.abs(w4).max(axis=(1, 3), keepdims=True) / 127.5
    qp = LinearQP(w_interval=jnp.asarray(interval),
                  a_interval=jnp.ones((1, 1)), w_bit=8, a_bit=8)
    w_int = I.quantize_int_weight(w, qp)
    assert w_int.dtype == np.int8
    # oracle
    ref = (torch.from_numpy(w4.copy()) / torch.from_numpy(interval.copy())) \
        .round_().clamp_(-128, 127).reshape(oc, ic).to(torch.int8)
    np.testing.assert_array_equal(w_int, ref.numpy())
    # dequant reproduces the fake-quant weight exactly
    deq = I.dequantize_int_weight(w_int, qp)
    np.testing.assert_allclose(
        deq, np.asarray(qp.quant_weight(jnp.asarray(w))), rtol=1e-6)


def test_postgelu_uint8_layout(rng):
    ic, qmax = 8, 128
    x = np.abs(rng.standard_normal((4, 5, ic))).astype(np.float32)
    x[0] *= -0.04
    a_int = np.asarray([[np.float32(x.max() / 127.5)]])
    qp = LinearQP(w_interval=jnp.ones((1, 1, 1, 1)),
                  a_interval=jnp.asarray(a_int),
                  a_neg_interval=jnp.float32(GELU_NEG_CLIP / qmax),
                  w_bit=8, a_bit=8, postgelu=True)
    got = I.quantize_int_activation({"x": x}, qp, "qlinear_MLP_2")["x"]
    assert got.dtype == np.uint8
    # oracle (reference integer.py:56-68)
    xt = torch.from_numpy(x.copy())
    pos = (xt / float(a_int[0, 0])).round_().clamp_(0, qmax - 1) \
        .to(torch.uint8) + 128
    neg = (xt / (GELU_NEG_CLIP / qmax)).round_().clamp_(-qmax + 1, 0) \
        .abs().to(torch.uint8)
    np.testing.assert_array_equal(got, (pos + neg).numpy())


def test_sos_uint8_layout(rng):
    qmax = 128
    A = rng.random((2, 3, 6, 6)).astype(np.float32)
    B = rng.standard_normal((2, 3, 6, 4)).astype(np.float32)
    split = 2.0 ** -6
    qp = MatMulQP(A_interval=jnp.float32(split / (qmax - 1)),
                  B_interval=jnp.asarray(
                      np.abs(B).max(axis=(0, 2, 3)).reshape(1, 3, 1, 1, 1, 1, 1)
                      / 127.5),
                  split=jnp.float32(split), A_bit=8, B_bit=8)
    got = I.quantize_int_activation({"a": A, "b": B}, qp, "qmatmul_scorev")
    assert got["a"].dtype == np.uint8 and got["b"].dtype == np.int8
    At = torch.from_numpy(A.copy())
    hi = (At.clamp(split, 1) * (qmax - 1)).round_().clamp_(0, qmax - 1) \
        .to(torch.uint8) + 128
    lo = (At.clamp(0, split) / (split / (qmax - 1))).round_() \
        .clamp_(0, qmax - 1).to(torch.uint8)
    np.testing.assert_array_equal(got["a"], (hi + lo).numpy())
    # B: blocked per-head int8
    Bi = torch.from_numpy(B.copy()) / torch.from_numpy(
        np.asarray(qp.B_interval).reshape(1, 3, 1, 1).copy())
    ref_b = Bi.round_().clamp_(-128, 127).to(torch.int8)
    np.testing.assert_array_equal(got["b"], ref_b.numpy())


def test_model_export_end_to_end(rng):
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    ints = I.get_model_int_weight(net, qstate)
    # all weighted ops exported (matmuls have no weights)
    weighted = [n for n, t in net.op_inventory if "qmatmul" not in t]
    assert set(ints) == set(weighted)
    assert all(v.dtype == np.int8 for v in ints.values())
    acts = I.get_model_int_activations(net, qstate, calib[:4], batch_size=4)
    assert acts["blocks.0.mlp.fc2"]["x"].dtype == np.uint8      # twin GELU
    assert acts["blocks.0.attn.matmul2"]["a"].dtype == np.uint8  # SoS
    assert acts["blocks.0.attn.matmul1"]["a"].dtype == np.int8
    assert "patch_embed.proj" not in acts                        # a_bit=32


def test_w6_export_skipped(rng):
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()).set_bits(6, 6),
                                    calib, batch_size=4) \
        .batching_quant_calib(verbose=False)
    # reference silently skips non-8-bit weights (integer.py:124-127)
    assert I.get_model_int_weight(net, qstate) == {}

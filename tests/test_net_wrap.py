"""Op-selection (ablation wrapping), BN folding, quantile conv tests."""
import jax.numpy as jnp
import numpy as np
import torch

from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
from ptq4vit_tpu.calib.capture import OpCapture
from ptq4vit_tpu.calib.search import chunked_quantile, search_conv
from ptq4vit_tpu.configs import ptq4vit
from ptq4vit_tpu.configs.policy import OpPolicy
from ptq4vit_tpu.models.net_wrap import (fold_bn_into_conv,
                                         wrap_certain_modules_in_net,
                                         wrap_modules_in_net)
from tests.test_calibrator import small_cfg
from tests.test_capture import tiny_net


def test_wrap_modules_full():
    net = tiny_net()
    wm = wrap_modules_in_net(net, ptq4vit())
    assert list(wm) == [n for n, _ in net.op_inventory]


def test_wrap_certain_modules_subset():
    net = tiny_net()
    wm = wrap_certain_modules_in_net(net, ptq4vit(), layers=[1],
                                     modules_to_wrap=["qkv", "fc2"])
    assert set(wm) == {"blocks.1.attn.qkv", "blocks.1.mlp.fc2"}
    wm2 = wrap_certain_modules_in_net(net, ptq4vit(), layers=[0],
                                      modules_to_wrap=["matmul1"],
                                      wrap_embedding=True)
    assert set(wm2) == {"patch_embed.proj", "blocks.0.attn.matmul1"}


def test_wrap_certain_modules_swin_block_index():
    """Swin paths carry a stage index before the block index
    (layers.<stage>.blocks.<idx>....); ablation selection must key on the
    BLOCK index (reference net_wrap.py:104-107), not the first integer."""
    class FakeNet:
        op_inventory = [
            ("patch_embed.proj", "qconv"),
            ("layers.0.blocks.0.attn.qkv", "qlinear_qkv"),
            ("layers.0.blocks.1.attn.qkv", "qlinear_qkv"),
            ("layers.2.blocks.0.attn.qkv", "qlinear_qkv"),
            ("layers.2.blocks.5.attn.qkv", "qlinear_qkv"),
        ]
    wm = wrap_certain_modules_in_net(FakeNet(), ptq4vit(), layers=[0],
                                     modules_to_wrap=["qkv"])
    assert set(wm) == {"layers.0.blocks.0.attn.qkv",
                       "layers.2.blocks.0.attn.qkv"}
    wm5 = wrap_certain_modules_in_net(FakeNet(), ptq4vit(), layers=[5],
                                      modules_to_wrap=["qkv"])
    assert set(wm5) == {"layers.2.blocks.5.attn.qkv"}


def test_partial_calibration_runs(rng):
    net = tiny_net()
    calib = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    wm = wrap_certain_modules_in_net(net, ptq4vit(), layers=[0],
                                     modules_to_wrap=["qkv", "proj"])
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4, wrapped_modules=wm) \
        .batching_quant_calib(verbose=False)
    assert set(qstate) == set(wm)
    # partial qstate forward: wrapped ops quantized, others raw
    np.asarray(net.apply(jnp.asarray(calib[:2]), qstate=qstate))


def test_fold_bn_matches_torch(rng):
    oc, ic = 6, 4
    w = rng.standard_normal((oc, ic, 3, 3)).astype(np.float32)
    b = rng.standard_normal((oc,)).astype(np.float32)
    mean = rng.standard_normal((oc,)).astype(np.float32)
    var = np.abs(rng.standard_normal((oc,))).astype(np.float32) + 0.1
    gw = rng.standard_normal((oc,)).astype(np.float32)
    gb = rng.standard_normal((oc,)).astype(np.float32)
    out = fold_bn_into_conv(
        {"weight": w, "bias": b},
        {"running_mean": mean, "running_var": var, "weight": gw, "bias": gb},
        eps=1e-5)
    # oracle: y = gw*(conv-mean)/std + gb
    std = np.sqrt(var + 1e-5)
    ref_w = w * (gw / std).reshape(oc, 1, 1, 1)
    ref_b = gw * b / std + (gb - gw * mean / std)
    np.testing.assert_allclose(np.asarray(out["weight"]), ref_w, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out["bias"]), ref_b, rtol=1e-5)


def test_quantile_conv(rng):
    pol = OpPolicy(quantizer="conv_quantile", metric="cosine", eq_alpha=0.5,
                   eq_beta=1.2, eq_n=8, search_round=1, w_bit=8, a_bit=8)
    w = rng.standard_normal((6, 3, 2, 2)).astype(np.float32)
    x = rng.standard_normal((4, 9, 12)).astype(np.float32)
    cap = OpCapture(kind="conv", inputs={"x": x},
                    out=np.zeros((4, 9, 6), np.float32))
    qp = search_conv(w, None, cap, pol)
    ref_w = torch.quantile(torch.from_numpy(np.abs(w).copy()), 0.9999) / 127.5
    np.testing.assert_allclose(float(qp.w_interval), float(ref_w), rtol=1e-5)
    ref_a = torch.quantile(torch.from_numpy(np.abs(x).copy()), 0.9999) / 127.5
    np.testing.assert_allclose(float(qp.a_interval), float(ref_a), rtol=1e-5)


def test_chunked_quantile_small_equals_plain(rng):
    x = rng.standard_normal((1000,)).astype(np.float32)
    assert abs(chunked_quantile(x, 0.99)
               - float(np.quantile(np.abs(x), 0.99))) < 1e-6


def test_tracer_spans():
    import time
    from ptq4vit_tpu.utils.tracing import Tracer
    tr = Tracer()
    with tr.span("calib"):
        with tr.span("capture"):
            time.sleep(0.01)
    assert tr.spans["calib/capture"] >= 0.01
    assert "calib" in tr.spans and "{" in tr.summary()

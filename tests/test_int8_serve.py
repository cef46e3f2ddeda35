"""Fused Pallas serving kernels (ops/int8_serve.py) + packed int8 weights
(ops/pack.py): must reproduce the XLA int8 path (itself verified against
fake-quant) up to fp32 rescale rounding."""
import jax.numpy as jnp
import numpy as np

from ptq4vit_tpu.ops.int8 import linear_int8
from ptq4vit_tpu.ops.int8_serve import fused_linear
from ptq4vit_tpu.ops.pack import pack_weights
from ptq4vit_tpu.quant.fakequant import GELU_NEG_CLIP
from ptq4vit_tpu.quant.qparams import LinearQP
from tests.test_capture import tiny_net


def _qp(w, x, n_V=1, postgelu=False):
    N, K = w.shape
    w4 = w.reshape(n_V, N // n_V, 1, K)
    return LinearQP(
        w_interval=jnp.asarray(np.abs(w4).max((1, 3), keepdims=True) / 127.5),
        a_interval=jnp.asarray([[np.float32(np.abs(x).max() / 127.5)]]),
        a_neg_interval=(jnp.float32(GELU_NEG_CLIP / 128) if postgelu else None),
        postgelu=postgelu)


def test_fused_linear_matches_xla_int8(rng):
    for (M, K, N, n_V, postgelu) in [(37, 128, 96, 3, False),
                                     (300, 256, 130, 1, False),
                                     (64, 128, 64, 1, True)]:
        w = rng.standard_normal((N, K)).astype(np.float32)
        b = rng.standard_normal((N,)).astype(np.float32)
        x = rng.standard_normal((2, M, K)).astype(np.float32)
        if postgelu:
            x = np.abs(x)
            x[:, ::3] *= -0.05
        qp = _qp(w, x, n_V, postgelu)
        ref = np.asarray(linear_int8(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b), qp))
        got = np.asarray(fused_linear(jnp.asarray(x), jnp.asarray(w),
                                      jnp.asarray(b), qp, {}))
        np.testing.assert_allclose(got, ref, rtol=1e-5,
                                   atol=1e-5 * np.abs(ref).max())


def test_fused_linear_out_of_scope_falls_back(rng):
    w = rng.standard_normal((8, 12)).astype(np.float32)  # K % 128 != 0
    x = rng.standard_normal((4, 12)).astype(np.float32)
    assert fused_linear(jnp.asarray(x), jnp.asarray(w), None,
                        _qp(w, x), {}) is None


def test_fused_attention_matches_fake_quant(rng):
    from ptq4vit_tpu.models.common import softmax_f32
    from ptq4vit_tpu.ops.int8_serve import fused_attention
    from ptq4vit_tpu.quant.qparams import MatMulQP, apply_matmul

    B, H, N, hd = 2, 3, 37, 64
    q = rng.standard_normal((B, H, N, hd)).astype(np.float32)
    k = rng.standard_normal((B, H, N, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, N, hd)).astype(np.float32)
    shape = (1, H, 1, 1, 1, 1, 1)
    qp1 = MatMulQP(
        A_interval=jnp.asarray(np.abs(q).max((0, 2, 3)).reshape(shape) / 127.5),
        B_interval=jnp.asarray(np.abs(k).max((0, 2, 3)).reshape(shape) / 127.5))
    scale = hd ** -0.5
    attn = apply_matmul(jnp.asarray(q),
                        jnp.swapaxes(jnp.asarray(k), -2, -1), qp1) * scale
    attn = softmax_f32(attn)
    for sos in (True, False):
        split = jnp.float32(2.0 ** -4)
        qp2 = MatMulQP(
            A_interval=(split / 127.0 if sos
                        else jnp.full(shape, 1 / 127.5, jnp.float32)),
            B_interval=jnp.asarray(
                np.abs(v).max((0, 2, 3)).reshape(shape) / 127.5),
            split=(split if sos else None))
        ref = np.asarray(apply_matmul(attn, jnp.asarray(v), qp2))
        got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v), qp1, qp2, scale))
        np.testing.assert_allclose(got, ref, rtol=1e-5,
                                   atol=2e-5 * np.abs(ref).max())


def test_fused_attention_qkv_matches_generic(rng):
    """The layout-free kernel (q/v read straight from the (B,N,3d) qkv
    buffer, out written as (B,N,d)) must match the generic fused path."""
    from ptq4vit_tpu.models.common import softmax_f32
    from ptq4vit_tpu.ops.int8_serve import fused_attention_qkv
    from ptq4vit_tpu.quant.qparams import MatMulQP, apply_matmul

    B, H, N, hd = 2, 2, 37, 64
    d = H * hd
    qkv = rng.standard_normal((B, N, 3 * d)).astype(np.float32)
    qkv_r = qkv.reshape(B, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]
    shape = (1, H, 1, 1, 1, 1, 1)
    qp1 = MatMulQP(
        A_interval=jnp.asarray(np.abs(q).max((0, 2, 3)).reshape(shape) / 127.5),
        B_interval=jnp.asarray(np.abs(k).max((0, 2, 3)).reshape(shape) / 127.5))
    split = jnp.float32(2.0 ** -4)
    qp2 = MatMulQP(A_interval=split / 127.0,
                   B_interval=jnp.asarray(
                       np.abs(v).max((0, 2, 3)).reshape(shape) / 127.5),
                   split=split)
    scale = hd ** -0.5
    attn = apply_matmul(jnp.asarray(q),
                        jnp.swapaxes(jnp.asarray(k), -2, -1), qp1) * scale
    ref = np.asarray(apply_matmul(softmax_f32(attn), jnp.asarray(v), qp2))
    ref = ref.transpose(0, 2, 1, 3).reshape(B, N, d)
    got = np.asarray(fused_attention_qkv(jnp.asarray(qkv), H, qp1, qp2,
                                         scale))
    np.testing.assert_allclose(got, ref, rtol=1e-5,
                               atol=2e-5 * np.abs(ref).max())


import pytest


@pytest.mark.parametrize("bits", [8, 6])
def test_fused_vit_block_path_matches_int8(rng, bits):
    """Whole-block fusion (LN prologues + int8 handoffs) on a ViT whose
    dims satisfy the kernel constraints (hd=64, heads even) must match the
    XLA int8 forward, and must actually take the block fast path — at W8A8
    AND at the reference grid's W6A6 half (example/test_all.py:107-113):
    6-bit levels ride the same int8 operands with qmax 32."""
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import vit as vit_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.ops.int8_serve import fused_vit_block
    from tests.test_calibrator import small_cfg

    cfg = vit_mod.ViTConfig(name="blk_vit", img_size=32, patch_size=8,
                            embed_dim=128, depth=2, num_heads=2,
                            num_classes=10)
    net = Net(name=cfg.name, cfg=cfg,
              params=vit_mod.init_params(jax.random.PRNGKey(0), cfg),
              forward=vit_mod.forward,
              op_inventory=vit_mod.op_inventory(cfg),
              op_shapes=vit_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(
        net, small_cfg(ptq4vit()).set_bits(bits, bits), x,
        batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)

    # the block fast path must be in scope for these dims
    from ptq4vit_tpu.models.common import QuantCtx
    ctx = QuantCtx(qstate=qstate, int8="fused", packed=packed)
    blk = net.params["blocks"][0]
    xs = jnp.asarray(rng.standard_normal((2, cfg.seq_len, 128)),
                     jnp.float32)
    assert ctx.vit_block("blocks.0", xs, blk, 2, cfg.head_dim ** -0.5,
                         cfg.ln_eps) is not None

    ref = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    got = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8="fused",
                               packed=packed))
    assert (ref.argmax(-1) == got.argmax(-1)).all()
    np.testing.assert_allclose(got, ref, rtol=1e-3,
                               atol=2e-3 * np.abs(ref).max())


def test_fused_swin_window_attention_matches_int8(rng):
    """Swin fused window attention (rel-pos bias + shifted-window mask +
    pre-scaled q quantization in-kernel) must match the XLA int8 forward,
    and the fast path must engage for a window geometry in scope."""
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from tests.test_calibrator import small_cfg

    # window 4 -> N=16; heads 2/4 with hd 16/8... pick dims so 128 % hd == 0
    cfg = swin_mod.SwinConfig(name="blk_swin", img_size=32, patch_size=2,
                              embed_dim=32, depths=(2, 2), num_heads=(2, 4),
                              window_size=4, num_classes=10)
    net = Net(name=cfg.name, cfg=cfg,
              params=swin_mod.init_params(jax.random.PRNGKey(0), cfg),
              forward=swin_mod.forward,
              op_inventory=swin_mod.op_inventory(cfg),
              op_shapes=swin_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), x,
                                    batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)

    # fast path in scope: hd = 16 -> hp_n = 8 divides... heads=2, hp_n=8
    # does NOT divide -> stage0 falls back; stage1 heads=4 hd=8 hp_n=16
    # falls back too.  Use the kernel directly on a compatible geometry:
    from ptq4vit_tpu.ops.int8_serve import fused_window_attention_qkv
    from ptq4vit_tpu.quant.qparams import MatMulQP, apply_matmul
    from ptq4vit_tpu.models.common import softmax_f32

    B_, H, N, hd = 6, 2, 16, 64
    C = H * hd
    nW = 3
    qkv = rng.standard_normal((B_, N, 3 * C)).astype(np.float32)
    bias = rng.standard_normal((H, N, N)).astype(np.float32) * 0.1
    mask = np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0) \
        .astype(np.float32)
    qkv_r = qkv.reshape(B_, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]
    s = hd ** -0.5
    shape = (1, H, 1, 1, 1, 1, 1)
    qp1 = MatMulQP(
        A_interval=jnp.asarray(
            (np.abs(q).max((0, 2, 3)) * s).reshape(shape) / 127.5),
        B_interval=jnp.asarray(np.abs(k).max((0, 2, 3)).reshape(shape) / 127.5))
    split = jnp.float32(2.0 ** -4)
    qp2 = MatMulQP(A_interval=split / 127.0,
                   B_interval=jnp.asarray(
                       np.abs(v).max((0, 2, 3)).reshape(shape) / 127.5),
                   split=split)
    attn = apply_matmul(jnp.asarray(q * s),
                        jnp.swapaxes(jnp.asarray(k), -2, -1), qp1)
    attn = attn + jnp.asarray(bias)[None]
    attn = (attn.reshape(B_ // nW, nW, H, N, N)
            + jnp.asarray(mask)[None, :, None]).reshape(B_, H, N, N)
    ref = np.asarray(apply_matmul(softmax_f32(attn), jnp.asarray(v), qp2))
    ref = ref.transpose(0, 2, 1, 3).reshape(B_, N, C)
    got = fused_window_attention_qkv(jnp.asarray(qkv), H, nW, qp1, qp2,
                                     s, bias, mask)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5,
                               atol=2e-5 * np.abs(ref).max())

    # end-to-end: the swin fused forward (fused linears + fallback windows)
    # must still match the XLA int8 engine
    ref_l = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    got_l = np.asarray(net.apply(jnp.asarray(x), qstate=qstate,
                                 int8="fused", packed=packed))
    assert (ref_l.argmax(-1) == got_l.argmax(-1)).all()
    np.testing.assert_allclose(got_l, ref_l, rtol=1e-3,
                               atol=2e-3 * np.abs(ref_l).max())


@pytest.mark.parametrize("bits", [8, 6])
def test_fused_swin_block_path_matches_int8(rng, bits):
    """Whole-Swin-block fused path (roll/partition first, LN prologues,
    int8 qkv->window-attention->proj and fc1->fc2 handoffs) must engage for
    an in-scope geometry and match the XLA int8 forward — at W8A8 AND at
    W6A6 (the reference grid's other half)."""
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.ops.int8_serve import fused_swin_block
    from tests.test_calibrator import small_cfg

    # hd = 64 -> hp_n = 2; heads (2, 4) both divisible -> block path in scope
    cfg = swin_mod.SwinConfig(name="blk_swin2", img_size=32, patch_size=4,
                              embed_dim=128, depths=(2, 1), num_heads=(2, 4),
                              window_size=4, num_classes=10)
    net = Net(name=cfg.name, cfg=cfg,
              params=swin_mod.init_params(jax.random.PRNGKey(0), cfg),
              forward=swin_mod.forward,
              op_inventory=swin_mod.op_inventory(cfg),
              op_shapes=swin_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(
        net, small_cfg(ptq4vit()).set_bits(bits, bits), x,
        batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)

    # the block path must be in scope for stage 0 (shifted block included)
    blk = net.params["layers"][0]["blocks"][1]        # the shifted block
    p = "layers.0.blocks.1"
    qps = {k: qstate.get(f"{p}.attn.{k}" if k in
                         ("qkv", "matmul1", "matmul2", "proj")
                         else f"{p}.mlp.{k}")
           for k in ("qkv", "matmul1", "matmul2", "proj", "fc1", "fc2")}
    from ptq4vit_tpu.models.swin import (relative_position_index,
                                         shifted_window_mask)
    ws, shift = cfg.block_geometry(0, 1)
    assert shift > 0
    rpi = relative_position_index(ws).reshape(-1)
    bias = blk["attn"]["relative_position_bias_table"][rpi] \
        .reshape(ws * ws, ws * ws, 2).transpose(2, 0, 1)
    mask = shifted_window_mask(8, ws, shift)
    xs = jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
    got = fused_swin_block(xs, blk, qps, {}, 2, ws, shift, 8, bias, mask,
                           cfg.ln_eps)
    assert got is not None

    # the UNSHIFTED block must take the window-band zero-copy path
    # (partition/reverse/residual folded into the kernels)
    blk0 = net.params["layers"][0]["blocks"][0]
    p0 = "layers.0.blocks.0"
    qps0 = {k: qstate.get(f"{p0}.attn.{k}" if k in
                          ("qkv", "matmul1", "matmul2", "proj")
                          else f"{p0}.mlp.{k}")
            for k in ("qkv", "matmul1", "matmul2", "proj", "fc1", "fc2")}
    ws0, shift0 = cfg.block_geometry(0, 0)
    assert shift0 == 0
    bias0 = blk0["attn"]["relative_position_bias_table"][rpi] \
        .reshape(ws0 * ws0, ws0 * ws0, 2).transpose(2, 0, 1)
    got0 = fused_swin_block(xs, blk0, qps0, {}, 2, ws0, 0, 8, bias0, None,
                            cfg.ln_eps)
    assert got0 is not None

    # end-to-end: fused forward (block path engaged) matches XLA int8
    ref = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    out = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8="fused",
                               packed=packed))
    assert (ref.argmax(-1) == out.argmax(-1)).all()
    np.testing.assert_allclose(out, ref, rtol=1e-3,
                               atol=2e-3 * np.abs(ref).max())


def test_packed_fused_model_forward_matches_int8(rng):
    """End-to-end: pack_weights + int8='fused' on a tiny ViT must match the
    unpacked XLA int8 forward."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from tests.test_calibrator import small_cfg

    net = tiny_net()
    x = rng.standard_normal((4, 3, net.cfg.img_size, net.cfg.img_size)) \
        .astype(np.float32)
    from ptq4vit_tpu.configs import ptq4vit
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), x,
                                    batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)
    assert any("w_intT" in v for v in packed.values())
    ref = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    got = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8="fused",
                               packed=packed))
    np.testing.assert_allclose(got, ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())
    # packed weights alone (XLA path) are bit-compatible too
    got2 = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True,
                                packed=packed))
    np.testing.assert_allclose(got2, ref, rtol=1e-5,
                               atol=1e-5 * np.abs(ref).max())

def test_fused_relaxed_close_to_exact(rng):
    """int8="fused_relaxed" (bf16 softmax/SoS/GELU/requant epilogues,
    ServingEngine(relaxed=True)) intentionally breaks bit-equality with the
    fake-quant semantics, but must stay within bf16-rounding distance of
    the exact fused path — quantized levels shift by at most one step, so
    logits move by O(one-level * sensitivity), not O(1)."""
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import vit as vit_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from tests.test_calibrator import small_cfg

    cfg = vit_mod.ViTConfig(name="blk_vit_rlx", img_size=32, patch_size=8,
                            embed_dim=128, depth=2, num_heads=2,
                            num_classes=10)
    net = Net(name=cfg.name, cfg=cfg,
              params=vit_mod.init_params(jax.random.PRNGKey(0), cfg),
              forward=vit_mod.forward,
              op_inventory=vit_mod.op_inventory(cfg),
              op_shapes=vit_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), x,
                                    batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)
    exact = np.asarray(net.apply(jnp.asarray(x), qstate=qstate,
                                 int8="fused", packed=packed))
    relaxed = np.asarray(net.apply(jnp.asarray(x), qstate=qstate,
                                   int8="fused_relaxed", packed=packed))
    assert np.abs(relaxed - exact).max() < 0.10 * np.abs(exact).max()
    assert (relaxed.argmax(-1) == exact.argmax(-1)).all()

    # ServingEngine plumbing: relaxed=True routes to the relaxed mode
    from ptq4vit_tpu.parallel import ServingEngine
    eng = ServingEngine(net, qstate, compute_dtype=jnp.float32, relaxed=True)
    via_engine = np.asarray(eng(x))
    np.testing.assert_allclose(via_engine, relaxed, rtol=1e-2,
                               atol=1e-2 * np.abs(relaxed).max())

def test_fused_relaxed_swin_close_to_exact(rng):
    """Swin relaxed mode: the window-band kernels' bf16 requant branch
    (_win_qkv_kernel) and the window attention's bf16 softmax/SoS chain
    must engage end-to-end and stay within bf16-rounding distance of the
    exact fused path."""
    import jax
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models import swin as swin_mod
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from tests.test_calibrator import small_cfg

    cfg = swin_mod.SwinConfig(name="blk_swin_rlx", img_size=32, patch_size=4,
                              embed_dim=128, depths=(2, 1), num_heads=(2, 4),
                              window_size=4, num_classes=10)
    net = Net(name=cfg.name, cfg=cfg,
              params=swin_mod.init_params(jax.random.PRNGKey(0), cfg),
              forward=swin_mod.forward,
              op_inventory=swin_mod.op_inventory(cfg),
              op_shapes=swin_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), x,
                                    batch_size=2).batching_quant_calib()
    packed = pack_weights(net.params, qstate)
    exact = np.asarray(net.apply(jnp.asarray(x), qstate=qstate,
                                 int8="fused", packed=packed))
    relaxed = np.asarray(net.apply(jnp.asarray(x), qstate=qstate,
                                   int8="fused_relaxed", packed=packed))
    assert np.abs(relaxed - exact).max() < 0.10 * np.abs(exact).max()
    assert not np.array_equal(relaxed, exact)  # the relaxed chain engaged

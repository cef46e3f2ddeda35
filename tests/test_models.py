"""Model forward parity vs independent torch oracles (random weights).

The oracles implement ViT/Swin from the published architecture equations in
torch — independently of both the jax code and the reference — so layout or
transpose bugs in either implementation show up as mismatches.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ptq4vit_tpu.models import get_net
from ptq4vit_tpu.models.registry import MODEL_ZOO
from ptq4vit_tpu.models.swin import (relative_position_index,
                                     shifted_window_mask)
from ptq4vit_tpu.models.vit import ViTConfig, forward as vit_forward, init_params

TINY_VIT = ViTConfig(name="test_vit", img_size=32, patch_size=8, embed_dim=24,
                     depth=2, num_heads=3, num_classes=10)


def t(x):
    return torch.from_numpy(np.asarray(x).copy())


def torch_layer_norm(x, w, b, eps):
    return F.layer_norm(x, (x.shape[-1],), t(w), t(b), eps)


def torch_vit_forward(params, x, cfg):
    x = t(x)
    pw, pb = t(params["patch_embed"]["proj"]["weight"]), t(params["patch_embed"]["proj"]["bias"])
    x = F.conv2d(x, pw, pb, stride=cfg.patch_size)       # B, C, nh, nw
    x = x.flatten(2).transpose(1, 2)                      # B, N, C
    B = x.shape[0]
    cls = t(params["cls_token"]).expand(B, -1, -1)
    if cfg.distilled:
        dist = t(params["dist_token"]).expand(B, -1, -1)
        x = torch.cat([cls, dist, x], dim=1) + t(params["pos_embed"])
    else:
        x = torch.cat([cls, x], dim=1) + t(params["pos_embed"])
    H, hd = cfg.num_heads, cfg.head_dim
    for blk in params["blocks"]:
        y = torch_layer_norm(x, blk["norm1"]["weight"], blk["norm1"]["bias"], cfg.ln_eps)
        qkv = F.linear(y, t(blk["attn"]["qkv"]["weight"]), t(blk["attn"]["qkv"]["bias"]))
        N = qkv.shape[1]
        qkv = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
        attn = attn.softmax(-1)
        y = (attn @ v).transpose(1, 2).reshape(B, N, cfg.embed_dim)
        y = F.linear(y, t(blk["attn"]["proj"]["weight"]), t(blk["attn"]["proj"]["bias"]))
        x = x + y
        y = torch_layer_norm(x, blk["norm2"]["weight"], blk["norm2"]["bias"], cfg.ln_eps)
        y = F.linear(y, t(blk["mlp"]["fc1"]["weight"]), t(blk["mlp"]["fc1"]["bias"]))
        y = F.gelu(y)
        y = F.linear(y, t(blk["mlp"]["fc2"]["weight"]), t(blk["mlp"]["fc2"]["bias"]))
        x = x + y
    x = torch_layer_norm(x, params["norm"]["weight"], params["norm"]["bias"], cfg.ln_eps)
    logits = F.linear(x[:, 0], t(params["head"]["weight"]),
                      t(params["head"]["bias"]))
    if cfg.distilled:
        logits_d = F.linear(x[:, 1], t(params["head_dist"]["weight"]),
                            t(params["head_dist"]["bias"]))
        logits = (logits + logits_d) / 2
    return logits


def test_vit_forward_matches_torch_oracle(rng):
    cfg = TINY_VIT
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = rng.standard_normal((2, 3, cfg.img_size, cfg.img_size)).astype(np.float32)
    ours = np.asarray(vit_forward(params, jnp.asarray(x), cfg))
    ref = torch_vit_forward(jax.tree.map(np.asarray, params), x, cfg).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_distilled_deit_forward_and_calibration(rng):
    """Distilled DeiT (dist_token + averaged twin heads): oracle parity,
    head_dist in the op inventory, and a full tiny calibration + int8
    forward.  The reference cannot run these models at all (its module-type
    map lacks head_dist, net_wrap.py:42)."""
    cfg = ViTConfig(name="test_deit_dist", img_size=32, patch_size=8,
                    embed_dim=24, depth=2, num_heads=3, num_classes=10,
                    distilled=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ours = np.asarray(vit_forward(params, jnp.asarray(x), cfg))
    ref = torch_vit_forward(jax.tree.map(np.asarray, params), x, cfg).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)

    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.models import vit as vit_mod
    from tests.test_calibrator import small_cfg
    inv = vit_mod.op_inventory(cfg)
    assert ("head_dist", "qlinear_classifier") in inv
    net = Net(name=cfg.name, cfg=cfg, params=params,
              forward=vit_mod.forward, op_inventory=inv,
              op_shapes=vit_mod.op_shapes(cfg),
              data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))
    calib = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=2).batching_quant_calib()
    assert set(qstate) == {n for n, _ in inv}
    logits = net.apply(jnp.asarray(x), qstate=qstate, int8=True)
    assert np.isfinite(np.asarray(logits)).all()

    # the fused Pallas serving path must cover the distilled layout too
    # (extra dist token -> N+1 rows; averaged twin heads stay unfused)
    from ptq4vit_tpu.ops.pack import pack_weights
    packed = pack_weights(net.params, qstate)
    fused = net.apply(jnp.asarray(x), qstate=qstate, int8="fused",
                      packed=packed)
    ref = np.asarray(logits)
    np.testing.assert_allclose(np.asarray(fused), ref, rtol=1e-4,
                               atol=1e-4 * np.abs(ref).max())


def test_vit_capture_taps_match_inventory():
    net = get_net("vit_tiny_patch16_224")
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    logits, taps = net.apply(x, capture=True)
    assert logits.shape == (1, 1000)
    names = [n for n, _ in net.op_inventory]
    assert set(names) == set(taps.keys())
    # tap fields consistent with op kind
    for name, mtype in net.op_inventory:
        fields = set(taps[name].keys())
        if "qmatmul" in mtype:
            assert fields == {"a", "b", "out"}
        else:
            assert fields == {"x", "out"}


# ---------------------------------------------------------------------------
# Swin oracle
# ---------------------------------------------------------------------------

def torch_swin_forward(params, x, cfg):
    x = t(x)
    pe = params["patch_embed"]
    x = F.conv2d(x, t(pe["proj"]["weight"]), t(pe["proj"]["bias"]),
                 stride=cfg.patch_size)
    x = x.flatten(2).transpose(1, 2)
    x = torch_layer_norm(x, pe["norm"]["weight"], pe["norm"]["bias"], cfg.ln_eps)
    B = x.shape[0]

    for i, layer in enumerate(params["layers"]):
        res, d, heads = cfg.layer_resolution(i), cfg.layer_dim(i), cfg.num_heads[i]
        hd = d // heads
        for j, blk in enumerate(layer["blocks"]):
            ws, shift = cfg.block_geometry(i, j)
            shortcut = x
            y = torch_layer_norm(x, blk["norm1"]["weight"], blk["norm1"]["bias"], cfg.ln_eps)
            y = y.view(B, res, res, d)
            if shift > 0:
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            # window partition
            y = y.view(B, res // ws, ws, res // ws, ws, d)
            y = y.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, d)
            B_, N = y.shape[0], ws * ws
            qkv = F.linear(y, t(blk["attn"]["qkv"]["weight"]), t(blk["attn"]["qkv"]["bias"]))
            qkv = qkv.reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0] * (hd ** -0.5), qkv[1], qkv[2]
            attn = q @ k.transpose(-2, -1)
            rpi = torch.from_numpy(relative_position_index(ws)).view(-1)
            bias = t(blk["attn"]["relative_position_bias_table"])[rpi]
            bias = bias.view(N, N, heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            mask = shifted_window_mask(res, ws, shift)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, heads, N, N) \
                    + t(mask).unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, heads, N, N)
            attn = attn.softmax(-1)
            y = (attn @ v).transpose(1, 2).reshape(B_, N, d)
            y = F.linear(y, t(blk["attn"]["proj"]["weight"]), t(blk["attn"]["proj"]["bias"]))
            # window reverse
            y = y.view(B, res // ws, res // ws, ws, ws, d)
            y = y.permute(0, 1, 3, 2, 4, 5).reshape(B, res, res, d)
            if shift > 0:
                y = torch.roll(y, (shift, shift), dims=(1, 2))
            x = shortcut + y.reshape(B, res * res, d)
            y = torch_layer_norm(x, blk["norm2"]["weight"], blk["norm2"]["bias"], cfg.ln_eps)
            y = F.linear(y, t(blk["mlp"]["fc1"]["weight"]), t(blk["mlp"]["fc1"]["bias"]))
            y = F.gelu(y)
            y = F.linear(y, t(blk["mlp"]["fc2"]["weight"]), t(blk["mlp"]["fc2"]["bias"]))
            x = x + y
        if "downsample" in layer:
            ds = layer["downsample"]
            y = x.view(B, res, res, d)
            y = torch.cat([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                           y[:, 0::2, 1::2], y[:, 1::2, 1::2]], -1)
            y = y.view(B, -1, 4 * d)
            y = torch_layer_norm(y, ds["norm"]["weight"], ds["norm"]["bias"], cfg.ln_eps)
            x = F.linear(y, t(ds["reduction"]["weight"]), None)
    x = torch_layer_norm(x, params["norm"]["weight"], params["norm"]["bias"], cfg.ln_eps)
    x = x.mean(dim=1)
    return F.linear(x, t(params["head"]["weight"]), t(params["head"]["bias"]))


def test_swin_forward_matches_torch_oracle(rng):
    from ptq4vit_tpu.models.swin import SwinConfig, forward as swin_forward, init_params as swin_init
    # tiny swin: 32px, patch 2 -> res 16, window 4, shifts exercised
    cfg = SwinConfig(name="test_swin", img_size=32, patch_size=2, embed_dim=12,
                     depths=(2, 2), num_heads=(2, 4), window_size=4,
                     num_classes=7)
    params = swin_init(jax.random.PRNGKey(1), cfg)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    ours = np.asarray(swin_forward(params, jnp.asarray(x), cfg))
    ref = torch_swin_forward(jax.tree.map(np.asarray, params), x, cfg).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_swin_capture_taps_match_inventory():
    net = get_net("swin_tiny_patch4_window7_224")
    x = jnp.zeros((1, 3, 224, 224), jnp.float32)
    logits, taps = net.apply(x, capture=True)
    assert logits.shape == (1, 1000)
    names = [n for n, _ in net.op_inventory]
    assert set(names) == set(taps.keys())
    assert "layers.0.downsample.reduction" in taps
    # matmul taps must be 4-D (B*nW, heads, N, N') per reference layout
    a = taps["layers.0.blocks.1.attn.matmul1"]["a"]
    assert a.ndim == 4 and a.shape[1] == 3 and a.shape[2] == 49


@pytest.mark.parametrize("name", list(MODEL_ZOO))
def test_zoo_configs_build(name):
    net = get_net(name)
    assert len(net.op_inventory) == len(net.op_shapes)

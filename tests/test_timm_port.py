"""utils/timm_port tests — checkpoint ingestion is the only step between a
timm pretrained state_dict (the reference's weight source,
utils/models.py:77 in hahnyuan/PTQ4ViT) and this framework's param pytree,
so its key mapping is pinned here by HAND-WRITTEN timm key tables
(independent of the converter's own code): fabricate a state_dict with
distinct random values per key, convert, and assert each pytree leaf equals
the state_dict entry the timm layout says it must come from.  Also covers:
npz round-trips (incl. >9 blocks to exercise numeric list ordering),
.pth -> .npz conversion + checkpoint discovery, buffer-key filtering
(relative_position_index / attn_mask / num_batches_tracked), the
unconsumed-key error, and forward equality of converted weights vs the
torch oracles of test_pipeline_parity."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ptq4vit_tpu.models import swin as swin_mod
from ptq4vit_tpu.models import vit as vit_mod
from ptq4vit_tpu.models.vit import ViTConfig
from ptq4vit_tpu.utils import timm_port as tp

VIT_CFG = ViTConfig(name="t", img_size=32, patch_size=8, embed_dim=24,
                    depth=12, num_heads=3, num_classes=10)
DEIT_CFG = ViTConfig(name="td", img_size=32, patch_size=8, embed_dim=24,
                     depth=2, num_heads=3, num_classes=10, distilled=True)
SWIN_CFG = swin_mod.SwinConfig(name="ts", img_size=32, patch_size=2,
                               embed_dim=12, depths=(2, 2), num_heads=(2, 4),
                               window_size=4, num_classes=7)


def _rank(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def _vit_sd(cfg, rng):
    """timm VisionTransformer / DeiT state_dict, keys written out by hand."""
    d, ps = cfg.embed_dim, cfg.patch_size
    hid = int(d * cfg.mlp_ratio)
    sd = {
        "cls_token": _rank(rng, 1, 1, d),
        "pos_embed": _rank(rng, 1, cfg.seq_len, d),
        "patch_embed.proj.weight": _rank(rng, d, 3, ps, ps),
        "patch_embed.proj.bias": _rank(rng, d),
        "norm.weight": _rank(rng, d),
        "norm.bias": _rank(rng, d),
        "head.weight": _rank(rng, cfg.num_classes, d),
        "head.bias": _rank(rng, cfg.num_classes),
    }
    if cfg.distilled:
        sd["dist_token"] = _rank(rng, 1, 1, d)
        sd["head_dist.weight"] = _rank(rng, cfg.num_classes, d)
        sd["head_dist.bias"] = _rank(rng, cfg.num_classes)
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": _rank(rng, d),
            f"{p}.norm1.bias": _rank(rng, d),
            f"{p}.attn.qkv.weight": _rank(rng, 3 * d, d),
            f"{p}.attn.qkv.bias": _rank(rng, 3 * d),
            f"{p}.attn.proj.weight": _rank(rng, d, d),
            f"{p}.attn.proj.bias": _rank(rng, d),
            f"{p}.norm2.weight": _rank(rng, d),
            f"{p}.norm2.bias": _rank(rng, d),
            f"{p}.mlp.fc1.weight": _rank(rng, hid, d),
            f"{p}.mlp.fc1.bias": _rank(rng, hid),
            f"{p}.mlp.fc2.weight": _rank(rng, d, hid),
            f"{p}.mlp.fc2.bias": _rank(rng, d),
        })
    return sd


def _swin_sd(cfg, rng):
    """timm SwinTransformer state_dict, keys written out by hand —
    including the non-parameter buffers timm serializes
    (relative_position_index, attn_mask) that ingestion must skip."""
    d0, ps = cfg.embed_dim, cfg.patch_size
    sd = {
        "patch_embed.proj.weight": _rank(rng, d0, 3, ps, ps),
        "patch_embed.proj.bias": _rank(rng, d0),
        "patch_embed.norm.weight": _rank(rng, d0),
        "patch_embed.norm.bias": _rank(rng, d0),
        "norm.weight": _rank(rng, cfg.layer_dim(cfg.num_layers - 1)),
        "norm.bias": _rank(rng, cfg.layer_dim(cfg.num_layers - 1)),
        "head.weight": _rank(rng, cfg.num_classes,
                             cfg.layer_dim(cfg.num_layers - 1)),
        "head.bias": _rank(rng, cfg.num_classes),
    }
    for i, depth in enumerate(cfg.depths):
        d = cfg.layer_dim(i)
        hid = int(d * cfg.mlp_ratio)
        heads = cfg.num_heads[i]
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            ws, shift = cfg.block_geometry(i, j)
            sd.update({
                f"{p}.norm1.weight": _rank(rng, d),
                f"{p}.norm1.bias": _rank(rng, d),
                f"{p}.attn.relative_position_bias_table":
                    _rank(rng, (2 * ws - 1) ** 2, heads),
                f"{p}.attn.relative_position_index":
                    np.zeros((ws * ws, ws * ws), np.int64),  # buffer: skip
                f"{p}.attn.qkv.weight": _rank(rng, 3 * d, d),
                f"{p}.attn.qkv.bias": _rank(rng, 3 * d),
                f"{p}.attn.proj.weight": _rank(rng, d, d),
                f"{p}.attn.proj.bias": _rank(rng, d),
                f"{p}.norm2.weight": _rank(rng, d),
                f"{p}.norm2.bias": _rank(rng, d),
                f"{p}.mlp.fc1.weight": _rank(rng, hid, d),
                f"{p}.mlp.fc1.bias": _rank(rng, hid),
                f"{p}.mlp.fc2.weight": _rank(rng, d, hid),
                f"{p}.mlp.fc2.bias": _rank(rng, d),
            })
            if shift:
                sd[f"{p}.attn_mask"] = np.zeros(
                    (1, ws * ws, ws * ws), np.float32)       # buffer: skip
        if i < cfg.num_layers - 1:
            sd[f"layers.{i}.downsample.norm.weight"] = _rank(rng, 4 * d)
            sd[f"layers.{i}.downsample.norm.bias"] = _rank(rng, 4 * d)
            sd[f"layers.{i}.downsample.reduction.weight"] = \
                _rank(rng, 2 * d, 4 * d)
    return sd


def _eq(leaf, sd_val, key):
    np.testing.assert_array_equal(np.asarray(leaf), sd_val, err_msg=key)


def test_vit_mapping(rng):
    sd = _vit_sd(VIT_CFG, rng)
    params = tp.vit_params_from_state_dict(dict(sd), VIT_CFG)
    _eq(params["cls_token"], sd["cls_token"], "cls_token")
    _eq(params["pos_embed"], sd["pos_embed"], "pos_embed")
    _eq(params["patch_embed"]["proj"]["weight"],
        sd["patch_embed.proj.weight"], "patch_embed.proj.weight")
    _eq(params["norm"]["bias"], sd["norm.bias"], "norm.bias")
    _eq(params["head"]["weight"], sd["head.weight"], "head.weight")
    assert len(params["blocks"]) == VIT_CFG.depth
    for i in range(VIT_CFG.depth):
        blk, p = params["blocks"][i], f"blocks.{i}"
        _eq(blk["norm1"]["weight"], sd[f"{p}.norm1.weight"], p)
        _eq(blk["attn"]["qkv"]["weight"], sd[f"{p}.attn.qkv.weight"], p)
        _eq(blk["attn"]["proj"]["bias"], sd[f"{p}.attn.proj.bias"], p)
        _eq(blk["norm2"]["bias"], sd[f"{p}.norm2.bias"], p)
        _eq(blk["mlp"]["fc1"]["weight"], sd[f"{p}.mlp.fc1.weight"], p)
        _eq(blk["mlp"]["fc2"]["bias"], sd[f"{p}.mlp.fc2.bias"], p)


def test_deit_distilled_mapping(rng):
    sd = _vit_sd(DEIT_CFG, rng)
    params = tp.vit_params_from_state_dict(dict(sd), DEIT_CFG)
    _eq(params["dist_token"], sd["dist_token"], "dist_token")
    _eq(params["head_dist"]["weight"], sd["head_dist.weight"],
        "head_dist.weight")
    _eq(params["head_dist"]["bias"], sd["head_dist.bias"], "head_dist.bias")


def test_swin_mapping(rng):
    sd = _swin_sd(SWIN_CFG, rng)
    params = tp.swin_params_from_state_dict(dict(sd), SWIN_CFG)
    _eq(params["patch_embed"]["proj"]["weight"],
        sd["patch_embed.proj.weight"], "patch_embed.proj.weight")
    _eq(params["patch_embed"]["norm"]["weight"],
        sd["patch_embed.norm.weight"], "patch_embed.norm.weight")
    for i, depth in enumerate(SWIN_CFG.depths):
        for j in range(depth):
            blk = params["layers"][i]["blocks"][j]
            p = f"layers.{i}.blocks.{j}"
            _eq(blk["attn"]["relative_position_bias_table"],
                sd[f"{p}.attn.relative_position_bias_table"], p)
            _eq(blk["attn"]["qkv"]["weight"], sd[f"{p}.attn.qkv.weight"], p)
            _eq(blk["mlp"]["fc2"]["weight"], sd[f"{p}.mlp.fc2.weight"], p)
        if i < SWIN_CFG.num_layers - 1:
            ds = params["layers"][i]["downsample"]
            _eq(ds["reduction"]["weight"],
                sd[f"layers.{i}.downsample.reduction.weight"], f"ds{i}")
            assert "bias" not in ds["reduction"]
    _eq(params["head"]["bias"], sd["head.bias"], "head.bias")


def test_unconsumed_key_raises(rng):
    sd = _vit_sd(VIT_CFG, rng)
    sd["blocks.0.attn.qkv.weight_orig"] = _rank(rng, 1)
    with pytest.raises(ValueError, match="unconsumed"):
        tp.vit_params_from_state_dict(sd, VIT_CFG)


def test_converted_forward_matches_torch_oracle(rng):
    """Converted weights drive the jax forward to the same logits as the
    torch oracle holding the same state_dict — pins layout conventions
    (conv kernel NCHW, (out, in) linear weights, token order) end to end."""
    from tests.test_pipeline_parity import torch_swin_forward

    sd = _vit_sd(DEIT_CFG, rng)
    params = tp.vit_params_from_state_dict(dict(sd), DEIT_CFG)
    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    got = np.asarray(vit_mod.forward(params, jnp.asarray(x), DEIT_CFG))
    params_np = jax.tree.map(np.asarray, params)
    np.testing.assert_allclose(got, _torch_deit_logits(params_np, x,
                                                       DEIT_CFG),
                               rtol=2e-5, atol=2e-5)

    sd = _swin_sd(SWIN_CFG, rng)
    params = tp.swin_params_from_state_dict(dict(sd), SWIN_CFG)
    got = np.asarray(swin_mod.forward(params, jnp.asarray(x), SWIN_CFG))
    params_np = jax.tree.map(np.asarray, params)
    with torch.no_grad():
        want = torch_swin_forward(params_np, x, SWIN_CFG).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _torch_deit_logits(params_np, x, cfg):
    """Independent torch forward of the distilled DeiT (timm
    DistilledVisionTransformer eval: prepend cls+dist tokens, average the
    two heads)."""
    import torch.nn.functional as F
    t = lambda a: torch.from_numpy(np.asarray(a))
    xt = t(x)
    B = xt.shape[0]
    d, Hn, hd, ps = cfg.embed_dim, cfg.num_heads, cfg.head_dim, cfg.patch_size
    nh = cfg.img_size // ps
    with torch.no_grad():
        xp = xt.reshape(B, 3, nh, ps, nh, ps).permute(0, 2, 4, 1, 3, 5) \
            .reshape(B, nh * nh, 3 * ps * ps)
        h = xp @ t(params_np["patch_embed"]["proj"]["weight"]) \
            .reshape(d, -1).T + t(params_np["patch_embed"]["proj"]["bias"])
        cls = t(params_np["cls_token"]).expand(B, -1, -1)
        dist = t(params_np["dist_token"]).expand(B, -1, -1)
        h = torch.cat([cls, dist, h], 1) + t(params_np["pos_embed"])
        for blk in params_np["blocks"]:
            y = F.layer_norm(h, (d,), t(blk["norm1"]["weight"]),
                             t(blk["norm1"]["bias"]), cfg.ln_eps)
            qkv = F.linear(y, t(blk["attn"]["qkv"]["weight"]),
                           t(blk["attn"]["qkv"]["bias"]))
            N = qkv.shape[1]
            qkv = qkv.reshape(B, N, 3, Hn, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
            y = (attn.softmax(-1) @ v).transpose(1, 2).reshape(B, N, d)
            y = F.linear(y, t(blk["attn"]["proj"]["weight"]),
                         t(blk["attn"]["proj"]["bias"]))
            h = h + y
            y = F.layer_norm(h, (d,), t(blk["norm2"]["weight"]),
                             t(blk["norm2"]["bias"]), cfg.ln_eps)
            y = F.gelu(F.linear(y, t(blk["mlp"]["fc1"]["weight"]),
                                t(blk["mlp"]["fc1"]["bias"])))
            y = F.linear(y, t(blk["mlp"]["fc2"]["weight"]),
                         t(blk["mlp"]["fc2"]["bias"]))
            h = h + y
        h = F.layer_norm(h, (d,), t(params_np["norm"]["weight"]),
                         t(params_np["norm"]["bias"]), cfg.ln_eps)
        lc = F.linear(h[:, 0], t(params_np["head"]["weight"]),
                      t(params_np["head"]["bias"]))
        ld = F.linear(h[:, 1], t(params_np["head_dist"]["weight"]),
                      t(params_np["head_dist"]["bias"]))
        return ((lc + ld) / 2).numpy()


def test_npz_round_trip(rng, tmp_path):
    """12-block ViT exercises numeric list ordering in unflatten (block 10
    must not sort before block 2)."""
    sd = _vit_sd(VIT_CFG, rng)
    params = tp.vit_params_from_state_dict(dict(sd), VIT_CFG)
    path = str(tmp_path / "m.npz")
    tp.save_params_npz(path, params)
    back = tp.load_params_npz(path)
    flat_a = tp.flatten_params(params)
    flat_b = tp.flatten_params(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)
    _eq(back["blocks"][10]["mlp"]["fc1"]["weight"],
        sd["blocks.10.mlp.fc1.weight"], "blocks.10")


def test_pth_conversion_and_discovery(rng, tmp_path, monkeypatch):
    """.pth (torch state_dict) -> .npz conversion through the zoo-name
    dispatch, then load_timm_checkpoint_if_any discovery."""
    from ptq4vit_tpu.models.registry import model_config
    name = "deit_tiny_distilled_patch16_224"
    cfg = model_config(name)
    sd = _vit_sd(cfg, rng)
    pth = str(tmp_path / f"{name}.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               pth)
    monkeypatch.setenv(tp.CKPT_ENV, str(tmp_path))
    out = tp.convert_torch_checkpoint(name, pth)
    assert out.endswith(f"{name}.npz") and os.path.exists(out)
    params = tp.load_timm_checkpoint_if_any(name)
    assert params is not None
    _eq(params["dist_token"], sd["dist_token"], "dist_token")
    _eq(params["blocks"][11]["attn"]["qkv"]["weight"],
        sd["blocks.11.attn.qkv.weight"], "blocks.11.attn.qkv.weight")
    assert tp.load_timm_checkpoint_if_any("no_such_model") is None

"""Capture-pass tests: tap contents and eps-gradients vs a torch-autograd
oracle running the same KL loss with the same probe target."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ptq4vit_tpu.calib.capture import capture
from ptq4vit_tpu.models.registry import Net, DataConfig
from ptq4vit_tpu.models import vit as vit_mod
from ptq4vit_tpu.models.vit import ViTConfig

CFG = ViTConfig(name="test_vit", img_size=32, patch_size=8, embed_dim=24,
                depth=2, num_heads=3, num_classes=10)


def tiny_net(seed=0):
    params = vit_mod.init_params(jax.random.PRNGKey(seed), CFG)
    return Net(name=CFG.name, cfg=CFG, params=params, forward=vit_mod.forward,
               op_inventory=vit_mod.op_inventory(CFG),
               op_shapes=vit_mod.op_shapes(CFG),
               data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))


def test_capture_shapes_and_inputs(rng):
    net = tiny_net()
    x = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)
    raw = capture(net, x, batch_size=4, need_grad=True)
    assert set(raw) == {n for n, _ in net.op_inventory}
    qkv = raw["blocks.0.attn.qkv"]
    assert qkv.kind == "linear"
    assert qkv.inputs["x"].shape == (8, CFG.seq_len, 24)
    assert qkv.out.shape == (8, CFG.seq_len, 72)
    assert qkv.grad.shape == qkv.out.shape
    mm = raw["blocks.1.attn.matmul1"]
    assert mm.inputs["a"].shape == (8, 3, CFG.seq_len, 8)
    assert mm.inputs["b"].shape == (8, 3, 8, CFG.seq_len)
    assert mm.out.shape == (8, 3, CFG.seq_len, CFG.seq_len)
    conv = raw["patch_embed.proj"]
    assert conv.inputs["x"].shape == (8, 16, 3 * 8 * 8)
    # raw out of qkv equals an independent raw forward's tap
    _, taps = net.apply(jnp.asarray(x), capture=True)
    np.testing.assert_allclose(qkv.out, np.asarray(taps["blocks.0.attn.qkv"]["out"]),
                               rtol=1e-5, atol=1e-6)


def test_grads_zero_without_probe(rng):
    net = tiny_net()
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    raw = capture(net, x, batch_size=4, need_grad=True, probe_sigma=0.0)
    # analytic KL gradient at pred == target is exactly zero on a
    # deterministic backend — the reference's signal is hardware noise
    g = raw["blocks.0.attn.qkv"].grad
    assert np.abs(g).max() < 1e-7


def test_grads_match_torch_autograd_oracle(rng):
    net = tiny_net()
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    sigma, seed = 1e-2, 7
    raw = capture(net, x, batch_size=4, need_grad=True, probe_seed=seed,
                  probe_sigma=sigma)

    # rebuild the same probe target
    logits = np.asarray(net.apply(jnp.asarray(x)))
    u = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), logits.shape))
    target = torch.softmax(torch.from_numpy(logits + sigma * u), dim=-1)

    # torch oracle with grad hooks on the qkv output of block 0 and the
    # matmul2 output of block 1
    params = jax.tree.map(np.asarray, net.params)
    grads_t = {}

    def torch_forward_with_taps(params, x, cfg):
        xt = torch.from_numpy(x.copy()).requires_grad_(True)
        pw = torch.from_numpy(params["patch_embed"]["proj"]["weight"].copy())
        pb = torch.from_numpy(params["patch_embed"]["proj"]["bias"].copy())
        h = F.conv2d(xt, pw, pb, stride=cfg.patch_size).flatten(2).transpose(1, 2)
        B = h.shape[0]
        cls = torch.from_numpy(params["cls_token"].copy()).expand(B, -1, -1)
        h = torch.cat([cls, h], 1) + torch.from_numpy(params["pos_embed"].copy())
        Hn, hd = cfg.num_heads, cfg.head_dim
        for bi, blk in enumerate(params["blocks"]):
            tp = lambda k: torch.from_numpy(k.copy())
            y = F.layer_norm(h, (cfg.embed_dim,), tp(blk["norm1"]["weight"]),
                             tp(blk["norm1"]["bias"]), cfg.ln_eps)
            qkv = F.linear(y, tp(blk["attn"]["qkv"]["weight"]),
                           tp(blk["attn"]["qkv"]["bias"]))
            if bi == 0:
                qkv.retain_grad()
                grads_t["qkv0"] = qkv
            N = qkv.shape[1]
            qkv_ = qkv.reshape(B, N, 3, Hn, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv_[0], qkv_[1], qkv_[2]
            attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
            attn = attn.softmax(-1)
            sv = attn @ v
            if bi == 1:
                sv.retain_grad()
                grads_t["sv1"] = sv
            y = sv.transpose(1, 2).reshape(B, N, cfg.embed_dim)
            y = F.linear(y, tp(blk["attn"]["proj"]["weight"]),
                         tp(blk["attn"]["proj"]["bias"]))
            h = h + y
            y = F.layer_norm(h, (cfg.embed_dim,), tp(blk["norm2"]["weight"]),
                             tp(blk["norm2"]["bias"]), cfg.ln_eps)
            y = F.linear(y, tp(blk["mlp"]["fc1"]["weight"]),
                         tp(blk["mlp"]["fc1"]["bias"]))
            y = F.gelu(y)
            y = F.linear(y, tp(blk["mlp"]["fc2"]["weight"]),
                         tp(blk["mlp"]["fc2"]["bias"]))
            h = h + y
        h = F.layer_norm(h, (cfg.embed_dim,),
                         torch.from_numpy(params["norm"]["weight"].copy()),
                         torch.from_numpy(params["norm"]["bias"].copy()),
                         cfg.ln_eps)
        return F.linear(h[:, 0],
                        torch.from_numpy(params["head"]["weight"].copy()),
                        torch.from_numpy(params["head"]["bias"].copy()))

    pred = torch_forward_with_taps(params, x, CFG)
    loss = F.kl_div(F.log_softmax(pred, -1), target, reduction="batchmean")
    loss.backward()

    g_qkv = raw["blocks.0.attn.qkv"].grad
    g_ref = grads_t["qkv0"].grad.numpy()
    assert np.abs(g_ref).max() > 0  # probe produced signal
    np.testing.assert_allclose(g_qkv, g_ref, rtol=5e-3, atol=2e-8)

    g_sv = raw["blocks.1.attn.matmul2"].grad
    g_ref2 = grads_t["sv1"].grad.numpy()
    np.testing.assert_allclose(g_sv, g_ref2, rtol=5e-3, atol=2e-8)

"""WHOLE-pipeline parity: a torch oracle of the reference's
HessianQuantCalibrator.batching_quant_calib (utils/quant_calib.py:300-378
in hahnyuan/PTQ4ViT) — per-module capture from the FP32 net with the
explicit probe target, per-op calibration_step2, then quant_forward — run
end-to-end on the tiny ViT and compared against
HessianQuantCalibrator + net.apply(qstate).

The per-op engines are already oracle-tested (test_search_parity); what
this pins is the INTER-op wiring the per-op tests can't see: which policy
each module type resolves to (qkv n_V*3, classifier n_V=1, fc2 twin-GELU,
scores@V SoS, conv channelwise with a_bit=32), where the quantizers sit in
the forward (matmul1 on the UNscaled q@k^T, softmax input, twin split),
and that the calibrated qstate composed through the real forward
reproduces the reference's quantized logits.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
from ptq4vit_tpu.configs import ptq4vit
from tests.test_calibrator import small_cfg
from tests.test_capture import CFG, tiny_net
from tests.test_search_parity import (oracle_conv, oracle_linear,
                                      oracle_matmul)

SIGMA, SEED = 1e-2, 3


def t(a):
    return torch.from_numpy(np.asarray(a).copy())


def torch_forward(params, x, cfg, taps=None, quant=None):
    """Torch mirror of models/vit.forward.  taps: dict collecting per-op
    (input(s), out) with retain_grad on outs (the reference's forward +
    backward hooks).  quant: {name: apply_fn(kind, *operands)} applying
    calibrated quantizers (reference quant_forward mode)."""
    xt = t(x)
    if taps is not None:
        xt.requires_grad_(True)   # make the graph grad-capable
    B = xt.shape[0]
    d, Hn, hd = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    ps = cfg.patch_size

    def op(name, kind, fn, *operands):
        if quant is not None and name in quant:
            operands = quant[name](kind, *operands)
        out = fn(*operands)
        if taps is not None:
            out.retain_grad()
            taps[name] = {"in": operands, "out": out, "kind": kind}
        return out

    # patch-embed conv as patchify+matmul (the repo's cache layout; the
    # similarity math is layout-invariant vs the reference's NCHW conv)
    pw, pb = t(params["patch_embed"]["proj"]["weight"]), \
        t(params["patch_embed"]["proj"]["bias"])
    nh = cfg.img_size // ps
    xp = xt.reshape(B, 3, nh, ps, nh, ps).permute(0, 2, 4, 1, 3, 5) \
        .reshape(B, nh * nh, 3 * ps * ps)
    h = op("patch_embed.proj", "conv",
           lambda xq, wq: xq @ wq.reshape(d, -1).T + pb, xp, pw)
    cls = t(params["cls_token"]).expand(B, -1, -1)
    h = torch.cat([cls, h], 1) + t(params["pos_embed"])

    for bi, blk in enumerate(params["blocks"]):
        p = f"blocks.{bi}"
        y = F.layer_norm(h, (d,), t(blk["norm1"]["weight"]),
                         t(blk["norm1"]["bias"]), cfg.ln_eps)
        qkv = op(f"{p}.attn.qkv", "linear",
                 lambda xq, wq: F.linear(xq, wq, t(blk["attn"]["qkv"]["bias"])),
                 y, t(blk["attn"]["qkv"]["weight"]))
        N = qkv.shape[1]
        qkv_ = qkv.reshape(B, N, 3, Hn, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv_[0], qkv_[1], qkv_[2]
        attn = op(f"{p}.attn.matmul1", "matmul",
                  lambda a, b: a @ b, q, k.transpose(-2, -1)) \
            * (hd ** -0.5)
        attn = attn.softmax(-1)
        sv = op(f"{p}.attn.matmul2", "matmul", lambda a, b: a @ b, attn, v)
        y = sv.transpose(1, 2).reshape(B, N, d)
        y = op(f"{p}.attn.proj", "linear",
               lambda xq, wq: F.linear(xq, wq, t(blk["attn"]["proj"]["bias"])),
               y, t(blk["attn"]["proj"]["weight"]))
        h = h + y
        y = F.layer_norm(h, (d,), t(blk["norm2"]["weight"]),
                         t(blk["norm2"]["bias"]), cfg.ln_eps)
        y = op(f"{p}.mlp.fc1", "linear",
               lambda xq, wq: F.linear(xq, wq, t(blk["mlp"]["fc1"]["bias"])),
               y, t(blk["mlp"]["fc1"]["weight"]))
        y = F.gelu(y)
        y = op(f"{p}.mlp.fc2", "linear",
               lambda xq, wq: F.linear(xq, wq, t(blk["mlp"]["fc2"]["bias"])),
               y, t(blk["mlp"]["fc2"]["weight"]))
        h = h + y

    h = F.layer_norm(h, (d,), t(params["norm"]["weight"]),
                     t(params["norm"]["bias"]), cfg.ln_eps)
    return op("head", "linear",
              lambda xq, wq: F.linear(xq, wq, t(params["head"]["bias"])),
              h[:, 0], t(params["head"]["weight"]))


def calibrate_taps(taps, op_inventory, quant_cfg, params):
    """Per-op calibration_step2 over captured taps via the oracle search
    fns -> qstate of torch intervals (shared by the ViT/Swin parallel and
    sequential pipeline oracles)."""
    qstate_t = {}
    for name, mtype in op_inventory:
        pol = quant_cfg.op_policy(mtype)
        rec = taps[name]
        grad = rec["out"].grad.detach().numpy()
        out = rec["out"].detach().numpy()
        if rec["kind"] == "conv":
            xp = rec["in"][0].detach().numpy()
            w = rec["in"][1].detach().numpy()
            w_int, _ = oracle_conv(
                w.reshape(w.shape[0], -1), _find_bias(params, name),
                xp, out, grad, pol,
                channelwise=(pol.quantizer == "conv_channelwise"))
            qstate_t[name] = {"w_int": w_int}
        elif rec["kind"] == "matmul":
            A = rec["in"][0].detach().numpy()
            Bm = rec["in"][1].detach().numpy()
            sos = pol.quantizer == "sos_matmul"
            a_state, B_int = oracle_matmul(A, Bm, out, grad, pol, sos=sos)
            qstate_t[name] = {"a_state": a_state, "B_int": B_int, "sos": sos}
        else:
            xin = rec["in"][0].detach().numpy()
            w = rec["in"][1].detach().numpy()
            S_ = xin.shape[0]
            x3 = xin.reshape(S_, -1, xin.shape[-1])
            o3 = out.reshape(S_, -1, out.shape[-1])
            g3 = grad.reshape(S_, -1, out.shape[-1])
            postgelu = pol.quantizer == "postgelu_linear"
            # oracle_linear folds the bias into raw_out via the forward;
            # here raw_out comes from the tap (bias included) and the
            # oracle's F.linear call adds the same bias -> pass b via taps
            b = _find_bias(params, name)
            w_int, a_int = oracle_linear(w, b, x3, o3, g3, pol,
                                         postgelu=postgelu)
            qstate_t[name] = {"w_int": w_int, "a_int": a_int,
                              "postgelu": postgelu, "pol": pol}
    return qstate_t


def make_quant(quant_cfg, mtypes, qstate_t):
    """quant_forward closures for every op in ``qstate_t`` (reference
    linear.py:62-67, matmul.py:140-145, conv quant_weight_bias
    conv.py:565-575)."""
    def q_apply(name):
        pol = quant_cfg.op_policy(mtypes[name])
        wq, aq = 2 ** (pol.w_bit - 1), 2 ** (pol.a_bit - 1)
        st = qstate_t[name]

        def apply(kind, *ops_):
            if kind == "conv":
                xp, w = ops_
                wi = torch.from_numpy(st["w_int"]).reshape(-1, 1, 1, 1)
                w_sim = (w / wi).round().clamp(-wq, wq - 1) * wi
                return (xp, w_sim)       # a_bit=32: input raw
            if kind == "matmul":
                A, Bm = ops_
                Aq = 2 ** (pol.a_bit - 1)
                Bq = 2 ** (pol.b_bit - 1)
                B_int = torch.from_numpy(st["B_int"]).reshape(1, -1, 1, 1)
                B_sim = (Bm / B_int).round().clamp(-Bq, Bq - 1) * B_int
                if st["sos"]:
                    sp = torch.tensor(float(st["a_state"]))
                    ai = sp / (Aq - 1)
                    hi = (A.clamp(sp, 1) * (Aq - 1)).round() \
                        .clamp(0, Aq - 1) / (Aq - 1)
                    lo = (A.clamp(0, sp) / ai).round().clamp(0, Aq - 1) * ai
                    return (hi + lo, B_sim)
                A_int = torch.from_numpy(st["a_state"]).reshape(1, -1, 1, 1)
                A_sim = (A / A_int).round().clamp(-Aq, Aq - 1) * A_int
                return (A_sim, B_sim)
            # linear
            xin, w = ops_
            n_V = st["w_int"].shape[0]
            oc, ic = w.shape
            wi = torch.from_numpy(st["w_int"])
            w_sim = ((w.view(n_V, oc // n_V, 1, ic) / wi)
                     .round().clamp(-wq, wq - 1) * wi).view(oc, ic)
            ai = torch.from_numpy(st["a_int"]).reshape(-1)[0]
            if st["postgelu"]:
                neg = torch.tensor(
                    0.16997124254703522 / aq, dtype=torch.float32)
                x_sim = (xin / ai).round().clamp(0, aq - 1) * ai \
                    + (xin / neg).round().clamp(-aq, 0) * neg
            else:
                x_sim = (xin / ai).round().clamp(-aq, aq - 1) * ai
            return (x_sim, w_sim)

        return apply

    return {name: q_apply(name) for name in qstate_t}


def torch_reference_pipeline(params, x, cfg, quant_cfg, op_inventory,
                             forward=None):
    """The reference pipeline in torch: probe target -> capture (fwd+bwd)
    -> per-op calibration_step2 (via the oracle search fns) -> qstate of
    torch intervals + the quant_forward logits."""
    forward = forward or torch_forward
    # probe target from the torch raw logits (quant_calib.py:309-313 +
    # the explicit probe, calib/capture.py docs)
    with torch.no_grad():
        raw_logits = forward(params, x, cfg).numpy()
    u = np.asarray(jax.random.normal(jax.random.PRNGKey(SEED),
                                     raw_logits.shape))
    target = torch.softmax(torch.from_numpy(raw_logits + SIGMA * u), -1)

    taps = {}
    pred = forward(params, x, cfg, taps=taps)
    loss = F.kl_div(F.log_softmax(pred, -1), target, reduction="batchmean")
    loss.backward()

    qstate_t = calibrate_taps(taps, op_inventory, quant_cfg, params)
    quant = make_quant(quant_cfg, dict(op_inventory), qstate_t)
    with torch.no_grad():
        q_logits = forward(params, x, cfg, quant=quant).numpy()
    return qstate_t, q_logits


def torch_sequential_pipeline(params, x, cfg, quant_cfg, op_inventory,
                              forward=None):
    """The reference's sequential=True paradigm (quant_calib.py:369): each
    op captured/calibrated with all PRECEDING ops already in quant_forward
    mode; the probe target computed once from the raw net."""
    forward = forward or torch_forward
    mtypes = dict(op_inventory)
    with torch.no_grad():
        raw_logits = forward(params, x, cfg).numpy()
    u = np.asarray(jax.random.normal(jax.random.PRNGKey(SEED),
                                     raw_logits.shape))
    target = torch.softmax(torch.from_numpy(raw_logits + SIGMA * u), -1)

    # steps follow the reference's MODULE-WALK order, not dataflow order:
    # named_modules yields qkv, proj, THEN matmul1/matmul2 (the patched
    # MatMuls are setattr-ed after the attention's native children,
    # utils/models.py:81-86).  Load-bearing: once proj is quantized its
    # round() zeroes the matmuls' probe grads (differential golden
    # ref_tinyvit_..._hessian_sequential pins this).  Re-derived here so
    # the oracle stays independent of the repo's net_wrap helper.
    _rank = {"qkv": 0, "proj": 1, "matmul1": 2, "matmul2": 3}
    first, keys = {}, []
    for i, (n, _) in enumerate(op_inventory):
        scope, _sep, leaf = n.rpartition(".")
        if scope.endswith("attn") and leaf in _rank:
            keys.append((first.setdefault(scope, i), _rank[leaf]))
        else:
            keys.append((i, -1))
    walk_order = [p for _, p in sorted(zip(keys, op_inventory),
                                       key=lambda t: t[0])]

    qstate_t = {}
    for name, mtype in walk_order:
        quant = make_quant(quant_cfg, mtypes, qstate_t)  # prefix only
        taps = {}
        pred = forward(params, x, cfg, taps=taps, quant=quant)
        loss = F.kl_div(F.log_softmax(pred, -1), target,
                        reduction="batchmean")
        loss.backward()
        qstate_t.update(calibrate_taps(taps, [(name, mtype)], quant_cfg,
                                       params))
    quant = make_quant(quant_cfg, mtypes, qstate_t)
    with torch.no_grad():
        q_logits = forward(params, x, cfg, quant=quant).numpy()
    return qstate_t, q_logits


def _find_bias(params, name):
    node = params
    for part in name.split("."):
        node = node[int(part)] if isinstance(node, list) else node[part]
    return None if node.get("bias") is None else np.asarray(node["bias"])


def assert_qstate_parity(net, qstate, qstate_t):
    """Per-op interval parity across the WHOLE net (policy resolution +
    capture wiring + search, all at once)."""
    for name, mtype in net.op_inventory:
        qp = qstate[name]
        st = qstate_t[name]
        if mtype == "qconv":
            np.testing.assert_allclose(
                np.asarray(qp.w_interval).reshape(-1),
                st["w_int"].reshape(-1), rtol=1e-5, err_msg=name)
            assert qp.a_interval is None
        elif "qmatmul" in mtype:
            if st["sos"]:
                np.testing.assert_allclose(float(qp.split),
                                           float(st["a_state"]), rtol=1e-6,
                                           err_msg=name)
            else:
                np.testing.assert_allclose(
                    np.asarray(qp.A_interval).reshape(-1),
                    st["a_state"].reshape(-1), rtol=1e-5, err_msg=name)
            np.testing.assert_allclose(
                np.asarray(qp.B_interval).reshape(-1),
                st["B_int"].reshape(-1), rtol=1e-5, err_msg=name)
        else:
            np.testing.assert_allclose(np.asarray(qp.w_interval),
                                       st["w_int"], rtol=1e-5, err_msg=name)
            np.testing.assert_allclose(np.asarray(qp.a_interval),
                                       st["a_int"], rtol=1e-5, err_msg=name)


def test_full_pipeline_parity(rng):
    net = tiny_net()
    cfg = small_cfg(ptq4vit())
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)

    calib = HessianQuantCalibrator(net, cfg, x, batch_size=4,
                                   probe_seed=SEED, probe_sigma=SIGMA)
    qstate = calib.batching_quant_calib(verbose=False)

    params_np = jax.tree.map(np.asarray, net.params)
    qstate_t, q_logits_ref = torch_reference_pipeline(
        params_np, x, CFG, small_cfg(ptq4vit()), net.op_inventory)

    assert_qstate_parity(net, qstate, qstate_t)

    # final quantized logits vs the torch reference quant_forward
    q_logits = np.asarray(net.apply(jnp.asarray(x), qstate=qstate))
    np.testing.assert_allclose(q_logits, q_logits_ref, rtol=1e-4, atol=5e-4)

    # and the int8 engine realizes the same semantics end-to-end
    q_int8 = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    np.testing.assert_allclose(q_int8, q_logits_ref, rtol=1e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# Swin whole-pipeline oracle — the reference's subtlest calibration path:
# per-module hook capture concatenates window-batched matmul caches
# (quant_calib.py:350) through the patched window_attention_forward with
# PRE-scaled q, relative-position bias and shift masks (utils/models.py:28-56
# in hahnyuan/PTQ4ViT), feeding head-wise searches; PatchMerging's reduction
# linear is calibrated too (net_wrap.py:42).
# ---------------------------------------------------------------------------

def _rpi_t(ws: int):
    """timm relative-position index, implemented independently in torch."""
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                        indexing="ij"))
    flat = coords.flatten(1)                               # 2, ws*ws
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                     # ws^2, ws^2


def _swin_mask_t(res: int, ws: int, shift: int):
    """timm shifted-window attention mask (0 / -100), independent impl."""
    if shift == 0:
        return None
    img = torch.zeros(res, res)
    cnt = 0
    sls = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for hs in sls:
        for wsl in sls:
            img[hs, wsl] = cnt
            cnt += 1
    mw = img.view(res // ws, ws, res // ws, ws).permute(0, 2, 1, 3) \
        .reshape(-1, ws * ws)
    mask = mw[:, None, :] - mw[:, :, None]
    return torch.where(mask != 0, torch.tensor(-100.0), torch.tensor(0.0))


def torch_swin_forward(params, x, cfg, taps=None, quant=None):
    """Torch mirror of models/swin.forward (reference patched
    window_attention_forward semantics: q scaled BEFORE matmul1)."""
    xt = t(x)
    if taps is not None:
        xt.requires_grad_(True)
    B = xt.shape[0]
    ps = cfg.patch_size

    def op(name, kind, fn, *operands):
        if quant is not None and name in quant:
            operands = quant[name](kind, *operands)
        out = fn(*operands)
        if taps is not None:
            out.retain_grad()
            taps[name] = {"in": operands, "out": out, "kind": kind}
        return out

    pe = params["patch_embed"]
    pw, pb = t(pe["proj"]["weight"]), t(pe["proj"]["bias"])
    nh = cfg.img_size // ps
    d0 = cfg.embed_dim
    xp = xt.reshape(B, 3, nh, ps, nh, ps).permute(0, 2, 4, 1, 3, 5) \
        .reshape(B, nh * nh, 3 * ps * ps)
    h = op("patch_embed.proj", "conv",
           lambda xq, wq: xq @ wq.reshape(d0, -1).T + pb, xp, pw)
    h = F.layer_norm(h, (d0,), t(pe["norm"]["weight"]), t(pe["norm"]["bias"]),
                     cfg.ln_eps)

    for i, layer in enumerate(params["layers"]):
        res = cfg.layer_resolution(i)
        d = cfg.layer_dim(i)
        heads = cfg.num_heads[i]
        hd = d // heads
        for j, blk in enumerate(layer["blocks"]):
            ws, shift = cfg.block_geometry(i, j)
            N = ws * ws
            p = f"layers.{i}.blocks.{j}"
            shortcut = h
            y = F.layer_norm(h, (d,), t(blk["norm1"]["weight"]),
                             t(blk["norm1"]["bias"]), cfg.ln_eps)
            y = y.reshape(B, res, res, d)
            if shift:
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            yw = y.view(B, res // ws, ws, res // ws, ws, d) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, N, d)
            qkv = op(f"{p}.attn.qkv", "linear",
                     lambda xq, wq: F.linear(
                         xq, wq, t(blk["attn"]["qkv"]["bias"])),
                     yw, t(blk["attn"]["qkv"]["weight"]))
            B_ = qkv.shape[0]
            qkv_ = qkv.reshape(B_, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
            q, k, v = qkv_[0] * (hd ** -0.5), qkv_[1], qkv_[2]
            attn = op(f"{p}.attn.matmul1", "matmul",
                      lambda a, b: a @ b, q, k.transpose(-2, -1))
            bias = t(blk["attn"]["relative_position_bias_table"]) \
                [_rpi_t(ws).view(-1)].view(N, N, heads).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            mask = _swin_mask_t(res, ws, shift)
            if mask is not None:
                nW = mask.shape[0]
                attn = attn.view(B_ // nW, nW, heads, N, N) \
                    + mask.unsqueeze(0).unsqueeze(2)
                attn = attn.reshape(B_, heads, N, N)
            attn = attn.softmax(-1)
            sv = op(f"{p}.attn.matmul2", "matmul", lambda a, b: a @ b,
                    attn, v)
            yw = sv.transpose(1, 2).reshape(B_, N, d)
            yw = op(f"{p}.attn.proj", "linear",
                    lambda xq, wq: F.linear(
                        xq, wq, t(blk["attn"]["proj"]["bias"])),
                    yw, t(blk["attn"]["proj"]["weight"]))
            y = yw.view(B, res // ws, res // ws, ws, ws, d) \
                .permute(0, 1, 3, 2, 4, 5).reshape(B, res, res, d)
            if shift:
                y = torch.roll(y, (shift, shift), dims=(1, 2))
            h = shortcut + y.reshape(B, res * res, d)
            y = F.layer_norm(h, (d,), t(blk["norm2"]["weight"]),
                             t(blk["norm2"]["bias"]), cfg.ln_eps)
            y = op(f"{p}.mlp.fc1", "linear",
                   lambda xq, wq: F.linear(xq, wq, t(blk["mlp"]["fc1"]["bias"])),
                   y, t(blk["mlp"]["fc1"]["weight"]))
            y = F.gelu(y)
            y = op(f"{p}.mlp.fc2", "linear",
                   lambda xq, wq: F.linear(xq, wq, t(blk["mlp"]["fc2"]["bias"])),
                   y, t(blk["mlp"]["fc2"]["weight"]))
            h = h + y
        if "downsample" in layer:
            ds = layer["downsample"]
            y = h.view(B, res, res, d)
            y = torch.cat([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                           y[:, 0::2, 1::2], y[:, 1::2, 1::2]], -1)
            y = y.reshape(B, (res // 2) ** 2, 4 * d)
            y = F.layer_norm(y, (4 * d,), t(ds["norm"]["weight"]),
                             t(ds["norm"]["bias"]), cfg.ln_eps)
            h = op(f"layers.{i}.downsample.reduction", "linear",
                   lambda xq, wq: F.linear(xq, wq, None),
                   y, t(ds["reduction"]["weight"]))

    dlast = cfg.layer_dim(cfg.num_layers - 1)
    h = F.layer_norm(h, (dlast,), t(params["norm"]["weight"]),
                     t(params["norm"]["bias"]), cfg.ln_eps)
    h = h.mean(1)
    return op("head", "linear",
              lambda xq, wq: F.linear(xq, wq, t(params["head"]["bias"])),
              h, t(params["head"]["weight"]))


def tiny_swin_net(seed=1):
    from ptq4vit_tpu.models.registry import DataConfig, Net
    from ptq4vit_tpu.models import swin as swin_mod
    cfg = swin_mod.SwinConfig(name="test_swin", img_size=32, patch_size=2,
                              embed_dim=12, depths=(2, 2), num_heads=(2, 4),
                              window_size=4, num_classes=7)
    params = swin_mod.init_params(jax.random.PRNGKey(seed), cfg)
    return Net(name=cfg.name, cfg=cfg, params=params,
               forward=swin_mod.forward,
               op_inventory=swin_mod.op_inventory(cfg),
               op_shapes=swin_mod.op_shapes(cfg),
               data_config=DataConfig(32, 1.0, (0.5,) * 3, (0.5,) * 3))


def _run_swin_parity(net, cfg_factory, sequential=False):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    calib = HessianQuantCalibrator(net, cfg_factory(), x, batch_size=4,
                                   probe_seed=SEED, probe_sigma=SIGMA,
                                   sequential=sequential)
    qstate = calib.batching_quant_calib(verbose=False)

    params_np = jax.tree.map(np.asarray, net.params)
    pipeline = (torch_sequential_pipeline if sequential
                else torch_reference_pipeline)
    qstate_t, q_logits_ref = pipeline(params_np, x, net.cfg, cfg_factory(),
                                      net.op_inventory,
                                      forward=torch_swin_forward)

    assert_qstate_parity(net, qstate, qstate_t)
    # fake-quant logits match the torch reference quant_forward tightly.
    # Sequential mode feeds every op exactly-quantized prefix activations,
    # which land on x/interval rounding boundaries far more often — ulp
    # differences between frameworks then flip single quant levels, so it
    # gets level-flip tolerance (intervals above are still bit-compared).
    tol = dict(rtol=1e-3, atol=6e-3) if sequential \
        else dict(rtol=1e-4, atol=5e-4)
    q_logits = np.asarray(net.apply(jnp.asarray(x), qstate=qstate))
    np.testing.assert_allclose(q_logits, q_logits_ref, **tol)
    # the int8 engine realizes the same semantics up to single-rescale fp32
    # rounding: level flips at exact quantization boundaries (ops/int8.py
    # docstring) are interval-sized local errors amplified through Swin's
    # block depth — a wiring bug would be orders larger
    q_int8 = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    np.testing.assert_allclose(q_int8, q_logits, rtol=2e-3, atol=6e-3)


def test_swin_full_pipeline_parity():
    """Shifted+unshifted windows, rel-pos bias, pre-scaled q, reduction
    linear, window-batched cache concat — vs the torch reference oracle."""
    _run_swin_parity(tiny_swin_net(), lambda: small_cfg(ptq4vit()))


def test_swin_full_pipeline_parity_w6a6():
    """Same oracle at the reference grid's other half (W6A6,
    example/test_all.py:107-113)."""
    _run_swin_parity(tiny_swin_net(),
                     lambda: small_cfg(ptq4vit()).set_bits(6, 6))


def test_swin_full_pipeline_parity_sequential():
    """sequential=True paradigm: each op calibrated under the already-
    quantized prefix (quant_calib.py:369)."""
    _run_swin_parity(tiny_swin_net(), lambda: small_cfg(ptq4vit()),
                     sequential=True)

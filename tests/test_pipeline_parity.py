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


def torch_reference_pipeline(params, x, cfg, quant_cfg, op_inventory):
    """The reference pipeline in torch: probe target -> capture (fwd+bwd)
    -> per-op calibration_step2 (via the oracle search fns) -> qstate of
    torch intervals + a quant_forward closure."""
    # probe target from the torch raw logits (quant_calib.py:309-313 +
    # the explicit probe, calib/capture.py docs)
    with torch.no_grad():
        raw_logits = torch_forward(params, x, cfg).numpy()
    u = np.asarray(jax.random.normal(jax.random.PRNGKey(SEED),
                                     raw_logits.shape))
    target = torch.softmax(torch.from_numpy(raw_logits + SIGMA * u), -1)

    taps = {}
    pred = torch_forward(params, x, cfg, taps=taps)
    loss = F.kl_div(F.log_softmax(pred, -1), target, reduction="batchmean")
    loss.backward()

    mtypes = dict(op_inventory)
    qstate_t = {}
    for name, mtype in op_inventory:
        pol = quant_cfg.op_policy(mtype)
        rec = taps[name]
        grad = rec["out"].grad.detach().numpy()
        out = rec["out"].detach().numpy()
        if rec["kind"] == "conv":
            xp = rec["in"][0].detach().numpy()
            w = rec["in"][1].detach().numpy()
            w_int, _ = oracle_conv(w.reshape(w.shape[0], -1),
                                   _find_bias(params, name),
                                   xp, out, grad, pol, channelwise=True)
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
            bias_name = name.split(".")[-1]
            b = _find_bias(params, name)
            w_int, a_int = oracle_linear(w, b, x3, o3, g3, pol,
                                         postgelu=postgelu)
            qstate_t[name] = {"w_int": w_int, "a_int": a_int,
                              "postgelu": postgelu, "pol": pol}

    # ---- quant_forward closures (reference linear.py:62-67,
    # matmul.py:140-145, conv quant_weight_bias conv.py:565-575)
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

    quant = {name: q_apply(name) for name, _ in op_inventory}
    with torch.no_grad():
        q_logits = torch_forward(params, x, cfg, quant=quant).numpy()
    return qstate_t, q_logits


def _find_bias(params, name):
    node = params
    for part in name.split("."):
        node = node[int(part)] if isinstance(node, list) else node[part]
    return np.asarray(node["bias"])


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

    # per-op interval parity across the WHOLE net (policy resolution +
    # capture wiring + search, all at once)
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

    # final quantized logits vs the torch reference quant_forward
    q_logits = np.asarray(net.apply(jnp.asarray(x), qstate=qstate))
    np.testing.assert_allclose(q_logits, q_logits_ref, rtol=1e-4, atol=5e-4)

    # and the int8 engine realizes the same semantics end-to-end
    q_int8 = np.asarray(net.apply(jnp.asarray(x), qstate=qstate, int8=True))
    np.testing.assert_allclose(q_int8, q_logits_ref, rtol=1e-4, atol=5e-4)

"""Golden generator: run the LITERAL reference implementation
(/root/reference, hahnyuan/PTQ4ViT) on tiny hand-built torch nets and dump
the calibrated quantization state + quantized logits to tests/goldens/.

Quarantine: this script is the ONLY place reference code is *executed*; the
shipped package and the test suite never import reference modules — the
checked-in goldens are data (tests/test_reference_goldens.py reads the npz).

What runs is the real thing, not an oracle re-derivation:
  - quant_layers.{conv,linear,matmul} quant modules (all classes the two
    shipped configs instantiate),
  - utils.net_wrap.wrap_modules_in_net (the name->module-type wrap map),
  - configs.PTQ4ViT / configs.BasePTQ + the literal cfg_modifier mutations
    (example/test_all.py:53-78),
  - utils.quant_calib.HessianQuantCalibrator.batching_quant_calib
    (quant_calib.py:300-378).

CPU shims (numerics-neutral — a .cuda() is a device move, not math):
  Tensor.cuda/Module.cuda -> self, torch.cuda.empty_cache -> no-op, and a
  stub `timm` package so `utils.models` imports (its patched timm attention
  forwards are unused: the tiny nets reify matmul1/matmul2 themselves with
  the reference's own utils.models.MatMul class so net_wrap recognises them).

Probe: the reference's hessian grads come from
KL(log_softmax(pred) || raw_pred_softmax) where raw_pred_softmax is the SAME
net's output (quant_calib.py:309-313) — an analytically-zero gradient whose
only signal is hardware noise.  For a deterministic golden we patch the
quant_calib module's F.softmax so the target becomes
softmax(logits + sigma*u) with the same seeded gaussian u the repo's capture
probe uses (ptq4vit_tpu/calib/capture.py:probe_target, u =
jax.random.normal(PRNGKey(seed), logits.shape)).  Both sides then compute
gradients of the same loss at (numerically) the same point.  F.softmax is
called exactly once inside quant_calib (the target); quant_layers and the
tiny nets use the Tensor.softmax method, which the patch does not touch.

Run (CPU, from the repo root):
    JAX_PLATFORMS=cpu python scripts/make_reference_goldens.py
"""
import importlib
import json
import os
import sys
import time
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF = "/root/reference"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")

PROBE_SEED, PROBE_SIGMA = 3, 1e-2
CALIB_N, BATCH_SIZE, EVAL_N = 8, 4, 8


# ---------------------------------------------------------------------------
# CPU + timm shims, then the reference imports
# ---------------------------------------------------------------------------

def install_shims():
    torch.Tensor.cuda = lambda self, *a, **k: self
    nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    # LATENT REFERENCE BUG, shimmed to its single unambiguous intent: the
    # pearson helpers call `.contiguous_()` (linear.py:433,439,448), a
    # method that has never existed in torch — the reference's pearson
    # metric on the batching linear CRASHES as written (its published
    # results are hessian-based, so the path is dead code upstream).  The
    # following `.view(...)` requires a contiguous tensor, so the intent is
    # `.contiguous()`; the shim realizes exactly that, nothing more.
    # PARITY NOTE: the repo implements the intended pearson formula
    # (chunk-local means, calib/search.py); README.md lists the divergence.
    if not hasattr(torch.Tensor, "contiguous_"):
        torch.Tensor.contiguous_ = torch.Tensor.contiguous

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    st = types.ModuleType("timm.models.swin_transformer")
    vt.Attention = type("Attention", (), {})
    st.WindowAttention = type("WindowAttention", (), {})
    models.vision_transformer = vt
    models.swin_transformer = st
    timm.models = models
    timm.create_model = None
    sys.modules.update({"timm": timm, "timm.models": models,
                        "timm.models.vision_transformer": vt,
                        "timm.models.swin_transformer": st})
    sys.path.insert(0, REF)


install_shims()
from utils.models import MatMul              # noqa: E402  (reference class)
from utils.net_wrap import wrap_modules_in_net  # noqa: E402
import utils.quant_calib as qc               # noqa: E402


# ---------------------------------------------------------------------------
# Tiny nets with timm-compatible module names/state_dict keys, forwards
# matching the reference's patched attentions (utils/models.py:10-56)
# ---------------------------------------------------------------------------

class TinyAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.matmul1 = MatMul()
        self.matmul2 = MatMul()

    def forward(self, x):  # reference attention_forward (models.py:10-26)
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = self.matmul1(q, k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = self.matmul2(attn, v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TinyMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TinyBlock(nn.Module):
    def __init__(self, dim, heads, ln_eps):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=ln_eps)
        self.attn = TinyAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = TinyMlp(dim, int(dim * 4.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TinyViT(nn.Module):
    """timm-VisionTransformer-shaped tiny net (state_dict keys ingest via
    ptq4vit_tpu.utils.timm_port.vit_params_from_state_dict)."""

    CFG = dict(img_size=32, patch_size=8, embed_dim=24, depth=2,
               num_heads=3, num_classes=10, mlp_ratio=4.0, ln_eps=1e-6)

    def __init__(self):
        super().__init__()
        c = self.CFG
        d = c["embed_dim"]
        n = (c["img_size"] // c["patch_size"]) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, c["patch_size"],
                                          c["patch_size"])
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, d))
        self.blocks = nn.ModuleList(
            [TinyBlock(d, c["num_heads"], c["ln_eps"])
             for _ in range(c["depth"])])
        self.norm = nn.LayerNorm(d, eps=c["ln_eps"])
        self.head = nn.Linear(d, c["num_classes"])

    def forward(self, x):
        B = x.shape[0]
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(B, -1, -1), h], 1) \
            + self.pos_embed
        for blk in self.blocks:
            h = blk(h)
        return self.head(self.norm(h)[:, 0])


class TinyDeiT(nn.Module):
    """timm-DeiT-distilled-shaped tiny net (dist_token + head_dist; eval
    output is the mean of the two heads, as timm's
    DistilledVisionTransformer.forward does at inference).  The REFERENCE
    CRASHES on this family: its module-type map has no 'head_dist' entry
    (utils/net_wrap.py:42 KeyError), so the golden for this cell records
    the crash and pins ingestion/architecture parity only."""

    CFG = dict(img_size=32, patch_size=8, embed_dim=24, depth=2,
               num_heads=3, num_classes=10, mlp_ratio=4.0, ln_eps=1e-6,
               distilled=True)

    def __init__(self):
        super().__init__()
        c = self.CFG
        d = c["embed_dim"]
        n = (c["img_size"] // c["patch_size"]) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, c["patch_size"],
                                          c["patch_size"])
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.dist_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 2, d))
        self.blocks = nn.ModuleList(
            [TinyBlock(d, c["num_heads"], c["ln_eps"])
             for _ in range(c["depth"])])
        self.norm = nn.LayerNorm(d, eps=c["ln_eps"])
        self.head = nn.Linear(d, c["num_classes"])
        self.head_dist = nn.Linear(d, c["num_classes"])

    def forward(self, x):
        B = x.shape[0]
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        h = torch.cat([self.cls_token.expand(B, -1, -1),
                       self.dist_token.expand(B, -1, -1), h], 1) \
            + self.pos_embed
        for blk in self.blocks:
            h = blk(h)
        h = self.norm(h)
        return (self.head(h[:, 0]) + self.head_dist(h[:, 1])) / 2


def _rpi(ws):
    coords = torch.stack(torch.meshgrid(torch.arange(ws), torch.arange(ws),
                                        indexing="ij"))
    flat = coords.flatten(1)
    rel = (flat[:, :, None] - flat[:, None, :]).permute(1, 2, 0).contiguous()
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _swin_mask(res, ws, shift):
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


class TinyWindowAttention(nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.ws = ws
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.matmul1 = MatMul()
        self.matmul2 = MatMul()
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        self.register_buffer("relative_position_index", _rpi(ws))

    def forward(self, x, mask=None):
        # reference window_attention_forward (models.py:28-56): q PRE-scaled
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q = q * self.scale
        attn = self.matmul1(q, k.transpose(-2, -1))
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, -1)
        attn = attn + bias.permute(2, 0, 1).contiguous().unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) \
                + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = self.matmul2(attn, v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class TinySwinBlock(nn.Module):
    def __init__(self, dim, heads, res, ws, shift, ln_eps):
        super().__init__()
        self.res, self.ws, self.shift = res, ws, shift
        self.norm1 = nn.LayerNorm(dim, eps=ln_eps)
        self.attn = TinyWindowAttention(dim, heads, ws)
        self.norm2 = nn.LayerNorm(dim, eps=ln_eps)
        self.mlp = TinyMlp(dim, int(dim * 4.0))
        if shift:
            self.register_buffer("attn_mask", _swin_mask(res, ws, shift))
        else:
            self.attn_mask = None

    def forward(self, x):
        B, L, d = x.shape
        res, ws = self.res, self.ws
        shortcut = x
        y = self.norm1(x).view(B, res, res, d)
        if self.shift:
            y = torch.roll(y, (-self.shift, -self.shift), dims=(1, 2))
        yw = y.view(B, res // ws, ws, res // ws, ws, d) \
            .permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, d)
        yw = self.attn(yw, mask=self.attn_mask)
        y = yw.view(B, res // ws, res // ws, ws, ws, d) \
            .permute(0, 1, 3, 2, 4, 5).reshape(B, res, res, d)
        if self.shift:
            y = torch.roll(y, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + y.reshape(B, L, d)
        return x + self.mlp(self.norm2(x))


class TinyPatchMerging(nn.Module):
    def __init__(self, dim, res, ln_eps):
        super().__init__()
        self.res = res
        self.norm = nn.LayerNorm(4 * dim, eps=ln_eps)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        B, L, d = x.shape
        res = self.res
        y = x.view(B, res, res, d)
        y = torch.cat([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                       y[:, 0::2, 1::2], y[:, 1::2, 1::2]], -1)
        return self.reduction(self.norm(y.reshape(B, (res // 2) ** 2,
                                                  4 * d)))


class TinySwin(nn.Module):
    """timm-SwinTransformer-shaped tiny net (keys ingest via
    swin_params_from_state_dict; geometry matches the repo's SwinConfig
    block_geometry: shift on odd blocks, collapse when res <= ws)."""

    CFG = dict(img_size=32, patch_size=2, embed_dim=12, depths=(2, 2),
               num_heads=(2, 4), window_size=4, num_classes=7,
               mlp_ratio=4.0, ln_eps=1e-5)

    def __init__(self):
        super().__init__()
        c = self.CFG
        d0, ps = c["embed_dim"], c["patch_size"]
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d0, ps, ps)
        self.patch_embed.norm = nn.LayerNorm(d0, eps=c["ln_eps"])
        self.layers = nn.ModuleList()
        for i, depth in enumerate(c["depths"]):
            dim = d0 * (2 ** i)
            res = c["img_size"] // ps // (2 ** i)
            layer = nn.Module()
            blocks = []
            for j in range(depth):
                ws = c["window_size"]
                shift = 0 if j % 2 == 0 else ws // 2
                if res <= ws:
                    ws, shift = res, 0
                blocks.append(TinySwinBlock(dim, c["num_heads"][i], res, ws,
                                            shift, c["ln_eps"]))
            layer.blocks = nn.ModuleList(blocks)
            if i < len(c["depths"]) - 1:
                layer.downsample = TinyPatchMerging(dim, res, c["ln_eps"])
            self.layers.append(layer)
        dl = d0 * (2 ** (len(c["depths"]) - 1))
        self.norm = nn.LayerNorm(dl, eps=c["ln_eps"])
        self.head = nn.Linear(dl, c["num_classes"])

    def forward(self, x):
        h = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        h = self.patch_embed.norm(h)
        for layer in self.layers:
            for blk in layer.blocks:
                h = blk(h)
            if hasattr(layer, "downsample"):
                h = layer.downsample(h)
        return self.head(self.norm(h).mean(1))


class TinySwin3(TinySwin):
    """TinySwin with ODD head counts (3, 6): exercises the fused Pallas
    scorers' head-padding path (heads not a lane multiple) plus the shifted
    window masks, on top of the geometry the base TinySwin already covers."""

    CFG = dict(img_size=32, patch_size=2, embed_dim=12, depths=(2, 2),
               num_heads=(3, 6), window_size=4, num_classes=7,
               mlp_ratio=4.0, ln_eps=1e-5)


# ---------------------------------------------------------------------------
# the literal reference pipeline on one (net, config, bits, metric) cell
# ---------------------------------------------------------------------------

class OneBatchLoader:
    """The reference calib_loader contract: iterable of (inp, target)
    serving the whole calib set as ONE batch (datasets.py:88-94), with a
    .batch_size attribute quant_calib micro-batches against."""

    def __init__(self, x):
        self.items = [(torch.from_numpy(x), torch.zeros(len(x)))]
        self.batch_size = len(x)

    def __iter__(self):
        return iter(self.items)


def apply_cfg_modifier(cfg, bit_setting, metric, linear_ptq_setting=(1, 1, 1),
                       no_softmax=None, no_postgelu=None,
                       matmul_blocks=None, conv_metric=None,
                       linear_metric=None):
    """The literal cfg_modifier mutations (example/test_all.py:53-78 for the
    grid knobs; example/test_ablation.py:42-82 adds linear_ptq_setting and
    the no_softmax/no_postgelu class switches — cfg here IS the imported
    reference config module, so setting cfg.no_softmax mutates the module
    global that configs.PTQ4ViT.get_module branches on (PTQ4ViT.py:62,76)).

    matmul_blocks injects blocked-operand kwargs (n_V_A/n_H_A/n_V_B/n_H_B)
    into ptqsl_matmul_kwargs; the batching matmul classes accept them
    (matmul.py:390-394) while n_G_* stays forced head-wise
    (matmul.py:411-417)."""
    cfg.bit = bit_setting
    cfg.w_bit = {name: bit_setting[0] for name in cfg.conv_fc_name_list}
    cfg.a_bit = {name: bit_setting[1] for name in cfg.conv_fc_name_list}
    cfg.A_bit = {name: bit_setting[1] for name in cfg.matmul_name_list}
    cfg.B_bit = {name: bit_setting[1] for name in cfg.matmul_name_list}
    cfg.ptqsl_conv2d_kwargs["n_V"] = linear_ptq_setting[0]
    cfg.ptqsl_conv2d_kwargs["n_H"] = linear_ptq_setting[1]
    cfg.ptqsl_conv2d_kwargs["metric"] = metric
    cfg.ptqsl_conv2d_kwargs["init_layerwise"] = False
    cfg.ptqsl_linear_kwargs["n_V"] = linear_ptq_setting[0]
    cfg.ptqsl_linear_kwargs["n_H"] = linear_ptq_setting[1]
    cfg.ptqsl_linear_kwargs["n_a"] = linear_ptq_setting[2]
    cfg.ptqsl_linear_kwargs["metric"] = metric
    cfg.ptqsl_linear_kwargs["init_layerwise"] = False
    cfg.ptqsl_matmul_kwargs["metric"] = metric
    cfg.ptqsl_matmul_kwargs["init_layerwise"] = False
    if matmul_blocks:
        cfg.ptqsl_matmul_kwargs.update(matmul_blocks)
    if conv_metric is not None:
        # ChannelwiseBatchingQuantConv2d implements cosine/L1/L2/weighted/
        # hessian but NOT pearson (conv.py:498-523 raises) - the reference
        # itself would crash if cfg_modifier set pearson on conv, so the
        # pearson cell pins matmul pearson with conv on hessian
        cfg.ptqsl_conv2d_kwargs["metric"] = conv_metric
    if linear_metric is not None:
        # the reference's pearson-LINEAR path is dead code with TWO literal
        # bugs: `.contiguous_()` (linear.py:433,439,448 - method never
        # existed in torch) and `transpose(-1,-3).view(...)` on a
        # non-contiguous tensor (linear.py:434 RuntimeError even with the
        # first bug shimmed).  It cannot run as written, so the pearson
        # golden pins the METRIC differentially on the matmul surface only;
        # the repo's pearson-linear implements the documented intent and is
        # pinned by the independent torch oracles (test_search_parity).
        cfg.ptqsl_linear_kwargs["metric"] = linear_metric
    # None = leave the config module's own default untouched (these are
    # module GLOBALS that get_module branches on; BasePTQ has no such
    # branches and PTQ4ViT defaults both False, PTQ4ViT.py:5-6)
    if no_softmax is not None:
        cfg.no_softmax = no_softmax
    if no_postgelu is not None:
        cfg.no_postgelu = no_postgelu
    return cfg


DUMP_ATTRS = ("w_interval", "a_interval", "a_neg_interval", "A_interval",
              "B_interval", "split", "n_V", "n_H", "n_a",
              "n_G_A", "n_G_B", "n_V_A", "n_V_B", "n_H_A", "n_H_B")


def probe_u(shape):
    import jax
    return np.asarray(jax.random.normal(jax.random.PRNGKey(PROBE_SEED),
                                        shape, dtype="float32"))


def run_cell(make_net, kind, config_name, bit_setting, metric, *, tag="",
             sequential=False, linear_ptq_setting=(1, 1, 1),
             no_softmax=None, no_postgelu=None, matmul_blocks=None,
             conv_metric=None, linear_metric=None):
    torch.manual_seed(0)
    net = make_net()
    for p in net.parameters():
        p.data = p.data.float() * 1.0
    # non-degenerate params: default inits leave cls/pos/bias at zero
    gen = torch.Generator().manual_seed(17)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
    net.eval()
    sd = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}

    img = net.CFG["img_size"]
    rng = np.random.default_rng(7)
    calib_x = rng.standard_normal((CALIB_N, 3, img, img)).astype(np.float32)
    eval_x = rng.standard_normal((EVAL_N, 3, img, img)).astype(np.float32)

    with torch.no_grad():
        raw_logits = net(torch.from_numpy(calib_x)).numpy()
        raw_logits_eval = net(torch.from_numpy(eval_x)).numpy()

    cfg = importlib.reload(importlib.import_module(f"configs.{config_name}"))
    apply_cfg_modifier(cfg, bit_setting, metric,
                       linear_ptq_setting=linear_ptq_setting,
                       no_softmax=no_softmax, no_postgelu=no_postgelu,
                       matmul_blocks=matmul_blocks, conv_metric=conv_metric,
                       linear_metric=linear_metric)
    wrapped = wrap_modules_in_net(net, cfg)

    # Snapshot each module's raw_input/raw_out/raw_grad right before its
    # calibration_step2 consumes (and then deletes) them: the test's f64
    # tie-gap oracle re-scores fp-degenerate argmax flips from these.
    raw_snaps = {}

    def _wrap_step2(name, m):
        orig = m.calibration_step2

        def step2(*a, **kw):
            snap = {}
            ri = getattr(m, "raw_input", None)
            if isinstance(ri, (list, tuple)):           # matmul: (A, B)
                snap["A"] = ri[0].detach().cpu().numpy().copy()
                snap["B"] = ri[1].detach().cpu().numpy().copy()
            elif ri is not None:
                snap["x"] = ri.detach().cpu().numpy().copy()
            ro = getattr(m, "raw_out", None)
            if ro is not None:
                snap["out"] = ro.detach().cpu().numpy().copy()
            rg = getattr(m, "raw_grad", None)
            if rg is not None and isinstance(rg, torch.Tensor):
                snap["grad"] = rg.detach().cpu().numpy().copy()
            raw_snaps[name] = snap
            return orig(*a, **kw)

        m.calibration_step2 = step2

    for _name, _m in wrapped.items():
        _wrap_step2(_name, _m)

    u = probe_u((CALIB_N, raw_logits.shape[-1]))
    orig_softmax = qc.F.softmax

    def perturbed_softmax(x, dim=-1, **kw):
        return orig_softmax(
            x + PROBE_SIGMA * torch.from_numpy(u).to(x.dtype), dim=dim, **kw)

    qc.F.softmax = perturbed_softmax
    try:
        calib = qc.HessianQuantCalibrator(
            net, wrapped, OneBatchLoader(calib_x), sequential=sequential,
            batch_size=BATCH_SIZE)
        t0 = time.time()
        calib.batching_quant_calib()
        dt = time.time() - t0
    finally:
        qc.F.softmax = orig_softmax

    with torch.no_grad():
        q_logits = net(torch.from_numpy(calib_x)).numpy()
        q_logits_eval = net(torch.from_numpy(eval_x)).numpy()

    arrays = {"calib_x": calib_x, "eval_x": eval_x,
              "raw_logits": raw_logits, "raw_logits_eval": raw_logits_eval,
              "quant_logits": q_logits, "quant_logits_eval": q_logits_eval}
    for k, v in sd.items():
        arrays[f"sd::{k}"] = v
    for name, snap in raw_snaps.items():
        for attr, v in snap.items():
            arrays[f"raw::{name}::{attr}"] = v
    mod_meta = {}
    for name, m in wrapped.items():
        mod_meta[name] = {"class": type(m).__name__}
        for attr in DUMP_ATTRS:
            v = getattr(m, attr, None)
            if v is None:
                continue
            if isinstance(v, torch.Tensor):
                arrays[f"mod::{name}::{attr}"] = v.detach().numpy()
            else:
                mod_meta[name][attr] = v

    meta = {
        "kind": kind, "cfg": dict(make_net.CFG), "config": config_name,
        "bit_setting": list(bit_setting), "metric": metric,
        "tag": tag, "sequential": sequential,
        "linear_ptq_setting": list(linear_ptq_setting),
        "no_softmax": bool(no_softmax), "no_postgelu": bool(no_postgelu),
        "matmul_blocks": matmul_blocks, "conv_metric": conv_metric,
        "linear_metric": linear_metric,
        "probe_seed": PROBE_SEED, "probe_sigma": PROBE_SIGMA,
        "calib_n": CALIB_N, "batch_size": BATCH_SIZE,
        "torch_version": torch.__version__,
        "calib_seconds": round(dt, 2),
        "ref_kwargs": {
            "conv": dict(cfg.ptqsl_conv2d_kwargs),
            "linear": dict(cfg.ptqsl_linear_kwargs),
            "matmul": dict(cfg.ptqsl_matmul_kwargs)},
        "w_bit": dict(cfg.w_bit), "a_bit": dict(cfg.a_bit),
        "A_bit": dict(cfg.A_bit), "B_bit": dict(cfg.B_bit),
        "modules": mod_meta,
    }
    arrays["__meta__"] = np.array(json.dumps(meta))

    os.makedirs(OUT_DIR, exist_ok=True)
    bits = f"w{bit_setting[0]}a{bit_setting[1]}"
    stem = f"ref_{kind}_{config_name}_{bits}_{metric}"
    if tag:
        stem += f"_{tag}"
    path = os.path.join(OUT_DIR, f"{stem}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({dt:.1f}s, {len(wrapped)} modules)")


def run_distilled_ingestion_cell():
    """Distilled-DeiT golden: the reference CANNOT calibrate this family —
    wrap_modules_in_net KeyErrors on 'head_dist' (net_wrap.py:42's
    module_types map) — so the golden records the literal crash plus the
    raw torch state_dict/logits; the test pins (a) that divergence and
    (b) ingestion/architecture parity, and calibrates repo-side only."""
    torch.manual_seed(0)
    net = TinyDeiT()
    gen = torch.Generator().manual_seed(17)
    with torch.no_grad():
        for p in net.parameters():
            p.add_(0.05 * torch.randn(p.shape, generator=gen))
    net.eval()
    sd = {k: v.detach().numpy().copy() for k, v in net.state_dict().items()}
    img = net.CFG["img_size"]
    rng = np.random.default_rng(7)
    calib_x = rng.standard_normal((CALIB_N, 3, img, img)).astype(np.float32)
    eval_x = rng.standard_normal((EVAL_N, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        raw_logits = net(torch.from_numpy(calib_x)).numpy()
        raw_logits_eval = net(torch.from_numpy(eval_x)).numpy()

    cfg = importlib.reload(importlib.import_module("configs.PTQ4ViT"))
    apply_cfg_modifier(cfg, (8, 8), "hessian")
    try:
        wrap_modules_in_net(net, cfg)
        crash = None
    except Exception as e:          # the documented reference behavior
        crash = f"{type(e).__name__}: {e}"

    arrays = {"calib_x": calib_x, "eval_x": eval_x,
              "raw_logits": raw_logits, "raw_logits_eval": raw_logits_eval}
    for k, v in sd.items():
        arrays[f"sd::{k}"] = v
    meta = {"kind": "tinydeit", "cfg": dict(TinyDeiT.CFG),
            "config": "PTQ4ViT", "bit_setting": [8, 8], "metric": "hessian",
            "probe_seed": PROBE_SEED, "probe_sigma": PROBE_SIGMA,
            "calib_n": CALIB_N, "batch_size": BATCH_SIZE,
            "torch_version": torch.__version__,
            "reference_crash": crash}
    arrays["__meta__"] = np.array(json.dumps(meta))
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "ref_tinydeit_ingest.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} (reference crash: {crash})")


def main():
    only = set(sys.argv[1:])        # optional: regenerate named cells only

    def want(stem):
        return not only or any(o in stem for o in only)

    vit_cells = [(c, b, m) for c in ("PTQ4ViT", "BasePTQ")
                 for b in ((8, 8), (6, 6)) for m in ("hessian", "cosine")]
    for config_name, bits, metric in vit_cells:
        if want(f"tinyvit_{config_name}_w{bits[0]}a{bits[1]}_{metric}"):
            run_cell(TinyViT, "tinyvit", config_name, bits, metric)
    for config_name, bits, metric in [("PTQ4ViT", (8, 8), "hessian"),
                                      ("BasePTQ", (8, 8), "cosine"),
                                      ("PTQ4ViT", (6, 6), "hessian")]:
        if want(f"tinyswin_{config_name}_w{bits[0]}a{bits[1]}_{metric}"):
            run_cell(TinySwin, "tinyswin", config_name, bits, metric)

    # --- round-5 ablation-surface cells (VERDICT r4 item 3) ---
    # remaining similarity metrics (linear.py:399-453; pearson's chunk-local
    # means, L1/L2, the weighted variants)
    for metric in ("pearson", "L1_norm", "L2_norm",
                   "linear_weighted_L2_norm", "square_weighted_L2_norm"):
        if want(f"tinyvit_PTQ4ViT_w8a8_{metric}"):
            kw = {}
            if metric == "pearson":
                kw = dict(conv_metric="hessian", linear_metric="hessian")
            run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), metric, **kw)
    # blocked linear/conv grids (linear.py:117-119: n_V x n_H x n_a > 1)
    if want("blocked222"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "hessian",
                 tag="blocked222", linear_ptq_setting=(2, 2, 2))
    # blocked matmul operands with REAL ceil-div padding: N=17 tokens over
    # n_V_A=2 row blocks pads 17->18 (matmul.py:109-138)
    if want("mmblocked"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "hessian",
                 tag="mmblocked",
                 matmul_blocks=dict(n_V_A=2, n_H_A=2, n_V_B=2, n_H_B=2))
    # ablation class switches (test_ablation.py:42-82)
    if want("nosoftmax"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "hessian",
                 tag="nosoftmax", no_softmax=True)
    if want("nopostgelu"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "hessian",
                 tag="nopostgelu", no_postgelu=True)
    # sequential mode (quant_calib.py:28-55: each op captured under the
    # already-quantized prefix)
    if want("sequential"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "hessian",
                 tag="sequential", sequential=True)
    # sequential under BasePTQ/cosine: the no-grad sequential plan path
    if want("BasePTQ_w8a8_cosine_sequential"):
        run_cell(TinyViT, "tinyvit", "BasePTQ", (8, 8), "cosine",
                 tag="sequential", sequential=True)
    # sequential on Swin: pins reference_wrap_order across patch-merging
    # reduction linears and shifted-window blocks (quant_calib.py:28-55
    # walks wrapped-module order, which on Swin interleaves reductions
    # between stages)
    if want("tinyswin_PTQ4ViT_w8a8_hessian_sequential"):
        run_cell(TinySwin, "tinyswin", "PTQ4ViT", (8, 8), "hessian",
                 tag="sequential", sequential=True)
    # sequential at 6-bit: coarser grids shift which upstream rounding
    # boundaries the branch-propagation hits
    if want("tinyvit_PTQ4ViT_w6a6_hessian_sequential"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (6, 6), "hessian",
                 tag="sequential", sequential=True)
    # ablation class switch on Swin: no_softmax swaps SoS -> plain
    # PTQSLBatchingQuantMatMul for scores@V under shifted-window geometry
    if want("tinyswin_PTQ4ViT_w8a8_hessian_nosoftmax"):
        run_cell(TinySwin, "tinyswin", "PTQ4ViT", (8, 8), "hessian",
                 tag="nosoftmax", no_softmax=True)
    # blocked linear/conv grids under a non-hessian metric (cosine reduces
    # inside the per-block similarity instead of elementwise-then-mean)
    if want("tinyvit_PTQ4ViT_w8a8_cosine_blocked222"):
        run_cell(TinyViT, "tinyvit", "PTQ4ViT", (8, 8), "cosine",
                 tag="blocked222", linear_ptq_setting=(2, 2, 2))
    # shifted-window Swin with odd head counts (fused-scorer head padding)
    if want("tinyswin3"):
        run_cell(TinySwin3, "tinyswin3", "PTQ4ViT", (8, 8), "hessian")
    # distilled DeiT: reference crashes; ingestion-parity golden
    if want("tinydeit"):
        run_distilled_ingestion_cell()


if __name__ == "__main__":
    main()

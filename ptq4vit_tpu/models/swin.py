"""Functional Swin Transformer forward with explicit quantization taps.

Architecture parity targets timm's SwinTransformer (0.4.x era) as wrapped by
the reference: window attention with relative position bias and shifted
windows, written around explicit ``matmul1``/``matmul2`` ops exactly like the
reference's patched window_attention_forward (utils/models.py:28-56 in
hahnyuan/PTQ4ViT — note q is pre-scaled BEFORE matmul1 there, unlike ViT
where the scale is applied to the matmul1 output), plus the ``reduction``
linear of PatchMerging as a quantizable op (net_wrap.py:42).

Static geometry (relative-position index, shifted-window attention masks,
window partition) is precomputed in numpy per config — compile-time constants
for XLA, no gathers at runtime beyond the bias-table lookup.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import QuantCtx, layer_norm, softmax_f32


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    name: str
    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    ln_eps: float = 1e-5
    in_chans: int = 3

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    def layer_dim(self, i: int) -> int:
        return self.embed_dim * (2 ** i)

    def layer_resolution(self, i: int) -> int:
        return self.img_size // self.patch_size // (2 ** i)

    def block_geometry(self, i: int, j: int) -> Tuple[int, int]:
        """(window_size, shift_size) of block j in layer i; shift on odd
        blocks, both collapse when the resolution fits one window."""
        res = self.layer_resolution(i)
        ws = self.window_size
        shift = 0 if j % 2 == 0 else ws // 2
        if res <= ws:
            ws, shift = res, 0
        return ws, shift


# ---------------------------------------------------------------------------
# static geometry (numpy, cached per config)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws^2, ws^2) index into the (2ws-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))           # 2, ws, ws
    flat = coords.reshape(2, -1)                            # 2, ws*ws
    rel = flat[:, :, None] - flat[:, None, :]               # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _window_partition_np(x: np.ndarray, ws: int) -> np.ndarray:
    H, W = x.shape
    return (x.reshape(H // ws, ws, W // ws, ws)
             .transpose(0, 2, 1, 3).reshape(-1, ws * ws))


@functools.lru_cache(maxsize=None)
def shifted_window_mask(res: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """(nW, ws^2, ws^2) additive attention mask (0 / -100) for shifted
    windows; None when shift == 0."""
    if shift == 0:
        return None
    img = np.zeros((res, res), np.float32)
    cnt = 0
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    for hs in slices:
        for wsl in slices:
            img[hs, wsl] = cnt
            cnt += 1
    mw = _window_partition_np(img, ws)                      # nW, ws*ws
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(xw, ws: int, H: int, W: int):
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    C = xw.shape[-1]
    B = xw.shape[0] // ((H // ws) * (W // ws))
    x = xw.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def init_params(rng: jax.Array, cfg: SwinConfig) -> Dict[str, Any]:
    """Random-init parameter pytree (timm-compatible key layout)."""
    n_keys = 8 + 8 * sum(cfg.depths) + 2 * cfg.num_layers
    keys = iter(jax.random.split(rng, n_keys))

    def lin(n_in, n_out, bias=True):
        s = (2.0 / (n_in + n_out)) ** 0.5
        p = {"weight": jax.random.normal(next(keys), (n_out, n_in),
                                         jnp.float32) * s}
        if bias:
            p["bias"] = jnp.zeros((n_out,), jnp.float32)
        return p

    def ln(d):
        return {"weight": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    params: Dict[str, Any] = {
        "patch_embed": {
            "proj": {"weight": jax.random.normal(
                next(keys), (cfg.embed_dim, cfg.in_chans, cfg.patch_size,
                             cfg.patch_size), jnp.float32) * 0.02,
                "bias": jnp.zeros((cfg.embed_dim,), jnp.float32)},
            "norm": ln(cfg.embed_dim)},
        "layers": [],
        "norm": ln(cfg.layer_dim(cfg.num_layers - 1)),
        "head": lin(cfg.layer_dim(cfg.num_layers - 1), cfg.num_classes),
    }
    for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
        d = cfg.layer_dim(i)
        hid = int(d * cfg.mlp_ratio)
        layer = {"blocks": []}
        for j in range(depth):
            ws, _ = cfg.block_geometry(i, j)
            layer["blocks"].append({
                "norm1": ln(d),
                "attn": {
                    "qkv": lin(d, 3 * d),
                    "proj": lin(d, d),
                    "relative_position_bias_table": jax.random.normal(
                        next(keys), ((2 * ws - 1) ** 2, heads),
                        jnp.float32) * 0.02},
                "norm2": ln(d),
                "mlp": {"fc1": lin(d, hid), "fc2": lin(hid, d)},
            })
        if i < cfg.num_layers - 1:
            layer["downsample"] = {"norm": ln(4 * d),
                                   "reduction": lin(4 * d, 2 * d, bias=False)}
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _window_attention(ctx: QuantCtx, prefix: str, x, attn_p, heads: int,
                      ws: int, mask: Optional[np.ndarray]):
    """Window attention over (B_, N, C) windows (reference patched
    window_attention_forward, utils/models.py:28-56)."""
    B_, N, C = x.shape
    hd = C // heads
    qkv = ctx.linear(f"{prefix}.qkv", x, attn_p["qkv"]["weight"],
                     attn_p["qkv"]["bias"])
    rpi = relative_position_index(ws).reshape(-1)
    bias = attn_p["relative_position_bias_table"][rpi]
    bias = bias.reshape(N, N, heads).transpose(2, 0, 1)
    nW = mask.shape[0] if mask is not None else 1
    y = ctx.window_attention_qkv(f"{prefix}.matmul1", f"{prefix}.matmul2",
                                 qkv, heads, nW, hd ** -0.5, bias, mask)
    if y is None:
        qkv = qkv.reshape(B_, N, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (hd ** -0.5)  # pre-scaled q (models.py:34)
        attn = ctx.matmul(f"{prefix}.matmul1", q, jnp.swapaxes(k, -2, -1))
        attn = attn + bias[None]
        if mask is not None:
            m = jnp.asarray(mask, attn.dtype)[None, :, None]  # 1,nW,1,N,N
            attn = attn.reshape(B_ // nW, nW, heads, N, N) + m
            attn = attn.reshape(B_, heads, N, N)
        attn = softmax_f32(attn, axis=-1)
        y = ctx.matmul(f"{prefix}.matmul2", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return ctx.linear(f"{prefix}.proj", y, attn_p["proj"]["weight"],
                      attn_p["proj"]["bias"])


def forward(params: Dict[str, Any], x, cfg: SwinConfig,
            qstate: Optional[Dict[str, Any]] = None,
            eps: Optional[Dict[str, Any]] = None,
            capture: bool = False,
            int8: bool = False,
            compute_dtype=None,
            packed: Optional[Dict[str, Any]] = None):
    """Swin forward.  x: (B, 3, H, W) NCHW float32."""
    if compute_dtype is not None:
        # serving mode: bf16 activations/params; matmul accumulation stays
        # fp32 (preferred_element_type) or exact int32 on the int8 path
        params = jax.tree.map(lambda a: a.astype(compute_dtype)
                              if hasattr(a, "astype") else a, params)
        x = x.astype(compute_dtype)
    ctx = QuantCtx(qstate=qstate, eps=eps, capture=capture, int8=int8,
                   packed=packed)
    B = x.shape[0]
    pe = params["patch_embed"]
    x, _ = ctx.conv2d_patch("patch_embed.proj", x, pe["proj"]["weight"],
                            pe["proj"]["bias"], cfg.patch_size)
    x = layer_norm(x, pe["norm"]["weight"], pe["norm"]["bias"], cfg.ln_eps)

    for i, layer in enumerate(params["layers"]):
        res = cfg.layer_resolution(i)
        d = cfg.layer_dim(i)
        heads = cfg.num_heads[i]
        for j, blk in enumerate(layer["blocks"]):
            ws, shift = cfg.block_geometry(i, j)
            p = f"layers.{i}.blocks.{j}"
            rpi = relative_position_index(ws).reshape(-1)
            bias = blk["attn"]["relative_position_bias_table"][rpi]
            bias = bias.reshape(ws * ws, ws * ws, heads).transpose(2, 0, 1)
            mask = shifted_window_mask(res, ws, shift)
            xb = ctx.swin_block(p, x, blk, heads, ws, shift, res, bias,
                                mask, cfg.ln_eps)
            if xb is not None:
                x = xb
                continue
            shortcut = x
            y = layer_norm(x, blk["norm1"]["weight"], blk["norm1"]["bias"],
                           cfg.ln_eps)
            y = y.reshape(B, res, res, d)
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            yw = window_partition(y, ws)
            mask = shifted_window_mask(res, ws, shift)
            yw = _window_attention(ctx, f"{p}.attn", yw, blk["attn"], heads,
                                   ws, mask)
            y = window_reverse(yw, ws, res, res)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            x = shortcut + y.reshape(B, res * res, d)
            y = layer_norm(x, blk["norm2"]["weight"], blk["norm2"]["bias"],
                           cfg.ln_eps)
            y = ctx.linear_gelu(f"{p}.mlp.fc1", y,
                                blk["mlp"]["fc1"]["weight"],
                                blk["mlp"]["fc1"]["bias"])
            y = ctx.linear(f"{p}.mlp.fc2", y, blk["mlp"]["fc2"]["weight"],
                           blk["mlp"]["fc2"]["bias"])
            x = x + y
        if "downsample" in layer:
            # PatchMerging: 2x2 neighborhood concat -> LN -> reduction linear
            ds = layer["downsample"]
            y = x.reshape(B, res, res, d)
            y = jnp.concatenate([y[:, 0::2, 0::2], y[:, 1::2, 0::2],
                                 y[:, 0::2, 1::2], y[:, 1::2, 1::2]], axis=-1)
            y = y.reshape(B, (res // 2) * (res // 2), 4 * d)
            y = layer_norm(y, ds["norm"]["weight"], ds["norm"]["bias"],
                           cfg.ln_eps)
            x = ctx.linear(f"layers.{i}.downsample.reduction", y,
                           ds["reduction"]["weight"], None)

    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"],
                   cfg.ln_eps)
    x = jnp.mean(x, axis=1)  # global average pool over tokens
    logits = ctx.linear("head", x, params["head"]["weight"],
                        params["head"]["bias"])
    if capture:
        return logits, ctx.taps
    return logits


def op_inventory(cfg: SwinConfig):
    """Ordered (name, module_type) list matching the reference's module walk
    (net_wrap.py:39-81)."""
    ops = [("patch_embed.proj", "qconv")]
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            ops += [
                (f"{p}.attn.qkv", "qlinear_qkv"),
                (f"{p}.attn.matmul1", "qmatmul_qk"),
                (f"{p}.attn.matmul2", "qmatmul_scorev"),
                (f"{p}.attn.proj", "qlinear_proj"),
                (f"{p}.mlp.fc1", "qlinear_MLP_1"),
                (f"{p}.mlp.fc2", "qlinear_MLP_2"),
            ]
        if i < cfg.num_layers - 1:
            ops.append((f"layers.{i}.downsample.reduction",
                        "qlinear_reduction"))
    ops.append(("head", "qlinear_classifier"))
    return ops


def op_shapes(cfg: SwinConfig):
    info = {"patch_embed.proj": {
        "kind": "conv",
        "in_features": cfg.in_chans * cfg.patch_size ** 2,
        "out_features": cfg.embed_dim,
        "tokens": (cfg.img_size // cfg.patch_size) ** 2}}
    for i, depth in enumerate(cfg.depths):
        res = cfg.layer_resolution(i)
        d = cfg.layer_dim(i)
        heads = cfg.num_heads[i]
        hid = int(d * cfg.mlp_ratio)
        for j in range(depth):
            ws, _ = cfg.block_geometry(i, j)
            p = f"layers.{i}.blocks.{j}"
            nwin = (res // ws) ** 2
            N = ws * ws
            tokens = res * res
            info[f"{p}.attn.qkv"] = {"kind": "linear", "in_features": d,
                                     "out_features": 3 * d, "tokens": tokens}
            info[f"{p}.attn.matmul1"] = {"kind": "matmul", "heads": heads,
                                         "rows": N, "inner": d // heads,
                                         "cols": N, "windows": nwin}
            info[f"{p}.attn.matmul2"] = {"kind": "matmul", "heads": heads,
                                         "rows": N, "inner": N,
                                         "cols": d // heads, "windows": nwin}
            info[f"{p}.attn.proj"] = {"kind": "linear", "in_features": d,
                                      "out_features": d, "tokens": tokens}
            info[f"{p}.mlp.fc1"] = {"kind": "linear", "in_features": d,
                                    "out_features": hid, "tokens": tokens}
            info[f"{p}.mlp.fc2"] = {"kind": "linear", "in_features": hid,
                                    "out_features": d, "tokens": tokens}
        if i < cfg.num_layers - 1:
            info[f"layers.{i}.downsample.reduction"] = {
                "kind": "linear", "in_features": 4 * d, "out_features": 2 * d,
                "tokens": (res // 2) ** 2}
    dlast = cfg.layer_dim(cfg.num_layers - 1)
    info["head"] = {"kind": "linear", "in_features": dlast,
                    "out_features": cfg.num_classes, "tokens": 1}
    return info

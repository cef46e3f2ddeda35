"""Functional ViT / DeiT forward with explicit quantization tap points.

Architecture parity targets timm's VisionTransformer as used by the
reference (utils/models.py:62-91 in hahnyuan/PTQ4ViT): pre-norm blocks,
cls token + learned position embeddings, exact-GELU MLP, classification from
the cls token.  The attention is written around explicit ``matmul1``
(q @ kᵀ) and ``matmul2`` (softmax @ v) ops — the reference monkey-patches
timm's Attention.forward to reify exactly these two ops
(utils/models.py:10-26); here they are first-class tap points.

Parameters are a nested dict whose keys mirror timm state_dict names
(``blocks.3.attn.qkv`` etc.) so checkpoint conversion and int-export keys
line up with the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import QuantCtx, layer_norm, softmax_f32


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    name: str
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    ln_eps: float = 1e-6
    in_chans: int = 3
    # DeiT distilled variants (timm deit_*_distilled_*): an extra learned
    # distillation token and a second classifier head; inference averages
    # the two heads.  The reference's module-type map lacks head_dist
    # (net_wrap.py:42) so its pipeline crashes on these — supported here
    # as a deliberate upgrade (see README divergences).
    distilled: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def seq_len(self) -> int:
        return self.num_patches + (2 if self.distilled else 1)


def init_params(rng: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    """Random-init parameter pytree (timm-compatible key layout).

    Real runs load converted timm checkpoints (utils/timm_port.py); random
    init exists for tests and benchmarks.
    """
    keys = iter(jax.random.split(rng, 16 + 8 * cfg.depth))
    d = cfg.embed_dim
    hid = int(d * cfg.mlp_ratio)

    def lin(key, n_in, n_out):
        s = (2.0 / (n_in + n_out)) ** 0.5
        return {"weight": jax.random.normal(key, (n_out, n_in), jnp.float32) * s,
                "bias": jnp.zeros((n_out,), jnp.float32)}

    def ln():
        return {"weight": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    params: Dict[str, Any] = {
        "cls_token": jax.random.normal(next(keys), (1, 1, d), jnp.float32) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (1, cfg.seq_len, d),
                                       jnp.float32) * 0.02,
        "patch_embed": {"proj": {
            "weight": jax.random.normal(
                next(keys),
                (d, cfg.in_chans, cfg.patch_size, cfg.patch_size),
                jnp.float32) * 0.02,
            "bias": jnp.zeros((d,), jnp.float32)}},
        "blocks": [],
        "norm": ln(),
        "head": lin(next(keys), d, cfg.num_classes),
    }
    if cfg.distilled:
        params["dist_token"] = jax.random.normal(
            next(keys), (1, 1, d), jnp.float32) * 0.02
        params["head_dist"] = lin(next(keys), d, cfg.num_classes)
    for _ in range(cfg.depth):
        params["blocks"].append({
            "norm1": ln(),
            "attn": {"qkv": lin(next(keys), d, 3 * d),
                     "proj": lin(next(keys), d, d)},
            "norm2": ln(),
            "mlp": {"fc1": lin(next(keys), d, hid),
                    "fc2": lin(next(keys), hid, d)},
        })
    return params


def forward(params: Dict[str, Any], x, cfg: ViTConfig,
            qstate: Optional[Dict[str, Any]] = None,
            eps: Optional[Dict[str, Any]] = None,
            capture: bool = False,
            int8: bool = False,
            compute_dtype=None,
            packed: Optional[Dict[str, Any]] = None):
    """ViT forward.  x: (B, 3, H, W) NCHW float32.

    Returns logits, or (logits, taps) when ``capture``.
    """
    if compute_dtype is not None:
        # serving mode: bf16 activations/params; matmul accumulation stays
        # fp32 (preferred_element_type) or exact int32 on the int8 path
        params = jax.tree.map(lambda a: a.astype(compute_dtype)
                              if hasattr(a, "astype") else a, params)
        x = x.astype(compute_dtype)
    ctx = QuantCtx(qstate=qstate, eps=eps, capture=capture, int8=int8,
                   packed=packed)
    B = x.shape[0]
    d, H = cfg.embed_dim, cfg.num_heads
    scale = cfg.head_dim ** -0.5

    pe = params["patch_embed"]["proj"]
    x, _ = ctx.conv2d_patch("patch_embed.proj", x, pe["weight"], pe["bias"],
                            cfg.patch_size)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, d))
    if cfg.distilled:
        dist = jnp.broadcast_to(params["dist_token"], (B, 1, d))
        x = jnp.concatenate([cls, dist, x], axis=1) + params["pos_embed"]
    else:
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]

    for i, blk in enumerate(params["blocks"]):
        p = f"blocks.{i}"
        xb = ctx.vit_block(p, x, blk, H, scale, cfg.ln_eps)
        if xb is not None:
            x = xb
            continue
        # --- attention (reference attention_forward, utils/models.py:10-26)
        y = layer_norm(x, blk["norm1"]["weight"], blk["norm1"]["bias"], cfg.ln_eps)
        qkv = ctx.linear(f"{p}.attn.qkv", y, blk["attn"]["qkv"]["weight"],
                         blk["attn"]["qkv"]["bias"])
        N = qkv.shape[1]
        y = ctx.attention_qkv(f"{p}.attn.matmul1", f"{p}.attn.matmul2",
                              qkv, H, scale)
        if y is None:
            qkv = qkv.reshape(B, N, 3, H, cfg.head_dim) \
                .transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = ctx.matmul(f"{p}.attn.matmul1", q,
                              jnp.swapaxes(k, -2, -1)) * scale
            attn = softmax_f32(attn, axis=-1)
            y = ctx.matmul(f"{p}.attn.matmul2", attn, v)
            y = y.transpose(0, 2, 1, 3).reshape(B, N, d)
        y = ctx.linear(f"{p}.attn.proj", y, blk["attn"]["proj"]["weight"],
                       blk["attn"]["proj"]["bias"])
        x = x + y
        # --- MLP
        y = layer_norm(x, blk["norm2"]["weight"], blk["norm2"]["bias"], cfg.ln_eps)
        y = ctx.linear_gelu(f"{p}.mlp.fc1", y, blk["mlp"]["fc1"]["weight"],
                            blk["mlp"]["fc1"]["bias"])
        y = ctx.linear(f"{p}.mlp.fc2", y, blk["mlp"]["fc2"]["weight"],
                       blk["mlp"]["fc2"]["bias"])
        x = x + y

    x = layer_norm(x, params["norm"]["weight"], params["norm"]["bias"], cfg.ln_eps)
    logits = ctx.linear("head", x[:, 0], params["head"]["weight"],
                        params["head"]["bias"])
    if cfg.distilled:
        # timm DistilledVisionTransformer eval: mean of the two heads
        logits_d = ctx.linear("head_dist", x[:, 1],
                              params["head_dist"]["weight"],
                              params["head_dist"]["bias"])
        logits = (logits + logits_d) / 2
    if capture:
        return logits, ctx.taps
    return logits


def op_inventory(cfg: ViTConfig):
    """Ordered (name, module_type) list of quantizable ops, network order —
    the functional replacement for wrap_modules_in_net's module walk
    (reference net_wrap.py:39-81; type names from net_wrap.py:42)."""
    ops = [("patch_embed.proj", "qconv")]
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        ops += [
            (f"{p}.attn.qkv", "qlinear_qkv"),
            (f"{p}.attn.matmul1", "qmatmul_qk"),
            (f"{p}.attn.matmul2", "qmatmul_scorev"),
            (f"{p}.attn.proj", "qlinear_proj"),
            (f"{p}.mlp.fc1", "qlinear_MLP_1"),
            (f"{p}.mlp.fc2", "qlinear_MLP_2"),
        ]
    ops.append(("head", "qlinear_classifier"))
    if cfg.distilled:
        ops.append(("head_dist", "qlinear_classifier"))
    return ops


def op_shapes(cfg: ViTConfig):
    """Static shape info per op (used by the calibrator's cost model)."""
    info = {}
    d, hid = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio)
    N, Hh, hd = cfg.seq_len, cfg.num_heads, cfg.head_dim
    info["patch_embed.proj"] = {
        "kind": "conv",
        "in_features": cfg.in_chans * cfg.patch_size ** 2, "out_features": d,
        "tokens": cfg.num_patches}
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        info[f"{p}.attn.qkv"] = {"kind": "linear", "in_features": d,
                                 "out_features": 3 * d, "tokens": N}
        info[f"{p}.attn.matmul1"] = {"kind": "matmul", "heads": Hh,
                                     "rows": N, "inner": hd, "cols": N}
        info[f"{p}.attn.matmul2"] = {"kind": "matmul", "heads": Hh,
                                     "rows": N, "inner": N, "cols": hd}
        info[f"{p}.attn.proj"] = {"kind": "linear", "in_features": d,
                                  "out_features": d, "tokens": N}
        info[f"{p}.mlp.fc1"] = {"kind": "linear", "in_features": d,
                                "out_features": hid, "tokens": N}
        info[f"{p}.mlp.fc2"] = {"kind": "linear", "in_features": hid,
                                "out_features": d, "tokens": N}
    info["head"] = {"kind": "linear", "in_features": d,
                    "out_features": cfg.num_classes, "tokens": 1}
    if cfg.distilled:
        info["head_dist"] = {"kind": "linear", "in_features": d,
                             "out_features": cfg.num_classes, "tokens": 1}
    return info

"""Model registry: the 13 timm model names the reference grid covers
(example/test_all.py:83-99 in hahnyuan/PTQ4ViT), with architecture and
input-preprocessing metadata (timm default_cfg equivalents — mean/std,
crop_pct, bicubic interpolation — resolved by the reference via
timm.resolve_data_config, utils/datasets.py:334-341).

``get_net(name)`` is the functional counterpart of reference
utils/models.py:62-91: it returns a :class:`Net` bundle of (config, params,
forward fn, op inventory) with the attention already written around explicit
matmul1/matmul2 tap points.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax

from . import swin as swin_mod
from . import vit as vit_mod

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class DataConfig:
    input_size: int
    crop_pct: float
    mean: tuple
    std: tuple
    interpolation: str = "bicubic"


_VIT = dict(kind="vit", mean=IMAGENET_INCEPTION_MEAN, std=IMAGENET_INCEPTION_STD)
_DEIT = dict(kind="vit", mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD)
_SWIN = dict(kind="swin", mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD)

MODEL_ZOO: Dict[str, Dict[str, Any]] = {
    # --- ViT (example/test_all.py:84-88)
    "vit_tiny_patch16_224": dict(**_VIT, img=224, patch=16, dim=192, depth=12,
                                 heads=3, crop_pct=0.9),
    "vit_small_patch32_224": dict(**_VIT, img=224, patch=32, dim=384, depth=12,
                                  heads=6, crop_pct=0.9),
    "vit_small_patch16_224": dict(**_VIT, img=224, patch=16, dim=384, depth=12,
                                  heads=6, crop_pct=0.9),
    "vit_base_patch16_224": dict(**_VIT, img=224, patch=16, dim=768, depth=12,
                                 heads=12, crop_pct=0.9),
    "vit_base_patch16_384": dict(**_VIT, img=384, patch=16, dim=768, depth=12,
                                 heads=12, crop_pct=1.0),
    "vit_large_patch16_224": dict(**_VIT, img=224, patch=16, dim=1024, depth=24,
                                  heads=16, crop_pct=0.9),
    "vit_large_patch16_384": dict(**_VIT, img=384, patch=16, dim=1024, depth=24,
                                  heads=16, crop_pct=1.0),
    # --- DeiT (example/test_all.py:90-93)
    "deit_tiny_patch16_224": dict(**_DEIT, img=224, patch=16, dim=192, depth=12,
                                  heads=3, crop_pct=0.9),
    "deit_small_patch16_224": dict(**_DEIT, img=224, patch=16, dim=384,
                                   depth=12, heads=6, crop_pct=0.9),
    "deit_base_patch16_224": dict(**_DEIT, img=224, patch=16, dim=768, depth=12,
                                  heads=12, crop_pct=0.9),
    "deit_base_patch16_384": dict(**_DEIT, img=384, patch=16, dim=768, depth=12,
                                  heads=12, crop_pct=1.0),
    # --- DeiT distilled (dist_token + head_dist; beyond the reference grid —
    # its module-type map lacks head_dist and crashes on these)
    "deit_tiny_distilled_patch16_224": dict(**_DEIT, img=224, patch=16,
                                            dim=192, depth=12, heads=3,
                                            crop_pct=0.9, distilled=True),
    "deit_small_distilled_patch16_224": dict(**_DEIT, img=224, patch=16,
                                             dim=384, depth=12, heads=6,
                                             crop_pct=0.9, distilled=True),
    "deit_base_distilled_patch16_224": dict(**_DEIT, img=224, patch=16,
                                            dim=768, depth=12, heads=12,
                                            crop_pct=0.9, distilled=True),
    "deit_base_distilled_patch16_384": dict(**_DEIT, img=384, patch=16,
                                            dim=768, depth=12, heads=12,
                                            crop_pct=1.0, distilled=True),
    # --- Swin (example/test_all.py:95-98)
    "swin_tiny_patch4_window7_224": dict(**_SWIN, img=224, patch=4, dim=96,
                                         depths=(2, 2, 6, 2),
                                         heads=(3, 6, 12, 24), window=7,
                                         crop_pct=0.9),
    "swin_small_patch4_window7_224": dict(**_SWIN, img=224, patch=4, dim=96,
                                          depths=(2, 2, 18, 2),
                                          heads=(3, 6, 12, 24), window=7,
                                          crop_pct=0.9),
    "swin_base_patch4_window7_224": dict(**_SWIN, img=224, patch=4, dim=128,
                                         depths=(2, 2, 18, 2),
                                         heads=(4, 8, 16, 32), window=7,
                                         crop_pct=0.9),
    "swin_base_patch4_window12_384": dict(**_SWIN, img=384, patch=4, dim=128,
                                          depths=(2, 2, 18, 2),
                                          heads=(4, 8, 16, 32), window=12,
                                          crop_pct=1.0),
    "swin_large_patch4_window7_224": dict(**_SWIN, img=224, patch=4, dim=192,
                                          depths=(2, 2, 18, 2),
                                          heads=(6, 12, 24, 48), window=7,
                                          crop_pct=0.9),
    "swin_large_patch4_window12_384": dict(**_SWIN, img=384, patch=4,
                                           dim=192, depths=(2, 2, 18, 2),
                                           heads=(6, 12, 24, 48), window=12,
                                           crop_pct=1.0),
}


@dataclasses.dataclass
class Net:
    """Bundle returned by get_net: functional model + metadata."""
    name: str
    cfg: Any                       # ViTConfig or SwinConfig
    params: Dict[str, Any]
    forward: Callable              # forward(params, x, cfg, qstate, eps, capture)
    op_inventory: list             # ordered (op name, module_type)
    op_shapes: Dict[str, Any]
    data_config: DataConfig

    def apply(self, x, qstate=None, eps=None, capture=False, int8=False,
              packed=None):
        return self.forward(self.params, x, self.cfg, qstate=qstate, eps=eps,
                            capture=capture, int8=int8, packed=packed)


def model_config(name: str):
    z = MODEL_ZOO[name]
    if z["kind"] == "vit":
        return vit_mod.ViTConfig(name=name, img_size=z["img"],
                                 patch_size=z["patch"], embed_dim=z["dim"],
                                 depth=z["depth"], num_heads=z["heads"],
                                 distilled=z.get("distilled", False))
    return swin_mod.SwinConfig(name=name, img_size=z["img"],
                               patch_size=z["patch"], embed_dim=z["dim"],
                               depths=z["depths"], num_heads=z["heads"],
                               window_size=z["window"])


def get_net(name: str, params: Optional[Dict[str, Any]] = None,
            seed: int = 0) -> Net:
    """Build a functional model bundle.  ``params=None`` random-initializes
    (tests/benchmarks); pass a converted timm checkpoint pytree for real
    accuracy runs (see utils/timm_port.py)."""
    if name not in MODEL_ZOO:
        raise NotImplementedError(f"unknown model {name}")
    z = MODEL_ZOO[name]
    cfg = model_config(name)
    mod = vit_mod if z["kind"] == "vit" else swin_mod
    if params is None:
        params = mod.init_params(jax.random.PRNGKey(seed), cfg)
    return Net(name=name, cfg=cfg, params=params, forward=mod.forward,
               op_inventory=mod.op_inventory(cfg),
               op_shapes=mod.op_shapes(cfg),
               data_config=DataConfig(input_size=z["img"],
                                      crop_pct=z["crop_pct"],
                                      mean=z["mean"], std=z["std"]))

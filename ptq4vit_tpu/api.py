"""One-call high-level API.

    from ptq4vit_tpu import quantize
    net, qstate = quantize("vit_base_patch16_384", calib_images,
                           config="PTQ4ViT", bits=(8, 8))
    logits = net.apply(x, qstate=qstate, int8=True)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from .calib.calibrator import HessianQuantCalibrator
from .configs import get_config
from .models import Net, get_net


def quantize(model: str, calib_x: np.ndarray, *,
             config="PTQ4ViT",
             bits: Tuple[int, int] = (8, 8),
             params: Optional[Dict[str, Any]] = None,
             batch_size: int = 4,
             checkpoint_dir: Optional[str] = None,
             verbose: bool = False,
             **calib_kwargs) -> Tuple[Net, Dict[str, Any]]:
    """Calibrate ``model`` on ``calib_x`` (N, 3, H, W float32) and return
    (net, qstate).  ``params=None`` loads a converted timm checkpoint from
    $PTQ4VIT_TPU_CKPT_DIR if present, else random-initializes."""
    if params is None:
        from .utils.timm_port import load_timm_checkpoint_if_any
        params = load_timm_checkpoint_if_any(model)
    net = get_net(model, params=params)
    cfg = (get_config(config) if isinstance(config, str) else config) \
        .set_bits(*bits)
    calibrator = HessianQuantCalibrator(net, cfg, calib_x,
                                        batch_size=batch_size,
                                        checkpoint_dir=checkpoint_dir,
                                        **calib_kwargs)
    qstate = calibrator.batching_quant_calib(verbose=verbose)
    return net, qstate

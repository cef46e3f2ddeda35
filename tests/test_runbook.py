"""Dry-run of docs/accuracy_validation.md inside the sandbox (VERDICT r4
#8): every runbook command executes end-to-end against a LOCALLY
INITIALIZED checkpoint standing in for the timm pretrained weights this
environment cannot download.

Flow (runbook §1-§3, §5):
  torch .pth state_dict  --convert_torch_checkpoint-->  $PTQ4VIT_TPU_CKPT_DIR
  load_timm_checkpoint_if_any -> get_net -> FP32 Evaluator on a fake
  ImageFolder -> HessianQuantCalibrator -> quantized Evaluator ->
  examples/get_int.py int export.

Runbook §4's ablation/stability drivers are exercised by
tests/test_examples.py (test_cfg_modifier_grid and friends).  Accuracy
NUMBERS are meaningless with random weights; what this pins is that every
command a user would run on a real host actually runs — the integration
seams (checkpoint dir resolution, loader transforms keyed off the model's
DataConfig, evaluator batching, export layout), not top-1.
"""
import os

import numpy as np
import pytest
import torch

from ptq4vit_tpu.models import get_net

pytestmark = pytest.mark.slow


def _fake_imagefolder(root, img_size=64, n_classes=3, n_per_class=2):
    from PIL import Image
    rng = np.random.default_rng(5)
    for split in ("train", "val"):
        for c in range(n_classes):
            d = os.path.join(root, split, f"class_{c}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_per_class):
                arr = rng.integers(0, 255, (img_size, img_size, 3),
                                   dtype=np.uint8)
                Image.fromarray(arr, "RGB").save(
                    os.path.join(d, f"im{i}.jpg"), quality=90)


def test_runbook_end_to_end(tmp_path, monkeypatch):
    name = "vit_tiny_patch16_224"
    ckpt_dir = tmp_path / "ckpts"
    data_root = tmp_path / "imagenet"
    monkeypatch.setenv("PTQ4VIT_TPU_CKPT_DIR", str(ckpt_dir))
    _fake_imagefolder(str(data_root))

    # --- §1: convert a torch .pth (stand-in for a saved timm state_dict)
    from tests.test_timm_port import _vit_sd
    cfg = get_net(name).cfg
    sd = {k: torch.from_numpy(0.05 * v)
          for k, v in _vit_sd(cfg, np.random.default_rng(11)).items()}
    pth = tmp_path / f"{name}.pth"
    torch.save(sd, pth)
    from ptq4vit_tpu.utils.timm_port import (convert_torch_checkpoint,
                                             load_timm_checkpoint_if_any)
    out = convert_torch_checkpoint(name, str(pth))
    assert os.path.exists(out) and out.startswith(str(ckpt_dir))

    # --- §2: checkpoint resolution + FP32 eval over the ImageFolder loader
    params = load_timm_checkpoint_if_any(name)
    assert params is not None
    net = get_net(name, params=params)
    from ptq4vit_tpu.parallel import Evaluator
    from ptq4vit_tpu.utils.datasets import ViTImageNetLoaderGenerator
    g = ViTImageNetLoaderGenerator(str(data_root), "imagenet", 4, 4, 2,
                                   kwargs={"model": net})
    acc_fp32 = Evaluator(net).evaluate(g.test_loader())
    assert 0.0 <= acc_fp32 <= 1.0

    # --- §3 (one cell of the grid): calibrate on the loader's calib batch,
    # evaluate quantized
    from tests.test_calibrator import small_cfg
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    from ptq4vit_tpu.configs import ptq4vit
    calib = g.calib_batch(num=4)
    qstate = HessianQuantCalibrator(net, small_cfg(ptq4vit()), calib,
                                    batch_size=4) \
        .batching_quant_calib(verbose=False)
    acc_q = Evaluator(net, qstate=qstate).evaluate(g.test_loader())
    assert 0.0 <= acc_q <= 1.0

    # --- §5: int export through the example driver, NON-synthetic path
    # (exercises checkpoint-dir ingestion inside build_net_and_data)
    import sys
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(here, "examples"))
    try:
        import get_int as gi
    finally:
        sys.path.pop(0)

    class A:
        n_workers = 1
        multiprocess = False
        dataset_root = str(data_root)
        synthetic = False
        calib_size = 4
        max_iteration = 1
        quick = True

    out_npz = gi.get_int_weights(name, "BasePTQ", args=A(),
                                 out_dir=str(tmp_path / "int_weights"))
    z = np.load(out_npz)
    assert any(k.startswith("weight:") for k in z.files)
    assert any(k.startswith("interval:") for k in z.files)

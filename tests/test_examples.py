"""Smoke tests of the example drivers (synthetic data, shrunken search)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


class Args:
    n_workers = 1
    multiprocess = False
    dataset_root = "/nonexistent"
    synthetic = True
    calib_size = 8
    max_iteration = 1
    quick = True


@pytest.mark.slow
def test_experiment_basic_synthetic_quick():
    import test_vit as tv
    tv.experiment_basic(net="vit_tiny_patch16_224", config="PTQ4ViT",
                        args=Args())


def test_get_int_synthetic(tmp_path):
    import get_int as gi
    out = gi.get_int_weights("vit_tiny_patch16_224", "BasePTQ", args=Args(),
                             out_dir=str(tmp_path))
    z = np.load(out)
    assert any(k.startswith("weight:") for k in z.files)
    assert any(k.startswith("interval:") for k in z.files)


def test_cfg_modifier_grid():
    import test_all as ta
    from ptq4vit_tpu.configs import get_config
    m = ta.cfg_modifier(linear_ptq_setting=(1, 1, 1), metric="hessian",
                        bit_setting=(6, 6))
    cfg = m(get_config("PTQ4ViT"))
    assert cfg.w_bit["qlinear_qkv"] == 6 and cfg.A_bit["qmatmul_qk"] == 6
    assert len(ta.NAMES) == 13


def test_high_level_api(rng):
    import numpy as np
    from ptq4vit_tpu import quantize
    from ptq4vit_tpu.configs import base_ptq
    from tests.test_calibrator import small_cfg
    calib = np.random.default_rng(0).standard_normal(
        (4, 3, 224, 224)).astype(np.float32)
    net, qstate = quantize("vit_tiny_patch16_224", calib,
                           config=small_cfg(base_ptq()),
                           bits=(8, 8), batch_size=4)
    assert len(qstate) == len(net.op_inventory)


def _mp_experiment(tag=None, out_dir=None):
    # trivial experiment body (no jax) — exercises the queue mechanics
    with open(os.path.join(out_dir, f"{tag}.done"), "w") as f:
        f.write("ok")


def test_multiprocess_queue(tmp_path):
    import test_vit as tv
    cfg_list = [{"tag": f"t{i}", "out_dir": str(tmp_path)} for i in range(5)]
    tv.multiprocess(_mp_experiment, cfg_list, n_workers=2)
    done = sorted(p.name for p in tmp_path.glob("*.done"))
    assert done == [f"t{i}.done" for i in range(5)]

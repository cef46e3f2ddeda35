#!/usr/bin/env python
"""Basic experiment driver + shared helpers — counterpart of the reference's
example/test_vit.py (hahnyuan/PTQ4ViT): parse_args, test_classification,
experiment-level multiprocessing, config loading, experiment_basic.

Experiment-level task parallelism (reference test_vit.py:47-80): one worker
process per accelerator pulling whole experiments from a queue.  On TPU each
worker pins a chip/slice via JAX device selection; on a single chip run
sequentially.
"""
import argparse
import multiprocessing
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(extra=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_workers", "--n_gpu", type=int, default=1,
                        help="worker processes for experiment parallelism")
    parser.add_argument("--multiprocess", action="store_true")
    parser.add_argument("--dataset_root", default="/datasets/imagenet")
    parser.add_argument("--synthetic", action="store_true",
                        help="random weights + synthetic data (no ImageNet)")
    parser.add_argument("--calib_size", type=int, default=32)
    parser.add_argument("--max_iteration", type=int, default=None)
    parser.add_argument("--quick", action="store_true",
                        help="shrink the search (eq_n=8, 1 round) for smoke "
                             "tests")
    if extra:
        extra(parser)
    return parser.parse_args()


def init_config(config_name, **overrides):
    """Config loader (reference test_vit.py:82-90)."""
    from ptq4vit_tpu.configs import get_config
    return get_config(config_name, **overrides)


def test_classification(net, test_loader, qstate=None, max_iteration=None,
                        description=None):
    """Top-1 eval loop (reference test_vit.py:26-45)."""
    from ptq4vit_tpu.parallel import Evaluator
    ev = Evaluator(net, qstate=qstate)
    acc = ev.evaluate(test_loader, max_iteration=max_iteration, verbose=True)
    print(acc)
    return acc


def process(pid, experiment_process, args_queue, n_workers):
    """Worker process (reference test_vit.py:47-62): pins one accelerator
    per worker before jax initializes."""
    os.environ.setdefault("TPU_VISIBLE_DEVICES", str(pid % n_workers))
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", str(pid % n_workers))
    tot_run = 0
    while args_queue.qsize():
        try:
            test_args = args_queue.get(timeout=1)
        except Exception:
            break
        print(f"Run {test_args} on pid={pid}")
        experiment_process(**test_args)
        time.sleep(0.5)
        tot_run += 1
    print(f"{pid} tot_run {tot_run}")


def multiprocess(experiment_process, cfg_list=None, n_workers=1,
                 start_method="spawn"):
    """Queue-based experiment parallelism (reference test_vit.py:65-80).

    Workers use the SPAWN start method: forking a process that has already
    initialized JAX (multi-threaded) is deadlock-prone (CPython emits a
    DeprecationWarning for exactly this), and each spawned worker needs its
    own fresh JAX/TPU client anyway (reference pins one GPU per worker;
    here TPU_VISIBLE_DEVICES does the pinning in `process`)."""
    ctx = multiprocessing.get_context(start_method)
    args_queue = ctx.Queue()
    for cfg in cfg_list:
        args_queue.put(cfg)
    ps = []
    for pid in range(n_workers):
        p = ctx.Process(
            target=process,
            args=(pid, experiment_process, args_queue, n_workers))
        p.start()
        ps.append(p)
    for p in ps:
        p.join()


def build_net_and_data(name, args, calib_size):
    """Model + (test_loader, calib_batch); synthetic mode uses random
    weights and gaussian inputs (this sandbox has no ImageNet)."""
    from ptq4vit_tpu.models import get_net
    from ptq4vit_tpu.utils.datasets import ViTImageNetLoaderGenerator
    from ptq4vit_tpu.utils.synthetic import synthetic_images
    from ptq4vit_tpu.utils.timm_port import load_timm_checkpoint_if_any
    params = None if args.synthetic else \
        load_timm_checkpoint_if_any(name)
    net = get_net(name, params=params)
    if args.synthetic:
        calib = synthetic_images(calib_size, net.cfg.img_size, seed=3)
        n_eval = 64
        x = synthetic_images(n_eval, net.cfg.img_size, seed=7)
        y = np.zeros((n_eval,), np.int64)
        test_loader = [(x[i:i + 32], y[i:i + 32])
                       for i in range(0, n_eval, 32)]
        return net, test_loader, calib
    g = ViTImageNetLoaderGenerator(args.dataset_root, "imagenet", 32, 32, 16,
                                   kwargs={"model": net})
    return net, g.test_loader(), g.calib_batch(num=calib_size)


def experiment_basic(net="vit_base_patch16_384", config="PTQ4ViT",
                     args=None):
    """Minimal end-to-end experiment (reference test_vit.py:93-108)."""
    from ptq4vit_tpu.calib.calibrator import HessianQuantCalibrator
    args = args or parse_args()
    quant_cfg = init_config(config)
    if getattr(args, "quick", False):
        for kw in (quant_cfg.ptqsl_conv2d_kwargs, quant_cfg.ptqsl_linear_kwargs,
                   quant_cfg.ptqsl_matmul_kwargs):
            kw.update(eq_n=8, search_round=1)
    model, test_loader, calib = build_net_and_data(net, args, args.calib_size)
    calibrator = HessianQuantCalibrator(model, quant_cfg, calib,
                                        sequential=False, batch_size=4)
    qstate = calibrator.batching_quant_calib()
    test_classification(model, test_loader, qstate=qstate,
                        max_iteration=args.max_iteration)


if __name__ == "__main__":
    args = parse_args()
    nets = ["vit_tiny_patch16_224", "deit_base_patch16_384"]
    configs = ["PTQ4ViT"]
    cfg_list = [{"net": n, "config": c, "args": args}
                for n in nets for c in configs]
    if args.multiprocess:
        multiprocess(experiment_basic, cfg_list, n_workers=args.n_workers)
    else:
        for cfg in cfg_list:
            experiment_basic(**cfg)

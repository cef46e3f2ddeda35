"""Dataset layer tests: ImageFolder semantics, eval transform vs torchvision
formulas, seed-3 calib subset determinism, Debug/CIFAR loaders."""
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from ptq4vit_tpu.utils import datasets as D


@pytest.fixture
def imagenet_dir(tmp_path, rng):
    for split, n in [("train", 3), ("val", 2)]:
        for cls in ["n01", "n02"]:
            d = tmp_path / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img{i}.jpg")
    return str(tmp_path)


def test_eval_transform_shapes_and_norm(rng):
    tf = D.EvalTransform(32, crop_pct=0.9, mean=(0.5, 0.5, 0.5),
                         std=(0.5, 0.5, 0.5))
    assert tf.scale_size == int(np.floor(32 / 0.9))
    img = Image.fromarray((rng.random((50, 70, 3)) * 255).astype(np.uint8))
    x = tf(img)
    assert x.shape == (3, 32, 32)
    # normalize semantics: ((v/255) - 0.5) / 0.5 in [-1, 1]
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6


def test_imagefolder_and_loaders(imagenet_dir):
    g = D.ImageNetLoaderGenerator(imagenet_dir, "imagenet", 4, 4, 2)
    assert len(g.train_set) == 6 and len(g.test_set) == 4
    assert g.train_set.class_to_idx == {"n01": 0, "n02": 1}
    xs, ys = next(iter(g.test_loader()))
    assert xs.shape == (4, 3, 224, 224) and xs.dtype == np.float32
    assert set(ys.tolist()) <= {0, 1}


def test_calib_loader_seed_determinism(imagenet_dir):
    g1 = D.ImageNetLoaderGenerator(imagenet_dir, "imagenet", 4, 4, 2)
    g2 = D.ImageNetLoaderGenerator(imagenet_dir, "imagenet", 4, 4, 2)
    b1 = g1.calib_batch(num=4, seed=3)
    b2 = g2.calib_batch(num=4, seed=3)
    assert b1.shape == (4, 3, 224, 224)
    np.testing.assert_array_equal(b1, b2)
    # matches the reference's selection rule
    np.random.seed(3)
    inds = np.random.permutation(6)[:4]
    base = g1._train_set_with_test_transform()
    ref = np.stack([np.asarray(base[i][0]) for i in inds])
    np.testing.assert_array_equal(b1, ref)


def test_vit_loader_uses_model_data_config(imagenet_dir):
    from ptq4vit_tpu.models import get_net
    net = get_net("vit_small_patch16_224")
    g = D.ViTImageNetLoaderGenerator(imagenet_dir, "imagenet", 2, 2, 2,
                                     kwargs={"model": net})
    assert g.test_transform.input_size == 224
    assert g.test_transform.scale_size == int(np.floor(224 / 0.9))
    np.testing.assert_allclose(g.test_transform.mean.ravel(), [0.5] * 3)


def test_debug_loader():
    g = D.DebugLoaderGenerator("/nonexistent", "debug1", 1, 1, 1)
    x, y = next(iter(g.test_loader()))
    assert x.shape == (1, 1, 8, 8) and (x == 1).all() and y[0] == 0
    with pytest.raises(NotImplementedError):
        D.DebugLoaderGenerator("/nonexistent", "debug9", 1, 1, 1)


def test_cifar_loader(tmp_path, rng):
    d = tmp_path / "cifar-10-batches-py"
    d.mkdir()
    data = (rng.random((10, 3072)) * 255).astype(np.uint8)
    labels = list(range(10))
    for fn in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        with open(d / fn, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
    g = D.CIFARLoaderGenerator(str(tmp_path), "cifar10", 5, 5, 1)
    xs, ys = next(iter(g.test_loader()))
    assert xs.shape == (5, 3, 32, 32)
    assert len(g.train_set) == 50
    b = g.calib_batch(num=8, seed=3)
    assert b.shape == (8, 3, 32, 32)


def test_get_dataset_dispatcher():
    import argparse
    args = argparse.Namespace(dataset="debug0")
    train, test = D.get_dataset(args)
    x, y = next(iter(test))
    assert x.shape == (1, 1, 4, 4)


def test_coco_loader(tmp_path, rng):
    """COCO detection lists (reference datasets.py:130-196): list files name
    images, labels live in a sibling labels/ tree, images letterbox to
    img_size."""
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    paths = []
    for i in range(3):
        p = img_dir / f"im{i}.jpg"
        arr = (rng.random((30, 44, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        (lbl_dir / f"im{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
        paths.append(str(p))
    (tmp_path / "trainvalno5k.txt").write_text("\n".join(paths[:2]) + "\n")
    (tmp_path / "5k.txt").write_text(paths[2] + "\n")

    g = D.COCOLoaderGenerator(str(tmp_path), "coco", 2, 1, 0)
    assert len(g.train_set) == 2 and len(g.test_set) == 1
    x, y = g.test_set[0]
    assert x.shape == (3, 416, 416) and x.dtype == np.float32
    assert x.min() >= 0.0 and x.max() <= 1.0
    assert y.shape[-1] == 5  # (class, cx, cy, w, h)
    for xb, _ in g.train_loader():
        assert xb.shape == (2, 3, 416, 416)
    # the dispatcher route (previously only exercised indirectly)
    class A:
        dataset = "coco"
        dataset_root = str(tmp_path)
        num_workers = 0
        batch_size = 2
    train, test = D.get_dataset(A())
    assert len(test.dataset) == 1


def test_calculate_n_correct():
    out = np.asarray([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]])
    assert D.calculate_n_correct(out, np.asarray([1, 0, 0])) == 2


def test_faster_loader_shm_cache(imagenet_dir, tmp_path):
    from ptq4vit_tpu.models import get_net
    net = get_net("vit_tiny_patch16_224")
    cache = str(tmp_path / "cache.npz")
    g = D.FasterImageNetLoaderGenerator(
        imagenet_dir, "imagenet", 2, 2, 2,
        kwargs={"model": net, "cache_path": cache})
    xs1, ys1 = next(iter(g.test_loader()))
    assert os.path.exists(cache)
    # second load comes from the cache and is identical
    g2 = D.FasterImageNetLoaderGenerator(
        imagenet_dir, "imagenet", 2, 2, 2,
        kwargs={"model": net, "cache_path": cache})
    xs2, ys2 = next(iter(g2.test_loader()))
    np.testing.assert_array_equal(xs1, xs2)
    np.testing.assert_array_equal(ys1, ys2)


def test_raw_uint8_transform(rng):
    from PIL import Image
    tf = D.EvalTransform(32, crop_pct=0.9, raw_uint8=True)
    img = Image.fromarray((rng.random((50, 70, 3)) * 255).astype(np.uint8))
    x = tf(img)
    assert x.dtype == np.uint8 and x.shape == (3, 32, 32)


def test_corrupt_image_error_names_file(imagenet_dir):
    bad = os.path.join(imagenet_dir, "val", "n01", "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0 not a jpeg")
    g = D.ImageNetLoaderGenerator(imagenet_dir, "imagenet", 8, 8, 1)
    with pytest.raises(ValueError, match="bad.jpg"):
        next(iter(g.test_loader()))
    os.remove(bad)

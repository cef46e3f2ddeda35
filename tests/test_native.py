"""Native C++ preprocess vs PIL: the resample must be bit-exact (same
fixed-point path as Pillow's Resample.c), the full pipeline must match
EvalTransform."""
import io

import numpy as np
import pytest
from PIL import Image

from ptq4vit_tpu import native
from ptq4vit_tpu.utils.datasets import EvalTransform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++/libjpeg unavailable")


def test_resize_bitexact_vs_pillow(rng):
    for (h, w), (oh, ow) in [((57, 83), (32, 47)), ((40, 40), (96, 96)),
                             ((300, 260), (249, 215))]:
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        ref = np.asarray(Image.fromarray(arr).resize((ow, oh), Image.BICUBIC))
        got = native.resize_bicubic(arr, ow, oh)
        np.testing.assert_array_equal(got, ref)


def test_preprocess_rgb_matches_eval_transform(rng):
    tf = EvalTransform(32, crop_pct=0.9, mean=(0.5, 0.4, 0.3),
                       std=(0.2, 0.25, 0.3))
    arr = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    ref = tf(Image.fromarray(arr))
    got = native.preprocess_rgb(arr, tf.scale_size, tf.input_size,
                                tf.mean.ravel(), tf.std.ravel())
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_decode_preprocess_matches_pil_jpeg(rng):
    tf = EvalTransform(32, crop_pct=0.9, mean=(0.485, 0.456, 0.406),
                       std=(0.229, 0.224, 0.225))
    arr = (rng.random((60, 90, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=90)
    jpeg = buf.getvalue()
    ref = tf(Image.open(io.BytesIO(jpeg)))
    got = native.decode_preprocess(jpeg, tf.scale_size, tf.input_size,
                                   tf.mean.ravel(), tf.std.ravel())
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_imagefolder_native_path_matches_pil(tmp_path, rng):
    from ptq4vit_tpu.utils.datasets import ImageFolderDataset
    d = tmp_path / "n01"
    d.mkdir()
    for i in range(3):
        arr = (rng.random((80, 100, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.jpg", quality=92)
    tf_pil = EvalTransform(32, crop_pct=0.9, use_native="never")
    tf_nat = EvalTransform(32, crop_pct=0.9)
    assert tf_nat.wants_bytes
    ds_pil = ImageFolderDataset(str(tmp_path), tf_pil)
    ds_nat = ImageFolderDataset(str(tmp_path), tf_nat)
    for i in range(3):
        a, _ = ds_pil[i]
        b, _ = ds_nat[i]
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6)

import numpy as np
from PIL import Image

from open_groundingdino_tpu.data.strong_aug import (
    AdjustBrightness,
    AdjustContrast,
    IoUCrop,
    LightingNoise,
    RandomCropKeepBox,
    RandomSelectMulti,
    Rotate,
)
from open_groundingdino_tpu.data.transforms import Sample


def _sample(seed=0):
    rng = np.random.RandomState(seed)
    img = Image.fromarray(rng.randint(0, 255, (120, 160, 3), np.uint8))
    boxes = np.asarray([[20, 30, 80, 90], [100, 40, 150, 110]], np.float32)
    return Sample(img, boxes, np.asarray([0, 1]))


def test_photometric_keep_boxes():
    for aug in (AdjustContrast(), AdjustBrightness(), LightingNoise()):
        s = aug(_sample())
        assert s.image.size == (160, 120)
        np.testing.assert_array_equal(s.boxes, _sample().boxes)


def test_rotate_zero_is_identityish():
    s = Rotate(angles=[0])( _sample())
    np.testing.assert_allclose(s.boxes, _sample().boxes, atol=1e-3)
    # small rotation: boxes inside canvas and hull grows
    s2 = Rotate(angles=[10])(_sample())
    assert (s2.boxes[:, 2] > s2.boxes[:, 0]).all()
    w, h = s2.image.size
    assert (s2.boxes[:, [0, 2]] <= w).all() and (s2.boxes[:, [1, 3]] <= h).all()


def test_random_crop_keeps_a_box():
    s = RandomCropKeepBox()( _sample())
    assert len(s.boxes) >= 1
    w, h = s.image.size
    assert (s.boxes[:, 2] <= w + 1e-3).all() and (s.boxes[:, 3] <= h + 1e-3).all()


def test_iou_crop_valid_output():
    s = IoUCrop()( _sample())
    assert len(s.boxes) >= 1
    w, h = s.image.size
    assert (s.boxes >= 0).all()
    assert (s.boxes[:, 2] <= w + 1e-3).all() and (s.boxes[:, 3] <= h + 1e-3).all()


def test_random_select_multi():
    aug = RandomSelectMulti([AdjustContrast(), AdjustBrightness()])
    s = aug(_sample())
    assert s.image.size == (160, 120)

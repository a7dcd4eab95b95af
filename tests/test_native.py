import numpy as np
import pytest

from lap_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_resize_matches_cv2(lib):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 90, 3), np.uint8)
    out = native.resize_with_pad_u8(img, 64, 64)
    assert out.shape == (64, 64, 3)
    # Compare against cv2 within interpolation tolerance.
    ratio = max(120 / 64, 90 / 64)
    rh, rw = int(120 / ratio), int(90 / ratio)
    ref = np.zeros((64, 64, 3), np.uint8)
    y0, x0 = (64 - rh) // 2, (64 - rw) // 2
    ref[y0 : y0 + rh, x0 : x0 + rw] = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert np.median(diff) <= 1
    assert diff.mean() < 2.0


def test_native_resize_batch(lib):
    imgs = np.random.default_rng(1).integers(0, 255, (6, 100, 80, 3), np.uint8)
    out = native.resize_with_pad_u8(imgs, 56, 56)
    assert out.shape == (6, 56, 56, 3)
    single = native.resize_with_pad_u8(imgs[0], 56, 56)
    np.testing.assert_array_equal(out[0], single)


def test_native_rotate180(lib):
    img = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    out = native.rotate180_u8(img)
    np.testing.assert_array_equal(out, img[::-1, ::-1])


def test_native_unigram_matches_python(lib):
    from lap_tpu.models import spm

    sp = spm.build_test_processor()
    assert sp._native is not None, "native path should be active for test vocab"
    texts = [
        "move forward 5 cm and rotate left 10 degrees",
        "Task: pick up the cup; State: 12 200 49; Answer: ",
        "",
        "close gripper",
    ]
    for text in texts:
        norm = sp._normalize(text)
        native_ids = sp._native.encode(norm)
        python_ids = sp._encode_unigram(norm)
        assert native_ids == python_ids, f"mismatch for {text!r}"


def test_native_unigram_speedup(lib):
    import time

    from lap_tpu.models import spm

    sp = spm.build_test_processor()
    text = sp._normalize("move forward 12 cm, tilt left 10 degrees, close gripper " * 20)
    t0 = time.perf_counter()
    for _ in range(50):
        sp._native.encode(text)
    native_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(50):
        sp._encode_unigram(text)
    python_t = time.perf_counter() - t0
    assert native_t < python_t, f"native {native_t:.3f}s not faster than python {python_t:.3f}s"

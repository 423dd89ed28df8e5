"""Native C RLE codec: parity with the numpy implementation + throughput."""

import time

import numpy as np
import pytest

from sg2im_tpu import native
from sg2im_tpu.data import rle as rle_mod


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("no C compiler available to build native codec")
    return True


def test_native_decode_matches_numpy(lib_ok):
    rng = np.random.RandomState(0)
    for shape in [(23, 17), (64, 64), (5, 1), (1, 7)]:
        mask = (rng.rand(*shape) > 0.5).astype(np.uint8)
        rle = rle_mod.mask_to_rle(mask)
        got = native.rle_decode_native(rle["counts"], *shape)
        np.testing.assert_array_equal(got, mask)


def test_native_encode_matches_numpy(lib_ok):
    rng = np.random.RandomState(1)
    for shape in [(23, 17), (64, 64)]:
        mask = (rng.rand(*shape) > 0.3).astype(np.uint8)
        want = rle_mod.mask_to_rle(mask)["counts"]
        # numpy-path encode (bypasses native in mask_to_rle)
        got = native.rle_encode_native(mask)
        assert got == want


def test_rle_to_mask_uses_native(lib_ok):
    rng = np.random.RandomState(2)
    mask = (rng.rand(100, 80) > 0.6).astype(np.uint8)
    rle = rle_mod.mask_to_rle(mask)
    np.testing.assert_array_equal(rle_mod.rle_to_mask(rle), mask)


def test_native_decode_is_faster(lib_ok):
    rng = np.random.RandomState(3)
    mask = (rng.rand(480, 640) > 0.5).astype(np.uint8)
    rle = rle_mod.mask_to_rle(mask)
    counts = rle["counts"]

    t0 = time.perf_counter()
    for _ in range(20):
        native.rle_decode_native(counts, 480, 640)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        runs = rle_mod.decode_rle_counts(counts)
        vals = np.zeros(len(runs), np.uint8)
        vals[1::2] = 1
        np.repeat(vals, runs)[: 480 * 640].reshape((640, 480)).T
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


def test_invalid_counts_raises(lib_ok):
    with pytest.raises(ValueError):
        # runs exceeding the mask area must be rejected
        native.rle_decode_native(rle_mod.encode_rle_counts([1000]).decode(),
                                 4, 4)

import numpy as np
import pytest

from umgen_tpu import native
from umgen_tpu.ops.collision import collision_matrix_np


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("no C++ toolchain available")
    return native.load()


def _rand_boxes(seed, n):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n, 10), np.float32)
    boxes[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 3] = rng.uniform(2, 6, n)
    boxes[:, 4] = rng.uniform(1, 3, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_matches_numpy(lib, seed):
    boxes = _rand_boxes(seed, 40)
    got = native.collision_matrix(boxes)
    exp = collision_matrix_np(boxes)
    np.testing.assert_array_equal(got, exp)


def test_native_empty(lib):
    out = native.collision_matrix(np.zeros((0, 10), np.float32))
    assert out.shape == (0, 0)


def test_native_identical_boxes_no_self_collision(lib):
    boxes = np.tile(_rand_boxes(3, 1), (2, 1))
    got = native.collision_matrix(boxes)
    # identical boxes: strict semantics → no proper crossing, no strict
    # containment
    assert not got.any()

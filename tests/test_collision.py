import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.ops.collision import (
    BoxOverlap,
    bev_corners,
    boxes_to_corners,
    candidate_collides,
    collision_matrix_np,
    pairwise_collision,
)


def _sat_overlap(c1, c2):
    """Separating-axis oracle for convex quads (non-strict overlap)."""
    for poly in (c1, c2):
        for i in range(4):
            edge = poly[(i + 1) % 4] - poly[i]
            axis = np.array([-edge[1], edge[0]])
            p1 = c1 @ axis
            p2 = c2 @ axis
            if p1.max() < p2.min() or p2.max() < p1.min():
                return False
    return True


def _rand_boxes(rng, n):
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 3] = rng.uniform(2, 6, n)     # l
    boxes[:, 4] = rng.uniform(1, 3, n)     # w
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pairwise_collision_matches_sat(seed):
    rng = np.random.default_rng(seed)
    boxes = _rand_boxes(rng, 24)
    corners = np.asarray(bev_corners(boxes[:, 0:2], boxes[:, 3:5],
                                     boxes[:, 6], xp=np))
    got = np.asarray(pairwise_collision(corners, corners, xp=np))
    for i in range(len(boxes)):
        for j in range(len(boxes)):
            exp = _sat_overlap(corners[i], corners[j])
            if i == j:
                # strict semantics: identical boxes never collide
                assert not got[i, j]
            else:
                assert got[i, j] == exp, (i, j)


def test_jnp_matches_np():
    rng = np.random.default_rng(5)
    boxes = _rand_boxes(rng, 12)
    corners = bev_corners(boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6], xp=np)
    a = np.asarray(pairwise_collision(jnp.asarray(corners),
                                      jnp.asarray(corners), xp=jnp))
    b = np.asarray(pairwise_collision(corners, corners, xp=np))
    np.testing.assert_array_equal(a, b)


def test_containment_counts_as_collision():
    big = np.array([[0, 0, 0, 10, 10, 1, 0.3]], np.float32)
    small = np.array([[0.5, 0.2, 0, 1, 1, 1, 1.0]], np.float32)
    cb = np.asarray(bev_corners(big[:, 0:2], big[:, 3:5], big[:, 6], xp=np))
    cs = np.asarray(bev_corners(small[:, 0:2], small[:, 3:5], small[:, 6],
                                xp=np))
    assert pairwise_collision(cb, cs, xp=np)[0, 0]
    assert pairwise_collision(cs, cb, xp=np)[0, 0]


def test_candidate_collides_filters():
    # buffer: ego at origin; candidate overlapping ego → hit
    buffer = np.zeros((1, 4, 10), np.float32)
    buffer[0, 0] = [0, 0, 0, 5.2, 2.3, 1.8, 0, 0, 0, 0]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    cand = np.zeros((1, 10), np.float32)
    cand[0] = [1.0, 0.5, 0, 4, 2, 1.5, 0.2, 0, 0, 0]
    hit = candidate_collides(jnp.asarray(cand), jnp.asarray(buffer),
                             jnp.asarray(valid))
    assert bool(hit[0])

    # candidate far away → no hit
    cand2 = cand.copy()
    cand2[0, 0:2] = [30, 30]
    assert not bool(candidate_collides(jnp.asarray(cand2),
                                       jnp.asarray(buffer),
                                       jnp.asarray(valid))[0])

    # candidate at x >= 63 (decoded pad) is pre-filtered → no hit
    cand3 = cand.copy()
    cand3[0, 0] = 63.5
    buffer2 = buffer.copy()
    buffer2[0, 0, 0] = 63.4
    assert not bool(candidate_collides(jnp.asarray(cand3),
                                       jnp.asarray(buffer),
                                       jnp.asarray(valid))[0])
    # buffered boxes past the filter don't count either
    assert not bool(candidate_collides(jnp.asarray(cand),
                                       jnp.asarray(buffer2),
                                       jnp.asarray(valid))[0])


def test_box_overlap_metric():
    m = BoxOverlap()
    frames = [np.array([
        [0, 0, 0, 4, 2, 1.5, 0, 0, 0, 0],
        [1, 0.3, 0, 4, 2, 1.5, 0.1, 0, 0, 0],   # overlaps the first
        [30, 30, 0, 4, 2, 1.5, 0, 0, 0, 0],
    ], np.float32)]
    m.update(frames)
    ratio, scenario = m.average()
    np.testing.assert_allclose(ratio, 2 / 3)
    np.testing.assert_allclose(scenario, 2 / 3)


def test_collision_matrix_symmetric_no_diag():
    rng = np.random.default_rng(11)
    boxes = np.zeros((8, 10), np.float32)
    boxes[:, 0:2] = rng.uniform(-5, 5, (8, 2))
    boxes[:, 3] = 4; boxes[:, 4] = 2; boxes[:, 5] = 1.5
    mat = collision_matrix_np(boxes)
    assert not mat.diagonal().any()
    np.testing.assert_array_equal(mat, mat.T)


def test_generate_collision_attribute():
    from umgen_tpu.ops.collision import generate_collision_attribute
    # two boxes approaching head-on along x; a third far away and static
    # asymmetric speeds so the pair overlaps properly (equal-and-opposite
    # velocities pass through exact coincidence, which the strict
    # intersection test rightly ignores)
    boxes = np.array([
        [0.0, 0, 0, 4, 2, 1.5, 0, 2.0, 0, 0],
        [20.0, 0, 0, 4, 2, 1.5, 0, -1.5, 0, 0],
        [50.0, 50, 0, 4, 2, 1.5, 0, 0, 0, 0],
    ], np.float32)
    attr = generate_collision_attribute([boxes], time_steps=10)[0]
    assert attr.shape == (3,)
    # gap 16 m closes at 3.5 m/step → proper overlap by t=5
    assert attr[0] < 10 and attr[1] < 10
    assert attr[0] == attr[1]
    # the far box never collides
    assert attr[2] == 10


# ---------------------------------------------------------------------------
# 3D box IoU (ops/collision.py box_iou_3d — pytorch3d box3d_overlap stand-in)
# ---------------------------------------------------------------------------
def test_box_iou_3d_identical_and_disjoint():
    from umgen_tpu.ops.collision import box_iou_3d, box_vertices
    centers = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
    whl = np.array([[4, 2, 1.5], [4, 2, 1.5]], np.float32)
    yaw = np.zeros(2, np.float32)
    v = box_vertices(centers, whl, yaw)
    inter, iou = box_iou_3d(v, v)
    vol = 4 * 2 * 1.5
    np.testing.assert_allclose(np.diag(inter), vol, rtol=1e-5)
    np.testing.assert_allclose(np.diag(iou), 1.0, rtol=1e-5)
    assert inter[0, 1] == 0 and iou[0, 1] == 0


def test_box_iou_3d_half_overlap():
    from umgen_tpu.ops.collision import box_iou_3d, box_vertices
    # unit cubes offset by half along x: inter = 0.5, union = 1.5
    centers = np.array([[0, 0, 0], [0.5, 0, 0]], np.float32)
    whl = np.ones((2, 3), np.float32)
    v = box_vertices(centers, whl, np.zeros(2, np.float32))
    inter, iou = box_iou_3d(v[:1], v[1:])
    np.testing.assert_allclose(inter[0, 0], 0.5, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 0], 0.5 / 1.5, rtol=1e-5)


def test_box_iou_3d_rotation_invariance():
    from umgen_tpu.ops.collision import box_iou_3d, box_vertices
    # rotating both boxes together must not change the IoU
    centers = np.array([[0, 0, 0], [1.0, 0.5, 0]], np.float32)
    whl = np.array([[4, 2, 1], [3, 2, 1]], np.float32)
    base_yaw = np.array([0.3, -0.2], np.float32)
    v = box_vertices(centers, whl, base_yaw)
    _, iou0 = box_iou_3d(v[:1], v[1:])
    theta = 1.1
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s], [s, c]], np.float32)
    rc = centers.copy()
    rc[:, :2] = centers[:, :2] @ R.T
    # box_vertices applies the reference's row-vector rotation (net -yaw),
    # so a world rotation by +theta means yaw_arg -= theta
    v2 = box_vertices(rc, whl, base_yaw - theta)
    _, iou1 = box_iou_3d(v2[:1], v2[1:])
    np.testing.assert_allclose(iou0[0, 0], iou1[0, 0], rtol=1e-4)
    assert iou0[0, 0] > 0


def test_box_iou_3d_z_disjoint():
    from umgen_tpu.ops.collision import box_iou_3d, box_vertices
    centers = np.array([[0, 0, 0], [0, 0, 5]], np.float32)
    whl = np.ones((2, 3), np.float32)
    v = box_vertices(centers, whl, np.zeros(2, np.float32))
    inter, iou = box_iou_3d(v[:1], v[1:])
    assert inter[0, 0] == 0 and iou[0, 0] == 0


def test_generate_collision_attribute_3d_mode():
    from umgen_tpu.ops.collision import generate_collision_attribute
    boxes = np.array([
        [0.0, 0, 0, 4, 2, 1.5, 0, 2.0, 0, 0],
        [20.0, 0, 0, 4, 2, 1.5, 0, -1.5, 0, 0],
        [50.0, 50, 0, 4, 2, 1.5, 0, 0, 0, 0],
    ], np.float32)
    attr = generate_collision_attribute([boxes], time_steps=10, mode="3d")[0]
    assert attr.shape == (3,)
    assert attr[0] < 10 and attr[1] < 10 and attr[2] == 10

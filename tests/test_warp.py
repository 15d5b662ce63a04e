import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.ops.warp import (
    affine_grid_sample,
    affine_warp_map,
    build_affine_matrices,
)


def _torch_reference(feat_nchw, mat):
    import torch
    import torch.nn.functional as F
    x = torch.from_numpy(feat_nchw)
    m = torch.from_numpy(mat)
    grid = F.affine_grid(m, x.shape, align_corners=False)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=False).numpy()


def test_affine_grid_sample_matches_torch_identity():
    rng = np.random.default_rng(0)
    N, C, Hh, W = 3, 5, 8, 8
    feat = rng.normal(size=(N, C, Hh, W)).astype(np.float32)
    mat = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (N, 1, 1))
    ref = _torch_reference(feat, mat)
    got = affine_grid_sample(jnp.asarray(feat.transpose(0, 2, 3, 1)),
                             jnp.asarray(mat))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_affine_grid_sample_matches_torch_random(seed):
    rng = np.random.default_rng(seed)
    N, C, Hh, W = 2, 4, 16, 16
    feat = rng.normal(size=(N, C, Hh, W)).astype(np.float32)
    theta = rng.uniform(-0.5, 0.5, N)
    tx = rng.uniform(-0.4, 0.4, N)
    ty = rng.uniform(-0.4, 0.4, N)
    mat = np.zeros((N, 2, 3), np.float32)
    mat[:, 0, 0] = np.cos(theta)
    mat[:, 0, 1] = -np.sin(theta)
    mat[:, 0, 2] = tx
    mat[:, 1, 0] = np.sin(theta)
    mat[:, 1, 1] = np.cos(theta)
    mat[:, 1, 2] = ty
    ref = _torch_reference(feat, mat)
    got = affine_grid_sample(jnp.asarray(feat.transpose(0, 2, 3, 1)),
                             jnp.asarray(mat))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), ref,
                               atol=1e-4)


def test_full_warp_matches_reference_pipeline():
    """End-to-end: our affine_warp_map vs the reference affine_transform
    recipe (matrix construction ref:UMGen.py:310-349) executed via torch."""
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(7)
    B, T, S, C = 1, 3, 32 * 32, 6
    Hh = W = 32
    feat = rng.normal(size=(B, T, S, C)).astype(np.float32)
    pose = rng.uniform(-1, 1, size=(B, T, 3)).astype(np.float32)
    pose[..., 2] *= 0.3

    got = affine_warp_map(jnp.asarray(feat), jnp.asarray(pose))

    # torch execution of the reference recipe
    x = torch.from_numpy(feat).reshape(B * T, Hh, W, C).permute(0, 3, 1, 2)
    pd = torch.from_numpy(pose).reshape(B * T, 3)
    theta, dx, dy = pd[:, 2], 2 * (pd[:, 0] / 4.0) / W, 2 * (pd[:, 1] / 4.0) / Hh
    mats = []
    for i in range(B * T):
        m = torch.zeros(2, 3)
        m[0, 0] = torch.cos(-theta[i]); m[0, 1] = -torch.sin(-theta[i])
        m[0, 2] = -dy[i]
        m[1, 0] = torch.sin(-theta[i]); m[1, 1] = torch.cos(-theta[i])
        m[1, 2] = -dx[i]
        mats.append(m)
    mat = torch.stack(mats)
    grid = F.affine_grid(mat, x.shape, align_corners=False)
    ref = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(B, T, S, C).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_zero_motion_is_near_identity():
    rng = np.random.default_rng(9)
    feat = rng.normal(size=(1, 1, 1024, 4)).astype(np.float32)
    pose = np.zeros((1, 1, 3), np.float32)
    got = affine_warp_map(jnp.asarray(feat), jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(got), feat, atol=1e-5)

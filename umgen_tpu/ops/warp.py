"""Action-aware map alignment: affine warp of BEV map features.

In-graph jnp equivalent of the reference's ``F.affine_grid`` +
``F.grid_sample`` pipeline (ref:projects/models/UMGen.py:310-354), with
``align_corners=False`` and zero padding semantics matched bit-for-bit (see
tests/test_warp.py which cross-checks against torch).

The warp shifts/rotates the previous frame's map feature grid by the decoded
ego motion so the map prior lands in the next frame's ego coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample_zeros(feat: jnp.ndarray, fx: jnp.ndarray,
                           fy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of feat [N, H, W, C] at pixel coords fx/fy [N, H, W],
    zero padding outside — grid_sample(padding_mode='zeros') semantics:
    out-of-range *taps* contribute zero, so border pixels blend to zero."""
    N, H, W, C = feat.shape
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tap(xi, yi, w):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = feat.reshape(N, H * W, C)
        idx = yc * W + xc                      # [N, H, W]
        g = jnp.take_along_axis(
            flat, idx.reshape(N, H * W, 1), axis=1).reshape(N, H, W, C)
        return g * (w * inb.astype(w.dtype))[..., None]

    out = (tap(x0, y0, wx0 * wy0) + tap(x0 + 1, y0, wx1 * wy0)
           + tap(x0, y0 + 1, wx0 * wy1) + tap(x0 + 1, y0 + 1, wx1 * wy1))
    return out


def affine_grid_sample(feat: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """torch-equivalent affine_grid+grid_sample, channels-last.

    feat: [N, H, W, C]; mat: [N, 2, 3] row-major affine (torch convention:
    output normalized coords (u, v) → source coords
    x_s = m00*u + m01*v + m02, y_s = m10*u + m11*v + m12).
    align_corners=False: u_j = (2j+1)/W - 1, source pixel
    fx = ((x_s+1)*W - 1)/2.
    """
    N, H, W, C = feat.shape
    u = (2.0 * jnp.arange(W) + 1.0) / W - 1.0      # x over width
    v = (2.0 * jnp.arange(H) + 1.0) / H - 1.0      # y over height
    uu = jnp.broadcast_to(u[None, :], (H, W))
    vv = jnp.broadcast_to(v[:, None], (H, W))

    m = mat.astype(jnp.float32)
    xs = (m[:, 0, 0, None, None] * uu + m[:, 0, 1, None, None] * vv
          + m[:, 0, 2, None, None])
    ys = (m[:, 1, 0, None, None] * uu + m[:, 1, 1, None, None] * vv
          + m[:, 1, 2, None, None])
    fx = ((xs + 1.0) * W - 1.0) / 2.0
    fy = ((ys + 1.0) * H - 1.0) / 2.0
    return _bilinear_sample_zeros(feat.astype(jnp.float32), fx, fy
                                  ).astype(feat.dtype)


def build_affine_matrices(pose_diff: jnp.ndarray, hw: int,
                          res: float = 4.0) -> jnp.ndarray:
    """Ego motion → affine matrices (ref:UMGen.py:310-333).

    pose_diff: [N, 3] (dx, dy, dtheta) metric.  Matches the reference's
    convention: rotation by -theta; row-0 translation = -dy_norm, row-1 =
    -dx_norm where d*_norm = 2*(d*/res)/hw.
    """
    theta = pose_diff[:, 2]
    dxn = 2.0 * (pose_diff[:, 0] / res) / hw
    dyn = 2.0 * (pose_diff[:, 1] / res) / hw
    c = jnp.cos(-theta)
    s = jnp.sin(-theta)
    row0 = jnp.stack([c, -s, -dyn], axis=-1)
    row1 = jnp.stack([s, c, -dxn], axis=-1)
    return jnp.stack([row0, row1], axis=1)      # [N, 2, 3]


def affine_warp_map(map_feat: jnp.ndarray, pose_diff: jnp.ndarray,
                    res: float = 4.0) -> jnp.ndarray:
    """Warp map feature sequences (ref:UMGen.py:321-354).

    map_feat: [B, T, S, C] with S = H*W (row-major, H == W).
    pose_diff: [B, T, 3] metric ego motion.
    """
    B, T, S, C = map_feat.shape
    H = W = int(round(S ** 0.5))
    feat = map_feat.reshape(B * T, H, W, C)
    mat = build_affine_matrices(pose_diff.reshape(B * T, 3), H, res)
    out = affine_grid_sample(feat, mat)
    return out.reshape(B, T, S, C)

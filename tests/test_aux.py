"""Auxiliary subsystem tests: metrics, token transforms, FSQ, identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.data.token_transform import (
    fourier_encode,
    generate_radius_mask,
    transform_boxes_to_next_frame,
)
from umgen_tpu.data.tokenizers import IdentityTokenizer
from umgen_tpu.models.vq import FSQ
from umgen_tpu.ops.metrics import MMDMetric, mmd_score


class TestMMD:
    def test_identical_distributions_near_zero(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(200, 3))
        y = rng.normal(size=(200, 3))
        assert abs(mmd_score(x, y)) < 0.05

    def test_shifted_distributions_positive(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(200, 3))
        y = rng.normal(size=(200, 3)) + 3.0
        assert mmd_score(x, y) > 0.5

    def test_metric_accumulation(self):
        rng = np.random.default_rng(2)
        m = MMDMetric()
        pred = rng.normal(size=(40, 10))
        real = pred + 0.01
        m.update(pred, np.zeros(40), real, np.zeros(40))
        avg = m.average()
        assert set(avg) == {"posi", "whl", "yaw", "speed", "cat"}
        assert all(v < 0.1 for v in avg.values())


class TestBoxTransform:
    def test_pure_translation(self):
        boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0.0, 1, 0, 0]])
        out = transform_boxes_to_next_frame(boxes, [2.0, 0.0, 0.0])
        np.testing.assert_allclose(out[0, 0], 8.0, atol=1e-5)
        np.testing.assert_allclose(out[0, 6], 0.0, atol=1e-6)

    def test_pure_rotation(self):
        boxes = np.array([[10.0, 0, 0, 4, 2, 1.5, 0.0, 1, 0, 0]])
        out = transform_boxes_to_next_frame(boxes, [0.0, 0.0, np.pi / 2])
        # ego rotated +90°: a point ahead ends up to the right (-y... in
        # the new frame x'=old y, y'=-old x relationship)
        np.testing.assert_allclose(out[0, 0:2], [0.0, -10.0], atol=1e-5)
        np.testing.assert_allclose(out[0, 6], -np.pi / 2, atol=1e-6)
        # velocity rotates the same way
        np.testing.assert_allclose(out[0, 7:9], [0.0, -1.0], atol=1e-5)

    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        boxes = rng.normal(size=(5, 10)).astype(np.float32)
        dx, dy, th = 1.5, -0.3, 0.2
        fwd = transform_boxes_to_next_frame(boxes, [dx, dy, th])
        # inverse motion: se2(m2) = se2(m)^-1 → t2 = -R(-th) t, th2 = -th
        c, s = np.cos(th), np.sin(th)
        inv = [-(c * dx + s * dy), s * dx - c * dy, -th]
        back = transform_boxes_to_next_frame(fwd, inv)
        np.testing.assert_allclose(back[:, 0:3], boxes[:, 0:3], atol=1e-4)
        np.testing.assert_allclose(back[:, 6], boxes[:, 6], atol=1e-5)


def test_radius_mask():
    pos = np.array([[0, 0], [3, 4], [100, 100]], np.float32)
    m = generate_radius_mask(pos, 6.0)
    assert m[0, 1] and m[1, 0] and m[0, 0]
    assert not m[0, 2] and not m[1, 2]


def test_fourier_encode_shape():
    x = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    enc = fourier_encode(x, n_bands=6)
    assert enc.shape == (4, 3 * 13)


class TestFSQ:
    def test_roundtrip_indices(self):
        fsq = FSQ([8, 5, 5, 5])
        assert fsq.n_codes == 1000
        rng = np.random.default_rng(4)
        z = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        zq = fsq.quantize(z)
        idx = fsq.codes_to_indices(zq)
        assert int(idx.min()) >= 0 and int(idx.max()) < fsq.n_codes
        rec = fsq.indices_to_codes(idx)
        np.testing.assert_allclose(np.asarray(rec), np.asarray(zq),
                                   atol=1e-5)


def test_identity_tokenizer():
    tok = IdentityTokenizer(vocab_size=100, seq_len=4, start=10)
    x = np.array([0, 5, 99])
    enc = tok.encode(x)
    np.testing.assert_array_equal(enc, [10, 15, 109])
    np.testing.assert_array_equal(tok.decode(enc), x)


def test_registry():
    from umgen_tpu.registry import MODELS, DATASETS, register_builtins
    register_builtins()
    register_builtins()   # idempotent
    assert "UMGen" in MODELS and "NuPlanTokenDataset" in DATASETS
    from umgen_tpu.config import ModelConfig
    from umgen_tpu.models.umgen import UMGen
    m = MODELS.build({"type": "UMGen",
                      "config": ModelConfig(use_pallas_attention=False
                                            ).scaled("tiny")})
    assert isinstance(m, UMGen)

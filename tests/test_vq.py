import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umgen_tpu.models.vq import (
    IMAGE_VQ,
    MAP_VQ,
    VQConfig,
    decode_code,
    encode_to_indices,
    init_normvq,
)

TINY = VQConfig(n_embed=32, embed_dim=8, z_channels=8, ch=32,
                ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(8,),
                in_channels=5, out_ch=5, resolution=16,
                post_quant_kernel=1)


def test_decode_shapes():
    params = init_normvq(jax.random.PRNGKey(0), TINY)
    idx = np.random.default_rng(0).integers(0, TINY.n_embed, (2, 8, 8))
    out = decode_code(params, TINY, jnp.asarray(idx))
    # ch_mult len 2 → 2x upsample
    assert out.shape == (2, 16, 16, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_encode_shapes_and_range():
    params = init_normvq(jax.random.PRNGKey(0), TINY)
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 5)).astype(
        np.float32)
    idx = encode_to_indices(params, TINY, jnp.asarray(x))
    assert idx.shape == (2, 8, 8)
    assert int(idx.min()) >= 0 and int(idx.max()) < TINY.n_embed


def test_map_image_configs_resolution_factors():
    # map: f8 (32x32 tokens → 256x256), image: f16 (16x32 → 256x512)
    assert 2 ** (MAP_VQ.num_resolutions - 1) == 8
    assert 2 ** (IMAGE_VQ.num_resolutions - 1) == 16


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="upstream reference not mounted")
class TestTorchParity:
    def _build_pair(self):
        import sys
        sys.path.insert(0, "/root/reference")
        import torch
        from projects.tokenizer.vq_model import NormVQModel

        ddconfig = dict(double_z=False, z_channels=TINY.z_channels,
                        resolution=TINY.resolution,
                        in_channels=TINY.in_channels, out_ch=TINY.out_ch,
                        ch=TINY.ch, ch_mult=list(TINY.ch_mult),
                        num_res_blocks=TINY.num_res_blocks,
                        attn_resolutions=list(TINY.attn_resolutions),
                        dropout=0.0)
        torch.manual_seed(0)
        ref = NormVQModel(ddconfig=ddconfig, n_embed=TINY.n_embed,
                          embed_dim=TINY.embed_dim, ckpt_path=None,
                          stride=TINY.post_quant_kernel, padding=0)
        ref.eval()

        from umgen_tpu.runtime.torch_import import import_vq
        params = import_vq(ref.state_dict(), TINY)
        return ref, params

    def test_decode_parity(self):
        import torch
        ref, params = self._build_pair()
        idx = np.random.default_rng(2).integers(0, TINY.n_embed, (2, 8, 8))
        with torch.no_grad():
            theirs = ref.decode_code(torch.from_numpy(idx)).numpy()
        ours = np.asarray(decode_code(params, TINY, jnp.asarray(idx)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), theirs,
                                   atol=2e-4)

    def test_encode_parity(self):
        import torch
        ref, params = self._build_pair()
        x = np.random.default_rng(3).normal(
            size=(2, TINY.in_channels, 16, 16)).astype(np.float32)
        with torch.no_grad():
            _, _, idx_ref = ref.encode(torch.from_numpy(x))
        idx_ours = np.asarray(encode_to_indices(
            params, TINY, jnp.asarray(x.transpose(0, 2, 3, 1))))
        # nearest-code assignment can differ on exact ties; demand >=99%
        agree = (idx_ours.reshape(-1) == idx_ref.numpy().reshape(-1)).mean()
        assert agree >= 0.99, agree


@pytest.mark.slow            # 23 s end-to-end driver; unit coverage of the
def test_train_vq_driver(tmp_path):   # VQ stack stays in the fast tier
    """The VQ training driver (the reference ships pretrained codecs only):
    loss must fall, and the saved checkpoint must load into the inference
    decode path."""
    import jax

    from umgen_tpu.models import vq
    from umgen_tpu.runtime import checkpoint as ckpt
    from umgen_tpu.tools.train_vq import main

    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["--target", "map", "--steps", "12", "--batch_size", "2",
                   "--res", "32", "--ch", "32", "--n_embed", "32",
                   "--ckpt_dir", str(tmp_path), "--log_every", "4"])
    assert rc == 0
    lines = [ln for ln in buf.getvalue().splitlines() if "loss=" in ln]
    first = float(lines[0].split("loss=")[1].split()[0])
    last = float(lines[-1].split("loss=")[1].split()[0])
    assert last < first, (first, last)

    import dataclasses as dc
    cfg = dc.replace(vq.MAP_VQ, resolution=32, ch=32, n_embed=32)
    params = ckpt.load_params(str(tmp_path / "map_final"),
                              like=vq.init_normvq(jax.random.PRNGKey(0),
                                                  cfg))
    idx = jax.numpy.zeros((1, 4, 4), jax.numpy.int32)
    img = vq.decode_code(params, cfg, idx)
    assert img.shape == (1, 32, 32, 5)

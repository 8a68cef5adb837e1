"""Model zoo tests: parameter-count parity with the measured reference sizes
(BASELINE.md), shape contracts, and — when /root/reference is present —
numerical output parity against the reference torch models via the checkpoint
importer (random torch init → state_dict → import → compare forwards)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2lip_tpu.models import (
    Wav2LipGenerator,
    SyncNet,
    QualityDiscriminator,
    S3FD,
)
from wav2lip_tpu.convert import (
    import_generator,
    import_syncnet,
    import_discriminator,
    import_s3fd,
)

REF = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF, "models"))


def param_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def gen_vars():
    model = Wav2LipGenerator()
    audio = jnp.zeros((1, 5, 80, 16, 1))
    faces = jnp.zeros((1, 5, 96, 96, 6))
    return model, jax.jit(model.init)(jax.random.key(0), audio, faces)


@pytest.fixture(scope="module")
def sync_vars():
    model = SyncNet()
    return model, jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 48, 96, 15))
    )


@pytest.fixture(scope="module")
def disc_vars():
    model = QualityDiscriminator()
    return model, jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 5, 96, 96, 3)))


@pytest.fixture(scope="module")
def s3fd_vars():
    model = S3FD()
    return model, jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, 128, 128, 3)))


class TestParamCounts:
    """Counts measured from the reference models (SURVEY.md, BASELINE.md)."""

    def test_generator(self, gen_vars):
        assert param_count(gen_vars[1]["params"]) == 36_298_035

    def test_syncnet(self, sync_vars):
        assert param_count(sync_vars[1]["params"]) == 16_435_072

    def test_discriminator(self, disc_vars):
        assert param_count(disc_vars[1]["params"]) == 14_113_793

    def test_s3fd(self, s3fd_vars):
        assert param_count(s3fd_vars[1]["params"]) == 22_459_110


class TestShapes:
    def test_generator_5d(self, gen_vars):
        model, variables = gen_vars
        out = jax.jit(model.apply)(
            variables, jnp.zeros((2, 5, 80, 16, 1)), jnp.zeros((2, 5, 96, 96, 6))
        )
        assert out.shape == (2, 5, 96, 96, 3)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_generator_4d(self, gen_vars):
        model, variables = gen_vars
        out = jax.jit(model.apply)(
            variables, jnp.zeros((3, 80, 16, 1)), jnp.zeros((3, 96, 96, 6))
        )
        assert out.shape == (3, 96, 96, 3)

    def test_syncnet(self, sync_vars):
        model, variables = sync_vars
        a, v = jax.jit(model.apply)(
            variables, jnp.zeros((2, 80, 16, 1)), jnp.zeros((2, 48, 96, 15))
        )
        assert a.shape == (2, 512) and v.shape == (2, 512)
        r = np.random.default_rng(0)
        a, v = jax.jit(model.apply)(
            variables,
            jnp.asarray(r.standard_normal((2, 80, 16, 1)), jnp.float32),
            jnp.asarray(r.random((2, 48, 96, 15)), jnp.float32),
        )
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)

    def test_discriminator(self, disc_vars):
        model, variables = disc_vars
        out = jax.jit(model.apply)(variables, jnp.zeros((2, 5, 96, 96, 3)))
        assert out.shape == (10, 1)

    def test_s3fd_heads(self, s3fd_vars):
        model, variables = s3fd_vars
        outs = jax.jit(model.apply)(variables, jnp.zeros((1, 128, 128, 3)))
        assert len(outs) == 6
        # strides 4..128 over a 128px input; fc6's pad-3 growth makes the
        # stride-32 head 8x8 rather than 4x4 (reference net_s3fd.py:43).
        expected_hw = [32, 16, 8, 8, 4, 2]
        for (cls, loc), hw in zip(outs, expected_hw):
            assert cls.shape == (1, hw, hw, 2)
            assert loc.shape == (1, hw, hw, 4)

    def test_generator_train_mode_has_bn_updates(self, gen_vars):
        model, variables = gen_vars
        out, mutated = model.apply(
            variables,
            jnp.zeros((1, 5, 80, 16, 1)),
            jnp.zeros((1, 5, 96, 96, 6)),
            train=True,
            mutable=["batch_stats"],
        )
        assert "batch_stats" in mutated


# ---------------------------------------------------------------------------
# Torch parity via the importer (skipped without the reference checkout)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_models():
    if not HAS_REF:
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    import sys

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models import Wav2Lip, Wav2Lip_disc_qual, SyncNet_color
    from face_detection.detection.sfd.net_s3fd import s3fd as S3FDTorch

    torch.manual_seed(0)
    return {
        "torch": torch,
        "Wav2Lip": Wav2Lip,
        "Disc": Wav2Lip_disc_qual,
        "SyncNet": SyncNet_color,
        "S3FD": S3FDTorch,
    }


def to_numpy_sd(torch, model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestTorchParity:
    def test_generator_outputs_match(self, ref_models):
        torch = ref_models["torch"]
        tmodel = ref_models["Wav2Lip"]().eval()
        variables = import_generator(to_numpy_sd(torch, tmodel))

        r = np.random.default_rng(1)
        audio_t = r.standard_normal((2, 5, 1, 80, 16)).astype(np.float32)
        faces_t = r.random((2, 6, 5, 96, 96)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(audio_t), torch.from_numpy(faces_t))
        ref = ref.numpy()  # (B, 3, T, 96, 96)

        audio_j = np.transpose(audio_t, (0, 1, 3, 4, 2))  # (B,T,80,16,1)
        faces_j = np.transpose(faces_t, (0, 2, 3, 4, 1))  # (B,T,96,96,6)
        got = jax.jit(Wav2LipGenerator().apply)(variables, audio_j, faces_j)
        got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))  # → (B,3,T,H,W)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_syncnet_outputs_match(self, ref_models):
        torch = ref_models["torch"]
        tmodel = ref_models["SyncNet"]().eval()
        variables = import_syncnet(to_numpy_sd(torch, tmodel))

        r = np.random.default_rng(2)
        mel_t = r.standard_normal((3, 1, 80, 16)).astype(np.float32)
        face_t = r.random((3, 15, 48, 96)).astype(np.float32)
        with torch.no_grad():
            ref_a, ref_v = tmodel(torch.from_numpy(mel_t), torch.from_numpy(face_t))
        got_a, got_v = jax.jit(SyncNet().apply)(
            variables,
            np.transpose(mel_t, (0, 2, 3, 1)),
            np.transpose(face_t, (0, 2, 3, 1)),
        )
        np.testing.assert_allclose(np.asarray(got_a), ref_a.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(got_v), ref_v.numpy(), atol=2e-5)

    def test_discriminator_outputs_match(self, ref_models):
        torch = ref_models["torch"]
        tmodel = ref_models["Disc"]().eval()
        variables = import_discriminator(to_numpy_sd(torch, tmodel))

        r = np.random.default_rng(3)
        faces_t = r.random((2, 3, 5, 96, 96)).astype(np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(faces_t)).numpy()  # (B*T, 1)
        got = jax.jit(QualityDiscriminator().apply)(
            variables, np.transpose(faces_t, (0, 2, 3, 4, 1))
        )
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5)

    def test_s3fd_outputs_match(self, ref_models):
        torch = ref_models["torch"]
        tmodel = ref_models["S3FD"]().eval()
        # Random-init VGG trunks overflow float32 (identically in both
        # frameworks, making the comparison all-NaN); shrink the conv weights
        # so activations stay finite through the 19-layer trunk.
        with torch.no_grad():
            for name, p in tmodel.named_parameters():
                if name.endswith("weight") and p.ndim == 4:
                    p.mul_(0.2)
        variables = import_s3fd(to_numpy_sd(torch, tmodel))

        r = np.random.default_rng(4)
        img_t = (r.random((1, 3, 160, 128)) * 255 - 115).astype(np.float32)
        with torch.no_grad():
            ref_outs = [o.numpy() for o in tmodel(torch.from_numpy(img_t))]
        got_outs = jax.jit(S3FD().apply)(variables, np.transpose(img_t, (0, 2, 3, 1)))
        assert len(got_outs) * 2 == len(ref_outs)
        for i, (cls, loc) in enumerate(got_outs):
            np.testing.assert_allclose(
                np.transpose(np.asarray(cls), (0, 3, 1, 2)),
                ref_outs[2 * i],
                atol=3e-4,
            )
            np.testing.assert_allclose(
                np.transpose(np.asarray(loc), (0, 3, 1, 2)),
                ref_outs[2 * i + 1],
                atol=3e-4,
            )

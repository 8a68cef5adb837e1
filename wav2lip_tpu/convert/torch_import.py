"""PyTorch ``.pth`` checkpoint importer.

Converts the reference's released checkpoints (and anything trained with the
reference scripts) into this framework's Flax variables:

* strips the ``nn.DataParallel`` ``module.`` key prefix every reference loader
  strips (reference inference.py:174-175, wav2lip_train.py:322-326);
* conv weights OIHW → HWIO;
* transpose-conv weights (Cin, Cout, kH, kW) → pre-flipped HWIO, matching
  :class:`wav2lip_tpu.models.blocks.TorchConvTranspose`'s gradient-of-conv
  formulation: ``kernel[h, w, i, o] = w[i, o, K-1-h, K-1-w]``;
* BatchNorm weight/bias → scale/bias params, running_mean/var → batch_stats.

Channel semantics carry over unchanged (the reference feeds BGR pixel data;
so does this framework's pipeline), so no channel permutation is needed.

The result of each ``import_*`` is a Flax variables dict
``{"params": ..., "batch_stats": ...}`` ready for ``model.apply``.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from wav2lip_tpu.models.generator import (
    FACE_ENCODER_SPEC as GEN_FACE_SPEC,
    AUDIO_ENCODER_SPEC as GEN_AUDIO_SPEC,
    DECODER_SPEC as GEN_DECODER_SPEC,
)
from wav2lip_tpu.models.syncnet import (
    FACE_ENCODER_SPEC as SYNC_FACE_SPEC,
    AUDIO_ENCODER_SPEC as SYNC_AUDIO_SPEC,
)
from wav2lip_tpu.models.discriminator import ENCODER_SPEC as DISC_SPEC


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint file → {clean_key: float32 ndarray}.

    Accepts both full training checkpoints (dict with a ``state_dict`` entry,
    reference wav2lip_train.py:299-304) and bare state dicts.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {
        k.replace("module.", ""): v.detach().cpu().numpy().astype(np.float32)
        for k, v in sd.items()
        if hasattr(v, "detach")
    }


def strip_module_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (Cin, Cout, kH, kW) → pre-flipped HWIO."""
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


class _VarsBuilder:
    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def _set(self, tree: Dict, path: Tuple[str, ...], value: np.ndarray):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def conv(self, sd, tkey: str, fpath: Tuple[str, ...], transpose_conv=False):
        kernel = (_convT_kernel if transpose_conv else _conv_kernel)(
            sd[f"{tkey}.weight"]
        )
        self._set(self.params, fpath + ("kernel",), kernel)
        if f"{tkey}.bias" in sd:
            self._set(self.params, fpath + ("bias",), sd[f"{tkey}.bias"])

    def bn(self, sd, tkey: str, fpath: Tuple[str, ...]):
        self._set(self.params, fpath + ("scale",), sd[f"{tkey}.weight"])
        self._set(self.params, fpath + ("bias",), sd[f"{tkey}.bias"])
        self._set(self.batch_stats, fpath + ("mean",), sd[f"{tkey}.running_mean"])
        self._set(self.batch_stats, fpath + ("var",), sd[f"{tkey}.running_var"])

    def conv_bn_block(self, sd, tkey: str, fname: str, transpose_conv=False):
        """A reference Conv2d/Conv2dTranspose block: ``{tkey}.conv_block.0`` is
        the conv, ``.conv_block.1`` the BatchNorm (models/conv.py:8-11)."""
        self.conv(sd, f"{tkey}.conv_block.0", (fname, "conv"),
                  transpose_conv=transpose_conv)
        self.bn(sd, f"{tkey}.conv_block.1", (fname, "bn"))

    def build(self) -> Dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def import_generator(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``Wav2Lip`` state_dict → Wav2LipGenerator variables."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    for si, stage in enumerate(GEN_FACE_SPEC):
        for li in range(len(stage)):
            b.conv_bn_block(sd, f"face_encoder_blocks.{si}.{li}",
                            f"face_enc_{si}_{li}")
    for li in range(len(GEN_AUDIO_SPEC)):
        b.conv_bn_block(sd, f"audio_encoder.{li}", f"audio_enc_{li}")
    for si, stage in enumerate(GEN_DECODER_SPEC):
        tspec, *convs = stage
        li = 0
        if tspec is not None:
            b.conv_bn_block(sd, f"face_decoder_blocks.{si}.0",
                            f"face_dec_{si}_0", transpose_conv=True)
            li = 1
        for _ in convs:
            b.conv_bn_block(sd, f"face_decoder_blocks.{si}.{li}",
                            f"face_dec_{si}_{li}")
            li += 1
    b.conv_bn_block(sd, "output_block.0", "output_0")
    b.conv(sd, "output_block.1", ("output_1",))
    return b.build()


def import_syncnet(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``SyncNet_color`` state_dict → SyncNet variables."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    for li in range(len(SYNC_FACE_SPEC)):
        b.conv_bn_block(sd, f"face_encoder.{li}", f"face_enc_{li}")
    for li in range(len(SYNC_AUDIO_SPEC)):
        b.conv_bn_block(sd, f"audio_encoder.{li}", f"audio_enc_{li}")
    return b.build()


def import_discriminator(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``Wav2Lip_disc_qual`` state_dict → QualityDiscriminator
    variables (nonorm blocks: conv only, no BN)."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    for si, stage in enumerate(DISC_SPEC):
        for li in range(len(stage)):
            b.conv(sd, f"face_encoder_blocks.{si}.{li}.conv_block.0",
                   (f"face_enc_{si}_{li}", "conv"))
    b.conv(sd, "binary_pred.0", ("binary_pred",))
    return b.build()


_S3FD_CONVS = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3",
    "conv4_1", "conv4_2", "conv4_3",
    "conv5_1", "conv5_2", "conv5_3",
    "fc6", "fc7", "conv6_1", "conv6_2", "conv7_1", "conv7_2",
    "conv3_3_norm_mbox_conf", "conv3_3_norm_mbox_loc",
    "conv4_3_norm_mbox_conf", "conv4_3_norm_mbox_loc",
    "conv5_3_norm_mbox_conf", "conv5_3_norm_mbox_loc",
    "fc7_mbox_conf", "fc7_mbox_loc",
    "conv6_2_mbox_conf", "conv6_2_mbox_loc",
    "conv7_2_mbox_conf", "conv7_2_mbox_loc",
]


def import_s3fd(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``s3fd`` state_dict → S3FD variables (no BN anywhere)."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    for name in _S3FD_CONVS:
        b.conv(sd, name, (name,))
    for name in ("conv3_3_norm", "conv4_3_norm", "conv5_3_norm"):
        b._set(b.params, (name, "weight"), sd[f"{name}.weight"])
    return b.build()


def _fan_conv_block(b: _VarsBuilder, sd, tkey: str, fpath: Tuple[str, ...]):
    """Reference face_detection ConvBlock (models.py:13-31): bn1..conv3 plus
    the optional Sequential(BN, ReLU, Conv) downsample at indices 0 and 2."""
    for i in (1, 2, 3):
        b.bn(sd, f"{tkey}.bn{i}", fpath + (f"bn{i}",))
        b.conv(sd, f"{tkey}.conv{i}", fpath + (f"conv{i}",))
    if f"{tkey}.downsample.0.weight" in sd:
        b.bn(sd, f"{tkey}.downsample.0", fpath + ("downsample_bn",))
        b.conv(sd, f"{tkey}.downsample.2", fpath + ("downsample_conv",))


def import_fan(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``FAN`` state_dict → :class:`wav2lip_tpu.models.FAN`
    variables (face_detection/models.py:145-201; module count inferred from
    the checkpoint's ``m{i}`` keys)."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    b.conv(sd, "conv1", ("conv1",))
    b.bn(sd, "bn1", ("bn1",))
    for name in ("conv2", "conv3", "conv4"):
        _fan_conv_block(b, sd, name, (name,))
    num_modules = 1 + max(
        int(k[1:].split(".", 1)[0]) for k in sd
        if k.startswith("m") and k[1:2].isdigit()
    )
    for i in range(num_modules):
        for lvl in (4, 3, 2, 1):
            _fan_conv_block(b, sd, f"m{i}.b1_{lvl}", (f"m{i}", f"b1_{lvl}"))
            _fan_conv_block(b, sd, f"m{i}.b2_{lvl}", (f"m{i}", f"b2_{lvl}"))
            _fan_conv_block(b, sd, f"m{i}.b3_{lvl}", (f"m{i}", f"b3_{lvl}"))
        _fan_conv_block(b, sd, f"m{i}.b2_plus_1", (f"m{i}", "b2_plus_1"))
        _fan_conv_block(b, sd, f"top_m_{i}", (f"top_m_{i}",))
        b.conv(sd, f"conv_last{i}", (f"conv_last{i}",))
        b.bn(sd, f"bn_end{i}", (f"bn_end{i}",))
        b.conv(sd, f"l{i}", (f"l{i}",))
        if i < num_modules - 1:
            b.conv(sd, f"bl{i}", (f"bl{i}",))
            b.conv(sd, f"al{i}", (f"al{i}",))
    return b.build()


def import_resnet_depth(sd: Mapping[str, np.ndarray]) -> Dict:
    """Reference ``ResNetDepth`` state_dict →
    :class:`wav2lip_tpu.models.ResNetDepth` variables (models.py:204-261).
    Block counts per layer are inferred from the checkpoint keys; the linear
    head's (out, in) weight transposes to Flax's (in, out) kernel."""
    sd = strip_module_prefix(sd)
    b = _VarsBuilder()
    b.conv(sd, "conv1", ("conv1",))
    b.bn(sd, "bn1", ("bn1",))
    for li in range(1, 5):
        blocks = 1 + max(int(k.split(".")[1]) for k in sd
                         if k.startswith(f"layer{li}."))
        for bi in range(blocks):
            t, f = f"layer{li}.{bi}", f"layer{li}_{bi}"
            for i in (1, 2, 3):
                b.conv(sd, f"{t}.conv{i}", (f, f"conv{i}"))
                b.bn(sd, f"{t}.bn{i}", (f, f"bn{i}"))
            if f"{t}.downsample.0.weight" in sd:
                b.conv(sd, f"{t}.downsample.0", (f, "downsample_conv"))
                b.bn(sd, f"{t}.downsample.1", (f, "downsample_bn"))
    b._set(b.params, ("fc", "kernel"), sd["fc.weight"].T)
    b._set(b.params, ("fc", "bias"), sd["fc.bias"])
    return b.build()

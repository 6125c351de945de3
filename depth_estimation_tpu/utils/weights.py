"""Pretrained-weight import: Detectron pkl / Keras h5 / torch state_dict.

Capability counterpart of the reference's cross-framework weight loaders —
`load_detectron_weight` + the name-mapping tables
(`mask-rcnn.pytorch/lib/utils/detectron_weight_helper.py:9-21`,
`lib/modeling/ResNet.py:353-391`) and Keras by-name h5 loading
(`Mask_RCNN/mrcnn/model.py:2103-2160`). Re-designed for the flax backbone:

- Targets ``ResNet(norm='affine')`` (`models/detection/backbone.py`) —
  frozen BatchNorm is imported as a per-channel affine, exactly how
  Detectron executes it (`AffineChannel2d`). Keras/torch checkpoints that
  still carry raw BN statistics are folded analytically
  (``fold_batchnorm``), so the import is numerically exact.
- Layouts: torch/Caffe2 conv kernels are OIHW → transposed to flax HWIO;
  Keras kernels are already HWIO.
- Everything returns plain nested-dict pytrees ready for
  ``model.apply({'params': params}, x)``; no torch/h5py import unless the
  corresponding loader is called (both are optional in this image).

Supported sources:
  ``load_detectron_pkl``  + ``detectron_resnet_params``   (Caffe2 blobs)
  ``load_keras_h5``       + ``keras_resnet_params``       (Matterport names)
  ``load_torch_state_dict`` + ``torch_resnet_params``     (torchvision names)
"""
from __future__ import annotations

import pickle
from typing import Mapping, Sequence

import numpy as np

__all__ = [
    "fold_batchnorm",
    "resnet_import_kwargs",
    "load_detectron_pkl",
    "detectron_resnet_params",
    "load_keras_h5",
    "keras_resnet_params",
    "load_torch_state_dict",
    "torch_resnet_params",
    "torch_vgg16_params",
    "graft_backbone",
]


def resnet_import_kwargs(source: str) -> dict:
    """ResNet constructor kwargs that make imported weights numerically
    exact for each source convention.

    Detectron defaults to stride-on-1×1 (`RESNETS.STRIDE_1X1=True`,
    `lib/modeling/ResNet.py:254`) and Matterport Keras strides branch2a
    (`mrcnn/model.py` `conv_block`); torchvision strides the 3×3. Kernel
    shapes are identical either way, so only the model config — not the
    param tree — changes per source.

    >>> model = ResNet(blocks=..., **resnet_import_kwargs('detectron'))
    """
    if source not in ("detectron", "keras", "torch"):
        raise ValueError(f"unknown weight source {source!r}")
    return {"norm": "affine", "stride_1x1": source in ("detectron", "keras")}


def fold_batchnorm(gamma, beta, mean, var, eps: float = 1e-5, conv_bias=None):
    """Fold BN statistics (+ optional preceding conv bias) into a frozen
    per-channel affine: BN(conv(x)+b) == scale·conv(x) + bias."""
    gamma, beta = np.asarray(gamma), np.asarray(beta)
    mean, var = np.asarray(mean), np.asarray(var)
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    if conv_bias is not None:
        bias = bias + np.asarray(conv_bias) * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _oihw_to_hwio(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0)).astype(np.float32)


def _affine(scale, bias):
    return {"scale": np.asarray(scale, np.float32),
            "bias": np.asarray(bias, np.float32)}


def _assemble(stem_kernel, stem_affine, block_params) -> dict:
    """Nested flax param dict for ResNet(norm='affine') given the stem and
    a list of per-bottleneck dicts (flax auto-names: Conv_0..3 /
    AffineChannel_0..3 in creation order — main branch a,b,c then the
    projection shortcut)."""
    params = {"Conv_0": {"kernel": stem_kernel}, "AffineChannel_0": stem_affine}
    for i, bp in enumerate(block_params):
        params[f"Bottleneck_{i}"] = bp
    return params


def _bottleneck(convs, affines) -> dict:
    out = {}
    for k, (w, aff) in enumerate(zip(convs, affines)):
        out[f"Conv_{k}"] = {"kernel": w}
        out[f"AffineChannel_{k}"] = aff
    return out


# ---------------------------------------------------------------------------
# Detectron / Caffe2 pickles
# ---------------------------------------------------------------------------


def load_detectron_pkl(path) -> dict:
    """Read a Detectron weights pickle → flat blob-name → np.ndarray dict
    (semantics of `detectron_weight_helper.py:9-15`: latin1 encoding,
    optional 'blobs' wrapper)."""
    with open(path, "rb") as fp:
        blobs = pickle.load(fp, encoding="latin1")
    if "blobs" in blobs:
        blobs = blobs["blobs"]
    return {k: np.asarray(v) for k, v in blobs.items() if isinstance(v, np.ndarray)}


def detectron_resnet_params(blobs: Mapping[str, np.ndarray],
                            blocks: Sequence[int] = (3, 4, 6, 3)) -> dict:
    """Map Caffe2 ResNet blobs (`res{s}_{j}_branch2{a,b,c}_w/_bn_s/_bn_b`,
    stem `conv1_w`/`res_conv1_bn_s,b` — `lib/modeling/ResNet.py:353-391`)
    onto ResNet params. Detectron ships BN pre-folded into scale/bias, so
    no statistics folding is needed. Instantiate the model with
    ``resnet_import_kwargs('detectron')`` — Detectron strides the 1×1."""
    stem_kernel = _oihw_to_hwio(blobs["conv1_w"])
    stem_aff = _affine(blobs["res_conv1_bn_s"], blobs["res_conv1_bn_b"])
    out_blocks = []
    for stage, nblocks in enumerate(blocks):
        for j in range(nblocks):
            p = f"res{stage + 2}_{j}_branch"
            convs = [_oihw_to_hwio(blobs[f"{p}2{c}_w"]) for c in "abc"]
            affs = [_affine(blobs[f"{p}2{c}_bn_s"], blobs[f"{p}2{c}_bn_b"])
                    for c in "abc"]
            if f"{p}1_w" in blobs:  # projection shortcut (block 0 of a stage)
                convs.append(_oihw_to_hwio(blobs[f"{p}1_w"]))
                affs.append(_affine(blobs[f"{p}1_bn_s"], blobs[f"{p}1_bn_b"]))
            out_blocks.append(_bottleneck(convs, affs))
    return _assemble(stem_kernel, stem_aff, out_blocks)


# ---------------------------------------------------------------------------
# Keras h5 (Matterport Mask-RCNN naming)
# ---------------------------------------------------------------------------


def load_keras_h5(path) -> dict:
    """Walk an h5 weights file into a flat `path/to/dataset` → array dict
    (layout-agnostic: works for `save_weights` files and full-model files
    with a `model_weights` group)."""
    import h5py

    flat: dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            flat[name] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return flat


def _keras_find(flat: Mapping[str, np.ndarray], layer: str, leaf: str) -> np.ndarray:
    hits = [k for k in flat
            if f"/{layer}/" in f"/{k}" and k.rsplit("/", 1)[-1].startswith(leaf)]
    if not hits:
        raise KeyError(f"no '{leaf}' weight for layer '{layer}' in h5 file")
    return flat[sorted(hits, key=len)[0]]


def keras_resnet_params(flat: Mapping[str, np.ndarray],
                        blocks: Sequence[int] = (3, 4, 6, 3),
                        eps: float = 1e-3) -> dict:
    """Map Matterport Keras ResNet weights (`conv1`/`bn_conv1`,
    `res{s}{letter}_branch2{a,b,c}` + `bn...` — `mrcnn/model.py:171-211`)
    onto ResNet params. Keras kernels are HWIO already; raw BN statistics
    (and Keras conv biases) are folded into the affine. Keras BN default
    eps=1e-3. Instantiate the model with ``resnet_import_kwargs('keras')``
    — Matterport's conv_block strides branch2a (the 1×1)."""

    def conv_and_affine(conv_name, bn_name):
        kernel = np.asarray(_keras_find(flat, conv_name, "kernel"), np.float32)
        try:
            cbias = _keras_find(flat, conv_name, "bias")
        except KeyError:
            cbias = None
        scale, bias = fold_batchnorm(
            _keras_find(flat, bn_name, "gamma"),
            _keras_find(flat, bn_name, "beta"),
            _keras_find(flat, bn_name, "moving_mean"),
            _keras_find(flat, bn_name, "moving_variance"),
            eps=eps, conv_bias=cbias)
        return kernel, _affine(scale, bias)

    stem_kernel, stem_aff = conv_and_affine("conv1", "bn_conv1")
    out_blocks = []
    for stage, nblocks in enumerate(blocks):
        for j in range(nblocks):
            letter = chr(ord("a") + j)
            p = f"{stage + 2}{letter}_branch"
            convs, affs = [], []
            for c in "abc":
                w, aff = conv_and_affine(f"res{p}2{c}", f"bn{p}2{c}")
                convs.append(w)
                affs.append(aff)
            try:
                w, aff = conv_and_affine(f"res{p}1", f"bn{p}1")
                convs.append(w)
                affs.append(aff)
            except KeyError:
                pass  # identity shortcut
            out_blocks.append(_bottleneck(convs, affs))
    return _assemble(stem_kernel, stem_aff, out_blocks)


# ---------------------------------------------------------------------------
# torch state_dicts (torchvision naming)
# ---------------------------------------------------------------------------


def load_torch_state_dict(path) -> dict:
    """Read a torch checkpoint (CPU) → flat name → np.ndarray dict."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def torch_resnet_params(sd: Mapping[str, np.ndarray],
                        blocks: Sequence[int] = (3, 4, 6, 3),
                        eps: float = 1e-5) -> dict:
    """Map torchvision-style ResNet names (`conv1`/`bn1`,
    `layer{s}.{j}.conv{1-3}/bn{1-3}/downsample.{0,1}`) onto ResNet params,
    folding raw BN statistics. Instantiate the model with
    ``resnet_import_kwargs('torch')`` — torchvision strides the 3×3."""

    def affine_of(bn_prefix):
        scale, bias = fold_batchnorm(
            sd[f"{bn_prefix}.weight"], sd[f"{bn_prefix}.bias"],
            sd[f"{bn_prefix}.running_mean"], sd[f"{bn_prefix}.running_var"],
            eps=eps)
        return _affine(scale, bias)

    stem_kernel = _oihw_to_hwio(sd["conv1.weight"])
    stem_aff = affine_of("bn1")
    out_blocks = []
    for stage, nblocks in enumerate(blocks):
        for j in range(nblocks):
            p = f"layer{stage + 1}.{j}"
            convs = [_oihw_to_hwio(sd[f"{p}.conv{i}.weight"]) for i in (1, 2, 3)]
            affs = [affine_of(f"{p}.bn{i}") for i in (1, 2, 3)]
            if f"{p}.downsample.0.weight" in sd:
                convs.append(_oihw_to_hwio(sd[f"{p}.downsample.0.weight"]))
                affs.append(affine_of(f"{p}.downsample.1"))
            out_blocks.append(_bottleneck(convs, affs))
    return _assemble(stem_kernel, stem_aff, out_blocks)


# torchvision `vgg16().features` module indices of the conv layers feeding
# the reference's taps (`crf/features.py:12-22`); maxpools sit between.
_VGG16_TORCH_CONV_IDX = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21))


def torch_vgg16_params(sd: Mapping[str, np.ndarray]) -> dict:
    """Map a torchvision ``vgg16().state_dict()`` onto
    `models.features.VGG16Features` (convs through relu4_3 — the deepest
    tap the reference uses, `crf/features.py:12-22`; later layers are
    dropped). Conv kernels OIHW → HWIO; biases pass through.

    Returns a ``{'params': ...}`` pytree for ``VGG16Features().apply``.
    """
    params = {}
    for s, idxs in enumerate(_VGG16_TORCH_CONV_IDX):
        for c, i in enumerate(idxs):
            params[f"conv{s}_{c}"] = {
                "kernel": _oihw_to_hwio(sd[f"features.{i}.weight"]),
                "bias": np.asarray(sd[f"features.{i}.bias"]),
            }
    return {"params": params}


def graft_backbone(maskrcnn_params: dict, resnet_params: dict) -> dict:
    """Replace the ResNet body inside a MaskRCNN params pytree with
    imported pretrained params (the `load_weights`/`load_detectron_weight`
    fine-tuning entry of the reference, `Mask_RCNN/mrcnn/model.py:
    2103-2160`): FPN/RPN/heads keep their fresh init, the body carries
    the checkpoint.

    The MaskRCNN must be constructed with a matching backbone config —
    ``MaskRCNN(..., backbone_norm='affine', **resnet_import_kwargs(src)``'s
    stride flag, and the checkpoint's ``base_width``. Raises ValueError
    on any leaf shape mismatch (wrong blocks/width/source convention).
    """
    import jax

    body = maskrcnn_params["params"]["ResNetFPN_0"]["ResNet_0"]
    cur = jax.tree.map(lambda x: tuple(np.shape(x)), body)
    new = jax.tree.map(lambda x: tuple(np.shape(x)), resnet_params)
    if cur != new:
        raise ValueError(
            "imported backbone does not match the model's ResNet tree: "
            f"model {cur} vs checkpoint {new}"
        )
    out = dict(maskrcnn_params)
    params = dict(out["params"])
    fpn = dict(params["ResNetFPN_0"])
    fpn["ResNet_0"] = resnet_params
    params["ResNetFPN_0"] = fpn
    out["params"] = params
    return out

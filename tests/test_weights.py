"""Pretrained-weight import tests.

Strategy: build the SAME small bottleneck ResNet in torch (torchvision
naming, raw BatchNorm) with random weights, import its state_dict into the
flax `ResNet(norm='affine')`, and require the activations to match — this
pins the OIHW→HWIO transposes, the BN folding, and the explicit padding
alignment all at once. Detectron-pkl and Keras-h5 mappers are checked to
produce the identical param tree from renamed copies of the same weights.
(Reference counterparts: `lib/utils/detectron_weight_helper.py`,
`mrcnn/model.py:2103-2160`.)
"""
import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depth_estimation_tpu.models.detection.backbone import ResNet
from depth_estimation_tpu.utils import weights as W

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

BLOCKS = (1, 1)
WIDTH = 8


class TorchBottleneck(tnn.Module):
    def __init__(self, cin, width, stride, stride_1x1=False):
        super().__init__()
        s1, s3 = (stride, 1) if stride_1x1 else (1, stride)
        self.conv1 = tnn.Conv2d(cin, width, 1, stride=s1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride=s3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, width * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(width * 4)
        if cin != width * 4 or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, width * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(width * 4),
            )
        else:
            self.downsample = None
        self.relu = tnn.ReLU()

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet(tnn.Module):
    def __init__(self, blocks=BLOCKS, width=WIDTH, stride_1x1=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        cin = width
        for s, n in enumerate(blocks):
            stage = []
            for j in range(n):
                stride = 1 if (s == 0 or j > 0) else 2
                stage.append(TorchBottleneck(cin, width, stride, stride_1x1))
                cin = width * 4
            setattr(self, f"layer{s + 1}", tnn.Sequential(*stage))
            width *= 2

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = []
        for s in range(len(BLOCKS)):
            y = getattr(self, f"layer{s + 1}")(y)
            feats.append(y)
        return feats


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = TorchResNet().eval()
    # randomize BN statistics so folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    return net


def _torch_sd_numpy(net):
    return {k: v.detach().numpy() for k, v in net.state_dict().items()}


def test_torch_import_matches_activations(torch_net):
    x = np.random.RandomState(0).rand(1, 33, 41, 3).astype(np.float32)
    with torch.no_grad():
        want = [f.permute(0, 2, 3, 1).numpy()
                for f in torch_net(torch.from_numpy(x).permute(0, 3, 1, 2))]

    params = W.torch_resnet_params(_torch_sd_numpy(torch_net), blocks=BLOCKS)
    model = ResNet(blocks=BLOCKS, base_width=WIDTH, norm="affine")
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(x))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-4)


def test_stride_1x1_import_matches_activations():
    # Detectron/Keras checkpoints stride the first 1x1 conv (not the 3x3);
    # the import must reproduce THAT network's activations when the flax
    # model is built with resnet_import_kwargs for those sources.
    torch.manual_seed(1)
    net = TorchResNet(stride_1x1=True).eval()
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    x = np.random.RandomState(1).rand(1, 33, 41, 3).astype(np.float32)
    with torch.no_grad():
        want = [f.permute(0, 2, 3, 1).numpy()
                for f in net(torch.from_numpy(x).permute(0, 3, 1, 2))]

    params = W.torch_resnet_params(_torch_sd_numpy(net), blocks=BLOCKS)
    kw = dict(W.resnet_import_kwargs("detectron"))
    assert kw["stride_1x1"] is True and not W.resnet_import_kwargs("torch")["stride_1x1"]
    model = ResNet(blocks=BLOCKS, base_width=WIDTH, **kw)
    got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, jnp.asarray(x))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=1e-4, atol=1e-4)
    # and the two conventions genuinely differ (guards against a no-op flag)
    plain = ResNet(blocks=BLOCKS, base_width=WIDTH, norm="affine")
    other = plain.apply({"params": params}, jnp.asarray(x))
    assert not np.allclose(np.asarray(other[-1]), want[-1], atol=1e-3)


def test_detectron_pkl_import_matches_torch(torch_net, tmp_path):
    sd = _torch_sd_numpy(torch_net)
    # express the same net as pre-folded Detectron blobs
    blobs = {"conv1_w": sd["conv1.weight"]}
    s, b = W.fold_batchnorm(sd["bn1.weight"], sd["bn1.bias"],
                            sd["bn1.running_mean"], sd["bn1.running_var"])
    blobs["res_conv1_bn_s"], blobs["res_conv1_bn_b"] = s, b
    for stage, n in enumerate(BLOCKS):
        for j in range(n):
            tp, dp = f"layer{stage + 1}.{j}", f"res{stage + 2}_{j}_branch"
            for i, c in zip((1, 2, 3), "abc"):
                blobs[f"{dp}2{c}_w"] = sd[f"{tp}.conv{i}.weight"]
                s, b = W.fold_batchnorm(
                    sd[f"{tp}.bn{i}.weight"], sd[f"{tp}.bn{i}.bias"],
                    sd[f"{tp}.bn{i}.running_mean"], sd[f"{tp}.bn{i}.running_var"])
                blobs[f"{dp}2{c}_bn_s"], blobs[f"{dp}2{c}_bn_b"] = s, b
            if f"{tp}.downsample.0.weight" in sd:
                blobs[f"{dp}1_w"] = sd[f"{tp}.downsample.0.weight"]
                s, b = W.fold_batchnorm(
                    sd[f"{tp}.downsample.1.weight"], sd[f"{tp}.downsample.1.bias"],
                    sd[f"{tp}.downsample.1.running_mean"],
                    sd[f"{tp}.downsample.1.running_var"])
                blobs[f"{dp}1_bn_s"], blobs[f"{dp}1_bn_b"] = s, b

    path = tmp_path / "model_final.pkl"
    with open(path, "wb") as fp:
        pickle.dump({"blobs": blobs}, fp)

    got = W.detectron_resnet_params(W.load_detectron_pkl(path), blocks=BLOCKS)
    want = W.torch_resnet_params(_torch_sd_numpy(torch_net), blocks=BLOCKS)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), got, want)


def test_keras_h5_import_matches_torch(torch_net, tmp_path):
    h5py = pytest.importorskip("h5py")
    sd = _torch_sd_numpy(torch_net)
    path = tmp_path / "mask_rcnn.h5"

    def put(f, layer, **leaves):
        g = f.require_group(layer)
        for name, arr in leaves.items():
            g.create_dataset(f"{name}:0", data=np.asarray(arr))

    def put_bn(f, layer, prefix):
        put(f, layer,
            gamma=sd[f"{prefix}.weight"], beta=sd[f"{prefix}.bias"],
            moving_mean=sd[f"{prefix}.running_mean"],
            moving_variance=sd[f"{prefix}.running_var"])

    hwio = lambda w: np.transpose(w, (2, 3, 1, 0))
    with h5py.File(path, "w") as f:
        put(f, "conv1", kernel=hwio(sd["conv1.weight"]))
        put_bn(f, "bn_conv1", "bn1")
        for stage, n in enumerate(BLOCKS):
            for j in range(n):
                tp = f"layer{stage + 1}.{j}"
                kp = f"{stage + 2}{chr(ord('a') + j)}_branch"
                for i, c in zip((1, 2, 3), "abc"):
                    put(f, f"res{kp}2{c}", kernel=hwio(sd[f"{tp}.conv{i}.weight"]))
                    put_bn(f, f"bn{kp}2{c}", f"{tp}.bn{i}")
                if f"{tp}.downsample.0.weight" in sd:
                    put(f, f"res{kp}1",
                        kernel=hwio(sd[f"{tp}.downsample.0.weight"]))
                    put_bn(f, f"bn{kp}1", f"{tp}.downsample.1")

    got = W.keras_resnet_params(W.load_keras_h5(path), blocks=BLOCKS, eps=1e-5)
    want = W.torch_resnet_params(sd, blocks=BLOCKS)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        got, want)


def test_gn_backbone_unchanged_shapes():
    # the norm option must not disturb the default GN path (GroupNorm
    # needs ≥32 channels, so use the real base width here)
    model = ResNet(blocks=BLOCKS, base_width=32)
    x = jnp.zeros((1, 32, 40, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    feats = model.apply({"params": params}, x)
    assert [f.shape for f in feats] == [(1, 8, 10, 128), (1, 4, 5, 256)]


def test_vgg16_import_from_torchvision_names():
    """`torch_vgg16_params` maps torchvision `vgg16().state_dict()` names
    onto VGG16Features; the applied module reproduces a manual conv/relu/
    pool/resize reference computation of the tap stack."""
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.models.features import (
        VGG16_MEAN, VGG16_STD, VGG16Features,
    )
    from depth_estimation_tpu.utils.weights import torch_vgg16_params

    rng = np.random.RandomState(0)
    widths = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
              (256, 256), (256, 256), (256, 512), (512, 512), (512, 512)]
    idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    sd = {}
    for i, (cin, cout) in zip(idxs, widths):
        sd[f"features.{i}.weight"] = rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
        sd[f"features.{i}.bias"] = rng.randn(cout).astype(np.float32) * 0.01
    params = torch_vgg16_params(sd)

    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    out = jax.jit(VGG16Features().apply)(params, img)
    assert out.shape == (16, 16, 64 + 128 + 256 + 512)
    assert np.isfinite(np.asarray(out)).all()

    # manual reference for the FIRST tap (relu1_2): two convs + relus
    x = (np.asarray(img) - VGG16_MEAN) / VGG16_STD
    y = jnp.asarray(x, jnp.float32)[None]
    for i in (0, 2):
        k = jnp.asarray(sd[f"features.{i}.weight"].transpose(2, 3, 1, 0))
        y = jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + sd[f"features.{i}.bias"]
        y = jnp.maximum(y, 0)
    np.testing.assert_allclose(
        np.asarray(out[..., :64]), np.asarray(y[0]), rtol=2e-5, atol=2e-5
    )


def test_graft_backbone_into_maskrcnn(torch_net):
    """Imported pretrained ResNet params graft into a MaskRCNN params
    tree and drive end-to-end inference (the reference's load-COCO-weights
    → detect flow, `mrcnn/model.py:2103-2160` + POC.ipynb cells 2-4)."""
    import jax
    import jax.numpy as jnp

    from depth_estimation_tpu.models.detection.rcnn import MaskRCNN

    sd = _torch_sd_numpy(torch_net)
    imported = W.torch_resnet_params(sd, blocks=BLOCKS)
    model = MaskRCNN(
        num_classes=4, blocks=BLOCKS, fpn_dim=16, num_proposals=8,
        num_detections=4, score_thresh=-1.0,
        backbone_norm="affine", base_width=WIDTH,
        **{"stride_1x1": W.resnet_import_kwargs("torch")["stride_1x1"]},
    )
    img = jnp.asarray(np.random.RandomState(0).rand(64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)
    grafted = W.graft_backbone(params, imported)
    out = jax.jit(model.apply)(grafted, img)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # the graft actually changed the backbone (different body → different
    # RPN scores) while keeping every shape identical
    out0 = jax.jit(model.apply)(params, img)
    assert not np.allclose(
        np.asarray(out["rpn_scores"]), np.asarray(out0["rpn_scores"])
    )

    # wrong width → loud shape error, not silent garbage
    bad = MaskRCNN(num_classes=4, blocks=BLOCKS, fpn_dim=16,
                   backbone_norm="affine", base_width=WIDTH * 2)
    bad_params = bad.init(jax.random.PRNGKey(0), img)
    with pytest.raises(ValueError):
        W.graft_backbone(bad_params, imported)

"""End-to-end parity of the flax trunks + torch checkpoint import against a
torch-functional oracle evaluated on a randomly-generated state_dict.

This validates the whole chain the pretrained-weight path relies on: torch
state_dict layout -> utils.torch_import mapping -> flax module topology ->
numerics (conv padding, BN eval semantics, maxpool, residual wiring, MAC
descriptor extraction)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from cvpce_tpu.models.embedders import MACVGG, MACResNet  # noqa: E402
from cvpce_tpu.models.resnet import ResNet50  # noqa: E402
from cvpce_tpu.ops.image import TANH_IMAGENET_MEAN, TANH_IMAGENET_STD  # noqa: E402
from cvpce_tpu.utils import torch_import as ti  # noqa: E402

RESNET_STAGES = (3, 4, 6, 3)
RESNET_WIDTHS = (64, 128, 256, 512)


def _rand_conv(rng, cout, cin, k):
    w = rng.normal(size=(cout, cin, k, k)) * (2.0 / np.sqrt(cin * k * k)) * 0.5
    return torch.tensor(w.astype(np.float32))


def _rand_bn(rng, sd, prefix, c):
    sd[f"{prefix}.weight"] = torch.tensor(
        rng.uniform(0.5, 1.5, c).astype(np.float32))
    sd[f"{prefix}.bias"] = torch.tensor(
        rng.normal(0, 0.1, c).astype(np.float32))
    sd[f"{prefix}.running_mean"] = torch.tensor(
        rng.normal(0, 0.1, c).astype(np.float32))
    sd[f"{prefix}.running_var"] = torch.tensor(
        rng.uniform(0.5, 1.5, c).astype(np.float32))


def make_resnet50_state_dict(rng):
    sd = {}
    sd["conv1.weight"] = _rand_conv(rng, 64, 3, 7)
    _rand_bn(rng, sd, "bn1", 64)
    cin = 64
    for si, blocks in enumerate(RESNET_STAGES):
        width = RESNET_WIDTHS[si]
        for bi in range(blocks):
            p = f"layer{si + 1}.{bi}"
            sd[f"{p}.conv1.weight"] = _rand_conv(rng, width, cin, 1)
            _rand_bn(rng, sd, f"{p}.bn1", width)
            sd[f"{p}.conv2.weight"] = _rand_conv(rng, width, width, 3)
            _rand_bn(rng, sd, f"{p}.bn2", width)
            sd[f"{p}.conv3.weight"] = _rand_conv(rng, width * 4, width, 1)
            _rand_bn(rng, sd, f"{p}.bn3", width * 4)
            if bi == 0:
                sd[f"{p}.downsample.0.weight"] = _rand_conv(
                    rng, width * 4, cin, 1)
                _rand_bn(rng, sd, f"{p}.downsample.1", width * 4)
            cin = width * 4
    return sd


def torch_resnet50_forward(sd, x):
    def bn(y, p):
        return F.batch_norm(y, sd[f"{p}.running_mean"], sd[f"{p}.running_var"],
                            sd[f"{p}.weight"], sd[f"{p}.bias"], False, 0.0,
                            1e-5)

    feats = {}
    x = F.conv2d(x, sd["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    feats["c1"] = x
    x = F.max_pool2d(x, 3, 2, 1)
    for si, blocks in enumerate(RESNET_STAGES):
        for bi in range(blocks):
            p = f"layer{si + 1}.{bi}"
            stride = 2 if (si > 0 and bi == 0) else 1
            identity = x
            out = F.relu(bn(F.conv2d(x, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
            out = F.relu(bn(F.conv2d(out, sd[f"{p}.conv2.weight"],
                                     stride=stride, padding=1), f"{p}.bn2"))
            out = bn(F.conv2d(out, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
            if f"{p}.downsample.0.weight" in sd:
                identity = bn(
                    F.conv2d(x, sd[f"{p}.downsample.0.weight"], stride=stride),
                    f"{p}.downsample.1")
            x = F.relu(out + identity)
        feats[f"c{si + 2}"] = x
    return feats


VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")


def make_vgg16bn_state_dict(rng):
    sd = {}
    idx = 0
    cin = 3
    for entry in VGG_CFG:
        if entry == "M":
            idx += 1
            continue
        sd[f"features.{idx}.weight"] = _rand_conv(rng, entry, cin, 3)
        sd[f"features.{idx}.bias"] = torch.tensor(
            rng.normal(0, 0.05, entry).astype(np.float32))
        idx += 1
        _rand_bn(rng, sd, f"features.{idx}", entry)
        idx += 2  # bn + relu
        cin = entry
    return sd


def torch_macvgg_forward(sd, x):
    """Reference MACVGG semantics (cvpce/models/classification.py:38-51) on
    a vgg16_bn features state_dict."""
    mean = torch.tensor(TANH_IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(TANH_IMAGENET_STD).view(1, 3, 1, 1)
    x = (x - mean) / std
    idx = 0
    pools = 0
    desc1 = desc2 = None
    for entry in VGG_CFG:
        if entry == "M":
            pools += 1
            if pools == 4:
                desc1 = x.amax(dim=(-2, -1))
            if pools == 5:
                desc2 = x.amax(dim=(-2, -1))
                break
            x = F.max_pool2d(x, 2, 2)
            idx += 1
            continue
        x = F.conv2d(x, sd[f"features.{idx}.weight"],
                     sd[f"features.{idx}.bias"], padding=1)
        idx += 1
        x = F.batch_norm(x, sd[f"features.{idx}.running_mean"],
                         sd[f"features.{idx}.running_var"],
                         sd[f"features.{idx}.weight"],
                         sd[f"features.{idx}.bias"], False, 0.0, 1e-5)
        idx += 2
        x = F.relu(x)
    desc = torch.cat((desc1, desc2), dim=1)
    return desc / desc.norm(dim=1, keepdim=True).clamp(min=1e-8)


class TestResNetParity:
    def test_frozen_resnet_matches_torch(self):
        rng = np.random.default_rng(0)
        sd = make_resnet50_state_dict(rng)
        x = rng.uniform(0, 1, (1, 3, 64, 64)).astype(np.float32)

        want = torch_resnet50_forward(sd, torch.tensor(x))

        variables = ti.import_resnet50(sd, norm="frozen")
        model = ResNet50(norm="frozen")
        got = model.apply(
            {"params": variables["params"], "frozen": variables["frozen"]},
            np.transpose(x, (0, 2, 3, 1)),
        )
        for key in ("c1", "c2", "c3", "c4", "c5"):
            w = want[key].numpy().transpose(0, 2, 3, 1)
            g = np.asarray(got[key])
            assert g.shape == w.shape, key
            # conv accumulation-order noise between XLA and oneDNN grows
            # with depth; a handful of near-cancellation elements can land
            # at ~0.03 abs, so bound the bulk (99.9th pct) and the mean.
            diff = np.abs(g - w)
            assert np.quantile(diff, 0.999) < 2.5e-2, (
                key, float(np.quantile(diff, 0.999)))
            assert diff.mean() < 2e-3, (key, float(diff.mean()))
            assert diff.max() < 0.15, (key, float(diff.max()))

    def test_batch_norm_variant_imports(self):
        rng = np.random.default_rng(1)
        sd = make_resnet50_state_dict(rng)
        variables = ti.import_resnet50(sd, norm="batch")
        model = ResNet50(norm="batch")
        x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        feats = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, x)
        assert feats["c5"].shape == (1, 1, 1, 2048)


class TestMACVGGParity:
    def test_macvgg_matches_torch(self):
        rng = np.random.default_rng(2)
        sd = make_vgg16bn_state_dict(rng)
        x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

        want = torch_macvgg_forward(sd, torch.tensor(x)).numpy()

        variables = ti.import_vgg16_features(sd, batch_norm=True)
        model = MACVGG(batch_norm=True)
        got = np.asarray(model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            np.transpose(x, (0, 2, 3, 1)),
        ))
        assert got.shape == (2, 1024)
        np.testing.assert_allclose(got, want, atol=5e-3, rtol=1e-3)
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0,
                                   atol=1e-5)


class TestMACResNet:
    def test_embedding_size_and_norm(self):
        import jax

        model = MACResNet()
        assert model.embedding_size == 1536
        rng = np.random.default_rng(3)
        x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        emb = np.asarray(model.apply(variables, x))
        assert emb.shape == (1, 1536)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0,
                                   atol=1e-5)

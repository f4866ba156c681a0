"""Parity tests: GoogLeNet and ResNet-18 SeqNets + weight converters vs torch goldens.

torchvision is not installed in this environment, so the goldens are plain-torch
re-implementations of torchvision's architectures with IDENTICAL state_dict key names
(conv1.conv.weight, inception3a.branch2.0.bn.running_mean, layer2.0.downsample.0.weight
...). Random-initialized goldens are converted and compared logit-for-logit in eval
mode — validating both the architecture translation and the converter key mapping,
which is exactly what loading real pretrained weights exercises (reference
utils.py:280 uses torchvision googlenet(pretrained=True)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from sparse_vision_tpu.models.googlenet import (
    INCEPTION_SPECS,
    convert_torchvision_googlenet,
    make_googlenet,
)
from sparse_vision_tpu.models.resnet import convert_torchvision_resnet18, make_resnet18

torch.manual_seed(0)


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class Inception(nn.Module):
    def __init__(self, cin, ch1, ch3r, ch3, ch5r, ch5, proj):
        super().__init__()
        self.branch1 = BasicConv2d(cin, ch1, kernel_size=1)
        self.branch2 = nn.Sequential(
            BasicConv2d(cin, ch3r, kernel_size=1),
            BasicConv2d(ch3r, ch3, kernel_size=3, padding=1),
        )
        self.branch3 = nn.Sequential(
            BasicConv2d(cin, ch5r, kernel_size=1),
            # torchvision's "5x5" branch actually uses a 3x3 kernel
            BasicConv2d(ch5r, ch5, kernel_size=3, padding=1),
        )
        self.branch4 = nn.Sequential(
            nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
            BasicConv2d(cin, proj, kernel_size=1),
        )

    def forward(self, x):
        return torch.cat(
            [self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)], 1
        )


class GoogLeNetGolden(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
        self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.conv2 = BasicConv2d(64, 64, kernel_size=1)
        self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
        self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        cins = {"mixed3a": 192, "mixed3b": 256, "mixed4a": 480, "mixed4b": 512,
                "mixed4c": 512, "mixed4d": 512, "mixed4e": 528, "mixed5a": 832,
                "mixed5b": 832}
        for name, spec in INCEPTION_SPECS.items():
            setattr(self, name.replace("mixed", "inception"), Inception(cins[name], *spec))
        self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
        self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(1024, 1000)

    def forward(self, x):
        x = self.maxpool1(self.conv1(x))
        x = self.maxpool2(self.conv3(self.conv2(x)))
        x = self.inception3b(self.inception3a(x))
        x = self.maxpool3(x)
        x = self.inception4a(x)
        x = self.inception4b(x)
        x = self.inception4c(x)
        x = self.inception4d(x)
        x = self.inception4e(x)
        x = self.maxpool4(x)
        x = self.inception5b(self.inception5a(x))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_googlenet_matches_torch_golden():
    tv = GoogLeNetGolden().eval()
    # make BN stats non-trivial so the converter's running-stat mapping is exercised
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net = make_googlenet()
    params, state = convert_torchvision_googlenet(_np_sd(tv))

    x = np.random.default_rng(0).standard_normal((2, 3, 229, 229)).astype(np.float32)
    with torch.no_grad():
        golden = tv(torch.tensor(x)).numpy()
        golden_3a = tv.inception3a(
            tv.maxpool2(tv.conv3(tv.conv2(tv.maxpool1(tv.conv1(torch.tensor(x))))))
        ).numpy()

    xn = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    logits, taps, _ = net.apply(params, xn, state=state)
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-3, atol=1e-4)
    ours_3a = np.transpose(np.asarray(taps["mixed3a"]), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_3a, golden_3a, rtol=1e-3, atol=1e-4)
    assert taps["mixed3a"].shape == (2, 28, 28, 256)
    assert taps["mixed5b"].shape == (2, 7, 7, 1024)


class BasicBlockGolden(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        out = self.bn2(self.conv2(F.relu(self.bn1(self.conv1(x)))))
        sk = x if self.downsample is None else self.downsample(x)
        return F.relu(out + sk)


class ResNet18Golden(nn.Module):
    def __init__(self, num_classes=200, tiny_stem=True):
        super().__init__()
        if tiny_stem:
            # the reference's surgery: biased 3x3 stride-1 conv, no maxpool
            # (utils.py:253-256)
            self.conv1 = nn.Conv2d(3, 64, 3, stride=1, padding=1)
            self.maxpool = nn.Sequential()
        else:
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.bn1 = nn.BatchNorm2d(64)
        self.layer1 = nn.Sequential(BasicBlockGolden(64, 64), BasicBlockGolden(64, 64))
        self.layer2 = nn.Sequential(BasicBlockGolden(64, 128, 2), BasicBlockGolden(128, 128))
        self.layer3 = nn.Sequential(BasicBlockGolden(128, 256, 2), BasicBlockGolden(256, 256))
        self.layer4 = nn.Sequential(BasicBlockGolden(256, 512, 2), BasicBlockGolden(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


@pytest.mark.parametrize("tiny_stem,size", [(True, 64), (False, 224)])
def test_resnet18_matches_torch_golden(tiny_stem, size):
    tv = ResNet18Golden(tiny_stem=tiny_stem).eval()
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net = make_resnet18(num_classes=200, tiny_imagenet_stem=tiny_stem)
    params, state = convert_torchvision_resnet18(_np_sd(tv), tiny_imagenet_stem=tiny_stem)
    x = np.random.default_rng(1).standard_normal((2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        golden = tv(torch.tensor(x)).numpy()
    logits, taps, _ = net.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state=state
    )
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-3, atol=1e-4)
    if tiny_stem:
        assert taps["layer4.1"].shape == (2, 8, 8, 512)


class BottleneckGolden(nn.Module):
    def __init__(self, cin, width, stride=1):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        sk = x if self.downsample is None else self.downsample(x)
        return F.relu(y + sk)


class ResNet50Golden(nn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for li, (width, blocks, stride) in enumerate(
            [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)], start=1
        ):
            mods = []
            for b in range(blocks):
                mods.append(BottleneckGolden(cin, width, stride if b == 0 else 1))
                cin = width * 4
            setattr(self, f"layer{li}", nn.Sequential(*mods))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return self.fc(torch.flatten(self.avgpool(x), 1))


def test_resnet50_matches_torch_golden():
    from sparse_vision_tpu.models.resnet import convert_torchvision_resnet50, make_resnet50

    tv = ResNet50Golden().eval()
    with torch.no_grad():
        for m in tv.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
    net = make_resnet50()
    params, state = convert_torchvision_resnet50(_np_sd(tv))
    x = np.random.default_rng(3).standard_normal((2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        golden = tv(torch.tensor(x)).numpy()
    logits, taps, _ = net.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), state=state
    )
    np.testing.assert_allclose(np.asarray(logits), golden, rtol=1e-3, atol=1e-4)
    assert taps["layer4.2"].shape == (2, 7, 7, 2048)


def test_label_translation_matches_reference_loop():
    """Golden: re-run the reference's per-element mapping logic (utils.py:2095-2120)
    directly on the shipped label files."""
    import os

    from sparse_vision_tpu.data import labels as L

    old_path = os.path.join(os.path.dirname(L.__file__), "assets", "old_imagenet_labels.txt")
    new_path = os.path.join(os.path.dirname(L.__file__), "assets", "imagenet_labels.txt")
    with open(old_path, encoding="utf-8") as f:
        old_map = {l.split(" ")[0].strip(): cid
                   for cid, l in enumerate(f.read().strip().split("\n"))}
    with open(new_path, encoding="utf-8") as f:
        new_map = {cid: l.split(" ")[0].strip()
                   for cid, l in enumerate(f.read().strip().split("\n"))}

    y = jnp.asarray([0, 1, 5, 42, 998, 999])
    expected = [old_map[new_map[int(v)]] + 1 for v in y]
    got = L.remap_torch_to_tf_labels(y)
    assert got.tolist() == expected
    # full-table sanity: every translated id is valid (no missing-wid sentinels)
    table = L.torch_to_tf_label_table()
    assert int(jnp.min(table)) >= 1 and table.shape == (1000,)


# ---------------------------------------------------------------------------
# GoogLeNet aux classifiers (opt-in heads; torchvision InceptionAux semantics)
# ---------------------------------------------------------------------------


class InceptionAux(nn.Module):
    """Plain-torch replication of torchvision's InceptionAux with identical
    state_dict key names (torchvision googlenet.py)."""

    def __init__(self, cin, num_classes):
        super().__init__()
        self.conv = BasicConv2d(cin, 128, kernel_size=1)
        self.fc1 = nn.Linear(2048, 1024)
        self.fc2 = nn.Linear(1024, num_classes)

    def forward(self, x):
        x = F.adaptive_avg_pool2d(x, (4, 4))
        x = self.conv(x)
        x = torch.flatten(x, 1)
        x = F.relu(self.fc1(x))
        # eval mode: dropout(0.7) is identity
        return self.fc2(x)


def test_googlenet_aux_matches_torch():
    from sparse_vision_tpu.models.googlenet import (
        AUX_TAPS,
        apply_googlenet_aux,
        convert_torchvision_googlenet_aux,
    )

    torch.manual_seed(3)
    num_classes = 17
    heads = {name: InceptionAux(cin, num_classes).eval()
             for name, (_, cin) in AUX_TAPS.items()}
    sd = {}
    for name, head in heads.items():
        for k, v in head.state_dict().items():
            sd[f"{name}.{k}"] = v.numpy()
    params, state = convert_torchvision_googlenet_aux(sd)

    rng = np.random.default_rng(4)
    taps = {}
    torch_out = {}
    with torch.no_grad():
        for name, (tap, cin) in AUX_TAPS.items():
            x = rng.normal(size=(2, 14, 14, cin)).astype(np.float32)
            taps[tap] = jnp.asarray(x)
            torch_out[name] = heads[name](
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy()
    ours = apply_googlenet_aux(params, state, taps)
    for name in AUX_TAPS:
        np.testing.assert_allclose(
            np.asarray(ours[name]), torch_out[name], rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_googlenet_aux_random_init_shapes():
    from sparse_vision_tpu.models.googlenet import (
        apply_googlenet_aux,
        init_googlenet_aux,
    )

    params, state = init_googlenet_aux(jax.random.key(0), num_classes=1000)
    taps = {
        "mixed4a": jnp.zeros((2, 14, 14, 512)),
        "mixed4d": jnp.zeros((2, 14, 14, 528)),
    }
    out = apply_googlenet_aux(params, state, taps)
    assert out["aux1"].shape == (2, 1000) and out["aux2"].shape == (2, 1000)

"""Converter validation for the three thirdparty supervisor nets
(train.py:502-528): torch mirrors with the published state-dict layouts are
built inline, randomized, converted via ``supervisors/convert.py``, and the
flax ports must reproduce their outputs. The actual submodules are empty in
the reference checkout, so the torch mirrors encode the published upstream
layouts (facenet-pytorch InceptionResnetV1; PFLD-pytorch PFLDInference;
resnet18-encoder UNet with the ``ResNetUNet(n_class)`` signature
train.py:505 constructs); any transpose/BN/depthwise conversion bug fails
these tests.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _rand_bn(bn, g):
    with torch.no_grad():
        c = bn.num_features
        bn.running_mean = torch.randn(c, generator=g) * 0.1
        bn.running_var = torch.rand(c, generator=g) * 0.6 + 0.7
        bn.weight.copy_(torch.rand(c, generator=g) * 0.5 + 0.75)
        bn.bias.copy_(torch.randn(c, generator=g) * 0.1)


def _randomize(net, seed):
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, (tnn.BatchNorm2d, tnn.BatchNorm1d)):
            _rand_bn(m, g)


# ---------------------------------------------------------------------------
# face_normals ResNetUNet (resnet18-encoder UNet)
# ---------------------------------------------------------------------------


class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + idn)


def _convrelu(cin, cout, k, p):
    return tnn.Sequential(tnn.Conv2d(cin, cout, k, padding=p), tnn.ReLU())


class TResNetUNet(tnn.Module):
    def __init__(self, n_class=3):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.layer1 = tnn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TBasicBlock(64, 128, 2),
                                     TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TBasicBlock(128, 256, 2),
                                     TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TBasicBlock(256, 512, 2),
                                     TBasicBlock(512, 512))
        self.layer0_1x1 = _convrelu(64, 64, 1, 0)
        self.layer1_1x1 = _convrelu(64, 64, 1, 0)
        self.layer2_1x1 = _convrelu(128, 128, 1, 0)
        self.layer3_1x1 = _convrelu(256, 256, 1, 0)
        self.layer4_1x1 = _convrelu(512, 512, 1, 0)
        self.conv_up3 = _convrelu(256 + 512, 512, 3, 1)
        self.conv_up2 = _convrelu(128 + 512, 256, 3, 1)
        self.conv_up1 = _convrelu(64 + 256, 256, 3, 1)
        self.conv_up0 = _convrelu(64 + 256, 128, 3, 1)
        self.conv_original_size0 = _convrelu(3, 64, 3, 1)
        self.conv_original_size1 = _convrelu(64, 64, 3, 1)
        self.conv_original_size2 = _convrelu(64 + 128, 64, 3, 1)
        self.conv_last = tnn.Conv2d(64, n_class, 1)

    def forward(self, x):
        up = tnn.Upsample(scale_factor=2, mode="bilinear",
                          align_corners=True)
        xo = self.conv_original_size1(self.conv_original_size0(x))
        l0 = F.relu(self.bn1(self.conv1(x)))
        p = F.max_pool2d(l0, 3, 2, 1)
        l1 = self.layer1(p)
        l2 = self.layer2(l1)
        l3 = self.layer3(l2)
        l4 = self.layer4(l3)
        y = up(self.layer4_1x1(l4))
        y = self.conv_up3(torch.cat([y, self.layer3_1x1(l3)], 1))
        y = self.conv_up2(torch.cat([up(y), self.layer2_1x1(l2)], 1))
        y = self.conv_up1(torch.cat([up(y), self.layer1_1x1(l1)], 1))
        y = self.conv_up0(torch.cat([up(y), self.layer0_1x1(l0)], 1))
        y = self.conv_original_size2(torch.cat([up(y), xo], 1))
        return self.conv_last(y)


def test_face_normals_converter():
    from stylerenderer_tpu.supervisors.convert import convert_face_normals
    from stylerenderer_tpu.supervisors.face_normals import ResNetUNet

    torch.manual_seed(0)
    tnet = TResNetUNet(3).eval()
    _randomize(tnet, 1)
    params = convert_face_normals(tnet.state_dict())

    x = np.random.RandomState(2).rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    _, raw = ResNetUNet(3).apply({"params": params}, jnp.asarray(x))
    got = np.asarray(raw).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# PFLD
# ---------------------------------------------------------------------------


class TInvertedResidual(tnn.Module):
    def __init__(self, inp, oup, stride, use_res, expand):
        super().__init__()
        self.use_res_connect = use_res and stride == 1 and inp == oup
        hid = inp * expand
        self.conv = tnn.Sequential(
            tnn.Conv2d(inp, hid, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(hid),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(hid, hid, 3, stride, 1, groups=hid, bias=False),
            tnn.BatchNorm2d(hid),
            tnn.ReLU(inplace=True),
            tnn.Conv2d(hid, oup, 1, 1, 0, bias=False),
            tnn.BatchNorm2d(oup),
        )

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res_connect else y


class TPFLD(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.conv2 = tnn.Conv2d(64, 64, 3, 1, 1, groups=64, bias=False)
        self.bn2 = tnn.BatchNorm2d(64)
        self.conv3_1 = TInvertedResidual(64, 64, 2, False, 2)
        for i in range(2, 6):
            setattr(self, f"block3_{i}", TInvertedResidual(64, 64, 1, True, 2))
        self.conv4_1 = TInvertedResidual(64, 128, 2, False, 2)
        self.conv5_1 = TInvertedResidual(128, 128, 1, False, 4)
        for i in range(2, 7):
            setattr(self, f"block5_{i}",
                    TInvertedResidual(128, 128, 1, True, 4))
        self.conv6_1 = TInvertedResidual(128, 16, 1, False, 2)
        self.conv7 = tnn.Sequential(
            tnn.Conv2d(16, 32, 3, 2, 1, bias=False), tnn.BatchNorm2d(32),
            tnn.ReLU(inplace=True),
        )
        self.conv8 = tnn.Conv2d(32, 128, 7, 1, 0)
        self.fc = tnn.Linear(176, 136)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.conv3_1(x)
        for i in range(2, 6):
            x = getattr(self, f"block3_{i}")(x)
        x = self.conv4_1(x)
        x = self.conv5_1(x)
        for i in range(2, 7):
            x = getattr(self, f"block5_{i}")(x)
        x = self.conv6_1(x)
        x1 = F.avg_pool2d(x, x.shape[2]).flatten(1)
        x = self.conv7(x)
        x2 = F.avg_pool2d(x, x.shape[2]).flatten(1)
        x3 = F.relu(self.conv8(x)).flatten(1)
        return self.fc(torch.cat([x1, x2, x3], 1))


def test_pfld_converter():
    from stylerenderer_tpu.supervisors.convert import convert_pfld
    from stylerenderer_tpu.supervisors.landmark import PFLDInference

    torch.manual_seed(3)
    tnet = TPFLD().eval()
    _randomize(tnet, 4)
    # wrapped exactly as the published checkpoint (train.py:515-517)
    params = convert_pfld({"state_dict": tnet.state_dict()})

    x = np.random.RandomState(5).rand(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(PFLDInference().apply({"params": params},
                                           jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# facenet InceptionResnetV1
# ---------------------------------------------------------------------------


class TConvBN(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride, padding, bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class TBlock35(tnn.Module):
    def __init__(self, scale=0.17):
        super().__init__()
        self.scale = scale
        self.branch0 = TConvBN(256, 32, 1)
        self.branch1 = tnn.Sequential(TConvBN(256, 32, 1),
                                      TConvBN(32, 32, 3, 1, 1))
        self.branch2 = tnn.Sequential(TConvBN(256, 32, 1),
                                      TConvBN(32, 32, 3, 1, 1),
                                      TConvBN(32, 32, 3, 1, 1))
        self.conv2d = tnn.Conv2d(96, 256, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock17(tnn.Module):
    def __init__(self, scale=0.10):
        super().__init__()
        self.scale = scale
        self.branch0 = TConvBN(896, 128, 1)
        self.branch1 = tnn.Sequential(
            TConvBN(896, 128, 1),
            TConvBN(128, 128, (1, 7), 1, (0, 3)),
            TConvBN(128, 128, (7, 1), 1, (3, 0)),
        )
        self.conv2d = tnn.Conv2d(256, 896, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        return F.relu(x + self.scale * self.conv2d(up))


class TBlock8(tnn.Module):
    def __init__(self, scale=0.20, noReLU=False):
        super().__init__()
        self.scale = scale
        self.noReLU = noReLU
        self.branch0 = TConvBN(1792, 192, 1)
        self.branch1 = tnn.Sequential(
            TConvBN(1792, 192, 1),
            TConvBN(192, 192, (1, 3), 1, (0, 1)),
            TConvBN(192, 192, (3, 1), 1, (1, 0)),
        )
        self.conv2d = tnn.Conv2d(384, 1792, 1)

    def forward(self, x):
        up = torch.cat([self.branch0(x), self.branch1(x)], 1)
        y = x + self.scale * self.conv2d(up)
        return y if self.noReLU else F.relu(y)


class TMixed6a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = TConvBN(256, 384, 3, 2)
        self.branch1 = tnn.Sequential(TConvBN(256, 192, 1),
                                      TConvBN(192, 192, 3, 1, 1),
                                      TConvBN(192, 256, 3, 2))

    def forward(self, x):
        return torch.cat(
            [self.branch0(x), self.branch1(x), F.max_pool2d(x, 3, 2)], 1)


class TMixed7a(tnn.Module):
    def __init__(self):
        super().__init__()
        self.branch0 = tnn.Sequential(TConvBN(896, 256, 1),
                                      TConvBN(256, 384, 3, 2))
        self.branch1 = tnn.Sequential(TConvBN(896, 256, 1),
                                      TConvBN(256, 256, 3, 2))
        self.branch2 = tnn.Sequential(TConvBN(896, 256, 1),
                                      TConvBN(256, 256, 3, 1, 1),
                                      TConvBN(256, 256, 3, 2))

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x),
                          F.max_pool2d(x, 3, 2)], 1)


class TFacenet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv2d_1a = TConvBN(3, 32, 3, 2)
        self.conv2d_2a = TConvBN(32, 32, 3)
        self.conv2d_2b = TConvBN(32, 64, 3, 1, 1)
        self.conv2d_3b = TConvBN(64, 80, 1)
        self.conv2d_4a = TConvBN(80, 192, 3)
        self.conv2d_4b = TConvBN(192, 256, 3, 2)
        self.repeat_1 = tnn.Sequential(*[TBlock35() for _ in range(5)])
        self.mixed_6a = TMixed6a()
        self.repeat_2 = tnn.Sequential(*[TBlock17() for _ in range(10)])
        self.mixed_7a = TMixed7a()
        self.repeat_3 = tnn.Sequential(*[TBlock8() for _ in range(5)])
        self.block8 = TBlock8(noReLU=True)
        self.last_linear = tnn.Linear(1792, 512, bias=False)
        self.last_bn = tnn.BatchNorm1d(512, eps=0.001)

    def forward(self, x):
        x = self.conv2d_1a(x)
        x = self.conv2d_2a(x)
        x = self.conv2d_2b(x)
        x = F.max_pool2d(x, 3, 2)
        x = self.conv2d_3b(x)
        x = self.conv2d_4a(x)
        x = self.conv2d_4b(x)
        x = self.repeat_1(x)
        x = self.mixed_6a(x)
        x = self.repeat_2(x)
        x = self.mixed_7a(x)
        x = self.repeat_3(x)
        x = self.block8(x)
        x = F.adaptive_avg_pool2d(x, 1).flatten(1)
        x = self.last_bn(self.last_linear(x))
        return F.normalize(x, p=2, dim=1)


def test_facenet_converter():
    from stylerenderer_tpu.supervisors.convert import convert_facenet
    from stylerenderer_tpu.supervisors.recognition import InceptionResnetV1

    torch.manual_seed(6)
    tnet = TFacenet().eval()
    _randomize(tnet, 7)
    params = convert_facenet(tnet.state_dict())

    x = np.random.RandomState(8).rand(2, 112, 112, 3).astype(
        np.float32) * 2 - 1
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(InceptionResnetV1().apply({"params": params},
                                               jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)

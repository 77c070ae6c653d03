"""Numeric cross-validation of the eval ports against the reference torch
semantics (VERDICT r2 missing #2).

The reference's own modules (``/root/reference/inception.py``,
``/root/reference/lpips/``) import torchvision, which is not installed in
this image — so each test builds a minimal *torch* mirror of the reference
architecture inline (same module names, so ``state_dict()`` keys match the
torchvision naming the converters consume), randomizes its weights, converts
them with the package's own torch->flax converters, and asserts the flax
ports produce the same features/distances. Any converter transpose bug,
padding mismatch, BN-eps drift, or pool-semantics error fails these tests —
which is exactly what would silently void FID/PPL parity the day published
weights are dropped in.

Mirrored semantics (cited):
- FID InceptionV3: /root/reference/inception.py:87-310 — torchvision
  inception_v3 topology with the FID patches (InceptionA/C/E avg-pool
  branches use count_include_pad=False; Mixed_7c pool branch is a max-pool),
  BasicConv2d = Conv2d(bias=False) + BatchNorm2d(eps=0.001) + relu.
- LPIPS PNetLin: /root/reference/lpips/networks_basic.py:64-92 — ScalingLayer
  shift/scale, VGG16 relu{1_2,2_2,3_3,4_3,5_3} taps
  (lpips/pretrained_networks.py:9-45), unit-normalized feature diffs^2,
  1x1 non-negative linear head, spatial average, sum over layers.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _seed_all(seed=0):
    torch.manual_seed(seed)
    np.random.seed(seed)


# ---------------------------------------------------------------------------
# torch mirror of the FID InceptionV3 (reference inception.py:87-310)
# ---------------------------------------------------------------------------


class TBasicConv2d(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _fid_avgpool(x):
    # the FID patch: count_include_pad=False (reference inception.py:95,118
    # FIDInceptionA/C/E forward)
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_fid_avgpool(x))
        return torch.cat([b1, b5, b3, bp], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_fid_avgpool(x))
        return torch.cat([b1, b7, bd, bp], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool
        self.branch1x1 = TBasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = TBasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "max":
            # FIDInceptionE_2 (reference inception.py:139-166)
            bp = F.max_pool2d(x, kernel_size=3, stride=1, padding=1)
        else:
            bp = _fid_avgpool(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TFIDInception(tnn.Module):
    """pool3 feature extractor, mirroring reference inception.py:33-85 block
    layout with module names matching the torchvision/FID state-dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg")
        self.Mixed_7c = TInceptionE(2048, "max")

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))  # pool3 [B, 2048]


def _randomize_bn_stats(net, seed=0):
    """Give BN layers non-trivial running stats + affine params so a BN
    mean/var/scale/bias converter swap cannot cancel out."""
    g = torch.Generator().manual_seed(seed)
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            c = m.num_features
            m.running_mean = torch.randn(c, generator=g) * 0.1
            m.running_var = torch.rand(c, generator=g) * 1.0 + 0.5
            with torch.no_grad():
                m.weight.copy_(torch.rand(c, generator=g) * 0.5 + 0.75)
                m.bias.copy_(torch.randn(c, generator=g) * 0.1)


def test_fid_inception_matches_torch_reference(tmp_path):
    from stylerenderer_tpu.eval.inception import (
        InceptionV3, load_torch_inception_weights,
    )

    _seed_all(0)
    tnet = TFIDInception().eval()
    _randomize_bn_stats(tnet, 1)
    ckpt = tmp_path / "incep_random.pth"
    torch.save(tnet.state_dict(), str(ckpt))

    # 96x96 input (>= the 75px topology minimum), resize disabled on both
    # sides so only the conv/pool/BN semantics are under test
    x = np.random.RandomState(2).rand(2, 96, 96, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = InceptionV3(resize_input=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))[
        "params"]
    params = load_torch_inception_weights(str(ckpt), params)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    assert got.shape == ref.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_bilinear_resize_matches_torch():
    """The 299x299 input resize: jax.image.resize('bilinear') vs torch
    F.interpolate(align_corners=False) — both half-pixel-center bilinear;
    upsampling applies no antialias filter on either side."""
    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=(299, 299), mode="bilinear",
                        align_corners=False).numpy()
    got = np.asarray(jax.image.resize(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (1, 299, 299, 3), "bilinear"
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# torch mirror of LPIPS PNetLin(vgg) (reference lpips/networks_basic.py:64-92)
# ---------------------------------------------------------------------------


class TVGG16Features(tnn.Module):
    """torchvision vgg16 .features trunk with the LPIPS slice taps
    (reference lpips/pretrained_networks.py:9-45: relu1_2, relu2_2, relu3_3,
    relu4_3, relu5_3). Module named `features` so state_dict() keys are
    exactly the torchvision `features.{idx}.weight` names _load_backbone
    consumes."""

    CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
           "M", 512, 512, 512)
    TAPS = (3, 8, 15, 22, 29)  # layer indices of the tapped relus

    def __init__(self):
        super().__init__()
        layers = []
        cin = 3
        for v in self.CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers.append(tnn.Conv2d(cin, v, 3, padding=1))
                layers.append(tnn.ReLU())
                cin = v
        self.features = tnn.Sequential(*layers)

    def forward(self, x):
        taps = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in self.TAPS:
                taps.append(x)
        return taps


def _t_normalize(f, eps=1e-10):
    # reference lpips/networks_basic.py normalize_tensor:
    # f / (sqrt(sum f^2) + eps)
    n = torch.sqrt(torch.sum(f ** 2, dim=1, keepdim=True))
    return f / (n + eps)


def _t_pnetlin(backbone, lins, x0, x1):
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    f0 = backbone((x0 - shift) / scale)
    f1 = backbone((x1 - shift) / scale)
    total = 0.0
    for a, b, w in zip(f0, f1, lins):
        d = (_t_normalize(a) - _t_normalize(b)) ** 2
        # NetLinLayer: 1x1 conv, bias-free (networks_basic.py:96-106)
        val = torch.sum(d * w.view(1, -1, 1, 1), dim=1)
        total = total + val.mean(dim=(1, 2))
    return total


def test_lpips_matches_torch_reference(tmp_path):
    from stylerenderer_tpu.eval.lpips import load_lpips

    _seed_all(3)
    tnet = TVGG16Features().eval()
    ckpt = tmp_path / "vgg_random.pth"
    torch.save(tnet.state_dict(), str(ckpt))

    # non-negative heads: published LPIPS heads are non-negative; the flax
    # port enforces relu(w), the reference applies w as-is — they only agree
    # on the non-negative domain, which is the deployed one
    chans = (64, 128, 256, 512, 512)
    g = torch.Generator().manual_seed(4)
    lins = [torch.rand(c, generator=g) * (2.0 / c) for c in chans]
    lin_sd = {f"lin{i}.model.1.weight": w.view(1, -1, 1, 1)
              for i, w in enumerate(lins)}
    lin_path = tmp_path / "lin_random.pth"
    torch.save(lin_sd, str(lin_path))

    x0 = np.random.RandomState(5).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    x1 = np.random.RandomState(6).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = _t_pnetlin(
            tnet,
            lins,
            torch.from_numpy(x0.transpose(0, 3, 1, 2)),
            torch.from_numpy(x1.transpose(0, 3, 1, 2)),
        ).numpy()

    apply_fn, params = load_lpips(
        "vgg", backbone_weights=str(ckpt), linear_weights=str(lin_path)
    )
    got = np.asarray(apply_fn(params, jnp.asarray(x0), jnp.asarray(x1)))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_lpips_identical_images_zero():
    from stylerenderer_tpu.eval.lpips import load_lpips

    apply_fn, params = load_lpips("vgg")
    x = jnp.asarray(
        np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32))
    d = np.asarray(apply_fn(params, x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)

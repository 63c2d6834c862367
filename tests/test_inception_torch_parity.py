"""End-to-end InceptionV3 parity vs an independent torch implementation.

VERDICT r2 missing #1 / next-round #3: the JAX FID-variant InceptionV3
(`fpqvar_tpu/eval/inception.py`) had only primitive-level torch checks; a
whole-network cross-check is the achievable de-risk for the known
FID-reimplementation trap (SURVEY.md §7) in this zero-egress image (no real
Inception weights exist here; torchvision is absent).

This file builds the SAME architecture as torch ``nn.Module``s — the
torchvision ``inception_v3`` structure with pytorch-fid's FID quirks
(count_include_pad=False avg pools, Mixed_7c max-pool branch, 1008-way fc)
— re-derived from the published structure, using torch's own conv / BN /
pool kernels.  Its randomly-initialized state dict feeds
``convert_inception_state_dict``, so the test covers BOTH the converter's
key mapping and every layer's stride/padding/channel plumbing, tap
placement included.  Reference taps: `openai_evaluator.py:23-24`
(pool_3 + spatial mixed_6/conv[..., :7]) and the 1008-way softmax (:178).
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from fpqvar_tpu.eval import inception as I


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def avg_pool_fid(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(avg_pool_fid(x))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(avg_pool_fid(x))
        return torch.cat([b1, b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class InceptionE(nn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.pool = pool            # "avg" (Mixed_7b) or "max" (Mixed_7c)
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool == "avg":
            bp = avg_pool_fid(x)
        else:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class TorchFIDInception(nn.Module):
    """torchvision inception_v3 structure with the pytorch-fid FID quirks;
    returns the same three taps as ``inception_features``."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280, pool="avg")
        self.Mixed_7c = InceptionE(2048, pool="max")
        self.fc = nn.Linear(2048, I.NUM_CLASSES)

    def forward(self, img01):
        x = img01 * 2.0 - 1.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        spatial = self.Mixed_6d.branch1x1(x)[:, :I.SPATIAL_CHANNELS]
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        pool3 = F.adaptive_avg_pool2d(x, (1, 1)).flatten(1)
        probs = F.softmax(self.fc(pool3), dim=-1)
        return pool3, spatial.flatten(1), probs


@pytest.fixture(scope="module")
def torch_model():
    m = TorchFIDInception().eval()
    g = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.Conv2d):
                fan_in = mod.weight[0].numel()
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g)
                                 / fan_in ** 0.5)
            elif isinstance(mod, nn.BatchNorm2d):
                # nontrivial running stats so the eval-BN math is exercised
                mod.weight.copy_(0.5 + torch.rand(mod.weight.shape,
                                                  generator=g))
                mod.bias.copy_(0.1 * torch.randn(mod.bias.shape, generator=g))
                mod.running_mean.copy_(
                    0.1 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(
                    0.5 + torch.rand(mod.running_var.shape, generator=g))
            elif isinstance(mod, nn.Linear):
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g)
                                 / 45.0)
                mod.bias.zero_()
    return m


def test_full_network_parity(torch_model):
    """Random-weight architecture + converter parity: the torch state dict
    converts and both forwards agree on all three feature taps."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    params = I.convert_inception_state_dict(sd)

    rng = np.random.default_rng(42)
    imgs = rng.uniform(size=(2, 3, 299, 299)).astype(np.float32)

    with torch.no_grad():
        tp3, tsp, tpr = torch_model(torch.from_numpy(imgs))
    jp3, jsp, jpr = I.inception_features(params, jnp.asarray(imgs),
                                         resize=False)

    np.testing.assert_allclose(np.asarray(jp3), tp3.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jsp), tsp.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(jpr), tpr.numpy(),
                               rtol=2e-3, atol=1e-5)


def test_resized_input_parity(torch_model):
    """256x256 inputs (the eval pipeline's actual image size) through both
    resize paths: torch bilinear align_corners=False == jax.image 'bilinear'."""
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()
          if "num_batches_tracked" not in k}
    params = I.convert_inception_state_dict(sd)
    rng = np.random.default_rng(7)
    imgs = rng.uniform(size=(2, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        up = F.interpolate(torch.from_numpy(imgs), size=(299, 299),
                           mode="bilinear", align_corners=False)
        tp3, _, _ = torch_model(up)
    jp3, _, _ = I.inception_features(params, jnp.asarray(imgs), resize=True)
    np.testing.assert_allclose(np.asarray(jp3), tp3.numpy(),
                               rtol=5e-3, atol=2e-4)

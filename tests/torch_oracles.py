"""Independent torch oracles for the metric feature extractors.

These re-state the torchvision `Inception3` / `VGG16` architectures in plain
torch (torchvision itself is not installed here), written directly from the
published torchvision definitions — NOT derived from rick_tpu's specs — so a
wrong pad / stride / BN-eps / pooling convention on either side breaks the
parity tests in test_metrics_oracle.py.

Reference wrappers being replicated:
  * FID extractor: `gan_training/metrics/inception.py:83-106` — F.upsample to
    299 bilinear (align_corners=False), [-1,1] -> ImageNet remap, trunk to the
    final adaptive avg pool (2048-d "pool3").
  * P&R extractor: `gan_metrics/precision_recall.py:124-151` — F.interpolate
    to 224 (default NEAREST), no renormalization, vgg16.features ->
    classifier[:4] (4096-d fc2, pre-ReLU).
  * LPIPS: the `lpips` package with net='vgg' (`gan_training/eval.py:112`).

Weights load from rick_tpu's flat (torchvision state-dict keyed) param dicts,
so both sides run IDENTICAL random weights.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn


def _t(arr, dtype):
    return torch.as_tensor(np.asarray(arr), dtype=dtype)


# ---------------------------------------------------------------------------
# Inception3 (torchvision architecture, eval mode, aux logits dropped)
# ---------------------------------------------------------------------------


class _BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=0.001) + relu."""

    def __init__(self, in_ch, out_ch, **kwargs):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, bias=False, **kwargs)
        self.bn = nn.BatchNorm2d(out_ch, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class _InceptionA(nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = _BasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = _BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = _BasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b5, b3, bp], 1)


class _InceptionB(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = _BasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = _BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class _InceptionC(nn.Module):
    def __init__(self, in_ch, channels_7x7):
        super().__init__()
        c7 = channels_7x7
        self.branch1x1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = _BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = _BasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = _BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = _BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = _BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b7, bd, bp], 1)


class _InceptionD(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = _BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = _BasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = _BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = _BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = _BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = F.max_pool2d(x, kernel_size=3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class _InceptionE(nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = _BasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = _BasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = _BasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = _BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = _BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = _BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = _BasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, kernel_size=3, stride=1, padding=1))
        return torch.cat([b1, b3, bd, bp], 1)


class TorchInception3(nn.Module):
    """torchvision Inception3 trunk to pool3 (final adaptive avg pool)."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = _BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = _BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = _BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = _BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = _BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = _InceptionA(192, pool_features=32)
        self.Mixed_5c = _InceptionA(256, pool_features=64)
        self.Mixed_5d = _InceptionA(288, pool_features=64)
        self.Mixed_6a = _InceptionB(288)
        self.Mixed_6b = _InceptionC(768, channels_7x7=128)
        self.Mixed_6c = _InceptionC(768, channels_7x7=160)
        self.Mixed_6d = _InceptionC(768, channels_7x7=160)
        self.Mixed_6e = _InceptionC(768, channels_7x7=192)
        self.Mixed_7a = _InceptionD(768)
        self.Mixed_7b = _InceptionE(1280)
        self.Mixed_7c = _InceptionE(2048)
        self.fc = nn.Linear(2048, 1000)

    def pool3(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        x = F.adaptive_avg_pool2d(x, (1, 1))
        return torch.flatten(x, 1)

    def fid_features(self, x, resize_input=True, normalize_input=True):
        """The reference FID wrapper (`gan_training/metrics/inception.py:
        83-106`): F.upsample(bilinear, align_corners=False) to 299, per-channel
        [-1,1] -> ImageNet remap, trunk to pool3."""
        if resize_input:
            x = F.interpolate(
                x, size=(299, 299), mode="bilinear", align_corners=False
            )
        if normalize_input:
            x = x.clone()
            x[:, 0] = x[:, 0] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x[:, 1] = x[:, 1] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x[:, 2] = x[:, 2] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
        return self.pool3(x)

    @torch.no_grad()
    def load_flat(self, params, dtype=torch.float64):
        """Load rick_tpu's flat torchvision-keyed param dict."""
        self.to(dtype)
        sd = {}
        for k, v in params.items():
            if k.endswith("bn.running_mean") or k.endswith("bn.running_var"):
                sd[k] = _t(v, dtype)
            else:
                sd[k] = _t(v, dtype)
        # nn.BatchNorm2d tracks num_batches_tracked; keep whatever default
        missing, unexpected = self.load_state_dict(sd, strict=False)
        missing = [m for m in missing if not m.endswith("num_batches_tracked")]
        assert not missing, f"missing oracle keys: {missing[:5]}"
        assert not unexpected, f"unexpected oracle keys: {unexpected[:5]}"
        self.eval()
        return self


# ---------------------------------------------------------------------------
# VGG16 (torchvision config D) + the P&R fc2 wrapper + LPIPS taps
# ---------------------------------------------------------------------------


class TorchVGG16(nn.Module):
    def __init__(self):
        super().__init__()
        layers = []
        in_ch = 3
        for c in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M"]:
            if c == "M":
                layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
            else:
                layers += [nn.Conv2d(in_ch, c, kernel_size=3, padding=1),
                           nn.ReLU(inplace=True)]
                in_ch = c
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 1000),
        )

    def fc2_features(self, images):
        """P&R extractor (`gan_metrics/precision_recall.py:124-151`):
        F.interpolate to 224 (default NEAREST mode, no renorm), features,
        flatten, classifier[:4] -> 4096-d pre-ReLU fc2."""
        if images.shape[2] != 224 or images.shape[3] != 224:
            images = F.interpolate(images, size=(224, 224))  # mode='nearest'
        before_fc = self.features(images)
        before_fc = before_fc.view(-1, 7 * 7 * 512)
        return self.classifier[:4](before_fc)

    def lpips_taps(self, x):
        """Activations after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
        (torchvision feature indices 3, 8, 15, 22, 29), as the lpips package's
        `vgg16` slices them."""
        taps, want = [], {3, 8, 15, 22, 29}
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in want:
                taps.append(x)
        return taps

    @torch.no_grad()
    def load_flat(self, params, dtype=torch.float64):
        self.to(dtype)
        sd = {k: _t(v, dtype) for k, v in params.items()}
        # rick_tpu's dict has no classifier.6 (unused by fc2); keep random
        missing, unexpected = self.load_state_dict(sd, strict=False)
        missing = [m for m in missing if not m.startswith("classifier.6")]
        assert not missing, f"missing oracle keys: {missing[:5]}"
        assert not unexpected, f"unexpected: {unexpected[:5]}"
        self.eval()
        return self


def torch_lpips(vgg: TorchVGG16, x0, x1, lin_weights):
    """The lpips package's forward (net='vgg', spatial=False): scaling layer,
    vgg taps, unit-normalize over channels (eps added to the NORM, per
    lpips.normalize_tensor), squared diff, 1x1 'lin' conv (= channel-weighted
    sum), spatial average, sum over the 5 layers."""
    shift = torch.tensor([-0.030, -0.088, -0.188], dtype=x0.dtype).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450], dtype=x0.dtype).view(1, 3, 1, 1)
    t0 = vgg.lpips_taps((x0 - shift) / scale)
    t1 = vgg.lpips_taps((x1 - shift) / scale)
    total = 0.0
    for f0, f1, w in zip(t0, t1, lin_weights):
        w = torch.as_tensor(np.asarray(w), dtype=x0.dtype)
        n0 = f0 / (torch.sqrt(torch.sum(f0 ** 2, dim=1, keepdim=True)) + 1e-10)
        n1 = f1 / (torch.sqrt(torch.sum(f1 ** 2, dim=1, keepdim=True)) + 1e-10)
        d = (n0 - n1) ** 2
        total = total + (d * w.view(1, -1, 1, 1)).sum(dim=1).mean(dim=(1, 2))
    return total

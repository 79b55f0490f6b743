"""PyTorch twin of the CASHMR/HMR architecture (CPU-only, no torchvision).

Purpose (two-fold, both test/benchmark-side — never on the TPU hot path):
  1. Baseline measurement: BASELINE.md's protocol is "run the PyTorch
     reference on CPU ... those measured numbers become the baseline row".
     The reference repo itself cannot be imported here (it requires
     torchvision + smplx + its data/ assets, none of which exist in this
     image), so this twin reproduces the exact cashmrV2 compute graph
     (ResNet-50 + depth decoder + 3x IEF, reference: models/hmr.py:723-837)
     for an apples-to-apples torch-CPU images/sec measurement.
  2. Numerical parity: the twin uses the reference's parameter naming
     (conv1, layer1.0.conv1, Reconstruct_depth.decDepth1.0, fc1, decpose, ...)
     so `train/checkpoint.py`'s .pt converter is exercised end-to-end: load
     the same weights in torch and flax and compare outputs bit-for-bit-ish.

This is an independent implementation written from the architecture spec in
SURVEY.md §2.2/§3.5 — dropout/BN/IEF semantics match the reference contract.
"""

from __future__ import annotations


try:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    TORCH_AVAILABLE = True
except ImportError:  # pragma: no cover
    TORCH_AVAILABLE = False


if TORCH_AVAILABLE:

    def _rot6d_to_rotmat_torch(x):
        x = x.view(-1, 3, 2)
        a1, a2 = x[:, :, 0], x[:, :, 1]
        b1 = F.normalize(a1)
        b2 = F.normalize(a2 - torch.sum(b1 * a2, dim=1, keepdim=True) * b1)
        b3 = torch.cross(b1, b2, dim=1)
        return torch.stack((b1, b2, b3), dim=-1)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.downsample = downsample

        def forward(self, x):
            r = x if self.downsample is None else self.downsample(x)
            h = F.relu(self.bn1(self.conv1(x)))
            h = F.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return F.relu(h + r)

    class ResBlockT(nn.Module):
        def __init__(self, n):
            super().__init__()
            self.body = nn.Sequential(
                nn.Conv2d(n, n, 3, padding=1, bias=False),
                nn.BatchNorm2d(n),
                nn.ReLU(True),
                nn.Conv2d(n, n, 3, padding=1, bias=False),
                nn.BatchNorm2d(n),
            )

        def forward(self, x):
            return self.body(x) + x

    def _upsampler(n):
        return nn.Sequential(
            nn.Conv2d(n, 4 * n, 3, padding=1, bias=False),
            nn.PixelShuffle(2),
            nn.BatchNorm2d(n),
        )

    class ReconstructT(nn.Module):
        def __init__(self, num_feat=1, out_dim=1):
            super().__init__()
            self.decDepth1 = nn.Sequential(
                nn.Conv2d(2048 * num_feat, 1024, 1, bias=False), ResBlockT(1024), _upsampler(1024)
            )
            self.decDepth2 = nn.Sequential(
                nn.Conv2d(1024 * (num_feat + 1), 512, 1, bias=False), ResBlockT(512), _upsampler(512)
            )
            self.decDepth3 = nn.Sequential(
                nn.Conv2d(512 * (num_feat + 1), 256, 1, bias=False), ResBlockT(256), _upsampler(256)
            )
            self.decDepth4 = nn.Sequential(
                nn.Conv2d(256 * (num_feat + 1), 128, 1, bias=False), ResBlockT(128), _upsampler(128)
            )
            self.decDepth = nn.Sequential(
                nn.Conv2d(128 + 64 * num_feat, 128, 1, bias=False),
                ResBlockT(128),
                ResBlockT(128),
                _upsampler(128),
                nn.Conv2d(128, out_dim, 3, padding=1, bias=False),
            )

        def forward(self, x0, x1, x2, x3, x4):
            h = self.decDepth1(x4)
            h = self.decDepth2(torch.cat((x3, h), 1))
            h = self.decDepth3(torch.cat((x2, h), 1))
            h = self.decDepth4(torch.cat((x1, h), 1))
            return self.decDepth(torch.cat((x0, h), 1))

    class CASHMRTorch(nn.Module):
        """cashmrV2 twin: 6ch stem, ResNet-50, depth decoder, 3x IEF."""

        def __init__(self, mean_pose, mean_shape, mean_cam, input_dim=6, with_decoder=True):
            super().__init__()
            self.inplanes = 64
            npose = 144
            self.conv1 = nn.Conv2d(input_dim, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(64, 3)
            self.layer2 = self._make_layer(128, 4, stride=2)
            self.layer3 = self._make_layer(256, 6, stride=2)
            self.layer4 = self._make_layer(512, 3, stride=2)
            self.fc1 = nn.Linear(2048 + npose + 13, 1024)
            self.drop1 = nn.Dropout()
            self.fc2 = nn.Linear(1024, 1024)
            self.drop2 = nn.Dropout()
            self.decpose = nn.Linear(1024, npose)
            self.decshape = nn.Linear(1024, 10)
            self.deccam = nn.Linear(1024, 3)
            self.with_decoder = with_decoder
            if with_decoder:
                self.Reconstruct_depth = ReconstructT()

            self.register_buffer("init_pose", torch.tensor(mean_pose, dtype=torch.float32)[None])
            self.register_buffer("init_shape", torch.tensor(mean_shape, dtype=torch.float32)[None])
            self.register_buffer("init_cam", torch.tensor(mean_cam, dtype=torch.float32)[None])

        def _make_layer(self, planes, blocks, stride=1):
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )
            layers = [Bottleneck(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            for _ in range(1, blocks):
                layers.append(Bottleneck(self.inplanes, planes))
            return nn.Sequential(*layers)

        def forward(self, x, n_iter=3):
            b = x.shape[0]
            x0 = self.conv1(x)
            h = self.maxpool(F.relu(self.bn1(x0)))
            x1 = self.layer1(h)
            x2 = self.layer2(x1)
            x3 = self.layer3(x2)
            x4 = self.layer4(x3)
            depth = self.Reconstruct_depth(x0, x1, x2, x3, x4) if self.with_decoder else None
            xf = x4.mean(dim=(2, 3))
            pose = self.init_pose.expand(b, -1)
            shape = self.init_shape.expand(b, -1)
            cam = self.init_cam.expand(b, -1)
            for _ in range(n_iter):
                xc = torch.cat([xf, pose, shape, cam], 1)
                xc = self.drop1(self.fc1(xc))
                xc = self.drop2(self.fc2(xc))
                pose = self.decpose(xc) + pose
                shape = self.decshape(xc) + shape
                cam = self.deccam(xc) + cam
            rotmat = _rot6d_to_rotmat_torch(pose).view(b, 24, 3, 3)
            return rotmat, shape, cam, depth

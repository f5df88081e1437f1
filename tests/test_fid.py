"""FID/KID subsystem tests.

Golden parity: a torch Inception3 (pool3 graph, FID pooling variants)
is built HERE from the torchvision architecture definition, randomized
(including BN running stats), exported through the real converter, and
compared feature-for-feature against models/inception.InceptionPool3.
Plus analytic checks of the Frechet/KID math and a CLI e2e.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from dsgan_tpu.models import inception as inc
from dsgan_tpu.ops import fid as fid_ops

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


# ------------------------------------------------ torch reference model

class TBasic(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x, fid_variant):
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=not fid_variant)


class TInceptionA(nn.Module):
    def __init__(self, cin, pool_features, fid_variant):
        super().__init__()
        self.fid_variant = fid_variant
        self.branch1x1 = TBasic(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasic(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasic(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x, self.fid_variant)),
        ], 1)


class TInceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(nn.Module):
    def __init__(self, cin, c7, fid_variant):
        super().__init__()
        self.fid_variant = fid_variant
        self.branch1x1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
            self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([
            self.branch1x1(x), b7, bd,
            self.branch_pool(_avg(x, self.fid_variant)),
        ], 1)


class TInceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(nn.Module):
    def __init__(self, cin, pool_mode, fid_variant):
        super().__init__()
        self.pool_mode = pool_mode
        self.fid_variant = fid_variant
        self.branch1x1 = TBasic(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasic(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg(x, self.fid_variant)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInception3Pool3(nn.Module):
    def __init__(self, fid_variant=True):
        super().__init__()
        fv = fid_variant
        self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32, fv)
        self.Mixed_5c = TInceptionA(256, 64, fv)
        self.Mixed_5d = TInceptionA(288, 64, fv)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128, fv)
        self.Mixed_6c = TInceptionC(768, 160, fv)
        self.Mixed_6d = TInceptionC(768, 160, fv)
        self.Mixed_6e = TInceptionC(768, 192, fv)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg", fv)
        self.Mixed_7c = TInceptionE(2048, "max" if fv else "avg", fv)

    def forward(self, x):
        h = self.Conv2d_1a_3x3(x)
        h = self.Conv2d_2a_3x3(h)
        h = self.Conv2d_2b_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        h = self.Conv2d_3b_1x1(h)
        h = self.Conv2d_4a_3x3(h)
        h = F.max_pool2d(h, 3, stride=2)
        for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                    "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                    "Mixed_7a", "Mixed_7b", "Mixed_7c"]:
            h = getattr(self, blk)(h)
        return h.mean(dim=(2, 3))


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.normal_(0, (2.0 / fan_in) ** 0.5, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.15, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.4, generator=g)
                m.running_var.uniform_(0.5, 1.8, generator=g)
    model.eval()
    return model


@pytest.mark.slow
@pytest.mark.parametrize("fid_variant", [True, False])
def test_pool3_features_match_torch(tmp_path, fid_variant):
    tm = _randomize(TInception3Pool3(fid_variant), seed=3 + fid_variant)
    # 75x75 exercises every block at ~6% of the 299^2 cost; the graph is
    # shape-polymorphic so parity here is parity at 299.
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 3, 75, 75)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    pth = os.path.join(tmp_path, "inc.pth")
    npz = os.path.join(tmp_path, "inc.npz")
    torch.save(tm.state_dict(), pth)
    from dsgan_tpu.utils.pth_convert import convert_inception

    convert_inception(pth, npz)
    variables = inc.load_torchvision_npz(npz)
    model = inc.InceptionPool3(fid_variant=fid_variant)
    got = np.asarray(model.apply(
        variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    assert got.shape == (2, 2048)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_frechet_distance_analytic():
    # diagonal Gaussians: FID = |m1-m2|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))
    d = 6
    rng = np.random.default_rng(1)
    m1, m2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
    got = fid_ops.frechet_distance(m1, np.diag(s1), m2, np.diag(s2))
    want = np.sum((m1 - m2) ** 2) + np.sum(s1 + s2 - 2 * np.sqrt(s1 * s2))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    assert fid_ops.frechet_distance(m1, np.diag(s1), m1, np.diag(s1)) < 1e-9


def test_fid_from_features_separates_distributions():
    rng = np.random.default_rng(2)
    a = rng.normal(0, 1, (500, 8))
    b = rng.normal(0, 1, (500, 8))
    c = rng.normal(2.5, 1, (500, 8))
    near = fid_ops.fid_from_features(a, b)
    far = fid_ops.fid_from_features(a, c)
    assert near < 0.5
    assert far > 10 * near


def test_kid_self_is_near_zero():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, (300, 16))
    b = rng.normal(0, 1, (300, 16))
    c = rng.normal(1.5, 1, (300, 16))
    mean_ab, _ = fid_ops.kid_from_features(a, b, subset_size=100, n_subsets=20)
    mean_ac, _ = fid_ops.kid_from_features(a, c, subset_size=100, n_subsets=20)
    assert abs(mean_ab) < 0.05
    assert mean_ac > 10 * abs(mean_ab)


@pytest.mark.slow
def test_fid_cli_e2e(tmp_path):
    from PIL import Image

    from dsgan_tpu.fid import main as fid_main

    rng = np.random.default_rng(4)
    for sub, shift in (("a", 0), ("b", 60)):
        d = tmp_path / sub
        d.mkdir()
        for i in range(4):
            im = rng.integers(shift, 180 + shift, (64, 64, 3)).astype(np.uint8)
            Image.fromarray(im).save(d / f"{i}.png")
    out = fid_main([
        "--dir_a", str(tmp_path / "a"), "--dir_b", str(tmp_path / "b"),
        "--batch", "2", "--how_many", "4",
    ])
    assert np.isfinite(out["fid"]) and out["fid"] > 0
    assert out["n_a"] == 4 and out["n_b"] == 4
    assert "kid" in out

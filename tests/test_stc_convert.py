"""STC connector weight-conversion validation against small torch modules.

timm isn't available, so a minimal torch mirror of the timm Bottleneck
semantics (as invoked by VideoLLaMA2: bottle_ratio=1, group_size=1 =>
depthwise 3x3, SE 0.25, LayerNorm2d, SiLU) is built here test-only and used
to validate ``convert_stc_connector``'s layout mapping and our Flax blocks.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phantom_vlb_tpu.models.convert import convert_stc_connector  # noqa: E402
from phantom_vlb_tpu.models.stc_connector import STCConfig, STCConnector  # noqa: E402


class LayerNorm2d(tnn.Module):
    """timm LayerNorm2d: LN over channels of NCHW."""

    def __init__(self, ch):
        super().__init__()
        self.weight = tnn.Parameter(torch.randn(ch) * 0.1 + 1)
        self.bias = tnn.Parameter(torch.randn(ch) * 0.1)

    def forward(self, x):  # (B, C, H, W)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + 1e-5)
        return x * self.weight[None, :, None, None] + self.bias[None, :, None, None]


class TorchBottleneck(tnn.Module):
    def __init__(self, in_chs, out_chs, se_ratio=0.25):
        super().__init__()
        self.conv1 = tnn.Sequential()
        self.conv1.conv = tnn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.conv1.bn = LayerNorm2d(out_chs)
        self.conv2 = tnn.Sequential()
        self.conv2.conv = tnn.Conv2d(out_chs, out_chs, 3, padding=1,
                                     groups=out_chs, bias=False)
        self.conv2.bn = LayerNorm2d(out_chs)
        rd = max(1, int(round(in_chs * se_ratio)))
        self.se = tnn.Module()
        self.se.fc1 = tnn.Conv2d(out_chs, rd, 1)
        self.se.fc2 = tnn.Conv2d(rd, out_chs, 1)
        self.conv3 = tnn.Sequential()
        self.conv3.conv = tnn.Conv2d(out_chs, out_chs, 1, bias=False)
        self.conv3.bn = LayerNorm2d(out_chs)
        self.downsample = None
        if in_chs != out_chs:
            self.downsample = tnn.Sequential()
            self.downsample.conv = tnn.Conv2d(in_chs, out_chs, 1, bias=False)
            self.downsample.bn = LayerNorm2d(out_chs)

    def forward(self, x):
        shortcut = x
        h = tnn.functional.silu(self.conv1.bn(self.conv1.conv(x)))
        h = tnn.functional.silu(self.conv2.bn(self.conv2.conv(h)))
        pooled = h.mean((2, 3), keepdim=True)
        h = h * torch.sigmoid(self.se.fc2(tnn.functional.silu(self.se.fc1(pooled))))
        h = self.conv3.bn(self.conv3.conv(h))
        if self.downsample is not None:
            shortcut = self.downsample.bn(self.downsample.conv(x))
        return tnn.functional.silu(h + shortcut)


class TorchSTC(tnn.Module):
    """Mirror of VideoLLaMA2 STCConnector at tiny size (depth=1, mlp_depth=2)."""

    def __init__(self, enc=16, hidden=24, out=16):
        super().__init__()
        self.s1 = tnn.Module()
        self.s1.b1 = TorchBottleneck(enc, hidden)
        self.sampler = tnn.Sequential(
            tnn.Conv3d(hidden, hidden, kernel_size=2, stride=2, padding=1),
            tnn.SiLU(),
        )
        self.s2 = tnn.Module()
        self.s2.b1 = TorchBottleneck(hidden, hidden)
        self.readout = tnn.Sequential(
            tnn.Linear(hidden, out), tnn.GELU(), tnn.Linear(out, out)
        )

    def forward(self, x):  # (B, T, H, W, C)
        b, t, h, w, c = x.shape
        y = x.reshape(b * t, h, w, c).permute(0, 3, 1, 2)
        y = self.s1.b1(y)
        y = y.reshape(b, t, -1, h, w).permute(0, 2, 1, 3, 4)  # B, C, T, H, W
        y = self.sampler(y)
        bb, cc, td, hd, wd = y.shape
        y = y.permute(0, 2, 3, 4, 1).reshape(b * td, hd, wd, cc).permute(0, 3, 1, 2)
        y = self.s2.b1(y)
        y = y.permute(0, 2, 3, 1)  # B*T', H', W', C
        y = self.readout(y)
        return y.reshape(b, -1, y.shape[-1])


def test_stc_full_conversion_parity():
    torch.manual_seed(0)
    tm = TorchSTC()
    tm.eval()

    cfg = STCConfig(encoder_hidden_size=16, hidden_size=24, output_hidden_size=16,
                    depth=1, dtype=jnp.float32, param_dtype=jnp.float32)
    ours = STCConnector(cfg)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jax.tree.map(
        jnp.asarray,
        convert_stc_connector(sd, depth=1, mlp_depth=2, prefix=""),
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 6, 6, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x)).numpy()
    out = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == ref.shape  # (B, T'*H'*W', out) with T'=3, H'=W'=4
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_stc_geometry():
    """12,24,24 -> 7,13,13 and token count 1183 (extractfeatures.py:206-209)."""
    cfg = STCConfig.tiny()
    m = STCConnector(cfg)
    x = jnp.zeros((1, 12, 24, 24, cfg.encoder_hidden_size))
    shape = jax.eval_shape(
        lambda p, x: m.apply({"params": p}, x),
        jax.eval_shape(lambda k: m.init(k, x)["params"], jax.random.key(0)),
        x,
    )
    assert shape.shape == (1, 7 * 13 * 13, cfg.output_hidden_size)

"""MoGe head: JAX implementation vs an equivalent torch module (the offline
stand-in for real-weight validation — no MoGe checkpoint is mountable in
this environment). The torch module below mirrors the public MoGe Head
nesting exactly, so convert_head exercises the real key layout
(projects.{i}, upsample_blocks.{i}.0.{0,1}, .{1+j}.layers.{0,2,3,5},
output_block.{...})."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from versecrafter_tpu.perception import moge_head as mh


class ResidualConvBlock(nn.Module):
    def __init__(self, cin, cout=None, chidden=None):
        super().__init__()
        cout = cout or cin
        chidden = chidden or cin
        self.layers = nn.Sequential(
            nn.GroupNorm(1, cin),
            nn.ReLU(inplace=True),
            nn.Conv2d(cin, chidden, 3, 1, 1, padding_mode="replicate"),
            nn.GroupNorm(chidden // 32 if chidden % 32 == 0 and chidden >= 32
                         else 1, chidden),
            nn.ReLU(inplace=True),
            nn.Conv2d(chidden, cout, 3, 1, 1, padding_mode="replicate"),
        )
        self.skip_connection = (nn.Conv2d(cin, cout, 1)
                                if cin != cout else nn.Identity())

    def forward(self, x):
        return self.layers(x) + self.skip_connection(x)


class Head(nn.Module):
    def __init__(self, num_features, dim_in, dim_out, dim_proj,
                 dim_upsample, num_res_blocks, last_res_blocks,
                 last_conv_channels, last_conv_size):
        super().__init__()
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, dim_proj, 1) for _ in range(num_features)])
        chain = [dim_proj, *dim_upsample]
        self.upsample_blocks = nn.ModuleList([
            nn.Sequential(
                self._make_upsampler(cin + 2, cout),
                *(ResidualConvBlock(cout) for _ in range(num_res_blocks)))
            for cin, cout in zip(chain[:-1], chain[1:])])
        self.output_block = nn.Sequential(
            nn.Conv2d(dim_upsample[-1] + 2, last_conv_channels, 3, 1, 1,
                      padding_mode="replicate"),
            *(ResidualConvBlock(last_conv_channels)
              for _ in range(last_res_blocks)),
            nn.ReLU(inplace=False),
            nn.Conv2d(last_conv_channels, dim_out, last_conv_size, 1,
                      last_conv_size // 2, padding_mode="replicate"),
        )

    @staticmethod
    def _make_upsampler(cin, cout):
        return nn.Sequential(
            nn.ConvTranspose2d(cin, cout, 2, 2),
            nn.Conv2d(cout, cout, 3, 1, 1, padding_mode="replicate"))

    def forward(self, feats, gh, gw, aspect):
        b = feats[0].shape[0]
        x = sum(proj(f.permute(0, 2, 1).reshape(b, -1, gh, gw))
                for proj, f in zip(self.projects, feats))

        def cat_uv(x):
            uv = mh.normalized_view_plane_uv(x.shape[2], x.shape[3], aspect)
            uv = torch.from_numpy(uv).permute(2, 0, 1)[None].expand(b, -1, -1, -1)
            return torch.cat([x, uv.to(x.dtype)], dim=1)

        for blk in self.upsample_blocks:
            x = blk(cat_uv(x))
        return self.output_block(cat_uv(x))


CFG = dict(num_features=3, dim_in=24, dim_out=4, dim_proj=40,
           dim_upsample=(32, 16), num_res_blocks=2, last_res_blocks=1,
           last_conv_channels=32, last_conv_size=3)


@pytest.fixture(scope="module")
def torch_head():
    torch.manual_seed(0)
    m = Head(**CFG).eval()
    # make GN affine params non-trivial so the test can catch norm bugs
    with torch.no_grad():
        for n, p in m.named_parameters():
            if "layers.0." in n or "layers.3." in n:
                p.add_(torch.randn_like(p) * 0.2)
    return m


def test_head_torch_parity(torch_head):
    gh, gw = 4, 6
    rng = np.random.default_rng(0)
    feats_np = [rng.standard_normal((2, gh * gw, CFG["dim_in"])).astype(np.float32)
                for _ in range(CFG["num_features"])]
    with torch.no_grad():
        want = torch_head([torch.from_numpy(f) for f in feats_np],
                          gh, gw, aspect=gw / gh).permute(0, 2, 3, 1).numpy()

    params = mh.convert_head(torch_head.state_dict(), prefix="")
    got = np.asarray(mh.head_forward(
        params, [jnp.asarray(f) for f in feats_np], gh, gw, aspect=gw / gh))
    assert got.shape == want.shape == (2, gh * 4, gw * 4, CFG["dim_out"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_transpose2x2_matches_torch():
    torch.manual_seed(1)
    ct = nn.ConvTranspose2d(5, 7, 2, 2)
    x = torch.randn(2, 5, 3, 4)
    with torch.no_grad():
        want = ct(x).permute(0, 2, 3, 1).numpy()
    p = {"weight": jnp.asarray(ct.weight.detach().numpy()),
         "bias": jnp.asarray(ct.bias.detach().numpy())}
    got = np.asarray(mh.conv_transpose2x2(
        p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_replicate_pad_conv_matches_torch():
    torch.manual_seed(2)
    c = nn.Conv2d(3, 6, 3, 1, 1, padding_mode="replicate")
    x = torch.randn(1, 3, 5, 8)
    with torch.no_grad():
        want = c(x).permute(0, 2, 3, 1).numpy()
    p = {"weight": jnp.asarray(c.weight.detach().numpy()),
         "bias": jnp.asarray(c.bias.detach().numpy())}
    got = np.asarray(mh.conv2d(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_init_head_structure_matches_converted(torch_head):
    """init_head (random init) and convert_head produce the same tree."""
    converted = mh.convert_head(torch_head.state_dict(), prefix="")
    inited = mh.init_head(jax.random.key(0), dim_in=CFG["dim_in"],
                          num_features=CFG["num_features"],
                          dim_out=CFG["dim_out"], dim_proj=CFG["dim_proj"],
                          dim_upsample=CFG["dim_upsample"],
                          num_res_blocks=CFG["num_res_blocks"],
                          last_res_blocks=CFG["last_res_blocks"],
                          last_conv_channels=CFG["last_conv_channels"],
                          last_conv_size=CFG["last_conv_size"])
    ts = jax.tree.map(lambda a: a.shape, converted)
    is_ = jax.tree.map(lambda a: a.shape, inited)
    assert ts == is_

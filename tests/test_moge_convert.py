"""MoGe full-checkpoint conversion: a tiny torch model in the EXACT public
MoGe layout (backbone.* = original facebookresearch dinov2 with fused qkv +
LayerScale; head.* = MoGe Head) is converted and must match the JAX
moge_forward numerically. This is the strongest offline validation available
(no MoGe weights are mountable here); the golden depth test activates when
MOGE_CHECKPOINT points at a converted real checkpoint."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from versecrafter_tpu.perception import moge
from versecrafter_tpu.perception import moge_head as mh

DIM, DEPTH, HEADS, PATCH = 32, 4, 2, 14


class FbBlock(nn.Module):
    """Original dinov2 block: fused qkv, ls1/ls2 LayerScale `gamma`."""

    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = nn.Linear(dim, dim * 3)
                self.proj = nn.Linear(dim, dim)
        self.attn = Attn()

        class LS(nn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = nn.Parameter(torch.full((dim,), 0.5))
        self.ls1, self.ls2 = LS(), LS()
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)

        class Mlp(nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = nn.Linear(dim, dim * mlp_ratio)
                self.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.mlp = Mlp()
        self.heads = heads

    def forward(self, x):
        b, n, d = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, self.heads, d // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(d // self.heads), -1)
        o = (a @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.ls1.gamma * self.attn.proj(o)
        h = self.norm2(x)
        x = x + self.ls2.gamma * self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        return x


class FbDinov2(nn.Module):
    def __init__(self, dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH,
                 grid=16):
        super().__init__()

        class PatchEmbed(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Conv2d(3, dim, patch, patch)
        self.patch_embed = PatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.1)
        self.pos_embed = nn.Parameter(torch.randn(1, 1 + grid * grid, dim) * 0.1)
        self.blocks = nn.ModuleList([FbBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.patch = patch

    def interp_pos(self, gh, gw):
        cls, grid = self.pos_embed[:, :1], self.pos_embed[:, 1:]
        side = int(math.sqrt(grid.shape[1]))
        if (gh, gw) == (side, side):
            return self.pos_embed
        g = grid.reshape(1, side, side, -1).permute(0, 3, 1, 2)
        g = torch.nn.functional.interpolate(
            g, (gh, gw), mode="bicubic", align_corners=False)
        return torch.cat([cls, g.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)], 1)

    def forward_taps(self, pixels, taps):
        b, _, H, W = pixels.shape
        x = self.patch_embed.proj(pixels).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], 1)
        x = x + self.interp_pos(H // self.patch, W // self.patch)
        out = {}
        for i, blk in enumerate(self.blocks):
            x = blk(x)
            if i in taps:
                out[i] = self.norm(x)  # get_intermediate_layers(norm=True)
        return [out[i] for i in taps]


def _torch_state_dict(seed=0):
    torch.manual_seed(seed)
    bb = FbDinov2().eval()
    from tests.test_moge_head import Head
    head = Head(num_features=4, dim_in=DIM, dim_out=4, dim_proj=16,
                dim_upsample=(16, 8), num_res_blocks=1, last_res_blocks=0,
                last_conv_channels=8, last_conv_size=1).eval()
    sd = {f"backbone.{k}": v for k, v in bb.state_dict().items()}
    sd.update({f"head.{k}": v for k, v in head.state_dict().items()})
    # MoGe checkpoints also carry an unused mask_token
    sd["backbone.mask_token"] = torch.zeros(1, DIM)
    return bb, head, {"model": sd}


def test_convert_moge_checkpoint_full_parity():
    bb, head, ckpt = _torch_state_dict()
    params, report = moge.convert_moge_checkpoint(ckpt, heads=HEADS)
    assert report["unconsumed_keys"] == []
    assert report["backbone_depth"] == DEPTH
    assert params["_static"]["taps"] == (0, 1, 2, 3)

    h, w = 2 * PATCH, 3 * PATCH
    rng = np.random.default_rng(0)
    img = rng.random((1, h, w, 3)).astype(np.float32)

    # torch composite: fb backbone taps -> head at patch res -> resize
    with torch.no_grad():
        px = torch.from_numpy((img * 2 - 1).transpose(0, 3, 1, 2))
        feats = bb.forward_taps(px, taps=(0, 1, 2, 3))
        feats = [f[:, 1:] for f in feats]
        out = head(feats, h // PATCH, w // PATCH, aspect=w / h)
        out = torch.nn.functional.interpolate(
            out, (h, w), mode="bilinear", align_corners=False)
        want = out.permute(0, 2, 3, 1).numpy()

    pts, mlogit = moge.moge_forward(params, jnp.asarray(img))
    got_raw = np.concatenate(
        [np.asarray(pts)[..., :2],
         np.log(np.asarray(pts)[..., 2:3]),  # undo the exp z-remap
         np.asarray(mlogit)[..., None]], -1)
    np.testing.assert_allclose(got_raw, want, rtol=5e-4, atol=5e-4)


def test_convert_reports_unconsumed_keys():
    _, _, ckpt = _torch_state_dict()
    ckpt["model"]["scale_head.mlp.0.weight"] = torch.zeros(4, 4)
    _, report = moge.convert_moge_checkpoint(ckpt)
    assert report["unconsumed_keys"] == ["scale_head.mlp.0.weight"]


@pytest.mark.skipif("MOGE_CHECKPOINT" not in os.environ,
                    reason="no real MoGe weights mountable in this "
                           "environment (zero egress)")
def test_real_checkpoint_golden_depth():
    """When a real MoGe-v2 checkpoint is provided, depth must correlate with
    the reference pipeline's shipped depth_intrinsics.npz."""
    import cv2

    ckpt = torch.load(os.environ["MOGE_CHECKPOINT"], map_location="cpu",
                      weights_only=False)
    params, report = moge.convert_moge_checkpoint(ckpt)
    assert not any(k.startswith(("backbone.", "head."))
                   for k in report["unconsumed_keys"]), report

    demo = ("/root/reference/demo_data/"
            "LXKcD2zSPMc_0351466_0353266_0001469_0001550")
    img = cv2.cvtColor(cv2.imread(f"{demo}/0001.png"), cv2.COLOR_BGR2RGB)
    ph, pw = -img.shape[0] % 14, -img.shape[1] % 14
    img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="edge")
    out = moge.infer(params, img.astype(np.float32) / 255.0)

    golden = np.load(f"{demo}/estimated_depth/depth_intrinsics.npz")
    gd = golden["depth"].astype(np.float32)
    got = out["depth"][: gd.shape[0], : gd.shape[1]]
    valid = np.isfinite(gd) & (gd > 0) & np.isfinite(got)
    corr = np.corrcoef(1 / got[valid], 1 / gd[valid])[0, 1]
    assert corr > 0.9, corr

"""MoGe convolutional geometry head, JAX — faithful to the public MoGe
module structure (microsoft/MoGe `moge/model/modules.py` + the Head used by
v1/v2 models) so real checkpoints convert 1:1:

  projects:        one 1x1 conv per backbone tap (dim -> dim_proj), summed
  upsample_blocks: per level, concat a normalized view-plane UV map (+2 ch),
                   ConvTranspose2d(k=2, s=2) + Conv2d(3x3, replicate pad),
                   then ResidualConvBlocks
  output_block:    concat UV, Conv2d 3x3 -> ResidualConvBlocks -> ReLU ->
                   Conv2d(last_conv_size)

ResidualConvBlock = GN(1) -> ReLU -> Conv3x3 -> GN(C/32) -> ReLU -> Conv3x3
with an identity (or 1x1 conv) skip — replicate padding everywhere.

Consumed by perception/moge.py; torch-parity-tested against an equivalent
torch module in tests/test_moge_head.py (the offline stand-in for real-weight
validation; real MoGe-v2 weights are not mountable in this environment —
reference consumption site: /root/reference/inference/moge-v2_infer.py:40-43).

Conventions: activations NHWC; conv kernels kept in torch layout
(Conv2d [O, I, kh, kw]; ConvTranspose2d [I, O, kh, kw]) so converted
checkpoints drop in without transposition bookkeeping.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def normalized_view_plane_uv(h: int, w: int,
                             aspect: Optional[float] = None) -> np.ndarray:
    """UV map on the unit-diagonal view plane (MoGe
    geometry_torch.normalized_view_plane_uv): spans chosen so the plane
    diagonal has length 2, pixel centers sampled."""
    if aspect is None:
        aspect = w / h
    span_x = aspect / (1.0 + aspect * aspect) ** 0.5
    span_y = 1.0 / (1.0 + aspect * aspect) ** 0.5
    u = np.linspace(-span_x * (w - 1) / w, span_x * (w - 1) / w, w,
                    dtype=np.float32)
    v = np.linspace(-span_y * (h - 1) / h, span_y * (h - 1) / h, h,
                    dtype=np.float32)
    uu, vv = np.meshgrid(u, v)
    return np.stack([uu, vv], axis=-1)  # [h, w, 2]


# ---------------------------------------------------------------------------
# functional layers (NHWC activations, torch-layout kernels)
# ---------------------------------------------------------------------------

def conv2d(p: Params, x: jnp.ndarray, stride: int = 1) -> jnp.ndarray:
    """Conv2d with replicate ('edge') padding, torch [O, I, kh, kw] kernel."""
    k = p["weight"].astype(x.dtype)
    kh, kw = k.shape[2], k.shape[3]
    ph, pw = kh // 2, kw // 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "OIHW", "NHWC"))
    y = jax.lax.conv_general_dilated(x, k, (stride, stride), "VALID",
                                     dimension_numbers=dn)
    return y + p["bias"].astype(y.dtype)


def conv_transpose2x2(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """ConvTranspose2d(kernel=2, stride=2): with kernel == stride each input
    pixel expands into an independent 2x2 block — an einsum + reshape, no
    overlap-add needed. torch weight layout [I, O, 2, 2]."""
    w = p["weight"].astype(x.dtype)
    b, h, ww, _ = x.shape
    co = w.shape[1]
    y = jnp.einsum("bhwi,ioac->bhawco", x, w)
    y = y.reshape(b, h * 2, ww * 2, co)
    return y + p["bias"].astype(y.dtype)


def group_norm(p: Params, x: jnp.ndarray, groups: int,
               eps: float = 1e-5) -> jnp.ndarray:
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (y * p["weight"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _gn_groups(channels: int) -> int:
    """MoGe ResidualConvBlock hidden norm: group_norm with 32-channel groups
    when divisible, else a single group."""
    return channels // 32 if channels % 32 == 0 and channels >= 32 else 1


def residual_conv_block(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = group_norm(p["gn1"], x, groups=1)
    h = jax.nn.relu(h)
    h = conv2d(p["conv1"], h)
    h = group_norm(p["gn2"], h, groups=_gn_groups(h.shape[-1]))
    h = jax.nn.relu(h)
    h = conv2d(p["conv2"], h)
    skip = conv2d(p["skip"], x) if "skip" in p else x
    return h + skip


# ---------------------------------------------------------------------------
# head forward
# ---------------------------------------------------------------------------

def head_forward(head: Params, feats: Sequence[jnp.ndarray], gh: int, gw: int,
                 aspect: Optional[float] = None) -> jnp.ndarray:
    """feats: per-tap PATCH tokens [B, gh*gw, D] (cls removed, final-norm
    applied — dinov2 get_intermediate_layers(norm=True) semantics).
    Returns [B, gh*8, gw*8, dim_out] (3 upsample levels x2 each)."""
    b = feats[0].shape[0]
    if aspect is None:
        aspect = gw / gh

    x = None
    for proj, f in zip(head["projects"], feats):
        g = conv2d(proj, f.reshape(b, gh, gw, f.shape[-1]))
        x = g if x is None else x + g

    def cat_uv(x):
        uv = normalized_view_plane_uv(x.shape[1], x.shape[2], aspect)
        uv = jnp.broadcast_to(jnp.asarray(uv, x.dtype)[None],
                              (b, *uv.shape))
        return jnp.concatenate([x, uv], axis=-1)

    for blk in head["upsample_blocks"]:
        x = cat_uv(x)
        x = conv2d(blk["up_conv"], conv_transpose2x2(blk["up_ct"], x))
        for rb in blk["res_blocks"]:
            x = residual_conv_block(rb, x)

    ob = head["output_block"]
    x = cat_uv(x)
    x = conv2d(ob["conv_in"], x)
    for rb in ob["res_blocks"]:
        x = residual_conv_block(rb, x)
    x = jax.nn.relu(x)
    return conv2d(ob["conv_out"], x)


# ---------------------------------------------------------------------------
# init / conversion
# ---------------------------------------------------------------------------

def init_head(key, dim_in: int, num_features: int = 4, dim_out: int = 4,
              dim_proj: int = 512,
              dim_upsample: Tuple[int, ...] = (256, 128, 64),
              num_res_blocks: int = 2, last_res_blocks: int = 0,
              last_conv_channels: int = 32, last_conv_size: int = 1,
              dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 256))
    nk = lambda: next(ks)

    def conv(cin, cout, k):
        fan = cin * k * k
        return {"weight": (jax.random.normal(nk(), (cout, cin, k, k))
                           / math.sqrt(fan)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def ct(cin, cout):
        fan = cin * 4
        return {"weight": (jax.random.normal(nk(), (cin, cout, 2, 2))
                           / math.sqrt(fan)).astype(dtype),
                "bias": jnp.zeros((cout,), dtype)}

    def gn(c):
        return {"weight": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def res_block(cin, cout=None):
        cout = cout or cin
        p = {"gn1": gn(cin), "conv1": conv(cin, cin, 3),
             "gn2": gn(cin), "conv2": conv(cin, cout, 3)}
        if cin != cout:
            p["skip"] = conv(cin, cout, 1)
        return p

    ups: List[Params] = []
    chain = (dim_proj,) + tuple(dim_upsample)
    for cin, cout in zip(chain[:-1], chain[1:]):
        ups.append({
            "up_ct": ct(cin + 2, cout),
            "up_conv": conv(cout, cout, 3),
            "res_blocks": [res_block(cout) for _ in range(num_res_blocks)],
        })
    return {
        "projects": [conv(dim_in, dim_proj, 1) for _ in range(num_features)],
        "upsample_blocks": ups,
        "output_block": {
            "conv_in": conv(dim_upsample[-1] + 2, last_conv_channels, 3),
            "res_blocks": [res_block(last_conv_channels)
                           for _ in range(last_res_blocks)],
            "conv_out": conv(last_conv_channels, dim_out, last_conv_size),
        },
    }


def convert_head(state_dict, prefix: str = "head.",
                 dtype=jnp.float32) -> Params:
    """Convert the torch Head state dict. Structure (counts of taps, levels,
    res blocks) is inferred from the keys, so checkpoint hyperparameters
    don't need to be known in advance.

    torch key layout (Head.__init__ nesting):
      projects.{i}.{weight,bias}                      1x1 convs
      upsample_blocks.{i}.0.0.*                       ConvTranspose2d
      upsample_blocks.{i}.0.1.*                       Conv2d 3x3
      upsample_blocks.{i}.{1+j}.layers.{0,2,3,5}.*    ResidualConvBlock
      upsample_blocks.{i}.{1+j}.skip_connection.*     (only when cin != cout)
      output_block.0.*                                Conv2d 3x3
      output_block.{1+j}.layers...                    ResidualConvBlocks
      output_block.{N-1}.*                            final Conv2d
    """
    def g(name):
        t = state_dict[prefix + name]
        return jnp.asarray(np.asarray(
            t.detach().cpu().float().numpy() if hasattr(t, "detach") else t),
            dtype)

    def has(name):
        return prefix + name in state_dict

    def conv(name):
        return {"weight": g(f"{name}.weight"), "bias": g(f"{name}.bias")}

    def gn(name):
        return {"weight": g(f"{name}.weight").astype(jnp.float32),
                "bias": g(f"{name}.bias").astype(jnp.float32)}

    def res_block(name):
        p = {"gn1": gn(f"{name}.layers.0"), "conv1": conv(f"{name}.layers.2"),
             "gn2": gn(f"{name}.layers.3"), "conv2": conv(f"{name}.layers.5")}
        if has(f"{name}.skip_connection.weight"):
            p["skip"] = conv(f"{name}.skip_connection")
        return p

    projects = []
    while has(f"projects.{len(projects)}.weight"):
        projects.append(conv(f"projects.{len(projects)}"))

    ups = []
    i = 0
    while has(f"upsample_blocks.{i}.0.0.weight"):
        blk = {"up_ct": conv(f"upsample_blocks.{i}.0.0"),
               "up_conv": conv(f"upsample_blocks.{i}.0.1"),
               "res_blocks": []}
        j = 1
        while has(f"upsample_blocks.{i}.{j}.layers.0.weight"):
            blk["res_blocks"].append(res_block(f"upsample_blocks.{i}.{j}"))
            j += 1
        ups.append(blk)
        i += 1

    # output_block: index 0 = conv_in, trailing conv = conv_out, middle =
    # res blocks (ReLU at N-2 is parameterless and invisible in the dict)
    out_idx = sorted({int(k[len(prefix) + len("output_block."):].split(".")[0])
                      for k in state_dict
                      if k.startswith(prefix + "output_block.")})
    ob: Params = {"conv_in": conv("output_block.0"), "res_blocks": []}
    for j in out_idx[1:-1]:
        ob["res_blocks"].append(res_block(f"output_block.{j}"))
    ob["conv_out"] = conv(f"output_block.{out_idx[-1]}")

    return {"projects": projects, "upsample_blocks": ups, "output_block": ob}

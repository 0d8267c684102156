"""Import shims so the genuine PyTorch reference at /root/reference runs
on CPU inside our test suite.

The reference imports timm / mmcv / torchvision / transforms3d / ipdb /
open3d / skimage and its compiled ``DCNv3`` CUDA extension, none of which
exist in this image.  These stubs implement ONLY the small surface the
reference's CPU paths actually execute (weight-standardized conv, init
helpers, nearest resize, quaternion/euler math, a timm-compatible ConvNeXt
for ``create_model``), so the reference modules import and run unmodified.

Usage:
    from tests.ref_shim import import_reference
    ref = import_reference()        # installs stubs, sys.path, FLAGS
    PoseNetRef = ref("network.PoseNet").PoseNet
"""

from __future__ import annotations

import importlib
import math
import sys
import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REF_PATH = "/root/reference"


# ---------------------------------------------------------------------------
# transforms3d (standard Gohlke transformations.py math, public API)
# ---------------------------------------------------------------------------

_NEXT_AXIS = [1, 2, 0, 1]
_AXES2TUPLE = {
    "sxyz": (0, 0, 0, 0), "sxyx": (0, 0, 1, 0), "sxzy": (0, 1, 0, 0),
    "sxzx": (0, 1, 1, 0), "syzx": (1, 0, 0, 0), "syzy": (1, 0, 1, 0),
    "syxz": (1, 1, 0, 0), "syxy": (1, 1, 1, 0), "szxy": (2, 0, 0, 0),
    "szxz": (2, 0, 1, 0), "szyx": (2, 1, 0, 0), "szyz": (2, 1, 1, 0),
    "rzyx": (0, 0, 0, 1), "rxyx": (0, 0, 1, 1), "ryzx": (0, 1, 0, 1),
    "rxzx": (0, 1, 1, 1), "rxzy": (1, 0, 0, 1), "ryzy": (1, 0, 1, 1),
    "rzxy": (1, 1, 0, 1), "ryxy": (1, 1, 1, 1), "ryxz": (2, 0, 0, 1),
    "rzxz": (2, 0, 1, 1), "rxyz": (2, 1, 0, 1), "rzyz": (2, 1, 1, 1),
}
_TUPLE2AXES = {v: k for k, v in _AXES2TUPLE.items()}
_EPS4 = np.finfo(float).eps * 4.0


def _euler2mat(ai, aj, ak, axes="sxyz"):
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    if frame:
        ai, ak = ak, ai
    if parity:
        ai, aj, ak = -ai, -aj, -ak
    si, sj, sk = math.sin(ai), math.sin(aj), math.sin(ak)
    ci, cj, ck = math.cos(ai), math.cos(aj), math.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    m = np.eye(3)
    if repetition:
        m[i, i] = cj
        m[i, j] = sj * si
        m[i, k] = sj * ci
        m[j, i] = sj * sk
        m[j, j] = -cj * ss + cc
        m[j, k] = -cj * cs - sc
        m[k, i] = -sj * ck
        m[k, j] = cj * sc + cs
        m[k, k] = cj * cc - ss
    else:
        m[i, i] = cj * ck
        m[i, j] = sj * sc - cs
        m[i, k] = sj * cc + ss
        m[j, i] = cj * sk
        m[j, j] = sj * ss + cc
        m[j, k] = sj * cs - sc
        m[k, i] = -sj
        m[k, j] = cj * si
        m[k, k] = cj * ci
    return m


def _mat2euler(mat, axes="sxyz"):
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    m = np.asarray(mat, dtype=np.float64)[:3, :3]
    if repetition:
        sy = math.sqrt(m[i, j] * m[i, j] + m[i, k] * m[i, k])
        if sy > _EPS4:
            ax = math.atan2(m[i, j], m[i, k])
            ay = math.atan2(sy, m[i, i])
            az = math.atan2(m[j, i], -m[k, i])
        else:
            ax = math.atan2(-m[j, k], m[j, j])
            ay = math.atan2(sy, m[i, i])
            az = 0.0
    else:
        cy = math.sqrt(m[i, i] * m[i, i] + m[j, i] * m[j, i])
        if cy > _EPS4:
            ax = math.atan2(m[k, j], m[k, k])
            ay = math.atan2(-m[k, i], cy)
            az = math.atan2(m[j, i], m[i, i])
        else:
            ax = math.atan2(-m[j, k], m[j, j])
            ay = math.atan2(-m[k, i], cy)
            az = 0.0
    if parity:
        ax, ay, az = -ax, -ay, -az
    if frame:
        ax, az = az, ax
    return ax, ay, az


def _euler2quat(ai, aj, ak, axes="sxyz"):
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes]
    i = firstaxis + 1
    j = _NEXT_AXIS[i + parity - 1] + 1
    k = _NEXT_AXIS[i - parity] + 1
    if frame:
        ai, ak = ak, ai
    if parity:
        aj = -aj
    ai, aj, ak = ai / 2.0, aj / 2.0, ak / 2.0
    ci, cj, ck = math.cos(ai), math.cos(aj), math.cos(ak)
    si, sj, sk = math.sin(ai), math.sin(aj), math.sin(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    q = np.empty((4,))
    if repetition:
        q[0] = cj * (cc - ss)
        q[i] = cj * (cs + sc)
        q[j] = sj * (cc + ss)
        q[k] = sj * (cs - sc)
    else:
        q[0] = cj * cc + sj * ss
        q[i] = cj * sc - sj * cs
        q[j] = cj * ss + sj * cc
        q[k] = cj * cs - sj * sc
    if parity:
        q[j] *= -1.0
    return q


def _quat2mat(q):
    w, x, y, z = np.asarray(q, dtype=np.float64)
    n = w * w + x * x + y * y + z * z
    if n < _EPS4:
        return np.eye(3)
    s = 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.array([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)]])


def _mat2quat(m):
    m = np.asarray(m, dtype=np.float64)[:3, :3]
    # Bar-Itzhack / symmetric K-matrix method (transforms3d semantics)
    qxx, qyx, qzx = m[0, 0], m[0, 1], m[0, 2]
    qxy, qyy, qzy = m[1, 0], m[1, 1], m[1, 2]
    qxz, qyz, qzz = m[2, 0], m[2, 1], m[2, 2]
    k = np.array([
        [qxx - qyy - qzz, 0, 0, 0],
        [qyx + qxy, qyy - qxx - qzz, 0, 0],
        [qzx + qxz, qzy + qyz, qzz - qxx - qyy, 0],
        [qyz - qzy, qzx - qxz, qxy - qyx, qxx + qyy + qzz]]) / 3.0
    vals, vecs = np.linalg.eigh(k)
    q = vecs[[3, 0, 1, 2], np.argmax(vals)]
    if q[0] < 0:
        q *= -1
    return q


def _quat2euler(q, axes="sxyz"):
    return _mat2euler(_quat2mat(q), axes)


def _qmult(q1, q2):
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2])


def _qinverse(q):
    q = np.asarray(q, dtype=np.float64)
    return q * np.array([1, -1, -1, -1]) / np.dot(q, q)


def _quat2axangle(quat, identity_thresh=None):
    w, x, y, z = np.asarray(quat, dtype=np.float64)
    n2 = w * w + x * x + y * y + z * z
    if n2 < _EPS4:
        return np.array([1.0, 0, 0]), 0.0
    s = math.sqrt(n2)
    w, x, y, z = w / s, x / s, y / s, z / s
    len2 = x * x + y * y + z * z
    if len2 < (identity_thresh or _EPS4) ** 2:
        return np.array([1.0, 0, 0]), 0.0
    theta = 2 * math.acos(max(min(w, 1), -1))
    return np.array([x, y, z]) / math.sqrt(len2), theta


def _axangle2quat(vector, theta, is_normalized=False):
    v = np.asarray(vector, dtype=np.float64)
    if not is_normalized:
        v = v / math.sqrt(np.dot(v, v))
    t2 = theta / 2.0
    st2 = math.sin(t2)
    return np.concatenate(([math.cos(t2)], v * st2))


def _axangle2mat(axis, angle, is_normalized=False):
    x, y, z = np.asarray(axis, dtype=np.float64)
    if not is_normalized:
        n = math.sqrt(x * x + y * y + z * z)
        x, y, z = x / n, y / n, z / n
    c, s = math.cos(angle), math.sin(angle)
    cc = 1 - c
    return np.array([
        [x * x * cc + c, x * y * cc - z * s, x * z * cc + y * s],
        [y * x * cc + z * s, y * y * cc + c, y * z * cc - x * s],
        [z * x * cc - y * s, z * y * cc + x * s, z * z * cc + c]])


def _mat2axangle(mat, unit_thresh=1e-5):
    m = np.asarray(mat, dtype=np.float64)[:3, :3]
    ln, w = np.linalg.eig(m.T)
    i = np.where(np.abs(np.real(ln) - 1.0) < unit_thresh)[0]
    direction = np.real(w[:, i[-1]]).squeeze()
    cosa = (np.trace(m) - 1.0) / 2.0
    if abs(direction[2]) > 1e-8:
        sina = (m[1, 0] + (cosa - 1.0) * direction[0] * direction[1]) \
            / direction[2]
    elif abs(direction[1]) > 1e-8:
        sina = (m[0, 2] + (cosa - 1.0) * direction[0] * direction[2]) \
            / direction[1]
    else:
        sina = (m[2, 1] + (cosa - 1.0) * direction[1] * direction[2]) \
            / direction[0]
    return direction, math.atan2(sina, cosa)


# ---------------------------------------------------------------------------
# timm stubs: layers + a timm-compatible torch ConvNeXt for create_model
# ---------------------------------------------------------------------------

class StdConv2d(nn.Conv2d):
    """timm's weight-standardized Conv2d (batch_norm over flattened w)."""

    def __init__(self, in_channel, out_channels, kernel_size, stride=1,
                 padding=None, dilation=1, groups=1, bias=True, eps=1e-6):
        if padding is None:
            padding = kernel_size // 2
        super().__init__(in_channel, out_channels, kernel_size,
                         stride=stride, padding=padding, dilation=dilation,
                         groups=groups, bias=bias)
        self.eps = eps

    def forward(self, x):
        weight = F.batch_norm(
            self.weight.reshape(1, self.out_channels, -1), None, None,
            training=True, momentum=0.0, eps=self.eps
        ).reshape_as(self.weight)
        return F.conv2d(x, weight, self.bias, self.stride, self.padding,
                        self.dilation, self.groups)


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)
                           ).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def to_2tuple(x):
    return tuple(x) if isinstance(x, (tuple, list)) else (x, x)


class Mlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **kw):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop = nn.Dropout(drop if isinstance(drop, float) else drop[0])

    def forward(self, x):
        return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))


class _VitAttention(nn.Module):
    def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                 proj_drop=0.0):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.attn_drop = nn.Dropout(attn_drop)
        self.proj = nn.Linear(dim, dim)
        self.proj_drop = nn.Dropout(proj_drop)

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, 3, self.num_heads,
                                  c // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = self.attn_drop(attn.softmax(dim=-1))
        x = (attn @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj_drop(self.proj(x))


class Block(nn.Module):
    """timm ViT block (pre-norm MHSA + MLP)."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False,
                 drop=0.0, attn_drop=0.0, drop_path=0.0,
                 act_layer=nn.GELU, norm_layer=nn.LayerNorm, **kw):
        super().__init__()
        self.norm1 = norm_layer(dim)
        self.attn = _VitAttention(dim, num_heads, qkv_bias, attn_drop, drop)
        self.drop_path = DropPath(drop_path)
        self.norm2 = norm_layer(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), act_layer=act_layer,
                       drop=drop)

    def forward(self, x):
        x = x + self.drop_path(self.attn(self.norm1(x)))
        x = x + self.drop_path(self.mlp(self.norm2(x)))
        return x


class TimmStyleConvNeXt(nn.Module):
    """timm-compatible ConvNeXt, ``features_only`` semantics.

    Same architecture and state-dict names as timm's convnext (stem conv4
    + LN, per-stage downsample LN + conv2, blocks = dwconv7 -> LN ->
    fc1 -> GELU -> fc2 -> gamma, residual).  Returns [last-stage feature].
    """

    def __init__(self, depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                 out_indices=(3,)):
        super().__init__()
        self.out_indices = out_indices
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4),
            nn.LayerNorm(dims[0], eps=1e-6),
        )
        self.stages = nn.ModuleList()
        for s, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2),
                )
            blocks = nn.ModuleList()
            for _ in range(depth):
                blk = nn.Module()
                blk.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
                blk.norm = nn.LayerNorm(dim, eps=1e-6)
                blk.mlp = nn.Module()
                blk.mlp.fc1 = nn.Linear(dim, 4 * dim)
                blk.mlp.fc2 = nn.Linear(4 * dim, dim)
                blk.gamma = nn.Parameter(torch.full((dim,), 1e-6))
                blocks.append(blk)
            stage.blocks = blocks
            self.stages.append(stage)

    def forward(self, x):                      # NCHW
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        feats = []
        for s, stage in enumerate(self.stages):
            if s > 0:
                x = stage.downsample[0](
                    x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](x)
            for blk in stage.blocks:
                inp = x
                h = blk.conv_dw(x).permute(0, 2, 3, 1)
                h = blk.norm(h)
                h = blk.mlp.fc2(F.gelu(blk.mlp.fc1(h)))
                h = blk.gamma * h
                x = inp + h.permute(0, 3, 1, 2)
            if s in self.out_indices:
                feats.append(x)
        return feats

    def timm_state_dict(self):
        """State dict with timm key names, for the flax converter."""
        sd = {}
        sd["stem.0.weight"] = self.stem[0].weight
        sd["stem.0.bias"] = self.stem[0].bias
        sd["stem.1.weight"] = self.stem[1].weight
        sd["stem.1.bias"] = self.stem[1].bias
        for s, stage in enumerate(self.stages):
            if s > 0:
                sd[f"stages.{s}.downsample.0.weight"] = \
                    stage.downsample[0].weight
                sd[f"stages.{s}.downsample.0.bias"] = \
                    stage.downsample[0].bias
                sd[f"stages.{s}.downsample.1.weight"] = \
                    stage.downsample[1].weight
                sd[f"stages.{s}.downsample.1.bias"] = \
                    stage.downsample[1].bias
            for b, blk in enumerate(stage.blocks):
                p = f"stages.{s}.blocks.{b}"
                sd[f"{p}.conv_dw.weight"] = blk.conv_dw.weight
                sd[f"{p}.conv_dw.bias"] = blk.conv_dw.bias
                sd[f"{p}.norm.weight"] = blk.norm.weight
                sd[f"{p}.norm.bias"] = blk.norm.bias
                sd[f"{p}.mlp.fc1.weight"] = blk.mlp.fc1.weight
                sd[f"{p}.mlp.fc1.bias"] = blk.mlp.fc1.bias
                sd[f"{p}.mlp.fc2.weight"] = blk.mlp.fc2.weight
                sd[f"{p}.mlp.fc2.bias"] = blk.mlp.fc2.bias
                sd[f"{p}.gamma"] = blk.gamma
        return sd


# ConvNeXt size used when the reference asks for convnext_base.  Tests can
# shrink this to keep CPU time sane; PoseNet only requires dims[-1]==1024
# via its hardcoded feature_channel.
CONVNEXT_KW = dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024))


def _timm_create_model(model_name="convnext_base", pretrained=False,
                       in_chans=3, features_only=False, out_indices=(3,),
                       **kw):
    assert "convnext" in model_name, model_name
    model = TimmStyleConvNeXt(out_indices=out_indices if features_only
                              else (3,), **CONVNEXT_KW)
    model.default_cfg = {"url": ""}
    return model


# ---------------------------------------------------------------------------
# torchvision stub (nearest Resize only)
# ---------------------------------------------------------------------------

class _InterpolationMode:
    NEAREST = "nearest"
    BILINEAR = "bilinear"


class _Resize(nn.Module):
    def __init__(self, size, interpolation="nearest", **kw):
        super().__init__()
        self.size = to_2tuple(size)
        self.mode = interpolation

    def forward(self, x):
        return F.interpolate(x, size=self.size, mode=self.mode)


# ---------------------------------------------------------------------------
# mmcv stub
# ---------------------------------------------------------------------------

class _MMConfig(dict):
    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = _MMConfig(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = _MMConfig(v) if isinstance(v, dict) else v


def _normal_init(module, mean=0.0, std=1.0, bias=0.0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


def _constant_init(module, val, bias=0.0):
    if hasattr(module, "weight") and module.weight is not None:
        nn.init.constant_(module.weight, val)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


# ---------------------------------------------------------------------------
# installer
# ---------------------------------------------------------------------------

def _module(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    if getattr(install_stubs, "_done", False):
        return
    install_stubs._done = True

    # timm ------------------------------------------------------------------
    timm = _module("timm", create_model=_timm_create_model)
    timm_models = _module("timm.models",
                          list_modules=lambda: ["convnext"])
    timm_models.__dict__["convnext"] = types.SimpleNamespace(
        default_cfgs={"convnext_base": {"url": ""}})
    timm.models = timm_models
    layers = _module("timm.models.layers", StdConv2d=StdConv2d,
                     trunc_normal_=nn.init.trunc_normal_,
                     DropPath=DropPath, to_2tuple=to_2tuple, Mlp=Mlp)
    timm_models.layers = layers
    _module("timm.layers", Mlp=Mlp, DropPath=DropPath,
            to_2tuple=to_2tuple, trunc_normal_=nn.init.trunc_normal_)
    registry = _module("timm.models.registry",
                       register_model=lambda fn: fn)
    timm_models.registry = registry
    vit = _module("timm.models.vision_transformer",
                  _cfg=lambda url="", **kw: dict(url=url, **kw),
                  Mlp=Mlp, Block=Block)
    timm_models.vision_transformer = vit

    # mmcv ------------------------------------------------------------------
    mmcv = _module("mmcv", Config=_MMConfig)
    cnn = _module("mmcv.cnn", normal_init=_normal_init,
                  constant_init=_constant_init)
    cnn.__path__ = []           # mark as package for mmcv.cnn.utils
    mmcv.cnn = cnn

    def _kaiming_init(module, a=0, mode="fan_out",
                      nonlinearity="relu", bias=0.0, distribution="normal"):
        if hasattr(module, "weight") and module.weight is not None:
            if distribution == "uniform":
                nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                         nonlinearity=nonlinearity)
            else:
                nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                        nonlinearity=nonlinearity)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    cnn.utils = _module("mmcv.cnn.utils", constant_init=_constant_init,
                        kaiming_init=_kaiming_init)

    class _Registry(dict):
        def register_module(self, name=None):
            def deco(cls):
                self[name or cls.__name__] = cls
                return cls
            return deco

        def get(self, name):
            return self[name]

    conv_layers = _Registry(Conv1d=nn.Conv1d, Conv2d=nn.Conv2d,
                            Conv3d=nn.Conv3d, Conv=nn.Conv2d)

    def _build_conv_layer(cfg, *args, **kwargs):
        cfg_ = dict(cfg or {"type": "Conv2d"})
        return conv_layers[cfg_.pop("type")](*args, **kwargs, **cfg_)

    _pad_layers = {"zero": nn.ZeroPad2d, "reflect": nn.ReflectionPad2d,
                   "replicate": nn.ReplicationPad2d}

    def _build_padding_layer(cfg, *args, **kwargs):
        cfg_ = dict(cfg)
        return _pad_layers[cfg_.pop("type")](*args, **kwargs, **cfg_)

    bricks = _module("mmcv.cnn.bricks")
    bricks.__path__ = []
    bricks.conv = _module("mmcv.cnn.bricks.conv",
                          CONV_LAYERS=conv_layers,
                          build_conv_layer=_build_conv_layer)
    bricks.padding = _module("mmcv.cnn.bricks.padding",
                             build_padding_layer=_build_padding_layer)
    cnn.bricks = bricks

    # pkg_resources (py312 venv lacks it; only a version lookup is made) ----
    try:
        import pkg_resources  # noqa: F401
    except ImportError:
        _module("pkg_resources",
                get_distribution=lambda name: types.SimpleNamespace(
                    version="1.0"))

    # numpy 2 removed maximum_sctype (reference RT_transform.py:297) --------
    if not hasattr(np, "maximum_sctype"):
        np.maximum_sctype = lambda t: np.float64

    # torchvision -----------------------------------------------------------
    tv = _module("torchvision")
    tvt = _module("torchvision.transforms", Resize=_Resize,
                  InterpolationMode=_InterpolationMode)
    tv.transforms = tvt

    # transforms3d ----------------------------------------------------------
    t3d = _module("transforms3d")
    t3d.euler = _module(
        "transforms3d.euler", euler2mat=_euler2mat, mat2euler=_mat2euler,
        euler2quat=_euler2quat, quat2euler=_quat2euler,
        _AXES2TUPLE=_AXES2TUPLE, _NEXT_AXIS=_NEXT_AXIS,
        _TUPLE2AXES=_TUPLE2AXES)
    t3d.quaternions = _module(
        "transforms3d.quaternions", mat2quat=_mat2quat, quat2mat=_quat2mat,
        qmult=_qmult, qinverse=_qinverse, axangle2quat=_axangle2quat,
        quat2axangle=_quat2axangle)
    t3d.axangles = _module("transforms3d.axangles",
                           axangle2mat=_axangle2mat,
                           mat2axangle=_mat2axangle)

    # detectron2 (only batch-norm aliases + a version constant are read) ----
    d2 = _module("detectron2")
    d2_layers = _module("detectron2.layers")
    d2_bn = _module("detectron2.layers.batch_norm",
                    BatchNorm2d=nn.BatchNorm2d,
                    FrozenBatchNorm2d=nn.BatchNorm2d,
                    NaiveSyncBatchNorm=nn.BatchNorm2d)
    d2_layers.batch_norm = d2_bn
    d2.layers = d2_layers
    d2_utils = _module("detectron2.utils")
    d2_utils.env = _module("detectron2.utils.env",
                           TORCH_VERSION=(2, 0))
    d2.utils = d2_utils

    # misc unused-at-runtime imports -----------------------------------------
    _module("ipdb", set_trace=lambda: None)
    _module("open3d")
    skimage = _module("skimage")
    skimage.color = _module("skimage.color")
    _module("DCNv3")          # compiled CUDA ext; only the _C path calls it
    _module("imgaug")
    _module("imgaug.augmenters")


_FLAGS_PARSED = False


def import_reference():
    """Install stubs, put /root/reference on sys.path, parse FLAGS with
    defaults, and return an importer: ``ref("network.PoseNet")``."""
    global _FLAGS_PARSED
    install_stubs()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    importlib.import_module("config.config")
    if not _FLAGS_PARSED:
        import absl.flags
        absl.flags.FLAGS(["ref_shim"], known_only=True)
        _FLAGS_PARSED = True
    return importlib.import_module

"""ViT-style map encoders / PnP heads (alternate `nocsmap_encoder=att` path).

Flax ports of network/attention_pnp_net.py: PatchEmbed + pre-norm
transformer blocks (timm Block semantics: LN -> MHSA -> residual,
LN -> MLP(4x, GELU) -> residual).  The sequence length is 64 patches — tiny,
so attention here is a handful of MXU matmuls; no flash/blockwise kernel is
warranted (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int = 8
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=jnp.float32)(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32)(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=jnp.float32)(
            x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        return x + h


class MAPTransformerEncoder(nn.Module):
    """64x64 coordinate map -> 8x8x256 feature via 3 ViT blocks.

    Reference MAPTransformerEncoer (attention_pnp_net.py:126-158).
    """

    img_size: int = 64
    patch_size: int = 8
    embed_dim: int = 256
    depth: int = 3
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = self.img_size // self.patch_size
        y = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        y = y.reshape(y.shape[0], n * n, self.embed_dim)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, n * n, self.embed_dim), jnp.float32)
        y = y + pos.astype(self.dtype)
        for i in range(self.depth):
            y = TransformerBlock(self.embed_dim, self.num_heads,
                                 dtype=self.dtype, name=f"block{i}")(y)
        y = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=jnp.float32, name="norm")(
            y.astype(jnp.float32)).astype(self.dtype)
        return y.reshape(y.shape[0], n, n, self.embed_dim)


class AttentionPnPNet(nn.Module):
    """ViT PnP head alternative (reference attention_pnp_net.py:36-124)."""

    img_size: int = 64
    patch_size: int = 8
    embed_dim: int = 192
    depth: int = 3
    num_heads: int = 8
    rot_dim: int = 6
    flat_op: str = "flatten"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_attention=None):
        feats = MAPTransformerEncoder(
            img_size=self.img_size, patch_size=self.patch_size,
            embed_dim=self.embed_dim, depth=self.depth,
            num_heads=self.num_heads, dtype=self.dtype,
            name="encoder")(x)
        b = feats.shape[0]
        flat_t = feats.reshape(b, -1, self.embed_dim)
        if self.flat_op == "flatten":
            flat = flat_t.transpose(0, 2, 1).reshape(b, -1)
        elif self.flat_op == "avg":
            flat = flat_t.mean(axis=1)
        elif self.flat_op == "avg-max":
            flat = jnp.concatenate([flat_t.mean(1), flat_t.max(1)], axis=-1)
        else:
            flat = jnp.concatenate(
                [flat_t.mean(1), flat_t.max(1), flat_t.min(1)], axis=-1)
        act = nn.gelu
        h = act(nn.Dense(1024, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc1")(flat))
        h = act(nn.Dense(256, dtype=self.dtype,
                         param_dtype=jnp.float32, name="fc2")(h))
        rot = nn.Dense(self.rot_dim, dtype=jnp.float32,
                       param_dtype=jnp.float32,
                       name="fc_r")(h.astype(jnp.float32))
        t2d = nn.Dense(2, dtype=jnp.float32, param_dtype=jnp.float32,
                       name="fc_t")(h.astype(jnp.float32))
        hz = act(nn.Dense(1024, dtype=self.dtype,
                          param_dtype=jnp.float32, name="fc1_z")(flat))
        hz = act(nn.Dense(256, dtype=self.dtype,
                          param_dtype=jnp.float32, name="fc2_z")(hz))
        z = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                     name="fc_z")(hz.astype(jnp.float32))
        return rot, jnp.concatenate([t2d, z], axis=-1), flat


class CrossAttentionBlock(nn.Module):
    dim: int
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv):
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=jnp.float32)(
            q.astype(jnp.float32)).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            param_dtype=jnp.float32)(h, kv)
        q = q + h
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False, dtype=jnp.float32)(
            q.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=jnp.float32)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return q + h


class CrossAttentionPnPNet(nn.Module):
    """Cross-attention PnP variant (reference attention_pnp_net.py:160+):
    learned queries cross-attend to coordinate-map patch tokens, then the
    pooled queries regress rot6d + (cx, cy, z)."""

    img_size: int = 64
    patch_size: int = 8
    embed_dim: int = 192
    depth: int = 3
    num_heads: int = 8
    num_queries: int = 16
    rot_dim: int = 6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_attention=None):
        n = self.img_size // self.patch_size
        kv = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                     strides=(self.patch_size, self.patch_size),
                     padding="VALID", dtype=self.dtype,
                     param_dtype=jnp.float32, name="patch_embed")(x)
        kv = kv.reshape(kv.shape[0], n * n, self.embed_dim)
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, n * n, self.embed_dim), jnp.float32)
        kv = kv + pos.astype(self.dtype)
        q = self.param("queries", nn.initializers.truncated_normal(0.02),
                       (1, self.num_queries, self.embed_dim), jnp.float32)
        q = jnp.broadcast_to(q, (kv.shape[0], self.num_queries,
                                 self.embed_dim)).astype(self.dtype)
        for i in range(self.depth):
            q = CrossAttentionBlock(self.embed_dim, self.num_heads,
                                    dtype=self.dtype, name=f"block{i}")(
                q, kv)
        feat = q.reshape(q.shape[0], -1).astype(jnp.float32)
        h = nn.gelu(nn.Dense(1024, name="fc1")(feat))
        h = nn.gelu(nn.Dense(256, name="fc2")(h))
        rot = nn.Dense(self.rot_dim, name="fc_r")(h)
        t2d = nn.Dense(2, name="fc_t")(h)
        z = nn.Dense(1, name="fc_z")(h)
        return rot, jnp.concatenate([t2d, z], axis=-1), feat

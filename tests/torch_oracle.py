"""Independent PyTorch oracle for the ViT layer math.

Implements the standard pre-norm ViT block and latent attention pooling with
the same published semantics the reference model relies on (timm Block /
AttentionPoolLatent): LN(eps=1e-6) -> MHA(qkv bias) -> residual,
LN -> MLP(exact GELU) -> residual. Used only by tests to cross-check the JAX
implementation with shared weights.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class OracleAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)

    def forward(self, x):
        B, N, D = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, self.head_dim)
        q, k, v = qkv.unbind(2)  # (B, N, H, hd)
        q = q.permute(0, 2, 1, 3)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, D)
        return self.proj(out)


class OracleMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class OracleBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = OracleAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class OracleAttentionPoolLatent(nn.Module):
    """Latent-query pooling: q from a learned latent, kv from the sequence,
    proj, then residual MLP over a LayerNorm; returns the pooled token."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.latent = nn.Parameter(torch.zeros(1, 1, dim))
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim, bias=True)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        B, N, D = x.shape
        q = self.q(self.latent.expand(B, -1, -1)).reshape(
            B, 1, self.num_heads, self.head_dim
        ).permute(0, 2, 1, 3)
        kv = self.kv(x).reshape(B, N, 2, self.num_heads, self.head_dim)
        k, v = kv.unbind(2)
        k = k.permute(0, 2, 1, 3)
        v = v.permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.head_dim ** -0.5
        attn = attn.softmax(dim=-1)
        y = (attn @ v).permute(0, 2, 1, 3).reshape(B, 1, D)
        y = self.proj(y)
        y = y + self.mlp(self.norm(y))
        return y[:, 0]


def t2n(t):
    return t.detach().numpy()


def set_linear(linear: nn.Linear, kernel, bias=None):
    """Load a flax Dense kernel (in, out) into a torch Linear."""
    with torch.no_grad():
        linear.weight.copy_(torch.from_numpy(kernel.T.copy()))
        if bias is not None:
            linear.bias.copy_(torch.from_numpy(bias.copy()))


def set_layernorm(ln: nn.LayerNorm, scale, bias):
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale.copy()))
        ln.bias.copy_(torch.from_numpy(bias.copy()))

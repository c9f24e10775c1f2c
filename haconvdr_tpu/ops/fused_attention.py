"""Fused short-sequence attention kernel (Pallas TPU).

The encoder's sequences are <= 512 tokens (max_concat_length,
src/train_HAConvDR_topiocqa.py:222), where XLA's unfused attention spends
most of its time writing/reading the [B, H, L, L] score tensor (measured
~20 ms per roberta-base layer at B=512, L=384 on v5e — 5x the matmul
cost).  The stock long-context flash kernel is slower here (its grid
machinery amortizes only at long L).

This kernel takes the FUSED QKV projection output in its natural
``[B, L, 3*H]`` layout — no head-split transposes and no q/k/v slicing at
the XLA level (each of those is a full HBM rewrite of the activations;
together they cost ~60 ms per 12-layer pass at B=512, L=384) — and
computes one batch row per grid cell entirely in VMEM: per head,
QK^T -> additive padding bias -> softmax -> PV, writing back the
``[B, L, H]`` context ready for the output projection.  Exactly the same
math as the XLA path in f32 accumulation; no dropout (callers fall back
to XLA attention when attention-probs dropout is active).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attn_kernel(qkv_ref, bias_ref, o_ref, *, num_heads: int, scale: float):
    # one batch row per grid cell, heads unrolled in-kernel (per-cell
    # grid overhead would otherwise dominate at ~6k tiny cells)
    H3 = qkv_ref.shape[2]
    H = H3 // 3
    d = H // num_heads
    bias = bias_ref[0]  # [1, L], broadcast over score rows
    qkv = qkv_ref[0]  # [L, 3H]
    for h in range(num_heads):
        q = qkv[:, h * d : (h + 1) * d]  # [L, d]
        k = qkv[:, H + h * d : H + (h + 1) * d]
        v = qkv[:, 2 * H + h * d : 2 * H + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [L, L]
        s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d : (h + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_attention_qkv(
    qkv: jax.Array,  # [B, L, 3H] — fused projection output, head-interleaved
    attention_mask: jax.Array,  # [B, L] 1=real 0=pad
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:
    """Returns the attention context in [B, L, H] layout."""
    B, L, H3 = qkv.shape
    H = H3 // 3
    scale = 1.0 / math.sqrt(H // num_heads)
    # [B, 1, L]: the singleton middle dim satisfies the TPU block-shape rule
    bias = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]

    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, L, H3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, L, H), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, H), qkv.dtype),
        interpret=interpret,
    )(qkv, bias)


def fused_attention(
    q: jax.Array,  # [B, H, L, d]
    k: jax.Array,
    v: jax.Array,
    attention_mask: jax.Array,  # [B, L] 1=real 0=pad
    interpret: bool = False,
) -> jax.Array:
    """Head-split-layout wrapper kept for tests/back-compat; the encoder's
    hot path uses :func:`fused_attention_qkv` (no transposes)."""
    B, H, L, d = q.shape

    def merge(t):  # [B, H, L, d] -> [B, L, H*d]
        return t.transpose(0, 2, 1, 3).reshape(B, L, H * d)

    qkv = jnp.concatenate([merge(q), merge(k), merge(v)], axis=-1)
    ctx = fused_attention_qkv(qkv, attention_mask, H, interpret=interpret)
    return ctx.reshape(B, L, H, d).transpose(0, 2, 1, 3)


def fused_attention_supported(
    L: int, d: int, num_heads: int = 12, itemsize: int = 2
) -> bool:
    """TPU-only; VMEM sanity for :func:`fused_attention_qkv`'s per-grid-cell
    footprint: the double-buffered [1, L, 3H] qkv block and [1, L, H] out
    block (in the compute dtype) plus the per-head f32 score/prob tiles
    [L, L].  Budget 10 MB of the 16 MB v5e VMEM (slack for Mosaic's own
    staging): admits the measured-working shapes (L=384/512 bf16 at
    H=768) and rejects f32 at those lengths (~11-17 MB modeled), which
    fall back to exact XLA attention — ``use_flash_attention`` can default
    on safely."""
    if jax.devices()[0].platform != "tpu":
        return False
    H = num_heads * d
    vmem_bytes = (
        2 * L * 3 * H * itemsize  # qkv in, double-buffered
        + 2 * L * H * itemsize  # context out, double-buffered
        + 2 * L * L * 4  # scores + probs, f32
        + 4 * L * d * itemsize  # per-head q/k/v/o slices
    )
    return L % 128 == 0 and d % 64 == 0 and vmem_bytes < 10 * 1024 * 1024

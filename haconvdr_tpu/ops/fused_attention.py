"""Fused short-sequence attention kernel (Pallas TPU).

The encoder's sequences are <= 512 tokens (max_concat_length,
src/train_HAConvDR_topiocqa.py:222), where XLA's unfused attention spends
most of its time writing/reading the [B, H, L, L] score tensor (measured
~20 ms per roberta-base layer at B=512, L=384 on v5e — 5x the matmul
cost).  The stock long-context flash kernel is slower here (its grid
machinery amortizes only at long L).  This kernel computes one (batch,
head) cell entirely in VMEM: QK^T -> additive padding bias -> softmax ->
PV, no HBM score traffic.  Exactly the same math as the XLA path in f32
accumulation; no dropout (callers fall back to XLA attention when
attention-probs dropout is active).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    # one batch row per grid cell, all heads unrolled in-kernel (per-cell
    # grid overhead would otherwise dominate at ~6k tiny cells)
    H = q_ref.shape[1]
    bias = bias_ref[0]  # [1, L], broadcast over score rows
    for h in range(H):
        q = q_ref[0, h]  # [L, d]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [L, L]
        s = s + bias
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array,  # [B, H, L, d]
    k: jax.Array,
    v: jax.Array,
    attention_mask: jax.Array,  # [B, L] 1=real 0=pad
    interpret: bool = False,
) -> jax.Array:
    B, H, L, d = q.shape
    scale = 1.0 / math.sqrt(d)
    # [B, 1, L]: the singleton middle dim satisfies the TPU block-shape rule
    bias = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]

    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, L, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, L, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, L, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, L, d), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, L, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def fused_attention_supported(L: int, d: int) -> bool:
    """VMEM sanity: score tile [L, L] f32 + operands must fit comfortably."""
    vmem_bytes = L * L * 4 + 3 * L * d * 4 + L * d * 4
    return L % 128 == 0 and d % 64 == 0 and vmem_bytes < 8 * 1024 * 1024

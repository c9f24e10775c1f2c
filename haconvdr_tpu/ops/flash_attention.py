"""Differentiable fused attention (Pallas TPU) with in-kernel dropout.

The TRAINED query tower (src/train_HAConvDR_topiocqa.py:125 trains the
query encoder in torch train mode) previously ran XLA attention because
the inference kernel (ops/fused_attention.py) is non-differentiable and
has no dropout.  At the reference geometry (B=64, L=512, H=768, 12
layers) the XLA path materializes the [B, H, L, L] float32 score/prob
tensors in HBM — ~800 MB per tensor per layer — in the forward, again
in the backward, and a third time under remat recompute; the round-3
bisect (NOTES.md) measured attention-probs dropout alone at 43% of the
642 ms step because the masks cover those same [B, H, L, L] elements.

This kernel keeps the whole per-(batch-row, head) attention in VMEM for
both the forward and the custom-VJP backward:

  forward  (grid (B,)):  per head  QK^T -> +mask bias -> softmax(f32)
            -> [optional dropout] -> PV -> write [B, L, H] context;
  backward (grid (B, head-chunks)): recomputes softmax from the saved
            primal inputs (bit-identical: same ops, same dtypes), then
            dV = p~^T dO, dp~ = dO V^T, softmax VJP, dQ = dS K * scale,
            dK = dS^T Q * scale — nothing [L, L]-shaped ever touches HBM.

Dropout masks come from a stateless counter-based hash (murmur3
finalizer rounds over element-index ^ per-(layer-key, batch-row, head)
seeds, see _keep_mask): layout-independent, so the backward regenerates
the exact forward mask with no mask ever stored, and it runs under
Pallas interpret mode, so the whole dropout path is CPU-testable.
Keep-rate quantization is 2^-32.  The layer seed derives from the same
per-layer threefry dropout keys the XLA path uses (models/encoder.py),
so runs stay deterministic per TrainState rng.

Residuals are exactly the primal inputs, so under ``jax.checkpoint``
this kernel adds zero checkpointed memory, and WITHOUT remat the only
per-layer activation is the [B, L, 3H] projection — small enough that
reference-geometry training fits on one chip with remat off.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _keep_thresh(drop_rate: float) -> int:
    """uint32 threshold: keep iff bits < thresh (quantization 2^-32)."""
    keep = 1.0 - drop_rate
    return min(2**32 - 1, int(round(keep * 2**32)))


# The dropout mask is a STATELESS counter-based hash, not the TPU
# hardware PRNG: tpu.prng_random_bits draws depend on the compiler-chosen
# vector layout, so a forward kernel and a differently-structured backward
# kernel do NOT reproduce the same stream from the same seed (measured:
# finite-difference grads through a fixed seed disagreed with the
# analytic VJP).  Hashing (element index ^ per-(layer,b,h) seed) with two
# murmur3 finalizer rounds is layout-independent by construction — the
# backward regenerates the exact forward mask — and also lowers in Pallas
# interpret mode, so the dropout path is CPU-testable.
_MIX0 = np.uint32(0x9E3779B9).astype(np.int32)  # golden-ratio odd constant
_MIX1 = np.uint32(0x85EBCA6B).astype(np.int32)  # murmur3 finalizer constant


def _seed_for(seed_ref, b, h, num_heads: int):
    """Mix the layer-key words with the (batch-row, head) coordinates:
    distinct (b, h) always yield distinct mixes of the same key.  All
    arithmetic is pinned to int32 so in-kernel values and the test
    oracle's python ints wrap identically (x64 mode would otherwise
    promote)."""
    idx = jnp.asarray(b * num_heads + h, jnp.int32)
    s0 = jnp.asarray(seed_ref[0], jnp.int32) + idx * _MIX0
    s1 = jnp.asarray(seed_ref[1], jnp.int32) ^ ((idx + jnp.int32(1)) * _MIX1)
    return s0, s1


def _fmix32(x):
    """murmur3 32-bit finalizer: full avalanche on sequential inputs."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _keep_mask(s0, s1, shape, thresh: int):
    """[shape] boolean keep mask: hash(element counter, seeds) < thresh."""
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    idx = (r * shape[1] + c).astype(jnp.uint32)
    h = _fmix32(idx ^ s0.astype(jnp.uint32))
    h = _fmix32(h ^ s1.astype(jnp.uint32))
    return h < jnp.uint32(thresh)


# ---------------------------------------------------------------------------
# Forward kernel: one batch row per grid cell, heads unrolled
# ---------------------------------------------------------------------------

def _fwd_kernel(
    seed_ref,  # SMEM scalar prefetch: [2] int32 (layer key words)
    qkv_ref,  # [1, L, 3H]
    bias_ref,  # [1, 1, L] f32 additive padding bias
    o_ref,  # [1, L, H]
    *,
    num_heads: int,
    scale: float,
    drop_rate: float,
):
    b = pl.program_id(0)
    qkv = qkv_ref[0]  # [L, 3H]
    bias = bias_ref[0]  # [1, L]
    H = qkv.shape[1] // 3
    d = H // num_heads
    for h in range(num_heads):
        q = qkv[:, h * d : (h + 1) * d]
        k = qkv[:, H + h * d : H + (h + 1) * d]
        v = qkv[:, 2 * H + h * d : 2 * H + (h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jax.nn.softmax(s, axis=-1)
        if drop_rate > 0.0:
            # the backward kernel rehashes (seed, b, h) and regenerates
            # this exact mask — nothing is stored
            keep = _keep_mask(
                *_seed_for(seed_ref, b, h, num_heads), s.shape,
                _keep_thresh(drop_rate),
            )
            p = jnp.where(keep, p * (1.0 / (1.0 - drop_rate)), 0.0)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h * d : (h + 1) * d] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "drop_rate", "interpret")
)
def _fwd_call(qkv, bias, seed, num_heads, drop_rate, interpret):
    B, L, H3 = qkv.shape
    H = H3 // 3
    scale = 1.0 / math.sqrt(H // num_heads)
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, num_heads=num_heads, scale=scale, drop_rate=drop_rate
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, L, H3), lambda b, s: (b, 0, 0)),
                pl.BlockSpec((1, 1, L), lambda b, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, L, H), lambda b, s: (b, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, H), qkv.dtype),
        interpret=interpret,
    )(seed, qkv, bias)


# ---------------------------------------------------------------------------
# Backward kernel: grid (B, head-chunks); q/k/v/do arrive pre-chunked via
# BlockSpecs over the SAME qkv operand (three views), so per-head slices
# inside the kernel are static and 128-lane-aligned blocks are fetched
# ---------------------------------------------------------------------------

def _bwd_kernel(
    seed_ref,  # SMEM scalar prefetch: [2] int32
    q_ref,  # [1, L, G*d] chunk of heads
    k_ref,
    v_ref,
    bias_ref,  # [1, 1, L]
    do_ref,  # [1, L, G*d]
    dq_ref,  # [1, L, G*d]
    dk_ref,
    dv_ref,
    *,
    heads_per_cell: int,
    num_heads: int,
    scale: float,
    drop_rate: float,
):
    b = pl.program_id(0)
    c = pl.program_id(1)
    qc, kc, vc, doc = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    bias = bias_ref[0]  # [1, L]
    G = heads_per_cell
    d = qc.shape[1] // G
    for j in range(G):
        sl = slice(j * d, (j + 1) * d)
        q, k, v, do = qc[:, sl], kc[:, sl], vc[:, sl], doc[:, sl]
        # recompute the forward probabilities — identical ops/dtypes, so
        # bit-identical to the forward pass
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jax.nn.softmax(s, axis=-1)
        if drop_rate > 0.0:
            keep = _keep_mask(
                *_seed_for(seed_ref, b, c * G + j, num_heads), s.shape,
                _keep_thresh(drop_rate),
            )
            inv = 1.0 / (1.0 - drop_rate)
            pt = jnp.where(keep, p * inv, 0.0)
        else:
            pt = p
        ptc = pt.astype(v.dtype)  # forward casts probs before PV
        # dV = p~^T dO   [L, d]
        dv = jax.lax.dot_general(
            ptc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dp~ = dO V^T   [L, L]
        dpt = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if drop_rate > 0.0:
            dp = jnp.where(keep, dpt * inv, 0.0)
        else:
            dp = dpt
        # softmax VJP: dS = p o (dp - sum_k dp_k p_k)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            dsc, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, sl] = (dq * scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _head_chunks(num_heads: int, d: int, H: int) -> int:
    """Largest chunk count (<= 4) that keeps the chunk width a multiple of
    128 lanes and a divisor of H — VMEM per backward cell shrinks with more
    chunks at the cost of refetching bias per cell (tiny)."""
    for c in (4, 3, 2, 1):
        if num_heads % c:
            continue
        w = (num_heads // c) * d
        if w % 128 == 0 and H % w == 0:
            return c
    return 1


@functools.partial(
    jax.jit, static_argnames=("num_heads", "drop_rate", "interpret")
)
def _bwd_call(qkv, bias, seed, do, num_heads, drop_rate, interpret):
    B, L, H3 = qkv.shape
    H = H3 // 3
    d = H // num_heads
    scale = 1.0 / math.sqrt(d)
    C = _head_chunks(num_heads, d, H)
    G = num_heads // C
    w = G * d  # chunk width
    kidx = H // w  # block-index offset of the K region in [q|k|v] layout
    vidx = 2 * H // w
    chunk = lambda off: pl.BlockSpec(
        (1, L, w), lambda b, c, s, off=off: (b, 0, off + c)
    )
    out_shape = jax.ShapeDtypeStruct((B, L, H), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_kernel, heads_per_cell=G, num_heads=num_heads, scale=scale,
            drop_rate=drop_rate,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, C),
            in_specs=[
                chunk(0),  # q view of qkv
                chunk(kidx),  # k view
                chunk(vidx),  # v view
                pl.BlockSpec((1, 1, L), lambda b, c, s: (b, 0, 0)),
                pl.BlockSpec((1, L, w), lambda b, c, s: (b, 0, c)),  # do
            ],
            out_specs=[
                pl.BlockSpec((1, L, w), lambda b, c, s: (b, 0, c)),
                pl.BlockSpec((1, L, w), lambda b, c, s: (b, 0, c)),
                pl.BlockSpec((1, L, w), lambda b, c, s: (b, 0, c)),
            ],
        ),
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(seed, qkv, qkv, qkv, bias, do)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_qkv_vjp(
    qkv, bias, seed, num_heads, drop_rate=0.0, interpret=False
):
    """Differentiable fused attention on the [B, L, 3H] projection output.

    ``bias`` is the additive f32 padding bias [B, 1, L]; ``seed`` a [2]
    int32 array (ignored when drop_rate == 0).  Returns [B, L, H] context
    in qkv.dtype.  Gradients flow to qkv only.
    """
    return _fwd_call(qkv, bias, seed, num_heads, drop_rate, interpret)


def _vjp_fwd(qkv, bias, seed, num_heads, drop_rate, interpret):
    out = _fwd_call(qkv, bias, seed, num_heads, drop_rate, interpret)
    return out, (qkv, bias, seed)


def _vjp_bwd(num_heads, drop_rate, interpret, res, g):
    qkv, bias, seed = res
    dq, dk, dv = _bwd_call(
        qkv, bias, seed, g.astype(qkv.dtype), num_heads, drop_rate, interpret
    )
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return (
        dqkv,
        jnp.zeros_like(bias),
        np.zeros(res[2].shape, jax.dtypes.float0),
    )


flash_attention_qkv_vjp.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Encoder-facing entry points
# ---------------------------------------------------------------------------

def rng_to_seed(rng) -> jax.Array:
    """Per-layer threefry dropout key -> [2] int32 hardware-PRNG seed."""
    if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(rng)
    else:
        data = rng
    return jax.lax.bitcast_convert_type(
        data.reshape(-1)[:2].astype(jnp.uint32), jnp.int32
    )


def flash_attention(
    qkv: jax.Array,  # [B, L, 3H]
    attention_mask: jax.Array,  # [B, L] 1=real 0=pad
    num_heads: int,
    dropout_rng=None,
    drop_rate: float = 0.0,
    interpret: bool = False,
) -> jax.Array:
    """Trainable-tower attention: differentiable, dropout fused in-kernel."""
    bias = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[:, None, :]
    if dropout_rng is None or drop_rate <= 0.0:
        seed = jnp.zeros((2,), jnp.int32)
        drop_rate = 0.0
    else:
        seed = rng_to_seed(dropout_rng)
    return flash_attention_qkv_vjp(
        qkv, bias, seed, num_heads, float(drop_rate), interpret
    )


def flash_vjp_supported(
    L: int, d: int, num_heads: int = 12, itemsize: int = 2
) -> bool:
    """TPU-only; VMEM sanity covering BOTH kernels.  Forward cell: the
    double-buffered [1, L, 3H] qkv + [1, L, H] out blocks plus per-head
    f32 score/prob tiles and the uint32 dropout bits.  Backward cell (the
    larger one when chunking is unavailable): 8 double-buffered [1, L, w]
    chunks plus ~5 [L, L] f32 scratch tiles.  Budget 12 MB of the 16 MB
    v5e VMEM: admits bf16 at L<=512/H=768 (the trained-tower geometry)
    and rejects f32 at L=512, which falls back to XLA attention."""
    if not (jax.devices() and jax.devices()[0].platform == "tpu"):
        return False
    H = num_heads * d
    if L % 128 or d % 64:
        return False
    C = _head_chunks(num_heads, d, H)
    w = (num_heads // C) * d
    fwd = 2 * L * 3 * H * itemsize + 2 * L * H * itemsize + 3 * L * L * 4
    bwd = 2 * 8 * L * w * itemsize + 5 * L * L * 4
    return max(fwd, bwd) < 12 * 1024 * 1024

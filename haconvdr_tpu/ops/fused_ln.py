"""Fused (residual +) LayerNorm Pallas kernel (TPU, inference path).

The corpus-encode step's non-matmul tail is dominated by LayerNorm: 25
passes over the [B, L, 768] activations per encode (12 layers x 2 + the
embeddings LN), each computed by XLA as its own multi-pass fusion (read
for mean, read for variance, read+write for the normalize), plus the
separate residual-add fusion feeding it — measured 84 ms of the 259 ms
B=512/L=384 step (probes/probe_encode_bisect.py; BASELINE.md
speed-of-light row).  This is the reference's gen_doc_embeddings.py hot
loop (:65-158), the longest-running job in the system at 25.7M-54.6M
passages.

Two kernels:

``fused_residual_ln`` computes ``LayerNorm(x + residual)`` in ONE pass
over HBM: read x, read residual, one in-VMEM f32 mean/var per row, write
the normalized bf16 output — 3 HBM touches instead of ~6-7.  Measured
1.84x at the micro level (484 vs 263 GB/s effective at [196608, 768]) but
NEUTRAL in the full int8 encode step (0.983x): XLA was already fusing the
LN passes with the neighbouring dequant/quant elementwise work, and the
pallas_call is a fusion barrier that gives that back.

``fused_residual_ln_quant`` is the structural fix: the LN output's sole
consumer in the int8 corpus tower is the next int8 dense's DYNAMIC
per-token activation quantization (models/encoder._dense: an abs-max
read pass + a quantize read+write pass over the same [B, L, H] tensor the
LN just wrote).  Folding it in, the boundary becomes: read x (2B), read
branch (2B), write y bf16 (2B), write y int8 (1B), write row scales (~0)
= 7 B/elem, vs ~17 B/elem for the XLA chain (residual-add fusion +
multi-pass LN + abs-max + quantize).  The consuming dense takes the
prequantized ``(yq, ys)`` and skips straight to the int8 MXU matmul.

Numerics match models/encoder by construction: the residual add happens
in the carry dtype (bf16) first, statistics and the affine run in f32,
the result casts back to the carry dtype, and the quantization reads the
bf16-roundtripped y exactly as ``_dense`` reads the bf16 carry.
Inference-only (no custom VJP): the encoder routes through it only when
no gradients can flow (frozen/corpus towers — exactly where the
25.7M-passage hours go).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROW_TILES = (1024, 512, 384, 256, 128, 64, 32, 16, 8)


def _ln_body(x_ref, s_ref, b_ref, *, eps: float, r_ref=None):
    x = x_ref[...]
    if r_ref is not None:
        # match the unfused path bit-for-bit: the residual add runs in the
        # carry dtype (x + out.astype(x.dtype), models/encoder.py layer_fn)
        x = x + r_ref[...].astype(x.dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * s_ref[...] + b_ref[...]


def _kernel_with_res(x_ref, r_ref, s_ref, b_ref, o_ref, *, eps):
    o_ref[...] = _ln_body(x_ref, s_ref, b_ref, eps=eps, r_ref=r_ref).astype(
        o_ref.dtype
    )


def _kernel_no_res(x_ref, s_ref, b_ref, o_ref, *, eps):
    o_ref[...] = _ln_body(x_ref, s_ref, b_ref, eps=eps).astype(o_ref.dtype)


def _quant_tail(y, o_ref, q_ref, sc_ref):
    """Write y (carry dtype) + its per-row symmetric int8 quantization.

    The quantize reads the bf16-ROUNDTRIPPED y — bit-identical to the
    unfused path, where _dense quantizes the bf16 carry it receives
    (encoder.py:124-128: xf = x.astype(f32); xs = max(rowmax|xf|, 1e-30);
    xq = clip(round(xf/xs*127)))."""
    yb = y.astype(o_ref.dtype)
    o_ref[...] = yb
    yf = yb.astype(jnp.float32)
    ys = jnp.maximum(jnp.max(jnp.abs(yf), axis=-1, keepdims=True), 1e-30)
    q_ref[...] = jnp.clip(jnp.round(yf / ys * 127.0), -127, 127).astype(jnp.int8)
    sc_ref[...] = ys


def _kernel_with_res_q(x_ref, r_ref, s_ref, b_ref, o_ref, q_ref, sc_ref, *, eps):
    _quant_tail(_ln_body(x_ref, s_ref, b_ref, eps=eps, r_ref=r_ref),
                o_ref, q_ref, sc_ref)


def _kernel_no_res_q(x_ref, s_ref, b_ref, o_ref, q_ref, sc_ref, *, eps):
    _quant_tail(_ln_body(x_ref, s_ref, b_ref, eps=eps), o_ref, q_ref, sc_ref)


def _row_tile(rows: int) -> int:
    for t in _ROW_TILES:
        if rows % t == 0:
            return t
    return 0


def fused_ln_supported(shape, hidden: int = 768) -> bool:
    """TPU-only; needs a lane-aligned hidden dim and a row count divisible
    by one of the sublane-aligned tile sizes.  Unsupported shapes fall back
    to the XLA path (same math, more HBM passes)."""
    if jax.devices()[0].platform != "tpu":
        return False
    rows = 1
    for d in shape[:-1]:
        rows *= d
    return shape[-1] == hidden and hidden % 128 == 0 and _row_tile(rows) > 0


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def fused_residual_ln(
    x: jax.Array,  # [..., H] carry activations
    residual,  # [..., H] branch output to add (None = plain LN), any dtype
    scale: jax.Array,  # [H] f32
    bias: jax.Array,  # [H] f32
    eps: float = 1e-12,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """``LayerNorm(x + residual)`` in one HBM pass; see module docstring."""
    H = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    tr = _row_tile(rows)
    assert tr > 0 and H % 128 == 0, (rows, H)
    out_dtype = x.dtype if out_dtype is None else out_dtype

    x2 = x.reshape(rows, H)
    s2 = scale.astype(jnp.float32).reshape(1, H)
    b2 = bias.astype(jnp.float32).reshape(1, H)
    row_spec = pl.BlockSpec((tr, H), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, H), lambda i: (0, 0))
    if residual is not None:
        r2 = residual.reshape(rows, H)
        out = pl.pallas_call(
            functools.partial(_kernel_with_res, eps=eps),
            grid=(rows // tr,),
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((rows, H), out_dtype),
            interpret=interpret,
        )(x2, r2, s2, b2)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_no_res, eps=eps),
            grid=(rows // tr,),
            in_specs=[row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((rows, H), out_dtype),
            interpret=interpret,
        )(x2, s2, b2)
    return out.reshape(*lead, H)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def fused_residual_ln_quant(
    x: jax.Array,  # [..., H] carry activations
    residual,  # [..., H] branch output to add (None = plain LN), any dtype
    scale: jax.Array,  # [H] f32
    bias: jax.Array,  # [H] f32
    eps: float = 1e-12,
    out_dtype=None,
    interpret: bool = False,
):
    """``y = LayerNorm(x + residual)`` plus y's dynamic per-row int8
    quantization, all in one HBM pass.  Returns ``(y, yq, ys)`` where
    ``yq`` int8 [..., H] and ``ys`` f32 [..., 1] feed the consuming int8
    dense via its ``prequant`` argument (models/encoder._dense), replacing
    its own abs-max + quantize passes over y.  See module docstring."""
    H = x.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    tr = _row_tile(rows)
    assert tr > 0 and H % 128 == 0, (rows, H)
    out_dtype = x.dtype if out_dtype is None else out_dtype

    x2 = x.reshape(rows, H)
    s2 = scale.astype(jnp.float32).reshape(1, H)
    b2 = bias.astype(jnp.float32).reshape(1, H)
    row_spec = pl.BlockSpec((tr, H), lambda i: (i, 0))
    vec_spec = pl.BlockSpec((1, H), lambda i: (0, 0))
    out_specs = [
        row_spec,
        row_spec,
        pl.BlockSpec((tr, 1), lambda i: (i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, H), out_dtype),
        jax.ShapeDtypeStruct((rows, H), jnp.int8),
        jax.ShapeDtypeStruct((rows, 1), jnp.float32),
    ]
    if residual is not None:
        r2 = residual.reshape(rows, H)
        y, yq, ys = pl.pallas_call(
            functools.partial(_kernel_with_res_q, eps=eps),
            grid=(rows // tr,),
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, r2, s2, b2)
    else:
        y, yq, ys = pl.pallas_call(
            functools.partial(_kernel_no_res_q, eps=eps),
            grid=(rows // tr,),
            in_specs=[row_spec, vec_spec, vec_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x2, s2, b2)
    return (
        y.reshape(*lead, H),
        yq.reshape(*lead, H),
        ys.reshape(*lead, 1),
    )

"""Fused int8 MLP-block Pallas kernel (TPU, inference towers).

The int8 corpus-encode bisect (probes/probe_encode_bisect_int8.py) puts
the step at 61% of its int8 matmul floor, with the dominant non-matmul
slice at the MLP's [B*L, 3072] boundary: XLA materializes the
intermediate dense output, reads it for the gelu, reads the gelu output
twice more for the next dense's dynamic quantization (abs-max pass +
quantize pass), and writes the int8 copy — ~10.7 ms per pass standalone,
x12 layers.  This is the reference's gen_doc_embeddings.py hot loop
(:65-158) at 25.7M-54.6M passages.

Both MLP weight matrices fit in VMEM as int8 (768x3072 = 2.25 MiB each),
so this kernel computes the ENTIRE MLP block of models/encoder.mlp_fn in
one HBM pass over the activations:

    y1 = dot(xq, W1)_int32 -> dequant -> +b1 -> bf16     (intermediate)
    g  = gelu_tanh(y1)                                    (bf16)
    gq, gs = dynamic per-row int8 quantize of g
    y2 = dot(gq, W2)_int32 -> dequant -> +b2              (f32)
    t  = x + bf16(y2)                                     (residual, carry dtype)
    y  = LayerNorm_f32(t) -> bf16                         (next carry)
    yq, ys = dynamic per-row int8 quantize of y           (next qkv prequant)

HBM traffic per row tile: read x (2B/elem) + xq (1B) + write y (2B) +
yq (1B) over [rows, 768] — the [rows, 3072] intermediate never leaves
VMEM.  Numerics are op-for-op the unfused composition
(models/encoder.py: _dense int8 branch, _gelu bf16-tanh, _layer_norm
f32 internals, quantize-from-bf16-roundtrip), so the f32-ground-truth
control in probes/probe_fused_ln_tpu.py applies unchanged.  Inference
only (no VJP): the encoder routes through it only on frozen int8 towers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from haconvdr_tpu.ops.fused_ln import _row_tile

# rows per grid cell: VMEM holds W1+W2 (4.5 MiB int8) + the f32
# [TILE, 3072] intermediate (1.5 MiB at 128) + double-buffered row blocks
_TILE = 128


def _quantize_rows(gf):
    """_dense's dynamic per-token symmetric int8 quantization
    (models/encoder.py:124-128), f32 in."""
    gs = jnp.maximum(jnp.max(jnp.abs(gf), axis=-1, keepdims=True), 1e-30)
    gq = jnp.clip(jnp.round(gf / gs * 127.0), -127, 127).astype(jnp.int8)
    return gq, gs


def _mlp_kernel(
    x_ref, xq_ref, xs_ref,
    w1_ref, s1_ref, b1_ref,
    w2_ref, s2_ref, b2_ref,
    lns_ref, lnb_ref,
    y_ref, yq_ref, ys_ref,
    *, eps: float,
):
    xq = xq_ref[...]
    xs = xs_ref[...]  # [T, 1] f32

    # intermediate dense: int8 x int8 -> int32, dequant, bias, bf16 cast
    y1 = jax.lax.dot_general(
        xq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y1 = y1.astype(jnp.float32) * (xs / 127.0) * s1_ref[...] + b1_ref[...]
    g = jax.nn.gelu(y1.astype(jnp.bfloat16), approximate=True)

    # dynamic per-row quantize of the gelu output (from the bf16
    # roundtrip, exactly as the unfused _dense reads the bf16 tensor)
    gq, gs = _quantize_rows(g.astype(jnp.float32))

    # output dense: int8 x int8 -> int32, dequant, bias (f32 — the
    # unfused _dense has out_dtype=None here)
    y2 = jax.lax.dot_general(
        gq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y2 = y2.astype(jnp.float32) * (gs / 127.0) * s2_ref[...] + b2_ref[...]

    # residual in the carry dtype, LN in f32, affine, bf16 out
    t = x_ref[...] + y2.astype(x_ref.dtype)
    tf = t.astype(jnp.float32)
    mean = jnp.mean(tf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(tf - mean), axis=-1, keepdims=True)
    y = (tf - mean) * jax.lax.rsqrt(var + eps)
    y = y * lns_ref[...] + lnb_ref[...]

    yb = y.astype(y_ref.dtype)
    y_ref[...] = yb
    yq, ys = _quantize_rows(yb.astype(jnp.float32))
    yq_ref[...] = yq
    ys_ref[...] = ys


def fused_mlp_supported(rows: int, hidden: int, inter: int) -> bool:
    """TPU-only; lane-aligned dims; rows divisible by the row tile; VMEM
    sanity (int8 weights + f32 intermediate + double-buffered row blocks
    under a 12 MB budget of the 16 MB v5e VMEM)."""
    if jax.devices()[0].platform != "tpu":
        return False
    if hidden % 128 or inter % 128 or rows % _TILE:
        return False
    vmem = (
        hidden * inter * 2  # W1 + W2 int8
        + _TILE * inter * (4 + 2 + 1)  # y1 f32, g bf16, gq int8
        + 2 * _TILE * hidden * (2 + 1)  # x + xq blocks, double-buffered
        + 2 * _TILE * hidden * (2 + 1)  # y + yq blocks, double-buffered
    )
    return vmem < 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "interpret"))
def fused_mlp_block(
    x: jax.Array,  # [..., H] bf16 carry (residual input)
    xq: jax.Array,  # [..., H] int8 prequant of x
    xs: jax.Array,  # [..., 1] f32 prequant row scales
    w1: jax.Array,  # [H, I] int8
    w1_scale: jax.Array,  # [I] f32 per-out-channel kernel_scale
    #                       (quantize_encoder_params convention)
    b1: jax.Array,  # [I] f32
    w2: jax.Array,  # [I, H] int8
    w2_scale: jax.Array,  # [H] f32
    b2: jax.Array,  # [H] f32
    ln_scale: jax.Array,  # [H] f32
    ln_bias: jax.Array,  # [H] f32
    eps: float = 1e-12,
    out_dtype=None,
    interpret: bool = False,
):
    """The whole encoder MLP block in one kernel; returns ``(y, yq, ys)``
    — the next layer carry and its qkv prequant.  See module docstring."""
    H = x.shape[-1]
    I = w1.shape[-1]
    lead = x.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    assert rows % _TILE == 0 and H % 128 == 0 and I % 128 == 0, (rows, H, I)
    out_dtype = x.dtype if out_dtype is None else out_dtype

    x2 = x.reshape(rows, H)
    xq2 = xq.reshape(rows, H)
    xs2 = xs.reshape(rows, 1)

    row_h = pl.BlockSpec((_TILE, H), lambda i: (i, 0))
    row_1 = pl.BlockSpec((_TILE, 1), lambda i: (i, 0))
    w1_spec = pl.BlockSpec((H, I), lambda i: (0, 0))
    w2_spec = pl.BlockSpec((I, H), lambda i: (0, 0))
    vec_i = pl.BlockSpec((1, I), lambda i: (0, 0))
    vec_h = pl.BlockSpec((1, H), lambda i: (0, 0))

    y, yq, ys = pl.pallas_call(
        functools.partial(_mlp_kernel, eps=eps),
        grid=(rows // _TILE,),
        in_specs=[
            row_h, row_h, row_1,
            w1_spec, vec_i, vec_i,
            w2_spec, vec_h, vec_h,
            vec_h, vec_h,
        ],
        out_specs=[row_h, row_h, row_1],
        out_shape=[
            jax.ShapeDtypeStruct((rows, H), out_dtype),
            jax.ShapeDtypeStruct((rows, H), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        x2, xq2, xs2,
        w1, w1_scale.astype(jnp.float32).reshape(1, I),
        b1.astype(jnp.float32).reshape(1, I),
        w2, w2_scale.astype(jnp.float32).reshape(1, H),
        b2.astype(jnp.float32).reshape(1, H),
        ln_scale.astype(jnp.float32).reshape(1, H),
        ln_bias.astype(jnp.float32).reshape(1, H),
    )
    return (
        y.reshape(*lead, H),
        yq.reshape(*lead, H),
        ys.reshape(*lead, 1),
    )

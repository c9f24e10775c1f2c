"""Fused residual+LayerNorm kernel (ops/fused_ln.py) vs the encoder's
_layer_norm reference path — exact semantics: add in the carry dtype,
statistics in f32, affine in f32, cast back."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haconvdr_tpu.models.encoder import _layer_norm
from haconvdr_tpu.ops.fused_ln import (
    _row_tile,
    fused_ln_supported,
    fused_residual_ln,
    fused_residual_ln_quant,
)


def _ref(x, res, scale, bias, eps, out_dtype):
    p = {"scale": scale, "bias": bias}
    if res is not None:
        x = x + res.astype(x.dtype)
    return _layer_norm(x, p, eps, out_dtype=out_dtype)


@pytest.mark.parametrize("shape", [(4, 16, 256), (8, 128), (2, 3, 8, 128)])
@pytest.mark.parametrize("res_dtype", [None, jnp.bfloat16, jnp.float32])
def test_fused_residual_ln_matches_reference(shape, res_dtype):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    H = shape[-1]
    x = jax.random.normal(k1, shape, jnp.bfloat16) * 3.0
    res = (
        None
        if res_dtype is None
        else jax.random.normal(k2, shape, res_dtype)
    )
    scale = jax.random.normal(k3, (H,), jnp.float32) * 0.5 + 1.0
    bias = jax.random.normal(k4, (H,), jnp.float32) * 0.1
    got = fused_residual_ln(
        x, res, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16, interpret=True
    )
    want = _ref(x, res, scale, bias, 1e-5, jnp.bfloat16)
    assert got.dtype == jnp.bfloat16 and got.shape == x.shape
    # identical op sequence; only the f32 lane-reduction order may
    # differ, which can flip the final bf16 rounding by one ulp
    # (bf16 ulp = 2^-8 relative) — allow two
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2 ** -7, atol=2 ** -7,
    )


def test_fused_ln_f32_inputs():
    # embeddings LN: f32 input (sum of f32 gathers), bf16 out
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 8, 128), jnp.float32)
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = fused_residual_ln(
        x, None, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16, interpret=True
    )
    want = _ref(x, None, scale, bias, 1e-5, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2 ** -7, atol=2 ** -7,
    )


@pytest.mark.parametrize("with_res", [False, True])
def test_fused_ln_quant_matches_dense_quantize(with_res):
    """The quant outputs must be BIT-identical to what _dense computes
    from the bf16 y it receives (encoder.py int8 path): xf = y.astype(f32),
    xs = max(rowmax|xf|, 1e-30), xq = clip(round(xf/xs*127))."""
    shape = (4, 16, 256)
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    H = shape[-1]
    x = jax.random.normal(k1, shape, jnp.bfloat16) * 3.0
    res = jax.random.normal(k2, shape, jnp.bfloat16) if with_res else None
    scale = jax.random.normal(k3, (H,), jnp.float32) * 0.5 + 1.0
    bias = jax.random.normal(k4, (H,), jnp.float32) * 0.1

    y, yq, ys = fused_residual_ln_quant(
        x, res, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16, interpret=True
    )
    assert y.dtype == jnp.bfloat16 and yq.dtype == jnp.int8
    assert ys.shape == shape[:-1] + (1,)
    # y itself matches the plain fused kernel (same LN body)
    y_plain = fused_residual_ln(
        x, res, scale, bias, eps=1e-5, out_dtype=jnp.bfloat16, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_plain, np.float32))
    # quantization: recompute _dense's math from the emitted bf16 y
    yf = np.asarray(y, np.float32)
    want_s = np.maximum(np.max(np.abs(yf), axis=-1, keepdims=True), 1e-30)
    want_q = np.clip(np.round(yf / want_s * 127.0), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(ys), want_s.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(yq), want_q)


def test_prequant_dense_matches_dynamic_quant_dense():
    """_dense(prequant=(xq, xs)) == _dense quantizing x itself when the
    prequant was produced by the same math (the fused-kernel contract)."""
    from haconvdr_tpu.models.encoder import _dense

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (8, 128), jnp.bfloat16) * 2.0
    w = jax.random.normal(k2, (128, 64), jnp.float32) * 0.05
    ws = jnp.max(jnp.abs(w), axis=0)
    p = {
        "kernel": jnp.clip(jnp.round(w / ws * 127.0), -127, 127).astype(jnp.int8),
        "kernel_scale": ws / 127.0,
        "bias": jnp.linspace(-0.1, 0.1, 64, dtype=jnp.float32),
    }
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
    xq = jnp.clip(jnp.round(xf / xs * 127.0), -127, 127).astype(jnp.int8)
    a = _dense(x, p, jnp.bfloat16, out_dtype=jnp.bfloat16)
    b = _dense(x, p, jnp.bfloat16, out_dtype=jnp.bfloat16, prequant=(xq, xs))
    np.testing.assert_array_equal(np.asarray(a, np.float32),
                                  np.asarray(b, np.float32))


def test_encoder_int8_cpu_path_unchanged():
    """use_fused_ln=True on int8 towers off-TPU must be a no-op (the
    fused-quant gate requires a TPU backend)."""
    from haconvdr_tpu.config import ModelConfig
    from haconvdr_tpu.models.encoder import (
        encode,
        init_encoder_params,
        quantize_encoder_params,
        stack_layer_params,
    )

    cfg_on = ModelConfig.tiny(dtype="bfloat16", use_fused_ln=True)
    cfg_off = ModelConfig.tiny(dtype="bfloat16", use_fused_ln=False)
    params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), cfg_on))
    qparams = quantize_encoder_params(params)
    ids = jnp.ones((2, 16), jnp.int32) * 5
    mask = jnp.ones((2, 16), jnp.int32)
    a = encode(qparams, cfg_on, ids, mask)
    b = encode(qparams, cfg_off, ids, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_row_tile_and_supported_gating():
    assert _row_tile(512 * 384) == 1024
    assert _row_tile(384) == 384
    assert _row_tile(7) == 0
    # CPU backend in tests: the encoder integration must gate itself off
    assert not fused_ln_supported((4, 16, 768))


def test_encoder_cpu_path_unchanged():
    """use_fused_ln=True off-TPU must be a no-op (XLA fallback)."""
    from haconvdr_tpu.config import ModelConfig
    from haconvdr_tpu.models.encoder import encode, init_encoder_params

    cfg_on = ModelConfig.tiny(dtype="bfloat16", use_fused_ln=True)
    cfg_off = ModelConfig.tiny(dtype="bfloat16", use_fused_ln=False)
    params = init_encoder_params(jax.random.PRNGKey(0), cfg_on)
    ids = jnp.ones((2, 16), jnp.int32) * 5
    mask = jnp.ones((2, 16), jnp.int32)
    a = encode(params, cfg_on, ids, mask)
    b = encode(params, cfg_off, ids, mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

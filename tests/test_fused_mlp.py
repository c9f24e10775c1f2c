"""Fused int8 MLP-block kernel (ops/fused_mlp.py) vs the encoder's
unfused composition — op-for-op: int8 dense (dynamic per-token act
quant), bf16-tanh gelu, int8 dense, residual add in the carry dtype,
f32-internal LayerNorm, quantize-from-bf16-roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np

from haconvdr_tpu.models.encoder import _dense, _gelu, _layer_norm
from haconvdr_tpu.ops.fused_mlp import _TILE, fused_mlp_block, fused_mlp_supported

H, I = 256, 512
ROWS = 2 * _TILE


def _quant_params(key, in_dim, out_dim):
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * 0.05
    ws = jnp.max(jnp.abs(w), axis=0)
    return {
        "kernel": jnp.clip(jnp.round(w / ws * 127.0), -127, 127).astype(jnp.int8),
        "kernel_scale": ws / 127.0,
        "bias": jnp.linspace(-0.1, 0.1, out_dim, dtype=jnp.float32),
    }


def _ref_mlp(x, xq, xs, p1, p2, lnp, eps):
    """models/encoder.mlp_fn's unfused math (inference: dropout no-op)."""
    inter = _gelu(
        _dense(x, p1, jnp.bfloat16, out_dtype=jnp.bfloat16, prequant=(xq, xs)),
        jnp.bfloat16,
    )
    out = _dense(inter, p2, jnp.bfloat16)
    t = x + out.astype(x.dtype)
    return _layer_norm(t, lnp, eps, out_dtype=jnp.bfloat16)


def test_fused_mlp_matches_unfused():
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(k[0], (ROWS, H), jnp.bfloat16) * 2.0
    xf = x.astype(jnp.float32)
    xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
    xq = jnp.clip(jnp.round(xf / xs * 127.0), -127, 127).astype(jnp.int8)
    p1 = _quant_params(k[1], H, I)
    p2 = _quant_params(k[2], I, H)
    lnp = {
        "scale": jax.random.normal(k[3], (H,), jnp.float32) * 0.3 + 1.0,
        "bias": jax.random.normal(k[4], (H,), jnp.float32) * 0.1,
    }
    eps = 1e-12

    y, yq, ys = fused_mlp_block(
        x, xq, xs,
        p1["kernel"], p1["kernel_scale"], p1["bias"],
        p2["kernel"], p2["kernel_scale"], p2["bias"],
        lnp["scale"], lnp["bias"],
        eps=eps, out_dtype=jnp.bfloat16, interpret=True,
    )
    want = _ref_mlp(x, xq, xs, p1, p2, lnp, eps)
    assert y.dtype == jnp.bfloat16 and yq.dtype == jnp.int8
    # The op sequence is IDENTICAL (verified: the kernel math replicated
    # whole-array in plain jnp is bit-equal to _ref_mlp).  What remains
    # between the pallas blocks and the monolithic XLA program is FMA/
    # reduction-order freedom, which flips occasional 1-ulp roundings in
    # the bf16 intermediates; a flip in y2 (~O(4), ulp 2^-6) passes
    # through the residual add as an ABSOLUTE delta, so small outputs
    # can't be held to a relative bound.  Allow ~2 carry ulps absolute
    # and require the flips to be rare.
    g, w = np.asarray(y, np.float32), np.asarray(want, np.float32)
    d = np.abs(g - w)
    np.testing.assert_allclose(g, w, rtol=2 ** -6, atol=0.07)
    assert (d > 2 ** -6 * (1.0 + np.abs(w))).mean() < 2e-3
    # the quant outputs must be _dense's math applied to the emitted y
    yf = np.asarray(y, np.float32)
    want_s = np.maximum(np.max(np.abs(yf), axis=-1, keepdims=True), 1e-30)
    want_q = np.clip(np.round(yf / want_s * 127.0), -127, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(ys), want_s.astype(np.float32))
    # round() at exact-half boundaries may flip with the 1-ulp y
    # differences; require <0.1% of codes to differ by <=1
    dq = np.abs(np.asarray(yq, np.int32) - want_q.astype(np.int32))
    assert dq.max() <= 1 and (dq > 0).mean() < 1e-3


def test_fused_mlp_supported_gating():
    # CPU backend in tests: must gate off
    assert not fused_mlp_supported(_TILE * 4, 768, 3072)

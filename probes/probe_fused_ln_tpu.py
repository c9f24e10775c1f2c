"""On-TPU validation of the fused residual+LN kernel (ops/fused_ln.py).

1. Kernel exactness at the encode shape [512*384, 768] vs the encoder's
   unfused _layer_norm path (bf16 out, <=1 ulp tolerance — f32 lane
   reduction order is the only permitted difference).
2. Full-encoder equivalence: encode() with use_fused_ln on vs off at the
   real corpus-encode geometry (12L/768, B=512, L=384, int8 towers).
3. Timing: encode step ms and Mtok/s, fused vs unfused, plus the plain
   LN micro time (25-pass tail estimate).

Run: PYTHONPATH=. python probes/probe_fused_ln_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import (
    _layer_norm,
    encode,
    init_encoder_params,
    quantize_encoder_params,
    stack_layer_params,
)
from haconvdr_tpu.ops.fused_ln import fused_residual_ln

assert jax.devices()[0].platform == "tpu", jax.devices()

B, L, H = 512, 384, 768

# --- 1. kernel exactness at encode shape ---
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
x = jax.random.normal(k1, (B, L, H), jnp.bfloat16) * 3.0
res = jax.random.normal(k2, (B, L, H), jnp.bfloat16)
scale = jax.random.normal(k3, (H,), jnp.float32) * 0.5 + 1.0
bias = jax.random.normal(k4, (H,), jnp.float32) * 0.1

got = fused_residual_ln(x, res, scale, bias, eps=1e-12, out_dtype=jnp.bfloat16)
p = {"scale": scale, "bias": bias}
want = _layer_norm(x + res.astype(x.dtype), p, 1e-12, out_dtype=jnp.bfloat16)
g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
mism = np.mean(g != w)
np.testing.assert_allclose(g, w, rtol=2**-7, atol=2**-7)
print(f"[1] kernel exactness OK  bf16-mismatch-frac={mism:.2e}")

# --- 2. full encoder equivalence on TPU ---
mcfg_on = ModelConfig(dtype="bfloat16", use_fused_ln=True)
mcfg_off = ModelConfig(dtype="bfloat16", use_fused_ln=False)
params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), mcfg_on))
qparams = quantize_encoder_params(params)
ids = jax.random.randint(jax.random.PRNGKey(5), (B, L), 2, 30000, jnp.int32)
mask = jnp.ones((B, L), jnp.int32)

e_on = np.asarray(encode(qparams, mcfg_on, ids, mask), np.float32)
e_off = np.asarray(encode(qparams, mcfg_off, ids, mask), np.float32)


def _cos(a, b):
    return float(
        np.mean(
            np.sum(a * b, -1)
            / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        )
    )


# 25 LNs of ulp-level divergence chaotically amplify through 12 int8
# dynamic-quantized layers, so fused-vs-unfused cosine alone can't
# separate "kernel bias" from the bf16 carry's own intrinsic noise.
# Control: an f32-carry run with the SAME int8 weights is the ground
# truth; the kernel is correct iff the fused path is no farther from it
# than the unfused path is (both are then samples of the same carry
# noise).  Measured 2026-08-19: fused 0.999664 vs unfused 0.999689 —
# equidistant, no bias.
mcfg_f32 = ModelConfig(dtype="float32", use_fused_ln=False)
e_ref = np.asarray(encode(qparams, mcfg_f32, ids, mask), np.float32)
c_on, c_off = _cos(e_on, e_ref), _cos(e_off, e_ref)
print(f"[2] cos-to-f32ref  fused={c_on:.8f}  unfused={c_off:.8f}  "
      f"fused-vs-unfused={_cos(e_on, e_off):.8f}")
assert c_on > c_off - 3e-5, (c_on, c_off)

# --- 3. timing ---
def timed_encode(mcfg, reps=3):
    @jax.jit
    def run(params, key):
        def body(c, k):
            ids = jax.random.randint(k, (B, L), 2, 50000, jnp.int32)
            m = jnp.ones((B, L), jnp.int32)
            e = encode(params, mcfg, ids, m)
            return c + jnp.sum(e[:, 0]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, 4))
        return acc

    np.asarray(jax.device_get(run(qparams, jax.random.PRNGKey(1))))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(run(qparams, jax.random.PRNGKey(2))))
    dt = (time.time() - t0) / reps
    return dt / 4 * 1e3, B * L * 4 / dt / 1e6  # ms/step, Mtok/s


ms_off, mt_off = timed_encode(mcfg_off)
ms_on, mt_on = timed_encode(mcfg_on)
print(f"[3] unfused: {ms_off:.1f} ms/step  {mt_off:.3f} Mtok/s")
print(f"    fused:   {ms_on:.1f} ms/step  {mt_on:.3f} Mtok/s  "
      f"({ms_off / ms_on:.3f}x)")

# micro: one LN pass over [B*L, H], fused vs XLA-unfused
x2 = x.reshape(B * L, H)
r2 = res.reshape(B * L, H)


@jax.jit
def xla_ln(x, r):
    return _layer_norm(x + r.astype(x.dtype), p, 1e-12, out_dtype=jnp.bfloat16)


@jax.jit
def pl_ln(x, r):
    return fused_residual_ln(x, r, scale, bias, eps=1e-12, out_dtype=jnp.bfloat16)


for name, fn in [("xla", xla_ln), ("pallas", pl_ln)]:
    jax.block_until_ready(fn(x2, r2))
    t0 = time.time()
    for _ in range(50):
        o = fn(x2, r2)
    jax.block_until_ready(o)
    us = (time.time() - t0) / 50 * 1e6
    gb = (x2.nbytes + r2.nbytes + x2.nbytes) / 1e9
    print(f"    micro res+LN [{B*L},{H}] {name}: {us:.0f} us  "
          f"({gb / (us / 1e6):.0f} GB/s eff)")

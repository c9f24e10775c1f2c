"""On-TPU validation of the fused int8 MLP-block kernel (ops/fused_mlp.py).

1. Kernel exactness at the encode row shape [512*384, 768]x3072 vs the
   encoder's unfused mlp_fn composition (bf16 carry; only FMA/reduction
   -order ulp flips permitted).
2. Full-encoder equivalence at the corpus-encode geometry (12L/768,
   B=512, L=384, int8 towers) against the f32-carry ground-truth control
   (same int8 weights): fused path must be no farther than the unfused.
3. Timing: encode step ms and Mtok/s for {unfused, fused-LN-only,
   fused-MLP} plus the standalone MLP-block micro (kernel vs XLA).

Run: PYTHONPATH=. python probes/probe_fused_mlp_tpu.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import (
    _dense,
    _gelu,
    _layer_norm,
    encode,
    init_encoder_params,
    quantize_encoder_params,
    stack_layer_params,
)
from haconvdr_tpu.ops.fused_mlp import fused_mlp_block, fused_mlp_supported

assert jax.devices()[0].platform == "tpu", jax.devices()

B, L, H, I = 512, 384, 768, 3072
ROWS = B * L
assert fused_mlp_supported(ROWS, H, I)

# --- 1. kernel exactness at encode shape ---
k = jax.random.split(jax.random.PRNGKey(0), 8)
x = jax.random.normal(k[0], (ROWS, H), jnp.bfloat16) * 2.0
xf = x.astype(jnp.float32)
xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
xq = jnp.clip(jnp.round(xf / xs * 127.0), -127, 127).astype(jnp.int8)


def _quant_params(key, in_dim, out_dim):
    w = jax.random.normal(key, (in_dim, out_dim), jnp.float32) * 0.05
    ws = jnp.max(jnp.abs(w), axis=0)
    return {
        "kernel": jnp.clip(jnp.round(w / ws * 127.0), -127, 127).astype(jnp.int8),
        "kernel_scale": ws / 127.0,
        "bias": jnp.linspace(-0.1, 0.1, out_dim, dtype=jnp.float32),
    }


p1 = _quant_params(k[1], H, I)
p2 = _quant_params(k[2], I, H)
lnp = {
    "scale": jax.random.normal(k[3], (H,), jnp.float32) * 0.3 + 1.0,
    "bias": jax.random.normal(k[4], (H,), jnp.float32) * 0.1,
}
EPS = 1e-12


@jax.jit
def ref_mlp(x, xq, xs):
    inter = _gelu(
        _dense(x, p1, jnp.bfloat16, out_dtype=jnp.bfloat16, prequant=(xq, xs)),
        jnp.bfloat16,
    )
    out = _dense(inter, p2, jnp.bfloat16)
    t = x + out.astype(x.dtype)
    return _layer_norm(t, lnp, EPS, out_dtype=jnp.bfloat16)


@jax.jit
def pl_mlp(x, xq, xs):
    return fused_mlp_block(
        x, xq, xs,
        p1["kernel"], p1["kernel_scale"], p1["bias"],
        p2["kernel"], p2["kernel_scale"], p2["bias"],
        lnp["scale"], lnp["bias"], eps=EPS, out_dtype=jnp.bfloat16,
    )


y, yq, ys = pl_mlp(x, xq, xs)
want = ref_mlp(x, xq, xs)
g, w = np.asarray(y, np.float32), np.asarray(want, np.float32)
np.testing.assert_allclose(g, w, rtol=2 ** -6, atol=0.07)
flips = (np.abs(g - w) > 2 ** -6 * (1.0 + np.abs(w))).mean()
print(f"[1] kernel exactness OK  ulp-flip-frac={flips:.2e}")

# --- 2. full encoder equivalence on TPU ---
mcfg_mlp = ModelConfig(dtype="bfloat16", use_fused_ln=True, use_fused_mlp=True)
mcfg_ln = ModelConfig(dtype="bfloat16", use_fused_ln=True, use_fused_mlp=False)
mcfg_off = ModelConfig(dtype="bfloat16", use_fused_ln=False, use_fused_mlp=False)
params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), mcfg_mlp))
qparams = quantize_encoder_params(params)
ids = jax.random.randint(jax.random.PRNGKey(5), (B, L), 2, 30000, jnp.int32)
mask = jnp.ones((B, L), jnp.int32)

e_mlp = np.asarray(encode(qparams, mcfg_mlp, ids, mask), np.float32)
e_off = np.asarray(encode(qparams, mcfg_off, ids, mask), np.float32)


def _cos(a, b):
    return float(
        np.mean(
            np.sum(a * b, -1)
            / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        )
    )


mcfg_f32 = ModelConfig(dtype="float32", use_fused_ln=False, use_fused_mlp=False)
# multi-seed: one seed's cos gap sits inside the bf16 carry-noise band
# (round-3 fused-LN analysis: two correct samples differed by 2.5e-5);
# bias would show as a CONSISTENT gap across seeds, noise as a mixed sign
# / sub-1e-4 spread.
gaps = []
for sd in (5, 11, 23):
    ids_s = jax.random.randint(jax.random.PRNGKey(sd), (B, L), 2, 30000, jnp.int32)
    e_m = np.asarray(encode(qparams, mcfg_mlp, ids_s, mask), np.float32)
    e_o = np.asarray(encode(qparams, mcfg_off, ids_s, mask), np.float32)
    e_r = np.asarray(encode(qparams, mcfg_f32, ids_s, mask), np.float32)
    c_m, c_o = _cos(e_m, e_r), _cos(e_o, e_r)
    gaps.append(c_o - c_m)
    print(f"[2] seed {sd}: cos-to-f32ref  fused-mlp={c_m:.8f}  "
          f"unfused={c_o:.8f}  gap={c_o - c_m:+.2e}")
assert max(abs(g) for g in gaps) < 1e-4, gaps

# --- 3. timing ---
def timed_encode(mcfg, reps=3):
    @jax.jit
    def run(params, key):
        def body(c, kk):
            ids = jax.random.randint(kk, (B, L), 2, 50000, jnp.int32)
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


for name, mcfg in [
    ("unfused  ", mcfg_off),
    ("fused-LN ", mcfg_ln),
    ("fused-MLP", mcfg_mlp),
]:
    ms, mt = timed_encode(mcfg)
    print(f"[3] {name}: {ms:.1f} ms/step  {mt:.3f} Mtok/s")

# micro: one MLP block over [ROWS, H], kernel vs XLA-unfused
for name, fn in [("xla", ref_mlp), ("pallas", pl_mlp)]:
    jax.block_until_ready(fn(x, xq, xs))
    t0 = time.time()
    for _ in range(30):
        jax.block_until_ready(fn(x, xq, xs))
    print(f"[3] mlp-block micro {name}: {(time.time() - t0) / 30 * 1e3:.2f} ms")

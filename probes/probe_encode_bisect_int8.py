"""Bisect the INT8 corpus-encode step (the fused-quant path): where do
the remaining non-matmul ms go, and which boundary justifies the next
kernel?

Levels (B=512, L=384, int8 towers, fused attention + fused LN+quant):
  A. full int8 encode, fused-quant on (the shipping corpus path)
  A'. same, fused-quant off (XLA LN + dynamic quant) — the delta is the
      fused LN+quant kernel's measured win in context
  B. int8 matmul floor: resident-prequantized int8 dense tower of the
     same shapes (dot int32 + dequant epilogue only) + bf16 attention
     batched matmuls
  C. standalone gelu->absmax->quant boundary at [B*L, 3072] (the MLP
     intermediate's output feeding the output dense) — XLA vs what a
     fused Pallas gelu+quant kernel could save
  D. standalone absmax+quant at [B*L, 768] (attention ctx feeding the
     output projection)

Run: PYTHONPATH=/root/.axon_site:. python probes/probe_encode_bisect_int8.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models import encoder as enc

assert jax.devices()[0].platform == "tpu"
B, L, H, NL, I = 512, 384, 768, 12, 3072
T = B * L
REPS = 8
key = jax.random.PRNGKey(0)

params = enc.stack_layer_params(
    enc.init_encoder_params(key, ModelConfig(dtype="bfloat16"))
)
qparams = enc.quantize_encoder_params(params)
ids = jnp.ones((B, L), jnp.int32) * 5
mask = jnp.ones((B, L), jnp.int32)


def timeit(fn, *a):
    out = fn(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    out = fn(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / REPS * 1000.0


def encode_loop(cfg):
    @jax.jit
    def run(params, ids, mask):
        def body(c, step):
            e = enc.encode(params, cfg, ids + (step % 2), mask)
            return c, e[:1, :1]

        _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
        return outs

    return run

ms_on = timeit(encode_loop(ModelConfig(dtype="bfloat16", use_fused_ln=True)),
               qparams, ids, mask)
ms_off = timeit(encode_loop(ModelConfig(dtype="bfloat16", use_fused_ln=False)),
                qparams, ids, mask)
print(f"A  full int8 encode fused-quant ON : {ms_on:.1f} ms  "
      f"{T/ms_on/1e3:.3f} Mtok/s", flush=True)
print(f"A' full int8 encode fused-quant OFF: {ms_off:.1f} ms  "
      f"({ms_off/ms_on:.3f}x)", flush=True)

# B: int8 matmul floor — prequantized resident activations, dot+dequant
wq = jax.random.randint(key, (H, 3 * H), -127, 128, jnp.int8)
wo = jax.random.randint(key, (H, H), -127, 128, jnp.int8)
wi = jax.random.randint(key, (H, I), -127, 128, jnp.int8)
wd = jax.random.randint(key, (I, H), -127, 128, jnp.int8)
sq = jnp.ones((3 * H,), jnp.float32) * 1e-3
so = jnp.ones((H,), jnp.float32) * 1e-3
si = jnp.ones((I,), jnp.float32) * 1e-3
sd = jnp.ones((H,), jnp.float32) * 1e-3
xq0 = jax.random.randint(key, (T, H), -127, 128, jnp.int8)
xs0 = jnp.ones((T, 1), jnp.float32)


@jax.jit
def int8_tower(xq, xs):
    def body(c, step):
        q, s = c
        for _ in range(NL):
            y = jnp.dot(q, wq, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (s / 127.0) * sq
            q1 = jnp.clip(jnp.round(y[:, :H] / 1.0), -127, 127).astype(jnp.int8)
            y = jnp.dot(q1, wo, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * so
            q2 = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            y = jnp.dot(q2, wi, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * si
            q3 = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            y = jnp.dot(q3, wd, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * sd
            q = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        return (q, s), q[:1, :1]

    _, outs = jax.lax.scan(body, (xq, xs), jnp.arange(REPS))
    return outs

ms_mm = timeit(int8_tower, xq0, xs0)

h, d = 12, H // 12
q4 = jax.random.normal(key, (B, h, L, d), jnp.bfloat16)
k4 = jax.random.normal(key, (B, h, L, d), jnp.bfloat16)


@jax.jit
def bmm_tower(q4, k4):
    def body(c, step):
        y = c
        for _ in range(NL):
            s = jnp.einsum("bhqd,bhkd->bhqk", y, k4)
            y = jnp.einsum("bhqk,bhkd->bhqd", s, k4)
        return y, y[:1, :1, :1, :1]

    _, outs = jax.lax.scan(body, q4, jnp.arange(REPS))
    return outs

ms_bmm = timeit(bmm_tower, q4, k4)
floor = ms_mm + ms_bmm
print(f"B  int8 dense tower {ms_mm:.1f} + attn bmm {ms_bmm:.1f} = "
      f"floor {floor:.1f} ms ({floor/ms_on*100:.0f}% of A -> "
      f"{ms_on-floor:.1f} ms non-matmul)", flush=True)

# C: the gelu->quant boundary at [T, 3072]
inter = jax.random.normal(key, (T, I), jnp.bfloat16)


@jax.jit
def gelu_quant(x):
    def body(c, step):
        g = jax.nn.gelu(c + step.astype(c.dtype) * 0, approximate=True)
        gf = g.astype(jnp.float32)
        gs = jnp.maximum(jnp.max(jnp.abs(gf), axis=-1, keepdims=True), 1e-30)
        gq = jnp.clip(jnp.round(gf / gs * 127.0), -127, 127).astype(jnp.int8)
        return c, (gq[:1, :1], gs[:1, :1])

    _, outs = jax.lax.scan(body, x, jnp.arange(REPS))
    return outs

ms_gq = timeit(gelu_quant, inter)
print(f"C  gelu+absmax+quant [T,{I}] XLA: {ms_gq:.2f} ms/pass "
      f"(x{NL} layers = {ms_gq*NL:.1f} ms/step)", flush=True)

# D: absmax+quant at [T, 768] (attention ctx -> output projection)
ctx = jax.random.normal(key, (T, H), jnp.bfloat16)


@jax.jit
def quant_only(x):
    def body(c, step):
        xf = (c + step.astype(c.dtype) * 0).astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
        xq = jnp.clip(jnp.round(xf / xs * 127.0), -127, 127).astype(jnp.int8)
        return c, (xq[:1, :1], xs[:1, :1])

    _, outs = jax.lax.scan(body, x, jnp.arange(REPS))
    return outs

ms_q = timeit(quant_only, ctx)
print(f"D  absmax+quant [T,{H}] XLA: {ms_q:.2f} ms/pass "
      f"(x{NL} = {ms_q*NL:.1f} ms/step)", flush=True)

# FLOP accounting at int8
dense_fl = 24 * B * L * H * H * NL
attn_fl = 4 * B * L * L * H * NL
print(f"int8 dense {dense_fl/1e12:.2f} T @394 TOPS = {dense_fl/394e9:.0f} ms; "
      f"attn bf16 {attn_fl/1e12:.2f} T @197 = {attn_fl/197e9:.0f} ms", flush=True)

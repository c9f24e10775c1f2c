"""Bisect the corpus-encode step: where do the non-matmul ms go?

Levels (inference path, B=512, L=384, bf16, fused attention):
  A. full encode (embeddings + 12 layers + pool/head)
  B. matmuls only: replace _layer_norm with identity-scale (cast) and
     GELU with identity — approximated by timing a pure-matmul tower of
     the same shapes
  C. XLA attention instead of the fused kernel (sanity: kernel helps?)
"""
import os, time, functools
import jax, jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models import encoder as enc

assert jax.devices()[0].platform == "tpu"
B, L, H, NL = 512, 384, 768, 12
cfg = ModelConfig(dtype="bfloat16")
key = jax.random.PRNGKey(0)
params = enc.init_encoder_params(key, cfg)

ids = jnp.ones((B, L), jnp.int32) * 5
mask = jnp.ones((B, L), jnp.int32)
REPS = 8


def timeit(fn, *a):
    out = fn(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    out = fn(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / REPS * 1000.0


@functools.partial(jax.jit, static_argnums=())
def full(params, ids, mask):
    def body(c, step):
        e = enc.encode(params, cfg, ids + (step % 2), mask)  # real per-iter variation: XLA hoists invariant bodies
        return c, e[:1, :1]
    _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
    return outs

ms = timeit(full, params, ids, mask)
tok_s = B * L / (ms / 1000.0)
print(f"A full encode: {ms:.1f} ms  {tok_s/1e6:.3f} Mtok/s", flush=True)

# B: pure matmul tower, same shapes (QKV + proj + 2 MLP per layer + head)
wq = jax.random.normal(key, (H, 3 * H), jnp.bfloat16) * 0.02
wo = jax.random.normal(key, (H, H), jnp.bfloat16) * 0.02
wi = jax.random.normal(key, (H, 4 * H), jnp.bfloat16) * 0.02
wd = jax.random.normal(key, (4 * H, H), jnp.bfloat16) * 0.02


@jax.jit
def mm_tower(x, wq, wo, wi, wd):
    def body(c, step):
        y = c
        for _ in range(NL):
            q = y @ wq           # [BL, 3H]
            y = q[:, :H] @ wo    # attn proj stand-in
            i = y @ wi
            y = i @ wd
        return y, y[:1, :1]      # carry the activations: per-iter dependence
    _, outs = jax.lax.scan(body, x, jnp.arange(REPS))
    return outs

x = jax.random.normal(key, (B * L, H), jnp.bfloat16)
ms_mm = timeit(mm_tower, x, wq, wo, wi, wd)
print(f"B matmul tower: {ms_mm:.1f} ms ({ms_mm/ms*100:.0f}% of full)", flush=True)

# B2: the dense tower misses the attention batched matmuls (QK^T, PV);
# add them for the honest matmul floor
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
print(f"B2 attention bmms: {ms_bmm:.1f} ms; matmul floor {floor:.1f} ms "
      f"({floor/ms*100:.0f}% of full -> {ms-floor:.1f} ms non-matmul)", flush=True)

# C: XLA attention instead of the fused kernel
cfg_xla = ModelConfig(dtype="bfloat16", use_flash_attention=False)


@jax.jit
def full_xla(params, ids, mask):
    def body(c, step):
        e = enc.encode(params, cfg_xla, ids + (step % 2), mask)
        return c, e[:1, :1]
    _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
    return outs

ms_xla = timeit(full_xla, params, ids, mask)
print(f"C XLA attention: {ms_xla:.1f} ms ({(ms_xla-ms)/ms*100:+.0f}% vs fused)", flush=True)

# FLOP accounting
dense_fl = 24 * B * L * H * H * NL + 2 * B * H * H
attn_fl = 4 * B * L * L * H * NL
print(f"FLOPs: dense {dense_fl/1e12:.2f} T + attn {attn_fl/1e12:.2f} T; "
      f"full-encode rate {(dense_fl+attn_fl)/(ms/1e3)/1e12:.0f} TFLOP/s "
      f"(v5e bf16 peak ~197)", flush=True)

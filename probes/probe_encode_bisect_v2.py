"""Round-4 re-bisect of the int8 corpus-encode step, ALL levels in-scan
(one jit dispatch, lax.scan of REPS) — the round-3 bisect's standalone
levels were relay-inflated (~10 ms/eager dispatch), which mispriced the
fusion targets (NOTES.md round 4).

Step A (shipping config: fused attention + fused LN+quant + fused MLP)
decomposes as 12x per-layer [ qkv int8 dense -> fused attention kernel
-> ctx int8 dense -> fused LN+quant -> fused MLP kernel ] + embed/pool/
head.  Each level here isolates one component AT STEP SHAPES in its own
scan so the sum of parts vs A exposes scan/glue overhead, and each part
vs its matmul-only floor names its non-matmul slice:

  A   full int8 encode step (B=512, L=384)
  T1  fused attention kernel tower (12x fused_attention_qkv)
  T1f attention bmm floor (12x QK^T + PV batched matmuls, bf16)
  T2  fused MLP kernel tower (12x fused_mlp_block at [B*L, 768])
  T2f MLP dot floor (12x int8 dense 768->3072 + 3072->768, XLA in-scan)
  T3  qkv+ctx int8 dense tower (12x 768->2304 + 768->768, XLA in-scan)
  T4  embed + pool + head (0-layer encode)

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_encode_bisect_v2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models import encoder as enc
from haconvdr_tpu.ops.fused_attention import fused_attention_qkv
from haconvdr_tpu.ops.fused_mlp import fused_mlp_block

assert jax.devices()[0].platform == "tpu"
B, L, H, NL, I = 512, 384, 768, 12, 3072
T = B * L
REPS = 4
key = jax.random.PRNGKey(0)

mcfg = ModelConfig(dtype="bfloat16")
params = enc.stack_layer_params(enc.init_encoder_params(key, mcfg))
qparams = enc.quantize_encoder_params(params)
ids = jnp.ones((B, L), jnp.int32) * 5
mask = jnp.ones((B, L), jnp.int32)


def timeit(fn, *a, reps=3):
    out = fn(*a)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / reps / REPS * 1000.0


def encode_loop(cfg):
    @jax.jit
    def run(params, ids, mask):
        def body(c, step):
            e = enc.encode(params, cfg, ids + step * 0, mask)
            return c + jnp.sum(e[:, 0]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return acc

    return timeit(run, qparams, ids, mask)


ms_a = encode_loop(mcfg)
print(f"A   full int8 fused step        {ms_a:7.1f} ms", flush=True)

# T1: fused attention kernel tower
qkv0 = jax.random.normal(key, (B, L, 3 * H), jnp.bfloat16)


@jax.jit
def attn_tower(qkv):
    def body(c, step):
        y = c
        for _ in range(NL):
            ctx = fused_attention_qkv(y, mask, 12)
            y = jnp.tile(ctx, (1, 1, 3))  # feed the next layer's qkv shape
        return y, None

    out, _ = jax.lax.scan(body, qkv, jnp.arange(REPS))
    return out[:1, :1, :1]


ms_t1 = timeit(attn_tower, qkv0)

# T1f: attention bmm floor
h, d = 12, H // 12
q4 = jax.random.normal(key, (B, h, L, d), jnp.bfloat16)
k4 = jax.random.normal(key, (B, h, L, d), jnp.bfloat16)


@jax.jit
def bmm_tower(q4):
    def body(c, step):
        y = c
        for _ in range(NL):
            s = jnp.einsum("bhqd,bhkd->bhqk", y, k4)
            y = jnp.einsum("bhqk,bhkd->bhqd", s, k4)
        return y, None

    out, _ = jax.lax.scan(body, q4, jnp.arange(REPS))
    return out[:1, :1, :1, :1]


ms_t1f = timeit(bmm_tower, q4)
print(f"T1  fused attention tower       {ms_t1:7.1f} ms   "
      f"(bmm floor {ms_t1f:.1f}, overhead {ms_t1 - ms_t1f:+.1f})", flush=True)

# T2: fused MLP kernel tower; T2f: its dots via XLA in-scan
x0 = jax.random.normal(key, (T, H), jnp.bfloat16)
xs0 = jnp.maximum(jnp.max(jnp.abs(x0.astype(jnp.float32)), -1, keepdims=True), 1e-30)
xq0 = jnp.clip(jnp.round(x0.astype(jnp.float32) / xs0 * 127.0), -127, 127).astype(jnp.int8)
layer0 = jax.tree_util.tree_map(lambda a: a[0], qparams["layers"])
p_i, p_o = layer0["intermediate"], layer0["output"]
lnp = layer0["output_layer_norm"]


@jax.jit
def mlp_tower(x, xq, xs):
    def body(c, step):
        y, yq, ys = c
        for _ in range(NL):
            y, yq, ys = fused_mlp_block(
                y, yq, ys,
                p_i["kernel"], p_i["kernel_scale"], p_i["bias"],
                p_o["kernel"], p_o["kernel_scale"], p_o["bias"],
                lnp["scale"], lnp["bias"],
                eps=1e-12, out_dtype=jnp.bfloat16,
            )
        return (y, yq, ys), None

    (y, yq, ys), _ = jax.lax.scan(body, (x, xq, xs), jnp.arange(REPS))
    return y[:1, :1]


ms_t2 = timeit(mlp_tower, x0, xq0, xs0)

wi, wd = p_i["kernel"], p_o["kernel"]
si, sd = p_i["kernel_scale"], p_o["kernel_scale"]


@jax.jit
def mlp_dot_floor(xq):
    def body(c, step):
        q = c
        for _ in range(NL):
            y = jnp.dot(q, wi, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * si
            q1 = jnp.clip(jnp.round(y[:, :H]), -127, 127).astype(jnp.int8)
            y = jnp.dot(
                jnp.tile(q1, (1, 4)), wd, preferred_element_type=jnp.int32
            )
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * sd), -127, 127).astype(
                jnp.int8
            )
        return q, None

    out, _ = jax.lax.scan(body, xq, jnp.arange(REPS))
    return out[:1, :1]


ms_t2f = timeit(mlp_dot_floor, xq0)
print(f"T2  fused MLP kernel tower      {ms_t2:7.1f} ms   "
      f"(dot floor {ms_t2f:.1f}, overhead {ms_t2 - ms_t2f:+.1f})", flush=True)

# T3: qkv + ctx int8 dense tower (XLA, as the encoder runs them)
l0 = layer0["attention"]
wqkv = jnp.concatenate(
    [l0["query"]["kernel"], l0["key"]["kernel"], l0["value"]["kernel"]], axis=-1
)
sqkv = jnp.concatenate(
    [l0["query"]["kernel_scale"], l0["key"]["kernel_scale"], l0["value"]["kernel_scale"]]
)
wo, so = l0["output"]["kernel"], l0["output"]["kernel_scale"]


@jax.jit
def qkv_ctx_tower(xq):
    def body(c, step):
        q = c
        for _ in range(NL):
            y = jnp.dot(q, wqkv, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * sqkv
            q1 = jnp.clip(jnp.round(y[:, :H]), -127, 127).astype(jnp.int8)
            y = jnp.dot(q1, wo, preferred_element_type=jnp.int32)
            q = jnp.clip(jnp.round(y.astype(jnp.float32) * so), -127, 127).astype(
                jnp.int8
            )
        return q, None

    out, _ = jax.lax.scan(body, xq, jnp.arange(REPS))
    return out[:1, :1]


ms_t3 = timeit(qkv_ctx_tower, xq0)
print(f"T3  qkv+ctx int8 dense tower    {ms_t3:7.1f} ms", flush=True)

# T4: embed + pool + head (0-layer encode)
mcfg0 = ModelConfig(dtype="bfloat16", num_hidden_layers=0)
p0 = enc.init_encoder_params(jax.random.PRNGKey(1), mcfg0)
ms_t4 = encode_loop_cfg = None
try:
    p0s = enc.stack_layer_params(p0)

    @jax.jit
    def run0(params, ids, mask):
        def body(c, step):
            e = enc.encode(params, mcfg0, ids + step * 0, mask)
            return c + jnp.sum(e[:, 0]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return acc

    ms_t4 = timeit(run0, p0s, ids, mask)
    print(f"T4  embed+pool+head             {ms_t4:7.1f} ms", flush=True)
except Exception as e:  # 0-layer stacking may be unsupported; report and move on
    ms_t4 = 0.0
    print(f"T4  embed+pool+head             skipped ({type(e).__name__}: {e})",
          flush=True)

parts = ms_t1 + ms_t2 + ms_t3 + ms_t4
print(f"sum(T1..T4) = {parts:.1f} ms vs A {ms_a:.1f} -> "
      f"glue/scan residual {ms_a - parts:+.1f} ms", flush=True)

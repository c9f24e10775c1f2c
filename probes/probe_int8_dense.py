"""Isolated timing: bf16 vs int8 x int8 dense matmul + dynamic act-quant,
at the encoder's hot geometry (frozen tower: [B*L, H] x [H, O])."""
import time
import jax, jax.numpy as jnp
import numpy as np

assert jax.devices()[0].platform == "tpu"
M, H, O = 64 * 384, 768, 3072
REP = 50
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (M, H), jnp.bfloat16)
wf = jax.random.normal(key, (H, O), jnp.float32)
wb = wf.astype(jnp.bfloat16)
wq = jnp.clip(jnp.round(wf / jnp.max(jnp.abs(wf), axis=0) * 127), -127, 127).astype(jnp.int8)

@jax.jit
def run_bf16(x, w):
    def body(c, _):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return c + jnp.sum(y[:, 0]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
    return acc

@jax.jit
def run_int8_static(x, w):
    # pre-quantized activations: pure int8 x int8 dot cost
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    def body(c, _):
        y = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        return c + jnp.sum(y[:, 0]), None
    acc, _ = jax.lax.scan(body, jnp.int32(0), None, length=REP)
    return acc

@jax.jit
def run_int8_dyn(x, w):
    # full path: per-token dynamic quant + dot + dequant
    def body(c, _):
        xf = x.astype(jnp.float32)
        xs = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-30)
        xq = jnp.clip(jnp.round(xf / xs * 127.0), -127, 127).astype(jnp.int8)
        y = jnp.dot(xq, w, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (xs / 127.0)
        return c + jnp.sum(y[:, 0]), None
    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
    return acc

for name, fn, w in [("bf16", run_bf16, wb), ("int8_static", run_int8_static, wq), ("int8_dyn", run_int8_dyn, wq)]:
    np.asarray(jax.device_get(fn(x, w)))  # compile+warm
    t0 = time.time()
    np.asarray(jax.device_get(fn(x, w)))
    dt = (time.time() - t0) / REP
    tflops = 2 * M * H * O / dt / 1e12
    print(f"{name}: {dt*1e3:.3f} ms/matmul  {tflops:.1f} TFLOP/s", flush=True)

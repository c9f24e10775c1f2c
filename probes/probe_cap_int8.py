"""6.29M x 768 int8 resident on ONE chip through the v4 int8 MXU mode."""
import time
import jax, jax.numpy as jnp
import numpy as np
from haconvdr_tpu.ops.pallas_topk_v4 import pallas_topk_block_v4

assert jax.devices()[0].platform == "tpu"
N, D, Q, K = 3072 * 2048, 768, 2048, 100
CH = N // 24

@jax.jit
def gen_chunk(key):
    return jax.random.bits(key, (CH, D), jnp.uint8).astype(jnp.int8)

@jax.jit
def insert(buf, chunk, off):
    return jax.lax.dynamic_update_slice(buf, chunk, (off, 0))
insert = jax.jit(insert, donate_argnums=(0,))

buf = jnp.zeros((N, D), jnp.int8)
for c in range(24):
    buf = insert(buf, gen_chunk(jax.random.PRNGKey(c)), jnp.int32(c * CH))
queries = jax.random.normal(jax.random.PRNGKey(99), (Q, D), jnp.bfloat16)

def run():
    s, i = pallas_topk_block_v4(queries, buf, N, K)
    return np.asarray(jax.device_get(s[:1, :1]))

run()  # compile + warm
t0 = time.time()
run()
dt = time.time() - t0
print(f"N={N}: {dt*1e3:.1f} ms / {Q} queries = {Q/dt:.0f} QPS", flush=True)

"""True device time: N searches inside ONE dispatch via lax.scan."""
import time
import jax, jax.numpy as jnp
import numpy as np
from haconvdr_tpu.ops.pallas_topk_v4 import _v4_search

assert jax.devices()[0].platform == "tpu"
N, D, Q, K = 1224 * 2048, 768, 2048, 100
kq = jax.random.PRNGKey(7)
CH = N // 12
ins = jax.jit(lambda b, c, o: jax.lax.dynamic_update_slice(b, c, (o, 0)), donate_argnums=(0,))

def make_passages(dtype):
    if dtype == jnp.int8:
        buf = jnp.zeros((N, D), jnp.int8)
        for c in range(12):
            buf = ins(buf, jax.random.bits(jax.random.PRNGKey(c), (CH, D), jnp.uint8).astype(jnp.int8), jnp.int32(c * CH))
        return buf
    buf = jnp.zeros((N, D), dtype)
    for c in range(12):
        buf = ins(buf, jax.random.normal(jax.random.PRNGKey(c), (CH, D), dtype), jnp.int32(c * CH))
    return buf

REPS = 5
def measure(dtype, qdtype):
    passages = make_passages(dtype)
    queries = jax.random.normal(kq, (Q, D), qdtype)

    @jax.jit
    def multi(queries, passages):
        def body(c, i):
            # vary queries per step so XLA can't CSE the scan body
            s, idx, nf = _v4_search(queries + c * 1e-6, passages, jnp.int32(N), K)
            # consume EVERY query's scores and ids: a narrow slice would
            # let XLA dead-code-eliminate the other q-panel parts' whole
            # sub-pipelines now that selection runs per part
            sink = (
                jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0))
                + jnp.sum(idx).astype(jnp.float32)
                + nf.astype(jnp.float32)
            )
            return c + sink * 1e-30, sink
        c, outs = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return c + jnp.sum(outs)
    np.asarray(jax.device_get(multi(queries, passages)))
    t0 = time.time()
    np.asarray(jax.device_get(multi(queries, passages)))
    dt = (time.time() - t0) / REPS
    print(f"{dtype.__name__}: {dt*1e3:.2f} ms/search = {Q/dt:.0f} QPS (device-only)", flush=True)
    del passages

measure(jnp.int8, jnp.bfloat16)
measure(jnp.bfloat16, jnp.bfloat16)

"""Component timing of the v4 selection pipeline at 2.5M int8 x 2048."""
import time
import jax, jax.numpy as jnp
import numpy as np
from haconvdr_tpu.ops.pallas_topk_v4 import (
    _v4_search, pallas_select_topk_t, _rescore_windows,
)

assert jax.devices()[0].platform == "tpu"
NEG_INF = float(-jnp.inf)
N, D, Q, K = 1224 * 2048, 768, 2048, 100  # 2.507M
kq, kp = jax.random.split(jax.random.PRNGKey(0))
CH = N // 12
ins = jax.jit(lambda b, c, o: jax.lax.dynamic_update_slice(b, c, (o, 0)), donate_argnums=(0,))
passages = jnp.zeros((N, D), jnp.int8)
for c in range(12):
    passages = ins(passages, jax.random.bits(jax.random.PRNGKey(c), (CH, D), jnp.uint8).astype(jnp.int8), jnp.int32(c * CH))
queries = jax.random.normal(kq, (Q, D), jnp.bfloat16)

def timeit(name, fn, reps=10):
    r = fn(); np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0]))  # compile
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0][..., :1]))
    print(f"{name}: {(time.time()-t0)/reps*1e3:.2f} ms", flush=True)
    return r

# full search
timeit("full _v4_search", lambda: _v4_search(queries, passages, jnp.int32(N), K)[0])

# panels [Wp, Qp] f32: simulate with random
Wp = (N // 1024) * (1024 // 128)
Wp = -(-Wp // 1) # windows
Wp = ((N // 1024) * 8)
Wp = -(-Wp // 8) * 8
k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
v1T = jax.random.normal(k1, (Wp, Q), jnp.float32)
v2T = v1T - jnp.abs(jax.random.normal(k2, (Wp, Q), jnp.float32))

@jax.jit
def select_vk(v1T):
    return pallas_select_topk_t(v1T, K)[0][:, K - 1]
v_k = timeit("select v_k", lambda: select_vk(v1T))

@jax.jit
def flag_ops(v2T, v_k):
    real_col = (jnp.arange(Q) < Q)[None, :]
    flagT = (v2T >= v_k[None, :]) & real_col & jnp.isfinite(v2T)
    n_flag_max = jnp.max(jnp.sum(flagT, axis=0))
    masked = jnp.where(flagT, v2T, NEG_INF)
    return n_flag_max, masked
timeit("flag ops (XLA)", lambda: flag_ops(v2T, v_k)[1])

@jax.jit
def select_flagged(masked):
    return pallas_select_topk_t(masked, 4)
masked = flag_ops(v2T, v_k)[1]
timeit("select flagged (budget=4)", lambda: select_flagged(masked)[0])

# rescore kernel at budget 4
win_ids = jnp.clip(jnp.asarray(np.random.RandomState(0).randint(0, N // 128, (Q, 4)), jnp.int32), 0, N // 128 - 1)
q8 = jnp.clip(jnp.round(queries.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
@jax.jit
def resc(passages, q8, win_ids):
    return _rescore_windows(passages, q8, win_ids, 128)
timeit("rescore kernel (budget=4)", lambda: resc(passages, q8, win_ids))

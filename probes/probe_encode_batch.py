import time, functools
import jax, jax.numpy as jnp
import numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models import encoder as enc
assert jax.devices()[0].platform == "tpu"
L, REPS = 384, 8
cfg = ModelConfig(dtype="bfloat16")
params = enc.init_encoder_params(jax.random.PRNGKey(0), cfg)
def timeit(fn, *a):
    out = fn(*a); np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.time()
    out = fn(*a); np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    return (time.time() - t0) / REPS * 1000.0
for B in (256, 512, 1024, 2048):
    ids = jnp.ones((B, L), jnp.int32) * 5
    mask = jnp.ones((B, L), jnp.int32)
    @jax.jit
    def full(params, ids, mask):
        def body(c, step):
            e = enc.encode(params, cfg, ids + (step % 2), mask)
            return c, e[:1, :1]
        _, outs = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS))
        return outs
    try:
        ms = timeit(full, params, ids, mask)
        print(f"B={B}: {ms:.1f} ms  {B*L/(ms/1000)/1e6:.3f} Mtok/s", flush=True)
    except Exception as e:
        print(f"B={B}: {type(e).__name__}", flush=True)

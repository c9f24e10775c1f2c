"""v4-geometry dense matmul: x streamed [BM,768], w RESIDENT [O,768]
(transposed), inner loop of [256,768] subtile dots like the v4 kernel."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu"
M, H, O = 64 * 384, 768, 3072
REP = 50
key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (M, H), jnp.bfloat16)
wtb = jax.random.normal(key, (O, H), jnp.bfloat16)
xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
wtq = jnp.clip(jnp.round(wtb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

def mm_kernel(x_ref, w_ref, o_ref, *, acc, sub):
    xm = x_ref[...]
    for g in range(w_ref.shape[0] // sub):
        y = jax.lax.dot_general(
            xm, w_ref[g * sub : (g + 1) * sub, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )
        o_ref[:, g * sub : (g + 1) * sub] = y.astype(o_ref.dtype)

def pallas_mm(x, wt, acc, BM, sub):
    return pl.pallas_call(
        functools.partial(mm_kernel, acc=acc, sub=sub),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, H), lambda i: (i, 0)),
            pl.BlockSpec((O, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, O), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, O), jnp.bfloat16),
    )(x, wt)

def timed(name, fn):
    run = jax.jit(fn)
    np.asarray(jax.device_get(run()))
    t0 = time.time()
    np.asarray(jax.device_get(run()))
    dt = (time.time() - t0) / REP
    print(f"{name}: {dt*1e3:.3f} ms  {2*M*H*O/dt/1e12:.1f} TFLOP/s", flush=True)

def loop(f):
    def g():
        def body(c, _):
            y = f()
            return c + y[0, 0].astype(jnp.float32), None
        a, _ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
        return a
    return g

for BM, sub in [(512, 256), (512, 512), (256, 256)]:
    try:
        timed(f"bf16 res [{BM},sub{sub}]", loop(lambda BM=BM, sub=sub: pallas_mm(xb, wtb, jnp.float32, BM, sub)))
        timed(f"int8 res [{BM},sub{sub}]", loop(lambda BM=BM, sub=sub: pallas_mm(xq, wtq, jnp.int32, BM, sub)))
    except Exception as e:
        print(f"[{BM},{sub}] failed: {str(e)[:200]}", flush=True)

"""Pallas matmul with BOTH operands [rows, K] (contraction on last dims,
the v4 kernel's orientation) + accumulate-over-K-tiles variants."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu"
M, H, O = 64 * 384, 768, 3072
REP = 50
key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (M, H), jnp.bfloat16)
wtb = jax.random.normal(key, (O, H), jnp.bfloat16)   # w TRANSPOSED [O, H]
xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
wtq = jnp.clip(jnp.round(wtb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

def mm_kernel(x_ref, w_ref, o_ref, *, acc, out_dtype):
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=acc,
    )
    o_ref[...] = y.astype(out_dtype)

def pallas_mm(x, wt, acc, out_dtype, BM, BO):
    return pl.pallas_call(
        functools.partial(mm_kernel, acc=acc, out_dtype=out_dtype),
        grid=(M // BM, O // BO),
        in_specs=[
            pl.BlockSpec((BM, H), lambda i, j: (i, 0)),
            pl.BlockSpec((BO, H), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((BM, BO), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, O), out_dtype),
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

for BM, BO in [(512, 1024), (1024, 512), (2048, 512)]:
    timed(f"bf16 T [{BM}x{BO}]", loop(lambda BM=BM, BO=BO: pallas_mm(xb, wtb, jnp.float32, jnp.bfloat16, BM, BO)))
    timed(f"int8 T [{BM}x{BO}]", loop(lambda BM=BM, BO=BO: pallas_mm(xq, wtq, jnp.int32, jnp.bfloat16, BM, BO)))

"""Minimal Pallas int8 x int8 matmul vs bf16: does Mosaic hit the 2x MXU mode?"""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu"
M, H, O = 64 * 384, 768, 3072
BM, BO = 512, 1024
REP = 50

def mm_kernel(x_ref, w_ref, o_ref, *, acc):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=acc,
    )

def pallas_mm(x, w, acc):
    return pl.pallas_call(
        functools.partial(mm_kernel, acc=acc),
        grid=(M // BM, O // BO),
        in_specs=[
            pl.BlockSpec((BM, H), lambda i, j: (i, 0)),
            pl.BlockSpec((H, BO), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((BM, BO), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, O), acc),
    )(x, w)

key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (M, H), jnp.bfloat16)
wb = jax.random.normal(key, (H, O), jnp.bfloat16)
xq = jnp.clip(jnp.round(xb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
wq = jnp.clip(jnp.round(wb.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

def timed(name, x, w, acc):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = pallas_mm(x, w, acc)
            return c + y[0, 0].astype(jnp.float32), None
        a, _ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
        return a
    np.asarray(jax.device_get(run(x, w)))
    t0 = time.time()
    np.asarray(jax.device_get(run(x, w)))
    dt = (time.time() - t0) / REP
    print(f"{name}: {dt*1e3:.3f} ms  {2*M*H*O/dt/1e12:.1f} TFLOP/s", flush=True)

timed("pallas bf16", xb, wb, jnp.float32)
timed("pallas int8", xq, wq, jnp.int32)

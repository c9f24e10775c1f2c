"""Does Mosaic lower int4 x int4 dots, and at what rate vs int8?
Geometry: the v4 window kernel's scoring dot ([1024,768] x [256,768]T)."""
import functools, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu"
M, H, O = 24576, 768, 3072
REP = 50
key = jax.random.PRNGKey(0)
xb = jax.random.normal(key, (M, H), jnp.bfloat16)
wtb = jax.random.normal(key, (O, H), jnp.bfloat16)
def q(x, lim):
    return jnp.clip(jnp.round(x.astype(jnp.float32) * 3), -lim, lim)
x8 = q(xb, 127).astype(jnp.int8)
wt8 = q(wtb, 127).astype(jnp.int8)
try:
    x4 = q(xb, 7).astype(jnp.int4)
    wt4 = q(wtb, 7).astype(jnp.int4)
    print("int4 arrays created", flush=True)
except Exception as e:
    print("int4 dtype unsupported:", e)
    raise SystemExit

def mm_kernel(x_ref, w_ref, o_ref, *, sub):
    xm = x_ref[...]
    for g in range(w_ref.shape[0] // sub):
        y = jax.lax.dot_general(
            xm, w_ref[g * sub : (g + 1) * sub, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        o_ref[:, g * sub : (g + 1) * sub] = y.astype(jnp.bfloat16)

def pallas_mm(x, wt, BM=512, sub=512):
    return pl.pallas_call(
        functools.partial(mm_kernel, sub=sub),
        grid=(M // BM,),
        in_specs=[
            pl.BlockSpec((BM, H), lambda i: (i, 0)),
            pl.BlockSpec((O, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BM, O), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, O), jnp.bfloat16),
    )(x, wt)

def timed(name, x, wt):
    @jax.jit
    def run(x, wt):
        def body(c, _):
            y = pallas_mm(x, wt)
            return c + y[0, 0].astype(jnp.float32), None
        a, _ = jax.lax.scan(body, jnp.float32(0), None, length=REP)
        return a
    try:
        np.asarray(jax.device_get(run(x, wt)))
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:300]}", flush=True)
        return
    t0 = time.time()
    np.asarray(jax.device_get(run(x, wt)))
    dt = (time.time() - t0) / REP
    print(f"{name}: {dt*1e3:.3f} ms  {2*M*H*O/dt/1e12:.1f} TOP/s", flush=True)

timed("int8", x8, wt8)
timed("int4", x4, wt4)
# correctness of the int4 dot
y4 = pallas_mm(x4, wt4)[:8, :8]
ref = (q(xb,7)[:8] @ q(wtb,7).T[:, :8]).astype(jnp.float32)
print("int4 correct:", np.allclose(np.asarray(y4, np.float32), np.asarray(ref), atol=1), flush=True)

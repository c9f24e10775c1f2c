"""Does Mosaic lower an int8 x int8 -> int32 dot onto the v5e MXU's
int8 mode (2x bf16 throughput), or does it upcast?

Times [R,768] @ [768,3072] in-context (lax.scan of 16 inside ONE jit
dispatch, so the relay's eager-dispatch overhead is out of the
measurement) in four modes: XLA bf16, pallas bf16, pallas int8->int32,
XLA int8->int32.  v5e peak: bf16 197 TFLOP/s, int8 394 TOP/s — if the
pallas int8 column halves the bf16 time, the int8 MXU mode is live and
the encoder's dense tower (123 ms/step of matmul floor) can ride it.

Run: PYTHONPATH=/root/repo python probes/probe_int8_mxu.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu", jax.devices()

R, K, N = 65536, 768, 3072
TILE = 512
STEPS = 16
FLOPS = 2 * R * K * N * STEPS


def _mm_kernel(x_ref, w_ref, o_ref, *, acc_t):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc_t,
    )


def pallas_mm(x, w, acc_t, out_t):
    return pl.pallas_call(
        functools.partial(_mm_kernel, acc_t=acc_t),
        grid=(R // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R, N), out_t),
    )(x, w)


def timed(fn, *args, reps=3):
    f = jax.jit(fn)
    np.asarray(jax.device_get(f(*args)))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(f(*args)))
    dt = (time.time() - t0) / reps
    return dt / STEPS * 1e3, FLOPS / dt / 1e12 / STEPS * STEPS


kx, kw = jax.random.split(jax.random.PRNGKey(0))
xb = jax.random.normal(kx, (R, K), jnp.bfloat16)
wb = jax.random.normal(kw, (K, N), jnp.bfloat16)
xi = jax.random.randint(kx, (R, K), -127, 128, jnp.int8)
wi = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)


def scan_of(op, x, w):
    def run(x, w):
        def body(c, _):
            # perturb one input element from the carry so XLA cannot CSE
            # or hoist the matmul across scan steps, and reduce the FULL
            # output into the carry so it cannot be sliced through or
            # dead-code-eliminated
            x2 = x.at[0, 0].set((c.astype(jnp.int32) % 2).astype(x.dtype))
            y = op(x2, w)
            return c + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return acc

    return run, (x, w)


cases = [
    ("xla bf16      ", *scan_of(
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32), xb, wb)),
    ("xla int8->i32 ", *scan_of(
        lambda x, w: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), xi, wi)),
    ("pallas bf16   ", *scan_of(
        lambda x, w: pallas_mm(x, w, jnp.float32, jnp.float32), xb, wb)),
    ("pallas i8->i32", *scan_of(
        lambda x, w: pallas_mm(x, w, jnp.int32, jnp.int32), xi, wi)),
]

for name, run, args in cases:
    ms, tf = timed(run, *args)
    print(f"{name}: {ms:7.2f} ms/mm   {tf:6.1f} T(FL)OP/s")

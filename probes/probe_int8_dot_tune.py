"""Tile-shape tuning for the int8 MLP dot — can a pallas kernel reach or
beat XLA's 117 TOP/s on [R,768] @ [768,3072] int8->int32?

Round-4 context (NOTES.md "fused int8 MLP-block kernel"): the fused MLP
kernel's net win was +1.8% because its two naive-pallas dots run at
~76 TOP/s vs XLA's 117, paying back ~35% of the fusion's HBM saving.
probe_int8_mxu measured ONE pallas config (row tile 512, full N in one
block, int32 out to HBM).  This probe sweeps the axes that plausibly
explain the gap:

  * row tile: 128 (the fused kernel's), 256, 512, 1024
  * N tile: full 3072 vs split 1536/1024 (halves the VMEM out block,
    deepens the DMA pipeline)
  * grid iteration order / dimension_semantics ("parallel" rows)
  * out dtype: int32 (probe_int8_mxu's) vs bf16-after-dequant (the
    fused kernel never writes int32 to HBM, so its regime is the
    bf16-out column)

All cases run in ONE jit dispatch (lax.scan of STEPS, perturbed input)
per probe_int8_mxu's methodology; XLA int8 and bf16 dots are re-measured
in the same session as the yardstick.

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_int8_dot_tune.py
"""

import functools
import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".int8_dot_tune.jsonl")

CASES = [
    # (name, row_tile, n_tile, out_dtype, semantics)
    ("xla-i8", 0, 0, "int32", ""),
    ("xla-bf16", 0, 0, "bf16", ""),
    ("rt128-full-i32", 128, 3072, "int32", "arbitrary"),
    ("rt256-full-i32", 256, 3072, "int32", "arbitrary"),
    ("rt512-full-i32", 512, 3072, "int32", "arbitrary"),
    ("rt1024-full-i32", 1024, 3072, "int32", "arbitrary"),
    ("rt256-n1536-i32", 256, 1536, "int32", "arbitrary"),
    ("rt512-n1536-i32", 512, 1536, "int32", "arbitrary"),
    ("rt512-n1024-i32", 512, 1024, "int32", "arbitrary"),
    ("rt512-full-i32-par", 512, 3072, "int32", "parallel"),
    ("rt128-full-bf16", 128, 3072, "bf16", "arbitrary"),
    ("rt256-full-bf16", 256, 3072, "bf16", "arbitrary"),
    ("rt512-full-bf16", 512, 3072, "bf16", "arbitrary"),
    ("rt512-n1536-bf16", 512, 1536, "bf16", "arbitrary"),
]

if not os.environ.get("CASE"):
    # driver mode (see probe_v4_int8_bisect.py): one process per case so
    # a relay drop mid-sweep doesn't lose finished measurements
    done = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            r = json.loads(line)
            done[r["name"]] = r
    for name, *_ in CASES:
        if name in done:
            r = done[name]
            print(f"{name:20s}: {r['ms']:7.2f} ms/mm  {r['tops']:6.1f} TOP/s"
                  " (cached)", flush=True)
            continue
        rc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=dict(os.environ, CASE=name),
        ).returncode
        if rc != 0:
            sys.exit(f"case {name} failed (rc {rc}); re-run to resume")
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "tpu", jax.devices()

R, K, N = 65536, 768, 3072
STEPS = 16
FLOPS = 2 * R * K * N


def _mm_kernel(x_ref, w_ref, o_ref, *, out_dtype):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if out_dtype == jnp.bfloat16:
        # the fused-MLP regime: dequant epilogue, bf16 leaves the kernel
        acc = (acc.astype(jnp.float32) * (1.0 / 127.0)).astype(jnp.bfloat16)
    o_ref[...] = acc


def make_pallas(row_tile, n_tile, out_dtype, semantics):
    grid = (R // row_tile,) if n_tile == N else (R // row_tile, N // n_tile)
    if n_tile == N:
        in_specs = [
            pl.BlockSpec((row_tile, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
        ]
        out_spec = pl.BlockSpec((row_tile, N), lambda i: (i, 0))
        dims = (semantics,)
    else:
        in_specs = [
            pl.BlockSpec((row_tile, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, n_tile), lambda i, j: (0, j)),
        ]
        out_spec = pl.BlockSpec((row_tile, n_tile), lambda i, j: (i, j))
        dims = (semantics, "arbitrary")

    def op(x, w):
        return pl.pallas_call(
            functools.partial(_mm_kernel, out_dtype=out_dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((R, N), out_dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        )(x, w)

    return op


def xla_op(out_dtype):
    def op(x, w):
        if out_dtype == jnp.bfloat16 and x.dtype == jnp.bfloat16:
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return op


def run_case(op, x, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            x2 = x.at[0, 0].set((c.astype(jnp.int32) % 2).astype(x.dtype))
            y = op(x2, w)
            return c + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return acc

    np.asarray(jax.device_get(run(x, w)))
    t0 = time.time()
    for _ in range(3):
        np.asarray(jax.device_get(run(x, w)))
    dt = (time.time() - t0) / 3 / STEPS
    return dt * 1e3, FLOPS / dt / 1e12


name = os.environ["CASE"]
spec = next(c for c in CASES if c[0] == name)
_, row_tile, n_tile, out_name, semantics = spec
out_dtype = jnp.int32 if out_name == "int32" else jnp.bfloat16

kx, kw = jax.random.split(jax.random.PRNGKey(0))
if name == "xla-bf16":
    x = jax.random.normal(kx, (R, K), jnp.bfloat16)
    w = jax.random.normal(kw, (K, N), jnp.bfloat16)
    op = xla_op(jnp.bfloat16)
else:
    x = jax.random.randint(kx, (R, K), -127, 128, jnp.int8)
    w = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)
    op = xla_op(out_dtype) if name == "xla-i8" else make_pallas(
        row_tile, n_tile, out_dtype, semantics
    )

ms, tops = run_case(op, x, w)
with open(RESULTS, "a") as f:
    f.write(json.dumps({"name": name, "ms": ms, "tops": tops}) + "\n")
print(f"{name:20s}: {ms:7.2f} ms/mm  {tops:6.1f} TOP/s", flush=True)

"""Can the v4 panel kernel's matmul structure lift the DENSE int8 dots?

VERDICT r4 next #3: the round-4 parking of Mosaic int8 matmul tuning
("naive pallas dots run BELOW XLA", 76 vs 117 TOP/s,
probes/probe_int8_mxu.py) is contradicted by the v4-int8 bisect, which
measured the v4 panel kernel's OWN int8 matmul at 443 TOP/s (L1: 7.87
TOP in 17.8 ms, NOTES.md) on the same chip.  The panel kernel differs
from the naive dense pallas dot in three structural ways:

  1. contraction on the LANES of BOTH operands — ``(((1,),(1,)),((),()))``
     with the resident rhs stored TRANSPOSED [N, K] — where the naive
     dense dot used ``(((1,),(0,)),...)`` (rhs contracts on sublanes);
  2. small-N subtile dots: the resident operand is cut into [256, K]
     subtiles and the kernel runs an unrolled loop of [M,K]x[256,K]
     dots, instead of one [M,K]x[K,3072] dot;
  3. a large streamed M tile (1024 rows/grid step) with tiny outputs.

This probe applies (1)-(3) to the encoder's two MLP GEMMs —
G1 [R,768]x[768,3072] and G2 [R,3072]x[3072,768]
(models/encoder.py:_dense; the reference's gen_doc_embeddings.py:65-158
hot loop) — with a realistic dequant epilogue (int32 -> f32 scale ->
bf16 out, what _dense does).  Dense MUST write its [R, N] output (the
panel kernel writes 128x less), so the speed-of-light here is
max(MXU time, out-stream time), not the panel kernel's pure-MXU rate:

  G1 at R=65536: 0.31 TOP; MXU floor at 443 TOP/s = 0.70 ms; bf16 out
  stream 402 MB at ~819 GB/s = 0.49 ms -> SoL ~0.70 ms = 440 TOP/s.
  XLA int8 measures ~117 TOP/s (2.64 ms).  If a panel-structured dense
  dot clears ~2x XLA (>= ~235 TOP/s), wire it into the fused MLP kernel
  (ops/fused_mlp.py) and models/encoder.py:_dense and re-measure encode
  (target >= 1.1 Mtok/s from 0.793).

In-scan timing per probe_int8_mxu.py: STEPS matmuls inside one jit'd
lax.scan, input perturbed per step, full output folded into the carry
(no DCE, no relay overhead).  Run (TPU, nothing else on the chip):
  PYTHONPATH=/root/repo python probes/probe_panel_dense.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

assert jax.devices()[0].platform == "tpu", jax.devices()

R = 65536
STEPS = 8


def _panel_dense_kernel(x_ref, wt_ref, s_ref, o_ref, *, ncol: int):
    """One streamed [M, K] x tile against the resident transposed
    [N, K] weight, as an unrolled loop of [M,K]x[ncol,K] lane-lane
    dots (the v4 panel orientation), dequant epilogue, bf16 out."""
    x = x_ref[...]
    N = wt_ref.shape[0]
    for t in range(N // ncol):
        c0 = t * ncol
        y = jax.lax.dot_general(
            x, wt_ref[c0 : c0 + ncol, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [M, ncol]
        o_ref[:, c0 : c0 + ncol] = (
            y.astype(jnp.float32) * s_ref[0, c0 : c0 + ncol][None, :]
        ).astype(jnp.bfloat16)


def panel_dense(x, wt, s, xt: int, ncol: int):
    """y = dequant(x @ wt.T) with the panel structure; x [R,K] int8
    streamed in [xt,K] tiles, wt [N,K] int8 resident, s [N] f32."""
    Rr, K = x.shape
    N = wt.shape[0]
    return pl.pallas_call(
        functools.partial(_panel_dense_kernel, ncol=ncol),
        grid=(Rr // xt,),
        in_specs=[
            pl.BlockSpec((xt, K), lambda i: (i, 0)),
            pl.BlockSpec((N, K), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((xt, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rr, N), jnp.bfloat16),
    )(x, wt, s.reshape(1, N))


def _panel2d_kernel(x_ref, wt_ref, s_ref, o_ref):
    """2-D grid (M tiles x N subtiles): one lane-lane dot per cell with a
    SMALL [xt, ncol] output block — mirrors the v4 kernel's tiny-write
    granularity (its panels are 128x smaller than a dense output must
    be, but per-cell writes let Mosaic double-buffer 256 KB, not 3 MB)."""
    y = jax.lax.dot_general(
        x_ref[...], wt_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (y.astype(jnp.float32) * s_ref[...]).astype(jnp.bfloat16)


def panel2d_dense(x, wt, s, xt: int, ncol: int, semantics=None):
    Rr, K = x.shape
    N = wt.shape[0]
    kw = {}
    if semantics is not None:
        try:
            from jax.experimental.pallas import tpu as pltpu
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=semantics
            )
        except Exception:  # noqa: BLE001 — API moved; try the dict form
            kw["compiler_params"] = dict(
                mosaic=dict(dimension_semantics=semantics)
            )
    return pl.pallas_call(
        _panel2d_kernel,
        grid=(Rr // xt, N // ncol),
        in_specs=[
            pl.BlockSpec((xt, K), lambda i, t: (i, 0)),
            pl.BlockSpec((ncol, K), lambda i, t: (t, 0)),
            pl.BlockSpec((1, ncol), lambda i, t: (0, t)),
        ],
        out_specs=pl.BlockSpec((xt, ncol), lambda i, t: (i, t)),
        out_shape=jax.ShapeDtypeStruct((Rr, N), jnp.bfloat16),
        **kw,
    )(x, wt, s.reshape(1, N))


def _naive_dense_kernel(x_ref, w_ref, s_ref, o_ref):
    """The probe_int8_mxu orientation ((1,),(0,)) + the same dequant
    epilogue, for a like-for-like in-probe baseline."""
    y = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[...] = (
        y.astype(jnp.float32) * s_ref[0, :][None, :]
    ).astype(jnp.bfloat16)


def naive_dense(x, w, s, xt: int):
    Rr, K = x.shape
    N = w.shape[1]
    return pl.pallas_call(
        _naive_dense_kernel,
        grid=(Rr // xt,),
        in_specs=[
            pl.BlockSpec((xt, K), lambda i: (i, 0)),
            pl.BlockSpec((K, N), lambda i: (0, 0)),
            pl.BlockSpec((1, N), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((xt, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Rr, N), jnp.bfloat16),
    )(x, w, s.reshape(1, N))


def xla_dense(x, w, s):
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * s[None, :]).astype(jnp.bfloat16)


def scan_of(op, x, *rest):
    def run(x, *rest):
        def body(c, _):
            x2 = x.at[0, 0].set((c.astype(jnp.int32) % 2).astype(x.dtype))
            y = op(x2, *rest)
            return c + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return acc

    return run, (x, *rest)


def timed(fn, *args, flops, reps=3):
    f = jax.jit(fn)
    np.asarray(jax.device_get(f(*args)))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(f(*args)))
    dt = (time.time() - t0) / reps / STEPS
    return dt * 1e3, flops / dt / 1e12


def main():
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    for gemm, (K, N) in (("G1", (768, 3072)), ("G2", (3072, 768))):
        flops = 2 * R * K * N
        x = jax.random.randint(kx, (R, K), -127, 128, jnp.int8)
        w = jax.random.randint(kw, (K, N), -127, 128, jnp.int8)
        wt = jnp.asarray(np.ascontiguousarray(np.asarray(w).T))
        s = jax.random.uniform(kw, (N,), jnp.float32, 0.5, 2.0)

        cases = [(f"{gemm} xla i8+dequant        ",
                  *scan_of(xla_dense, x, w, s))]
        cases.append((f"{gemm} naive xt=512           ",
                      *scan_of(lambda x, w, s:
                               naive_dense(x, w, s, 512), x, w, s)))
        for xt, ncol in ((128, 256), (512, 256), (512, 512), (512, N)):
            # VMEM: wt (K*N int8 = 2.25 MiB) + x tile (xt*K x2) +
            # out (xt*N*2 x2); all listed combos fit under ~10 MiB
            cases.append(
                (f"{gemm} panel xt={xt:<4} n={ncol:<4}",
                 *scan_of(lambda x, wt, s, xt=xt, ncol=ncol:
                          panel_dense(x, wt, s, xt, ncol), x, wt, s))
            )
        for xt, ncol in ((512, 256), (1024, 256), (512, 512)):
            cases.append(
                (f"{gemm} pan2d xt={xt:<4} n={ncol:<4}",
                 *scan_of(lambda x, wt, s, xt=xt, ncol=ncol:
                          panel2d_dense(x, wt, s, xt, ncol),
                          x, wt, s))
            )
        cases.append(
            (f"{gemm} pan2d 512/256 par-arb  ",
             *scan_of(lambda x, wt, s:
                      panel2d_dense(x, wt, s, 512, 256,
                                    semantics=("parallel", "arbitrary")),
                      x, wt, s))
        )

        # correctness pin (tiny slice, once per gemm): panel == xla
        ref = np.asarray(xla_dense(x[:256], w, s))
        got = np.asarray(panel_dense(x[:256], wt, s, 256, 256))
        np.testing.assert_array_equal(ref, got)
        got2 = np.asarray(panel2d_dense(x[:256], wt, s, 256, 256))
        np.testing.assert_array_equal(ref, got2)
        print(f"{gemm}: panel/pan2d == xla (exact, 256 rows)")

        for name, run, args in cases:
            try:
                ms, tf = timed(run, *args, flops=flops)
                print(f"{name}: {ms:7.2f} ms/mm  {tf:6.1f} TOP/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001 — record and continue
                print(f"{name}: FAILED {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

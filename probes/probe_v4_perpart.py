"""On-chip before/after for the round-4 per-part selection restructure
(VERDICT r4 next #2) with HONEST sinks.

The round-4 bisect (probe_v4_int8_bisect) predicted ~7.4 ms of program
interaction from the three [Wp, 2048] panel concats; the shipped
`_v4_search` now runs the whole post-panel selection per q-panel part and
concatenates only the [QP, k] outputs.  But the bisect's L4 used a NARROW
sink (s[0, 0]) — which, under the per-part structure, lets XLA dead-code
-eliminate every part but the first (the bench.py `_sink` finding).  So
neither the 35.8 ms "before" nor any "after" is an honest shipped wall.

This probe measures both pipelines with EVERY score and id folded into
the scan carry:

  perpart_int8 / perpart_bf16 — the shipped `_v4_search`
  concat_int8  / concat_bf16  — the pre-restructure pipeline rebuilt from
      the same primitives: concat the two parts' [Wp, 1024] panels into
      [Wp, 2048], one v_k select, one flag select, one rescore, one final
      select (faithful to the round-3 single-panel-pipeline structure)

Shape: the benchmark regime, N=2.5M x Q=2048 x D=768 x k=100.
Subprocess-per-case (relay retry resilience; results cached in a JSONL).

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_v4_perpart.py
"""

import functools
import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".v4_perpart.jsonl")
CASES = ["perpart_int8", "concat_int8", "perpart_bf16", "concat_bf16"]

if not os.environ.get("CASE"):
    done = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            r = json.loads(line)
            done[r["case"]] = r
    for case in CASES:
        if case in done:
            print(f"{case:13s}: {done[case]['ms']:6.2f} ms (cached)",
                  flush=True)
            continue
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=dict(os.environ, CASE=case),
        )
        if r.returncode != 0:
            sys.exit(f"case {case} failed (rc {r.returncode}); re-run to resume")
        for line in open(RESULTS):
            rec = json.loads(line)
            done[rec["case"]] = rec
    if all(c in done for c in CASES):
        for dt in ("int8", "bf16"):
            b, a = done[f"concat_{dt}"]["ms"], done[f"perpart_{dt}"]["ms"]
            print(f"{dt}: concat {b:.2f} ms -> perpart {a:.2f} ms "
                  f"({b / a:.3f}x); honest QPS {2048 / a * 1e3:,.0f}")
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.ops.pallas_topk_v4 import (
    NEG_INF,
    _rescore_windows,
    _v4_search,
    _window_top2_kernel,
    pallas_select_topk_t,
)

assert jax.devices()[0].platform == "tpu"

N, D, Q, K = 2_500_608, 768, 2048, 100
REPS = 4
SW, BUDGET = 128, 4
P_TILE, Q_TILE = 1024, 256
N_WIN = P_TILE // SW
FLUSH = 128 // N_WIN
N_TILES = N // P_TILE
WP = -(-N_TILES // FLUSH) * FLUSH * N_WIN


def run_panels(qpanel, psg):
    """The window-top-2 pallas_call exactly as _v4_search's run_panel."""
    QP = qpanel.shape[0]
    kernel = functools.partial(
        _window_top2_kernel, pt=P_TILE, qt=Q_TILE, sw=SW, flush=FLUSH
    )
    out_spec = pl.BlockSpec((128, QP), lambda j, *_: (j // FLUSH, 0))
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec((QP, D), lambda j, *_: (0, 0)),
                pl.BlockSpec((P_TILE, D), lambda j, *_: (j, 0)),
            ],
            out_specs=[out_spec] * 3,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((WP, QP), jnp.float32),
            jax.ShapeDtypeStruct((WP, QP), jnp.int32),
            jax.ShapeDtypeStruct((WP, QP), jnp.float32),
        ],
    )(jnp.asarray([N], jnp.int32), qpanel, psg)

case = os.environ["CASE"]
dt = case.rsplit("_", 1)[1]
kq, kp = jax.random.split(jax.random.PRNGKey(0))
if dt == "int8":
    passages = jax.random.randint(kp, (N, D), -127, 128, jnp.int8)
    queries = jax.random.randint(kq, (Q, D), -127, 128, jnp.int8)
else:
    passages = jax.random.normal(kp, (N, D), jnp.bfloat16)
    queries = jax.random.normal(kq, (Q, D), jnp.bfloat16)


def sink(s, i):
    return (
        jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)).astype(jnp.float32)
        + jnp.sum(i.astype(jnp.float32))
    )


def concat_search(q, psg):
    """The pre-restructure (round-3) pipeline: panel parts concatenated to
    [Wp, Q], selection run ONCE over the full width."""
    parts = [run_panels(q[c0 : c0 + 1024], psg) for c0 in range(0, Q, 1024)]
    v1T, a1T, v2T = (
        jnp.concatenate([p[j] for p in parts], axis=1) for j in range(3)
    )
    Wp = v1T.shape[0]
    v_k = pallas_select_topk_t(v1T, K)[0][:, K - 1]
    flagT = (v2T >= v_k[None, :]) & jnp.isfinite(v2T)
    fw_s, fw = pallas_select_topk_t(jnp.where(flagT, v2T, NEG_INF), BUDGET)
    fvalid = fw_s > NEG_INF
    win_ids = jnp.clip(fw, 0, Wp - 1).astype(jnp.int32)
    starts = win_ids * SW
    resc = _rescore_windows(psg, q, win_ids, SW).reshape(Q, BUDGET, SW)
    gidx = starts[:, :, None] + jnp.arange(SW, dtype=jnp.int32)
    rvalid = fvalid[:, :, None] & (gidx < N)
    rescT = jnp.where(rvalid, resc, NEG_INF).reshape(Q, BUDGET * SW).T
    ridxT = jnp.where(rvalid, gidx, -1).reshape(Q, BUDGET * SW).T
    v1mT = jnp.where(flagT, NEG_INF, v1T)
    poolT = jnp.concatenate([v1mT, rescT], axis=0)
    idsT = jnp.concatenate([jnp.where(v1mT > NEG_INF, a1T, -1), ridxT], axis=0)
    top_s, pos = pallas_select_topk_t(poolT, K)
    top_i = idsT[pos, jnp.arange(Q)[:, None]]
    return top_s, jnp.where(jnp.isfinite(top_s), top_i, -1)


def make(fn):
    @jax.jit
    def run(q, psg):
        def body(c, step):
            if dt == "int8":
                qs = q.at[0, 0].set(
                    (step.astype(jnp.int32) % 3 - 1).astype(jnp.int8)
                )
            else:
                qs = q + step.astype(q.dtype) * 1e-6
            s, i = fn(qs, psg)
            return c + sink(s, i), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return acc

    return run


if case.startswith("perpart"):
    fn = make(lambda q, p: _v4_search(q, p, jnp.int32(N), K)[:2])
else:
    fn = make(concat_search)


def timeit(f, *a, reps=3):
    np.asarray(jax.device_get(f(*a)))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(f(*a)))
    return (time.time() - t0) / reps / REPS * 1e3

v = timeit(fn, queries, passages)
with open(RESULTS, "a") as f:
    f.write(json.dumps({"case": case, "ms": v}) + "\n")
print(f"{case:13s}: {v:6.2f} ms", flush=True)

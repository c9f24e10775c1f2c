"""Honest cost ledger for the SHIPPED v4 pipeline (sw256, per-part).

The round-4 bisect ran at the old geometry (sw128, p_tile 1024, concat
pipeline) with a narrow sink, so its increments no longer describe what
ships.  This probe re-levels the CURRENT `_v4_search` structure — auto
geometry sw=256 / p_tile=2048 / budget 6 (int8) / 8 (bf16), per-q-panel
-part selection, warm-floor + seg-256 selects — folding EVERY output
computed at each level into the scan carry (the window kernel is one
opaque custom call, so using any of its outputs runs all of it; the
elementwise/selection stages above it are levelled output-by-output):

  L1_panels   both parts' window-top-2 panel calls
  L2_vk       + warm_floor + k=100 v_k column-select per part
  L3_flags    + flag mask, n_flag reduce, budget flagged-window select
  L4_rescore  + scalar-prefetch window rescore + valid-mask transposes
  L5_full     the shipped `_v4_search` (pool concat, final select,
              id gather, [QP,k] part concat, int8 dequant)

Increment attribution: L2-L1 = v_k select; L3-L2 = flag machinery;
L4-L3 = rescore; L5-L4 = final select + pool/id concats + gathers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_v4_ledger.py
"""

import functools
import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".v4_ledger.jsonl")
LEVELS = ["L1_panels", "L2_vk", "L3_flags", "L4_rescore", "L5_full"]
CASES = [f"{dt}-{lv}" for dt in ("int8", "bf16") for lv in LEVELS]
# L1 geometry A/B: is the sw256 panel stage slower than sw128's?  The
# round-4 bisect priced the sw128/p1024 panel call at 17.8 ms (int8);
# the shipped sw256/p2048 L1 above measures 29.4 — if the 17.8 holds
# honest, the panel kernel itself regressed ~11 ms for the wide windows
# and a merge-pairs-at-flush variant would recover it.
CASES += [
    "int8-L1g_sw128_p1024", "int8-L1g_sw128_p2048",
    "bf16-L1g_sw128_p1024",
]
# kernel-internal knobs at the shipped sw256/p2048 geometry: the honest
# panel rate is 268 TOP/s int8 (68% of nominal MXU) — does a larger
# q-tile (fewer per-tile loop trips, bigger dots) or a 4096 p_tile
# (half the grid steps) close any of it?
CASES += [
    "int8-L1q_qt512", "int8-L1q_qt1024", "int8-L1g_sw256_p4096",
]
# p4096 won the L1 stage (28.12 vs 29.43): trend check at 8192 plus the
# FULL shipped pipeline at p_tile=4096 (corpus padded to a 4096
# multiple, n_valid = the 2048-padded baseline N so the compared work is
# identical).
CASES += [
    "int8-L1g_sw256_p8192",
    "int8-L5p_p4096", "bf16-L5p_p4096",
]

if not os.environ.get("CASE"):
    done = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            r = json.loads(line)
            done[r["case"]] = r
    for case in CASES:
        if case in done:
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
    for dt in ("int8", "bf16"):
        prev = 0.0
        print(f"-- {dt} (2.5M x 2048 x k=100, shipped sw256 geometry)")
        for lv in LEVELS:
            c = f"{dt}-{lv}"
            if c not in done:
                break
            ms = done[c]["ms"]
            print(f"{lv:11s}: {ms:6.2f} ms  (+{ms - prev:5.2f})")
            prev = ms
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
    warm_floor,
)

assert jax.devices()[0].platform == "tpu"

N, D, Q, K = 2_500_608, 768, 2048, 100
REPS = 4
SW, P_TILE, Q_TILE = 256, 2048, 256  # the shipped auto geometry at 2.5M
N_WIN = P_TILE // SW
FLUSH = 128 // N_WIN
N_TILES = N // P_TILE
WP = -(-N_TILES // FLUSH) * FLUSH * N_WIN

case = os.environ["CASE"]
dt, level = case.split("-")
BUDGET = 6 if dt == "int8" else 8
if level.startswith("L1g_"):
    _, sw_s, pt_s = level.split("_")
    SW, P_TILE = int(sw_s[2:]), int(pt_s[1:])
    level = "L1_panels"
elif level.startswith("L1q_"):
    Q_TILE = int(level.split("_qt")[1])
    level = "L1_panels"
elif level.startswith("L5p_"):
    P_TILE = int(level.split("_p")[1])
    level = "L5_full"
if True:  # re-derive for any geometry override
    N_WIN = P_TILE // SW
    FLUSH = 128 // N_WIN
    N_TILES = N // P_TILE
    WP = -(-N_TILES // FLUSH) * FLUSH * N_WIN


def run_panels(qpanel, psg):
    """The window-top-2 pallas_call exactly as _v4_search's run_panel
    (incl. the round-5 32 MB VMEM limit)."""
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
    )(jnp.asarray([N], jnp.int32), qpanel, psg)


kq, kp = jax.random.split(jax.random.PRNGKey(0))
N_ROWS = -(-N // P_TILE) * P_TILE if level == "L5_full" else N
if dt == "int8":
    passages = jax.random.randint(kp, (N_ROWS, D), -127, 128, jnp.int8)
    queries = jax.random.randint(kq, (Q, D), -127, 128, jnp.int8)
else:
    passages = jax.random.normal(kp, (N_ROWS, D), jnp.bfloat16)
    queries = jax.random.normal(kq, (Q, D), jnp.bfloat16)


def fold(*arrs):
    acc = jnp.float32(0)
    for a in arrs:
        af = a.astype(jnp.float32) if a.dtype != jnp.float32 else a
        acc = acc + jnp.sum(jnp.where(jnp.isfinite(af), af, 0.0))
    return acc


def leveled(q, psg):
    acc = jnp.float32(0)
    for c0 in range(0, Q, 1024):
        part = q[c0 : c0 + 1024]
        v1T, a1T, v2T = run_panels(part, psg)
        if level == "L1_panels":
            acc += fold(v1T, a1T, v2T)
            continue
        v_k = pallas_select_topk_t(
            v1T, K, rm0=warm_floor(v1T, K), seg=256
        )[0][:, K - 1]
        if level == "L2_vk":
            acc += fold(v_k, a1T, v2T)
            continue
        flagT = (v2T >= v_k[None, :]) & jnp.isfinite(v2T)
        n_flag = jnp.max(jnp.sum(flagT, axis=0))
        fw_s, fw = pallas_select_topk_t(
            jnp.where(flagT, v2T, NEG_INF), BUDGET
        )
        if level == "L3_flags":
            acc += fold(fw_s, fw, n_flag[None], a1T, v1T)
            continue
        fvalid = fw_s > NEG_INF
        win_ids = jnp.clip(fw, 0, WP - 1).astype(jnp.int32)
        starts = win_ids * SW
        resc = _rescore_windows(psg, part, win_ids, SW).reshape(
            1024, BUDGET, SW
        )
        gidx = starts[:, :, None] + jnp.arange(SW, dtype=jnp.int32)
        rvalid = fvalid[:, :, None] & (gidx < N)
        rescT = jnp.where(rvalid, resc, NEG_INF).reshape(1024, BUDGET * SW).T
        ridxT = jnp.where(rvalid, gidx, -1).reshape(1024, BUDGET * SW).T
        assert level == "L4_rescore", level
        acc += fold(rescT, ridxT, n_flag[None], a1T, v1T, flagT)
    return acc


@jax.jit
def run(q, psg):
    def body(c, step):
        if dt == "int8":
            qs = q.at[0, 0].set(
                (step.astype(jnp.int32) % 3 - 1).astype(jnp.int8)
            )
        else:
            qs = q + step.astype(q.dtype) * 1e-6
        if level == "L5_full":
            s, i, _ = _v4_search(qs, psg, jnp.int32(N), K, p_tile=P_TILE)
            return c + fold(s, i), None
        return c + leveled(qs, psg), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
    return acc


def timeit(f, *a, reps=3):
    np.asarray(jax.device_get(f(*a)))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(f(*a)))
    return (time.time() - t0) / reps / REPS * 1e3


v = timeit(run, queries, passages)
with open(RESULTS, "a") as f:
    f.write(json.dumps({"case": case, "ms": v}) + "\n")
print(f"{case:15s}: {v:6.2f} ms", flush=True)

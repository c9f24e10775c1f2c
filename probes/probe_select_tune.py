"""Variant sweep of the k=100 column-select (pallas_select_topk_t) at the
v4 panel shape [Wp=19584, Q=2048] — the 13.4 ms that probe_v4_int8_bisect
attributes to the v_k select (37% of the int8 search wall).

Hypothesis chain: the budget-4 select (K=8 buffer) over the SAME panel
costs 0.4 ms, so the area/read is not the cost — it is the [K=104, qs]
insert-buffer ops, multiplied by the cold-start exactness rounds (the
while_loop re-sweeps each tile until no spilled value beats the running
k-th; the first tiles admit ~1 value per segment per round until the
buffer fills).  Cases, each its own jit scan (subprocess-per-case for
relay-retry resilience):

  base     shipping kernel, k=100                       (expect ~13 ms)
  pool     shipping kernel over [Wp+512, Q] (the final-select shape —
           chases the bisect's observation that the IN-CONTEXT final
           select costs only ~2-3 ms)
  norounds rounds loop disabled (approximate; bounds the rounds share)
  warm     rm warm-started at nextafter(t_hat, -inf), t_hat = per-query
           k-th largest SEGMENT max (a [Wp/128, Q] max-reduce + tiny
           top_k): every final top-k value is >= t_hat, so admitting
           only values > nextafter-down(t_hat) is EXACT and skips the
           cold-start rounds
  sw256    segment width 256 (half the insert calls per row)
  warm256  warm + sw256

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_select_tune.py
"""

import functools
import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".select_tune.jsonl")
# real* cases run the same variants on the REAL v1 window-max panel from
# the int8 corpus (probe_v4_int8_bisect's L2-L1 = 13.4 ms vs base's
# 6.0 ms standalone: either real window-max values round much harder
# than the synthetic draw, or the cost is program interaction — the
# [Wp, 2048] concat of the two q-panel parts and its materialization).
# realsplit selects each [Wp, 1024] part separately (query columns are
# independent) and never materializes the concat.
CASES = ["base", "pool", "norounds", "warm", "sw256", "warm256", "exact",
         "realv1", "realnorounds", "realwarm", "realsplit"]

if not os.environ.get("CASE"):
    done = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            r = json.loads(line)
            done[r["case"]] = r
    for case in CASES:
        if case in done:
            print(f"{case:9s}: {done[case]}", flush=True)
            continue
        r = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=dict(os.environ, CASE=case),
        )
        if r.returncode != 0:
            sys.exit(f"case {case} failed (rc {r.returncode}); re-run to resume")
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.ops.pallas_topk_v4 import NEG_INF, pallas_select_topk_t

assert jax.devices()[0].platform == "tpu"

WP, Q, K = 19584, 2048, 100
REPS = 8

# integer-valued scores like the int8 MXU mode's window maxes (ties rare,
# exchangeable random order — the statistic that drives the rounds)
panel = jnp.round(
    jax.random.normal(jax.random.PRNGKey(0), (WP, Q), jnp.float32) * 1e5
)


def _select_t_kernel_v(
    n_valid_ref, s_ref, rm0_ref, out_s_ref, out_i_ref, scores, rmin,
    *, ct, qs, sw, rounds,
):
    """_select_t_kernel with (a) an rm warm-start input row and (b) the
    rounds loop optional; rm is clamped at the warm floor so -inf buffer
    slots cannot re-open the admission gate."""
    j = pl.program_id(0)
    QP = s_ref.shape[1]
    Kb = out_s_ref.shape[0]
    n_seg = ct // sw

    @pl.when(j == 0)
    def _():
        out_s_ref[...] = jnp.full(out_s_ref.shape, NEG_INF, jnp.float32)
        out_i_ref[...] = jnp.full(out_i_ref.shape, -1, jnp.int32)
        rmin[...] = jnp.broadcast_to(rm0_ref[0:1, :], rmin.shape)

    base = j * ct
    nv = n_valid_ref[0]
    sub_ids = jax.lax.broadcasted_iota(jnp.int32, (sw, qs), 0)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (Kb, qs), 0)
    valid = base + jax.lax.broadcasted_iota(jnp.int32, (ct, 1), 0) < nv

    def extract_insert(seg, g, r0, rm, rm0):
        val = jnp.max(seg, axis=0)
        sub = jnp.argmax(seg, axis=0).astype(jnp.int32)
        act = val > rm
        masked = jnp.where(sub_ids == sub[None, :], NEG_INF, seg)
        bs = out_s_ref[:, r0 : r0 + qs]
        amin = jnp.argmin(bs, axis=0).astype(jnp.int32)
        slot = (k_ids == amin[None, :]) & act[None, :]
        out_s_ref[:, r0 : r0 + qs] = jnp.where(slot, val[None, :], bs)
        out_i_ref[:, r0 : r0 + qs] = jnp.where(
            slot, base + g * sw + sub[None, :], out_i_ref[:, r0 : r0 + qs]
        )
        rm = jnp.maximum(jnp.min(out_s_ref[:, r0 : r0 + qs], axis=0), rm0)
        return masked, rm

    for t in range(QP // qs):
        r0 = t * qs
        rm0 = rm0_ref[0, r0 : r0 + qs]
        s = s_ref[:, r0 : r0 + qs].astype(jnp.float32)
        s = jnp.where(valid, s, NEG_INF)
        rm = rmin[0, r0 : r0 + qs]
        rem = jnp.full((qs,), NEG_INF, jnp.float32)
        for g in range(n_seg):
            masked, rm = extract_insert(
                s[g * sw : (g + 1) * sw, :], g, r0, rm, rm0
            )
            scores[g * sw : (g + 1) * sw, :] = masked
            rem = jnp.maximum(rem, jnp.max(masked, axis=0))
        rmin[0, r0 : r0 + qs] = rm

        if rounds:

            def round_body(carry, r0=r0, rm0=rm0):
                _ = carry
                rm2 = rmin[0, r0 : r0 + qs]
                rem2 = jnp.full((qs,), NEG_INF, jnp.float32)
                for g in range(n_seg):
                    masked, rm2 = extract_insert(
                        scores[g * sw : (g + 1) * sw, :], g, r0, rm2, rm0
                    )
                    scores[g * sw : (g + 1) * sw, :] = masked
                    rem2 = jnp.maximum(rem2, jnp.max(masked, axis=0))
                rmin[0, r0 : r0 + qs] = rm2
                return jnp.any(rem2 > rm2)

            @pl.when(jnp.any(rem > rm))
            def _(round_body=round_body):
                jax.lax.while_loop(lambda c: c, round_body, True)


def select_v(scores_t, k, rm0=None, sw=128, rounds=True, c_tile=512,
             q_sub=256):
    C, Qx = scores_t.shape
    kk = min(k, C)
    c_pad = -C % c_tile
    if c_pad:
        scores_t = jnp.concatenate(
            [scores_t, jnp.zeros((c_pad, Qx), scores_t.dtype)], axis=0
        )
    Cp = C + c_pad
    Kb = max(8, -(-kk // 8) * 8)
    nv = jnp.asarray([C], jnp.int32)
    if rm0 is None:
        rm0 = jnp.full((Qx,), NEG_INF, jnp.float32)
    rm0_in = jnp.broadcast_to(rm0[None, :], (8, Qx))
    kernel = functools.partial(
        _select_t_kernel_v, ct=c_tile, qs=q_sub, sw=sw, rounds=rounds
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Cp // c_tile,),
            in_specs=[
                pl.BlockSpec((c_tile, Qx), lambda j, *_: (j, 0)),
                pl.BlockSpec((8, Qx), lambda j, *_: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((Kb, Qx), lambda j, *_: (0, 0)),
                pl.BlockSpec((Kb, Qx), lambda j, *_: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((c_tile, q_sub), jnp.float32),
                pltpu.VMEM((8, Qx), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Kb, Qx), jnp.float32),
            jax.ShapeDtypeStruct((Kb, Qx), jnp.int32),
        ],
    )(nv, scores_t, rm0_in)
    top_s, pos = jax.lax.top_k(out_s.T, kk)
    top_i = jnp.take_along_axis(out_i.T, pos, axis=1)
    return top_s, top_i


def t_hat(v1T, k):
    """Per-query k-th largest segment max: a valid floor for every final
    top-k value (segment maxes are a subset of the panel values)."""
    C, Qx = v1T.shape
    segs = -(-C // 128)
    pad = segs * 128 - C
    v = v1T
    if pad:
        v = jnp.concatenate([v, jnp.full((pad, Qx), NEG_INF, v.dtype)], axis=0)
    smax = jnp.max(v.reshape(segs, 128, Qx), axis=1)  # [segs, Q]
    kth = jax.lax.top_k(smax.T, min(k, segs))[0][:, -1]  # [Q]
    return jnp.nextafter(kth, jnp.float32(-jnp.inf))


def scanner(fn):
    @jax.jit
    def run(p):
        def body(c, step):
            ps = p.at[0, 0].set(c % 1000.0)
            out = fn(ps)
            return c + out, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return acc

    return run


def timeit(fn, *a, reps=3):
    np.asarray(jax.device_get(fn(*a)))
    t0 = time.time()
    for _ in range(reps):
        np.asarray(jax.device_get(fn(*a)))
    return (time.time() - t0) / reps / REPS * 1e3


def real_v1T():
    """The REAL window-max panel: int8 corpus -> window-top-2 panels,
    eager, once (outside all timed loops)."""
    import functools as ft

    from haconvdr_tpu.ops.pallas_topk_v4 import _window_top2_kernel

    N, D = 2_500_608, 768
    P_TILE, Q_TILE, SW = 1024, 256, 128
    N_WIN = P_TILE // SW
    FLUSH = 128 // N_WIN
    N_TILES = N // P_TILE
    Wp = -(-N_TILES // FLUSH) * FLUSH * N_WIN
    assert Wp == WP, (Wp, WP)
    ch = N // 12
    ins = jax.jit(
        lambda b, c, o: jax.lax.dynamic_update_slice(b, c, (o, 0)),
        donate_argnums=(0,),
    )
    passages = jnp.zeros((N, D), jnp.int8)
    for c in range(12):
        passages = ins(
            passages,
            jax.random.bits(jax.random.PRNGKey(c), (ch, D), jnp.uint8)
            .astype(jnp.int8),
            jnp.int32(c * ch),
        )
    queries = jax.random.randint(
        jax.random.PRNGKey(99), (Q, D), -127, 128, jnp.int8
    )

    def run_panels(qpanel):
        QP = qpanel.shape[0]
        kernel = ft.partial(
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
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.int32),
                jax.ShapeDtypeStruct((Wp, QP), jnp.float32),
            ],
        )(jnp.asarray([N], jnp.int32), qpanel, passages)

    parts = [run_panels(queries[c0 : c0 + 1024])[0] for c0 in (0, 1024)]
    del passages
    return parts


case = os.environ["CASE"]
if case == "exact":
    # warm + sw variants must reproduce the shipping select bit-exactly
    # (values always; ids may swap only between panel rows holding the
    # EXACT same value — checked against the panel itself, since a
    # boundary tie may validly resolve to a row the shipping kernel did
    # not pick)
    panel_np = np.asarray(panel)
    s0, i0 = jax.jit(lambda p: pallas_select_topk_t(p, K))(panel)
    s0, i0 = np.asarray(s0), np.asarray(i0)
    bad = {}
    for name, kw in [
        ("warm", dict(rm0=t_hat(panel, K))),
        ("sw256", dict(sw=256)),
        ("warm256", dict(rm0=t_hat(panel, K), sw=256)),
    ]:
        s1, i1 = jax.jit(
            functools.partial(select_v, k=K, **kw)
        )(panel)
        s1, i1 = np.asarray(s1), np.asarray(i1)
        if not np.array_equal(s0, s1):
            bad[name] = "scores differ"
            continue
        if any(len(np.unique(row)) != len(row) for row in i1):
            bad[name] = "duplicate ids in a row"
            continue
        mm = i0 != i1
        for r, c in zip(*np.nonzero(mm)):
            if panel_np[i1[r, c], r] != s0[r, c]:
                bad[name] = f"id's panel value differs at {(r, c)}"
                break
    rec = {"case": case, "ok": not bad, "bad": bad}
    assert not bad, bad
elif case == "realv1":
    parts = real_v1T()
    v1 = jnp.concatenate(parts, axis=1)
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: pallas_select_topk_t(p, K)[0][0, 0]), v1)}
elif case == "realnorounds":
    parts = real_v1T()
    v1 = jnp.concatenate(parts, axis=1)
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, rounds=False)[0][0, 0]), v1)}
elif case == "realwarm":
    parts = real_v1T()
    v1 = jnp.concatenate(parts, axis=1)
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, rm0=t_hat(p, K))[0][0, 0]), v1)}
elif case == "realsplit":
    parts = real_v1T()

    @jax.jit
    def run(p0, p1):
        def body(c, step):
            ps = p0.at[0, 0].set(c % 1000.0)
            a = pallas_select_topk_t(ps, K)[0][0, 0]
            b = pallas_select_topk_t(p1, K)[0][0, 0]
            return c + a + b, None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(REPS))
        return acc

    rec = {"case": case, "ms": timeit(run, parts[0], parts[1])}
elif case == "base":
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: pallas_select_topk_t(p, K)[0][0, 0]), panel)}
elif case == "pool":
    extra = jnp.round(
        jax.random.normal(jax.random.PRNGKey(1), (512, Q), jnp.float32) * 1e5
    )

    def fn(p):
        pool = jnp.concatenate([p, extra], axis=0)
        return pallas_select_topk_t(pool, K)[0][0, 0]

    rec = {"case": case, "ms": timeit(scanner(fn), panel)}
elif case == "norounds":
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, rounds=False)[0][0, 0]), panel)}
elif case == "warm":
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, rm0=t_hat(p, K))[0][0, 0]), panel)}
elif case == "sw256":
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, sw=256)[0][0, 0]), panel)}
elif case == "warm256":
    rec = {"case": case, "ms": timeit(
        scanner(lambda p: select_v(p, K, rm0=t_hat(p, K), sw=256)[0][0, 0]),
        panel)}
with open(RESULTS, "a") as f:
    f.write(json.dumps(rec) + "\n")
print(rec, flush=True)

"""v4 q_panel sweep: one 2048-wide query panel vs two 1024 parts.

q_panel=1024 was chosen in round 3 because a 2048 panel put the window
kernel's scoped VMEM at 16.54M — over Mosaic's 16 MB default — and the
cost accepted was a SECOND full corpus stream from HBM per search
(~4.5 ms bf16 / ~2.3 ms int8 at 2.5M: the passages are re-read per
panel part).  The round-5 VMEM-limit raise (vmem_limit_bytes=32M on the
panel call, shipped for the f32 sw256 placement edge) makes qp2048
compilable, so the trade can finally be measured: one corpus stream and
half the kernel invocations vs larger per-call working sets (the
rescore kernel's pool is budget*sw rows x [qp] f32 — 12.6M at b6/sw256/
qp2048, needing its own limit raise).

Cases: {int8, bf16} x {qp1024 (shipped), qp2048}, auto seg geometry
(sw256/b6 int8, sw256/b8 bf16 at 2.5M), in-scan with the full sink.
Subprocess-per-case with a JSONL cache (relay-drop resilient).

Run (TPU, nothing else on the chip):
  PYTHONPATH=/root/repo python probes/probe_v4_qpanel.py
"""

import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".v4_qpanel.jsonl")
CASES = [
    "int8_qp1024", "int8_qp2048",
    "bf16_qp1024", "bf16_qp2048",
    "exact_qp2048",
]

if not os.environ.get("CASE"):
    done = {}
    if os.path.exists(RESULTS):
        for line in open(RESULTS):
            r = json.loads(line)
            done[r["case"]] = r
    for case in CASES:
        if case in done:
            print(f"{case:14s}: {done[case]}", flush=True)
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
    for c in CASES:
        if c in done and "ms" in done[c]:
            ms = done[c]["ms"]
            print(f"{c:14s}: {ms:6.2f} ms  "
                  f"({2048 / ms * 1e3:7,.0f} QPS)  "
                  f"n_flag_max={done[c].get('n_flag_max')}")
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.ops.pallas_topk_v4 import _v4_search

assert jax.devices()[0].platform == "tpu"

N, D, Q, K = 2_500_608, 768, 2048, 100
REPS = 4

case = os.environ["CASE"]


def sink(s, i):
    return (
        jnp.sum(jnp.where(jnp.isfinite(s), s, 0.0)).astype(jnp.float32)
        + jnp.sum(i.astype(jnp.float32))
    )


def gen(n, dt, kq, kp):
    if dt == "int8":
        p = jax.random.randint(kp, (n, D), -127, 128, jnp.int8)
        q = jax.random.randint(kq, (Q, D), -127, 128, jnp.int8)
    else:
        p = jax.random.normal(kp, (n, D), jnp.bfloat16)
        q = jax.random.normal(kq, (Q, D), jnp.bfloat16)
    return q, p


kq, kp = jax.random.split(jax.random.PRNGKey(0))

if case == "exact_qp2048":
    # qp2048 must equal the established-exact qp1024 path bit-for-bit on
    # scores at 2.5M; ids may differ only inside exact-tie classes
    # (score-verified, as in probe_v4_segwidth).
    for dt in ("int8", "bf16"):
        q, p = gen(N, dt, kq, kp)
        s1, i1, f1 = (np.asarray(x) for x in _v4_search(
            q, p, jnp.int32(N), K, q_panel=1024))
        s2, i2, f2 = (np.asarray(x) for x in _v4_search(
            q, p, jnp.int32(N), K, q_panel=2048))
        np.testing.assert_array_equal(s1, s2)
        diff = i1 != i2
        if diff.any():
            rows, cols = np.nonzero(diff)
            true = np.asarray(jax.jit(
                lambda P, Qm, ids, rs: jax.vmap(
                    lambda idx, r: jnp.dot(
                        P[idx].astype(jnp.float32), Qm[r].astype(jnp.float32)
                    )
                )(ids, rs)
            )(p, q, jnp.asarray(i2[rows, cols]), jnp.asarray(rows)))
            np.testing.assert_allclose(true, s2[rows, cols], rtol=1e-5)
        print(f"exact_qp2048[{dt}]: OK (id swaps {int(diff.sum())}, "
              f"all score-verified ties)", flush=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps({"case": case, "ok": True}) + "\n")
    sys.exit(0)

dt, qp_s = case.split("_")
qp = int(qp_s[2:])
queries, passages = gen(N, dt, kq, kp)


@jax.jit
def run(q, psg):
    def body(c, step):
        if dt == "int8":
            qs = q.at[0, 0].set(
                (step.astype(jnp.int32) % 3 - 1).astype(jnp.int8)
            )
        else:
            qs = q + step.astype(q.dtype) * 1e-6
        s, i, nf = _v4_search(qs, psg, jnp.int32(N), K, q_panel=qp)
        return (c[0] + sink(s, i), jnp.maximum(c[1], nf)), None

    acc, _ = jax.lax.scan(
        body, (jnp.float32(0), jnp.int32(0)), jnp.arange(REPS)
    )
    return acc


def timeit(f, *a, reps=3):
    out = jax.device_get(f(*a))
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(f(*a))
    return (time.time() - t0) / reps / REPS * 1e3, int(out[1])


ms, n_flag_max = timeit(run, queries, passages)
with open(RESULTS, "a") as f:
    f.write(json.dumps(
        {"case": case, "ms": ms, "n_flag_max": n_flag_max}) + "\n")
print(f"{case:14s}: {ms:6.2f} ms  n_flag_max={n_flag_max}", flush=True)

"""B=1 query-tower latency: is the 3.96 ms serving encode weight-stream
bound, and do int8 tower weights buy it back?

At B=1 x L=512 the dense matmuls stream ~170 MB of bf16 weights per
forward (0.21 ms at 819 GB/s) against almost no compute — if the
measured 3.96 ms (BENCH_E2E encode split) is HBM-dominated, the int8
tower (quantize_encoder_params: 4x less weight HBM, per-out-channel
scales) should recover most of the dense share; if it is per-op
fixed-cost dominated (36+ small kernels/layer at M=512), neither dtype
moves it.  Also times B=8 and B=64 for the fixed-cost curve.

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_encode_b1.py
"""

import json
import os
import subprocess
import sys
import time

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".encode_b1.jsonl")
CASES = ["bf16_b1", "int8_b1", "bf16_b8", "int8_b8", "bf16_b64", "int8_b64"]

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
    for c in CASES:
        if c in done:
            print(f"{c:9s}: {done[c]['ms']:6.3f} ms/forward")
    sys.exit(0)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import (
    encode,
    init_encoder_params,
    quantize_encoder_params,
    stack_layer_params,
)

assert jax.devices()[0].platform == "tpu"

case = os.environ["CASE"]
dt, b_s = case.split("_")
B, L, REPS = int(b_s[1:]), 512, 20

mcfg = ModelConfig(dtype="bfloat16")
params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), mcfg))
if dt == "int8":
    params = quantize_encoder_params(params)


@jax.jit
def run(params, key):
    def body(c, k):
        ids = jax.random.randint(k, (B, L), 2, 50000, jnp.int32)
        mask = jnp.ones((B, L), jnp.int32)
        e = encode(params, mcfg, ids, mask)
        return c + jnp.sum(e.astype(jnp.float32)), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, REPS))
    return acc


np.asarray(jax.device_get(run(params, jax.random.PRNGKey(1))))
t0 = time.time()
for r in range(3):
    np.asarray(jax.device_get(run(params, jax.random.PRNGKey(2 + r))))
ms = (time.time() - t0) / 3 / REPS * 1e3
with open(RESULTS, "a") as f:
    f.write(json.dumps({"case": case, "ms": ms}) + "\n")
print(f"{case:9s}: {ms:6.3f} ms", flush=True)

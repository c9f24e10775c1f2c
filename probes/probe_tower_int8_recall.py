"""Quality of the int8 QUERY TOWER on real-encoder geometry.

probe_encode_b1.py measured the int8-weight tower ~1.2x faster than
bf16 at batch >= 8 (the batched serving tier), but unlike index-side
int8 (whose error the two-stage rescorer can undo), tower-side
quantization MOVES the query embedding itself — so the question is
whether an int8-tower system retrieves the same neighbors as the bf16
system.  Measured on the same locally-constructible proxy as the IVF
geometry check (cli/ivf_geometry_check: topic-structured tokens through
a contrastively trained real ANCE tower — the rank-~3.4 cone manifold
that exposed the index-side int8 collapse to 0.54):

  GT  corpus bf16 tower, queries bf16 tower (the shipping quality tier)
  B   corpus bf16 tower, queries int8 tower (mixed deployment)
  C   corpus int8 tower, queries int8 tower (consistent int8 system —
      what Retriever(encoder_int8=True) + compute_int8 corpus gives)

reporting top-100/top-10 overlap vs GT and top-1 agreement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python probes/probe_tower_int8_recall.py
"""

import json
import os
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from haconvdr_tpu.cli.ivf_geometry_check import embed_corpus, train_encoder
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import quantize_encoder_params
from haconvdr_tpu.ops.topk import BlockSearcher

assert jax.devices()[0].platform == "tpu"

N, NQ, STEPS, N_TOPICS = 500_000, 2048, 600, 2000
P_LEN, Q_LEN, K = 192, 32, 100

cfg = ModelConfig(dtype="bfloat16", remat="mlp")
t0 = time.time()
params, losses = train_encoder(
    jax.random.PRNGKey(0), cfg, STEPS, 128, Q_LEN, P_LEN, N_TOPICS
)
print(f"trained {STEPS} steps in {time.time() - t0:.0f} s "
      f"(losses {losses})", flush=True)
qparams = quantize_encoder_params(params)

t0 = time.time()
emb_bf = embed_corpus(params, cfg, N, P_LEN, N_TOPICS)
emb_i8 = embed_corpus(qparams, cfg, N, P_LEN, N_TOPICS)  # same seed=3 stream
q_bf = embed_corpus(params, cfg, NQ, P_LEN, N_TOPICS, q_len=Q_LEN)
q_i8 = embed_corpus(qparams, cfg, NQ, P_LEN, N_TOPICS, q_len=Q_LEN)
print(f"embedded 2x{N} + 2x{NQ} in {time.time() - t0:.0f} s", flush=True)
def drift(a, b, n=20000):
    a, b = a[:n], b[:n]
    return float(np.mean(np.sum(a * b, 1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9)))

print(f"query drift: cos(q_bf, q_i8) = {drift(q_bf, q_i8):.6f}; "
      f"corpus drift: cos(emb_bf, emb_i8) = {drift(emb_bf, emb_i8):.6f}",
      flush=True)

searcher = BlockSearcher(top_k=K)
ids = np.arange(N, dtype=np.int64)
_, gt = searcher.search(q_bf, [(emb_bf, ids)])
_, b = searcher.search(q_i8, [(emb_bf, ids)])
_, c = searcher.search(q_i8, [(emb_i8, ids)])


def overlap(x, depth):
    return float(np.mean([
        len(set(x[r, :depth].tolist()) & set(gt[r, :depth].tolist())) / depth
        for r in range(NQ)
    ]))


for name, res in (("B_mixed", b), ("C_consistent", c)):
    row = {
        "case": name,
        "overlap_at_100": round(overlap(res, 100), 4),
        "overlap_at_10": round(overlap(res, 10), 4),
        "top1_agree": round(float(np.mean(res[:, 0] == gt[:, 0])), 4),
    }
    print(json.dumps(row), flush=True)

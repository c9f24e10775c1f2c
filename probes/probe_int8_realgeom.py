"""Flat int8 recall on REAL-ENCODER-geometry embeddings (the saved
geometry-check matrix): does the global per-dim symmetric int8 scheme
survive a rank-3.4 manifold?  (int8 IVF measured 0.538@100 vs bf16
0.998 on this data.)  Also tries mean-CENTERED residual quantization:
score = q . (mu + s*c) = q.mu (per-query constant, rank-neutral) +
q . s*c — centering frees the int8 range for the informative residual."""
import numpy as np
import jax, jax.numpy as jnp

from haconvdr_tpu.ops.topk import BlockSearcher

emb = np.load(".geom_cache/geom_emb.npy")
q = np.load(".geom_cache/geom_emb_queries.npy")[:512]
N, D = emb.shape
print(f"corpus {emb.shape} queries {q.shape}", flush=True)

searcher = BlockSearcher(top_k=100)
ids = np.arange(N, dtype=np.int64)
_, gt = searcher.search(q, [(emb, ids)])
gt_sets = [set(r[r >= 0].tolist()) for r in gt]

def recall(i):
    return float(np.mean([
        len(set(i[r].tolist()) & gt_sets[r]) / max(1, len(gt_sets[r]))
        for r in range(len(q))
    ]))

# 1. global per-dim symmetric int8 (the current store contract)
from haconvdr_tpu.index.quantize import quantize_int8
codes, scale_np = quantize_int8(emb)
_, i8 = searcher.search(q, [(codes, ids, scale_np)])
print(f"flat int8 (global symmetric): recall@100 {recall(i8):.4f}", flush=True)

# 2. mean-centered residual int8: quantize (x - mu); search scores the
#    residual codes only (q.mu is constant per query -> same ranking)
mu = emb.mean(axis=0)
res = emb - mu
codes_c, scale_c = quantize_int8(res)
_, ic = searcher.search(q, [(codes_c, ids, scale_c)])
print(f"flat int8 (mean-centered):    recall@100 {recall(ic):.4f}", flush=True)

# context: how tight are the true score gaps vs the quantization step?
s_exact = (q[:8] @ emb[:200000].T)
srt = np.sort(s_exact, axis=1)[:, ::-1]
gap = srt[:, 99] - srt[:, 120]
print(f"score gap p50 between rank-100 and rank-120 (200k slice): "
      f"{np.median(gap):.5f}; per-dim q-step ~ {float(np.mean(scale_np))/127:.5f} "
      f"(x sqrt(768) ~ {float(np.mean(scale_np))/127*27.7:.5f} score noise)", flush=True)

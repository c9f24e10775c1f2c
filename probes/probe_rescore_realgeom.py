"""Two-stage (int8 scan -> exact host rescore) on the 1M real-geometry
matrix: end recall + per-stage latency."""
import time
import numpy as np
from haconvdr_tpu.index.quantize import quantize_int8
from haconvdr_tpu.index.rescore import StoreRescorer
from haconvdr_tpu.index.store import EmbeddingBlockStore
from haconvdr_tpu.ops.topk import BlockSearcher

emb = np.load(".geom_cache/geom_emb.npy")
q = np.load(".geom_cache/geom_emb_queries.npy")[:2048]
N, D = emb.shape
ids = np.arange(N, dtype=np.int64)

import os
if not os.path.exists(".geom_cache/store/emb_block_0.npy"):
    store = EmbeddingBlockStore(".geom_cache/store")
    per = N // 4
    for b in range(4):
        sl = slice(b * per, (b + 1) * per)
        store.write_block(b, emb[sl], ids[sl])
else:
    store = EmbeddingBlockStore(".geom_cache/store")

searcher = BlockSearcher(top_k=100)
_, gt = searcher.search(q, [(emb, ids)])
gt_sets = [set(r[r >= 0].tolist()) for r in gt]

codes, scale = quantize_int8(emb)
for m in (300, 500):
    s1 = BlockSearcher(top_k=m)
    t0 = time.time()
    cand_s, cand_i = s1.search(q, [(codes, ids, scale)])
    t1 = time.time()
    rescorer = StoreRescorer(store)
    t2 = time.time()
    s, i = rescorer.rescore(q, cand_i, 100)
    t3 = time.time()
    rec = np.mean([
        len(set(i[r].tolist()) & gt_sets[r]) / 100 for r in range(len(q))
    ])
    print(f"m={m}: recall@100 {rec:.4f}; stage1 {t1-t0:.2f}s "
          f"({len(q)/(t1-t0):.0f} QPS incl relay), rescore "
          f"{(t3-t2)/len(q)*1000:.3f} ms/query host", flush=True)

"""Containment curves on the full 1M real-geometry matrix: global vs
mean-centered int8 codes, m=300/500/1000, via the XLA search path
(the pallas kernels are k<=~128 designs; k=500 measured 45 s/2048q)."""
import time
import numpy as np
from haconvdr_tpu.index.quantize import quantize_int8
from haconvdr_tpu.ops.topk import BlockSearcher

emb = np.load(".geom_cache/geom_emb.npy")
q = np.load(".geom_cache/geom_emb_queries.npy")[:2048]
N, D = emb.shape
ids = np.arange(N, dtype=np.int64)

searcher = BlockSearcher(top_k=100)
_, gt = searcher.search(q, [(emb, ids)])
gt_sets = [set(r[r >= 0].tolist()) for r in gt]

mu = emb.mean(axis=0)
for name, x in (("global", emb), ("centered", emb - mu)):
    codes, scale = quantize_int8(x)
    for m in (300, 500, 1000):
        s1 = BlockSearcher(top_k=m, use_pallas=False)
        t0 = time.time()
        _, ci = s1.search(q, [(codes, ids, scale)])
        dt = time.time() - t0
        cont = np.mean([
            len(set(ci[r].tolist()) & gt_sets[r]) / 100 for r in range(len(q))
        ])
        print(f"{name:8s} m={m:5d}: containment@100 {cont:.4f} "
              f"stage1 {dt:.2f}s ({len(q)/dt:.0f} QPS incl relay)", flush=True)

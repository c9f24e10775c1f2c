"""Single-query two-stage latency on the 1M real-geometry store:
int8 residual IVF first stage (oversampled) + exact host rescore."""
import time
import numpy as np
import jax.numpy as jnp
from haconvdr_tpu.index.ivf import build_ivf_device, quantize_ivf, ivf_search
from haconvdr_tpu.index.rescore import StoreRescorer
from haconvdr_tpu.index.store import EmbeddingBlockStore
from haconvdr_tpu.ops.topk import BlockSearcher

emb = np.load(".geom_cache/geom_emb.npy")
q = np.load(".geom_cache/geom_emb_queries.npy")[:256]
N, D = emb.shape
ids = np.arange(N, dtype=np.int64)
store = EmbeddingBlockStore(".geom_cache/store")

searcher = BlockSearcher(top_k=100)
_, gt = searcher.search(q, [(emb, ids)])
gt_sets = [set(r[r >= 0].tolist()) for r in gt]

index = quantize_ivf(build_ivf_device(
    jnp.asarray(emb, jnp.bfloat16), nlist=1024, nprobe=64, slack=1.3
))
rescorer = StoreRescorer(store)

for m, nprobe in ((500, 16), (500, 64)):
    # batch recall of the full two-stage pipeline
    cs, ci = ivf_search(index, q, k=m, nprobe=nprobe)
    s, i = rescorer.rescore(q, ci, 100)
    rec = np.mean([
        len(set(i[r].tolist()) & gt_sets[r]) / 100 for r in range(len(q))
    ])
    # single-query latency: stage1 (eager relay dispatch) + host rescore
    one = q[:1]
    cs1, ci1 = ivf_search(index, one, k=m, nprobe=nprobe)  # compile
    t0 = time.time()
    for _ in range(50):
        cs1, ci1 = ivf_search(index, one, k=m, nprobe=nprobe)
    t1 = (time.time() - t0) / 50
    t0 = time.time()
    for _ in range(50):
        rescorer.rescore(one, ci1, 100)
    t2 = (time.time() - t0) / 50
    print(f"m={m} nprobe={nprobe}: two-stage recall@100 {rec:.4f}; "
          f"stage1 {t1*1000:.2f} ms (incl relay), rescore {t2*1000:.2f} ms host",
          flush=True)

"""Decompose int8-residual vs bf16 score error on the real-geometry
matrix (host-side, 200k rows x 64 queries): which error source eats the
recall — residual quantization, the bf16 query folding, or the means
correction?"""
import numpy as np
import ml_dtypes

emb = np.load(".geom_cache/geom_emb.npy")[:200000]
q = np.load(".geom_cache/geom_emb_queries.npy")[:64]
N, D = emb.shape

exact = q @ emb.T  # [Q, N] f32
gt = np.argsort(-exact, axis=1)[:, :100]

def recall(s):
    top = np.argsort(-s, axis=1)[:, :100]
    return np.mean([len(set(top[r]) & set(gt[r])) / 100 for r in range(len(q))])

def err(s):
    d = s - exact
    return float(np.std(d)), float(np.abs(d).max())

bf16 = lambda a: a.astype(ml_dtypes.bfloat16).astype(np.float32)

# A. bf16 index + bf16 query (the bf16 serving path)
sA = bf16(q) @ bf16(emb).T
print(f"A bf16 x bf16        : recall {recall(sA):.4f} err std/max {err(sA)}", flush=True)

# B. int8 residual, f32 query folding (no bf16 rounding anywhere)
mu = emb.mean(axis=0)
res = emb - mu  # single global "cluster" proxy for the scheme's error
amax = np.abs(res).max(axis=0)
scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
codes = np.clip(np.rint(res / scale), -127, 127).astype(np.float32)
corr = q @ mu  # [Q]
sB = (q * scale) @ codes.T + corr[:, None]
print(f"B int8res f32 fold   : recall {recall(sB):.4f} err std/max {err(sB)}", flush=True)

# C. int8 residual + bf16-rounded folded query (the kernel's contract)
sC = bf16(q * scale) @ codes.T + corr[:, None]
print(f"C int8res bf16 fold  : recall {recall(sC):.4f} err std/max {err(sC)}", flush=True)

# D. per-dim noise scale sanity
print(f"step mean {scale.mean():.5f}; residual per-dim std mean {res.std(0).mean():.5f}; "
      f"amax/std ratio {float(np.mean(amax / np.maximum(res.std(0), 1e-9))):.1f}", flush=True)

# E. two-stage feasibility: is the true top-100 inside int8's top-m?
order = np.argsort(-sC, axis=1)
for m in (100, 150, 200, 300, 500, 1000):
    top_m = order[:, :m]
    r = np.mean([len(set(top_m[r]) & set(gt[r])) / 100 for r in range(len(q))])
    print(f"E candidate recall@100 within int8 top-{m}: {r:.4f}", flush=True)

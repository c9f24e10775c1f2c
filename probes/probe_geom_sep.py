"""Diagnostic: topic linear separability of RANDOM-INIT 12L/768 encoder
features, CLS pooling vs masked-mean pooling.  Least-squares one-hot
probe on 4096 passages / 64 topics, train/held-out top-1 accuracy."""
import numpy as np
import jax, jax.numpy as jnp
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import encode, init_encoder_params, stack_layer_params
from haconvdr_tpu.cli.ivf_geometry_check import make_topic_batch

cfg = ModelConfig(dtype="bfloat16")
params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), cfg))
N, L, T, B = 4096, 192, 64, 512

import functools

@functools.partial(jax.jit, static_argnums=(2,))
def embed(params, key, use_mean):
    ids, topics = make_topic_batch(key, B, L, T, cfg.vocab_size)
    e = encode(params, cfg, ids, jnp.ones((B, L), jnp.int32), use_mean=use_mean)
    return e, topics

for use_mean in (False, True):
    es, ts = [], []
    for i in range(N // B):
        e, t = embed(params, jax.random.PRNGKey(i), use_mean)
        es.append(np.asarray(e, np.float32)); ts.append(np.asarray(t))
    X = np.concatenate(es); y = np.concatenate(ts)
    X = (X - X.mean(0)) / (X.std(0) + 1e-6)
    Xtr, ytr, Xte, yte = X[:3072], y[:3072], X[3072:], y[3072:]
    Y = np.eye(T, dtype=np.float32)[ytr]
    W, *_ = np.linalg.lstsq(Xtr, Y, rcond=1e-3)
    acc_tr = float((np.argmax(Xtr @ W, 1) == ytr).mean())
    acc_te = float((np.argmax(Xte @ W, 1) == yte).mean())
    spread = float(np.linalg.norm(X.std(0)))
    print(f"use_mean={use_mean}: train acc {acc_tr:.3f} heldout acc {acc_te:.3f} "
          f"(chance {1/T:.3f}) feature spread {spread:.3f}", flush=True)

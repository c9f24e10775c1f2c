"""CLI: IVF recall validation on REAL ENCODER geometry (no external data).

The standing gap (VERDICT r2, NOTES.md): the IVF serving index's recall
was only ever measured on synthetic Gaussian mixtures, whose geometry is
far friendlier to k-means than actual transformer-encoder output
manifolds (anisotropic, low effective rank, cone-shaped — the known hard
case for inner-product clustering).  Real dataset dumps and the
`ad-hoc-ance-msmarco` checkpoint are unavailable in this environment, so
this harness produces the closest locally-constructible proxy:

  1. generate TOPIC-STRUCTURED synthetic token streams on device
     (each passage blends token bands of 1-2 of `n_topics` topics;
     queries are short single-topic strings) — content structure, not
     embedding-space structure;
  2. contrastively train the real ANCE-architecture encoder
     (models/encoder.py, the same tower the framework trains) for a few
     hundred in-batch CE steps, exactly long enough that embeddings
     carry the topic manifold the way a retrieval encoder's do;
  3. embed a corpus (default 1M passages) with the trained tower;
  4. run the standard IVF tuning sweep (cli/ivf_sweep.sweep) on those
     embeddings: recall@k vs the exact fused scan, per-query latency,
     memory overhead, scanned fraction.

Outputs one JSON line per (nlist, slack, nprobe) configuration, plus a
`geometry` preamble row (effective rank, mean cosine to centroid) that
lets the numbers be compared against real-checkpoint embeddings the
moment those exist.

    python -m haconvdr_tpu.cli.ivf_geometry_check \
        n=1000000 steps=300 n_topics=2000 nlist=1024,4096 \
        nprobe=8,16,32,64,128 out=geometry_sweep.jsonl

steps=0 skips training (untrained-encoder geometry: a harder, more
degenerate cone).  Reference scope: this validates the beyond-reference
IVF serving path only; the reference itself is exact-scan-only
(/root/reference/src/test_HAConvDR_topiocqa.py:74-162).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Dict, List

import numpy as np

logger = logging.getLogger(__name__)


def _parse_args(argv: List[str]) -> Dict[str, str]:
    out = {}
    for a in argv:
        k, eq, v = a.partition("=")
        if not eq:
            raise SystemExit(f"expected key=value, got {a!r}")
        out[k] = v
    return out


def make_topic_batch(key, batch, length, n_topics, vocab, topics=None):
    """Token ids whose content blends 1-2 topic bands (device-side).

    Each topic owns a contiguous band of ~``vocab // 64`` token ids; a
    passage draws each token from its primary topic's band with p=0.7,
    a secondary topic's with p=0.2, and the global vocab with p=0.1.
    """
    import jax
    import jax.numpy as jnp

    kt, ks, kp, kg, kc = jax.random.split(key, 5)
    band = max(64, vocab // 64)
    if topics is None:
        topics = jax.random.randint(kt, (batch,), 0, n_topics)
    second = jax.random.randint(ks, (batch,), 0, n_topics)
    centers = (topics.astype(jnp.float32) / n_topics * (vocab - band - 4)).astype(jnp.int32) + 4
    centers2 = (second.astype(jnp.float32) / n_topics * (vocab - band - 4)).astype(jnp.int32) + 4
    off = jax.random.randint(kp, (batch, length), 0, band)
    gtok = jax.random.randint(kg, (batch, length), 4, vocab)
    mix = jax.random.uniform(kc, (batch, length))
    ids = jnp.where(
        mix < 0.7,
        centers[:, None] + off,
        jnp.where(mix < 0.9, centers2[:, None] + off, gtok),
    )
    return jnp.clip(ids, 4, vocab - 1), topics


def train_encoder(key, cfg, steps, batch, q_len, p_len, n_topics, lr=1e-4):
    """A few hundred in-batch CE steps: query tower == passage tower
    (the ANCE convention, src/models.py:48-49), bf16 compute, no dropout
    (geometry only — this is not a quality training run)."""
    import jax
    import jax.numpy as jnp
    import optax

    from haconvdr_tpu.models.encoder import (
        encode,
        init_encoder_params,
        stack_layer_params,
    )

    params = stack_layer_params(init_encoder_params(key, cfg))
    opt = optax.adamw(lr, weight_decay=0.01)
    opt_state = opt.init(params)

    def loss_fn(params, qids, qmask, pids, pmask):
        q = encode(params, cfg, qids, qmask)
        p = encode(params, cfg, pids, pmask)
        scores = q @ p.T  # in-batch CE: diagonal is the positive
        labels = jnp.arange(q.shape[0])
        return optax.softmax_cross_entropy_with_integer_labels(
            scores, labels
        ).mean()

    @jax.jit
    def step(params, opt_state, key):
        kq, kp = jax.random.split(key)
        pids, topics = make_topic_batch(kp, batch, p_len, n_topics, cfg.vocab_size)
        qids, _ = make_topic_batch(
            kq, batch, q_len, n_topics, cfg.vocab_size, topics=topics
        )
        ones_q = jnp.ones((batch, q_len), jnp.int32)
        ones_p = jnp.ones((batch, p_len), jnp.int32)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, qids, ones_q, pids, ones_p
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for s in range(steps):
        params, opt_state, loss = step(
            params, opt_state, jax.random.PRNGKey(1000 + s)
        )
        if s % 50 == 0 or s == steps - 1:
            losses.append(float(loss))
            logger.info("train step %d loss %.4f", s, float(loss))
    return params, losses


def embed_corpus(params, cfg, n, length, n_topics, batch=512, q_len=0):
    """Encode ``n`` topic-structured passages (or queries when q_len>0)
    with the trained tower; returns float32 [n, 768] on host."""
    import jax
    import jax.numpy as jnp

    from haconvdr_tpu.models.encoder import encode

    L = q_len or length
    n_batches = -(-n // batch)

    @jax.jit
    def run(params, key):
        def body(c, k):
            ids, _ = make_topic_batch(k, batch, L, n_topics, cfg.vocab_size)
            e = encode(params, cfg, ids, jnp.ones((batch, L), jnp.int32))
            return c, e.astype(jnp.bfloat16)

        _, embs = jax.lax.scan(
            body, jnp.int32(0), jax.random.split(key, n_batches)
        )
        return embs.reshape(n_batches * batch, -1)

    seed = 7 if q_len else 3
    embs = run(params, jax.random.PRNGKey(seed))
    return np.asarray(embs[:n]).astype(np.float32)


def geometry_stats(emb: np.ndarray, sample: int = 100_000) -> dict:
    """Effective rank + cone concentration — lets synthetic geometry be
    compared against real-checkpoint embeddings later."""
    x = emb[:: max(1, len(emb) // sample)]
    mu = x.mean(axis=0)
    xc = x - mu
    s = np.linalg.svd(xc, compute_uv=False)
    p = (s**2) / (s**2).sum()
    eff_rank = float(np.exp(-(p * np.log(np.maximum(p, 1e-12))).sum()))
    norms = np.linalg.norm(x, axis=1)
    cos_mu = (x @ mu) / (np.maximum(norms, 1e-9) * max(np.linalg.norm(mu), 1e-9))
    return {
        "metric": "geometry",
        "n_sampled": int(len(x)),
        "effective_rank": round(eff_rank, 1),
        "mean_cos_to_centroid": round(float(cos_mu.mean()), 4),
        "norm_cv": round(float(norms.std() / norms.mean()), 4),
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    args = _parse_args(argv if argv is not None else sys.argv[1:])
    n = int(args.get("n", "1000000"))
    steps = int(args.get("steps", "300"))
    n_topics = int(args.get("n_topics", "2000"))
    p_len = int(args.get("p_len", "192"))
    q_len = int(args.get("q_len", "32"))
    n_queries = int(args.get("n_queries", "2048"))
    batch = int(args.get("batch", "128"))
    nlists = [int(x) for x in args.get("nlist", "1024,4096").split(",")]
    nprobes = [int(x) for x in args.get("nprobe", "8,16,32,64,128").split(",")]
    slacks = [float(x) for x in args.get("slack", "1.3").split(",")]
    k = int(args.get("k", "100"))
    out_path = args.get("out", "")

    import jax

    from haconvdr_tpu.cli.ivf_sweep import sweep
    from haconvdr_tpu.config import ModelConfig

    cfg = ModelConfig(
        dtype=args.get("dtype", "bfloat16"),
        num_hidden_layers=int(args.get("layers", "12")),
        hidden_size=int(args.get("hidden", "768")),
        num_attention_heads=int(args.get("heads", "12")),
        intermediate_size=int(args.get("intermediate", "3072")),
        vocab_size=int(args.get("vocab", "50265")),
    )
    t0 = time.time()
    params, losses = train_encoder(
        jax.random.PRNGKey(0), cfg, steps, batch, q_len, p_len, n_topics
    )
    logger.info("trained %d steps in %.0f s (losses %s)", steps, time.time() - t0, losses)

    t0 = time.time()
    emb = embed_corpus(params, cfg, n, p_len, n_topics)
    logger.info("embedded %d passages in %.0f s", n, time.time() - t0)
    queries = embed_corpus(params, cfg, n_queries, p_len, n_topics, q_len=q_len)

    rows = [geometry_stats(emb)]
    rows[0]["train_steps"] = steps
    rows += sweep(emb, queries, nlists, nprobes, slacks, k=k)
    out = open(out_path, "w") if out_path else sys.stdout
    for r in rows:
        print(json.dumps(r), file=out, flush=True)
    if out_path:
        out.close()
    return rows


if __name__ == "__main__":
    main()

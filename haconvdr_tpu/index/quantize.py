"""Symmetric int8 scalar quantization for embedding indexes.

A beyond-the-reference memory lever: the reference serves flat f32 blocks
(7.3 GB per 2.5M x 768 block, src/test_HAConvDR_topiocqa.py:82-95) and its
54M-passage QReCC corpus is 167 GB f32 / 83 GB bf16 — this module stores
the index as int8 + per-dimension float32 scales (42 GB at 54M), so the
whole corpus fits HBM-resident on a v5e-4 instead of a v5e-8.

Scheme: per-dimension symmetric (faiss ``ScalarQuantizer QT_8bit``-style,
but zero-offset so the scale FOLDS INTO THE QUERY):

    x_int8[d] = round(x[d] / scale[d]),   scale[d] = max|x[:, d]| / 127
    score(q, x) = sum_d q[d] * (x_int8[d] * scale[d])
                = sum_d (q[d] * scale[d]) * x_int8[d]

so search over an int8 index scores the dequantized embeddings directly:
fold ``q' = q * scale`` once per (query batch, scale group) and run the
ordinary kernels with int8 passage tiles upcast to bfloat16 on the fly.
The int8 side of the product is exact (|v| <= 127 is bf16-representable);
the folded query is rounded to bfloat16 at the matmul — the same
query-side rounding the bfloat16 index path applies — so scores equal the
exact inner product of the dequantized rows with the bf16-rounded folded
query (query-side rounding ~2^-9 relative).  The matmul is not the
bottleneck — selection is; the win is HBM *capacity* and H2D/stream
*bandwidth*, both halved vs bf16.

Scales may be grouped per shard / per block (each group quantized with its
own [D] scale): folding happens inside the shard_map / per-block dispatch,
which keeps cross-group score comparisons consistent because every score
is the exact inner product against that group's dequantized rows.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def quantize_int8(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, D] float -> ([N, D] int8, [D] float32 per-dim scales).

    Symmetric, zero-offset; all-zero dimensions get scale 1 (their rows
    quantize to 0 and contribute 0 to every score, exactly like the
    float path).
    """
    emb = np.asarray(emb, np.float32)
    amax = np.abs(emb).max(axis=0)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(emb / scale), -127, 127).astype(np.int8)
    return q, scale


def dequantize_int8(q: np.ndarray, scale: np.ndarray) -> np.ndarray:
    """Exact float32 reconstruction the int8 search path scores against."""
    return q.astype(np.float32) * np.asarray(scale, np.float32)


# device-side (jax) pieces of the same scheme, shared by the IVF
# quantizer so the formula lives in exactly one place
def scale_from_amax(amax):
    import jax.numpy as jnp

    return jnp.where(amax > 0, amax / 127.0, 1.0)


def encode_int8(x, scale):
    import jax.numpy as jnp

    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)

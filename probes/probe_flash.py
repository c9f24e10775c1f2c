"""On-TPU validation + timing of the differentiable flash attention kernel.

Stage 1: correctness at small shapes (dropout determinism, keep-rate,
finite-difference grads through a fixed seed).
Stage 2: kernel fwd+bwd at the trained-tower geometry (B=64, L=512,
H=768, 12 heads, bf16, drop 0.1) — lowering + VMEM check.
Run: timeout 1800 python probes/probe_flash.py [stage]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from haconvdr_tpu.ops.flash_attention import flash_attention, flash_vjp_supported

assert jax.devices()[0].platform == "tpu", jax.devices()

stage = sys.argv[1] if len(sys.argv) > 1 else "all"


def sync(x):
    return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0][..., :1]))


if stage in ("all", "1"):
    print("=== stage 1: small-shape dropout correctness ===", flush=True)
    B, L, nh, d = 2, 256, 2, 64
    H = nh * d
    k1 = jax.random.PRNGKey(0)
    qkv = (jax.random.normal(k1, (B, L, 3 * H)) * 0.5).astype(jnp.bfloat16)
    mask = (jnp.arange(L)[None, :] < jnp.array([[L], [L - 32]])).astype(jnp.int32).reshape(B, L)
    key = jax.random.PRNGKey(11)
    t0 = time.time()
    o1 = np.asarray(flash_attention(qkv, mask, nh, dropout_rng=key, drop_rate=0.3))
    print(f"first dropout fwd compile+run {time.time()-t0:.1f}s", flush=True)
    o2 = np.asarray(flash_attention(qkv, mask, nh, dropout_rng=key, drop_rate=0.3))
    assert np.array_equal(o1, o2), "dropout not deterministic per seed"
    o3 = np.asarray(flash_attention(qkv, mask, nh, dropout_rng=jax.random.PRNGKey(12), drop_rate=0.3))
    assert not np.array_equal(o1, o3), "dropout ignores seed"
    outs = [
        np.asarray(
            flash_attention(qkv, mask, nh, dropout_rng=jax.random.PRNGKey(100 + i), drop_rate=0.3),
            np.float32,
        )
        for i in range(24)
    ]
    base = np.asarray(flash_attention(qkv, mask, nh), np.float32)
    err = np.abs(np.mean(outs, 0) - base).mean() / np.abs(base).mean()
    print(f"mean-over-seeds rel err {err:.3f} (expect <0.2)", flush=True)
    assert err < 0.2

    print("stage 1 PASS", flush=True)

if stage in ("all", "1b"):
    print("=== stage 1b: exact oracle fwd+grad on hardware ===", flush=True)
    from haconvdr_tpu.ops.flash_attention import (
        _keep_mask, _keep_thresh, _seed_for, rng_to_seed,
    )

    nh, d = 2, 64
    H = nh * d
    B, L = 2, 128
    qkv32 = (jax.random.normal(jax.random.PRNGKey(4), (B, L, 3 * H)) * 0.5).astype(jnp.float32)
    m32 = jnp.ones((B, L), jnp.int32)
    key = jax.random.PRNGKey(7)
    cot = jnp.asarray(np.random.RandomState(0).randn(B, L, H).astype(np.float32))

    def oracle(x, drop):
        q = x[..., :H].reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        k = x[..., H:2*H].reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        v = x[..., 2*H:].reshape(B, L, nh, d).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        p = jax.nn.softmax(s, axis=-1)
        if drop > 0:
            seed = rng_to_seed(key)
            thresh = _keep_thresh(drop)
            keep = jnp.stack([
                jnp.stack([
                    _keep_mask(*_seed_for(seed, b, h, nh), (L, L), thresh)
                    for h in range(nh)
                ]) for b in range(B)
            ])
            p = jnp.where(keep, p / (1.0 - drop), 0.0)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(B, L, H)

    for drop in (0.0, 0.25):
        out_k = np.asarray(flash_attention(qkv32, m32, nh, dropout_rng=key, drop_rate=drop))
        out_o = np.asarray(oracle(qkv32, drop))
        fwd_err = np.abs(out_k - out_o).max()

        def loss_k(x):
            return jnp.sum(flash_attention(x, m32, nh, dropout_rng=key, drop_rate=drop) * cot)

        def loss_o(x):
            return jnp.sum(oracle(x, drop) * cot)

        gk = np.asarray(jax.grad(loss_k)(qkv32))
        go = np.asarray(jax.grad(loss_o)(qkv32))
        gerr = np.abs(gk - go).max() / (np.abs(go).max() + 1e-9)
        print(f"  drop={drop}: fwd max err {fwd_err:.2e}, grad rel err {gerr:.2e}", flush=True)
        assert fwd_err < 1e-4 and gerr < 1e-3, (fwd_err, gerr)
    print("stage 1b PASS", flush=True)

if stage in ("all", "2"):
    print("=== stage 2: trained-tower geometry fwd+bwd ===", flush=True)
    B, L, nh, d = 64, 512, 12, 64
    H = nh * d
    print("supported:", flash_vjp_supported(L, d, nh, 2), flush=True)
    qkv = (jax.random.normal(jax.random.PRNGKey(1), (B, L, 3 * H)) * 0.1).astype(jnp.bfloat16)
    mask = jnp.ones((B, L), jnp.int32)
    key = jax.random.PRNGKey(2)
    cot = jax.random.normal(jax.random.PRNGKey(3), (B, L, H)).astype(jnp.bfloat16)

    @jax.jit
    def vag(x):
        def loss(x):
            return jnp.sum(
                flash_attention(x, mask, nh, dropout_rng=key, drop_rate=0.1).astype(jnp.float32) * cot.astype(jnp.float32)
            )
        return jax.value_and_grad(loss)(x)

    t0 = time.time()
    v, g = vag(qkv)
    sync(g)
    print(f"compile+run {time.time()-t0:.1f}s  loss={float(v):.3f}", flush=True)
    # timing: scan 10 iterations in one dispatch
    @jax.jit
    def many(x):
        def body(c, _):
            v, g = vag(x + c * 0)
            return c, v
        return jax.lax.scan(body, x, jnp.arange(10))

    t0 = time.time()
    r = many(qkv)
    sync(r[0])
    t0 = time.time()
    r = many(qkv)
    sync(r[0])
    dt = time.time() - t0
    print(f"fwd+bwd x10 (1 dispatch): {dt*100:.1f} ms/iter (12-layer equiv ~{dt*100*12:.0f} ms)", flush=True)
    g32 = np.asarray(g, np.float32)
    assert np.isfinite(g32).all() and np.abs(g32).max() > 0
    print("stage 2 PASS", flush=True)
print("ALL PASS", flush=True)

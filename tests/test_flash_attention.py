"""Differentiable flash-attention kernel (ops/flash_attention.py).

All tests run the Pallas interpret path on CPU.  The dropout mask is a
stateless hash (_keep_mask, pure jnp), so an XLA oracle can regenerate
the kernel's exact mask outside the kernel: forward AND backward are
checked exactly, dropout on or off.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from haconvdr_tpu.ops.flash_attention import (
    _head_chunks,
    _keep_mask,
    _keep_thresh,
    _seed_for,
    flash_attention,
    flash_attention_qkv_vjp,
    rng_to_seed,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def xla_attention(qkv, mask, num_heads, dropout_rng=None, drop_rate=0.0):
    """Oracle: the encoder's XLA attention math (models/encoder.py) on the
    fused [B, L, 3H] projection, f32 accumulation; when dropout is on, the
    kernel's exact keep mask is regenerated via the shared hash."""
    B, L, H3 = qkv.shape
    H = H3 // 3
    d = H // num_heads

    def split(t):
        return t.reshape(B, L, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(qkv[..., :H]), split(qkv[..., H : 2 * H]), split(qkv[..., 2 * H :])
    bias = ((1.0 - mask.astype(jnp.float32)) * -1e9)[:, None, None, :]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(d) + bias
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rng is not None and drop_rate > 0.0:
        seed = rng_to_seed(dropout_rng)
        thresh = _keep_thresh(drop_rate)
        keep = jnp.stack(
            [
                jnp.stack(
                    [
                        _keep_mask(*_seed_for(seed, b, h, num_heads), (L, L), thresh)
                        for h in range(num_heads)
                    ]
                )
                for b in range(B)
            ]
        )
        p = jnp.where(keep, p / (1.0 - drop_rate), 0.0)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return ctx.transpose(0, 2, 1, 3).reshape(B, L, H).astype(qkv.dtype)


def make_inputs(B=2, L=128, num_heads=2, d=64, dtype=jnp.float32, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    H = num_heads * d
    qkv = (jax.random.normal(k1, (B, L, 3 * H)) * 0.5).astype(dtype)
    # ragged padding: row i keeps L - 16*i real tokens
    lens = L - 16 * jnp.arange(B)
    mask = (jnp.arange(L)[None, :] < lens[:, None]).astype(jnp.int32)
    del k2
    return qkv, mask


def flash(qkv, mask, num_heads, interpret=True):
    return flash_attention(
        qkv, mask, num_heads, dropout_rng=None, drop_rate=0.0, interpret=interpret
    )


def test_fwd_matches_xla_oracle():
    qkv, mask = make_inputs()
    out = flash(qkv, mask, 2)
    ref = xla_attention(qkv, mask, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fwd_twelve_heads():
    # the trained-tower head count; L=128 keeps interpret mode fast
    qkv, mask = make_inputs(B=2, L=128, num_heads=12, d=64, seed=3)
    out = flash(qkv, mask, 12)
    ref = xla_attention(qkv, mask, 12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grad_matches_xla_oracle():
    qkv, mask = make_inputs(seed=1)
    cot = jax.random.normal(jax.random.PRNGKey(9), qkv.shape[:2] + (qkv.shape[2] // 3,))

    def loss_flash(x):
        return jnp.sum(flash(x, mask, 2) * cot)

    def loss_ref(x):
        return jnp.sum(xla_attention(x, mask, 2) * cot)

    v1, g1 = jax.value_and_grad(loss_flash)(qkv)
    v2, g2 = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_grad_under_remat_and_scan():
    # the kernel sits inside jax.checkpoint inside lax.scan in the encoder;
    # make sure the custom VJP composes with both transforms
    qkv, mask = make_inputs(B=1, L=128, seed=2)

    @jax.checkpoint
    def layer(x, _):
        return flash(x, mask, 2) .repeat(3, axis=-1) * 0.5, None

    def loss(x):
        y, _ = jax.lax.scan(layer, x, jnp.arange(2))
        return jnp.sum(y)

    g = jax.grad(loss)(qkv)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_head_chunks():
    # 12 heads x d=64, H=768: 4 chunks of width 192 fail the lane rule;
    # 3 chunks -> width 256 pass
    assert _head_chunks(12, 64, 768) == 3
    assert _head_chunks(2, 64, 128) == 1


def test_rng_to_seed_shapes():
    key = jax.random.PRNGKey(7)
    s = rng_to_seed(key)
    assert s.shape == (2,) and s.dtype == jnp.int32
    s2 = rng_to_seed(jax.random.key_data(key))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))


def test_encoder_routes_trainable_to_flash(monkeypatch):
    """With support forced on (interpret), the trained-tower encoder path
    must route through the flash kernel and match the XLA path exactly at
    drop_rate=0."""
    from haconvdr_tpu.config import ModelConfig
    from haconvdr_tpu.models import encoder as enc
    import haconvdr_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "flash_vjp_supported", lambda *a, **k: True)
    monkeypatch.setattr(
        fa, "flash_attention", functools.partial(fa.flash_attention, interpret=True)
    )
    calls = {"n": 0}
    orig = fa.flash_attention_qkv_vjp

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(fa, "flash_attention_qkv_vjp", counting)

    cfg = ModelConfig(
        model_type="ANCE", vocab_size=64, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256, max_position_embeddings=160,
        embedding_dim=32, dtype="float32", use_flash_attention=True, remat=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    params = enc.init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 2, 64)
    mask = jnp.ones((2, 128), jnp.int32)

    out_flash = enc.encode(params, cfg, ids, mask, trainable=True)
    assert calls["n"] > 0, "trainable path did not route through flash kernel"

    import dataclasses
    cfg_xla = dataclasses.replace(cfg, use_flash_attention=False)
    out_xla = enc.encode(params, cfg_xla, ids, mask, trainable=True)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=1e-5
    )


def test_remat_mlp_matches_full_remat():
    """remat="mlp" (checkpoint only the MLP block) must be numerically
    identical to full-layer remat and to no remat — it changes memory/
    recompute scheduling only."""
    import dataclasses

    from haconvdr_tpu.config import ModelConfig
    from haconvdr_tpu.models import encoder as enc

    cfg = ModelConfig(
        model_type="ANCE", vocab_size=64, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256, max_position_embeddings=160,
        embedding_dim=32, dtype="float32", use_flash_attention=False, remat=True,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
    )
    params = enc.init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 2, 64)
    mask = jnp.ones((2, 64), jnp.int32)
    rng = jax.random.PRNGKey(3)

    def loss(p, c):
        return jnp.sum(
            enc.encode(p, c, ids, mask, dropout_rng=rng, trainable=True) ** 2
        )

    results = {}
    for remat in (True, "mlp", False):
        c = dataclasses.replace(cfg, remat=remat)
        results[remat] = jax.value_and_grad(loss)(params, c)
    for remat in ("mlp", False):
        np.testing.assert_allclose(
            float(results[remat][0]), float(results[True][0]), rtol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            results[remat][1], results[True][1],
        )


# ---------------------------------------------------------------------------
# Dropout path (stateless hash mask — CPU-exact against the oracle)
# ---------------------------------------------------------------------------

def test_keep_mask_rate_and_determinism():
    seed = jnp.array([123, -456], jnp.int32)
    thresh = _keep_thresh(0.3)
    m1 = np.asarray(_keep_mask(*_seed_for(seed, 0, 1, 12), (256, 256), thresh))
    m2 = np.asarray(_keep_mask(*_seed_for(seed, 0, 1, 12), (256, 256), thresh))
    np.testing.assert_array_equal(m1, m2)
    m3 = np.asarray(_keep_mask(*_seed_for(seed, 0, 2, 12), (256, 256), thresh))
    assert not np.array_equal(m1, m3), "head coordinate ignored"
    rate = m1.mean()
    assert abs(rate - 0.7) < 0.01, rate  # 65536 draws, 3-sigma ~ 0.005


def test_dropout_fwd_matches_oracle_exactly():
    qkv, mask = make_inputs(B=2, L=128, num_heads=2, seed=4)
    key = jax.random.PRNGKey(11)
    out = flash_attention(
        qkv, mask, 2, dropout_rng=key, drop_rate=0.3, interpret=True
    )
    ref = xla_attention(qkv, mask, 2, dropout_rng=key, drop_rate=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # different key -> different realization
    out2 = flash_attention(
        qkv, mask, 2, dropout_rng=jax.random.PRNGKey(12), drop_rate=0.3,
        interpret=True,
    )
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_dropout_grad_matches_oracle():
    """The oracle regenerates the kernel's exact mask, so the backward
    (which rehashes the mask in a differently-structured kernel) must
    agree — this is the fwd/bwd mask-consistency test."""
    qkv, mask = make_inputs(B=2, L=128, num_heads=2, seed=5)
    key = jax.random.PRNGKey(7)
    cot = jax.random.normal(jax.random.PRNGKey(9), qkv.shape[:2] + (qkv.shape[2] // 3,))

    def loss_flash(x):
        return jnp.sum(
            flash_attention(
                x, mask, 2, dropout_rng=key, drop_rate=0.25, interpret=True
            ) * cot
        )

    def loss_ref(x):
        return jnp.sum(
            xla_attention(x, mask, 2, dropout_rng=key, drop_rate=0.25) * cot
        )

    v1, g1 = jax.value_and_grad(loss_flash)(qkv)
    v2, g2 = jax.value_and_grad(loss_ref)(qkv)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)

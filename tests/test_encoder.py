"""Encoder parity tests: our functional JAX ANCE encoder vs the HF torch
semantics the reference model is built on (src/models.py:20-64)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import (
    encode,
    init_encoder_params,
    roberta_position_ids,
)
from haconvdr_tpu.models.hf_import import (
    params_from_state_dict,
    state_dict_from_params,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_torch_ance(seed=0):
    """Build a tiny torch model with the exact reference ANCE structure:
    RobertaModel backbone + embeddingHead Linear + LayerNorm on CLS
    (src/models.py:25-45)."""
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(seed)
    hf_cfg = RobertaConfig(
        vocab_size=128,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=66,
        type_vocab_size=1,
        pad_token_id=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-5,  # ModelConfig default; real ckpts carry their own
    )
    backbone = RobertaModel(hf_cfg, add_pooling_layer=False).eval()
    head = torch.nn.Linear(32, 16)
    norm = torch.nn.LayerNorm(16)
    cfg = ModelConfig.tiny()
    sd = {f"roberta.{k}": v.detach().numpy() for k, v in backbone.state_dict().items()}
    sd["embeddingHead.weight"] = head.weight.detach().numpy()
    sd["embeddingHead.bias"] = head.bias.detach().numpy()
    sd["norm.weight"] = norm.weight.detach().numpy()
    sd["norm.bias"] = norm.bias.detach().numpy()
    return backbone, head, norm, sd, cfg


def _batch(rng, B=3, L=12, vocab=128, pad=1):
    ids = rng.randint(4, vocab, size=(B, L)).astype(np.int64)
    lens = rng.randint(3, L, size=(B,))
    mask = np.zeros((B, L), np.int64)
    for i, n in enumerate(lens):
        mask[i, :n] = 1
        ids[i, n:] = pad
    ids[:, 0] = 0  # CLS
    return ids, mask


def test_roberta_position_ids_match_hf():
    ids = jnp.array([[0, 5, 6, 1, 1], [0, 7, 8, 9, 2]])
    pos = roberta_position_ids(ids, pad_token_id=1)
    # HF: pads stay at padding_idx (=pad_token_id), others count up from it.
    np.testing.assert_array_equal(
        np.asarray(pos), [[2, 3, 4, 1, 1], [2, 3, 4, 5, 6]]
    )


def _to_f64(params):
    import jax as _jax

    return _jax.tree_util.tree_map(
        lambda a: np.asarray(a, np.float64) if np.issubdtype(np.asarray(a).dtype, np.floating) else a,
        params,
    )


def test_encoder_matches_torch_reference(rng):
    backbone, head, norm, sd, cfg = _tiny_torch_ance()
    cfg.dtype = "float64"
    params = _to_f64(params_from_state_dict(sd, cfg))
    backbone, head, norm = backbone.double(), head.double(), norm.double()
    ids, mask = _batch(rng)

    ours = np.asarray(encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    with torch.no_grad():
        hs = backbone(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state
        ref = norm(head(hs[:, 0])).numpy()  # CLS pooling, src/models.py:52-56

    np.testing.assert_allclose(ours, ref, atol=1e-8, rtol=1e-8)


def test_masked_mean_pooling_matches_torch(rng):
    backbone, head, norm, sd, cfg = _tiny_torch_ance()
    cfg.dtype = "float64"
    params = _to_f64(params_from_state_dict(sd, cfg))
    backbone, head, norm = backbone.double(), head.double(), norm.double()
    ids, mask = _batch(rng)

    ours = np.asarray(
        encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask), use_mean=True)
    )
    with torch.no_grad():
        hs = backbone(
            input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)
        ).last_hidden_state
        m = torch.from_numpy(mask).unsqueeze(-1).double()
        pooled = (hs * m).sum(1) / m.sum(1)  # src/models.py:58-61
        ref = norm(head(pooled)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-8, rtol=1e-8)


def test_state_dict_roundtrip():
    cfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    sd = state_dict_from_params(params, cfg)
    params2 = params_from_state_dict(sd, cfg)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_encode_is_jittable_and_deterministic(rng):
    cfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids, mask = _batch(rng)
    f = jax.jit(lambda p, i, m: encode(p, cfg, i, m))
    a = np.asarray(f(params, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(f(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (ids.shape[0], cfg.embedding_dim)


def test_dropout_semantics(rng):
    """Dropout: active only with an rng, deterministic per key, identity at
    rate 0 (frozen towers run keyless, matching passage_encoder.eval())."""
    cfg = ModelConfig.tiny()
    cfg.hidden_dropout_prob = 0.3
    cfg.attention_probs_dropout_prob = 0.1
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids, mask = _batch(rng)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    eval_out = np.asarray(encode(params, cfg, ids, mask))
    k1 = jax.random.PRNGKey(5)
    k2 = jax.random.PRNGKey(6)
    d1 = np.asarray(encode(params, cfg, ids, mask, dropout_rng=k1))
    d1b = np.asarray(encode(params, cfg, ids, mask, dropout_rng=k1))
    d2 = np.asarray(encode(params, cfg, ids, mask, dropout_rng=k2))
    assert not np.allclose(d1, eval_out)
    np.testing.assert_array_equal(d1, d1b)
    assert not np.allclose(d1, d2)

    cfg0 = ModelConfig.tiny()  # zero rates: rng must be a no-op
    z = np.asarray(encode(params, cfg0, ids, mask, dropout_rng=k1))
    np.testing.assert_array_equal(z, eval_out)


def test_stacked_layers_match_list_layout(rng):
    from haconvdr_tpu.models.encoder import stack_layer_params, unstack_layer_params

    cfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    ids, mask = _batch(rng)
    ref = np.asarray(encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    stacked = stack_layer_params(params)
    out = np.asarray(encode(stacked, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    # remat path over the scan
    cfg_r = ModelConfig.tiny()
    cfg_r.remat = True
    out_r = np.asarray(encode(stacked, cfg_r, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out_r, ref, rtol=1e-6, atol=1e-6)

    # dropout over the scan: deterministic per key, differs from eval
    cfg_d = ModelConfig.tiny()
    cfg_d.hidden_dropout_prob = 0.2
    k = jax.random.PRNGKey(3)
    d1 = np.asarray(encode(stacked, cfg_d, jnp.asarray(ids), jnp.asarray(mask), dropout_rng=k))
    d2 = np.asarray(encode(stacked, cfg_d, jnp.asarray(ids), jnp.asarray(mask), dropout_rng=k))
    np.testing.assert_array_equal(d1, d2)
    assert not np.allclose(d1, ref)

    # roundtrip back to list layout
    back = unstack_layer_params(stacked)
    out_b = np.asarray(encode(back, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(out_b, ref, rtol=1e-7)


def test_int8_quantized_encode_close(rng):
    """quantize_encoder_params: per-out-channel int8 dense kernels with
    dynamic per-token activation quantization (_dense int8 path).  The
    quantized encoder's embeddings must stay near-parallel to f32 (the
    f32 LayerNorm + embedding head absorb most of the matmul noise), the
    original params must be untouched, and the stacked-layout
    quantization must agree bitwise with the list layout."""
    from haconvdr_tpu.models.encoder import (
        init_encoder_params,
        quantize_encoder_params,
        stack_layer_params,
    )

    cfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    B, L = 4, 12
    ids = jnp.asarray(rng.randint(4, cfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    e32 = encode(params, cfg, ids, mask)
    qp = quantize_encoder_params(params)
    q_dense = qp["layers"][0]["attention"]["query"]
    assert q_dense["kernel"].dtype == jnp.int8
    assert q_dense["kernel_scale"].shape == (cfg.hidden_size,)
    # original params untouched (quantization returns a new tree)
    assert params["layers"][0]["attention"]["query"]["kernel"].dtype == jnp.float32
    e8 = encode(qp, cfg, ids, mask)
    cos = jnp.sum(e32 * e8, axis=1) / (
        jnp.linalg.norm(e32, axis=1) * jnp.linalg.norm(e8, axis=1)
    )
    assert float(jnp.min(cos)) > 0.999, np.asarray(cos)
    # embeddings differ from f32 (the path actually quantized something)
    assert float(jnp.max(jnp.abs(e32 - e8))) > 0.0
    # stacked layout: same quantization, scan-vs-unrolled only reorders
    # f32 dequant arithmetic (last-ulp)
    e8s = encode(quantize_encoder_params(stack_layer_params(params)), cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(e8s), np.asarray(e8), rtol=1e-5, atol=1e-5)

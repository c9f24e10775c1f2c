"""Fine diagnostic: why does cls-only training flatline at 12L/768?
Logs per-step: total/cls loss, grad norms (enc vs w_cls), embedding
batch-std, w_cls drift."""
import numpy as np
import jax, jax.numpy as jnp
import optax
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import encode, init_encoder_params, stack_layer_params
from haconvdr_tpu.cli.ivf_geometry_check import make_topic_batch

cfg = ModelConfig(dtype="bfloat16", remat="mlp")
B, QL, PL, T = 128, 32, 192, 2000
key = jax.random.PRNGKey(0)
enc_params = stack_layer_params(init_encoder_params(key, cfg))
w_cls = jax.random.normal(jax.random.fold_in(key, 17), (768, T), jnp.float32) * 0.02
params = {"enc": enc_params, "w_cls": w_cls}
import sys
lr = float(sys.argv[1]) if len(sys.argv) > 1 else 5e-5
opt = optax.adamw(lr, weight_decay=0.0)
opt_state = opt.init(params)
xent = optax.softmax_cross_entropy_with_integer_labels

def loss_fn(params, pids, pmask, topics):
    p = encode(params["enc"], cfg, pids, pmask, use_mean=True, trainable=True)
    p = p - p.mean(axis=0, keepdims=True)  # kill the common mode
    w = params["w_cls"].astype(p.dtype)
    cls = xent(p @ w, topics).mean()
    return cls, (p.astype(jnp.float32).std(axis=0).mean(),)

@jax.jit
def step(params, opt_state, key):
    pids, topics = make_topic_batch(key, B, PL, T, cfg.vocab_size)
    ones_p = jnp.ones((B, PL), jnp.int32)
    (loss, (estd,)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, pids, ones_p, topics)
    genc = optax.global_norm(grads["enc"])
    gcls = optax.global_norm(grads["w_cls"])
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, (loss, estd, genc, gcls)

for s in range(40):
    params, opt_state, (loss, estd, genc, gcls) = step(
        params, opt_state, jax.random.PRNGKey(1000 + s))
    print(f"step {s:3d} cls {float(loss):.4f} emb_std {float(estd):.5f} "
          f"gnorm_enc {float(genc):.3e} gnorm_cls {float(gcls):.3e}", flush=True)

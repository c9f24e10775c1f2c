import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.models.encoder import encode, init_encoder_params, stack_layer_params
cfg = ModelConfig.tiny()
cfg.num_hidden_layers = 2
cfg.hidden_size = 768
cfg.num_attention_heads = 12
cfg.intermediate_size = 1024
cfg.dtype = 'bfloat16'
cfg.use_flash_attention = True
cfg.hidden_dropout_prob = 0.0
cfg.attention_probs_dropout_prob = 0.0
params = stack_layer_params(init_encoder_params(jax.random.PRNGKey(0), cfg))
ids = jnp.ones((8, 384), jnp.int32) * 5
mask = jnp.ones((8, 384), jnp.int32)
def loss(p):
    return jnp.sum(encode(p, cfg, ids, mask, dropout_rng=None, trainable=True) ** 2)
l, g = jax.jit(jax.value_and_grad(loss))(params)
gn = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
print('dropout-free trainable grad on TPU OK: loss', float(l), 'grad-sum finite:', bool(jnp.isfinite(gn)))
from haconvdr_tpu.ops.fused_attention import fused_attention_supported
print('flash gate: bf16 L=384 ->', fused_attention_supported(384, 64, 12, 2),
      '| f32 L=384 ->', fused_attention_supported(384, 64, 12, 4),
      '| bf16 L=512 ->', fused_attention_supported(512, 64, 12, 2))

"""Tiny CPU sanity: can cls-only learn at all with this machinery?"""
import logging, os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.cli.ivf_geometry_check import train_encoder

logging.basicConfig(level=logging.INFO, format="%(message)s")
cfg = ModelConfig(
    dtype="float32", num_hidden_layers=2, hidden_size=64,
    num_attention_heads=2, intermediate_size=128, vocab_size=2048,
)
_, losses = train_encoder(
    jax.random.PRNGKey(0), cfg, 200, 32, 8, 24, 32,
    lr=1e-3, wd=0.0, warmup=20,
)
print("contrastive:", ["%.3f" % l for l in losses])

"""Probe: geometry-check training recipe at full 12L/768 scale.
Usage: python probes/probe_geom_train.py [steps] [lr] [warmup]
(Findings so far: pure in-batch CE from random init is unescapable —
exact collapse is a zero-gradient stationary point; aux topic-cls head
at lr 1e-3 is UNSTABLE at 12L (cls loss drifts up from ln(2000));
tiny-scale staged cls->joint learns fine, so this sweeps lr down.)"""
import logging
import sys
import jax
from haconvdr_tpu.config import ModelConfig
from haconvdr_tpu.cli.ivf_geometry_check import train_encoder

logging.basicConfig(level=logging.INFO, format="%(message)s")
steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
lr = float(sys.argv[2]) if len(sys.argv) > 2 else 2e-4
warmup = int(sys.argv[3]) if len(sys.argv) > 3 else 200
cfg = ModelConfig(dtype="bfloat16", remat="mlp")
_, losses = train_encoder(
    jax.random.PRNGKey(0), cfg, steps, 128, 32, 192, 2000,
    lr=lr, wd=0.0, warmup=warmup,
)
print(f"contrastive losses: {['%.3f' % l for l in losses]}", flush=True)
print("ESCAPED" if losses[-1] < 4.0 else "STILL COLLAPSED", flush=True)

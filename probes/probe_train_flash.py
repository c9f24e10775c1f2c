"""Train-step timing at the reference geometry: flash-VJP attention vs the
XLA trained-tower path, remat on/off.

Geometry (BASELINE.md): B=64, query L=512 (grad), 4 frozen 384-tok towers,
dropout on, bf16 compute + bf16 frozen towers, stacked/scanned layers.
Timing: N steps inside one lax.scan dispatch (pure device time; avoids the
dev relay's unstable per-dispatch latency).

Run: timeout 3600 python probes/probe_train_flash.py A B C
  A = flash OFF (r3 baseline, expect ~453 ms/step)
  B = flash ON, remat on
  C = flash ON, remat off
"""
import sys
import time
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from haconvdr_tpu.config import ModelConfig, TrainConfig
from haconvdr_tpu.models.encoder import init_encoder_params, stack_layer_params
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.train.trainer import init_train_state, make_optimizer, make_train_step

assert jax.devices()[0].platform == "tpu", jax.devices()

variants = sys.argv[1:] or ["A", "B", "C"]
STEPS = 3
B, LQ, LD = 64, 512, 384

rs = np.random.RandomState(0)
batch = {
    "conv_qp": rs.randint(2, 50000, (B, LQ)).astype(np.int32),
    "conv_qp_mask": np.ones((B, LQ), np.int32),
    "valid": np.ones((B,), np.int32),
}
for k in ("pos_docs", "neg_docs", "pseudo_prepos_docs", "prepos_neg_docs"):
    batch[k] = rs.randint(2, 50000, (B, LD)).astype(np.int32)
    batch[k + "_mask"] = np.ones((B, LD), np.int32)
batch["has_pseudo_prepos"] = np.ones((B,), np.int32)
batch["has_prepos_neg"] = np.ones((B,), np.int32)
batch = {k: jnp.asarray(v) for k, v in batch.items()}

mesh = make_mesh()


def run(tag, flash_on, remat):
    import haconvdr_tpu.ops.flash_attention as fa

    orig = fa.flash_vjp_supported
    if not flash_on:
        fa.flash_vjp_supported = lambda *a, **k: False
    try:
        mcfg = ModelConfig(dtype="bfloat16", remat=remat)
        tcfg = TrainConfig(
            per_device_train_batch_size=B, accumulation_steps=8,
            is_pseudo_prepos=True, is_prepos_neg=True,
            frozen_dtype="bfloat16",
        )
        opt = make_optimizer(tcfg, 1000)
        step = make_train_step(mesh, mcfg, tcfg, opt)
        params = stack_layer_params(
            init_encoder_params(jax.random.PRNGKey(0), mcfg)
        )
        state = init_train_state(params, opt, seed=1)
        frozen = params

        @jax.jit
        def multi(state, frozen, batch):
            def body(s, _):
                s2, loss = step(s, frozen, batch)
                return s2, loss
            return jax.lax.scan(body, state, None, length=STEPS)

        t0 = time.time()
        st2, losses = multi(state, frozen, batch)
        np.asarray(jax.device_get(losses))
        print(f"[{tag}] compile+{STEPS} steps: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        st2, losses = multi(state, frozen, batch)
        np.asarray(jax.device_get(losses))
        dt = (time.time() - t0) / STEPS
        print(
            f"[{tag}] flash={flash_on} remat={remat}: {dt*1000:.0f} ms/step "
            f"= {B/dt:.1f} ex/s   losses={np.asarray(losses)[:2]}",
            flush=True,
        )
    finally:
        fa.flash_vjp_supported = orig


cfgs = {
    "A": (False, True),
    "B": (True, True),
    "C": (True, False),
    "D": (True, "mlp"),
}
for v in variants:
    flash_on, remat = cfgs[v]
    run(v, flash_on, remat)
print("DONE", flush=True)

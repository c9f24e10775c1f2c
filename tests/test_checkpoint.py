"""Train-state checkpoint/resume roundtrip and bitwise-resume test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from haconvdr_tpu.config import ModelConfig, TrainConfig
from haconvdr_tpu.models.encoder import init_encoder_params
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.train.checkpoint import (
    latest_step,
    restore_train_state,
    save_train_state,
)
from haconvdr_tpu.train.trainer import (
    init_train_state,
    make_optimizer,
    make_train_step,
)


def _setup(rng):
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        accumulation_steps=2, learning_rate=1e-3, num_warmup_portion=0.0,
        is_pseudo_prepos=False, is_prepos_neg=False,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    opt = make_optimizer(tcfg, total_steps=50)
    step = make_train_step(mesh, mcfg, tcfg, opt)
    B, L = 8, 6
    batch = {
        "conv_qp": jnp.asarray(rng.randint(4, mcfg.vocab_size, (B, L)), jnp.int32),
        "conv_qp_mask": jnp.ones((B, L), jnp.int32),
        "pos_docs": jnp.asarray(rng.randint(4, mcfg.vocab_size, (B, 5)), jnp.int32),
        "pos_docs_mask": jnp.ones((B, 5), jnp.int32),
        "neg_docs": jnp.asarray(rng.randint(4, mcfg.vocab_size, (B, 5)), jnp.int32),
        "neg_docs_mask": jnp.ones((B, 5), jnp.int32),
        "valid": jnp.ones((B,), jnp.int32),
    }
    return opt, step, init_train_state(params, opt), frozen, batch


def test_checkpoint_resume_bitwise(rng, tmp_path):
    opt, step, state, frozen, batch = _setup(rng)
    ckpt_dir = str(tmp_path / "ckpt")

    # run 3 micro steps, checkpoint, run 3 more
    for _ in range(3):
        state, _ = step(state, frozen, batch)
    save_train_state(ckpt_dir, int(state.micro_step) + 10 * int(state.global_step), state)
    cont = state
    for _ in range(3):
        cont, _ = step(cont, frozen, batch)

    # resume from the checkpoint and replay the same 3 steps
    assert latest_step(ckpt_dir) is not None
    fresh = init_train_state(
        init_encoder_params(jax.random.PRNGKey(7), ModelConfig.tiny()), opt
    )
    restored = restore_train_state(ckpt_dir, fresh)
    assert int(restored.global_step) == int(state.global_step)
    assert int(restored.micro_step) == int(state.micro_step)
    replay = restored
    for _ in range(3):
        replay, _ = step(replay, frozen, batch)

    for a, b in zip(
        jax.tree_util.tree_leaves(cont.params), jax.tree_util.tree_leaves(replay.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

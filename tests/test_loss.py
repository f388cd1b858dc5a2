"""Loss-semantics tests: the vectorized in-batch CE must match a direct
per-user oracle that transcribes the reference algorithm
(Code_Cached/model/model.py:81-105) literally."""

import jax
import jax.numpy as jnp
import numpy as np

from iisan_tpu.ops.losses import inbatch_ce_loss


def oracle_loss(prec_vec, score_embs, item_ids, log_mask, pop_prob):
    """Literal numpy transcription of the reference loss semantics."""
    bs, L, d = prec_vec.shape
    n = bs * (L + 1)
    flat_ids = item_ids.reshape(-1)
    logits = prec_vec.reshape(bs * L, d) @ score_embs.T
    logits = logits - np.log(pop_prob[flat_ids])[None, :]
    ext = np.concatenate([log_mask, np.ones((bs, 1))], axis=1).reshape(-1)
    logits[:, ext == 0] = -1e4
    logits = logits.reshape(bs, L, n)
    for i in range(bs):
        reject = item_ids[i]
        mask = np.isin(flat_ids, reject)           # (n,)
        mask_mat = np.tile(mask, (L, 1))           # (L, n)
        for j in range(L):
            mask_mat[j, i * (L + 1) + j + 1] = False
        logits[i][mask_mat] = -1e4
    labels = np.array([i * (L + 1) + j for i in range(bs) for j in range(1, L + 1)])
    logits = logits.reshape(bs * L, n)
    keep = log_mask.reshape(-1) != 0
    lw = logits[keep]
    lbl = labels[keep]
    lse = np.log(np.sum(np.exp(lw - lw.max(1, keepdims=True)), 1)) + lw.max(1)
    return float(np.mean(lse - lw[np.arange(len(lbl)), lbl]))


def test_loss_matches_oracle(rng):
    bs, L, d, items = 5, 10, 8, 40
    prec = rng.standard_normal((bs, L, d))
    score = rng.standard_normal((bs * (L + 1), d))
    # sequences with pads and deliberate repeats across users
    ids = np.zeros((bs, L + 1), np.int32)
    mask = np.zeros((bs, L), np.float32)
    for i in range(bs):
        n = int(rng.integers(4, L + 2))
        seq = rng.integers(1, items + 1, size=n)
        ids[i, L + 1 - n:] = seq
        mask[i, L - (n - 1):] = 1
    ids[1, -3:] = ids[0, -3:]  # force cross-user repeats
    pop = rng.uniform(0.01, 1.0, size=items + 1).astype(np.float32)
    pop[0] = 1.0

    got = float(inbatch_ce_loss(
        jnp.asarray(prec, jnp.float32), jnp.asarray(score, jnp.float32),
        jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pop)))
    want = oracle_loss(prec, score, ids, mask, pop)
    # Exact-semantics parity verified in float64 (diff ~3e-6); the fp32
    # device path is allowed fp32 matmul/logsumexp rounding.
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_loss_grad_finite(rng):
    bs, L, d, items = 3, 10, 8, 20
    prec = jnp.asarray(rng.standard_normal((bs, L, d)), jnp.float32)
    score = jnp.asarray(rng.standard_normal((bs * (L + 1), d)), jnp.float32)
    ids = jnp.asarray(rng.integers(1, items + 1, size=(bs, L + 1)), jnp.int32)
    mask = jnp.ones((bs, L), jnp.float32)
    pop = jnp.ones((items + 1,), jnp.float32) / items

    g = jax.grad(lambda p: inbatch_ce_loss(p, score, ids, mask, pop))(prec)
    assert np.all(np.isfinite(np.asarray(g)))


def test_loss_ignores_padded_rows(rng):
    """Rows with log_mask==0 must not contribute: perturbing their
    prec_vec rows leaves the loss unchanged."""
    bs, L, d, items = 4, 10, 8, 30
    prec = rng.standard_normal((bs, L, d)).astype(np.float32)
    score = rng.standard_normal((bs * (L + 1), d)).astype(np.float32)
    ids = np.zeros((bs, L + 1), np.int32)
    mask = np.zeros((bs, L), np.float32)
    for i in range(bs):
        n = 6
        ids[i, L + 1 - n:] = rng.integers(1, items + 1, size=n)
        mask[i, L - (n - 1):] = 1
    pop = np.full(items + 1, 1.0 / items, np.float32)

    l1 = inbatch_ce_loss(jnp.asarray(prec), jnp.asarray(score),
                         jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pop))
    prec2 = prec.copy()
    prec2[:, :4, :] += 100.0  # padded rows (first L-5 are masked)
    l2 = inbatch_ce_loss(jnp.asarray(prec2), jnp.asarray(score),
                         jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pop))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

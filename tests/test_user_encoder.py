"""SASRec user-encoder tests: causal-mask semantics and shape contract
(Code_Cached/model/encoders.py:37-58, modules.py:79-96)."""

import jax
import jax.numpy as jnp
import numpy as np

from iisan_tpu.models.user_encoder import UserEncoder, causal_additive_mask


def test_causal_mask_values():
    log_mask = jnp.asarray([[0.0, 1.0, 1.0]])
    m = causal_additive_mask(log_mask)  # (1,1,3,3)
    m = np.asarray(m)[0, 0]
    # key must satisfy: key <= query AND log_mask[key] != 0
    want = np.array([
        [-1e9, -1e9, -1e9],   # q0: k0 pad
        [-1e9, 0.0, -1e9],    # q1: k0 pad, k1 ok, k2 future
        [-1e9, 0.0, 0.0],     # q2
    ])
    np.testing.assert_array_equal(m, want)


def test_future_positions_do_not_leak():
    """Changing a future item's embedding must not change earlier outputs."""
    enc = UserEncoder(max_seq_len=6, num_attention_heads=2, n_layers=2,
                      dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 16)).astype(np.float32)
    log_mask = jnp.ones((2, 6))
    v = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), log_mask)
    y1 = enc.apply(v, jnp.asarray(x), log_mask)
    x2 = x.copy()
    x2[:, -1, :] += 10.0
    y2 = enc.apply(v, jnp.asarray(x2), log_mask)
    np.testing.assert_allclose(np.asarray(y1)[:, :-1], np.asarray(y2)[:, :-1],
                               atol=1e-5)
    assert not np.allclose(np.asarray(y1)[:, -1], np.asarray(y2)[:, -1])


def test_output_shape_and_param_structure():
    enc = UserEncoder(max_seq_len=10, num_attention_heads=2, n_layers=2,
                      dropout=0.1, dtype=jnp.float32)
    x = jnp.zeros((3, 10, 64))
    v = enc.init(jax.random.PRNGKey(0), x, jnp.ones((3, 10)))
    y = enc.apply(v, x, jnp.ones((3, 10)))
    assert y.shape == (3, 10, 64)
    p = v["params"]["transformer_encoder"]
    assert p["position_embedding"].shape == (10, 64)
    assert "transformer_blocks_0" in p and "transformer_blocks_1" in p
    # attention projections carry no bias (modules.py:44-47)
    mha = p["transformer_blocks_0"]["multi_head_attention"]
    assert "bias" not in mha["w_Q"]

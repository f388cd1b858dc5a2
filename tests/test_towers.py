"""Tower parity tests: our Flax BERT/ViT must reproduce the HuggingFace
torch implementations (which the reference uses, Code_Cached/run.py:41-62)
bit-for-bit modulo fp32 rounding, on randomly initialized small configs -
including every per-layer hidden state, since those are what IISAN fuses."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from iisan_tpu.models import bert as jbert
from iisan_tpu.models import vit as jvit


def test_bert_matches_transformers():
    cfg = transformers.BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        output_hidden_states=True)
    with torch.no_grad():
        tm = transformers.BertModel(cfg).eval()
        ids = torch.randint(0, 120, (2, 9))
        mask = torch.ones(2, 9, dtype=torch.long)
        mask[1, 6:] = 0
        out = tm(input_ids=ids, attention_mask=mask)
        want = [h.numpy() for h in out.hidden_states]

    jm = jbert.BertEncoder(
        vocab_size=120, hidden_dim=32, num_layers=3, num_heads=4,
        intermediate_dim=64, max_position=40)
    params = jbert.params_from_hf_torch(tm.state_dict(), num_layers=3)
    _, hiddens = jm.apply({"params": params}, jnp.asarray(ids.numpy()),
                          jnp.asarray(mask.numpy()))
    hiddens = np.asarray(hiddens)
    assert hiddens.shape[0] == 4  # embeddings + 3 layers
    for i, w in enumerate(want):
        # padded positions may differ (HF masks only attention); CLS + valid
        # positions must match
        np.testing.assert_allclose(hiddens[i][:, :6], w[:, :6],
                                   atol=2e-5, err_msg=f"layer {i}")


def test_vit_matches_transformers():
    cfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        output_hidden_states=True)
    with torch.no_grad():
        tm = transformers.ViTModel(cfg, add_pooling_layer=False).eval()
        imgs = torch.randn(2, 3, 32, 32)
        out = tm(pixel_values=imgs)
        want = [h.numpy() for h in out.hidden_states]
        want_last = out.last_hidden_state.numpy()

    jm = jvit.ViTEncoder(image_size=32, patch_size=8, hidden_dim=32,
                         num_layers=3, num_heads=4, intermediate_dim=64)
    params = jvit.params_from_hf_torch(tm.state_dict(), num_layers=3,
                                       prefix="")
    imgs_nhwc = jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1))
    last, hiddens = jm.apply({"params": params}, imgs_nhwc)
    hiddens = np.asarray(hiddens)
    assert hiddens.shape == (4, 2, 17, 32)  # 16 patches + CLS
    for i, w in enumerate(want):
        np.testing.assert_allclose(hiddens[i], w, atol=3e-5,
                                   err_msg=f"layer {i}")
    np.testing.assert_allclose(np.asarray(last), want_last, atol=3e-5)


def test_bert_cls_taps_layout():
    """The cache builder contract: CLS of hidden state i == hiddens[i][:,0]
    (preprocess_vectors.py:89-92)."""
    jm = jbert.BertEncoder(vocab_size=50, hidden_dim=16, num_layers=2,
                           num_heads=2, intermediate_dim=32, max_position=20)
    ids = jnp.ones((3, 8), jnp.int32)
    mask = jnp.ones((3, 8), jnp.int32)
    v = jm.init(jax.random.PRNGKey(0), ids, mask)
    _, hiddens = jm.apply(v, ids, mask)
    cls = hiddens[:, :, 0, :]  # (layers+1, B, D)
    assert cls.shape == (3, 3, 16)

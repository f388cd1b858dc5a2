"""Multi-attribute text ETL + tower (VERDICT r1 missing #5).

Packed title+abstract+body layout per get_doc_input_bert
(/root/reference/Code_Uncached/data_utils/preprocess.py:153-194) and the
Bert_Encoder split/mean semantics (model/encoders.py:116-158).
"""

import jax
import numpy as np
import pytest

from iisan_tpu.config import IISANConfig
from iisan_tpu.data import preprocess as prep
from iisan_tpu.models.bert import BertEncoder
from iisan_tpu.models.towers import TextTower


class StubTokenizer:
    """Deterministic stand-in: token = (len(word) % 90) + 10, CLS=1, SEP=2."""

    def __call__(self, texts, max_length, padding, truncation):
        ids, masks = [], []
        for t in texts:
            toks = [1] + [(len(w) % 90) + 10 for w in t.split()][: max_length - 2] + [2]
            m = [1] * len(toks)
            toks += [0] * (max_length - len(toks))
            m += [0] * (max_length - len(m))
            ids.append(toks[:max_length])
            masks.append(m[:max_length])
        return {"input_ids": ids, "attention_mask": masks}


def test_packed_layout_matches_attributes2start(tmp_path):
    """Block offsets equal Bert_Encoder.attributes2start; the title block
    is identical to the single-attribute tokenize_titles output."""
    p = tmp_path / "items.tsv"
    with open(p, "w") as f:
        f.write("A1\tshort title\tthe abstract text\t" + "body " * 600 + "\n")
        f.write("A2\tanother one\tmore abstract\tsmall body\n")
    tok = StubTokenizer()
    attrs = ("title", "abstract", "body")
    nws = (6, 8, 4)
    texts = prep.read_item_attributes(str(p))
    packed = prep.tokenize_attributes(texts, tok, attrs, nws)
    assert packed.shape == (3, 2 * (6 + 8 + 4))
    assert np.all(packed[0] == 0)  # pad row

    titles = {i: texts["title"][i] for i in texts["title"]}
    title_only = prep.tokenize_titles(titles, tok, 6)
    np.testing.assert_array_equal(packed[:, : 2 * 6], title_only)

    # abstract block starts at attributes2start['abstract'] = 2*6
    enc = tok([texts["abstract"][1].lower()], 8, None, None)
    np.testing.assert_array_equal(packed[1, 12:20], enc["input_ids"][0])
    np.testing.assert_array_equal(packed[1, 20:28], enc["attention_mask"][0])
    # body truncated to 2000 chars before tokenizing (preprocess.py:144)
    assert len(texts["body"][1]) > 2000


def test_text_tower_multiattr_means_shared_encoder():
    """Multi-attribute forward == mean of per-block single-attr forwards
    with the SAME shared bert+fc params (encoders.py:139-157)."""
    bert = BertEncoder(vocab_size=120, hidden_dim=16, num_layers=2,
                       num_heads=2, intermediate_dim=32, max_position=16,
                       dropout=0.0)
    nws = (5, 3)
    multi = TextTower(bert=bert, embedding_dim=8, num_words=5,
                      attr_num_words=nws)
    rng = np.random.default_rng(0)
    tokens = np.zeros((4, 2 * (5 + 3)), np.int32)
    tokens[:, :5] = rng.integers(1, 120, (4, 5))
    tokens[:, 5:10] = 1
    tokens[:, 10:13] = rng.integers(1, 120, (4, 3))
    tokens[:, 13:16] = 1
    params = multi.init(jax.random.PRNGKey(0), tokens)["params"]
    vec, hiddens = multi.apply({"params": params}, tokens)

    single5 = TextTower(bert=bert, embedding_dim=8, num_words=5)
    v1, h1 = single5.apply({"params": params}, tokens[:, :10])
    single3 = TextTower(bert=bert, embedding_dim=8, num_words=3)
    v2, _ = single3.apply({"params": params}, tokens[:, 10:16])
    np.testing.assert_allclose(np.asarray(vec),
                               (np.asarray(v1) + np.asarray(v2)) / 2,
                               atol=1e-6)
    # hidden states come from the title block
    np.testing.assert_allclose(np.asarray(hiddens), np.asarray(h1),
                               atol=1e-6)


def test_uncached_model_with_abstract_attribute():
    """towers_from_config + a forward pass with news_attributes
    title,abstract: the packed width and model wiring line up."""
    from iisan_tpu.train.uncached import build_uncached_model

    cfg = IISANConfig(
        batch_size=4, embedding_dim=16, word_embedding_dim=32,
        image_embedding_dim=32, text_layers=2, image_layers=2,
        CV_resize=16, num_words_title=6, num_words_abstract=4,
        news_attributes=("title", "abstract"),
        side_adapter_vit_list="0,1", side_adapter_bert_list="0,1",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_type="IISAN", adding_adapter_to="all",
        compute_dtype="float32", max_seq_len=2, min_seq_len=2,
        drop_rate=0.0, adapter_dropout_rate=0.0, tower_dropout=0.0,
        fused_tower_attention=False, fused_user_encoder=False)
    assert cfg.packed_text_width() == 2 * (6 + 4)
    model, _ = build_uncached_model(cfg)
    L = cfg.max_seq_len
    n = 2 * (L + 1)
    rng = np.random.default_rng(0)
    tokens = np.zeros((n, cfg.packed_text_width()), np.int32)
    tokens[:, :6] = rng.integers(1, 99, (n, 6))
    tokens[:, 6:12] = 1
    tokens[:, 12:16] = rng.integers(1, 99, (n, 4))
    tokens[:, 16:20] = 1
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.ones((2, L + 1), np.int32),
        rng.standard_normal((n, 16, 16, 3)).astype(np.float32),
        tokens, np.ones((2, L), np.float32), np.ones((30,), np.float32),
        deterministic=True)
    loss = model.apply(
        {"params": variables["params"]},
        np.ones((2, L + 1), np.int32),
        rng.standard_normal((n, 16, 16, 3)).astype(np.float32),
        tokens, np.ones((2, L), np.float32), np.ones((30,), np.float32),
        deterministic=True)
    assert np.isfinite(float(loss))


def test_single_non_title_attribute_uses_own_width():
    """news_attributes=('abstract',): the packed row is 2*num_words_abstract
    wide and TextTower must slice at that width, not num_words_title
    (code-review r3 finding)."""
    from iisan_tpu.models.towers import towers_from_config

    cfg = IISANConfig(
        word_embedding_dim=32, image_embedding_dim=32, text_layers=2,
        image_layers=2, CV_resize=16, num_words_title=6,
        num_words_abstract=4, news_attributes=("abstract",),
        compute_dtype="float32")
    assert cfg.packed_text_width() == 8
    text_tower, _ = towers_from_config(cfg)
    assert text_tower.attr_num_words == (4,)
    # and a forward with the abstract-width packed row works
    rng = np.random.default_rng(0)
    tokens = np.zeros((3, 8), np.int32)
    tokens[:, :4] = rng.integers(1, 99, (3, 4))
    tokens[:, 4:] = 1
    params = text_tower.init(jax.random.PRNGKey(0), tokens)["params"]
    vec, hiddens = text_tower.apply({"params": params}, tokens)
    assert vec.shape == (3, cfg.embedding_dim)

"""Config semantics: tap-list derivation, remove_first, dim coupling."""

from iisan_tpu.config import IISANConfig


def test_default_taps():
    cfg = IISANConfig()
    # [0] + [i+1 for i in 1,3,5,7,9,11] (model.py:267-270)
    assert cfg.san_text_taps() == (0, 2, 4, 6, 8, 10, 12)
    assert cfg.san_image_taps() == (0, 2, 4, 6, 8, 10, 12)


def test_remove_first_taps():
    cfg = IISANConfig(remove_first="TRUE", side_adapter_bert_list="1,3",
                      side_adapter_vit_list="2")
    # row 0 still needed (carry init, model.py:306-309); fusion = [i+1]
    assert cfg.san_text_taps() == (0, 2, 4)
    assert cfg.san_image_taps() == (0, 3)
    assert cfg.remove_first_bool


def test_versa_group_drop_lists():
    cfg = IISANConfig(side_adapter_bert_list="4,19,34,49,64,79",
                      side_adapter_vit_list="1,3,5,7,9,11",
                      text_layers=80, text_embedding_dim=8192)
    assert cfg.san_text_taps() == (0, 5, 20, 35, 50, 65, 80)
    assert cfg.text_num_hidden == 81


def test_with_bert_dims():
    assert IISANConfig(bert_model_load="bert_tiny").with_bert_dims() \
        .word_embedding_dim == 128
    assert IISANConfig(bert_model_load="bert_large_uncased").with_bert_dims() \
        .word_embedding_dim == 1024
    # explicit programmatic dims survive (no coupling unless asked)
    assert IISANConfig(word_embedding_dim=24).word_embedding_dim == 24


def test_replace_preserves_overrides():
    cfg = IISANConfig(word_embedding_dim=32).replace(batch_size=8)
    assert cfg.word_embedding_dim == 32 and cfg.batch_size == 8

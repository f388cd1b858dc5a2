"""SAN semantics tests against a literal numpy oracle of the reference
cascade (Code_Cached/model/model.py:300-349 symmetric;
Code_Cached_Asym/model/model.py:326-429 asymmetric)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iisan_tpu.models.san import SideAdapterNetwork


def np_adapter(p, x, act="RELU"):
    h = x @ p["fc_down"]["kernel"] + p["fc_down"]["bias"]
    if act == "GELU":
        from scipy.stats import norm  # pragma: no cover
        h = h * norm.cdf(h)
    else:
        h = np.maximum(h, 0)
    return h @ p["fc_up"]["kernel"] + p["fc_up"]["bias"] + x


def np_linear(p, x):
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def gate(theta):
    return 1.0 / (1.0 + np.exp(-theta / 0.1))


def np_stack_adapter(params, name, i, x, act="RELU"):
    """Apply step i of a stacked adapter cascade parameter group."""
    h = x @ params[f"{name}_wd"][i] + params[f"{name}_bd"][i]
    h = np.maximum(h, 0)
    return h @ params[f"{name}_wu"][i] + params[f"{name}_bu"][i] + x


def oracle_san(params, cv_states, text_states, kt, kc, text_dim, image_dim,
               remove_first=False, head_mode="cached"):
    """Transcribes the asym forward (model.py:326-429) in numpy."""
    n = text_states.shape[0]
    if remove_first:
        ct, cc = text_states[:, 0], cv_states[:, 0]
        t_taps, c_taps = text_states[:, 1:], cv_states[:, 1:]
    else:
        ct = np.zeros((n, text_dim)); cc = np.zeros((n, image_dim))
        t_taps, c_taps = text_states, cv_states
    mm_dim = min(text_dim, image_dim)
    cm = np.zeros((n, mm_dim))
    k_mm = min(kt, kc)
    dt, dc = kt - k_mm, kc - k_mm
    gt = params.get("side_gate_params_text")
    gc = params.get("side_gate_params_cv")
    gm = params.get("side_gate_params_mm")
    for i in range(kt):
        f = gate(gt[i]) * t_taps[:, i] + (1 - gate(gt[i])) * ct
        ct = np_stack_adapter(params, "bert_adapter_list", i, f)
    for i in range(kc):
        f = gate(gc[i]) * c_taps[:, i] + (1 - gate(gc[i])) * cc
        cc = np_stack_adapter(params, "cv_adapter_list", i, f)
    for i in range(k_mm):
        ti, ci = dt + i, dc + i
        mt, mc = t_taps[:, ti], c_taps[:, ci]
        if text_dim > image_dim:
            mt = np_linear(params[f"down_project_list_{i}"], mt)
        elif image_dim > text_dim:
            mc = np_linear(params[f"down_project_list_{i}"], mc)
        g = gate(gm[i])
        cm = cm + g * mc + (1 - g) * mt
        cm = np_stack_adapter(params, "mm_adapter_list", i, cm)
    t = np_linear(params["fc_bert"], ct)
    c = np_linear(params["fc_cv"], cc)
    m = np_linear(params["fc_mm"], cm)
    return (np_linear(params["cv_pre_fc"], c),
            np_linear(params["bert_pre_fc"], t),
            np_linear(params["fc_mm_down"], m))


def to_np(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


@pytest.mark.parametrize("kt,kc,text_dim,image_dim,head_mode,remove_first", [
    (7, 7, 32, 32, "cached", False),     # symmetric default geometry
    (6, 6, 32, 32, "cached", True),      # remove_first carry init
    (7, 4, 48, 32, "asym", False),       # group layer-drop + text wider
    (3, 6, 16, 40, "asym", False),       # group layer-drop + image wider
])
def test_san_matches_oracle(rng, kt, kc, text_dim, image_dim, head_mode,
                            remove_first):
    emb = 8
    first = 1 if remove_first else 0
    san = SideAdapterNetwork(
        embedding_dim=emb, text_dim=text_dim, image_dim=image_dim,
        num_text_taps=kt, num_image_taps=kc,
        bert_down_size=12, cv_down_size=12,
        remove_first=remove_first, head_mode=head_mode,
        dtype=jnp.float32)
    n = 5
    cv = rng.standard_normal((n, kc + first, image_dim)).astype(np.float32)
    text = rng.standard_normal((n, kt + first, text_dim)).astype(np.float32)
    variables = san.init(jax.random.PRNGKey(0), jnp.asarray(cv), jnp.asarray(text))
    # randomize gates so the test is not trivially 0.5 everywhere
    params = variables["params"]
    params = jax.tree_util.tree_map(lambda x: x, params)
    for k in list(params):
        if k.startswith("side_gate_params"):
            params[k] = jnp.asarray(
                rng.standard_normal(params[k].shape), jnp.float32)

    emb_cv, emb_text, emb_mm = san.apply({"params": params},
                                         jnp.asarray(cv), jnp.asarray(text))
    o_cv, o_text, o_mm = oracle_san(
        to_np(params), cv, text, kt, kc, text_dim, image_dim,
        remove_first, head_mode)
    np.testing.assert_allclose(np.asarray(emb_text), o_text, atol=1e-4)
    np.testing.assert_allclose(np.asarray(emb_cv), o_cv, atol=1e-4)
    np.testing.assert_allclose(np.asarray(emb_mm), o_mm, atol=1e-4)


def test_gates_init_at_half():
    """Zero-init gate params => sigmoid(0/0.1) = 0.5 (model.py:284-296)."""
    san = SideAdapterNetwork(embedding_dim=8, text_dim=16, image_dim=16,
                             num_text_taps=3, num_image_taps=3,
                             dtype=jnp.float32)
    x = jnp.zeros((2, 3, 16))
    v = san.init(jax.random.PRNGKey(0), x, x)
    for name in ("side_gate_params_text", "side_gate_params_cv",
                 "side_gate_params_mm"):
        assert np.all(np.asarray(v["params"][name]) == 0.0)


def test_adapter_zero_bias_small_weights():
    """AdapterBlock init: N(0, 1e-2) weights, zero bias (modules.py:102-110)."""
    san = SideAdapterNetwork(embedding_dim=8, text_dim=16, image_dim=16,
                             num_text_taps=2, num_image_taps=2,
                             dtype=jnp.float32)
    x = jnp.zeros((2, 2, 16))
    v = san.init(jax.random.PRNGKey(0), x, x)
    p = v["params"]
    assert np.all(np.asarray(p["bert_adapter_list_bd"]) == 0)
    assert np.abs(np.asarray(p["bert_adapter_list_wd"])).max() < 0.08


def test_intra_only_and_inter_only_modalities(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 16)), jnp.float32)
    intra = SideAdapterNetwork(embedding_dim=8, text_dim=16, image_dim=16,
                               num_text_taps=4, num_image_taps=4,
                               modality="intra", dtype=jnp.float32)
    v = intra.init(jax.random.PRNGKey(0), x, x)
    cv, t, mm = intra.apply(v, x, x)
    assert mm is None and cv is not None and t is not None
    assert "side_gate_params_mm" not in v["params"]

    inter = SideAdapterNetwork(embedding_dim=8, text_dim=16, image_dim=16,
                               num_text_taps=4, num_image_taps=4,
                               modality="inter", dtype=jnp.float32)
    v = inter.init(jax.random.PRNGKey(0), x, x)
    cv, t, mm = inter.apply(v, x, x)
    assert cv is None and t is None and mm is not None


@pytest.mark.parametrize("text_dim,image_dim,want_down", [
    (32, 32, 24),   # equal dims -> bert_adapter_down_size (Code_Cached model.py:274)
    (16, 40, 24),   # narrower text -> bert size (asym model.py:287)
    (48, 32, 8),    # strictly wider text -> cv size (asym model.py:281-285)
])
def test_inter_branch_bottleneck_size(text_dim, image_dim, want_down):
    """Advisor r1 low: the inter-adapter bottleneck must use
    bert_adapter_down_size except when text is strictly wider."""
    san = SideAdapterNetwork(
        embedding_dim=8, text_dim=text_dim, image_dim=image_dim,
        num_text_taps=3, num_image_taps=3,
        bert_down_size=24, cv_down_size=8, dtype=jnp.float32)
    cv = jnp.zeros((2, 3, image_dim))
    text = jnp.zeros((2, 3, text_dim))
    params = san.init(jax.random.PRNGKey(0), cv, text)["params"]
    mm_dim = min(text_dim, image_dim)
    assert params["mm_adapter_list_wd"].shape == (3, mm_dim, want_down)


def test_batch_intra_branches_identical_numerics():
    """dual_reference_cascade (batched dual-branch loop) must equal the
    per-branch cascades bit-for-bit in structure and to fp32 tolerance in
    value, for gated and additive fusion."""
    import jax
    import jax.numpy as jnp

    from iisan_tpu.models.san import SideAdapterNetwork

    rng = np.random.default_rng(0)
    n, k, d, r = 6, 3, 16, 4
    cv = jnp.asarray(rng.standard_normal((n, k, d)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((n, k, d)), jnp.float32)
    for gated in (True, False):
        kw = dict(embedding_dim=8, text_dim=d, image_dim=d,
                  num_text_taps=k, num_image_taps=k,
                  bert_down_size=r, cv_down_size=r,
                  gated=gated, modality="intra_inter",
                  dtype=jnp.float32)
        base = SideAdapterNetwork(batch_intra=False, **kw)
        dual = SideAdapterNetwork(batch_intra=True, **kw)
        params = base.init(jax.random.PRNGKey(0), cv, text)["params"]
        # perturb params off init so the comparison is non-trivial
        params = jax.tree_util.tree_map(
            lambda x: x + 0.1 * np.random.default_rng(1).standard_normal(
                x.shape).astype(x.dtype), params)
        out_a = base.apply({"params": params}, cv, text)
        out_b = dual.apply({"params": params}, cv, text)
        for a, b in zip(out_a, out_b):
            if a is None:
                assert b is None
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


def test_multi_reference_cascade_scan_fallback_matches_unroll():
    """K > unroll_limit switches multi_reference_cascade to lax.scan
    (bounded HLO for Versa-style tap lists); numerics must match the
    unrolled path exactly in structure, to fp32 tolerance in value."""
    import jax.numpy as jnp

    from iisan_tpu.ops.fused_san import multi_reference_cascade

    rng = np.random.default_rng(2)
    s, n, k, d, r = 2, 4, 12, 8, 4  # k=12 > default unroll_limit=8
    f32 = lambda *shape: jnp.asarray(rng.standard_normal(shape), jnp.float32)
    coef_a, coef_b = f32(s, k), f32(s, k)
    taps, wd, bd = f32(s, n, k, d), 0.1 * f32(s, k, d, r), 0.1 * f32(s, k, r)
    wu, bu, c0 = 0.1 * f32(s, k, r, d), 0.1 * f32(s, k, d), f32(s, n, d)
    args = (coef_a, coef_b, taps, wd, bd, wu, bu, c0)
    unrolled = multi_reference_cascade(*args, unroll_limit=k)
    scanned = multi_reference_cascade(*args)  # default limit 8 -> scan
    np.testing.assert_allclose(np.asarray(unrolled), np.asarray(scanned),
                               rtol=1e-5, atol=1e-6)

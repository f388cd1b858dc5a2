"""Decoupled intra-/inter-modal Side Adapter Network (the IISAN contribution).

One unified Flax module replaces the reference's three near-duplicate
``IISANAdaptedMModel`` classes:

- symmetric cached variant:  /root/reference/Code_Cached/model/model.py:257-349
- asymmetric (IISAN-Versa):  /root/reference/Code_Cached_Asym/model/model.py:257-429
- uncached variant:          /root/reference/Code_Uncached/model/model.py:166-271

The SAN consumes per-layer CLS hidden states of two frozen towers and runs a
cascade of gated bottleneck adapters:

    gate_i  = sigmoid(theta_i / 0.1)          (zero-init => gate starts at 0.5)
    fused_i = gate_i * tap_i + (1-gate_i) * carry
    carry   = Adapter_i(fused_i)              (down-proj -> act -> up-proj + res)

per modality (text-intra, image-intra) plus an accumulating inter branch

    mm      = MMAdapter_i(mm + g_i * cv_tap_i + (1-g_i) * text_tap_i)

IISAN-Versa extensions handled here:
  * group layer-dropping - when the two towers select different numbers of
    layers, the longer side runs its leading adapters alone first
    (asym model.py:353-378);
  * dimension-transform alignment - the wider modality's taps are projected
    down before inter fusion (asym model.py:280-285,406-411).

List-wiring note: Code_Uncached swaps ``side_adapter_vit_list`` /
``side_adapter_bert_list`` (SURVEY.md section 2.3); we implement the corrected
wiring of Code_Cached_Asym/model/model.py:266-270, which is what the
published benchmarks used.

TPU-first design: instead of receiving the full ``[layers+1, dim]`` cached
tensor and slicing 13 python-level views (reference model.py:301-302), the
module takes dense tap tensors of exactly the selected layers - the cache
loader gathers only those rows, cutting HBM traffic by ~2x for the default
config and ~10x for Llama-70B caches (81 layers, 7 selected).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import (AdapterBlock, TorchLinear, XavierLinear,
                      adapter_kernel_init)

GATE_TEMPERATURE = 0.1  # hard-coded in every reference variant (model.py:321)


class SideAdapterNetwork(nn.Module):
    """Unified symmetric/asymmetric IISAN side network.

    Inputs are "tap" tensors holding the selected hidden-state layers:
      text_states: (N, Kt + first, text_dim)
      cv_states:   (N, Kc + first, image_dim)
    where ``first`` is 1 when ``remove_first`` (position 0 then carries the
    embedding-layer state used as the cascade's initial carry,
    model.py:306-309) and 0 otherwise (carry starts at zeros,
    model.py:311-314).
    """

    embedding_dim: int
    text_dim: int = 768
    image_dim: int = 768
    num_text_taps: int = 7  # fusion-step count Kt (len of side list [+1])
    num_image_taps: int = 7  # Kc
    bert_down_size: int = 64
    cv_down_size: int = 64
    activation: str = "RELU"
    remove_first: bool = False
    gated: bool = True
    modality: str = "intra_inter"
    head_mode: str = "cached"  # "cached": fc(D->D)+pre_fc(D->emb); "asym": fc(D->emb)+pre_fc(emb->emb)
    use_pallas: bool = False  # fused TPU cascade kernel for intra branches
    batch_intra: bool = False  # run both intra cascades as one batched loop
    dtype: Optional[Any] = None

    def _gate(self, theta):
        return nn.sigmoid(theta / GATE_TEMPERATURE)

    @nn.compact
    def __call__(self, cv_states, text_states):
        dtype = self.dtype or text_states.dtype
        cv_states = cv_states.astype(dtype)
        text_states = text_states.astype(dtype)
        n = text_states.shape[0]
        kt, kc = self.num_text_taps, self.num_image_taps
        k_mm = min(kt, kc)
        diff_text, diff_cv = kt - k_mm, kc - k_mm
        mm_dim = min(self.text_dim, self.image_dim)

        intra = "intra" in self.modality
        inter = "inter" in self.modality

        if self.remove_first:
            carry_text = text_states[:, 0, :]
            carry_cv = cv_states[:, 0, :]
            text_taps = text_states[:, 1:, :]
            cv_taps = cv_states[:, 1:, :]
        else:
            carry_text = jnp.zeros((n, self.text_dim), dtype)
            carry_cv = jnp.zeros((n, self.image_dim), dtype)
            text_taps = text_states
            cv_taps = cv_states
        carry_mm = jnp.zeros((n, mm_dim), dtype)

        # Intra adapter stacks (model.py:271-274) as stacked (K, ...) weight
        # tensors - one parameter group per branch instead of K modules, so
        # the whole cascade is a single (optionally Pallas-fused) op.  Gates
        # (model.py:302-322); intra adapters/gates exist only when "intra"
        # in modality (model.py:270-272,283-291).
        def adapter_stack(name, k, d, r):
            return {
                "wd": self.param(f"{name}_wd", adapter_kernel_init, (k, d, r)),
                "bd": self.param(f"{name}_bd", nn.initializers.zeros, (k, r)),
                "wu": self.param(f"{name}_wu", adapter_kernel_init, (k, r, d)),
                "bu": self.param(f"{name}_bu", nn.initializers.zeros, (k, d)),
            }

        if intra:
            text_stack = adapter_stack("bert_adapter_list", kt,
                                       self.text_dim, self.bert_down_size)
            cv_stack = adapter_stack("cv_adapter_list", kc,
                                     self.image_dim, self.cv_down_size)
        if self.gated and intra:
            gates_text = self.param(
                "side_gate_params_text", nn.initializers.zeros, (kt,))
            gates_cv = self.param(
                "side_gate_params_cv", nn.initializers.zeros, (kc,))
        elif intra:
            gates_text = jnp.zeros((kt,), jnp.float32)
            gates_cv = jnp.zeros((kc,), jnp.float32)
        if inter:
            # The inter branch is gated regardless of fusion_method in every
            # reachable reference path (model.py:335-338 reads the gates
            # unconditionally), so the gates always exist here.
            # Bottleneck size: bert_adapter_down_size in the symmetric model
            # (Code_Cached model.py:274) and asym's equal/narrower-text
            # branches (asym model.py:287); cv_adapter_down_size only when
            # text is strictly wider (asym model.py:281-285).
            # Stacked (K, ...) weights like the intra branches, so the mm
            # cascade is the same single-op recurrence (the reference's
            # per-step AdapterBlock modules, model.py:275-277, differ only
            # in parameter grouping).
            mm_down = self.cv_down_size if self.text_dim > self.image_dim \
                else self.bert_down_size
            mm_stack = adapter_stack("mm_adapter_list", k_mm, mm_dim, mm_down)
            gates_mm = self.param(
                "side_gate_params_mm", nn.initializers.zeros, (k_mm,))
            if self.text_dim != self.image_dim:
                down_projects = [
                    TorchLinear(mm_dim, dtype=dtype, name=f"down_project_list_{i}")
                    for i in range(k_mm)
                ]

        from ..ops.fused_san import (cascade_coefs, fused_cascade,
                                     multi_reference_cascade,
                                     reference_cascade)

        # Inter-branch tap fusion (model.py:334-338 / asym model.py:398-417):
        # the gate mixes the two modalities' taps, after which the mm
        # recurrence ``c = Adapter(c + fused_tap)`` is the additive form of
        # the same cascade as the intra branches.  The K gate-mixes are one
        # vectorized op instead of a per-step Python loop.
        if inter:
            mm_text = text_taps[:, diff_text:, :]       # (N, K_mm, text_dim)
            mm_cv = cv_taps[:, diff_cv:, :]
            if self.text_dim > self.image_dim:
                mm_text = jnp.stack(
                    [down_projects[i](mm_text[:, i, :]) for i in range(k_mm)],
                    axis=1)
            elif self.image_dim > self.text_dim:
                mm_cv = jnp.stack(
                    [down_projects[i](mm_cv[:, i, :]) for i in range(k_mm)],
                    axis=1)
            g_mm = self._gate(gates_mm.astype(jnp.float32))      # (K_mm,)
            mm_taps = (g_mm[None, :, None] * mm_cv.astype(jnp.float32)
                       + (1.0 - g_mm)[None, :, None]
                       * mm_text.astype(jnp.float32)).astype(dtype)

        use_fused = intra and self.use_pallas and jax.default_backend() == "tpu"
        symmetric = (kt == kc and self.text_dim == self.image_dim
                     and self.bert_down_size == self.cv_down_size)
        tri = (self.batch_intra and intra and inter and symmetric
               and not use_fused and kt == k_mm
               and mm_down == self.bert_down_size)

        def stack_branches(key, stacks):
            return jnp.stack([s[key] for s in stacks]).astype(dtype)

        if tri:
            # All three branch cascades as ONE loop of (3, ...)-batched
            # matmuls (latency optimization; numerics per-branch identical).
            a_t, b_t = cascade_coefs(gates_text, self.gated)
            a_c, b_c = cascade_coefs(gates_cv, self.gated)
            ones = jnp.ones((k_mm,), jnp.float32)
            stacks = (text_stack, cv_stack, mm_stack)
            out3 = multi_reference_cascade(
                jnp.stack([a_t, a_c, ones]), jnp.stack([b_t, b_c, ones]),
                jnp.stack([text_taps, cv_taps, mm_taps]),
                stack_branches("wd", stacks), stack_branches("bd", stacks),
                stack_branches("wu", stacks), stack_branches("bu", stacks),
                jnp.stack([carry_text, carry_cv, carry_mm]),
                activation=self.activation)
            carry_text, carry_cv, carry_mm = out3[0], out3[1], out3[2]
        else:
            # Intra branches: each modality's full K-step cascade is ONE
            # op - the group-layer-drop "prefix" (asym model.py:361-378)
            # and the joint loop (model.py:318-332) are the same
            # recurrence for intra, so they fuse per branch; when the two
            # branches are symmetric they additionally batch into one.
            if intra and self.batch_intra and symmetric and not use_fused:
                a_t, b_t = cascade_coefs(gates_text, self.gated)
                a_c, b_c = cascade_coefs(gates_cv, self.gated)
                stacks = (text_stack, cv_stack)
                out2 = multi_reference_cascade(
                    jnp.stack([a_t, a_c]), jnp.stack([b_t, b_c]),
                    jnp.stack([text_taps, cv_taps]),
                    stack_branches("wd", stacks),
                    stack_branches("bd", stacks),
                    stack_branches("wu", stacks),
                    stack_branches("bu", stacks),
                    jnp.stack([carry_text, carry_cv]),
                    activation=self.activation)
                carry_text, carry_cv = out2[0], out2[1]
            elif intra:
                run = fused_cascade if use_fused else reference_cascade

                def cascade(gates, stack, taps, c0):
                    return run(gates, taps,
                               stack["wd"].astype(dtype),
                               stack["bd"].astype(dtype),
                               stack["wu"].astype(dtype),
                               stack["bu"].astype(dtype),
                               c0, activation=self.activation,
                               gated=self.gated)

                carry_text = cascade(gates_text, text_stack, text_taps,
                                     carry_text)
                carry_cv = cascade(gates_cv, cv_stack, cv_taps, carry_cv)
            if inter:
                # Additive-form cascade over the pre-fused taps (gates are
                # inside mm_taps; gated=False reads none).
                carry_mm = reference_cascade(
                    gates_mm, mm_taps,
                    mm_stack["wd"].astype(dtype), mm_stack["bd"].astype(dtype),
                    mm_stack["wu"].astype(dtype), mm_stack["bu"].astype(dtype),
                    carry_mm, activation=self.activation, gated=False)

        # Output heads.  cached: fc(D->D) then pre_fc(D->emb) where pre_fc is
        # the frozen tower's (trainable) classifier / title.fc
        # (model.py:340-346); asym: fc(D->emb) then pre_fc(emb->emb)
        # (asym model.py:263-264,292-294,420-427).
        emb_cv = emb_text = emb_mm = None
        if intra:
            if self.head_mode == "cached":
                t = TorchLinear(self.text_dim, dtype=dtype, name="fc_bert")(carry_text)
                c = TorchLinear(self.image_dim, dtype=dtype, name="fc_cv")(carry_cv)
                emb_text = TorchLinear(self.embedding_dim, dtype=dtype,
                                       name="bert_pre_fc")(t)
                # ViT classifier head is xavier-re-initialized (run.py:46-49).
                emb_cv = XavierLinear(self.embedding_dim, dtype=dtype,
                                      name="cv_pre_fc")(c)
            else:
                t = TorchLinear(self.embedding_dim, dtype=dtype, name="fc_bert")(carry_text)
                c = TorchLinear(self.embedding_dim, dtype=dtype, name="fc_cv")(carry_cv)
                emb_text = TorchLinear(self.embedding_dim, dtype=dtype,
                                       name="bert_pre_fc")(t)
                emb_cv = TorchLinear(self.embedding_dim, dtype=dtype,
                                     name="cv_pre_fc")(c)
        if inter:
            m = TorchLinear(mm_dim, dtype=dtype, name="fc_mm")(carry_mm)
            emb_mm = TorchLinear(self.embedding_dim, dtype=dtype,
                                 name="fc_mm_down")(m)
        return emb_cv, emb_text, emb_mm


def san_from_config(cfg, head_mode: Optional[str] = None) -> SideAdapterNetwork:
    """Build the SAN from an IISANConfig (see iisan_tpu/config.py)."""
    first = 1 if cfg.remove_first_bool else 0
    return SideAdapterNetwork(
        embedding_dim=cfg.embedding_dim,
        text_dim=cfg.text_embedding_dim if cfg.pipeline == "cached_asym" else cfg.word_embedding_dim,
        image_dim=cfg.image_embedding_dim,
        num_text_taps=len(cfg.san_text_taps()) - first,
        num_image_taps=len(cfg.san_image_taps()) - first,
        bert_down_size=cfg.bert_adapter_down_size,
        cv_down_size=cfg.cv_adapter_down_size,
        activation=cfg.adapter_activation,
        remove_first=cfg.remove_first_bool,
        gated=cfg.gated,
        modality=cfg.modality,
        head_mode=head_mode or ("asym" if cfg.pipeline == "cached_asym" else "cached"),
        use_pallas=cfg.use_pallas,
        batch_intra=getattr(cfg, "batch_intra_branches", False),
        dtype=jnp.dtype(cfg.compute_dtype),
    )

"""Structured configuration for the TPU-native IISAN framework.

One dataclass replaces the three near-identical argparse files of the
reference (``Code_Uncached/parameters.py``, ``Code_Cached/parameters.py``,
``Code_Cached_Asym/parameters.py``).  Every reference flag is preserved with
its exact name and default so that sweep commands written for the reference
CLI drive this framework unchanged (see ``iisan_tpu/cli.py``).

Reference: /root/reference/Code_Cached/parameters.py:4-99 and the asym deltas
at /root/reference/Code_Cached_Asym/parameters.py:29-75.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Tuple


def _parse_int_list(s: str) -> Tuple[int, ...]:
    s = s.strip()
    if not s:
        return ()
    return tuple(int(x) for x in s.split(","))


@dataclass
class IISANConfig:
    # ============== data_dir (parameters.py:7-14) ==============
    mode: str = "train"
    item_tower: str = "modal"
    root_data_dir: str = "../"
    dataset: str = "Dataset/Scientific"
    behaviors: str = "am_Industrial_and_Scientific_users.tsv"
    images: str = "Industrial_and_Scientific_items.tsv"
    lmdb_data: str = "image.lmdb"
    news: str = "Industrial_and_Scientific_items.tsv"

    # ============== train parameters (parameters.py:18-25) ==============
    batch_size: int = 64
    epoch: int = 1
    lr: float = 1e-4
    fine_tune_lr_image: float = 1e-4
    fine_tune_lr_text: float = 5e-5
    l2_weight: float = 0.0
    drop_rate: float = 0.1

    # ============== model parameters (parameters.py:28-42) ==============
    CV_model_load: str = "vit"
    freeze_paras_before: int = 0
    CV_resize: int = 224
    embedding_dim: int = 64
    num_attention_heads: int = 2
    transformer_block: int = 2
    max_seq_len: int = 10
    min_seq_len: int = 5
    arch: str = "sasrec"
    use_scale: str = "half"
    n_tokens: int = 10
    bert_model_load: str = "bert_base_uncased"
    word_embedding_dim: int = 768
    use_cls: bool = True

    # asym (IISAN-Versa) tower dims (Code_Cached_Asym/parameters.py:29-32)
    text_embedding_dim: int = 768
    image_embedding_dim: int = 768
    text_layers: int = 12
    image_layers: int = 12

    # ============== news information (parameters.py:45-49) ==============
    num_words_title: int = 30
    num_words_abstract: int = 50
    num_words_body: int = 50
    news_attributes: Tuple[str, ...] = ("title",)

    # ============== switch and logging (parameters.py:52-58) ==============
    num_workers: int = 4
    load_ckpt_name: str = "None"
    label_screen: str = "None"
    logging_num: int = 8
    testing_num: int = 1
    local_rank: int = -1
    pretrained_recsys_model: str = "None"

    # ============== adapters (parameters.py:61-83) ==============
    adapter_down_size: int = 16
    adding_adapter_to: str = "None"
    fine_tune_to: str = "all"
    adapter_cv_lr: float = 4e-4
    adapter_bert_lr: float = 1e-4
    bert_adapter_down_size: int = 64
    # declared-but-never-consumed in the reference too (Code_Cached/
    # parameters.py:69 has no reader in run.py) - accepted for CLI parity
    adapter_sasrec_lr: float = 1e-4
    cv_adapter_down_size: int = 64
    adapter_dropout_rate: float = 0.1
    adapter_activation: str = "RELU"
    finetune_layernorm: str = "None"
    is_serial: str = "True"
    adapter_type: str = "houslby"
    k_adapter_bert_list: Tuple[int, ...] = (0, 11)
    k_adapter_bert_hidden_dim: int = 384
    num_adapter_heads_sasrec: int = 2
    num_adapter_heads_bert: int = 12
    num_dnn: int = 0
    hypercomplex_division: int = 8
    phm_init_range: float = 1e-4

    # ============== side adapter network (parameters.py:88-96) ==============
    side_adapter_vit_list: str = "1,3,5,7,9,11"
    side_adapter_bert_list: str = "1,3,5,7,9,11"
    side_adapter_mm_list: str = "1,3,5,7,9,11"
    fusion_method: str = "gated"
    remove_first: str = "None"
    fusion_inter: str = "add"
    stored_vector_path: str = ""
    modality: str = "intra_inter"  # intra_inter | inter | other (intra only)
    seed: int = 12345

    # asym cached-store selection (Code_Cached_Asym/parameters.py:72-75)
    cached_image_model: str = "vit_outputs"
    cached_text_prefix: str = "bert"
    cached_image_prefix: str = "vit"
    cached_text_model: str = "bert_outputs"

    # ============== TPU-native extensions (no reference analog) ==============
    # Which pipeline variant to run; replaces the reference's three source
    # trees with one switch: Code_Uncached -> "uncached",
    # Code_Cached -> "cached", Code_Cached_Asym -> "cached_asym".
    pipeline: str = "cached"
    compute_dtype: str = "bfloat16"  # activations dtype under jit (AMP analog)
    eval_batch_size: int = 256
    mesh_shape: str = ""  # e.g. "data:8"; empty = all local devices on 1 axis
    # Fused Pallas SAN-cascade kernel (ops/fused_san.py).  Off by default:
    # measured on v5e (fwd+bwd, bf16, scripts/bench_pallas.py, r2):
    #   base    K7 D768  R64  N704: XLA 1.10 ms vs pallas 1.19 ms (0.92x)
    #   versa   K7 D8192 R64  N704: XLA 1.89 ms vs pallas 2.82 ms (0.67x)
    #   versa-R K7 D8192 R128 N704: XLA 2.52 ms vs pallas 3.47 ms (0.73x)
    # XLA pipelines the cascade's tiny matmuls across scan steps better
    # than the single-kernel grid at every shipped geometry, including the
    # Versa 8192-dim ones the streamed kernel targets - so the default
    # stays off at all geometries; the kernels remain correct (tested,
    # custom VJP) as an option and a base for future fusion work.
    use_pallas: bool = False
    # Run the two symmetric intra cascades as one (2, ...)-batched loop of
    # dot_generals (ops/fused_san.py::dual_reference_cascade): halves the
    # cascade's op count on the latency-bound cached step.  Interleaved
    # in-context A/B on v5e (5 epoch pairs, Scientific): 0.1557 s vs
    # 0.1603 s median epoch (~3%, at the edge of the ~±6% tunnel noise;
    # the op-count argument and 3/5 pairwise wins favor on).  Numerics
    # match the per-branch path to fp32 tolerance (test_san.py).
    batch_intra_branches: bool = True
    # Rematerialize tower layers in the uncached backward pass
    # (jax.checkpoint): trades recompute FLOPs for HBM headroom.
    # False | True (recompute the whole layer) | "mlp" (full remat
    # except the pre-GELU (B, T, 4D) MLP hidden, which is STORED so the
    # backward skips the MLP-up GEMM recompute — ~1/3 of a layer's
    # forward FLOPs — for ~0.4 GB/layer of storage).  MEASURED at the
    # FFT bs-32 geometry (FFT_ATTN_AB.json): "mlp" is a negative result
    # there — 544.5 ms / 12.4 GB vs full remat's 532.3 ms / 7.9 GB; the
    # stored hiddens' HBM round-trip costs more than the skipped
    # recompute buys.  Kept as a tested option for memory/geometry
    # regimes where the trade flips (bigger batches, cheaper HBM).
    remat_towers: Any = False
    # Fuse the training epoch, the catalog item-table build, and the valid
    # eval scan into ONE jitted dispatch per epoch (CachedTrainer).  Saves
    # two host->device dispatch round-trips per epoch and lets XLA overlap
    # the phases; numerics identical to run_epoch + evaluate_split.
    fused_epoch_eval: bool = True
    # lax.scan unroll factor for the cached epoch loop: >1 lets XLA overlap
    # the per-step gathers/updates across steps at the cost of compile time.
    epoch_scan_unroll: int = 1
    # Device residency of the cached tap tables (cached/cached_asym):
    # "none" keeps them in compute_dtype; "int8" quantizes per (item, tap)
    # row (ops/quant.py) — halves HBM residency and gather bandwidth vs
    # bf16, the scaling lever for IISAN-Versa's 8192-dim caches where the
    # tables (not the model) set the per-chip catalog ceiling.
    cache_quant: str = "none"
    # Execution dtype of the frozen uncached towers: "int8" runs every
    # tower matmul W8A8 on the MXU (2x the bf16 rate on v5e,
    # ops/int8_linear.py) with weights quantized once at graft time.
    # (A hand-fused one-pass kernel, ops/int8_pallas.py, was measured
    # and demoted: it loses to the XLA formulation at every tower
    # geometry incl. Versa's 8192-dim widths — INT8_IMPL_BENCH.json
    # sweep; kept in-tree as a tested negative result only.)
    # Requires towers_frozen() — jnp.rint's zero-derivative JVP would
    # silently zero tower gradients for methods that train the towers
    # (towers_from_config raises on the combination).
    tower_quant: str = "none"
    # Fused Pallas encoder attention in the uncached towers — ALL
    # methods since round 5: the kernel's backward replays the on-chip
    # dropout PRNG, so tower-training methods (FFT/LoRA/Houlsby/BitFit)
    # use it too (+34-50% throughput, FFT_ATTN_AB.json).  True = fused
    # MHA only (ops/fused_attention.py); "subblock"/"subblock_v2" = one
    # Pallas call per attention subblock: qkv proj + MHA + out proj
    # (ops/fused_attn_subblock.py; v2 = head-groups on the grid) —
    # these degrade to True when the towers train (no trainable-weight
    # bwd); False = plain XLA.  Measured verdict
    # (VIT_BLOCK_VARIANTS.json + BERT_ATTN_VARIANTS.json, v5e): both
    # subblock layouts lose at BOTH tower geometries (v1 -3.7% / v2
    # -15% ViT-base; -11..-13% BERT), pinning the composition tax as a
    # floor — the default stays True; the values remain accepted as
    # tested, numerics-identical negative results.
    fused_tower_attention: Any = True
    # Fused Pallas SASRec user-encoder kernels (ops/fused_user_encoder.py).
    # True = auto (kernel on TPU for supported shapes, module path elsewhere);
    # False = always the module path.  Unlike the SAN cascade (where XLA
    # wins, see use_pallas above), the user tower is tiny-shape op soup
    # where one kernel per direction beats ~200 XLA ops - see the measured
    # numbers in ops/fused_user_encoder.py.
    fused_user_encoder: bool = True
    # Tower dropout override: <0 keeps the HF defaults (BERT hidden/attn
    # 0.1, ViT 0.0 — the reference runs its frozen towers un-eval()ed, so
    # BERT dropout IS active during uncached training); >=0 forces the
    # rate.  0.0 makes the uncached forward deterministic — required for
    # the cached==uncached equivalence test and useful for debugging.
    tower_dropout: float = -1.0
    # PROCESS-WIDE JAX PRNG implementation (jax_default_prng_impl):
    # "threefry2x32" is JAX's default software counter PRNG; "rbg"
    # lowers to XLA RngBitGenerator over the TPU hardware RNG.  The
    # motivating consumer is dropout-mask generation in the uncached
    # train step, but the setting governs EVERY key created after
    # run_from_config applies it — weight init, the trainer rng chain,
    # the ID pipeline — so "rbg" changes the full training trajectory,
    # not just the masks (ADVICE r4).  It also changes the checkpointed
    # rng_key format (threefry (2,) vs rbg (4,) uint32): RESUMING A
    # CHECKPOINT REQUIRES THE SAME dropout_prng IT WAS WRITTEN UNDER
    # (restore raises a shape mismatch otherwise).  Dropout masks are
    # stochastic by definition — the impl changes which draws occur, not
    # the semantics; per-seed determinism holds within one impl.
    # Measured on v5e (PRNG_IMPL_AB.json, bs 32 train-mode tower
    # forward): rbg 132.1 ms vs threefry 135.7 ms — recovers 3.6 of the
    # ~4.7 ms/step dropout tax (UNCACHED_FLOOR.json).  Default stays
    # threefry2x32 so runs are reproducible against prior rounds and
    # across platforms; set "rbg" to bank the ~2.6% step win.
    dropout_prng: str = "threefry2x32"
    log_dir: str = "./logs"
    ckpt_dir: str = "./checkpoints"
    # Persist epoch checkpoints on new best / every 10th epoch, process 0
    # (the reference always saves in train mode, Code_Cached/run.py:402-405).
    save_checkpoints: bool = True
    # Non-empty: after training, export a serving artifact (fused item
    # table + user-encoder params, serve.Recommender.save) to this path.
    # No reference equivalent - its evaluation doubles as inference.
    export_recommender: str = ""
    # Multi-host launch (torchrun/NCCL-init analog, run.py:479 +
    # scripts/run_IISAN.py:68): one process per host passes its rank; empty
    # coordinator = single-process / TPU auto-bootstrap.
    dist_coordinator: str = ""
    dist_num_processes: int = 0
    dist_process_id: int = -1
    early_stop_patience: int = 10  # hard-coded `> 10` at Code_Cached/run.py:458

    # ------------------------------------------------------------------
    # Derived SAN geometry.
    # ------------------------------------------------------------------
    def san_text_taps(self) -> Tuple[int, ...]:
        """Absolute hidden-state indices fused by the text branch.

        Mirrors Code_Cached_Asym/model/model.py:265-270 (the *corrected*
        list wiring; Code_Uncached swaps the vit/bert list names, see
        SURVEY.md section 2.3 - we implement the corrected semantics that the
        published cached benchmarks used).

        Both branches need hidden-state row 0: as fusion tap #0 when
        ``remove_first`` is off ([0]+[i+1...], model.py:269), or as the
        cascade's initial carry when on (model.py:335-337).  The returned
        tuple is exactly the set of cache rows the data loader must gather.
        """
        lst = _parse_int_list(self.side_adapter_bert_list)
        return (0,) + tuple(i + 1 for i in lst)

    def san_image_taps(self) -> Tuple[int, ...]:
        lst = _parse_int_list(self.side_adapter_vit_list)
        return (0,) + tuple(i + 1 for i in lst)

    @property
    def remove_first_bool(self) -> bool:
        return self.remove_first == "TRUE"

    def is_iisan(self) -> bool:
        """IISAN adapter method selected (run.py:214's string dispatch).

        Single source of truth for BOTH the uncached model choice
        (build_uncached_model) and the frozen-tower-only fused-attention
        gate (towers_from_config): the fused kernel's VJP raises under
        active dropout, which is safe exactly when the towers are frozen
        — i.e. for this predicate (ADVICE r1: keep the two in lockstep).
        """
        return "IISAN" in self.adapter_type and self.adding_adapter_to != "None"

    def towers_frozen(self) -> bool:
        """Uncached-IISAN towers are stop-gradient-frozen UNLESS the user
        passes fine_tune_to='all' — the reference's `pass` branch
        (run.py:177-178) leaves tower requires_grad True there, so the
        towers genuinely train — or finetune_layernorm, which re-enables
        tower LayerNorm params (run.py:281-285): those grads must flow
        through the tower backward, so the tap stop_gradient would
        silently zero them (the optimizer mask still restricts updates
        to the LN params).  Gates both the model's tap stop_gradient
        and the fused-attention kernel (whose dropout-mode VJP raises —
        safe only when no gradient reaches the towers)."""
        return (self.is_iisan() and "all" not in self.fine_tune_to
                and "None" in self.finetune_layernorm)

    @property
    def gated(self) -> bool:
        return self.fusion_method == "gated"

    # -------- multi-attribute text packing (preprocess.py:153-194,
    # encoders.py:116-136: fixed title -> abstract -> body block order) ----
    def active_text_attributes(self) -> Tuple[str, ...]:
        return tuple(a for a in ("title", "abstract", "body")
                     if a in self.news_attributes)

    def attr_num_words(self) -> Tuple[int, ...]:
        words = {"title": self.num_words_title,
                 "abstract": self.num_words_abstract,
                 "body": self.num_words_body}
        return tuple(words[a] for a in self.active_text_attributes())

    def packed_text_width(self) -> int:
        """Total width of the packed [ids|mask]*attrs text row
        (Bert_Encoder.attributes2length, encoders.py:120-124)."""
        return sum(2 * w for w in self.attr_num_words())

    @property
    def text_num_hidden(self) -> int:
        """Rows of the per-item cached text tensor (= layers + embeddings)."""
        return self.text_layers + 1

    @property
    def image_num_hidden(self) -> int:
        return self.image_layers + 1

    def replace(self, **kw) -> "IISANConfig":
        return dataclasses.replace(self, **kw)

    def __post_init__(self):
        if isinstance(self.news_attributes, str):
            self.news_attributes = tuple(self.news_attributes.split(","))
        if isinstance(self.k_adapter_bert_list, str):
            self.k_adapter_bert_list = _parse_int_list(self.k_adapter_bert_list)

    def with_bert_dims(self) -> "IISANConfig":
        """Couple word_embedding_dim to the BERT size the way the trainer
        does (Code_Cached/run.py:64-78).  Called by the CLI, not by
        __post_init__, so programmatic configs can set dims freely."""
        dim = {"tiny": 128, "mini": 256, "medium": 512,
               "large": 1024, "base": 768}
        for key, d in dim.items():
            if key in self.bert_model_load:
                return self.replace(word_embedding_dim=d)
        return self

"""Build hidden-state caches for a dataset: the preprocess_vectors.py /
Versa-builders entry point.

Covers the reference's cache-builder family (SURVEY.md section 2.1 #15/#16):
  bert-base + vit-base (Code_Cached/preprocess_vectors.py)
  bert-large / vit-large / vit-huge / vit-tiny (Code_Cached_Asym/preprocess_*)
  Llama-style mean-pooled text states (preprocess_llama-3-70b_*.py) via
  --pool mean

Weights load from HuggingFace through torch (cpu) and are converted into
the Flax towers; the forward passes then run jitted on TPU.

    iisan-tpu-build-caches --dataset /root/reference/Dataset/Scientific \
        --items Industrial_and_Scientific_items.tsv \
        --behaviors am_Industrial_and_Scientific_users.tsv \
        --text-model bert-base-uncased --image-model google/vit-base-patch16-224 \
        --image-source ./images_dir --out ./stored_vectors_sci

(also runnable as ``python scripts/build_caches.py`` from a checkout)
"""

import argparse
import os


def shard_range(n_rows: int, shard_id: int, num_shards: int):
    """This shard's [lo, hi) slice of the item rows [1, n_rows).

    Row 0 is the padding item (always zeros, created with the store), so
    shards split rows 1..n_rows-1 into contiguous ceil-sized ranges; the
    last shard(s) may be short or empty when num_shards > n_rows-1.
    ``hi=None`` (the unsharded case) means "to the end, plain resume
    semantics"."""
    if num_shards == 1:
        return 1, None
    per = -(-(n_rows - 1) // num_shards)
    lo = min(1 + shard_id * per, n_rows)
    hi = min(1 + (shard_id + 1) * per, n_rows)
    return lo, hi


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset")
    ap.add_argument("--items")
    ap.add_argument("--behaviors")
    ap.add_argument("--text-model", default="bert-base-uncased")
    ap.add_argument("--image-model", default="google/vit-base-patch16-224")
    ap.add_argument("--text-arch", default="bert", choices=["bert", "llama"],
                    help="llama = RMSNorm/rotary/SwiGLU decoder tower, the "
                         "Llama-3-70B Versa path (mean-pooled, no mask - "
                         "preprocess_llama-3-70b_micro.py)")
    ap.add_argument("--image-arch", default="vit",
                    choices=["vit", "clip", "eva"],
                    help="clip = CLIP-family vision tower; eva = EVA "
                         "architecture (2D RoPE, SwiGLU/sub-LN, bias-free "
                         "k) - the EVA-CLIP-18B Versa path "
                         "(process_eva_clip_vectors.py). eva expects "
                         "--image-model to be a local dir with config.json "
                         "(vision fields) + pytorch_model.bin in the "
                         "public baaivision/EVA eva_clip state-dict naming")
    ap.add_argument("--image-source", default="",
                    help="LMDB path or image directory; synthetic if empty")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pool", default="cls", choices=["cls", "mean"],
                    help="mean = Llama-style per-layer token mean "
                         "(preprocess_llama-3-70b_micro.py:67-70)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--num-words-title", type=int, default=30)
    ap.add_argument("--resize", type=int, default=224)
    ap.add_argument("--max-seq-len", type=int, default=10)
    ap.add_argument("--min-seq-len", type=int, default=5)
    ap.add_argument("--dtype", default="float16",
                    help="on-disk store dtype; 'int8' quantizes per "
                         "(item, layer) row with a fp32 scale sidecar "
                         "(half the disk/RAM of fp16; load_taps then "
                         "feeds the trainer pre-quantized QuantTaps)")
    ap.add_argument("--num-shards", type=int, default=1,
                    help="split the catalog into N contiguous row ranges, "
                         "one builder process per shard. Same-host "
                         "processes share one store directly (atomic "
                         "create, disjoint rows); processes on DIFFERENT "
                         "hosts must add --shard-files (mmap page "
                         "writeback from two hosts' page caches would "
                         "clobber shard-boundary pages in a shared file)")
    ap.add_argument("--shard-id", type=int, default=0)
    ap.add_argument("--shard-files", action="store_true",
                    help="write this shard's rows into its own "
                         "<store>.shard<i> directory (multi-host safe); "
                         "run --finalize-shards once afterwards to merge")
    ap.add_argument("--finalize-shards", action="store_true",
                    help="merge all <store>.shard* directories under "
                         "--out into final stores and delete them "
                         "(run once, after every shard finished)")
    args = ap.parse_args(argv)
    if not (0 <= args.shard_id < args.num_shards):
        ap.error(f"--shard-id {args.shard_id} out of range for "
                 f"--num-shards {args.num_shards}")

    if args.finalize_shards:
        import glob

        from iisan_tpu.data.cache_store import merge_shard_stores

        bases = sorted({p.rsplit(".shard", 1)[0]
                        for p in glob.glob(os.path.join(args.out, "*.shard*"))
                        if os.path.isdir(p)})
        if not bases:
            ap.error(f"--finalize-shards: no *.shard* stores under {args.out}")
        for base in bases:
            st = merge_shard_stores(base)
            print(f"merged {base}: {st.meta.n_items} items x "
                  f"{st.meta.n_layers} layers x {st.meta.dim} dim")
        return
    for flag in ("dataset", "items", "behaviors"):
        if getattr(args, flag) is None:
            ap.error(f"--{flag} is required (unless --finalize-shards)")

    from transformers import AutoConfig, AutoModel, AutoTokenizer

    from iisan_tpu.cache_builder import (build_image_cache, build_text_cache,
                                         verify_cache)
    from iisan_tpu.data import preprocess as prep
    from iisan_tpu.data.images import (DirImageStore, HAS_LMDB,
                                       LmdbImageStore, SyntheticImageStore,
                                       is_lmdb_path)
    from iisan_tpu.models import bert as jbert
    from iisan_tpu.models import vit as jvit
    from iisan_tpu.utils.logging import setup_logger

    setup_logger(os.path.join(args.out, "logs"), "cache_build")

    titles, n2i, i2n = prep.read_items(os.path.join(args.dataset, args.items))
    corpus = prep.read_behaviors(os.path.join(args.dataset, args.behaviors),
                                 n2i, i2n, args.max_seq_len, args.min_seq_len)

    def my_range(n_rows):
        return shard_range(n_rows, args.shard_id, args.num_shards)

    def shard_dest(base_path, n_rows, lo, hi):
        """(store path, range to record) for this build: shard-files mode
        writes an own .shard<i> store plus its range.json."""
        if not args.shard_files:
            return base_path, None
        return (base_path + f".shard{args.shard_id}",
                (lo, n_rows if hi is None else hi))

    # ---- text tower -------------------------------------------------
    tok = AutoTokenizer.from_pretrained(args.text_model)
    hf_cfg = AutoConfig.from_pretrained(args.text_model)
    hf_text = AutoModel.from_pretrained(args.text_model)
    if args.text_arch == "llama":
        from iisan_tpu.models import llama as jllama

        # Reference Llama builders: encode + manual 0-pad, all-ones mask,
        # mean-pool over all tokens (preprocess_llama-3-70b_micro.py:58-70).
        full_tokens = prep.tokenize_titles_llama(titles, tok,
                                                 args.num_words_title)
        text_enc = jllama.encoder_from_hf_config(hf_cfg)
        text_params = jllama.params_from_hf_torch(
            hf_text.state_dict(), num_layers=hf_cfg.num_hidden_layers,
            prefix="")
        pool, out_name = "mean", "llama_outputs.memmap"
    else:
        full_tokens = prep.tokenize_titles(titles, tok, args.num_words_title)
        text_enc = jbert.BertEncoder(
            vocab_size=hf_cfg.vocab_size, hidden_dim=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            intermediate_dim=hf_cfg.intermediate_size,
            max_position=hf_cfg.max_position_embeddings, dropout=0.0)
        text_params = jbert.params_from_hf_torch(
            hf_text.state_dict(), num_layers=hf_cfg.num_hidden_layers)
        pool, out_name = args.pool, "bert_outputs.memmap"
    tokens = prep.remap_token_table(full_tokens, corpus.item_names, n2i)
    lo, hi = my_range(tokens.shape[0])
    text_path, rng = shard_dest(os.path.join(args.out, out_name),
                                tokens.shape[0], lo, hi)
    store = build_text_cache(text_enc, text_params, tokens, text_path,
                             batch=args.batch, pool=pool,
                             dtype=args.dtype, start_item=lo, end_item=hi)
    verify_cache(store, hf_cfg.num_hidden_layers + 1, hf_cfg.hidden_size,
                 first_row=lo)
    if rng:
        from iisan_tpu.data.cache_store import write_shard_range

        write_shard_range(text_path, *rng)

    # ---- image tower ------------------------------------------------
    if args.image_arch == "eva":
        # EVA ships as trust-remote-code upstream; offline we consume a
        # local dir: config.json (vision geometry fields, optionally under
        # "vision_config") + pytorch_model.bin in the EVA public naming.
        import json as _json

        import torch as _torch

        from iisan_tpu.models import eva as jeva

        with open(os.path.join(args.image_model, "config.json")) as f:
            raw = _json.load(f)
        vraw = raw.get("vision_config", raw)
        from types import SimpleNamespace

        hf_vcfg = SimpleNamespace(**vraw)
        vit = jeva.encoder_from_hf_config(hf_vcfg)
        sd = _torch.load(os.path.join(args.image_model, "pytorch_model.bin"),
                         map_location="cpu", weights_only=True)
        vit_params = jeva.params_from_eva_torch(
            sd, num_layers=hf_vcfg.num_hidden_layers,
            prefix=vraw.get("state_dict_prefix", ""),
            sub_ln=getattr(hf_vcfg, "subln", True))
    elif args.image_arch == "clip":
        from iisan_tpu.models import clip_vit as jclip

        hf_vcfg = AutoConfig.from_pretrained(args.image_model)
        hf_vit = AutoModel.from_pretrained(args.image_model)
        vcfg = getattr(hf_vcfg, "vision_config", hf_vcfg)
        vit = jclip.encoder_from_hf_config(vcfg)
        vit_params = jclip.params_from_hf_torch(
            hf_vit.state_dict(), num_layers=vcfg.num_hidden_layers)
        hf_vcfg = vcfg
    else:
        hf_vcfg = AutoConfig.from_pretrained(args.image_model)
        hf_vit = AutoModel.from_pretrained(args.image_model)
        vit = jvit.ViTEncoder(
            image_size=args.resize, patch_size=hf_vcfg.patch_size,
            hidden_dim=hf_vcfg.hidden_size,
            num_layers=hf_vcfg.num_hidden_layers,
            num_heads=hf_vcfg.num_attention_heads,
            intermediate_dim=hf_vcfg.intermediate_size)
        vit_params = jvit.params_from_hf_torch(
            hf_vit.state_dict(), num_layers=hf_vcfg.num_hidden_layers,
            prefix="")

    # LMDB sources: a data file, or the directory form (data.mdb inside);
    # only a plain directory of JPEGs routes to DirImageStore
    if is_lmdb_path(args.image_source) and HAS_LMDB:
        img_store = LmdbImageStore(args.image_source, args.resize)
    elif args.image_source and os.path.isdir(args.image_source):
        img_store = DirImageStore(args.image_source, args.resize)
    else:
        print("WARNING: no image source - writing synthetic image states")
        img_store = SyntheticImageStore(args.resize)
    # eva writes eva_clip_outputs.memmap: that is the cached_image_model
    # name the shipped Versa eva preset consumes (scripts/run_IISAN_versa.py,
    # mirroring reference process_eva_clip_vectors.py's prefix), so builder
    # output feeds the preset without a rename.
    img_out = {"clip": "clip_outputs.memmap",
               "eva": "eva_clip_outputs.memmap"}.get(args.image_arch,
                                                     "vit_outputs.memmap")
    lo, hi = my_range(len(corpus.item_names))
    img_path, rng = shard_dest(os.path.join(args.out, img_out),
                               len(corpus.item_names), lo, hi)
    store = build_image_cache(vit, vit_params, corpus.item_names, img_store,
                              img_path,
                              resize=args.resize, batch=args.batch,
                              dtype=args.dtype, start_item=lo, end_item=hi)
    verify_cache(store, hf_vcfg.num_hidden_layers + 1, hf_vcfg.hidden_size,
                 first_row=lo)
    if rng:
        from iisan_tpu.data.cache_store import write_shard_range

        write_shard_range(img_path, *rng)
    print("caches written to", args.out)


if __name__ == "__main__":
    main()

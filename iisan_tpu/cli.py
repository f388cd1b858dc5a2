"""Command-line interface: the ``run.py`` + ``parameters.py`` surface.

Every flag of the three reference argparse files
(/root/reference/Code_{Uncached,Cached,Cached_Asym}/parameters.py) is
accepted under its exact name, so sweep commands written for the reference
drive this framework after swapping the script path.  One extra flag,
``--pipeline {cached,uncached,cached_asym,id}``, replaces "which source
tree you ran" (the reference's variant selection mechanism).

Usage:
    python -m iisan_tpu.cli --pipeline cached --dataset Dataset/Scientific \
        --behaviors am_Industrial_and_Scientific_users.tsv ...
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

from .config import IISANConfig


def build_parser() -> argparse.ArgumentParser:
    # allow_abbrev=False: parse_config detects an explicit --compute_dtype
    # by scanning argv (to decide whether --use_scale may override it);
    # prefix abbreviations would defeat that scan.
    p = argparse.ArgumentParser(description="iisan_tpu trainer",
                                allow_abbrev=False)
    defaults = IISANConfig()
    skip = {"news_attributes", "k_adapter_bert_list"}
    for f in dataclasses.fields(IISANConfig):
        if f.name in skip:
            continue
        default = getattr(defaults, f.name)
        if isinstance(default, bool):
            p.add_argument(f"--{f.name}", type=lambda v: v.lower() in
                           ("1", "true", "yes"), default=default)
        else:
            p.add_argument(f"--{f.name}", type=type(default), default=default)
    # string-list flags keep reference string form (parameters.py:49,76)
    p.add_argument("--news_attributes", type=str, default="title")
    p.add_argument("--k_adapter_bert_list", type=str, default="0,11")
    return p


def parse_config(argv=None) -> IISANConfig:
    argv = list(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(argv)
    cfg = IISANConfig(**vars(args))
    # --use_scale is the reference's AMP switch ('half' -> GradScaler,
    # Code_Cached/run.py:355).  Our AMP analog is bf16 activations (the
    # default); a non-'half' use_scale means full-precision training, so
    # map it to fp32 activations unless --compute_dtype was given
    # explicitly.
    explicit_dtype = any(a.startswith("--compute_dtype") for a in argv)
    if "half" not in cfg.use_scale and not explicit_dtype:
        cfg = cfg.replace(compute_dtype="float32")
    from .train.pipelines import validate_config

    validate_config(cfg)
    return cfg.with_bert_dims()


def main(argv=None) -> int:
    cfg = parse_config(argv)
    from .parallel.distributed import initialize_runtime
    from .train.pipelines import run_from_config
    from .utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_runtime(
        coordinator_address=cfg.dist_coordinator or None,
        num_processes=cfg.dist_num_processes or None,
        process_id=cfg.dist_process_id if cfg.dist_process_id >= 0 else None)

    if "train" in cfg.mode:
        run_from_config(cfg)
        return 0
    elif "test" in cfg.mode:
        run_from_config(cfg, eval_only=True)
        return 0
    raise SystemExit(f"unknown mode {cfg.mode}")


if __name__ == "__main__":
    sys.exit(main())

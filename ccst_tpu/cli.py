"""ccst-tpu — one CLI for the whole framework.

The reference spreads its pipeline over six per-stage scripts with drifting
argparse flags (SURVEY.md §5.6). Here every stage is a subcommand over the
shared typed config:

  python -m ccst_tpu.cli style-bank   --dataset pacs --domain art_painting ...
  python -m ccst_tpu.cli stylize      --dataset pacs --target photo --mode overall ...
  python -m ccst_tpu.cli reorganize   --dataset pacs --target photo --mode overall ...
  python -m ccst_tpu.cli gen-lists    --dataset pacs --target photo --k 3 ...
  python -m ccst_tpu.cli amp-bank     --dataset pacs --domain photo ...
  python -m ccst_tpu.cli fed-train    --dataset pacs --target photo --mode fedavg ...
  python -m ccst_tpu.cli fed-test     --dataset pacs --target photo --checkpoint best
  python -m ccst_tpu.cli invert-train --dataset pacs --source art_painting ...
  python -m ccst_tpu.cli invert-eval  --dataset pacs --source art_painting ...
  python -m ccst_tpu.cli bench

Stage pipelining for a full CCST run (reference README.md:24-44):
  style-bank (per domain) -> stylize (per target) -> reorganize -> gen-lists
  -> fed-train.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from dataclasses import fields
from typing import Any, Optional

import numpy as np


def _add_dataclass_args(parser: argparse.ArgumentParser, cls, skip=()) -> None:
    for f in fields(cls):
        if f.name in skip:
            continue
        arg = "--" + f.name.replace("_", "-")
        if f.type in ("bool", bool):
            parser.add_argument(arg, action="store_true", default=f.default)
        else:
            caster = type(f.default) if f.default is not None else str
            parser.add_argument(arg, type=caster, default=f.default)


def _dataclass_from_args(cls, args, **overrides) -> Any:
    kw = {}
    for f in fields(cls):
        if hasattr(args, f.name):
            kw[f.name] = getattr(args, f.name)
    kw.update(overrides)
    return cls(**kw)


def _load_engine_params(args):
    import jax

    from ccst_tpu.models import vgg
    from ccst_tpu.models.convert import load_decoder, load_encoder

    if getattr(args, "vgg_weights", ""):
        enc = load_encoder(args.vgg_weights)
    else:
        print("[warn] no --vgg-weights given; using random encoder init")
        enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    if getattr(args, "decoder_weights", ""):
        dec = load_decoder(args.decoder_weights)
    else:
        print("[warn] no --decoder-weights given; using random decoder init")
        dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH)
    return enc, dec


# ---------------------------------------------------------------------------
# subcommands
# ---------------------------------------------------------------------------


def cmd_style_bank(args) -> int:
    from ccst_tpu.config import StylizeConfig, dataset_spec

    cfg = _dataclass_from_args(StylizeConfig, args)
    enc, _ = _load_engine_params(args)
    domains = (
        [args.domain] if args.domain else list(dataset_spec(cfg.dataset).domains)
    )
    from ccst_tpu.pipeline.style_bank import compute_style_bank

    for domain in domains:
        mean, std = compute_style_bank(cfg, domain, encoder_params=enc)
        print(f"{domain}: bank mean|std norms = {np.linalg.norm(mean):.3f} | "
              f"{np.linalg.norm(std):.3f}")
    return 0


def _load_scales_for(cfg, enc=None, dec=None):
    """Resolve the int8 calibration artifact for a stylize run: an explicit
    ``--scales PATH`` must exist; with no flag, the `calibrate` subcommand's
    default path is picked up automatically when present (so
    calibrate-then-stylize is deterministic without extra flags).

    When the engine weights are given, the artifact's weights fingerprint is
    checked (vgg_fast.weights_fingerprint): an explicit ``--scales`` that
    belongs to different weights is an error; a stale auto-pickup is skipped
    with a warning (the engine then self-calibrates) — either way, stale
    clipping ranges are never applied silently."""
    if cfg.engine not in ("int8-static", "int8-fused"):
        return None
    from ccst_tpu.models.vgg_fast import load_scales, weights_fingerprint
    from ccst_tpu.pipeline.stylize import scales_path_for

    fp = ""
    if enc is not None and dec is not None:
        fp = weights_fingerprint(enc, dec)
    if cfg.scales:
        return load_scales(cfg.scales, expect_fingerprint=fp)
    default = scales_path_for(cfg)
    if os.path.exists(default):
        try:
            scales = load_scales(default, expect_fingerprint=fp)
        except ValueError as e:
            print(f"[warn] ignoring stale calibration: {e}")
            return None
        print(f"[info] loading int8 calibration from {default}")
        return scales
    return None


def _env_int(name: str) -> int:
    raw = os.environ.get(name, "").strip()
    if not raw:
        return 0
    try:
        return int(raw)
    except ValueError:
        raise SystemExit(f"{name}={raw!r} is not an integer")


def _multiproc_requested(coordinator: str, num_procs: int) -> bool:
    """True when a multi-process launch is requested via flags or the
    CCST_COORDINATOR / CCST_NUM_PROCS env equivalents
    (multihost.initialize:40-50).

    A bare CCST_PROC_ID with no coordinator/world size does NOT count: it is
    most likely stale shell state, and jax.distributed.initialize(None,
    None, 0) fails outside TPU-pod auto-detection anyway."""
    return bool(
        coordinator
        or num_procs > 1
        or os.environ.get("CCST_COORDINATOR")
        or _env_int("CCST_NUM_PROCS") > 1
    )


def _maybe_init_multiproc(coordinator: str, num_procs: int, proc_id: int) -> bool:
    """Join the jax.distributed cluster when requested; returns whether it
    did. Must run BEFORE any backend use."""
    if not _multiproc_requested(coordinator, num_procs):
        return False
    from ccst_tpu.parallel import multihost

    multihost.initialize(
        coordinator_address=coordinator or None,
        num_processes=num_procs if num_procs > 0 else None,
        process_id=proc_id if proc_id >= 0 else None,
    )
    return True


def cmd_calibrate(args) -> int:
    """Compute and persist int8-static activation scales (deterministic:
    first N train-list images + the style banks — pipeline/stylize.py
    run_calibration documents the selection)."""
    import jax.numpy as jnp

    from ccst_tpu.config import StylizeConfig
    from ccst_tpu.pipeline.stylize import StylizeEngine, run_calibration

    cfg = _dataclass_from_args(StylizeConfig, args)
    enc, dec = _load_engine_params(args)
    engine = StylizeEngine(
        enc, dec, dtype=jnp.dtype(cfg.dtype),
        # only the static engines have persistable scales (the dynamic
        # "int8" engine self-scales per batch and calibrate() would no-op)
        engine=cfg.engine if cfg.engine in ("int8-static", "int8-fused")
        else "int8-static",
    )
    # --scales doubles as the output path here (stylize --scales then
    # reads the same artifact); default: next to the style banks
    path = run_calibration(
        cfg, engine, max_images=args.max_images, out_path=cfg.scales
    )
    print(json.dumps({"scales_path": path, "n_scales": len(engine.scales)}))
    return 0


def cmd_stylize(args) -> int:
    import jax.numpy as jnp

    from ccst_tpu.config import StylizeConfig
    from ccst_tpu.pipeline.stylize import (
        StylizeEngine,
        run_overall_transfer,
        run_single_transfer,
    )

    cfg = _dataclass_from_args(StylizeConfig, args)
    enc, dec = _load_engine_params(args)
    scales = _load_scales_for(cfg, enc, dec)
    engine = StylizeEngine(
        enc, dec, dtype=jnp.dtype(cfg.dtype), output_size=cfg.output_size,
        output_u8=True,  # quantize on device: 4x less device->host traffic
        engine=cfg.engine, scales=scales,
    )
    run = run_single_transfer if cfg.mode.lower() == "single" else run_overall_transfer
    report = run(cfg, engine)
    print(
        json.dumps(
            {
                "target": report.target,
                "styles": report.styles,
                "images_per_style": report.images,
                "seconds": round(report.seconds, 2),
                "images_per_sec": round(report.images_per_sec, 2),
            }
        )
    )
    return 0


def cmd_reorganize(args) -> int:
    from ccst_tpu.data.lists import reorganize_unified_tree

    n = reorganize_unified_tree(
        args.list_root, args.dataset, args.target, args.mode,
        style_family=args.style, link=not args.copy,
        data_root=args.data_root, save_ext=args.save_ext,
    )
    print(f"placed {n} files in the unified tree for target={args.target}")
    return 0


def cmd_gen_lists(args) -> int:
    from ccst_tpu.config import FusionConfig
    from ccst_tpu.data.lists import generate_k_lists

    cfg = _dataclass_from_args(FusionConfig, args)
    written = generate_k_lists(
        args.list_root, cfg.dataset, cfg.target, cfg.k,
        mode=cfg.mode, style_family=cfg.style, seed=cfg.seed,
        save_ext=cfg.save_ext,
    )
    for client, path in written.items():
        print(f"{client}: {path}")
    return 0


def cmd_amp_bank(args) -> int:
    from ccst_tpu.pipeline.amp_bank import compute_amp_bank

    n = compute_amp_bank(
        list_root=args.list_root,
        data_root=args.data_root,
        dataset=args.dataset,
        domain=args.domain,
        image_size=args.image_size,
        out_root=args.out_root or args.list_root,
    )
    print(f"wrote {n} amplitude spectra for {args.domain}")
    return 0


def cmd_fed_train(args) -> int:
    from ccst_tpu.config import FedConfig

    cfg = _dataclass_from_args(FedConfig, args)
    if cfg.mode.lower() == "deepall" and _multiproc_requested(
        cfg.coordinator, cfg.num_procs
    ):
        raise SystemExit(
            "--mode deepall pools every source into ONE pseudo-client and "
            "cannot be split across processes; run it single-host"
        )
    # join the jax.distributed cluster BEFORE any backend use
    multiproc = _maybe_init_multiproc(cfg.coordinator, cfg.num_procs, cfg.proc_id)
    amp_bank = None
    if cfg.dg_method.lower() == "feddg":
        from ccst_tpu.pipeline.amp_bank import load_amp_bank

        amp_bank = load_amp_bank(
            args.list_root, cfg.dataset, cfg.source_domains, max_per_domain=64
        )
    if multiproc:
        from ccst_tpu.federated.multihost_runtime import MultihostFedRunner

        runner = MultihostFedRunner(cfg, amp_bank=amp_bank)
    else:
        from ccst_tpu.federated.runtime import FederatedRunner

        runner = FederatedRunner(cfg, amp_bank=amp_bank)
    result = runner.run()
    print(json.dumps(result))
    return 0


def cmd_fed_test(args) -> int:
    from ccst_tpu.config import FedConfig
    from ccst_tpu.federated.runtime import FederatedRunner

    cfg = _dataclass_from_args(FedConfig, args, test_only=True)
    runner = FederatedRunner(cfg)
    if cfg.tent:
        from ccst_tpu.federated.tent import tent_test
        from ccst_tpu.utils.checkpoint import load_checkpoint

        import jax.numpy as jnp
        import jax

        payload = load_checkpoint(runner.ckpt[args.checkpoint])
        state = jax.tree.map(jnp.asarray, payload["server"])
        _, acc = runner.evaluate(state, runner.test_loader)
        print(f"pre-tent accuracy: {acc:.4f}")
        _, acc = tent_test(
            runner.eval_model, state, runner.test_loader, cfg.image_size,
            logger=runner.logger,
        )
        print(f"tent accuracy: {acc:.4f}")
    else:
        acc = runner.test_only(args.checkpoint)
        print(f"target test accuracy: {acc:.4f}")
    return 0


def cmd_invert_train(args) -> int:
    from ccst_tpu.privacy.invert import InvertConfig, train_inverter

    # the reference's only true DDP entry point is exactly this trainer
    # (imagenet_reconstruct.py:141-175 mp.spawn + NCCL); join the
    # jax.distributed cluster before any backend use
    _maybe_init_multiproc(args.coordinator, args.num_procs, args.proc_id)
    cfg = InvertConfig(
        dataset=args.dataset,
        source=args.source,
        list_root=args.list_root,
        data_root=args.data_root,
        image_size=args.image_size,
        batch_size=args.batch_size,
        steps=args.steps,
        lr=args.lr,
        seed=args.seed,
        out_dir=args.out_dir,
        vgg_weights=args.vgg_weights,
        loss=args.loss,
        perc_weight=args.perc_weight,
        coordinator=args.coordinator,
        num_procs=args.num_procs,
        proc_id=args.proc_id,
    )
    best = train_inverter(cfg)
    print(json.dumps(best))
    return 0


def cmd_invert_eval(args) -> int:
    from ccst_tpu.privacy.invert import InvertConfig, evaluate_inverter

    cfg = InvertConfig(
        dataset=args.dataset,
        source=args.source,
        list_root=args.list_root,
        data_root=args.data_root,
        image_size=args.image_size,
        batch_size=args.batch_size,
        seed=args.seed,
        out_dir=args.out_dir,
        vgg_weights=args.vgg_weights,
        lpips_vgg=args.lpips_vgg,
        lpips_lin=args.lpips_lin,
        style_stats_dir=args.style_stats_dir,
    )
    report = evaluate_inverter(
        cfg, target=args.target, overall=args.overall, holdout=args.holdout
    )
    print(json.dumps(report))
    return 0


def cmd_gan_train(args) -> int:
    """Train the lightweight GAN (hinge + DiffAugment + aux recon) on one
    domain's train images — the reference's lightweight_gan CLI surface
    (reconstruct_img/lightweight_gan/cli.py) rebuilt on flax/optax."""
    import numpy as _np

    from ccst_tpu.data.lists import parse_list, train_list_path
    from ccst_tpu.data.loader import ImageBatchLoader, save_image_u8
    from ccst_tpu.privacy.gan import GanConfig, GanTrainer
    from ccst_tpu.utils.checkpoint import save_checkpoint
    from ccst_tpu.utils.metrics import MetricsLogger

    cfg = GanConfig(
        image_size=args.image_size, latent_dim=args.latent_dim,
        batch_size=args.batch_size, lr=args.lr, steps=args.steps,
        aug_policy=args.aug_policy, seed=args.seed, fmap_max=args.fmap_max,
        gp_weight=args.gp_weight,
        attn_res=tuple(int(r) for r in args.attn_res.split(",") if r.strip()),
    )
    names, labels = parse_list(
        train_list_path(args.list_root, args.dataset, args.source)
    )
    paths = [os.path.join(args.data_root, n) if args.data_root else n for n in names]
    loader = ImageBatchLoader(
        paths, labels, batch_size=cfg.batch_size, image_size=cfg.image_size,
        shuffle=True, seed=cfg.seed, loop=True, drop_last=True,
    )
    trainer = GanTrainer(cfg)
    logger = MetricsLogger(
        os.path.join(args.out_dir, f"gan_{args.dataset}_{args.source}.jsonl")
    )
    it = iter(loader)
    metrics = {}  # stays empty for --steps 0 (e.g. FID-score-only runs)
    for step in range(cfg.steps):
        batch = next(it)
        metrics = trainer.train_step(batch.images, step_idx=step)
        if step % max(1, args.log_every) == 0:
            logger.log("gan_step", step=step, **metrics)
    save_checkpoint(
        os.path.join(args.out_dir, f"gan_{args.dataset}_{args.source}.msgpack"),
        {"g_ema": trainer.g_ema, "g": trainer.g_params, "d": trainer.d_params,
         "config": {"image_size": cfg.image_size, "latent_dim": cfg.latent_dim,
                    "fmap_max": cfg.fmap_max}},
    )
    samples = _np.asarray(trainer.generate(4))
    for i, img in enumerate(samples):
        save_image_u8(img, os.path.join(args.out_dir, f"sample_{i}.png"))
    if args.fid_samples > 0:
        # FID-style closing metric (upstream calculate_fid counterpart):
        # EMA samples vs a real batch in VGG feature space
        import jax

        from ccst_tpu.models import vgg
        from ccst_tpu.models.convert import load_encoder
        from ccst_tpu.privacy.gan import vgg_frechet_distance

        # encoder only: the decoder plays no role in the Frechet metric
        enc = (
            load_encoder(args.vgg_weights) if args.vgg_weights
            else vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
        )
        n = args.fid_samples
        real = _np.concatenate(
            [next(it).images for _ in range((n + cfg.batch_size - 1) // cfg.batch_size)]
        )[:n]
        fake = _np.clip(_np.asarray(trainer.generate(n)), 0.0, 1.0)
        metrics["fid_vgg"] = vgg_frechet_distance(enc, real, fake)
    logger.close()
    print(json.dumps({"steps": cfg.steps, "out_dir": args.out_dir, **metrics}))
    return 0


def cmd_filter_blank(args) -> int:
    from ccst_tpu.data.lists import filter_blank_images

    written = filter_blank_images(
        args.list_root, args.dataset, data_root=args.data_root,
        brightness_lo=args.brightness_lo, brightness_hi=args.brightness_hi,
        min_std=args.min_std,
    )
    for domain, path in written.items():
        print(f"{domain}: {path}")
    return 0


def cmd_train_decoder(args) -> int:
    from ccst_tpu.pipeline.train_decoder import DecoderTrainConfig, train_decoder

    cfg = DecoderTrainConfig(
        dataset=args.dataset,
        content_domain=args.content_domain,
        style_domain=args.style_domain,
        list_root=args.list_root,
        data_root=args.data_root,
        image_size=args.image_size,
        batch_size=args.batch_size,
        steps=args.steps,
        lr=args.lr,
        style_weight=args.style_weight,
        seed=args.seed,
        vgg_weights=args.vgg_weights,
        init_decoder=args.init_decoder,
        domains=args.domains,
        out_path=args.out_path,
    )
    print(json.dumps(train_decoder(cfg)))
    return 0


def cmd_split_data(args) -> int:
    from ccst_tpu.data.lists import split_image_tree

    written = split_image_tree(
        args.data_root, args.dataset, args.list_root or args.data_root,
        train_fraction=args.train_fraction, seed=args.seed,
        tree_subdir=args.tree_subdir,
    )
    for domain, (tr, te) in written.items():
        print(f"{domain}: {tr} | {te}")
    return 0


def cmd_bench(args) -> int:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    try:
        mod.main(argv=[])  # default orchestrated run; bench exits via sys.exit
    except SystemExit as e:
        return int(e.code or 0)
    return 0


def cmd_plot(args) -> int:
    from ccst_tpu.utils.plotting import plot_runs

    out = plot_runs(
        args.logs, args.out,
        metrics=args.metrics.split(",") if args.metrics else None,
        title=args.title,
    )
    print(out)
    return 0


def cmd_repro(args) -> int:
    """Paper-reproduction driver (pipeline/repro.py): the full
    banks->stylize->reorganize->lists->fed-train->summary chain for a named
    dataset, with the reference README's hyperparameters as defaults."""
    from ccst_tpu.pipeline.repro import ReproConfig, run_repro

    cfg = _dataclass_from_args(ReproConfig, args)
    if not cfg.data_root:
        raise SystemExit(
            "repro needs --data-root (the directory holding "
            f"{cfg.dataset.upper()}/kfold/... and txt_lists/; "
            "see docs/REPRODUCE.md for the exact layout)"
        )
    run_repro(cfg)
    return 0


def cmd_summarize(args) -> int:
    from ccst_tpu.utils.metrics import summarize_many

    print(json.dumps(summarize_many(args.logs, args.expected_rounds), indent=2))
    return 0


def main(argv: Optional[list] = None) -> int:
    if os.environ.get("CCST_PLATFORM"):
        # Force the JAX platform (e.g. "cpu"). Needed where a site hook
        # force-registers an accelerator plugin and overrides JAX_PLATFORMS
        # (this dev image's axon sitecustomize does) — multi-process CPU
        # launches (fed-train --num-procs) must not all grab the one TPU.
        import jax

        jax.config.update("jax_platforms", os.environ["CCST_PLATFORM"])
    # Persistent XLA compilation cache. Every CLI process re-traces its
    # jit graphs from scratch, and a TPU compile costs 20-40 s (minutes
    # over a remote-compile tunnel) — so back-to-back invocations of the
    # same pipeline (stylize per target, resumed fed-train) pay it each
    # time. With the cache, repeat compilations of an identical program
    # reload the serialized executable from disk instead.
    # CCST_COMPILE_CACHE=1 -> ~/.cache/ccst_tpu/xla, else the given root;
    # the cache is namespaced per (platform, host CPU features) so CPU
    # executables never cross hosts (utils/compile_cache.py).
    from ccst_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(os.environ.get("CCST_COMPILE_CACHE", ""))
    parser = argparse.ArgumentParser(prog="ccst-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    from ccst_tpu.config import FedConfig, StylizeConfig

    p = sub.add_parser("style-bank", help="compute per-domain style statistics")
    _add_dataclass_args(p, StylizeConfig)
    p.add_argument("--domain", default="", help="single domain (default: all)")
    p.set_defaults(fn=cmd_style_bank)

    p = sub.add_parser("stylize", help="cross-client style transfer")
    _add_dataclass_args(p, StylizeConfig)
    p.set_defaults(fn=cmd_stylize)

    p = sub.add_parser(
        "calibrate", help="persist int8-static calibration scales"
    )
    _add_dataclass_args(p, StylizeConfig)
    p.add_argument("--max-images", type=int, default=8)
    p.set_defaults(fn=cmd_calibrate)

    p = sub.add_parser("reorganize", help="materialize the unified training tree")
    for name, default in (
        ("--dataset", "pacs"), ("--target", ""), ("--mode", "overall"),
        ("--style", "adain"), ("--list-root", ""), ("--data-root", ""),
        ("--save-ext", ""),
    ):
        p.add_argument(name, default=default)
    p.add_argument("--copy", action="store_true", help="copy instead of hardlink")
    p.set_defaults(fn=cmd_reorganize)

    p = sub.add_parser("gen-lists", help="generate K-sampled fusion lists")
    for name, default in (
        ("--dataset", "pacs"), ("--target", ""), ("--mode", "overall"),
        ("--style", "adain"), ("--list-root", ""),
    ):
        p.add_argument(name, default=default)
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--save-ext", default="",
                   help="match the stylize stage's --save-ext, if any")
    p.set_defaults(fn=cmd_gen_lists)

    p = sub.add_parser("amp-bank", help="precompute FedDG amplitude spectra")
    for name, default in (
        ("--dataset", "pacs"), ("--domain", ""), ("--list-root", ""),
        ("--data-root", ""), ("--out-root", ""),
    ):
        p.add_argument(name, default=default)
    p.add_argument("--image-size", type=int, default=222)
    p.set_defaults(fn=cmd_amp_bank)

    p = sub.add_parser("fed-train", help="federated training")
    _add_dataclass_args(p, FedConfig)
    p.set_defaults(fn=cmd_fed_train)

    p = sub.add_parser("fed-test", help="evaluate a federated checkpoint")
    _add_dataclass_args(p, FedConfig)
    p.add_argument("--checkpoint", default="best", choices=["best", "latest"])
    p.set_defaults(fn=cmd_fed_test)

    p = sub.add_parser("invert-train", help="train a style-statistic inverter")
    for name, default, caster in (
        ("--dataset", "pacs", str), ("--source", "", str), ("--list-root", "", str),
        ("--data-root", "", str), ("--out-dir", "inverter", str),
        ("--vgg-weights", "", str),
    ):
        p.add_argument(name, default=default, type=caster)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--loss", choices=["mse", "mse+perceptual"], default="mse",
                   help="mse+perceptual = the LPIPS-criterion training "
                        "variant (imagenet_reconstruct_lpips.py)")
    p.add_argument("--perc-weight", type=float, default=0.1)
    p.add_argument("--coordinator", default="",
                   help="host:port -> multi-process DDP-equivalent launch")
    p.add_argument("--num-procs", type=int, default=0)
    p.add_argument("--proc-id", type=int, default=-1)
    p.set_defaults(fn=cmd_invert_train)

    p = sub.add_parser("invert-eval", help="PSNR/LPIPS of style-stat inversion")
    for name, default, caster in (
        ("--dataset", "pacs", str), ("--source", "", str), ("--target", "", str),
        ("--list-root", "", str), ("--data-root", "", str),
        ("--out-dir", "inverter", str), ("--vgg-weights", "", str),
        ("--lpips-vgg", "", str), ("--lpips-lin", "", str),
        ("--style-stats-dir", "style_stats", str),
    ):
        p.add_argument(name, default=default, type=caster)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--overall", action="store_true",
                   help="invert the domain-level Overall statistic")
    p.add_argument("--holdout", action="store_true",
                   help="score only the trainer's held-out val split "
                        "(rules out training-set memorization)")
    p.set_defaults(fn=cmd_invert_eval)

    p = sub.add_parser("gan-train", help="train the lightweight GAN on one domain")
    p.add_argument("--dataset", default="pacs")
    p.add_argument("--source", default="art_painting")
    p.add_argument("--list-root", default="")
    p.add_argument("--data-root", default="")
    p.add_argument("--out-dir", default="gan")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--latent-dim", type=int, default=256)
    p.add_argument("--fmap-max", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--aug-policy", default="color,translation,cutout")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gp-weight", type=float, default=0.0,
                   help="R1 gradient penalty weight (upstream uses 10)")
    p.add_argument("--attn-res", default="",
                   help="comma list of resolutions for LinearAttention, e.g. 32,64")
    p.add_argument("--fid-samples", type=int, default=0,
                   help="N>0: closing VGG-Frechet distance on N samples")
    p.add_argument("--vgg-weights", default="",
                   help="encoder weights for --fid-samples")
    p.set_defaults(fn=cmd_gan_train)

    p = sub.add_parser("filter-blank", help="write _discardBlackWhite lists")
    p.add_argument("--dataset", default="camelyon17")
    p.add_argument("--list-root", default="")
    p.add_argument("--data-root", default="")
    p.add_argument("--brightness-lo", type=float, default=0.05)
    p.add_argument("--brightness-hi", type=float, default=0.95)
    p.add_argument("--min-std", type=float, default=0.02)
    p.set_defaults(fn=cmd_filter_blank)

    p = sub.add_parser("train-decoder", help="train the AdaIN decoder")
    p.add_argument("--dataset", default="pacs")
    p.add_argument("--content-domain", default="")
    p.add_argument("--style-domain", default="")
    p.add_argument("--list-root", default="")
    p.add_argument("--data-root", default="")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--style-weight", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--vgg-weights", default="")
    p.add_argument("--init-decoder", default="",
                   help="warm-start decoder weights (.npz)")
    p.add_argument("--domains", default="",
                   help="comma-separated domain pool when content/style "
                        "domain is unset (e.g. sources only)")
    p.add_argument("--out-path", default="decoder_trained.npz")
    p.set_defaults(fn=cmd_train_decoder)

    p = sub.add_parser("split-data", help="split an image tree into train/test lists")
    p.add_argument("--dataset", default="officehome")
    p.add_argument("--data-root", default="")
    p.add_argument("--list-root", default="")
    p.add_argument("--train-fraction", type=float, default=0.8)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--tree-subdir", default="")
    p.set_defaults(fn=cmd_split_data)

    p = sub.add_parser("bench", help="headline throughput benchmark")
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser(
        "repro",
        help="one-command paper reproduction: banks -> stylize -> reorg -> "
        "lists -> fed-train (arm x target x seed) -> results table",
    )
    from ccst_tpu.pipeline.repro import ReproConfig

    _add_dataclass_args(p, ReproConfig)
    p.set_defaults(fn=cmd_repro)

    p = sub.add_parser("summarize", help="read_log-style multi-run summary")
    p.add_argument("logs", nargs="+")
    p.add_argument("--expected-rounds", type=int, default=None)
    p.set_defaults(fn=cmd_summarize)

    p = sub.add_parser(
        "plot", help="training-curve PNG from metrics JSONL (plotter.ipynb)"
    )
    p.add_argument("logs", nargs="+")
    p.add_argument("-o", "--out", default="curves.png")
    p.add_argument("--metrics", default="", help="comma-separated keys")
    p.add_argument("--title", default=None)
    p.set_defaults(fn=cmd_plot)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""Privacy analysis: invert shared style statistics back to images.

Rebuild of the reference's rebuttal subsystem (reconstruct_img/):
  - ``train_inverter``  ~ rebuttal_mapping.py:155-273 — per source domain,
    train a generator mapping each image's 1024-d style vector (relu4_1
    mean ‖ std) to the image, MSE loss, best-by-val-PSNR model selection;
  - ``evaluate_inverter`` ~ test.py:151-231 — reconstruct held-out /
    target-domain images from their style vectors, report PSNR + perceptual
    distance per image and averages, save reconstructions;
  - ``--overall``        ~ test_overall.py:100-126 — reconstruct ONE image
    from a whole domain's shared Overall statistic, demonstrating how little
    the domain-level bank leaks.

Scaling: the reference's ImageNet variant uses torch DDP + NCCL
(imagenet_reconstruct.py:141-175). Here the train step is data-parallel by
construction — jit it over a mesh with the batch sharded on a ``data`` axis
(pjit inserts the gradient all-reduce); no process groups, no samplers.

Perceptual metric note: true LPIPS needs pretrained torch feature weights
(unavailable offline). ``perceptual_distance`` computes the same
normalized-feature L2 across VGG taps using this framework's encoder; with
converted ``vgg_normalised.pth`` weights it is LPIPS-equivalent in spirit
(unit-normalized deep features, averaged over layers), and it degrades
gracefully to a random-projection perceptual metric otherwise.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccst_tpu.data.lists import parse_list, train_list_path
from ccst_tpu.data.loader import ImageBatchLoader, save_image_u8
from ccst_tpu.models import vgg
from ccst_tpu.ops.adain import calc_mean_std
from ccst_tpu.privacy.generator import StyleInverter

Array = jax.Array


@dataclass
class InvertConfig:
    dataset: str = "pacs"
    source: str = "art_painting"
    list_root: str = ""
    data_root: str = ""
    image_size: int = 256
    batch_size: int = 16
    steps: int = 2000
    lr: float = 2e-4
    seed: int = 1
    val_fraction: float = 0.1
    out_dir: str = "inverter"
    vgg_weights: str = ""
    eval_limit: int = 64          # images scored at eval
    style_stats_dir: str = "style_stats"  # Overall banks (--overall eval)
    loss: str = "mse"             # "mse" | "mse+perceptual"
    perc_weight: float = 0.1      # weight of the perceptual term
    lpips_vgg: str = ""           # torchvision vgg16 .pth -> TRUE LPIPS
    lpips_lin: str = ""           # LPIPS linear-head .pth (both required)
    # multi-process (DCN) launch — the reference's DDP entry point lives
    # exactly here (imagenet_reconstruct.py:141-175 mp.spawn + NCCL);
    # same env fallbacks as fed-train (CCST_COORDINATOR / ...)
    coordinator: str = ""
    num_procs: int = 0
    proc_id: int = -1


def psnr(a: Array, b: Array, max_val: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB (test.py's metric)."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _encoder_params(cfg: InvertConfig):
    if cfg.vgg_weights:
        from ccst_tpu.models.convert import load_encoder

        return load_encoder(cfg.vgg_weights)
    return vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)


def style_vector(enc_params, images: Array) -> Array:
    """1024-d relu4_1 mean ‖ std per image (rebuttal_mapping.py:33-43).
    Uses population (biased) statistics like the reference's calc_sum."""
    feats = vgg.apply_encoder(enc_params, images)
    mean, std = calc_mean_std(feats, ddof=0)
    return jnp.concatenate([mean[:, 0, 0, :], std[:, 0, 0, :]], axis=-1)


def perceptual_distance(enc_params, a: Array, b: Array) -> Array:
    """LPIPS-style: unit-normalized per-channel features at the four relu
    taps, squared distance, spatial+layer mean."""
    taps_a = vgg.encoder_taps(enc_params, a)
    taps_b = vgg.encoder_taps(enc_params, b)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for name in taps_a:
        fa = taps_a[name].astype(jnp.float32)
        fb = taps_b[name].astype(jnp.float32)
        na = fa / (jnp.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        nb = fb / (jnp.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        total = total + jnp.mean(jnp.sum(jnp.square(na - nb), axis=-1), axis=(1, 2))
    return total / len(taps_a)


def _split_indices(cfg: InvertConfig, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """The (val, train) index split — seed-deterministic, shared by the
    trainer and by ``evaluate_inverter(holdout=True)`` so holdout eval
    scores exactly the images the trainer never saw."""
    rng = np.random.default_rng(cfg.seed)
    idx = rng.permutation(n)
    n_val = max(1, int(n * cfg.val_fraction))
    return idx[:n_val], idx[n_val:]


def _loaders(cfg: InvertConfig) -> Tuple[ImageBatchLoader, ImageBatchLoader]:
    names, labels = parse_list(
        train_list_path(cfg.list_root, cfg.dataset, cfg.source)
    )
    if cfg.data_root:
        names = [os.path.join(cfg.data_root, n) for n in names]
    val_idx, train_idx = _split_indices(cfg, len(names))
    if jax.process_count() > 1:
        # DistributedSampler analogue: every process decodes only its own
        # contiguous slice of the (seed-deterministic) permutation
        p, np_ = jax.process_index(), jax.process_count()
        train_idx = train_idx[p::np_]
        val_idx = val_idx[p::np_]
        if len(train_idx) < cfg.batch_size:
            # with loop=True + drop_last=True a sub-batch shard would never
            # enqueue a batch and next() would hang the whole cluster
            raise ValueError(
                f"process {p}'s train shard has {len(train_idx)} images < "
                f"batch_size {cfg.batch_size}: use fewer processes or a "
                "smaller batch"
            )
    train = ImageBatchLoader(
        [names[i] for i in train_idx], [labels[i] for i in train_idx],
        batch_size=cfg.batch_size, image_size=cfg.image_size,
        shuffle=True, seed=cfg.seed, loop=True, drop_last=True,
    )
    val = ImageBatchLoader(
        [names[i] for i in val_idx], [labels[i] for i in val_idx],
        batch_size=cfg.batch_size, image_size=cfg.image_size,
    )
    return train, val


def train_inverter(cfg: InvertConfig, mesh=None) -> Dict[str, Any]:
    """Train the style inverter for one source domain; saves the best-PSNR
    params to ``{out_dir}/{dataset}/{source}_inverter.ckpt``."""
    from ccst_tpu.utils.checkpoint import save_checkpoint

    if (cfg.coordinator or cfg.num_procs > 1) and not jax.distributed.is_initialized():
        # library callers reach the DDP path through the config fields alone
        # (the CLI initializes earlier; initialize must precede backend use,
        # so the check is on distributed state, NOT jax.process_count())
        from ccst_tpu.parallel import multihost

        multihost.initialize(
            coordinator_address=cfg.coordinator or None,
            num_processes=cfg.num_procs if cfg.num_procs > 0 else None,
            process_id=cfg.proc_id if cfg.proc_id >= 0 else None,
        )

    enc = _encoder_params(cfg)
    enc16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), enc)
    model = StyleInverter(image_size=cfg.image_size)
    params = model.init(
        jax.random.PRNGKey(cfg.seed), jnp.zeros((1, 1024)), train=False
    )["params"]
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(params)

    def step_fn(params, opt_state, images):
        z = style_vector(enc16, images.astype(jnp.bfloat16)).astype(jnp.float32)
        z = jax.lax.stop_gradient(z)

        def loss_fn(p):
            recon = model.apply({"params": p}, z, train=True)
            l = jnp.mean(jnp.square(recon - images))
            if cfg.loss == "mse+perceptual":
                # the LPIPS-criterion training variant
                # (imagenet_reconstruct_lpips.py differs from the plain
                # template only in this term); perceptual_distance is the
                # offline LPIPS analogue (module docstring)
                l = l + cfg.perc_weight * jnp.mean(
                    perceptual_distance(enc16, recon, images)
                )
            return l

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    multiproc = jax.process_count() > 1
    if multiproc and mesh is None:
        # multi-process DP: one global "data" mesh over every host's
        # devices — THE launchable counterpart of the reference's DDP
        # (imagenet_reconstruct.py:141-175); batches are assembled from
        # process-local shards below, XLA inserts the gradient all-reduce
        # across DCN
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()), ("data",))
    if mesh is not None:
        # data-parallel over the mesh's "data" axis — pjit inserts the
        # gradient all-reduce (replaces the reference's NCCL DDP template,
        # imagenet_reconstruct.py:141-175)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        step = jax.jit(
            step_fn,
            in_shardings=(repl, repl, data_sh),
            out_shardings=(repl, repl, repl),
        )
    else:
        step = jax.jit(step_fn)

    @jax.jit
    def val_psnr(params, images, valid):
        z = style_vector(enc16, images.astype(jnp.bfloat16)).astype(jnp.float32)
        recon = model.apply({"params": params}, z, train=False)
        p = psnr(recon, images)
        mask = (jnp.arange(images.shape[0]) < valid).astype(jnp.float32)
        return jnp.sum(p * mask), jnp.sum(mask)

    train_loader, val_loader = _loaders(cfg)
    best = {"psnr": -1.0, "step": -1}
    out_path = os.path.join(
        cfg.out_dir, cfg.dataset.lower(), f"{cfg.source}_inverter.ckpt"
    )
    if multiproc:
        # replicate init state globally (identical on every host: same
        # seed); per-step batches are per-process shards assembled into one
        # global (num_procs * batch) array on the "data" axis
        from jax.sharding import PartitionSpec as P

        from ccst_tpu.parallel import multihost

        params = multihost.replicate_tree(jax.tree.map(np.asarray, params), mesh)
        opt_state = jax.tree.map(
            lambda x: multihost.from_process_local(mesh, P(), np.asarray(x)),
            opt_state,
        )

        def feed(images):
            return multihost.from_process_local(mesh, P("data"), images)

        def to_host(tree):
            return jax.tree.map(
                lambda a: jnp.asarray(np.asarray(jax.device_get(a))), tree
            )
    else:
        feed = jnp.asarray
        to_host = lambda tree: tree
    it = iter(train_loader)
    eval_every = max(50, cfg.steps // 20)
    loss = float("nan")
    rank0 = jax.process_index() == 0
    for i in range(cfg.steps):
        batch = next(it)
        params, opt_state, loss = step(params, opt_state, feed(batch.images))
        if (i + 1) % eval_every == 0 or i == cfg.steps - 1:
            # every process scores its own val shard with a host-local
            # copy of the replicated params; sums combine across hosts
            params_h = to_host(params)
            tot = n = 0.0
            for vb in val_loader:
                s, m = val_psnr(
                    params_h, jnp.asarray(vb.images), jnp.asarray(vb.valid)
                )
                tot += float(s)
                n += float(m)
            if multiproc:
                from jax.experimental import multihost_utils

                sums = multihost_utils.process_allgather(
                    np.asarray([tot, n]), tiled=False
                )
                tot, n = [float(v) for v in np.asarray(sums).reshape(-1, 2).sum(0)]
            cur = tot / max(n, 1.0)
            if cur > best["psnr"]:
                best = {"psnr": cur, "step": i}
                if rank0:  # single writer
                    save_checkpoint(out_path, {"params": params_h, "best": best})
            if rank0:
                print(f"step {i+1}/{cfg.steps} loss={float(loss):.5f} val_psnr={cur:.2f}dB")
    best["checkpoint"] = out_path
    best["final_loss"] = float(loss)
    return best


def evaluate_inverter(
    cfg: InvertConfig, target: str = "", overall: bool = False,
    holdout: bool = False,
) -> Dict[str, Any]:
    """Reconstruct images of ``target`` (default: the source domain)
    from their style vectors; report mean/std PSNR and perceptual distance,
    save reconstructions + a ``psnr_lpips``-style npy (test.py:223-230).

    ``holdout=True`` restricts scoring to the exact val split the trainer
    held out (same seed-deterministic permutation), so the reported
    reconstruction quality cannot be training-set memorization. Only
    meaningful when evaluating the source domain itself; a different
    ``target`` domain is held out by construction (test.py evaluates on the
    target's test loader)."""
    from ccst_tpu.utils.checkpoint import load_checkpoint

    enc = _encoder_params(cfg)
    enc16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), enc)
    model = StyleInverter(image_size=cfg.image_size)
    ckpt = os.path.join(
        cfg.out_dir, cfg.dataset.lower(), f"{cfg.source}_inverter.ckpt"
    )
    params = jax.tree.map(jnp.asarray, load_checkpoint(ckpt)["params"])

    out_img_dir = os.path.join(
        cfg.out_dir, cfg.dataset.lower(), f"recon_{cfg.source}"
        + (f"_to_{target}" if target else "") + ("_overall" if overall else "")
        + ("_holdout" if holdout and not target else "")
    )
    os.makedirs(out_img_dir, exist_ok=True)

    if overall:
        # invert the shared Overall statistic of the (target or source)
        # domain — and QUANTIFY what it leaks: the reference only saves the
        # image (test_overall.py:100-126); here the single reconstruction is
        # additionally scored against up to eval_limit of the domain's
        # images, so the per-image-vs-overall leakage ordering is a number,
        # not an eyeball (EXPERIMENT_PRIVACY.json).
        from ccst_tpu.pipeline.style_bank import load_style_stats

        domain = target or cfg.source
        stats = os.path.join(
            cfg.style_stats_dir, cfg.dataset.lower(), f"{domain}_mean_std.npz"
        )
        if not os.path.exists(stats):
            stats = stats[:-4] + ".npy"
        mean, std = load_style_stats(stats)
        z = jnp.concatenate([jnp.asarray(mean), jnp.asarray(std)])[None]
        recon = model.apply({"params": params}, z, train=False)
        img_path = os.path.join(out_img_dir, "overall.png")
        save_image_u8(np.asarray(recon[0]), img_path)

        names, labels = parse_list(
            train_list_path(cfg.list_root, cfg.dataset, domain)
        )
        if holdout and not target:
            val_idx, _ = _split_indices(cfg, len(names))
            sel = np.sort(val_idx)
            names = [names[i] for i in sel]
            labels = [labels[i] for i in sel]
        if cfg.data_root:
            names = [os.path.join(cfg.data_root, n) for n in names]
        loader = ImageBatchLoader(
            names[: cfg.eval_limit], labels[: cfg.eval_limit],
            batch_size=cfg.batch_size, image_size=cfg.image_size,
        )
        recon_b = jnp.broadcast_to(recon, (cfg.batch_size, *recon.shape[1:]))
        score = jax.jit(
            lambda imgs: (
                psnr(recon_b, imgs),
                perceptual_distance(enc, recon_b, imgs),
            )
        )
        psnrs, percs = [], []
        for batch in loader:
            p, d = score(jnp.asarray(batch.images))
            psnrs.extend(float(v) for v in p[: batch.valid])
            percs.extend(float(v) for v in d[: batch.valid])
        report = {
            "mode": "overall",
            "holdout": bool(holdout and not target),
            "domain": domain,
            "image": img_path,
            "images_scored": len(psnrs),
            "psnr_mean": float(np.mean(psnrs)),
            "psnr_std": float(np.std(psnrs)),
            "perceptual_mean": float(np.mean(percs)),
            "perceptual_std": float(np.std(percs)),
        }
        np.save(os.path.join(out_img_dir, "psnr_perceptual.npy"),
                np.stack([psnrs, percs]))
        with open(os.path.join(out_img_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        return report

    domain = target or cfg.source
    names, labels = parse_list(
        train_list_path(cfg.list_root, cfg.dataset, domain)
    )
    if holdout and not target:
        val_idx, _ = _split_indices(cfg, len(names))
        sel = np.sort(val_idx)
        names = [names[i] for i in sel]
        labels = [labels[i] for i in sel]
    rel_names = list(names[: cfg.eval_limit])  # list-relative, for path_list
    if cfg.data_root:
        names = [os.path.join(cfg.data_root, n) for n in names]
    loader = ImageBatchLoader(
        names[: cfg.eval_limit], labels[: cfg.eval_limit],
        batch_size=cfg.batch_size, image_size=cfg.image_size,
    )

    # TRUE LPIPS when the torch checkpoints are supplied (test.py:28,184);
    # otherwise the documented normalized-deep-feature substitute
    lpips_fn = None
    if cfg.lpips_vgg and cfg.lpips_lin:
        from ccst_tpu.privacy.lpips import load_lpips_weights, lpips_distance

        vggp, lins = load_lpips_weights(cfg.lpips_vgg, cfg.lpips_lin)
        lpips_fn = jax.jit(lambda a, b: lpips_distance(vggp, lins, a, b))

    @jax.jit
    def recon_batch(images):
        z = style_vector(enc16, images.astype(jnp.bfloat16)).astype(jnp.float32)
        recon = model.apply({"params": params}, z, train=False)
        return recon, psnr(recon, images), perceptual_distance(enc, recon, images)

    psnrs, percs, lpipss = [], [], []
    idx = 0
    for batch in loader:
        recon, p, d = recon_batch(jnp.asarray(batch.images))
        lp = (
            lpips_fn(jnp.clip(recon, 0.0, 1.0), jnp.asarray(batch.images))
            if lpips_fn is not None
            else None
        )
        for j in range(batch.valid):
            psnrs.append(float(p[j]))
            percs.append(float(d[j]))
            if lp is not None:
                lpipss.append(float(lp[j]))
            save_image_u8(
                np.asarray(recon[j]), os.path.join(out_img_dir, f"recon_{idx}.png")
            )
            idx += 1
    report = {
        "domain": domain,
        "holdout": bool(holdout and not target),
        "images": len(psnrs),
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_std": float(np.std(psnrs)),
        "perceptual_mean": float(np.mean(percs)),
        "perceptual_std": float(np.std(percs)),
        "recon_dir": out_img_dir,
    }
    if lpipss:
        report["lpips_mean"] = float(np.mean(lpipss))
        report["lpips_std"] = float(np.std(lpipss))
        # reference-exact artifact (reconstruct_img/test.py:225-231): a dict
        # npy with per-image lists + averages, drop-in for any downstream
        # analysis written against the reference's psnr_lpips.npy
        np.save(
            os.path.join(out_img_dir, "psnr_lpips.npy"),
            {
                "psnr_list": psnrs,
                "lpips_list": lpipss,
                "path_list": rel_names[: len(psnrs)],
                "average_psnr": float(np.mean(psnrs)),
                "average_lpips": float(np.mean(lpipss)),
            },
        )
    np.save(os.path.join(out_img_dir, "psnr_perceptual.npy"),
            np.stack([psnrs, percs]))
    with open(os.path.join(out_img_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    return report

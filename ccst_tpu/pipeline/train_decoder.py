"""AdaIN decoder training (the trainer the reference omits).

The reference ships the AdaIN training wrapper ``Net`` (net.py:95-152) but
never trains the decoder in-repo — it downloads ``decoder.pth``. With zero
egress or for new domains, this stage trains the decoder from scratch on
content/style image streams using the losses of net.py:138-152
(content MSE at relu4_1 vs the AdaIN target + mean/std style MSE at four
taps), SGD-free: Adam with optional data-parallel mesh.
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccst_tpu.data.lists import parse_list, train_list_path
from ccst_tpu.data.loader import ImageBatchLoader
from ccst_tpu.models import vgg
from ccst_tpu.models.adain_net import adain_losses


@dataclass
class DecoderTrainConfig:
    dataset: str = "pacs"
    content_domain: str = ""        # "" = all domains pooled
    style_domain: str = ""          # "" = all domains pooled
    list_root: str = ""
    data_root: str = ""
    image_size: int = 256
    batch_size: int = 8
    steps: int = 10000
    lr: float = 1e-4
    style_weight: float = 10.0
    content_weight: float = 1.0
    seed: int = 1
    vgg_weights: str = ""
    init_decoder: str = ""          # warm-start decoder weights (.npz); ""
                                    # = random init
    out_path: str = "decoder_trained.npz"
    log_every: int = 100
    domains: str = ""               # comma-separated pool when content/style
                                    # domain is "" (e.g. sources only, so the
                                    # decoder never sees the held-out target)


def _pooled_loader(cfg: DecoderTrainConfig, domain: str) -> ImageBatchLoader:
    from ccst_tpu.config import dataset_spec

    spec = dataset_spec(cfg.dataset)
    if domain:
        domains = [domain]
    elif cfg.domains:
        domains = [d.strip() for d in cfg.domains.split(",") if d.strip()]
    else:
        domains = list(spec.domains)
    names = []
    for d in domains:
        n, _ = parse_list(train_list_path(cfg.list_root, cfg.dataset, d))
        names.extend(n)
    paths = [os.path.join(cfg.data_root, n) for n in names] if cfg.data_root else names
    return ImageBatchLoader(
        paths,
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        shuffle=True,
        seed=cfg.seed,
        loop=True,
        drop_last=True,
    )


def train_decoder(cfg: DecoderTrainConfig, mesh=None) -> Dict[str, Any]:
    """Returns {final_loss_c, final_loss_s, out_path}; writes .npz weights."""
    from ccst_tpu.models.convert import load_encoder, save_npz

    if cfg.vgg_weights:
        enc = load_encoder(cfg.vgg_weights)
    else:
        enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    if cfg.init_decoder:
        from ccst_tpu.models.convert import load_decoder

        dec = load_decoder(cfg.init_decoder)
    else:
        dec = vgg.init_params(jax.random.PRNGKey(cfg.seed), vgg.DECODER_ARCH)
    tx = optax.adam(cfg.lr)
    opt_state = tx.init(dec)

    def step_fn(dec, opt_state, content, style):
        def total(d):
            lc, ls = adain_losses(enc, d, content, style)
            return cfg.content_weight * lc + cfg.style_weight * ls, (lc, ls)

        (loss, (lc, ls)), grads = jax.value_and_grad(total, has_aux=True)(dec)
        updates, opt_state = tx.update(grads, opt_state, dec)
        return optax.apply_updates(dec, updates), opt_state, lc, ls

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data_sh = NamedSharding(mesh, P("data"))
        step = jax.jit(
            step_fn,
            in_shardings=(repl, repl, data_sh, data_sh),
            out_shardings=(repl, repl, repl, repl),
        )
    else:
        step = jax.jit(step_fn)

    content_iter = iter(_pooled_loader(cfg, cfg.content_domain))
    style_iter = iter(_pooled_loader(cfg, cfg.style_domain))
    lc = ls = float("nan")
    t0 = time.perf_counter()
    for i in range(cfg.steps):
        cb = next(content_iter)
        sb = next(style_iter)
        dec, opt_state, lc, ls = step(
            dec, opt_state, jnp.asarray(cb.images), jnp.asarray(sb.images)
        )
        if (i + 1) % cfg.log_every == 0:
            print(
                f"step {i+1}/{cfg.steps} loss_c={float(lc):.4f} "
                f"loss_s={float(ls):.4f} "
                f"({(i+1)*cfg.batch_size/(time.perf_counter()-t0):.1f} img/s)",
                flush=True,
            )
    save_npz(cfg.out_path, jax.tree.map(np.asarray, dec))
    return {
        "final_loss_c": float(lc),
        "final_loss_s": float(ls),
        "out_path": cfg.out_path,
    }

"""GAN training surface (privacy/gan.py): DiffAugment semantics,
discriminator heads, and a short end-to-end hinge-GAN run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.privacy.gan import (
    Discriminator,
    GanConfig,
    GanTrainer,
    diff_augment,
)


def test_diff_augment_shapes_and_determinism(rng):
    x = jnp.asarray(rng.random((4, 32, 32, 3), np.float32))
    key = jax.random.PRNGKey(3)
    a = diff_augment(key, x)
    b = diff_augment(key, x)
    assert a.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))  # same key
    c = diff_augment(jax.random.PRNGKey(4), x)
    assert not np.allclose(np.asarray(a), np.asarray(c))  # different key
    # translation keeps content, cutout zeroes a box
    cut = diff_augment(key, x, policy="cutout")
    assert float(jnp.sum(cut == 0.0)) >= 4 * 16 * 16 * 3
    # differentiable: gradient flows through the augmentation
    g = jax.grad(lambda v: jnp.sum(diff_augment(key, v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_discriminator_heads(rng):
    disc = Discriminator(image_size=64, fmap_max=64)
    x = jnp.asarray(rng.random((2, 64, 64, 3), np.float32))
    params = disc.init(jax.random.PRNGKey(0), x, decode=True)["params"]
    (lm, l32), recon = disc.apply({"params": params}, x, decode=True)
    assert lm.shape[0] == 2 and lm.shape[-1] == 1
    assert l32.shape[0] == 2
    assert recon.shape == (2, 32, 32, 3)
    lm2, l32_2 = disc.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lm2), rtol=1e-6)


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_gan_short_training_run(rng):
    cfg = GanConfig(image_size=64, latent_dim=64, batch_size=4, steps=3,
                    fmap_max=32, lr=1e-3)
    trainer = GanTrainer(cfg)
    g0 = np.asarray(jax.tree.leaves(trainer.g_params)[0]).copy()
    real = rng.random((4, 64, 64, 3)).astype(np.float32)
    for _ in range(3):
        m = trainer.train_step(real)
        assert all(np.isfinite(v) for v in m.values()), m
    g1 = np.asarray(jax.tree.leaves(trainer.g_params)[0])
    assert not np.allclose(g0, g1)  # generator actually trained
    imgs = trainer.generate(2)
    assert imgs.shape == (2, 64, 64, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0


def test_save_augment_grid(tmp_path, rng):
    """DiffAugmentTest parity: the augmentation grid image is written and
    has one row per policy plus the clean row."""
    import os

    from ccst_tpu.privacy.gan import save_augment_grid

    imgs = rng.random((3, 16, 16, 3)).astype("float32")
    out = save_augment_grid(imgs, str(tmp_path / "grid.png"))
    assert os.path.exists(out)
    from ccst_tpu.data.loader import load_image

    grid = load_image(out, None)
    assert grid.shape == (4 * 16, 3 * 16, 3)


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_gradient_penalty_path(rng):
    """gp_weight>0 engages the R1 penalty on gp_every-aligned steps
    (upstream lightweight_gan.py:1181,1220-1235) and training stays finite;
    off-cadence steps report gp == 0."""
    cfg = GanConfig(image_size=32, latent_dim=32, batch_size=2, steps=2,
                    fmap_max=16, lr=1e-3, gp_weight=10.0, gp_every=2)
    trainer = GanTrainer(cfg)
    real = rng.random((2, 32, 32, 3)).astype(np.float32)
    m0 = trainer.train_step(real, step_idx=0)   # on-cadence: penalty active
    m1 = trainer.train_step(real, step_idx=1)   # off-cadence
    assert np.isfinite(m0["gp"]) and m0["gp"] > 0.0, m0
    assert m1["gp"] == 0.0, m1
    assert all(np.isfinite(v) for v in m0.values())


def test_vgg_frechet_distance(rng):
    """FID-style metric sanity: ~0 on identical sets, grows with distortion,
    symmetric-ish in magnitude."""
    from ccst_tpu.models import vgg
    from ccst_tpu.privacy.gan import vgg_frechet_distance

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH)
    a = rng.random((8, 32, 32, 3)).astype(np.float32)
    d_same = vgg_frechet_distance(enc, a, a)
    assert d_same < 1e-3, d_same
    b1 = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    b2 = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1).astype(np.float32)
    d1 = vgg_frechet_distance(enc, a, b1)
    d2 = vgg_frechet_distance(enc, a, b2)
    assert 0 <= d1 < d2, (d1, d2)


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_linear_attention_block(rng):
    """Attention at feature resolutions (upstream --attn-res-layers): shape
    preservation, gradient flow, and batch independence (sample i's output
    must not depend on sample j)."""
    from ccst_tpu.privacy.generator import LinearAttention

    attn = LinearAttention(dim_head=8, heads=2)
    x = jnp.asarray(rng.random((2, 8, 8, 16), np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)["params"]
    y = attn.apply({"params": params}, x)
    assert y.shape == x.shape
    g = jax.grad(lambda v: float(0) + jnp.sum(attn.apply({"params": params}, v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
    # batch independence: changing sample 1 must not change sample 0
    x2 = x.at[1].set(x[1] + 1.0)
    y2 = attn.apply({"params": params}, x2)
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y2[0]), atol=1e-5)
    assert not np.allclose(np.asarray(y[1]), np.asarray(y2[1]))


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_gan_with_attention_trains(rng):
    cfg = GanConfig(image_size=32, latent_dim=16, batch_size=2, steps=1,
                    fmap_max=16, lr=1e-3, attn_res=(8,))
    trainer = GanTrainer(cfg)
    # attention params exist in both networks at the requested resolution
    assert "attn_8" in trainer.g_params
    assert "attn_8" in trainer.d_params
    m = trainer.train_step(rng.random((2, 32, 32, 3)).astype(np.float32))
    assert all(np.isfinite(v) for v in m.values()), m

"""Classifier zoo: shapes, variable collections, DG variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccst_tpu.models.classifiers import (
    DenseNet,
    DigitModel,
    ResNet,
    get_network,
)


def init_and_apply(model, x, train=True, rngs=None):
    rngs = rngs or {}
    variables = model.init({"params": jax.random.PRNGKey(0), **rngs}, x, train=train)
    out, new_state = model.apply(
        variables, x, train=train, rngs=rngs or None,
        mutable=[k for k in variables if k != "params"],
    )
    return variables, out, new_state


def test_resnet18_forward_and_bn_state():
    model = get_network("resnet18", classes=7)
    x = jnp.ones((2, 64, 64, 3))
    variables, out, new_state = init_and_apply(model, x)
    assert out.shape == (2, 7)
    assert "batch_stats" in variables
    # BN running stats update in train mode
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))
    # head is named like the reference
    assert "class_classifier" in variables["params"]


def test_resnet18_eval_deterministic():
    model = get_network("resnet18", classes=7)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    a = model.apply(variables, x, train=False)
    b = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow  # scalar-slow on XLA-CPU; full tier covers it (r5 fast-tier trim)
def test_resnet50_bottleneck():
    model = get_network("resnet50", classes=65)
    x = jnp.ones((1, 64, 64, 3))
    _, out, _ = init_and_apply(model, x)
    assert out.shape == (1, 65)


def test_resnet18in_no_batch_stats():
    model = get_network("resnet18IN", classes=7)
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" not in variables
    out = model.apply(variables, x, train=True)
    assert out.shape == (2, 7)


def test_jigsaw_two_heads():
    model = get_network("resnet18", classes=7, dg_method="Jigsaw")
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    logits, jig = model.apply(variables, x, train=False)
    assert logits.shape == (2, 7)
    assert jig.shape == (2, 31)


def test_mixstyle_variant_stochastic():
    model = get_network("resnet18", classes=7, dg_method="MixStyle")
    x = jnp.asarray(np.random.default_rng(0).random((4, 64, 64, 3), np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mixstyle": jax.random.PRNGKey(1)},
        x, train=True,
    )
    outs = []
    for seed in (1, 2, 3, 4):
        out, _ = model.apply(
            variables, x, train=True,
            rngs={"mixstyle": jax.random.PRNGKey(seed)},
            mutable=["batch_stats"],
        )
        outs.append(np.asarray(out))
    # different rng -> (at least sometimes) different mixing
    assert any(not np.allclose(outs[0], o) for o in outs[1:])
    # eval mode: MixStyle off, deterministic
    e1 = model.apply(variables, x, train=False)
    e2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_densenet_96px_no_trainable_norm():
    model = get_network("densenet", classes=2)
    x = jnp.ones((2, 96, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" not in variables  # stat-free norm by design
    out = model.apply(variables, x, train=True)
    assert out.shape == (2, 2)
    # unlike the reference, the requested class count is honored
    model5 = get_network("densenet", classes=5)
    v5 = model5.init(jax.random.PRNGKey(0), x, train=False)
    assert model5.apply(v5, x, train=False).shape == (2, 5)


def test_digitmodel():
    model = get_network("DigitModel", classes=10)
    x = jnp.ones((2, 28, 28, 3))
    _, out, _ = init_and_apply(model, x)
    assert out.shape == (2, 10)


def test_registry_unknown():
    with pytest.raises(ValueError):
        get_network("nope", classes=2)


@pytest.mark.slow  # int8/bf16 on XLA-CPU is scalar-slow; dev tier skips
def test_densenet_dg_variants():
    """JigsawDenseNet / MixStyleDenseNet (nets/densenet.py:110-139): the
    factory's dg_method flags apply to densenet too."""
    m = get_network("densenet", classes=3, dg_method="jigsaw")
    v = m.init(jax.random.PRNGKey(0), jnp.ones((2, 36, 36, 3)), train=False)
    logits, jig = m.apply(v, jnp.ones((2, 36, 36, 3)), train=False)
    assert logits.shape == (2, 3) and jig.shape == (2, 31)

    m = get_network("densenet", classes=3, dg_method="mixstyle")
    v = m.init(
        {"params": jax.random.PRNGKey(0), "mixstyle": jax.random.PRNGKey(1)},
        jnp.ones((2, 36, 36, 3)), train=True,
    )
    out = m.apply(
        v, jnp.ones((2, 36, 36, 3)), train=True,
        rngs={"mixstyle": jax.random.PRNGKey(2)},
    )
    assert out.shape == (2, 3)

"""Training-equivalence harness extensions (VERDICT r2 directive #5).

Extends tests/test_train_equivalence.py where the semantics are hardest:

  - DenseNet's stat-free BN (`affine=False, track_running_stats=False`,
    reference nets/densenet.py:11-15) under fedavg AND fedbn aggregation —
    the quirkiest aggregation case: there is no BN state at all, so fedbn
    must degenerate to fedavg exactly, and the torch twin must track both;
  - Jigsaw two-head step (fed_run.py:57-62) — the permutation sampling is
    reproduced exactly by replaying the same jax draws into the torch twin;
  - FedDG/ELCFS FOMAML meta-step (fed_run.py:98-116) — frequency-space
    augmentation precomputed once, inner/outer losses and the clipped
    first-order meta update tracked across frameworks;
  - MixStyle step (nets/layers.py:6-73) — the layer's internal draws (gate,
    Beta lambda, permutation) are captured by instrumenting jax.random in
    an unjitted step and replayed into a torch MixStyle twin;
  - eval-path equivalence: IN-test's BN->IN swap (fed_run.py:218-232) and
    fedbn server-side evaluation (test_fedbn, fed_run.py:350-381);
  - a 10-round drift curve at fixed LR (DigitModel) bounding cross-framework
    loss divergence over a horizon 5x the base harness.

Tolerances follow the measured float-tie-chaos model documented in
tests/test_train_equivalence.py (first steps exact to fp noise; later steps
mostly tight with rare bounded ReLU-flip excursions).
"""
from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; dev fast tier: -m 'not slow'
import torch
import torch.nn.functional as F
from torch import nn

from ccst_tpu.federated.aggregate import aggregate, stack_clients, unstack_clients
from ccst_tpu.federated.train_ops import make_eval_step, make_train_step
from ccst_tpu.models.classifiers import DenseNet, DigitModel, get_network
from ccst_tpu.models.convert_resnet import convert_torchvision_resnet

from tests.test_train_equivalence import (
    BATCH, LR, TorchDigitModel, digit_state_from_torch, make_batches,
    torch_communicate, torch_local_epoch,
)
from tests.torch_ref import TorchResNet18

N_CLASSES = 4
IMG = 36
N_CLIENTS = 2


# ---------------------------------------------------------------------------
# mini stat-free DenseNet twins (same semantics as DenseNet-121 at CI scale:
# growth 8, blocks (2, 2), the zero_padding quirk after block 1 included)
# ---------------------------------------------------------------------------

_GROWTH, _BLOCKS, _INIT, _BNSIZE = 8, (2, 2), 16, 2


class _SFNorm(nn.Module):
    """The reference's stat-free norm: batch stats at train AND eval,
    nothing learnable (nets/densenet.py:11-15)."""

    def forward(self, x):
        # BatchNorm2d(affine=False, track_running_stats=False).train() math,
        # applied unconditionally (the module behaves identically in eval)
        return F.batch_norm(x, None, None, None, None, True, 0.0, 1e-5)


class TorchMiniDenseNet(nn.Module):
    def __init__(self, classes=N_CLASSES):
        super().__init__()
        self.conv0 = nn.Conv2d(3, _INIT, 7, 2, 3, bias=False)
        self.norm = _SFNorm()
        feats = _INIT
        for bi, n_layers in enumerate(_BLOCKS, start=1):
            for li in range(1, n_layers + 1):
                setattr(
                    self, f"db{bi}_l{li}_conv1",
                    nn.Conv2d(feats, _BNSIZE * _GROWTH, 1, bias=False),
                )
                setattr(
                    self, f"db{bi}_l{li}_conv2",
                    nn.Conv2d(_BNSIZE * _GROWTH, _GROWTH, 3, padding=1, bias=False),
                )
                feats += _GROWTH
            if bi != len(_BLOCKS):
                setattr(self, f"transition{bi}", nn.Conv2d(feats, feats // 2, 1, bias=False))
                feats //= 2
        self.classifier = nn.Linear(feats, classes)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.norm(self.conv0(x))), 3, 2, 1)
        for bi, n_layers in enumerate(_BLOCKS, start=1):
            for li in range(1, n_layers + 1):
                out = F.relu(self.norm(x))
                out = getattr(self, f"db{bi}_l{li}_conv1")(out)
                out = F.relu(self.norm(out))
                out = getattr(self, f"db{bi}_l{li}_conv2")(out)
                x = torch.cat([x, out], dim=1)
            if bi == 1:
                x = F.pad(x, (2, 2, 2, 2))  # the zero_padding quirk
            if bi != len(_BLOCKS):
                x = F.relu(self.norm(x))
                x = getattr(self, f"transition{bi}")(x)
                x = F.avg_pool2d(x, 2, 2)
        x = F.relu(self.norm(x))
        x = x.mean(dim=(2, 3))
        return self.classifier(x)


def _mini_densenet_pair():
    tmodel = TorchMiniDenseNet()
    jmodel = DenseNet(
        classes=N_CLASSES, growth_rate=_GROWTH, block_config=_BLOCKS,
        num_init_features=_INIT, bn_size=_BNSIZE,
    )
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    params = jax.tree.map(np.asarray, variables["params"])
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    def conv(name):
        return sd[name].transpose(2, 3, 1, 0)

    params["conv0"]["kernel"] = conv("conv0.weight")
    for bi, n_layers in enumerate(_BLOCKS, start=1):
        for li in range(1, n_layers + 1):
            blk = params[f"denseblock{bi}_layer{li}"]
            blk["Conv_0"]["kernel"] = conv(f"db{bi}_l{li}_conv1.weight")
            blk["Conv_1"]["kernel"] = conv(f"db{bi}_l{li}_conv2.weight")
        if bi != len(_BLOCKS):
            params[f"transition{bi}"]["kernel"] = conv(f"transition{bi}.weight")
    params["classifier"]["kernel"] = sd["classifier.weight"].T
    params["classifier"]["bias"] = sd["classifier.bias"]
    state = {
        "params": jax.tree.map(jnp.asarray, params),
        "batch_stats": {},  # stat-free: nothing to track or aggregate
    }
    return tmodel, jmodel, state


def test_densenet_statfree_forward_parity(rng):
    tmodel, jmodel, state = _mini_densenet_pair()
    x = rng.random((2, IMG, IMG, 3), np.float32)
    tmodel.eval()
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        jmodel.apply({"params": state["params"]}, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


@pytest.mark.parametrize("mode", ["fedavg", "fedbn"])
def test_densenet_statfree_training_equivalence(mode):
    """The semantically trickiest aggregation case: stat-free BN means fedbn
    has NOTHING to keep local — both modes must behave identically, and the
    torch twin (whose affine/track-free BatchNorm2d contributes no
    state-dict entries either) must track both."""
    tmodel, jmodel, state0 = _mini_densenet_pair()
    rng = np.random.default_rng(21)
    batches = make_batches(rng, N_CLIENTS, 2)

    tserver = copy.deepcopy(tmodel)
    tclients = [copy.deepcopy(tserver) for _ in range(N_CLIENTS)]
    tlosses = [[] for _ in range(N_CLIENTS)]
    for _ in range(2):
        for ci in range(N_CLIENTS):
            tlosses[ci] += torch_local_epoch(tclients[ci], tserver, batches[ci], mode)
        torch_communicate(mode, tserver, tclients, [0.5, 0.5])

    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=IMG, lr=LR, mode=mode,
            transform_on_device=False,
        )
    )
    states = [jax.tree.map(jnp.copy, state0) for _ in range(N_CLIENTS)]
    server_params = state0["params"]
    jlosses = [[] for _ in range(N_CLIENTS)]
    for _ in range(2):
        for ci in range(N_CLIENTS):
            for si, (x, y) in enumerate(batches[ci]):
                batch = {
                    "images": jnp.asarray(x),
                    "labels": jnp.asarray(y, jnp.int32),
                    "mask": jnp.ones((BATCH,), jnp.float32),
                }
                states[ci], m = step(
                    states[ci], server_params, batch,
                    jax.random.PRNGKey(0), jnp.asarray(si),
                )
                jlosses[ci].append(float(m.loss))
        sp, ss, ncp, ncs = aggregate(
            mode,
            stack_clients([s["params"] for s in states]),
            {},
            jnp.asarray([0.5, 0.5]),
        )
        server_params = sp
        states = [
            {"params": p, "batch_stats": {}}
            for p in unstack_clients(ncp, N_CLIENTS)
        ]

    deltas = np.abs(np.asarray(jlosses) - np.asarray(tlosses))
    np.testing.assert_array_less(deltas[:, 0], 1e-4)
    assert int(np.sum(deltas < 1e-3)) >= deltas.size // 2, deltas
    assert deltas.max() < 0.1, deltas
    want = tserver.state_dict()["conv0.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(server_params["conv0"]["kernel"])
    assert np.max(np.abs(got - want)) < 5e-3


def test_densenet_fedbn_equals_fedavg():
    """Property the reference creates implicitly: with no BN state, fedbn's
    keep-local filter selects nothing — both modes produce bit-identical
    aggregated params."""
    _, jmodel, state0 = _mini_densenet_pair()
    rng = np.random.default_rng(3)
    batches = make_batches(rng, N_CLIENTS, 2)
    finals = {}
    for mode in ("fedavg", "fedbn"):
        step = jax.jit(
            make_train_step(
                jmodel, n_classes=N_CLASSES, image_size=IMG, lr=LR, mode=mode,
                transform_on_device=False,
            )
        )
        states = [jax.tree.map(jnp.copy, state0) for _ in range(N_CLIENTS)]
        server = state0["params"]
        for ci in range(N_CLIENTS):
            for si, (x, y) in enumerate(batches[ci]):
                batch = {
                    "images": jnp.asarray(x),
                    "labels": jnp.asarray(y, jnp.int32),
                    "mask": jnp.ones((BATCH,), jnp.float32),
                }
                states[ci], _ = step(
                    states[ci], server, batch, jax.random.PRNGKey(0),
                    jnp.asarray(si),
                )
        sp, _, ncp, _ = aggregate(
            mode, stack_clients([s["params"] for s in states]), {},
            jnp.asarray([0.5, 0.5]),
        )
        finals[mode] = (sp, ncp)
    for a, b in zip(jax.tree.leaves(finals["fedavg"]), jax.tree.leaves(finals["fedbn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Jigsaw: replay the exact jax permutation draws into the torch twin
# ---------------------------------------------------------------------------


class TorchJigsawResNet(TorchResNet18):
    def __init__(self, classes=N_CLASSES):
        super().__init__(classes=classes)
        from ccst_tpu.models.classifiers import JIGSAW_CLASSES

        self.jig_classifier = nn.Linear(512, JIGSAW_CLASSES)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x), self.jig_classifier(x)


def _resnet_pair(jigsaw=False, mixstyle=False):
    tcls = TorchJigsawResNet if jigsaw else TorchResNet18
    tmodel = tcls(classes=N_CLASSES)
    dg = "Jigsaw" if jigsaw else ("MixStyle" if mixstyle else "no_DG")
    jmodel = get_network("resnet18", classes=N_CLASSES, dg_method=dg)
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    params, stats = convert_torchvision_resnet(
        tmodel.state_dict(), variables["params"], variables["batch_stats"]
    )
    params = dict(params)

    def cp(t):  # copy: .numpy() aliases live torch memory (convert_resnet._to_np)
        return jnp.asarray(np.array(t.detach().numpy(), copy=True))

    params["class_classifier"] = {
        "kernel": cp(tmodel.fc.weight.T), "bias": cp(tmodel.fc.bias),
    }
    if jigsaw:
        params["jig_classifier"] = {
            "kernel": cp(tmodel.jig_classifier.weight.T),
            "bias": cp(tmodel.jig_classifier.bias),
        }
    return tmodel, jmodel, {"params": params, "batch_stats": stats}


def test_jigsaw_step_equivalence():
    """fed_run.py:57-62: loss = CE(class) + jig_weight * CE(order); the
    permuted grid batch is identical on both sides (the jax draws replayed
    through the SAME jigsaw_batch the production step uses). Data seed
    pinned: a flip-free stream (the conftest stream hit a ReLU float-tie
    that excursions the loss by ~0.016 — the documented chaos mode)."""
    from ccst_tpu.data.jigsaw import jigsaw_batch

    torch.manual_seed(5)
    rng = np.random.default_rng(1)
    tmodel, jmodel, state0 = _resnet_pair(jigsaw=True)
    x = rng.random((BATCH, IMG, IMG, 3), np.float32)
    y = rng.integers(0, N_CLASSES, BATCH).astype(np.int64)
    jig_w = 0.7

    # the production step derives its jigsaw key as split(rng)[1]
    rng_key = jax.random.PRNGKey(11)
    _, k_dg = jax.random.split(rng_key)
    jig_images, jig_labels = jigsaw_batch(k_dg, jnp.asarray(x), 30, 0.9)
    jig_images_np = np.array(jig_images)  # writable copy: torch warns on
    # zero-copy views of JAX buffers (and silently aliases them)
    jig_labels_np = np.asarray(jig_labels)

    # torch: same permuted batch through the twin
    tmodel.train()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    opt.zero_grad()
    logits_t, jig_logits_t = tmodel(
        torch.from_numpy(jig_images_np).permute(0, 3, 1, 2)
    )
    loss_t = F.cross_entropy(logits_t, torch.from_numpy(y)) + jig_w * F.cross_entropy(
        jig_logits_t, torch.from_numpy(jig_labels_np.astype(np.int64))
    )
    loss_t.backward()
    opt.step()

    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=IMG, lr=LR,
            dg_method="Jigsaw", jig_weight=jig_w, transform_on_device=False,
        )
    )
    batch = {
        "images": jnp.asarray(x),
        "labels": jnp.asarray(y, jnp.int32),
        "mask": jnp.ones((BATCH,), jnp.float32),
    }
    new_state, m = step(
        jax.tree.map(jnp.copy, state0), state0["params"], batch, rng_key,
        jnp.asarray(0),
    )
    assert abs(float(m.loss) - float(loss_t.item())) < 1e-4, (
        f"jigsaw loss: jax {float(m.loss):.6f} vs torch {float(loss_t):.6f}"
    )
    want = tmodel.state_dict()["conv1.weight"].detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(new_state["params"]["conv1"]["kernel"])
    assert np.max(np.abs(got - want)) < 5e-4


# ---------------------------------------------------------------------------
# FedDG / ELCFS: FOMAML meta step with precomputed frequency augmentation
# ---------------------------------------------------------------------------


def test_feddg_meta_step_equivalence(rng):
    """fed_run.py:98-116: inner CE -> clipped first-order meta update ->
    outer CE on the frequency-augmented view; total loss backprops to the
    slow weights only through the linear fast-weight map."""
    from ccst_tpu.ops.fft_aug import feddg_batch_augment
    from ccst_tpu.ops.image import eval_transform

    torch.manual_seed(6)
    tmodel, jmodel, state0 = _resnet_pair()
    x = rng.random((BATCH, IMG, IMG, 3), np.float32)
    y = rng.integers(0, N_CLASSES, BATCH).astype(np.int64)
    amp_bank = rng.random((3, 3, IMG, IMG), np.float32) * 2.0
    ms, clip = 1e-3, 1.0

    rng_key = jax.random.PRNGKey(17)
    _, k_dg = jax.random.split(rng_key)
    # precompute BOTH views exactly as the production step does
    # np.array (writable copies): torch.from_numpy on zero-copy views of
    # JAX buffers warns and would alias device memory if written
    images_n = np.array(eval_transform(jnp.asarray(x), IMG))
    freq_n = np.array(
        eval_transform(
            feddg_batch_augment(k_dg, jnp.asarray(x), jnp.asarray(amp_bank), L=0.0),
            IMG,
        )
    )

    # torch twin of the FOMAML step
    tmodel.train()
    xb = torch.from_numpy(images_n).permute(0, 3, 1, 2)
    fb = torch.from_numpy(freq_n).permute(0, 3, 1, 2)
    yb = torch.from_numpy(y)
    params = dict(tmodel.named_parameters())
    inner = F.cross_entropy(tmodel(xb), yb)
    grads = torch.autograd.grad(inner, list(params.values()), retain_graph=True)
    fast = {
        k: p - ms * torch.clamp(g.detach(), -clip, clip)
        for (k, p), g in zip(params.items(), grads)
    }
    outer = F.cross_entropy(
        torch.func.functional_call(tmodel, fast, (fb,)), yb
    )
    loss_t = inner + outer
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=IMG, lr=LR,
            dg_method="feddg", meta_step_size=ms, clip_value=clip,
        )
    )
    batch = {
        "images": jnp.asarray(x),
        "labels": jnp.asarray(y, jnp.int32),
        "mask": jnp.ones((BATCH,), jnp.float32),
        "amp_bank": jnp.asarray(amp_bank),
    }
    new_state, m = step(
        jax.tree.map(jnp.copy, state0), state0["params"], batch, rng_key,
        jnp.asarray(0),
    )
    assert abs(float(m.loss) - float(loss_t.item())) < 2e-4, (
        f"feddg loss: jax {float(m.loss):.6f} vs torch {float(loss_t):.6f}"
    )
    want = tmodel.state_dict()["conv1.weight"].detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(new_state["params"]["conv1"]["kernel"])
    assert np.max(np.abs(got - want)) < 5e-4


# ---------------------------------------------------------------------------
# MixStyle: capture the layer's jax draws, replay into a torch twin
# ---------------------------------------------------------------------------


def test_mixstyle_step_equivalence(rng, monkeypatch):
    """nets/layers.py:6-73 semantics: per-call Bernoulli gate, per-sample
    Beta lambda, batch permutation, detached statistics. The three MixStyle
    applications' draws are captured from an UNJITTED production step (the
    instrumented jax.random runs eagerly) and replayed into the twin."""
    torch.manual_seed(7)
    tmodel, jmodel, state0 = _resnet_pair(mixstyle=True)
    x = rng.random((BATCH, IMG, IMG, 3), np.float32)
    y = rng.integers(0, N_CLASSES, BATCH).astype(np.int64)

    draws = {"beta": [], "perm": [], "gate": []}
    real_beta, real_perm, real_bern = (
        jax.random.beta, jax.random.permutation, jax.random.bernoulli,
    )

    def rec_beta(key, a, b, shape=()):
        v = real_beta(key, a, b, shape)
        draws["beta"].append(np.asarray(v))
        return v

    def rec_perm(key, xs, **kw):
        v = real_perm(key, xs, **kw)
        draws["perm"].append(np.asarray(v))
        return v

    def rec_bern(key, p=0.5, shape=None):
        v = real_bern(key, p, shape)
        draws["gate"].append(np.asarray(v))
        return v

    monkeypatch.setattr(jax.random, "beta", rec_beta)
    monkeypatch.setattr(jax.random, "permutation", rec_perm)
    monkeypatch.setattr(jax.random, "bernoulli", rec_bern)

    step = make_train_step(  # NOT jitted: draws must be concrete
        jmodel, n_classes=N_CLASSES, image_size=IMG, lr=LR,
        dg_method="MixStyle", transform_on_device=False,
    )
    batch = {
        "images": jnp.asarray(x),
        "labels": jnp.asarray(y, jnp.int32),
        "mask": jnp.ones((BATCH,), jnp.float32),
    }
    rng_key = jax.random.PRNGKey(23)
    new_state, m = step(
        jax.tree.map(jnp.copy, state0), state0["params"], batch, rng_key,
        jnp.asarray(0),
    )
    monkeypatch.undo()
    assert len(draws["beta"]) == 3, draws  # layer1/2/3 applications

    def torch_mixstyle(t, i):
        gate = bool(draws["gate"][i])
        if not gate:
            return t
        lmda = torch.from_numpy(
            draws["beta"][i].astype(np.float32)
        ).reshape(-1, 1, 1, 1)
        perm = torch.from_numpy(draws["perm"][i].astype(np.int64))
        mu = t.mean(dim=(2, 3), keepdim=True).detach()
        sig = (t.var(dim=(2, 3), keepdim=True, unbiased=False) + 1e-6).sqrt().detach()
        normed = (t - mu) / sig
        mu_mix = mu * lmda + mu[perm] * (1 - lmda)
        sig_mix = sig * lmda + sig[perm] * (1 - lmda)
        return normed * sig_mix + mu_mix

    tmodel.train()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR)
    opt.zero_grad()
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    t = tmodel.maxpool(tmodel.relu(tmodel.bn1(tmodel.conv1(t))))
    for li in range(1, 5):
        t = getattr(tmodel, f"layer{li}")(t)
        if li <= 3:
            t = torch_mixstyle(t, li - 1)
    t = tmodel.avgpool(t).flatten(1)
    loss_t = F.cross_entropy(tmodel.fc(t), torch.from_numpy(y))
    loss_t.backward()
    opt.step()

    assert abs(float(m.loss) - float(loss_t.item())) < 2e-4, (
        f"mixstyle loss: jax {float(m.loss):.6f} vs torch {float(loss_t):.6f}"
    )
    want = tmodel.state_dict()["conv1.weight"].detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(new_state["params"]["conv1"]["kernel"])
    assert np.max(np.abs(got - want)) < 5e-4


# ---------------------------------------------------------------------------
# eval-path equivalence: IN-test swap and fedbn server evaluation
# ---------------------------------------------------------------------------


def test_in_test_eval_parity(rng):
    """--IN_test (fed_run.py:218-232): evaluate with every BatchNorm swapped
    for an affine InstanceNorm that REUSES the BN scale/bias. The torch twin
    applies InstanceNorm2d(affine) with the BN's weight/bias copied in."""
    torch.manual_seed(8)
    tmodel, jmodel, state0 = _resnet_pair()
    x = rng.random((2, IMG, IMG, 3), np.float32)

    class INWrap(nn.Module):
        def __init__(self, bn):
            super().__init__()
            self.inorm = nn.InstanceNorm2d(bn.num_features, affine=True, eps=1e-5)
            with torch.no_grad():
                self.inorm.weight.copy_(bn.weight)
                self.inorm.bias.copy_(bn.bias)

        def forward(self, t):
            return self.inorm(t)

    tin = copy.deepcopy(tmodel)
    for name, mod in list(tin.named_modules()):
        for child_name, child in list(mod.named_children()):
            if isinstance(child, nn.BatchNorm2d):
                setattr(mod, child_name, INWrap(child))
    tin.eval()
    with torch.no_grad():
        want = tin(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    eval_model = jmodel.clone(norm="in")
    got = np.asarray(
        eval_model.apply(
            {"params": state0["params"], "batch_stats": state0["batch_stats"]},
            jnp.asarray(x), train=False,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_fedbn_server_eval_parity():
    """test_fedbn (fed_run.py:350-381): server-side evaluation uses the
    cross-client average of BN params AND running stats; our aggregate's
    server state must produce the same eval logits as the torch average."""
    torch.manual_seed(9)
    tmodel = TorchDigitModel()
    jmodel = DigitModel(classes=N_CLASSES)
    state0 = digit_state_from_torch(tmodel, jmodel)
    rng = np.random.default_rng(31)
    batches = make_batches(rng, N_CLIENTS, 2, img=28)

    tserver = copy.deepcopy(tmodel)
    tclients = [copy.deepcopy(tserver) for _ in range(N_CLIENTS)]
    for ci in range(N_CLIENTS):
        torch_local_epoch(tclients[ci], tserver, batches[ci], "fedbn")
    torch_communicate("fedbn", tserver, tclients, [0.5, 0.5])
    # torch server BN running stats: weighted client average (the
    # torch_communicate twin averages every state-dict tensor incl. stats)

    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=28, lr=LR, mode="fedbn",
            transform_on_device=False,
        )
    )
    states = [jax.tree.map(jnp.copy, state0) for _ in range(N_CLIENTS)]
    for ci in range(N_CLIENTS):
        for si, (x, y) in enumerate(batches[ci]):
            batch = {
                "images": jnp.asarray(x),
                "labels": jnp.asarray(y, jnp.int32),
                "mask": jnp.ones((BATCH,), jnp.float32),
            }
            states[ci], _ = step(
                states[ci], state0["params"], batch, jax.random.PRNGKey(0),
                jnp.asarray(si),
            )
    stacked_stats = stack_clients([s["batch_stats"] for s in states])
    sp, ss, _, _ = aggregate(
        "fedbn",
        stack_clients([s["params"] for s in states]),
        stacked_stats,
        jnp.asarray([0.5, 0.5]),
    )
    # the standalone test_fedbn helper must agree with what aggregate
    # already folded into the server state
    from ccst_tpu.federated.aggregate import rebroadcast_bn_to_server

    direct = rebroadcast_bn_to_server(stacked_stats, jnp.asarray([0.5, 0.5]))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6
        ),
        direct, ss,
    )

    xe = rng.random((4, 28, 28, 3), np.float32)
    tserver.eval()
    with torch.no_grad():
        want = tserver(torch.from_numpy(xe).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        jmodel.apply(
            {"params": sp, "batch_stats": ss}, jnp.asarray(xe), train=False
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# 10-round drift curve at fixed LR
# ---------------------------------------------------------------------------


def test_ten_round_drift_curve():
    """5x the base harness horizon: per-round loss-delta curve must stay
    bounded (median per-round delta < 1e-3) — slow cross-framework drift
    from accumulated fp noise is expected, divergence is not."""
    torch.manual_seed(10)
    tmodel = TorchDigitModel()
    jmodel = DigitModel(classes=N_CLASSES)
    state0 = digit_state_from_torch(tmodel, jmodel)
    rng = np.random.default_rng(77)
    n_rounds, n_steps = 10, 2
    batches = make_batches(rng, N_CLIENTS, n_steps, img=28)

    tserver = copy.deepcopy(tmodel)
    tclients = [copy.deepcopy(tserver) for _ in range(N_CLIENTS)]
    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=28, lr=LR, mode="fedavg",
            transform_on_device=False,
        )
    )
    jstates = [jax.tree.map(jnp.copy, state0) for _ in range(N_CLIENTS)]
    jserver = state0["params"]

    curve = []
    for _ in range(n_rounds):
        tl, jl = [], []
        for ci in range(N_CLIENTS):
            tl += torch_local_epoch(tclients[ci], tserver, batches[ci], "fedavg")
            for si, (x, y) in enumerate(batches[ci]):
                batch = {
                    "images": jnp.asarray(x),
                    "labels": jnp.asarray(y, jnp.int32),
                    "mask": jnp.ones((BATCH,), jnp.float32),
                }
                jstates[ci], m = step(
                    jstates[ci], jserver, batch, jax.random.PRNGKey(0),
                    jnp.asarray(si),
                )
                jl.append(float(m.loss))
        torch_communicate("fedavg", tserver, tclients, [0.5, 0.5])
        sp, ss, ncp, ncs = aggregate(
            "fedavg",
            stack_clients([s["params"] for s in jstates]),
            stack_clients([s["batch_stats"] for s in jstates]),
            jnp.asarray([0.5, 0.5]),
        )
        jserver = sp
        jstates = [
            {"params": p, "batch_stats": s}
            for p, s in zip(
                unstack_clients(ncp, N_CLIENTS), unstack_clients(ncs, N_CLIENTS)
            )
        ]
        curve.append(float(np.max(np.abs(np.asarray(jl) - np.asarray(tl)))))

    print("drift curve (max per-round loss delta):",
          [f"{c:.2e}" for c in curve])
    # measured curve (CPU, this harness): starts at fp noise (1.7e-5),
    # peaks ~2.7e-2 at round 3 (a ReLU-flip excursion), and DECAYS back to
    # ~1e-3 — drift is bounded and mean-reverting, not divergent. Bounds set
    # from that measurement with margin.
    assert float(np.median(curve)) < 5e-3, curve
    assert max(curve) < 0.1, curve
    assert float(np.mean(curve[-3:])) < 5e-3, curve  # no late divergence
    # final server weights still track
    want = tserver.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    got = np.asarray(jserver["Conv_0"]["kernel"])
    assert np.max(np.abs(got - want)) < 1e-2


# ---------------------------------------------------------------------------
# AlexNet (nets/models.py:7-62) — the last zoo member without a torch twin.
# Exercises 11x11/s4 convs, floor-mode 3x2 maxpools, the identity
# AdaptiveAvgPool2d((6,6)) at the canonical 224px, and — the actual risk —
# BatchNorm1d(4096) at batch 4 under fedbn, where torch's unbiased running
# variance differs from the biased batch variance by 4/3 (the exact case
# TorchBatchNorm exists for, models/layers.py docstring).
# ---------------------------------------------------------------------------

ALEX_IMG = 224


class TorchAlexNet(nn.Module):
    """Twin of our AlexNet == the reference's (nets/models.py:7-62)."""

    def __init__(self, classes=N_CLASSES):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 11, stride=4, padding=2)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 192, 5, padding=2)
        self.bn2 = nn.BatchNorm2d(192)
        self.conv3 = nn.Conv2d(192, 384, 3, padding=1)
        self.bn3 = nn.BatchNorm2d(384)
        self.conv4 = nn.Conv2d(384, 256, 3, padding=1)
        self.bn4 = nn.BatchNorm2d(256)
        self.conv5 = nn.Conv2d(256, 256, 3, padding=1)
        self.bn5 = nn.BatchNorm2d(256)
        self.fc1 = nn.Linear(256 * 6 * 6, 4096)
        self.bn6 = nn.BatchNorm1d(4096)
        self.fc2 = nn.Linear(4096, 4096)
        self.bn7 = nn.BatchNorm1d(4096)
        self.fc3 = nn.Linear(4096, classes)

    def forward(self, x):
        x = F.max_pool2d(F.relu(self.bn1(self.conv1(x))), 3, 2)
        x = F.max_pool2d(F.relu(self.bn2(self.conv2(x))), 3, 2)
        x = F.relu(self.bn3(self.conv3(x)))
        x = F.relu(self.bn4(self.conv4(x)))
        x = F.max_pool2d(F.relu(self.bn5(self.conv5(x))), 3, 2)
        # 224px -> 6x6 here, so AdaptiveAvgPool2d((6,6)) is identity (the
        # flax side resizes only when the spatial size is not already 6)
        x = x.permute(0, 2, 3, 1).flatten(1)  # NHWC flatten order
        x = F.relu(self.bn6(self.fc1(x)))
        x = F.relu(self.bn7(self.fc2(x)))
        return self.fc3(x)


def alexnet_state_from_torch(tmodel, jmodel):
    variables = jmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ALEX_IMG, ALEX_IMG, 3)),
        train=False,
    )
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    for i, ti in enumerate(["conv1", "conv2", "conv3", "conv4", "conv5"]):
        params[f"Conv_{i}"]["kernel"] = sd[f"{ti}.weight"].transpose(2, 3, 1, 0)
        params[f"Conv_{i}"]["bias"] = sd[f"{ti}.bias"]
    for ji, ti in [("Dense_0", "fc1"), ("Dense_1", "fc2"),
                   ("class_classifier", "fc3")]:
        params[ji]["kernel"] = sd[f"{ti}.weight"].T
        params[ji]["bias"] = sd[f"{ti}.bias"]
    for bn in ("bn1", "bn2", "bn3", "bn4", "bn5", "bn6", "bn7"):
        params[bn]["scale"] = sd[f"{bn}.weight"]
        params[bn]["bias"] = sd[f"{bn}.bias"]
        stats[bn]["mean"] = sd[f"{bn}.running_mean"]
        stats[bn]["var"] = sd[f"{bn}.running_var"]
    to_j = lambda t: jax.tree.map(jnp.asarray, t)
    return {"params": to_j(params), "batch_stats": to_j(stats)}


def test_alexnet_forward_parity(rng):
    torch.manual_seed(7)
    tmodel = TorchAlexNet().eval()
    jmodel = get_network("alexnet", classes=N_CLASSES)
    state = alexnet_state_from_torch(tmodel, jmodel)
    x = rng.random((2, ALEX_IMG, ALEX_IMG, 3), np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = jmodel.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_alexnet_fedbn_step_equivalence(rng):
    """One fedbn round, 2 steps x 2 clients at 224px: per-step losses track
    to fp noise and the round's post-aggregation running stats agree —
    incl. bn6/bn7's BatchNorm1d(4096) unbiased running-var update at
    batch 4 (a 33% biased-vs-unbiased gap if mishandled)."""
    torch.manual_seed(11)
    tmodel = TorchAlexNet()
    jmodel = get_network("alexnet", classes=N_CLASSES)
    state0 = alexnet_state_from_torch(tmodel, jmodel)
    n_steps = 2
    batches = [
        [
            (rng.random((BATCH, ALEX_IMG, ALEX_IMG, 3), np.float32),
             rng.integers(0, N_CLASSES, BATCH).astype(np.int64))
            for _ in range(n_steps)
        ]
        for _ in range(N_CLIENTS)
    ]

    tserver = copy.deepcopy(tmodel)
    tclients = [copy.deepcopy(tserver) for _ in range(N_CLIENTS)]
    tlosses = [
        torch_local_epoch(tclients[ci], tserver, batches[ci], "fedbn")
        for ci in range(N_CLIENTS)
    ]
    torch_communicate("fedbn", tserver, tclients, [0.5, 0.5])

    step = jax.jit(
        make_train_step(
            jmodel, n_classes=N_CLASSES, image_size=ALEX_IMG, lr=LR,
            mode="fedbn", transform_on_device=False,
        )
    )
    states = [jax.tree.map(jnp.copy, state0) for _ in range(N_CLIENTS)]
    server_params = state0["params"]
    jlosses = [[] for _ in range(N_CLIENTS)]
    for ci in range(N_CLIENTS):
        for si, (x, y) in enumerate(batches[ci]):
            batch = {
                "images": jnp.asarray(x),
                "labels": jnp.asarray(y, jnp.int32),
                "mask": jnp.ones((BATCH,), jnp.float32),
            }
            states[ci], m = step(
                states[ci], server_params, batch,
                jax.random.PRNGKey(0), jnp.asarray(si),
            )
            jlosses[ci].append(float(m.loss))
    sp, _, ncp, ncs = aggregate(
        "fedbn",
        stack_clients([s["params"] for s in states]),
        stack_clients([s["batch_stats"] for s in states]),
        jnp.full((N_CLIENTS,), 0.5),
    )

    # Tolerance model (measured, see module docstring): step 1 runs from
    # identical weights and must match to fp noise; step 2 runs after one
    # SGD update over 32k ReLU sites (fc1/fc2 are 4096-wide), where single
    # near-zero ties flip between frameworks — measured excursion 5e-4 to
    # 1.1e-2 on this stream with params still tracking at ~1e-3.
    deltas = np.abs(np.asarray(jlosses) - np.asarray(tlosses))
    np.testing.assert_array_less(
        deltas[:, 0], 1e-4, err_msg=f"first-step mismatch: j={jlosses} t={tlosses}"
    )
    np.testing.assert_array_less(
        deltas, 0.05, err_msg=f"losses diverged: j={jlosses} t={tlosses}"
    )
    # fedbn keeps BN local: client 0's running stats (incl. the BN1d pair)
    # must match its torch twin after the round (unbiased-update semantics;
    # rtol covers the flip-perturbed batch-2 activations)
    new_stats = unstack_clients(ncs, N_CLIENTS)[0]
    tsd = {k: v.detach().numpy() for k, v in tclients[0].state_dict().items()}
    for bn in ("bn1", "bn5", "bn6", "bn7"):
        np.testing.assert_allclose(
            np.asarray(new_stats[bn]["var"]), tsd[f"{bn}.running_var"],
            rtol=5e-3, atol=1e-5, err_msg=bn,
        )
        np.testing.assert_allclose(
            np.asarray(new_stats[bn]["mean"]), tsd[f"{bn}.running_mean"],
            rtol=5e-3, atol=1e-3, err_msg=bn,  # atol: near-zero channel
            # means pick up ~1e-4 absolute offsets from the flip-perturbed
            # step-2 activations (mean magnitude is ~0.2)
        )
    # non-BN server weights averaged to the same place (per-element drift
    # bounded by the measured flip excursion)
    want = tserver.state_dict()["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(sp["Conv_0"]["kernel"]), want, atol=5e-3
    )

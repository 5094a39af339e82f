"""Logit parity: JAX models vs independent torch oracles.

Random-initialized torch models (with perturbed BN running stats) are
exported as state_dicts, imported through the checkpoint converters,
and compared logit-for-logit — the strongest checkpoint-compat check
available without the real datasets (BASELINE.json requires importing
the reference's ckpt.pth files).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from adaa_tpu import models  # noqa: E402
from adaa_tpu.models import torch_import  # noqa: E402
from tests.oracles.torch_models import TorchLCNN, TorchSpecRNet  # noqa: E402

B = 2
WAVE_LEN = 16_000


def _randomize_bn_stats(model, rng):
    """Give running stats non-trivial values so the import is exercised."""
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.copy_(
                torch.from_numpy(rng.standard_normal(
                    m.running_mean.shape).astype(np.float32) * 0.1)
            )
            m.running_var.copy_(
                torch.from_numpy(
                    1.0 + 0.3 * rng.random(m.running_var.shape).astype(np.float32)
                )
            )


def _np_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


class TestLCNNParity:
    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(0)
        torch.manual_seed(0)
        oracle = TorchLCNN(input_channels=1, num_coefficients=80)
        oracle.eval()
        with torch.no_grad():
            _randomize_bn_stats(oracle, rng)

        module = models.get_model(
            "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
        )
        variables = models.init_model(
            module, jax.random.PRNGKey(0), wave_length=WAVE_LEN
        )
        variables = torch_import.import_state_dict(
            "lcnn", _np_sd(oracle), variables
        )
        return oracle, module, variables

    def test_feature_input_parity(self, pair, rng):
        oracle, module, variables = pair
        feat = rng.standard_normal((B, 1, 80, 101)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feat)).numpy()
        out = np.asarray(module.apply(variables, jnp.asarray(feat), train=False))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_wave_input_parity(self, pair, rng):
        oracle, module, variables = pair
        wave = (rng.standard_normal((B, WAVE_LEN)) * 0.1).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(wave)).numpy()
        out = np.asarray(module.apply(variables, jnp.asarray(wave), train=False))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


class TestSpecRNetParity:
    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(1)
        torch.manual_seed(1)
        oracle = TorchSpecRNet(input_channels=1)
        oracle.eval()
        with torch.no_grad():
            _randomize_bn_stats(oracle, rng)

        module = models.get_model(
            "specrnet", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
        )
        variables = models.init_model(
            module, jax.random.PRNGKey(1), wave_length=WAVE_LEN
        )
        variables = torch_import.import_state_dict(
            "specrnet", _np_sd(oracle), variables
        )
        return oracle, module, variables

    def test_feature_input_parity(self, pair, rng):
        oracle, module, variables = pair
        feat = rng.standard_normal((B, 1, 80, 404)).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(feat)).numpy()
        out = np.asarray(module.apply(variables, jnp.asarray(feat), train=False))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    def test_wave_input_parity(self, pair, rng):
        oracle, module, variables = pair
        wave = (rng.standard_normal((B, WAVE_LEN)) * 0.1).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(wave)).numpy()
        out = np.asarray(module.apply(variables, jnp.asarray(wave), train=False))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
class TestRawNet3Parity:
    def test_wave_parity(self, rng):
        from tests.oracles.torch_rawnet3 import TorchRawNet3

        torch.manual_seed(2)
        oracle = TorchRawNet3()
        oracle.eval()
        with torch.no_grad():
            _randomize_bn_stats(oracle, rng)

        module = models.get_model("rawnet3", {})
        variables = models.init_model(
            module, jax.random.PRNGKey(2), wave_length=WAVE_LEN
        )
        variables = torch_import.import_state_dict(
            "rawnet3", _np_sd(oracle), variables
        )

        wave = (rng.standard_normal((B, WAVE_LEN)) * 0.1).astype(np.float32)
        with torch.no_grad():
            ref = oracle(torch.from_numpy(wave)).numpy()
        out = np.asarray(module.apply(variables, jnp.asarray(wave), train=False))
        np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-2)


def test_load_model_from_pth_file(tmp_path, rng):
    """The full checkpoint.path -> torch .pth -> flax flow, including
    the DataParallel 'module.' prefix fallback (src/utils.py:55-65)."""
    torch.manual_seed(3)
    oracle = TorchLCNN(input_channels=1, num_coefficients=80)
    oracle.eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(3))

    # save with DataParallel-style 'module.' prefixes
    sd = {f"module.{k}": v for k, v in oracle.state_dict().items()}
    pth = tmp_path / "ckpt.pth"
    torch.save(sd, pth)

    config = {
        "model": {"name": "lcnn",
                  "parameters": {"input_channels": 1,
                                 "frontend_algorithm": ["lfcc"]}},
        "checkpoint": {"path": str(pth)},
    }
    module, variables = models.load_model(config)

    wave = (rng.standard_normal((2, WAVE_LEN)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(wave)).numpy()
    out = np.asarray(module.apply(variables, jnp.asarray(wave), train=False))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_pgd_attack_output_parity(rng):
    """Deterministic PGD (random_start=False) through the FULL gradient
    chain — frontend backward + model backward + attack arithmetic —
    must match a torch implementation on the same weights."""
    import torch.nn.functional as F

    torch.manual_seed(4)
    oracle = TorchLCNN(input_channels=1, num_coefficients=80)
    oracle.eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(4))

    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(4), wave_length=WAVE_LEN
    )
    variables = torch_import.import_state_dict("lcnn", _np_sd(oracle),
                                               variables)

    x01 = rng.random((2, WAVE_LEN)).astype(np.float32)
    y = np.array([0, 1], np.int64)
    eps, alpha, steps = 0.002, 0.001, 3

    # torch PGD (pgd.py:59-76 semantics, no random start)
    adv_t = torch.from_numpy(x01.copy())
    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    for _ in range(steps):
        adv_t.requires_grad_(True)
        z = oracle(adv_t)
        out = torch.cat([-z, z], dim=1)
        cost = torch.nn.functional.cross_entropy(out, yt)
        (g,) = torch.autograd.grad(cost, adv_t)
        adv_t = adv_t.detach() + alpha * g.sign()
        delta = torch.clamp(adv_t - xt, -eps, eps)
        adv_t = torch.clamp(xt + delta, 0, 1).detach()

    # ours
    from adaa_tpu.attacks.gradient import pgd
    from adaa_tpu.attacks import core as attack_core

    logits_fn = attack_core.make_logits_fn(module, variables)
    atk = pgd(logits_fn, eps=eps, alpha=alpha, steps=steps,
              random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))

    ref = adv_t.numpy()
    # the perturbations are +-alpha sign steps; coordinate-exact
    # agreement means the gradient SIGNS matched there at every step.
    # ~0.7% of coordinates have near-zero gradients whose sign is
    # framework-noise-dependent — inherent to sign-based attacks.
    agree = np.mean(np.abs(adv_j - ref) < 1e-6)
    assert agree > 0.98, f"only {agree:.4%} of coordinates match"
    # and every coordinate stays in the shared eps-ball
    assert np.abs(adv_j - x01).max() <= eps + 1e-6
    assert np.abs(ref - x01).max() <= eps + 1e-6

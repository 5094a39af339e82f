"""Attack invariant tests on a fast toy detector.

Mirrors the invariants the reference attacks guarantee: eps-ball
membership (Linf/L2), [0,1] clamping, success against the surrogate,
L0 budget (OnePixel), and the minmax wave round trip
(src/aa/utils.py:4-14).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import adaa_tpu.attacks as attacks
from adaa_tpu.attacks import core

D = 64
B = 16


@pytest.fixture(scope="module")
def toy():
    """A fixed random linear 'detector': z = x @ w + b, (B, D) -> (B, 1).

    Bias centered so the clean batch has mixed labels and |z| stays
    small — attacks can actually cross the boundary.
    """
    rng = np.random.default_rng(7)
    w_np = rng.standard_normal((D, 1)).astype(np.float32) / np.sqrt(D)
    rng2 = np.random.default_rng(8)
    x_np = rng2.random((B, D)).astype(np.float32)
    b_np = -np.median(x_np @ w_np).astype(np.float32)

    w = jnp.asarray(w_np)
    b = jnp.asarray(b_np)

    def logits_fn(x):
        return x @ w + b

    x = jnp.asarray(x_np)
    y = core.predicted_label(logits_fn(x))  # model is 100% correct on x
    return logits_fn, x, y


def _acc(logits_fn, x, y):
    return float((core.predicted_label(logits_fn(x)) == y).mean())


class TestCore:
    def test_two_class_ce_matches_materialized(self, toy):
        logits_fn, x, y = toy
        z = logits_fn(x)
        logits2 = core.two_class_logits(z)
        # manual CE over the 2-class logits
        logz = jax.nn.log_softmax(logits2, axis=1)
        manual = -jnp.take_along_axis(logz, y[:, None], axis=1).mean()
        ours = core.two_class_ce(z, y)
        np.testing.assert_allclose(float(ours), float(manual), rtol=1e-5, atol=1e-6)

    def test_minmax_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 100)).astype(np.float32))
        x01, mn, mx = core.to_minmax(x)
        assert float(x01.min()) >= 0 and float(x01.max()) <= 1
        back = core.revert_minmax(x01, mn, mx)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


class TestGradientAttacks:
    def test_fgsm_ball_and_success(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack("FGSM", logits_fn, {"eps": 0.1})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(0))
        delta = np.asarray(adv - x)
        assert np.abs(delta).max() <= 0.1 + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _acc(logits_fn, adv, y) < _acc(logits_fn, x, y)

    def test_pgd_ball(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack("PGD", logits_fn, {"eps": 0.05, "steps": 10})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(1))
        delta = np.asarray(adv - x)
        assert np.abs(delta).max() <= 0.05 + 1e-6
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        # big-eps/alpha PGD on a linear model must fool everything
        atk2 = attacks.build_attack(
            "PGD", logits_fn, {"eps": 0.5, "alpha": 0.1, "steps": 20}
        )
        adv2 = jax.jit(atk2)(x, y, jax.random.PRNGKey(2))
        assert _acc(logits_fn, adv2, y) < 0.2

    def test_pgdl2_ball(self, toy):
        logits_fn, x, y = toy
        eps = 0.7
        atk = attacks.build_attack("PGDL2", logits_fn, {"eps": eps, "steps": 10})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(3))
        l2 = np.asarray(core.flat_norms(adv - x, "l2"))
        assert (l2 <= eps + 1e-4).all()
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1

    def test_registry_params_match_reference(self):
        reg = attacks.ATTACK_REGISTRY
        assert reg["PGD"][1] == {"eps": 0.0005, "steps": 10}
        assert reg["PGDL2_eps20"][1] == {"eps": 0.20, "steps": 10}
        assert reg["FGSM_eps00075"][1] == {"eps": 0.00075}
        assert reg["FAB_eta30"][1] == {"n_classes": 2, "eta": 30}
        assert reg["NO_ATTACK"] == (None, {})
        assert attacks.build_attack("NO_ATTACK", lambda x: x) is None


class TestCW:
    def test_cw_improves_and_stays_in_box(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "CW", logits_fn, {"c": 1.0, "steps": 100, "lr": 0.05}
        )
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(4))
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _acc(logits_fn, adv, y) < 1.0
        # unsuccessful samples stay exactly at the original (best_adv init)
        flipped = np.asarray(core.predicted_label(logits_fn(adv)) != y)
        unflipped_delta = np.asarray(jnp.abs(adv - x)).max(axis=1)[~flipped]
        if unflipped_delta.size:
            assert unflipped_delta.max() < 1e-5


class TestFAB:
    def test_fab_only_moves_fooled_samples(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack("FAB", logits_fn, {"n_classes": 2, "eta": 1.05})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(5))
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        moved = np.asarray(jnp.abs(adv - x).max(axis=1)) > 1e-6
        still_correct = np.asarray(core.predicted_label(logits_fn(adv)) == y)
        # every moved sample must be adversarial (FAB keeps x on failure)
        assert not (moved & still_correct).any()
        # on a linear model FAB should fool most points within eps=0.3
        assert moved.mean() > 0.5

    def test_fab_minimal_norm_reasonable(self, toy):
        """FAB's perturbation should be ~ the distance to the linear
        decision boundary (it is exactly computable for a linear model)."""
        logits_fn, x, y = toy
        atk = attacks.build_attack("FAB", logits_fn, {"n_classes": 2, "eta": 1.05})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(6))
        moved = np.asarray(jnp.abs(adv - x).max(axis=1)) > 1e-6
        linf = np.asarray(core.flat_norms(adv - x, "linf"))
        # boundary distance in Linf for linear z: |z| / ||w||_1
        z = np.asarray(logits_fn(x)).squeeze(-1)
        w = np.asarray(jax.grad(lambda xx: logits_fn(xx).sum())(x))[0]
        dist = np.abs(z) / np.abs(w).sum()
        # within a small factor of optimal for fooled samples
        ratio = linf[moved] / np.maximum(dist[moved], 1e-9)
        assert np.median(ratio) < 3.0

    def test_fab_merged_agrees_with_base(self, toy, monkeypatch):
        """ADAA_FAB_MERGED=1 (1 fwd+bwd per step vs fwd+bwd+fwd) must
        fool the same points at near-identical minimal norms — the
        on-chip agreement measured in profile_fab_merged_r5.json, pinned
        here on the exactly-solvable linear toy."""
        logits_fn, x, y = toy
        params = {"n_classes": 2, "eta": 1.05}
        base = attacks.build_attack("FAB", logits_fn, params)
        monkeypatch.setenv("ADAA_FAB_MERGED", "1")
        merged = attacks.build_attack("FAB", logits_fn, params)
        monkeypatch.delenv("ADAA_FAB_MERGED")

        key = jax.random.PRNGKey(5)
        adv_b = np.asarray(jax.jit(base)(x, y, key))
        adv_m = np.asarray(jax.jit(merged)(x, y, key))
        xs = np.asarray(x)
        d_b = np.abs(adv_b - xs).max(axis=1)
        d_m = np.abs(adv_m - xs).max(axis=1)
        moved_b, moved_m = d_b > 1e-6, d_m > 1e-6
        assert (moved_b == moved_m).all()
        both = moved_b & moved_m
        assert both.any()
        ratio = d_m[both] / np.maximum(d_b[both], 1e-9)
        assert np.median(ratio) == pytest.approx(1.0, abs=0.05)
        # merged outputs stay in the box and only fool, like base
        still_correct = np.asarray(
            core.predicted_label(logits_fn(jnp.asarray(adv_m))) == y)
        assert not (moved_m & still_correct).any()


class TestOnePixel:
    def test_l0_budget(self, toy):
        logits_fn, x, y = toy
        from adaa_tpu.attacks.onepixel import onepixel as op

        # small steps/pop to keep the test quick
        atk = op(logits_fn, pixels=1, steps=5, popsize=30, inf_batch=64)
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(7))
        changed = np.asarray(adv != x).sum(axis=1)
        assert (changed <= 1).all()
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1


class TestWaveSpaceWrapper:
    def test_attack_in_wave_space(self, toy):
        logits_fn, x01, y = toy
        # pretend x is a raw wave with arbitrary scale
        wave = (x01 - 0.3) * 12.0
        atk = attacks.build_attack("FGSM", logits_fn, {"eps": 0.01})
        wrapped = core.attack_in_wave_space(atk)
        adv_wave = jax.jit(wrapped)(wave, y, jax.random.PRNGKey(8))
        assert adv_wave.shape == wave.shape
        # perturbation bounded by eps * per-sample range
        rng_ = np.asarray(wave.max(axis=1) - wave.min(axis=1))
        delta = np.abs(np.asarray(adv_wave - wave)).max(axis=1)
        assert (delta <= 0.01 * rng_ + 1e-5).all()


class TestExtraAttacks:
    """Invariant checks for the audio-adapted stock-attack family."""

    NAMES = ["VANILA", "GN", "BIM", "RFGSM", "FFGSM", "TPGD", "EOTPGD",
             "MIFGSM", "NIFGSM", "SINIFGSM", "VMIFGSM", "VNIFGSM",
             "DIFGSM", "UPGD", "Jitter", "DeepFool"]

    @pytest.mark.parametrize("name", NAMES)
    def test_box_and_shape(self, toy, name):
        logits_fn, x, y = toy
        params = {}
        if name in ("BIM", "RFGSM", "MIFGSM", "NIFGSM", "SINIFGSM",
                    "VMIFGSM", "VNIFGSM", "DIFGSM", "UPGD", "Jitter",
                    "EOTPGD", "TPGD"):
            params["steps"] = 3
        if name in ("VMIFGSM", "VNIFGSM"):
            params["N"] = 2
        atk = attacks.build_attack(name, logits_fn, params)
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(11))
        assert adv.shape == x.shape
        assert float(adv.min()) >= 0.0 and float(adv.max()) <= 1.0
        assert bool(jnp.all(jnp.isfinite(adv)))

    def test_vanila_is_identity(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack("VANILA", logits_fn)
        np.testing.assert_array_equal(
            np.asarray(atk(x, y, jax.random.PRNGKey(0))), np.asarray(x)
        )

    def test_linf_family_respects_eps(self, toy):
        logits_fn, x, y = toy
        for name in ("BIM", "RFGSM", "MIFGSM", "UPGD"):
            atk = attacks.build_attack(
                name, logits_fn, {"eps": 0.03, "steps": 4}
            )
            adv = jax.jit(atk)(x, y, jax.random.PRNGKey(1))
            assert np.abs(np.asarray(adv - x)).max() <= 0.03 + 1e-6, name

    def test_deepfool_flips_and_freezes(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack("DeepFool", logits_fn, {"steps": 30})
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(2))
        # on a linear model one deepfool step crosses the boundary
        assert _acc(logits_fn, adv, y) < 0.5

    def test_upgd_rejects_dlr(self, toy):
        logits_fn, _, _ = toy
        with pytest.raises(ValueError):
            attacks.build_attack("UPGD", logits_fn, {"loss": "dlr"})


class TestAPGD:
    def test_apgd_ball_and_success(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "APGD", logits_fn, {"eps": 0.1, "steps": 20}
        )
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(9))
        assert np.abs(np.asarray(adv - x)).max() <= 0.1 + 1e-5
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _acc(logits_fn, adv, y) < 1.0

    def test_apgdt_ball_and_success(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "APGDT", logits_fn, {"eps": 0.1, "steps": 20, "n_classes": 2}
        )
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(10))
        assert np.abs(np.asarray(adv - x)).max() <= 0.1 + 1e-5
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _acc(logits_fn, adv, y) < 1.0

    def test_apgd_l2(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "APGD", logits_fn, {"norm": "L2", "eps": 0.5, "steps": 10}
        )
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(12))
        l2 = np.asarray(core.flat_norms(adv - x, "l2"))
        assert (l2 <= 0.5 + 1e-3).all()

    def test_apgd_rejects_untargeted_dlr(self, toy):
        logits_fn, _, _ = toy
        with pytest.raises(ValueError):
            attacks.build_attack("APGD", logits_fn, {"loss": "dlr"})


class TestSquareAndComposite:
    def test_square_ball_and_improvement(self, toy):
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "Square", logits_fn, {"eps": 0.1, "n_queries": 200}
        )
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(13))
        assert np.abs(np.asarray(adv - x)).max() <= 0.1 + 1e-5
        assert float(adv.min()) >= 0 and float(adv.max()) <= 1
        assert _acc(logits_fn, adv, y) < 1.0  # black-box search succeeds

    def test_multiattack_first_success(self, toy):
        logits_fn, x, y = toy
        from adaa_tpu.attacks.composite import multiattack
        from adaa_tpu.attacks.gradient import fgsm

        weak = fgsm(logits_fn, eps=1e-6)   # fools nothing
        strong = fgsm(logits_fn, eps=0.3)  # fools most
        atk = multiattack(logits_fn, [weak, strong])
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(14))
        acc = _acc(logits_fn, adv, y)
        strong_only = _acc(
            logits_fn, jax.jit(strong)(x, y, jax.random.PRNGKey(15)), y
        )
        assert acc <= strong_only + 1e-9

    def test_multiattack_keeps_first_success(self, toy):
        """A later attack must not replace an earlier attack's
        adversarial example (upstream multiattack.py keeps the first
        success per sample)."""
        logits_fn, x, y = toy

        def always_fooling(marker):
            # flip the prediction by crossing the decision boundary with
            # a huge step against the sign, then stamp a marker value
            def atk(x, y, key):
                g = jax.grad(
                    lambda x: core.two_class_ce(logits_fn(x), y).sum())(x)
                adv = jnp.clip(x + 0.5 * jnp.sign(g), 0.0, 1.0)
                return adv.at[:, 0].set(marker)

            return atk

        first = always_fooling(0.125)
        second = always_fooling(0.875)
        atk = multiattack_fn = __import__(
            "adaa_tpu.attacks.composite", fromlist=["multiattack"]
        ).multiattack(logits_fn, [first, second])
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(17))
        fooled_by_first = np.asarray(
            core.predicted_label(logits_fn(first(x, y, None))) != y
        )
        marks = np.asarray(adv[:, 0])
        # wherever the first attack succeeded, its marker must survive
        assert (marks[fooled_by_first] == 0.125).all()

    def test_autoattack_standard_composition(self, toy, monkeypatch):
        """AutoAttack 'standard' must assemble APGD-CE, APGD-T, FAB,
        Square in upstream order with upstream budgets (autoattack.py:
        attacks_to_run = ['apgd-ce', 'apgd-t', 'fab-t', 'square'];
        FAB-targeted degenerates to untargeted FAB for 2 classes)."""
        from adaa_tpu.attacks import composite

        calls = []

        def fake(name):
            def builder(logits_fn, **kw):
                calls.append((name, kw))
                return lambda x, y, key: x

            return builder

        import importlib

        # the package __init__ shadows the submodules with same-named
        # functions, so resolve module objects explicitly
        monkeypatch.setattr(
            importlib.import_module("adaa_tpu.attacks.apgd"),
            "apgd", fake("apgd"))
        monkeypatch.setattr(
            importlib.import_module("adaa_tpu.attacks.apgd"),
            "apgdt", fake("apgdt"))
        monkeypatch.setattr(
            importlib.import_module("adaa_tpu.attacks.fab"),
            "fab", fake("fab"))
        monkeypatch.setattr(
            importlib.import_module("adaa_tpu.attacks.square"),
            "square", fake("square"))
        logits_fn, x, y = toy
        composite.autoattack(logits_fn, eps=0.03)
        assert [c[0] for c in calls] == ["apgd", "apgdt", "fab", "square"]
        by_name = dict(calls)
        assert by_name["apgd"]["loss"] == "ce"
        assert by_name["apgd"]["steps"] == 100
        assert by_name["apgd"]["eps"] == 0.03
        assert by_name["fab"]["steps"] == 100
        assert by_name["square"]["n_queries"] == 5000

    def test_autoattack_runs_and_attacks(self, toy):
        from adaa_tpu.attacks.composite import autoattack

        logits_fn, x, y = toy
        atk = autoattack(logits_fn, eps=0.1)
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(18))
        assert adv.shape == x.shape
        assert np.abs(np.asarray(adv - x)).max() <= 0.1 + 1e-4
        assert _acc(logits_fn, adv, y) < _acc(logits_fn, x, y)


class TestRemainingStock:
    @pytest.mark.parametrize("name,params", [
        ("TIFGSM", {"steps": 3}),
        ("SparseFool", {"steps": 2, "max_inner": 5}),
        ("Pixle", {"restarts": 2, "max_iterations": 5}),
    ])
    def test_box_and_shape(self, toy, name, params):
        logits_fn, x, y = toy
        atk = attacks.build_attack(name, logits_fn, params)
        adv = jax.jit(atk)(x, y, jax.random.PRNGKey(16))
        assert adv.shape == x.shape
        assert float(adv.min()) >= -1e-6 and float(adv.max()) <= 1 + 1e-6
        assert bool(jnp.all(jnp.isfinite(adv)))

    def test_pixle_rearranges_only(self, toy):
        """Pixle moves existing values around — adv values must come
        from the original sample's value set (approximately)."""
        logits_fn, x, y = toy
        atk = attacks.build_attack(
            "Pixle", logits_fn, {"restarts": 3, "max_iterations": 10}
        )
        adv = np.asarray(jax.jit(atk)(x, y, jax.random.PRNGKey(17)))
        xs = np.asarray(x)
        for i in range(adv.shape[0]):
            assert np.isin(
                np.round(adv[i], 5), np.round(xs[i], 5)
            ).mean() > 0.99


class TestDifferentialEvolution:
    def test_minimizes_quadratic(self):
        from adaa_tpu.attacks.differential_evolution import (
            differential_evolution,
        )

        target = jnp.asarray([0.3, -0.7, 0.1])

        def func(pop):  # batched objective
            return ((pop - target) ** 2).sum(axis=1)

        res = differential_evolution(
            func,
            (jnp.full((3,), -2.0), jnp.full((3,), 2.0)),
            jax.random.PRNGKey(0),
            maxiter=150,
            popsize=20,
        )
        np.testing.assert_allclose(np.asarray(res.x), np.asarray(target),
                                   atol=0.05)
        assert float(res.fun) < 1e-2

    def test_early_stop(self):
        from adaa_tpu.attacks.differential_evolution import (
            differential_evolution,
        )

        calls = []

        def func(pop):
            calls.append(1)
            return (pop ** 2).sum(axis=1)

        res = differential_evolution(
            func, (jnp.full((2,), -1.0), jnp.full((2,), 1.0)),
            jax.random.PRNGKey(1), maxiter=50,
            stop_fn=lambda best: best < 0.5,
        )
        assert float(res.fun) <= 1.0

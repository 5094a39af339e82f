"""Cross-framework output parity for the bookkeeping-heavy attacks.

Deterministic variants of FAB, CW, APGDT and DeepFool run against a
torch reimplementation of the reference loops on identical weights
(same pattern as test_torch_parity.test_pgd_attack_output_parity):

* FAB  — reference adversarial_attacks/torchattacks/attacks/fab.py:269-291
  (first run is deterministic: use_rand_start=False). The torch loop
  uses the repo's sort-based projections via numpy (their optimality is
  pinned independently in tests/test_fab_projections.py), so this test
  isolates the gradient chain + loop arithmetic.
* CW   — cw.py:46-134 (tanh-space Adam, best-mask, periodic early stop).
* APGDT— apgdt.py:104-222 (momentum a=0.75, oscillation-halved step
  size); the jax random start is exported and fed to the torch loop so
  both sides iterate from the same point.
* DeepFool — deepfool.py:37-103 under the 2-class collapse both
  implementations share (sign toward the currently-predicted class's
  complement, per-sample freeze once fooled).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from adaa_tpu import models  # noqa: E402
from adaa_tpu.attacks import core as attack_core  # noqa: E402
from adaa_tpu.attacks import fab_projections as fp  # noqa: E402
from adaa_tpu.models import torch_import  # noqa: E402
from tests.oracles.torch_models import TorchLCNN  # noqa: E402
from tests.test_torch_parity import _np_sd, _randomize_bn_stats  # noqa: E402

B = 2
WAVE_LEN = 16_000


@pytest.fixture(scope="module")
def pair():
    """(torch oracle, jax module, imported variables, logits_fn)."""
    torch.manual_seed(7)
    oracle = TorchLCNN(input_channels=1, num_coefficients=80)
    oracle.eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle, np.random.default_rng(7))

    module = models.get_model(
        "lcnn", {"input_channels": 1, "frontend_algorithm": ["lfcc"]}
    )
    variables = models.init_model(
        module, jax.random.PRNGKey(7), wave_length=WAVE_LEN
    )
    variables = torch_import.import_state_dict("lcnn", _np_sd(oracle),
                                               variables)
    logits_fn = attack_core.make_logits_fn(module, variables)
    return oracle, module, variables, logits_fn


@pytest.fixture()
def xy(pair):
    rng = np.random.default_rng(11)
    # interior of [0, 1] so CW's atanh stays finite
    x01 = (0.02 + 0.96 * rng.random((B, WAVE_LEN))).astype(np.float32)
    # labels = the oracle's own predictions so every sample starts
    # "correctly classified" (all four attacks only move such points)
    oracle = pair[0]
    with torch.no_grad():
        z = oracle(torch.from_numpy(x01)).numpy()[:, 0]
    y = (z > 0).astype(np.int64)
    return x01, y


def _z_and_grad_torch(oracle, adv_t):
    adv_t = adv_t.detach().requires_grad_(True)
    z = oracle(adv_t)[:, 0]
    (g,) = torch.autograd.grad(z.sum(), adv_t)
    return z.detach(), g


def test_fab_output_parity(pair, xy):
    oracle, _, _, logits_fn = pair
    x01, y = xy
    steps, eps, alpha_max, eta, beta = 3, 0.3, 0.1, 1.05, 0.9

    # --- torch reference loop (fab.py:269-291, 2-class closed form) ---
    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    y_sign = (1.0 - 2.0 * yt.float())
    with torch.no_grad():
        z0 = oracle(xt)[:, 0]
    act = ((z0 > 0).long() == yt)
    im2 = xt.clone()
    adv_t = xt.clone()
    res2 = torch.full((B,), 1e10)
    x0 = xt.reshape(B, -1)
    x1 = xt.clone()
    for _ in range(steps):
        z, g = _z_and_grad_torch(oracle, x1)
        df = 2.0 * z * y_sign
        dg = 2.0 * g * y_sign[:, None]
        w = dg.reshape(B, -1)
        bb = -df + (w * x1.reshape(B, -1)).sum(1)
        t_cat = torch.cat([x1.reshape(B, -1), x0], 0).numpy()
        w_cat = torch.cat([w, w], 0).numpy()
        b_cat = torch.cat([bb, bb], 0).numpy()
        d3 = torch.from_numpy(np.array(fp.projection_linf(
            jnp.asarray(t_cat), jnp.asarray(w_cat), jnp.asarray(b_cat))))
        d1 = d3[:B].reshape(x1.shape)
        d2 = d3[B:].reshape(x1.shape)
        a0 = torch.clamp(d3.abs().max(dim=1).values, min=1e-8)
        a1 = a0[:B, None]
        a2 = a0[B:, None]
        alpha = torch.clamp(a1 / (a1 + a2), 0.0, alpha_max)
        x1 = torch.clamp(
            (x1 + eta * d1) * (1 - alpha) + (im2 + eta * d2) * alpha,
            0.0, 1.0)
        with torch.no_grad():
            is_adv = (oracle(x1)[:, 0] > 0).long() != yt
        t_norm = (x1 - im2).reshape(B, -1).abs().max(dim=1).values
        better = is_adv & (t_norm < res2) & act
        adv_t = torch.where(better[:, None], x1, adv_t)
        res2 = torch.where(better, t_norm, res2)
        x1 = torch.where(is_adv[:, None], im2 + (x1 - im2) * beta, x1)
    success = (res2 < 1e10) & act
    ref = torch.where(success[:, None], adv_t, xt).numpy()

    # --- ours ---
    from adaa_tpu.attacks.fab import fab

    atk = fab(logits_fn, norm="Linf", eps=eps, steps=steps, n_restarts=1,
              alpha_max=alpha_max, eta=eta, beta=beta)
    # single_run path: attack() wraps with the restart bookkeeping
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))

    # the restart wrapper only keeps runs that fool within the eps ball
    with torch.no_grad():
        still = (oracle(torch.from_numpy(ref))[:, 0] > 0).numpy()
    ref_kept = np.where(
        (((still > 0).astype(np.int64) != y)
         & (np.abs(ref - x01).max(1) <= eps))[:, None],
        ref, x01)
    np.testing.assert_allclose(adv_j, ref_kept, atol=2e-4, rtol=1e-3)
    assert np.abs(adv_j - x01).sum() > 0 or np.abs(ref_kept - x01).sum() == 0


def test_cw_output_parity(pair, xy):
    oracle, _, _, logits_fn = pair
    x01, y = xy
    steps, c, lr = 3, 1.0, 0.01

    # --- torch reference loop (cw.py:46-134) ---
    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    w = (0.5 * torch.log((1 + (xt * 2 - 1)) / (1 - (xt * 2 - 1)))).detach()
    w.requires_grad_(True)
    best_adv = xt.clone()
    best_l2 = torch.full((B,), 1e10)
    prev_cost = 1e10
    opt = torch.optim.Adam([w], lr=lr)
    returned = None
    for step in range(steps):
        adv = 0.5 * (torch.tanh(w) + 1)
        cur_l2 = ((adv - xt).reshape(B, -1) ** 2).sum(1)
        z = oracle(adv)
        out = torch.cat([-z, z], dim=1)
        oh = torch.eye(2)[yt]
        i = ((1 - oh) * out).max(dim=1).values
        j = (oh * out).sum(dim=1)
        f_loss = torch.clamp(j - i, min=0.0).sum()
        cost = cur_l2.sum() + c * f_loss
        opt.zero_grad()
        cost.backward()
        opt.step()
        pre = out.detach().argmax(1)
        correct = (pre == yt).float()
        mask = (1 - correct) * (best_l2 > cur_l2.detach()).float()
        best_l2 = mask * cur_l2.detach() + (1 - mask) * best_l2
        best_adv = mask[:, None] * adv.detach() + (1 - mask[:, None]) * best_adv
        if step % max(steps // 10, 1) == 0:
            if cost.item() > prev_cost:
                returned = best_adv
                break
            prev_cost = cost.item()
    ref = (best_adv if returned is None else returned).numpy()

    # --- ours ---
    from adaa_tpu.attacks.cw import cw

    atk = cw(logits_fn, c=c, kappa=0.0, steps=steps, lr=lr)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    np.testing.assert_allclose(adv_j, ref, atol=2e-4, rtol=1e-3)


def test_apgdt_output_parity(pair, xy):
    oracle, _, _, logits_fn = pair
    x01, y = xy
    steps, eps, rho = 4, 0.002, 0.75

    # export the jax random start so both loops share it (apgd.py run())
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 1)
    t_noise = np.asarray(
        2.0 * jax.random.uniform(keys[0], x01.shape, jnp.float32) - 1.0
    )
    denom = np.abs(t_noise).max(axis=1, keepdims=True)
    x_adv0 = np.clip(x01 + eps * t_noise / denom, 0.0, 1.0).astype(np.float32)

    # --- torch reference loop (apgdt.py:104-222, 2-class DLR) ---
    steps_2 = max(int(0.22 * steps), 1)
    steps_min = max(int(0.06 * steps), 1)
    size_decr = max(int(0.03 * steps), 1)
    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    y_sign = (2.0 * yt.float() - 1.0)

    def dlr(z):  # targeted DLR, 2-class closed form
        return -(y_sign * 2.0 * z) / (z.abs() + 1e-12)

    x_adv = torch.from_numpy(x_adv0.copy())
    z, g = _z_and_grad_torch(oracle, x_adv)
    li = dlr(z)
    grad = g * (-y_sign * 2.0 / (z.abs() + 1e-12) +
                y_sign * 2.0 * z * torch.sign(z) / (z.abs() + 1e-12) ** 2)[:, None]
    # grad of dlr wrt x via chain rule on z — equivalently autograd:
    x_adv2 = x_adv.detach().requires_grad_(True)
    zz = oracle(x_adv2)[:, 0]
    (grad,) = torch.autograd.grad(dlr(zz).sum(), x_adv2)
    li = dlr(zz).detach()
    grad_best = grad.clone()
    loss_best = li.clone()
    x_best = x_adv.clone()
    x_best_adv = x_adv.clone()
    step_size = torch.full((B, 1), 2.0 * eps)
    x_adv_old = x_adv.clone()
    loss_steps = torch.zeros(steps, B)
    loss_best_last_check = loss_best.clone()
    reduced_last_check = np.ones(B, bool)
    counter3, k = 0, steps_2
    for i in range(steps):
        a = 0.75 if i > 0 else 1.0
        grad2 = x_adv - x_adv_old
        x_adv_old = x_adv.clone()
        x1 = x_adv + step_size * torch.sign(grad)
        x1 = torch.clamp(torch.min(torch.max(x1, xt - eps), xt + eps), 0, 1)
        x1 = torch.clamp(
            torch.min(torch.max(x_adv + (x1 - x_adv) * a + grad2 * (1 - a),
                                xt - eps), xt + eps), 0, 1)
        x_adv = x1
        x_adv2 = x_adv.detach().requires_grad_(True)
        zz = oracle(x_adv2)[:, 0]
        li = dlr(zz)
        (grad,) = torch.autograd.grad(li.sum(), x_adv2)
        li = li.detach()
        pred_wrong = ((zz.detach() > 0).long() != yt)
        x_best_adv = torch.where(pred_wrong[:, None], x_adv, x_best_adv)
        improved = li > loss_best
        x_best = torch.where(improved[:, None], x_adv, x_best)
        grad_best = torch.where(improved[:, None], grad, grad_best)
        loss_best = torch.where(improved, li, loss_best)
        loss_steps[i] = li
        counter3 += 1
        if counter3 == k:
            t = torch.zeros(B)
            for c5 in range(k):
                prev = loss_steps[i - c5 - 1] if i - c5 - 1 >= 0 \
                    else torch.full((B,), -np.inf)
                t += (loss_steps[i - c5] > prev).float()
            fl_osc = (t <= k * rho).numpy()
            fl_red = (~reduced_last_check) & \
                (loss_best_last_check.numpy() >= loss_best.numpy())
            fl_osc = fl_osc | fl_red
            reduced_last_check = fl_osc.copy()
            loss_best_last_check = loss_best.clone()
            osc = torch.from_numpy(fl_osc)
            step_size = torch.where(osc[:, None], step_size / 2, step_size)
            x_adv = torch.where(osc[:, None], x_best, x_adv)
            grad = torch.where(osc[:, None], grad_best, grad)
            counter3 = 0
            k = max(k - size_decr, steps_min)
    # perturb(): keep adv only for samples the run fooled
    with torch.no_grad():
        z_init = oracle(xt)[:, 0]
    acc0 = ((z_init > 0).long() == yt)
    with torch.no_grad():
        z_fin = (oracle(x_best_adv)[:, 0] > 0).long()
    fooled = acc0 & (z_fin != yt)
    # acc_curr from the run's running acc: approximated by final pred
    ref = torch.where(fooled[:, None], x_best_adv, xt).numpy()

    # --- ours ---
    from adaa_tpu.attacks.apgd import apgdt

    atk = apgdt(logits_fn, norm="Linf", eps=eps, steps=steps, n_restarts=1,
                rho=rho)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           key))

    agree = np.mean(np.abs(adv_j - ref) < 1e-5)
    assert agree > 0.95, f"only {agree:.4%} of coordinates match"
    assert np.abs(adv_j - x01).max() <= eps + 1e-6


@pytest.mark.parametrize("steps,atol", [(1, 1e-5), (3, 5e-3)])
def test_deepfool_output_parity(pair, xy, steps, atol):
    """One step is coordinate-tight. Across steps DeepFool is chaotic:
    delta = |f'| w' / ||w'||^2 amplifies input noise ~100x per step
    (measured: 1e-7 jit-fusion reordering noise grows to ~7e-4 by step
    3), so multi-step parity is pinned at a drift-bounded tolerance."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    overshoot = 0.02

    # --- torch loop (deepfool.py:37-103 under the 2-class collapse) ---
    adv_t = torch.from_numpy(x01.copy())
    yt = torch.from_numpy(y)
    for _ in range(steps):
        z, g = _z_and_grad_torch(oracle, adv_t)
        pred = (z > 0).long()
        still = (pred == yt)
        sign = (1.0 - 2.0 * pred.float())
        f_prime = 2.0 * z * sign
        w_prime = 2.0 * g * sign[:, None]
        w_norm2 = (w_prime.reshape(B, -1) ** 2).sum(1) + 1e-12
        delta = (f_prime.abs() / w_norm2)[:, None] * w_prime
        adv_new = torch.clamp(adv_t + (1 + overshoot) * delta, 0, 1)
        adv_t = torch.where(still[:, None], adv_new, adv_t)
    ref = adv_t.numpy()

    # --- ours ---
    from adaa_tpu.attacks.extra import deepfool

    atk = deepfool(logits_fn, steps=steps, overshoot=overshoot)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    np.testing.assert_allclose(adv_j, ref, atol=atol, rtol=1e-3)
    assert np.abs(adv_j - x01).sum() > 0  # the attack actually moved


def test_bim_output_parity(pair, xy):
    """BIM's asymmetric running clamp (reference bim.py:41-78) against
    the torch loop on identical weights — sign-step attack, so parity
    is coordinate-exact wherever the gradient signs agree."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    eps, alpha, steps = 0.002, 0.001, 3

    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    adv_t = xt.clone()
    for _ in range(steps):
        adv_t = adv_t.detach().requires_grad_(True)
        z = oracle(adv_t)
        cost = torch.nn.functional.cross_entropy(
            torch.cat([-z, z], dim=1), yt
        )
        (g,) = torch.autograd.grad(cost, adv_t)
        step = adv_t + alpha * g.sign()
        a = torch.clamp(xt - eps, min=0)
        b = torch.where(step >= a, step, a)
        c = torch.where(b > xt + eps, xt + eps, b)
        adv_t = torch.clamp(c, max=1).detach()
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import bim

    atk = bim(logits_fn, eps=eps, alpha=alpha, steps=steps)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))

    agree = np.mean(np.abs(adv_j - ref) < 1e-6)
    assert agree > 0.98, f"only {agree:.4%} of coordinates match"
    assert (adv_j >= np.maximum(x01 - eps, 0) - 1e-6).all()
    assert (adv_j <= np.minimum(x01 + eps, 1) + 1e-6).all()


def test_pgdl2_output_parity(pair, xy):
    """PGDL2 (reference pgdl2.py:64-90, random start disabled): the
    normalized-gradient steps are continuous, so parity is tight-
    tolerance coordinate-level, not sign-exact."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    eps, alpha, steps = 0.5, 0.05, 3

    xt = torch.from_numpy(x01)
    yt = torch.from_numpy(y)
    adv_t = xt.clone()
    for _ in range(steps):
        adv_t = adv_t.detach().requires_grad_(True)
        z = oracle(adv_t)
        cost = torch.nn.functional.cross_entropy(
            torch.cat([-z, z], dim=1), yt
        )
        (g,) = torch.autograd.grad(cost, adv_t)
        gn = g.reshape(B, -1).norm(p=2, dim=1) + 1e-10
        adv_t = adv_t.detach() + alpha * g / gn[:, None]
        delta = adv_t - xt
        dn = delta.reshape(B, -1).norm(p=2, dim=1)
        factor = torch.clamp(eps / dn, max=1.0)
        adv_t = torch.clamp(xt + delta * factor[:, None], 0, 1).detach()
    ref = adv_t.numpy()

    from adaa_tpu.attacks.gradient import pgdl2

    atk = pgdl2(logits_fn, eps=eps, alpha=alpha, steps=steps,
                random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))

    # framework f32 reassociation perturbs the normalized direction at
    # ~1e-5 relative; with alpha=0.05 x 3 steps the observed worst
    # coordinate drift is ~1e-4 (1 of 32k elements)
    np.testing.assert_allclose(adv_j, ref, atol=2e-4)
    assert np.linalg.norm(adv_j - x01, axis=1).max() <= eps + 1e-5


# ---------------------------------------------------------------------------
# Momentum / random-start families (round 3 extension). Each test
# replicates the reference loop in torch under the 2-class widening the
# audio adaptation shares, with any random start exported from the jax
# side so both loops iterate from the same point.
# ---------------------------------------------------------------------------

EPS, ALPHA, STEPS = 0.002, 0.001, 3


def _ce_grad(oracle, adv_t, yt):
    """grad of CE(cat[-z, z], y) w.r.t. adv (the fork's 2-class loss)."""
    adv_t = adv_t.detach().requires_grad_(True)
    z = oracle(adv_t)
    cost = torch.nn.functional.cross_entropy(torch.cat([-z, z], dim=1), yt)
    (g,) = torch.autograd.grad(cost, adv_t)
    return g


def _mean_abs_t(g):
    return g.abs().reshape(g.shape[0], -1).mean(dim=1)[:, None]


def _linf_step(x, adv, g, alpha, eps):
    adv = adv + alpha * g.sign()
    return torch.clamp(x + torch.clamp(adv - x, -eps, eps), 0, 1)


def _assert_sign_step_parity(adv_j, ref, x01, eps, thresh=0.98):
    agree = np.mean(np.abs(adv_j - ref) < 1e-6)
    assert agree > thresh, f"only {agree:.4%} of coordinates match"
    assert (np.abs(adv_j - x01) <= eps + 1e-6).all()


def test_mifgsm_output_parity(pair, xy):
    """MIFGSM (reference mifgsm.py:42-80): normalized-gradient momentum."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay = 1.0
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    for _ in range(STEPS):
        g = _ce_grad(oracle, adv_t, yt)
        g = g / _mean_abs_t(g) + m * decay
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import mifgsm

    atk = mifgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_nifgsm_output_parity(pair, xy):
    """NIFGSM (nifgsm.py:40-73): Nesterov lookahead point."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay = 1.0
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    for _ in range(STEPS):
        g = _ce_grad(oracle, adv_t + decay * ALPHA * m, yt)
        g = decay * m + g / _mean_abs_t(g)
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import nifgsm

    atk = nifgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_sinifgsm_output_parity(pair, xy):
    """SINIFGSM (sinifgsm.py:44-90): scale-invariant gradient average.
    The reference differentiates w.r.t. adv THROUGH the /2^i scaling
    (each scale's gradient carries a 1/2^i chain factor) — this test
    pins that factor."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay, m_scales = 1.0, 3
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    for _ in range(STEPS):
        ag = torch.zeros_like(xt)
        for i in range(m_scales):
            a = adv_t.detach().requires_grad_(True)
            nes = (a + decay * ALPHA * m) / (2.0 ** i)
            z = oracle(nes)
            cost = torch.nn.functional.cross_entropy(
                torch.cat([-z, z], dim=1), yt)
            ag = ag + torch.autograd.grad(cost, a)[0]
        ag = ag / m_scales
        g = decay * m + ag / _mean_abs_t(ag)
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import sinifgsm

    atk = sinifgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay,
                   m=m_scales)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_rfgsm_output_parity(pair, xy):
    """RFGSM (rfgsm.py:38-70): sign-of-gaussian start + PGD steps. The
    jax start is recomputed here and fed to the torch loop."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    key = jax.random.PRNGKey(5)
    start = np.asarray(jnp.clip(
        jnp.asarray(x01)
        + ALPHA * jnp.sign(jax.random.normal(key, x01.shape, jnp.float32)),
        0, 1))

    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t = torch.from_numpy(start.copy())
    for _ in range(STEPS):
        g = _ce_grad(oracle, adv_t, yt)
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import rfgsm

    atk = rfgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           key))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_ffgsm_output_parity(pair, xy):
    """FFGSM (ffgsm.py:40-66): uniform start + single large step."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    eps, alpha = 0.002, 0.003
    key = jax.random.PRNGKey(6)
    start = np.asarray(jnp.clip(
        jnp.asarray(x01)
        + jax.random.uniform(key, x01.shape, jnp.float32, -eps, eps), 0, 1))

    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    g = _ce_grad(oracle, torch.from_numpy(start.copy()), yt)
    ref = _linf_step(xt, torch.from_numpy(start.copy()), g, alpha, eps).numpy()

    from adaa_tpu.attacks.extra import ffgsm

    atk = ffgsm(logits_fn, eps=eps, alpha=alpha)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           key))
    _assert_sign_step_parity(adv_j, ref, x01, eps)


def test_tpgd_output_parity(pair, xy):
    """TPGD (tpgd.py:38-65): KL(adv || clean) over the widened 2-class
    softmax, sum reduction, 0.001-gaussian start (exported from jax)."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    key = jax.random.PRNGKey(7)
    start = np.asarray(jnp.clip(
        jnp.asarray(x01)
        + 0.001 * jax.random.normal(key, x01.shape, jnp.float32), 0, 1))

    xt = torch.from_numpy(x01)
    with torch.no_grad():
        z0 = oracle(xt)
        p_ori = torch.softmax(torch.cat([-z0, z0], dim=1), dim=1)
    adv_t = torch.from_numpy(start.copy())
    for _ in range(STEPS):
        adv_t = adv_t.detach().requires_grad_(True)
        z = oracle(adv_t)
        cost = torch.nn.functional.kl_div(
            torch.log_softmax(torch.cat([-z, z], dim=1), dim=1),
            p_ori, reduction="sum")
        (g,) = torch.autograd.grad(cost, adv_t)
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.detach().numpy()

    from adaa_tpu.attacks.extra import tpgd

    atk = tpgd(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           key))
    # KL gradients are small near the clean point; sign flips at ~0
    # coordinates dominate the (tiny) disagreement budget
    _assert_sign_step_parity(adv_j, ref, x01, EPS, thresh=0.95)


def test_eotpgd_output_parity(pair, xy):
    """EOTPGD (eotpgd.py:45-84) with random_start=False: the model is
    deterministic in attack mode so the EOT sum is exact replication."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    eot_iter = 2
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t = xt.clone()
    for _ in range(STEPS):
        g = sum(_ce_grad(oracle, adv_t, yt) for _ in range(eot_iter))
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import eotpgd

    atk = eotpgd(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS,
                 eot_iter=eot_iter, random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_upgd_margin_output_parity(pair, xy):
    """UPGD (upgd.py:35-137) with the margin loss: momentum over the
    normalized margin gradient."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay = 1.0
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    oh = torch.eye(2)[yt]
    for _ in range(STEPS):
        a = adv_t.detach().requires_grad_(True)
        z = oracle(a)
        out = torch.cat([-z, z], dim=1)
        i = ((1 - oh) * out).max(dim=1).values
        j = (oh * out).sum(dim=1)
        cost = -torch.clamp(j - i, min=0).sum()
        (g,) = torch.autograd.grad(cost, a)
        g = g / _mean_abs_t(g) + m * decay
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import upgd

    atk = upgd(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS,
               random_start=False, loss="margin", decay=decay)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_jitter_2class_degeneracy(pair, xy):
    """Jitter (jitter.py:44-98) is gradient-degenerate under the fork's
    2-class widening: norm_z = max|(-z, z)| = |z|, so hat_z =
    softmax(scale·(-z, z)/|z|) = softmax(±scale·sign(z)) depends on z
    only through its sign — the MSE cost is piecewise constant and its
    analytic gradient is zero a.e. (the only nonzero component is the
    1/norm_r quotient term, a one-hot on the max-|delta| coordinate of
    already-fooled samples). The attack's steps are therefore driven by
    f32 roundoff noise; coordinate parity between frameworks is
    undefined. Pinned instead: (a) the torch replication's gradient at
    a generic perturbed point is ~0 off the divided one-hot, (b) our
    attack obeys the eps-ball and per-coordinate step budget."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    scale = 10.0
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    oh = torch.eye(2)[yt]

    # (a) analytic-degeneracy pin on the torch replication of the
    # reference loss at a perturbed point (so norm_r != 0)
    a = (xt + 1e-3 * torch.linspace(-1, 1, x01.shape[1])[None, :]) \
        .clamp(0, 1).requires_grad_(True)
    z = oracle(a)
    out = torch.cat([-z, z], dim=1)
    wrong = out.detach().argmax(1) != yt
    norm_z = out.abs().max(dim=1, keepdim=True).values
    hat_z = torch.softmax(scale * out / norm_z, dim=1)
    cost = ((hat_z - oh) ** 2).mean(dim=1)
    norm_r = (a - xt).abs().reshape(B, -1).max(dim=1).values
    divide = wrong & (norm_r != 0)
    cost = torch.where(divide, cost / norm_r.clamp(min=1e-12), cost)
    (g,) = torch.autograd.grad(cost.mean(), a)
    g = g.detach()
    # off the (at most one per divided sample) quotient coordinate the
    # gradient is pure roundoff: bound it far below any usable signal
    g_sorted = g.abs().sort(dim=1, descending=True).values
    assert float(g_sorted[:, 1:].max()) < 1e-6
    undivided = ~divide
    if bool(undivided.any()):
        assert float(g[undivided].abs().max()) < 1e-6

    # (b) box/step invariants of our implementation
    from adaa_tpu.attacks.extra import jitter

    atk = jitter(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, scale=scale,
                 std=0.0, random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    assert np.isfinite(adv_j).all()
    assert (np.abs(adv_j - x01) <= EPS + 1e-6).all()
    assert (np.abs(adv_j - x01) <= STEPS * ALPHA + 1e-6).all()


def _variance_offsets(key, steps, n, shape, eps, beta):
    """Replicate _variance_family's neighbor-draw key schedule."""
    offs = []
    for k in jax.random.split(key, steps):
        kn = jax.random.split(k, n)
        offs.append([
            np.array(jax.random.uniform(
                kk, shape, jnp.float32, -eps * beta, eps * beta))
            for kk in kn
        ])
    return offs


@pytest.mark.parametrize("nesterov", [False, True],
                         ids=["vmifgsm", "vnifgsm"])
def test_variance_family_output_parity(pair, xy, nesterov):
    """VMIFGSM / VNIFGSM (vmifgsm.py:46-110, vnifgsm.py:55-115):
    variance tuning with N uniform neighbors; the jax neighbor draws
    are exported and replayed in the torch loop."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay, n, beta = 1.0, 2, 1.5
    key = jax.random.PRNGKey(9)
    offs = _variance_offsets(key, STEPS, n, x01.shape, EPS, beta)

    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t = xt.clone()
    m = torch.zeros_like(xt)
    v = torch.zeros_like(xt)
    for s in range(STEPS):
        point = adv_t + decay * ALPHA * m if nesterov else adv_t
        g = _ce_grad(oracle, point, yt)
        avg = g + v
        gm = decay * m + avg / _mean_abs_t(avg)
        m = gm
        gv = sum(
            _ce_grad(oracle, adv_t + torch.from_numpy(offs[s][i]), yt)
            for i in range(n)
        )
        v = gv / n - g
        adv_t = _linf_step(xt, adv_t, gm, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import vmifgsm, vnifgsm

    factory = vnifgsm if nesterov else vmifgsm
    atk = factory(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay,
                  N=n, beta=beta)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           key))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_difgsm_output_parity(pair, xy):
    """DIFGSM (difgsm.py:48-110) with diversity_prob=0: the transform
    is never applied, so the loop reduces to deterministic MIFGSM —
    pins the difgsm wiring (key plumbing, momentum, clamp order)."""
    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay = 1.0
    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    for _ in range(STEPS):
        g = _ce_grad(oracle, adv_t, yt)
        g = g / _mean_abs_t(g) + m * decay
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import difgsm

    atk = difgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay,
                 diversity_prob=0.0, random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)


def test_tifgsm_output_parity(pair, xy):
    """TIFGSM (tifgsm.py) with diversity_prob=0: deterministic
    translation-invariant smoothing. The 1-D gaussian kernel conv on
    the wave axis is this port's audio adaptation of the reference's
    2-D kernel conv (tifgsm.py:92) — the torch loop replicates that
    adaptation on identical weights."""
    import scipy.stats as st

    oracle, _, _, logits_fn = pair
    x01, y = xy
    decay, len_kernel, nsig = 1.0, 15, 3
    kern1d = st.norm.pdf(np.linspace(-nsig, nsig, len_kernel))
    kernel = torch.from_numpy(
        (kern1d / kern1d.sum()).astype(np.float32))[None, None, :]

    xt, yt = torch.from_numpy(x01), torch.from_numpy(y)
    adv_t, m = xt.clone(), torch.zeros_like(xt)
    for _ in range(STEPS):
        g = _ce_grad(oracle, adv_t, yt)
        g = torch.nn.functional.conv1d(
            g[:, None, :], kernel, padding=len_kernel // 2)[:, 0]
        g = g / _mean_abs_t(g) + m * decay
        m = g
        adv_t = _linf_step(xt, adv_t, g, ALPHA, EPS)
    ref = adv_t.numpy()

    from adaa_tpu.attacks.extra import tifgsm

    atk = tifgsm(logits_fn, eps=EPS, alpha=ALPHA, steps=STEPS, decay=decay,
                 kernel_name="gaussian", len_kernel=len_kernel, nsig=nsig,
                 diversity_prob=0.0, random_start=False)
    adv_j = np.asarray(atk(jnp.asarray(x01), jnp.asarray(y.astype(np.int32)),
                           jax.random.PRNGKey(0)))
    _assert_sign_step_parity(adv_j, ref, x01, EPS)

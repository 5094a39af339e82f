"""Extended attack family — the rest of the vendored torchattacks fork.

The reference vendors the full torchattacks v3.2.7 library; only
FGSM/PGD/PGDL2/FAB/CW/OnePixel (+APGDT) carry the single-logit
adaptation — the remaining "stock" attacks would crash or silently
misbehave on the audio detectors (SURVEY §2.3). Here every attack is
audio-adapted: losses go through the widened (-z, z) logits
(attacks.core), per-class reductions collapse to their 2-class closed
forms, and image-shape reductions (``mean(dim=(1,2,3))``) become
per-sample reductions over the wave axis.

Implemented from the upstream algorithm definitions (file:line cites
refer to the vendored copies for behavior parity):

VANILA, GN, BIM, RFGSM, FFGSM, TPGD, EOTPGD, MIFGSM, NIFGSM, SINIFGSM,
VMIFGSM, VNIFGSM, DIFGSM, UPGD, Jitter, DeepFool.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core


def _bshape(x):
    return (x.shape[0],) + (1,) * (x.ndim - 1)


def _mean_abs(g):
    return jnp.mean(jnp.abs(g.reshape(g.shape[0], -1)), axis=1).reshape(_bshape(g))


def vanila(logits_fn, **kw) -> core.AttackFn:
    """Identity 'attack' (vanila.py)."""
    return lambda x, y, key: x


def gn(logits_fn, std: float = 0.1) -> core.AttackFn:
    """Gaussian noise (gn.py:24-37)."""

    def attack(x, y, key):
        return jnp.clip(x + std * jax.random.normal(key, x.shape, x.dtype), 0, 1)

    return attack


def bim(logits_fn, eps: float = 4 / 255, alpha: float = 1 / 255,
        steps: int = 0) -> core.AttackFn:
    """Basic iterative method with BIM's asymmetric clamp (bim.py:41-78)."""
    if steps == 0:
        steps = int(min(eps * 255 + 4, 1.25 * eps * 255))
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        def step(adv, _):
            g = grad_fn(adv, y)
            adv2 = adv + alpha * jnp.sign(g)
            a = jnp.maximum(x - eps, 0.0)
            b = jnp.where(adv2 >= a, adv2, a)
            c = jnp.where(b > x + eps, x + eps, b)
            return jnp.minimum(c, 1.0), None

        adv, _ = jax.lax.scan(step, x, None, length=steps)
        return adv

    return attack


def rfgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
          steps: int = 1) -> core.AttackFn:
    """R+FGSM (rfgsm.py:38-70): sign-of-noise start, PGD steps."""
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        adv = jnp.clip(
            x + alpha * jnp.sign(jax.random.normal(key, x.shape, x.dtype)), 0, 1
        )

        def step(adv, _):
            g = grad_fn(adv, y)
            adv = adv + alpha * jnp.sign(g)
            return jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1), None

        adv, _ = jax.lax.scan(step, adv, None, length=steps)
        return adv

    return attack


def ffgsm(logits_fn, eps: float = 8 / 255, alpha: float = 10 / 255) -> core.AttackFn:
    """Fast-FGSM (ffgsm.py:40-66): uniform start + one step."""
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        adv = jnp.clip(
            x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps), 0, 1
        )
        g = grad_fn(adv, y)
        adv = adv + alpha * jnp.sign(g)
        return jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)

    return attack


def tpgd(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
         steps: int = 7) -> core.AttackFn:
    """TRADES PGD (tpgd.py:38-65): KL(adv || clean) over the widened
    2-class softmax, sum reduction."""

    def attack(x, y, key):
        p_ori = jax.nn.softmax(core.two_class_logits(logits_fn(x)), axis=1)

        def kl_cost(adv):
            logp_adv = jax.nn.log_softmax(
                core.two_class_logits(logits_fn(adv)), axis=1
            )
            # torch KLDivLoss(reduction='sum'): sum p_ori * (log p_ori - logp_adv)
            return jnp.sum(p_ori * (jnp.log(jnp.maximum(p_ori, 1e-30)) - logp_adv))

        grad_fn = jax.grad(kl_cost)
        adv = jnp.clip(x + 0.001 * jax.random.normal(key, x.shape, x.dtype), 0, 1)

        def step(adv, _):
            g = grad_fn(adv)
            adv = adv + alpha * jnp.sign(g)
            return jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1), None

        adv, _ = jax.lax.scan(step, adv, None, length=steps)
        return adv

    return attack


def eotpgd(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 10, eot_iter: int = 2,
           random_start: bool = True) -> core.AttackFn:
    """EOT-PGD (eotpgd.py:45-84). The reference model is deterministic
    in attack mode, so the eot averaging is exact replication."""
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        adv = x
        if random_start:
            adv = jnp.clip(
                x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps), 0, 1
            )

        def step(adv, _):
            g = sum(grad_fn(adv, y) for _ in range(eot_iter))
            adv = adv + alpha * jnp.sign(g)
            return jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1), None

        adv, _ = jax.lax.scan(step, adv, None, length=steps)
        return adv

    return attack


def _momentum_family(logits_fn, eps, alpha, steps, decay, nesterov=False,
                     scales: int = 0):
    """Shared core of MIFGSM / NIFGSM / SINIFGSM (mifgsm.py:42-80,
    nifgsm.py:40-73, sinifgsm.py:44-90)."""
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        def step(carry, _):
            adv, momentum = carry
            point = adv + decay * alpha * momentum if nesterov else adv
            if scales:
                # the reference differentiates w.r.t. adv THROUGH the
                # /2^i scaling (sinifgsm.py:61-71), so each scale's
                # gradient carries a 1/2^i chain factor
                g = sum(
                    grad_fn(point / (2.0 ** i), y) / (2.0 ** i)
                    for i in range(scales)
                ) / scales
            else:
                g = grad_fn(point, y)
            g = decay * momentum + g / _mean_abs(g)
            adv = adv + alpha * jnp.sign(g)
            adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)
            return (adv, g), None

        (adv, _), _ = jax.lax.scan(
            step, (x, jnp.zeros_like(x)), None, length=steps
        )
        return adv

    return attack


def mifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 5, decay: float = 1.0) -> core.AttackFn:
    # NOTE mifgsm normalizes BEFORE adding momentum (g/mean + m*decay);
    # identical result to decay*m + g/mean.
    return _momentum_family(logits_fn, eps, alpha, steps, decay)


def nifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 5, decay: float = 1.0) -> core.AttackFn:
    return _momentum_family(logits_fn, eps, alpha, steps, decay, nesterov=True)


def sinifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
             steps: int = 5, decay: float = 1.0, m: int = 5) -> core.AttackFn:
    return _momentum_family(
        logits_fn, eps, alpha, steps, decay, nesterov=True, scales=m
    )


def _variance_family(logits_fn, eps, alpha, steps, decay, n, beta, nesterov):
    """VMIFGSM / VNIFGSM (vmifgsm.py:46-110): variance tuning with N
    uniform neighbors in a beta*eps ball."""
    grad_fn = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def attack(x, y, key):
        def step(carry, k):
            adv, momentum, v = carry
            point = adv + decay * alpha * momentum if nesterov else adv
            g = grad_fn(point, y)
            adv_grad = g + v
            gm = decay * momentum + adv_grad / _mean_abs(adv_grad)

            keys = jax.random.split(k, n)
            gv = jnp.zeros_like(x)
            for i in range(n):
                neighbor = adv + jax.random.uniform(
                    keys[i], x.shape, x.dtype, -eps * beta, eps * beta
                )
                gv = gv + grad_fn(neighbor, y)
            v = gv / n - g

            adv = adv + alpha * jnp.sign(gm)
            adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)
            return (adv, gm, v), None

        keys = jax.random.split(key, steps)
        (adv, _, _), _ = jax.lax.scan(
            step, (x, jnp.zeros_like(x), jnp.zeros_like(x)), keys
        )
        return adv

    return attack


def vmifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
            steps: int = 5, decay: float = 1.0, N: int = 20,
            beta: float = 3 / 2) -> core.AttackFn:
    return _variance_family(logits_fn, eps, alpha, steps, decay, N, beta, False)


def vnifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
            steps: int = 5, decay: float = 1.0, N: int = 20,
            beta: float = 3 / 2) -> core.AttackFn:
    return _variance_family(logits_fn, eps, alpha, steps, decay, N, beta, True)


def difgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 10, decay: float = 0.0, resize_rate: float = 0.9,
           diversity_prob: float = 0.5, random_start: bool = False
           ) -> core.AttackFn:
    """DI2-FGSM (difgsm.py:48-110). The image random-resize-and-pad
    diversity transform becomes its 1-D analog on the wave axis via
    ``scale_and_translate`` (traced scale/shift, static shapes)."""
    grad_fn_base = jax.grad(lambda x, y: core.two_class_ce(logits_fn(x), y))

    def diversity(x, k):
        length = x.shape[-1]
        lo, hi = sorted((length, int(length * resize_rate)))
        k1, k2, k3 = jax.random.split(k, 3)
        rnd = jax.random.randint(k1, (), lo, max(hi, lo + 1))
        scale = rnd.astype(jnp.float32) / length
        shift = jax.random.randint(
            k2, (), 0, jnp.maximum(length - rnd, 1)
        ).astype(jnp.float32)
        resized = jax.image.scale_and_translate(
            x, x.shape, (x.ndim - 1,),
            scale[None], shift[None], method="linear",
        )
        return jnp.where(jax.random.uniform(k3) < diversity_prob, resized, x)

    def attack(x, y, key):
        def step(carry, k):
            adv, momentum = carry
            k1, k2 = jax.random.split(k)
            g = jax.grad(
                lambda a: core.two_class_ce(logits_fn(diversity(a, k1)), y)
            )(adv)
            if decay:
                g = g / _mean_abs(g) + momentum * decay
                momentum = g
            adv = adv + alpha * jnp.sign(g)
            adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)
            return (adv, momentum), None

        adv0 = x
        key, k0 = jax.random.split(key)
        if random_start:
            adv0 = jnp.clip(
                x + jax.random.uniform(k0, x.shape, x.dtype, -eps, eps), 0, 1
            )
        keys = jax.random.split(key, steps)
        (adv, _), _ = jax.lax.scan(step, (adv0, jnp.zeros_like(x)), keys)
        return adv

    return attack


def upgd(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
         steps: int = 40, random_start: bool = False, loss: str = "ce",
         decay: float = 1.0, eot_iter: int = 1) -> core.AttackFn:
    """Ultimate PGD (upgd.py:35-137). 'dlr' needs >=4 classes (the
    upstream formula indexes sorted[-3:-4]) and is rejected, exactly as
    it would crash in the reference on 2-class logits."""
    if loss == "ce":
        cost_fn = lambda x, y: core.two_class_ce(logits_fn(x), y)
    elif loss == "margin":
        def cost_fn(x, y):
            logits2 = core.two_class_logits(logits_fn(x))
            oh = jax.nn.one_hot(y, 2, dtype=logits2.dtype)
            i = jnp.max((1 - oh) * logits2, axis=1)
            j = jnp.sum(oh * logits2, axis=1)
            return -jnp.sum(jnp.maximum(j - i, 0.0))
    else:
        raise ValueError(f"loss '{loss}' needs >= 4 classes (2-class audio)")
    grad_fn = jax.grad(cost_fn)

    def attack(x, y, key):
        adv0 = x
        if random_start:
            adv0 = jnp.clip(
                x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps), 0, 1
            )

        def step(carry, _):
            adv, momentum = carry
            g = sum(grad_fn(adv, y) for _ in range(eot_iter)) / eot_iter
            g = g / _mean_abs(g) + momentum * decay
            adv = adv + alpha * jnp.sign(g)
            adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)
            return (adv, g), None

        (adv, _), _ = jax.lax.scan(
            step, (adv0, jnp.zeros_like(x)), None, length=steps
        )
        return adv

    return attack


def jitter(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 10, scale: float = 10.0, std: float = 0.1,
           random_start: bool = True) -> core.AttackFn:
    """Jitter (jitter.py:44-98): MSE to one-hot on Linf-normalized
    scaled softmax, divided by the perturbation norm for already-wrong
    samples.

    NOTE: under the 2-class widening this loss is gradient-degenerate —
    hat_z = softmax(scale*(-z,z)/|z|) depends on z only through sign(z),
    so the cost is piecewise constant and the a.e.-zero gradient makes
    the sign steps roundoff-noise-driven (the reference would behave
    identically had it adapted Jitter; see
    tests/test_attack_parity.py::test_jitter_2class_degeneracy)."""

    def attack(x, y, key):
        def cost_fn(adv, k):
            logits2 = core.two_class_logits(logits_fn(adv))
            pre = jnp.argmax(logits2, axis=1)
            wrong = pre != y
            norm_z = jnp.max(jnp.abs(logits2), axis=1, keepdims=True)
            hat_z = jax.nn.softmax(scale * logits2 / norm_z, axis=1)
            if std != 0:
                hat_z = hat_z + std * jax.random.normal(k, hat_z.shape)
            oh = jax.nn.one_hot(y, 2, dtype=hat_z.dtype)
            cost = jnp.mean((hat_z - oh) ** 2, axis=1)
            norm_r = jnp.max(jnp.abs(adv - x).reshape(x.shape[0], -1), axis=1)
            divide = wrong & (norm_r != 0)
            cost = jnp.where(divide, cost / jnp.maximum(norm_r, 1e-12), cost)
            return jnp.mean(cost)

        key, k0 = jax.random.split(key)
        adv = x
        if random_start:
            adv = jnp.clip(
                x + jax.random.uniform(k0, x.shape, x.dtype, -eps, eps), 0, 1
            )

        def step(adv, k):
            g = jax.grad(cost_fn)(adv, k)
            adv = adv + alpha * jnp.sign(g)
            return jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1), None

        adv, _ = jax.lax.scan(step, adv, jax.random.split(key, steps))
        return adv

    return attack


def deepfool(logits_fn, steps: int = 50, overshoot: float = 0.02) -> core.AttackFn:
    """DeepFool (deepfool.py:37-103). The 2-class case collapses the
    per-class jacobian to one backward: f' = 2z(1-2y_pred),
    w' = 2(dz/dx)(1-2y_pred), delta = |f'| w' / ||w'||^2. Per-sample
    early stop becomes masking (already-fooled samples freeze)."""

    def z_and_grad(x):
        def zsum(xx):
            z = logits_fn(xx).squeeze(-1)
            return z.sum(), z

        (_, z), g = jax.value_and_grad(zsum, has_aux=True)(x)
        return z, g

    def attack(x, y, key):
        def step(adv, _):
            z, g = z_and_grad(adv)
            pred = (z > 0).astype(jnp.int32)
            still_correct = pred == y
            sign = (1.0 - 2.0 * pred.astype(x.dtype))  # toward the other class
            f_prime = 2.0 * z * sign
            w_prime = 2.0 * g * sign.reshape(_bshape(x))
            w_norm2 = jnp.sum(
                w_prime.reshape(x.shape[0], -1) ** 2, axis=1
            ) + 1e-12
            delta = (
                jnp.abs(f_prime) / w_norm2
            ).reshape(_bshape(x)) * w_prime
            adv_new = jnp.clip(adv + (1 + overshoot) * delta, 0, 1)
            adv = jnp.where(still_correct.reshape(_bshape(x)), adv_new, adv)
            return adv, None

        adv, _ = jax.lax.scan(step, x, None, length=steps)
        return adv

    return attack


def tifgsm(logits_fn, eps: float = 8 / 255, alpha: float = 2 / 255,
           steps: int = 10, decay: float = 1.0, kernel_name: str = "gaussian",
           len_kernel: int = 15, nsig: int = 3, resize_rate: float = 0.9,
           diversity_prob: float = 0.5, random_start: bool = False
           ) -> core.AttackFn:
    """TI-FGSM (tifgsm.py): translation-invariant gradient smoothing —
    the 2-D kernel conv on the gradient (tifgsm.py:92) becomes a 1-D
    kernel conv on the wave axis — combined with DIFGSM's input
    diversity and MIFGSM momentum."""
    import numpy as np
    import scipy.stats as st

    if kernel_name == "gaussian":
        xk = np.linspace(-nsig, nsig, len_kernel)
        kern1d = st.norm.pdf(xk)
        kernel = (kern1d / kern1d.sum()).astype(np.float32)
    elif kernel_name == "uniform":
        kernel = (np.ones(len_kernel) / len_kernel).astype(np.float32)
    elif kernel_name == "linear":
        kern1d = 1 - np.abs(
            np.linspace((-len_kernel + 1) / 2, (len_kernel - 1) / 2, len_kernel)
            / (len_kernel ** 2)
        )
        kernel = (kern1d / kern1d.sum()).astype(np.float32)
    else:
        raise ValueError(kernel_name)
    kernel_j = jnp.asarray(kernel)[:, None, None]  # (K, 1, 1) HIO

    from adaa_tpu.attacks.extra import difgsm as _difgsm  # reuse diversity

    def smooth(g):
        pad = len(kernel) // 2
        return jax.lax.conv_general_dilated(
            g[:, :, None], kernel_j, (1,), [(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )[:, :, 0]

    def diversity(x, k, length):
        lo, hi = sorted((length, int(length * resize_rate)))
        k1, k2, k3 = jax.random.split(k, 3)
        rnd = jax.random.randint(k1, (), lo, max(hi, lo + 1))
        scale = rnd.astype(jnp.float32) / length
        shift = jax.random.randint(
            k2, (), 0, jnp.maximum(length - rnd, 1)
        ).astype(jnp.float32)
        resized = jax.image.scale_and_translate(
            x, x.shape, (x.ndim - 1,), scale[None], shift[None],
            method="linear",
        )
        return jnp.where(jax.random.uniform(k3) < diversity_prob, resized, x)

    def attack(x, y, key):
        length = x.shape[-1]
        key, k0 = jax.random.split(key)
        adv0 = x
        if random_start:
            adv0 = jnp.clip(
                x + jax.random.uniform(k0, x.shape, x.dtype, -eps, eps), 0, 1
            )

        def step(carry, k):
            adv, momentum = carry
            k1, _ = jax.random.split(k)
            g = jax.grad(
                lambda a: core.two_class_ce(
                    logits_fn(diversity(a, k1, length)), y
                )
            )(adv)
            g = smooth(g)
            g = g / _mean_abs(g)
            g = g + momentum * decay
            momentum = g
            adv = adv + alpha * jnp.sign(g)
            adv = jnp.clip(x + jnp.clip(adv - x, -eps, eps), 0, 1)
            return (adv, momentum), None

        keys = jax.random.split(key, steps)
        (adv, _), _ = jax.lax.scan(step, (adv0, jnp.zeros_like(x)), keys)
        return adv

    return attack


def sparsefool(logits_fn, steps: int = 10, lam: float = 3.0,
               overshoot: float = 0.02, max_inner: int = 20) -> core.AttackFn:
    """SparseFool (sparsefool.py:44-129): DeepFool boundary point, then
    an L1 linear solver that saturates one coordinate at a time. The
    per-sample python while loops become batch-masked fixed-trip scans
    (max_inner coordinate saturations per outer step)."""

    def z_and_grad(x):
        def zsum(xx):
            z = logits_fn(xx).squeeze(-1)
            return z.sum(), z

        (_, z), g = jax.value_and_grad(zsum, has_aux=True)(x)
        return z, g

    def deepfool_step(adv):
        z, g = z_and_grad(adv)
        pred = (z > 0).astype(jnp.int32)
        sign = (1.0 - 2.0 * pred.astype(adv.dtype))
        f_prime = 2.0 * z * sign
        w_prime = 2.0 * g * sign[:, None]
        w_norm2 = jnp.sum(w_prime.reshape(adv.shape[0], -1) ** 2, axis=1) + 1e-12
        delta = (jnp.abs(f_prime) / w_norm2)[:, None] * w_prime
        return jnp.clip(adv + (1 + 0.02) * delta, 0, 1)

    def attack(x, y, key):
        b = x.shape[0]

        def outer(adv, _):
            z = logits_fn(adv).squeeze(-1)
            still_correct = ((z > 0).astype(jnp.int32)) == y

            boundary = deepfool_step(adv)
            adv_l = x + lam * (boundary - x)

            # gradient of (f_other - f_label) at the overshot point
            z2, g2 = z_and_grad(adv_l)
            # cost = f_pre_or_target - f_label; in the 2-class case both
            # reduce to the other class of the true label
            tgt_sign = 1.0 - 2.0 * y.astype(x.dtype)
            grad = 2.0 * g2 * tgt_sign[:, None]
            gn = jnp.sqrt(jnp.sum(grad.reshape(b, -1) ** 2, axis=1)) + 1e-12
            grad = grad / gn[:, None]

            # linear solver: saturate the largest-|grad| coordinate until
            # the plane through adv_l with normal grad is crossed
            plane_normal = grad
            plane_point = adv_l

            def solver_body(carry, _):
                x_i, coord = carry
                f_k = jnp.sum(
                    plane_normal * (x_i - plane_point), axis=1
                )
                sign_true = jnp.sign(
                    jnp.sum(plane_normal * (x - plane_point), axis=1) + 1e-12
                )
                active = (jnp.sign(f_k + 0.001 * sign_true) == sign_true) & (
                    jnp.abs(coord).max(axis=1) > 0
                )
                f_kb = f_k + 0.001 * sign_true
                pert = jnp.maximum(
                    jnp.abs(f_kb) / (jnp.abs(coord).max(axis=1) + 1e-12), 1e-4
                )
                amax = jnp.argmax(jnp.abs(coord), axis=1)
                mask = jax.nn.one_hot(amax, x.shape[1], dtype=x.dtype)
                r_i = pert[:, None] * mask * jnp.sign(coord)
                x_new = jnp.clip(x_i + r_i, 0, 1)
                x_i = jnp.where(active[:, None], x_new, x_i)
                coord = jnp.where(
                    active[:, None], coord * (1.0 - mask), coord
                )
                return (x_i, coord), None

            (x_i, _), _ = jax.lax.scan(
                solver_body, (x, plane_normal), None, length=max_inner
            )

            adv_new = jnp.clip(x + (1 + overshoot) * (x_i - x), 0, 1)
            adv = jnp.where(still_correct[:, None], adv_new, adv)
            return adv, None

        adv, _ = jax.lax.scan(outer, x, None, length=steps)
        return adv

    return attack


def pixle(logits_fn, x_dimensions=(2, 10), restarts: int = 20,
          max_iterations: int = 100) -> core.AttackFn:
    """Pixle (pixle.py): black-box pixel-rearrangement search; the image
    patches become wave segments — each query copies a random source
    segment's values onto a random destination, accepted when the
    true-class probability drops."""
    lo = max(1, int(x_dimensions[0]))
    hi = max(lo + 1, int(x_dimensions[1]))

    def true_prob(x, y):
        z = logits_fn(x).squeeze(-1)
        sign = 2.0 * y.astype(z.dtype) - 1.0
        return jax.nn.sigmoid(2.0 * sign * z)

    def attack(x, y, key):
        b, length = x.shape
        idx = jnp.arange(length)[None, :]
        best = x
        best_p = true_prob(x, y)

        def body(it, carry):
            best, best_p, key = carry
            key, k1, k2, k3 = jax.random.split(key, 4)
            s = jax.random.randint(k1, (), lo, hi)
            src = jax.random.randint(k2, (b, 1), 0, length - s + 1)
            dst = jax.random.randint(k3, (b, 1), 0, length - s + 1)
            # candidate: segment at dst replaced by values from src
            shift = (src - dst)  # per sample
            gather_idx = jnp.clip(idx + shift, 0, length - 1)
            moved = jnp.take_along_axis(best, gather_idx, axis=1)
            in_dst = (idx >= dst) & (idx < dst + s)
            candidate = jnp.where(in_dst, moved, best)
            p_new = true_prob(candidate, y)
            accept = p_new < best_p
            best = jnp.where(accept[:, None], candidate, best)
            best_p = jnp.where(accept, p_new, best_p)
            return (best, best_p, key)

        best, best_p, _ = jax.lax.fori_loop(
            0, restarts * max_iterations, body, (best, best_p, key)
        )
        originally_correct = core.predicted_label(logits_fn(x)) == y
        return jnp.where(originally_correct[:, None], best, x)

    return attack

"""adaa_tpu.utils.flops — scan-aware analytic FLOP counting.

Pins the property that motivated the module (VERDICT r4 item 5 follow-
up): iterative attack programs must count their loop bodies ONCE PER
ITERATION, which XLA's HloCostAnalysis does not do for while/scan.
"""
import jax
import jax.numpy as jnp
import pytest

from adaa_tpu.utils.flops import count_flops


def test_dot_general_exact():
    def f(x):
        return x @ jnp.ones((8, 16))

    r = count_flops(f, jnp.ones((4, 8)))
    assert r["flops"] == 2 * 4 * 16 * 8


def test_conv_exact():
    def f(x):
        k = jnp.ones((3, 3, 4, 16))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    r = count_flops(f, jnp.ones((2, 10, 10, 4)))
    assert r["flops"] == 2 * (2 * 10 * 10 * 16) * (4 * 9)


def test_grouped_conv_uses_per_group_fanin():
    def f(x):
        k = jnp.ones((3, 2, 8))  # W, C_in/groups, C_out with groups=2
        return jax.lax.conv_general_dilated(
            x, k, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=2)

    r = count_flops(f, jnp.ones((2, 10, 4)))
    assert r["flops"] == 2 * (2 * 10 * 8) * (2 * 3)


def test_scan_multiplies_body():
    def f(x):
        def body(c, _):
            return c @ c, ()

        c, _ = jax.lax.scan(body, x, None, length=5)
        return c

    r = count_flops(f, jnp.ones((8, 8)))
    assert r["flops"] == 5 * 2 * 8 * 8 * 8


def test_nested_scan():
    def f(x):
        def inner(c, _):
            return c @ c, ()

        def outer(c, _):
            c, _ = jax.lax.scan(inner, c, None, length=3)
            return c, ()

        c, _ = jax.lax.scan(outer, x, None, length=4)
        return c

    r = count_flops(f, jnp.ones((8, 8)))
    assert r["flops"] == 4 * 3 * 2 * 8 * 8 * 8


def test_while_trip_multiplier_and_flag():
    def f(x):
        def cond(s):
            return s[1] < 7

        def body(s):
            return (s[0] @ s[0], s[1] + 1)

        return jax.lax.while_loop(cond, body, (x, 0))[0]

    r1 = count_flops(f, jnp.ones((8, 8)))
    r7 = count_flops(f, jnp.ones((8, 8)), while_trip=7)
    assert r1["has_while"] and r7["has_while"]
    assert r7["flops"] == 7 * r1["flops"] == 7 * 2 * 8 * 8 * 8


def test_grad_through_jit_counts_backward():
    def f(x):
        w = jnp.ones((8, 8))

        @jax.jit
        def loss(a):
            return jnp.sum((a @ w) ** 2)

        return jax.grad(loss)(x)

    r = count_flops(f, jnp.ones((4, 8)))
    # forward a@w plus backward g@w^T (dW is dead — x is the only input)
    assert r["flops"] >= 2 * 2 * 4 * 8 * 8


def test_scatter_not_flagged():
    def f(x):
        return x.at[0].add(1.0)

    r = count_flops(f, jnp.ones((8,)))
    assert "unknown_hops" not in r


def test_iterative_attack_scales_with_steps():
    """PGD-k must count ~k x FGSM — the exact property cost_analysis
    got wrong (recorded PGD-10 at one body)."""
    from adaa_tpu.attacks import core as attack_core
    from adaa_tpu.attacks.gradient import fgsm, pgd

    w = jax.random.normal(jax.random.PRNGKey(0), (32, 1)) * 0.1

    def logits_fn(x):
        return x @ w

    x = jnp.zeros((4, 32))
    y = jnp.zeros((4,), jnp.int32)
    key = jax.random.PRNGKey(1)

    def run(atk):
        def attack_batch(x, y, k):
            x01, mn, mx = attack_core.to_minmax(x)
            return attack_core.revert_minmax(atk(x01, y, k), mn, mx)

        return count_flops(attack_batch, x, y, key)["flops"]

    f1 = run(fgsm(logits_fn, eps=0.01))
    f10 = run(pgd(logits_fn, eps=0.01, steps=10))
    assert f10 == pytest.approx(10 * f1, rel=0.2)

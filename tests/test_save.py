"""Attack.save-equivalent loop tests (attacks/save.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from adaa_tpu.attacks import core
from adaa_tpu.attacks.gradient import fgsm
from adaa_tpu.attacks.save import save_adversarial_dataset


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)


def test_save_adversarial_dataset(tmp_path):
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((32, 1)).astype(np.float32) / 4)
    logits_fn = lambda x: x @ w
    atk = fgsm(logits_fn, eps=0.2)

    batches = []
    for i in range(3):
        x = rng.random((8, 32)).astype(np.float32)
        y = np.asarray(core.predicted_label(logits_fn(jnp.asarray(x))))
        batches.append([x, np.full(8, 16000), y])

    path = tmp_path / "adv.npz"
    rob, l2, ms = save_adversarial_dataset(
        atk, logits_fn, _ListLoader(batches), save_path=str(path),
        return_verbose=True, save_pred=True, verbose=False,
    )
    assert 0.0 <= rob <= 100.0
    assert l2 > 0.0
    z = np.load(path)
    assert z["adv_inputs"].shape == (24, 32)
    assert z["labels"].shape == (24,)
    assert z["preds"].shape == (24,)
    # robust accuracy reported == accuracy of saved preds vs labels
    assert abs(rob - 100.0 * (z["preds"] == z["labels"]).mean()) < 1e-6

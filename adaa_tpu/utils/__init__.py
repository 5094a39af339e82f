"""Utility subpackage: seeding, PRNG threading, checkpoint IO."""
from adaa_tpu.utils.seeding import set_seed  # noqa: F401
from adaa_tpu.utils.checkpoints import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)

"""Training engine: clean + adversarial trainers and strategies."""
from adaa_tpu.training.gd_trainer import GDTrainer  # noqa: F401
from adaa_tpu.training.adv_trainer import (  # noqa: F401
    ADV_TRAINER_REGISTRY,
    AdversarialGDTrainer,
)

"""Audio data layer: manifests, host DSP, prefetching loader."""
from adaa_tpu.data.base import (  # noqa: F401
    SOX_SILENCE,
    WAVE_FAKE_CUT,
    WAVE_FAKE_SR,
    apply_pad,
    wavefake_preprocessing,
    wavefake_preprocessing_on_batch,
)
from adaa_tpu.data.detection import DetectionDataset  # noqa: F401
from adaa_tpu.data.loader import DataLoader  # noqa: F401
from adaa_tpu.data.synthetic import SyntheticDataset  # noqa: F401

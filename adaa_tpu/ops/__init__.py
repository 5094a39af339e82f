"""TPU-native DSP ops: STFT, filterbanks, frontends, fused kernels."""
from adaa_tpu.ops.frontends import get_frontend  # noqa: F401

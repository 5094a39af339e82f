"""adaa_tpu — TPU-native audio-deepfake adversarial-attack framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
piotrkawa/audio-deepfake-adversarial-attacks (INTERSPEECH 2023,
"Defense Against Adversarial Attacks on Audio DeepFake Detection"):

* differentiable audio frontends (LFCC / MFCC / mel-spec) as fused
  MXU matmul pipelines,
* the LCNN / SpecRNet / RawNet3 detectors in flax.linen with
  torch-checkpoint-compatible weight import,
* the adapted torchattacks suite (FGSM, PGD, PGDL2, CW, FAB, OnePixel)
  as jit-compiled jax.grad loops with the single-logit -> two-class
  wrapper, batched across a device mesh,
* clean + adversarial trainers with the five attack-scheduling
  strategies, and the reference's CLI / yaml / metric-name surface.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

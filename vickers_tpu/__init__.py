"""vickers_tpu — a TPU-native (JAX / Flax / Pallas / pjit) framework for
measuring Vickers hardness indentations in microscope images.

Re-designed from scratch with the capabilities of the PyTorch reference
``ZooMEISTER/vickers-hardness-Unet`` (see SURVEY.md):

- ``vickers_tpu.models``   — Flax ResNet-34 U-Net (NHWC, bf16-friendly),
  topologically identical to ``smp.Unet('resnet34', classes=1)``.
- ``vickers_tpu.ops``      — the TPU kernel layer: fused image preprocessing,
  on-device augmentation, morphology, connected components, rotated-rect /
  quadrilateral fitting, diagonal + HV measurement.
- ``vickers_tpu.train``    — BCE+Dice training engine (optax AdamW + cosine),
  history.json-compatible metrics, Orbax checkpoints.
- ``vickers_tpu.infer``    — jitted whole-graph image→detections engine,
  batched + tiled high-res modes.
- ``vickers_tpu.parallel`` — device-mesh data parallelism via shard_map.
- ``vickers_tpu.compat``   — ``.pth`` state-dict round-trip and reference
  entry-point compatibility (``infer_pth_gui`` / ``ui_infer_*``).
"""

__version__ = "0.1.0"

"""image_segmentation_lab_tpu — TPU-native semantic-segmentation framework.

A ground-up JAX/XLA/Pallas re-design with the full capability surface of the
reference PyTorch lab ``HanHan-TR/Image_Segmentation_lab`` (see SURVEY.md):
config-driven registries assemble encoder-decoder segmentors; training, whole
and sliding-window inference, and confusion-matrix evaluation all run as
compiled XLA programs; data parallelism is mesh/pjit over ICI.
"""

__version__ = "0.1.0"

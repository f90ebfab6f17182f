"""Embedding models and DSP frontend (JAX/Flax)."""

from vbx_tpu.models.resnet import (  # noqa: F401
    BasicBlock, Bottleneck, ResNetXVector, SELayer, convert_torch_state_dict,
    fold_batchnorm, load_torch_checkpoint, resnet34, resnet101, se_resnet34,
)

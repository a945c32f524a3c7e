"""Minimal stand-in for `torchvision` (not installed here) covering the
symbols the reference actually touches at runtime: transforms.Compose,
transforms.ToTensor, transforms.ToPILImage (custom_transforms.py:97-98,
141-142; train.py:439-462) and utils.make_grid (imported at train.py:21,
never called on the training path). Only used to RUN the reference for
baseline/parity measurement."""

from torchvision import transforms, utils  # noqa: F401

def make_grid(*args, **kwargs):  # imported (train.py:21) but never called
    raise NotImplementedError("torchvision shim: make_grid not provided")

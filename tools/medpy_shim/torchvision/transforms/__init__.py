import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class ToTensor:
    """PIL image -> float CHW tensor in [0,1] (torchvision semantics)."""

    def __call__(self, pic):
        arr = np.asarray(pic)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        if t.dtype == torch.uint8:
            return t.float().div(255.0)
        return t.float()


class ToPILImage:
    """float CHW tensor in [0,1] (or HW) -> PIL image."""

    def __call__(self, pic):
        if pic.ndim == 2:
            arr = pic.mul(255).clamp(0, 255).byte().cpu().numpy()
            return Image.fromarray(arr, mode="L")
        arr = pic.mul(255).clamp(0, 255).byte().cpu().numpy()
        arr = np.transpose(arr, (1, 2, 0))
        if arr.shape[2] == 1:
            return Image.fromarray(arr[:, :, 0], mode="L")
        return Image.fromarray(arr)


class ColorJitter:  # SSDA path only (dataloader.py:534); unreached
    def __init__(self, *a, **k):
        pass

    def __call__(self, img):
        return img


class RandomGrayscale:  # SSDA path only (dataloader.py:535); unreached
    def __init__(self, *a, **k):
        pass

    def __call__(self, img):
        return img

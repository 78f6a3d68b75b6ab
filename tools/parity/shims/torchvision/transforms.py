"""torchvision.transforms shim — exactly the five transforms the reference
composes (reference: src/dataset.py:35-47), with identical numerics:

* ToTensor: HWC uint8 ndarray -> CHW float32 / 255,
* Normalize: per-channel (x - mean) / std,
* ToPILImage: identity pass-through.  torchvision's PIL round-trip is
  value-preserving for uint8 HWC input; keeping the ndarray lets
  RandomHorizontalFlip operate without PIL,
* RandomHorizontalFlip: one ``torch.rand(1) < p`` draw per call (the same
  torch-RNG consumption as torchvision, so the reference's seeded stream
  advances identically), flipping the width axis,
* Compose: apply in order.
"""

import numpy as np
import torch


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class ToPILImage:
    def __call__(self, img):
        return np.asarray(img)


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(np.ascontiguousarray(arr.transpose(2, 0, 1)))
        if t.dtype == torch.uint8:
            return t.float().div(255.0)
        return t.float()


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32)[:, None, None]
        self.std = torch.tensor(std, dtype=torch.float32)[:, None, None]

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if torch.rand(1) < self.p:
            arr = np.asarray(img)
            return np.ascontiguousarray(arr[:, ::-1])
        return img

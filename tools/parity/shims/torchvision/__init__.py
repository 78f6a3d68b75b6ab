"""`torchvision` compatibility shim for running the unmodified reference
implementation in an environment without torchvision installed.

Provides the two things the reference touches:
* ``torchvision.models.resnet18`` (reference: src/model.py:53-56) — a
  faithful re-statement of the public torchvision ResNet-18 (same module
  tree: conv1/bn1/relu/maxpool/layer1..4/avgpool/fc, same kaiming fan-out
  init), so the reference's attribute-level tower surgery works unchanged,
* ``torchvision.transforms`` (reference: src/dataset.py:35-47) — Compose /
  ToTensor / ToPILImage / Normalize / RandomHorizontalFlip with the same
  numeric semantics and the same torch-RNG consumption (one torch.rand(1)
  draw per RandomHorizontalFlip call).
"""

from . import models, transforms  # noqa: F401

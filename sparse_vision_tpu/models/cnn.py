"""CustomCNN1 — equivalent of the reference's small CNN (models/custom_cnn.py:15-54):
3x(conv3x3 pad1 -> ReLU -> maxpool2) then fc(512) -> ReLU -> fc(classes).

The in-forward functional ReLUs of the reference are unnamed there (not hookable);
here they get names (relu1..relu3, relu_fc1) but the hookable module names (conv1..3,
pool1..3, fc1, fc2) match the reference, and tapping convN still yields the pre-ReLU
conv output as a hook would.
"""

from __future__ import annotations

from sparse_vision_tpu.models.layers import SeqNet, conv, flatten, linear, maxpool, relu


def make_cnn1(num_classes: int) -> SeqNet:
    return SeqNet(
        [
            conv("conv1", 32, kernel=3, padding=1),
            relu("relu1"),
            maxpool("pool1", 2),
            conv("conv2", 64, kernel=3, padding=1),
            relu("relu2"),
            maxpool("pool2", 2),
            conv("conv3", 128, kernel=3, padding=1),
            relu("relu3"),
            maxpool("pool3", 2),
            flatten("flatten"),
            linear("fc1", 512),
            relu("relu_fc1"),
            linear("fc2", num_classes),
        ]
    )

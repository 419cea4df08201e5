#!/usr/bin/env python
"""Convert torchvision VGG19 weights (.pth state_dict) to the .npz layout
models/vgg.py loads (keys '<layer>/kernel' HWIO + '<layer>/bias').

Usage: python scripts/convert_vgg19_weights.py vgg19.pth vgg19.npz

The reference uses Keras' ImageNet VGG19 for its perceptual losses
(upscaling/upscaler/model.py:108). This environment has no egress, so the
framework defaults to a seeded-random extractor; drop a converted file at
$VCGU_VGG19_WEIGHTS to enable true ImageNet features.
"""

import sys

import numpy as np

# torchvision VGG19 'features' conv indices -> Keras-style layer names
TORCH_TO_NAME = {
    0: "block1_conv1", 2: "block1_conv2",
    5: "block2_conv1", 7: "block2_conv2",
    10: "block3_conv1", 12: "block3_conv2", 14: "block3_conv3", 16: "block3_conv4",
    19: "block4_conv1", 21: "block4_conv2", 23: "block4_conv3", 25: "block4_conv4",
    28: "block5_conv1", 30: "block5_conv2", 32: "block5_conv3", 34: "block5_conv4",
}


def main(src: str, dst: str) -> None:
    import torch

    state = torch.load(src, map_location="cpu", weights_only=True)
    out = {}
    for idx, name in TORCH_TO_NAME.items():
        w = state[f"features.{idx}.weight"].numpy()  # OIHW
        b = state[f"features.{idx}.bias"].numpy()
        out[f"{name}/kernel"] = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        out[f"{name}/bias"] = b
    np.savez(dst, **out)
    print(f"wrote {len(out) // 2} conv layers to {dst}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])

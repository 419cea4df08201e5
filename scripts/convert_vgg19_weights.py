#!/usr/bin/env python
"""Convert torchvision VGG19 weights (.pth state_dict) to the .npz layout
models/vgg.py loads (keys '<layer>/kernel' HWIO + '<layer>/bias').

Usage: python scripts/convert_vgg19_weights.py vgg19.pth vgg19.npz

The reference uses Keras' ImageNet VGG19 for its perceptual losses
(upscaling/upscaler/model.py:108). This environment has no egress, so the
framework defaults to a seeded-random extractor; drop a converted file at
$VCGU_VGG19_WEIGHTS to enable true ImageNet features.

Every layer is validated against the committed manifest
(assets/vgg19_imagenet_manifest.json: per-layer HWIO shapes + the
canonical torchvision filename, whose embedded 8-hex prefix is checked
against the source file's SHA256); the full source digest is recorded
into the .npz so a run's provenance is auditable offline.
"""

import hashlib
import json
import os
import sys

import numpy as np

MANIFEST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets", "vgg19_imagenet_manifest.json")


def load_manifest(path: str = MANIFEST) -> dict:
    with open(path) as fh:
        return json.load(fh)


# torchvision VGG19 'features' conv indices -> Keras-style layer names
# (manifest-backed; kept as a module attribute for tests/oracles)
TORCH_TO_NAME = {int(k): v
                 for k, v in load_manifest()["torch_feature_indices"].items()}


def main(src: str, dst: str) -> None:
    import torch

    man = load_manifest()
    state = torch.load(src, map_location="cpu", weights_only=True)
    sha = hashlib.sha256(open(src, "rb").read()).hexdigest()
    prefix = man["source_sha256_prefix"]
    if not sha.startswith(prefix):
        print(f"WARNING: source sha256 {sha[:8]}... does not match the "
              f"canonical torchvision checkpoint prefix {prefix} "
              f"({man['source_file']}) — converting anyway, provenance "
              f"recorded", file=sys.stderr)
    out = {"_source_sha256": np.array(sha)}
    for idx, name in man["torch_feature_indices"].items():
        w = state[f"features.{idx}.weight"].numpy()  # OIHW
        b = state[f"features.{idx}.bias"].numpy()
        k = np.transpose(w, (2, 3, 1, 0))  # -> HWIO
        want_k = tuple(man["layers"][name]["kernel"])
        want_b = tuple(man["layers"][name]["bias"])
        if k.shape != want_k or b.shape != want_b:
            raise ValueError(
                f"{name}: shapes {k.shape}/{b.shape} != manifest "
                f"{want_k}/{want_b}")
        out[f"{name}/kernel"] = k
        out[f"{name}/bias"] = b
    np.savez(dst, **out)
    n_par = sum(v.size for k, v in out.items() if k != "_source_sha256")
    assert n_par == man["total_params_trunk"], (n_par,
                                               man["total_params_trunk"])
    print(f"wrote {(len(out) - 1) // 2} conv layers ({n_par} params) to "
          f"{dst}; source sha256 {sha[:16]}...")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    main(sys.argv[1], sys.argv[2])

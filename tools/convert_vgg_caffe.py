#!/usr/bin/env python
"""Convert the reference's vgg16_caffe.pth (torch state_dict) to a portable .npz.

The reference loads Caffe-layout torchvision-style keys (``features.N.{weight,bias}``,
``pt/modeling/backbone/vgg.py:130-145``). checkpoint.load_vgg_caffe accepts either the
.pth directly (needs torch) or the .npz this tool produces (numpy only).

Usage: python tools/convert_vgg_caffe.py vgg16_caffe.pth vgg16_caffe.npz
"""

import sys

import numpy as np


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import torch

    sd = torch.load(src, map_location="cpu")
    arrays = {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
    np.savez(dst, **arrays)
    print(f"wrote {len(arrays)} arrays -> {dst}")


if __name__ == "__main__":
    main()

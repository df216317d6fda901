"""One-time conversion of the scatterometry surrogate checkpoint to .npz.

The reference ships a pickled PyTorch state_dict
(trained_models/scatterometry/surrogate.pt, reference
utils_scatterometry.py:8-25: a frozen MLP 3 -> 256 -> 256 -> 256 -> 23 with
ReLU).  The TPU framework is torch-free at runtime; this tool extracts the 8
weight tensors once into a plain .npz consumed by
``dmip_tpu.problems.scatterometry.load_forward_model``.

Usage: python tools/convert_surrogate.py [src.pt] [dst.npz]
"""

import sys

import numpy as np
import torch


def convert(src: str, dst: str) -> None:
    state = torch.load(src, map_location="cpu")
    # nn.Sequential state_dict keys: '0.weight','0.bias','2.weight',... for
    # Linear layers at indices 0, 2, 4, 6 (ReLU in between).
    arrays = {}
    layer_idx = 0
    for key in sorted(state.keys(), key=lambda k: int(k.split(".")[0])):
        idx, kind = key.split(".")
        arr = state[key].detach().cpu().numpy().astype(np.float32)
        if kind == "weight":
            # torch Linear stores (out, in); store transposed for x @ W
            arrays[f"w{int(idx) // 2}"] = arr.T
        else:
            arrays[f"b{int(idx) // 2}"] = arr
    np.savez(dst, **arrays)
    print(f"wrote {dst}: " + ", ".join(f"{k}{v.shape}" for k, v in arrays.items()))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/trained_models/scatterometry/surrogate.pt"
    dst = sys.argv[2] if len(sys.argv) > 2 else "dmip_tpu/problems/data/scatterometry_surrogate.npz"
    convert(src, dst)

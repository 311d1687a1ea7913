"""Print an .npy array (reference: tools/numpy_view.py)."""

import sys

import numpy as np

if __name__ == "__main__":
    arr = np.load(sys.argv[1])
    np.set_printoptions(threshold=200, edgeitems=5)
    print(f"shape={arr.shape} dtype={arr.dtype} min={arr.min():.4g} max={arr.max():.4g}")
    print(arr)

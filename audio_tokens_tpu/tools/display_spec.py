"""Render a saved spectrogram .npy to a PNG
(reference: tools/display_spec.py, which used librosa.specshow interactively)."""

import sys
from pathlib import Path

import numpy as np

if __name__ == "__main__":
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    path = Path(sys.argv[1])
    out = Path(sys.argv[2]) if len(sys.argv) > 2 else path.with_suffix(".png")
    spec = np.load(path)
    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(spec, origin="lower", aspect="auto", cmap="magma")
    fig.colorbar(im, label="dB")
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    fig.savefig(out)
    print(f"saved {out}")

"""Build the round-5 training/validation folders (data/train, data/val).

The environment ships no large dataset, so the long training run
(PERF.md "Reference training protocol at scale") trains on the
reference's published HR-class outputs — docs/{bank_rs, butterfly_rs,
cartoon_rsa}.png — augmented with all 8 dihedral orientations each
(24 files).  docs/logo_rs.png is held out as the validation image and
never enters the training folder.  Deterministic: re-running reproduces
the same files.

Run: python scripts/make_train_data.py
"""

import os

import numpy as np
from PIL import Image

SRCS = {
    "bank": "/root/reference/docs/bank_rs.png",
    "butterfly": "/root/reference/docs/butterfly_rs.png",
    "cartoon": "/root/reference/docs/cartoon_rsa.png",
}
VAL = "/root/reference/docs/logo_rs.png"


def main(root="/root/repo/data"):
    tr, va = os.path.join(root, "train"), os.path.join(root, "val")
    os.makedirs(tr, exist_ok=True)
    os.makedirs(va, exist_ok=True)
    for name, path in SRCS.items():
        img = np.asarray(Image.open(path).convert("RGB"))
        for k in range(4):
            r = np.rot90(img, k)
            Image.fromarray(r).save(os.path.join(tr, f"{name}_r{k}.png"))
            Image.fromarray(r[:, ::-1]).save(
                os.path.join(tr, f"{name}_r{k}f.png"))
    img = np.asarray(Image.open(VAL).convert("RGB"))
    Image.fromarray(img).save(os.path.join(va, "logo_rs.png"))
    print(f"train: {len(os.listdir(tr))} files, val: {len(os.listdir(va))}")


if __name__ == "__main__":
    main()

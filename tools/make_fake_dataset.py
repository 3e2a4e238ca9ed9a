"""Generate a tiny synthetic dataset in the reference's on-disk layout:
trainA/trainB image dirs, per-domain paths.txt with mask labels, bbox .txt
files for online modes. Used by tests and verification runs."""

import os
import sys

import numpy as np
from PIL import Image


def make(root, n=8, size=64, nclasses=2, seed=0, online=False,
         identical=False):
    """online=True writes 'img bbox.txt' paths lines (online-crop layout);
    default writes 'img cls mask.png' (labeled-mask layout).
    identical=True makes every sample the same image/mask/class — used by
    the multi-host exactness test, where the global batch must be
    order-invariant across process shardings."""
    rng = np.random.RandomState(seed)
    for dom in ("A", "B"):
        for phase in ("train", "test"):
            if identical:
                rng = np.random.RandomState(seed)
            os.makedirs(os.path.join(root, f"{phase}{dom}", "imgs"), exist_ok=True)
            os.makedirs(os.path.join(root, f"{phase}{dom}", "masks"), exist_ok=True)
            os.makedirs(os.path.join(root, f"{phase}{dom}", "bbox"), exist_ok=True)
            lines = []
            count = n if phase == "train" else max(2, n // 4)
            for i in range(count):
                if identical:
                    rng = np.random.RandomState(seed)
                img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                # draw a colored square "object"
                x1, y1 = rng.randint(4, size // 2, 2)
                w = rng.randint(size // 8, size // 3)
                x2, y2 = min(size - 1, x1 + w), min(size - 1, y1 + w)
                img[y1:y2, x1:x2] = rng.randint(0, 255, 3)
                ipath = os.path.join(f"{phase}{dom}", "imgs", f"{i:03d}.png")
                Image.fromarray(img).save(os.path.join(root, ipath))

                mask = np.zeros((size, size), dtype=np.uint8)
                mask[y1:y2, x1:x2] = 1
                mpath = os.path.join(f"{phase}{dom}", "masks", f"{i:03d}.png")
                Image.fromarray(mask).save(os.path.join(root, mpath))

                bpath = os.path.join(f"{phase}{dom}", "bbox", f"{i:03d}.txt")
                with open(os.path.join(root, bpath), "w") as f:
                    f.write(f"1 {x1} {y1} {x2} {y2}\n")

                cls = int(rng.randint(0, nclasses))
                if online:
                    lines.append(f"{ipath} {bpath}")
                else:
                    lines.append(f"{ipath} {cls} {mpath}")
            with open(os.path.join(root, f"{phase}{dom}", "paths.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
            # ref-image conditioning map + text prompts (reference
            # conditions.txt / prompts.txt contracts)
            img_rel = [ln.split()[0] for ln in lines]
            with open(os.path.join(root, f"{phase}{dom}", "conditions.txt"),
                      "w") as f:
                f.write("\n".join(f"{p} {img_rel[(i + 1) % len(img_rel)]}"
                                  for i, p in enumerate(img_rel)) + "\n")
            with open(os.path.join(root, f"{phase}{dom}", "prompts.txt"),
                      "w") as f:
                f.write("\n".join(f"{p} a photo of object {i}"
                                  for i, p in enumerate(img_rel)) + "\n")
    print(f"fake dataset at {root}: {n} train imgs per domain, {size}px")


def make_video(root, n_series=2, frames=8, size=64, seed=0, domains=("A",)):
    """Video layout (reference mario/bdd100K datasets): frames grouped in
    per-series directories, paths.txt lines 'img bbox' with a moving object."""
    rng = np.random.RandomState(seed)
    for dom in domains:
        for phase in ("train", "test"):
            base = f"{phase}{dom}"
            lines = []
            for s in range(n_series):
                os.makedirs(os.path.join(root, base, f"vid{s}"), exist_ok=True)
                x1, y1 = rng.randint(4, size // 3, 2)
                w = rng.randint(size // 8, size // 4)
                vx, vy = rng.randint(1, 4, 2)
                for i in range(frames):
                    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
                    xa = int(np.clip(x1 + i * vx, 0, size - w - 1))
                    ya = int(np.clip(y1 + i * vy, 0, size - w - 1))
                    img[ya:ya + w, xa:xa + w] = rng.randint(0, 255, 3)
                    ipath = os.path.join(base, f"vid{s}", f"frame_{i:03d}.png")
                    Image.fromarray(img).save(os.path.join(root, ipath))
                    bpath = os.path.join(base, f"vid{s}", f"frame_{i:03d}.txt")
                    with open(os.path.join(root, bpath), "w") as f:
                        f.write(f"1 {xa} {ya} {xa + w} {ya + w}\n")
                    lines.append(f"{ipath} {bpath}")
            with open(os.path.join(root, base, "paths.txt"), "w") as f:
                f.write("\n".join(lines) + "\n")
    print(f"fake video dataset at {root}: {n_series} series x {frames} frames")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fakeds"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    if len(sys.argv) > 4 and sys.argv[4] == "video":
        make_video(root, n_series=2, frames=n, size=size)
    else:
        make(root, n=n, size=size)
